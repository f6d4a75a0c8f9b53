"""PageRank differential vs a dense numpy power iteration (including
dangling-mass redistribution), structural sanity (hub ranks highest,
ranks sum to 1), and the source-authority join."""

from __future__ import annotations

import numpy as np
import pytest

from process_alphafold3_outputs_spark.operators.graph import (
    pagerank,
    source_authority,
)


def _numpy_pagerank(edges, damping=0.85, iters=20):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {x: i for i, x in enumerate(nodes)}
    n = len(nodes)
    uniq = {(u, v) for u, v in edges if u != v}
    out = np.zeros(n)
    for u, _ in uniq:
        out[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        inflow = np.zeros(n)
        for u, v in uniq:
            inflow[idx[v]] += r[idx[u]] / out[idx[u]]
        dm = r[out == 0].sum()
        r = (1 - damping) / n + damping * (inflow + dm / n)
    return {nodes[i]: r[i] for i in range(n)}


def test_matches_numpy_power_iteration_with_dangling(spark):
    rng = np.random.default_rng(5)
    edges = [(int(rng.integers(0, 12)), int(rng.integers(0, 12)))
             for _ in range(40)]
    edges += [(11, 0)]  # ensure node 11 exists; nodes w/o out-links stay dangling
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(df, iters=20).collect()}
    want = _numpy_pagerank(edges, iters=20)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9), k
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_hub_ranks_highest_and_duplicates_count_once(spark):
    edges = [(i, 0) for i in range(1, 8)] + [(1, 0)] * 5  # dup links to the hub
    df = spark.createDataFrame(edges, "src long, dst long")
    ranks = {r.node: r.rank for r in pagerank(df).collect()}
    assert max(ranks, key=ranks.get) == 0
    # spokes all tie (the duplicate (1, 0) edges must not boost node 1)
    spoke = [ranks[i] for i in range(1, 8)]
    assert max(spoke) - min(spoke) < 1e-12


def test_empty_graph(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert pagerank(df).count() == 0


def test_source_authority_join_and_floor(spark):
    docs = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "unlisted")], "doc_id long, source string"
    )
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("c", "a")], "src string, dst string"
    )
    out = {r.doc_id: r.source_rank
           for r in source_authority(docs, edges).collect()}
    assert out[1] > out[3] and out[2] > out[3]
    assert out[3] == pytest.approx((1 - 0.85) / 3)


# -- HITS (r7) ----------------------------------------------------------------

def _numpy_hits(edges, iters=4):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {x: i for i, x in enumerate(nodes)}
    n = len(nodes)
    uniq = {(u, v) for u, v in edges if u != v}
    h = np.full(n, 1.0 / n)
    a = np.full(n, 1.0 / n)
    for _ in range(iters):
        a = np.zeros(n)
        for u, v in uniq:
            a[idx[v]] += h[idx[u]]
        if a.sum() > 0:
            a = a / a.sum()
        h = np.zeros(n)
        for u, v in uniq:
            h[idx[u]] += a[idx[v]]
        if h.sum() > 0:
            h = h / h.sum()
    return {nodes[i]: (h[i], a[i]) for i in range(n)}


def test_hits_matches_numpy(spark):
    from process_alphafold3_outputs_spark.operators.graph import hits

    rng = np.random.default_rng(11)
    edges = [(int(rng.integers(0, 10)), int(rng.integers(0, 10)))
             for _ in range(30)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: (r.hub, r.authority) for r in hits(df, iters=4).collect()}
    want = _numpy_hits(edges, iters=4)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == pytest.approx(want[k][0], abs=1e-9), k
        assert got[k][1] == pytest.approx(want[k][1], abs=1e-9), k
    assert sum(v[0] for v in got.values()) == pytest.approx(1.0, abs=1e-9)
    assert sum(v[1] for v in got.values()) == pytest.approx(1.0, abs=1e-9)


def test_hits_hub_and_authority_separate(spark):
    # star: node 0 points at everything (pure hub), 1..6 are pointed at
    # (authorities with no out-links)
    from process_alphafold3_outputs_spark.operators.graph import hits

    edges = [(0, i) for i in range(1, 7)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: (r.hub, r.authority) for r in hits(df, iters=3).collect()}
    assert got[0][0] == pytest.approx(1.0)   # all hub mass
    assert got[0][1] == pytest.approx(0.0)   # no authority
    for i in range(1, 7):
        assert got[i][0] == pytest.approx(0.0)
        assert got[i][1] == pytest.approx(1.0 / 6)


def test_hits_empty_graph(spark):
    from process_alphafold3_outputs_spark.operators.graph import hits

    df = spark.createDataFrame([], "src long, dst long")
    assert hits(df).count() == 0


def _numpy_ppr(edges, seeds, damping=0.85, iters=20):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {x: i for i, x in enumerate(nodes)}
    n = len(nodes)
    uniq = {(u, v) for u, v in edges if u != v}
    out = np.zeros(n)
    for u, _ in uniq:
        out[idx[u]] += 1
    seed_set = {s for s in seeds if s in idx}
    s = np.zeros(n)
    for x in seed_set:
        s[idx[x]] = 1.0 / len(seed_set)
    r = s.copy()
    for _ in range(iters):
        inflow = np.zeros(n)
        for u, v in uniq:
            inflow[idx[v]] += r[idx[u]] / out[idx[u]]
        dm = r[out == 0].sum()
        r = (1 - damping) * s + damping * (inflow + dm * s)
    return {nodes[i]: r[i] for i in range(n)}


def test_personalized_matches_numpy(spark):
    from process_alphafold3_outputs_spark.operators.graph import (
        personalized_pagerank,
    )

    rng = np.random.default_rng(9)
    edges = [(int(rng.integers(0, 12)), int(rng.integers(0, 12)))
             for _ in range(40)]
    edges += [(11, 0)]
    seeds = [0, 3, 7]
    df = spark.createDataFrame(edges, "src long, dst long")
    sdf = spark.createDataFrame([(x,) for x in seeds], "node long")
    got = {r.node: r.rank
           for r in personalized_pagerank(df, sdf, iters=20).collect()}
    want = _numpy_ppr(edges, seeds, iters=20)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9), k
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_personalized_concentrates_rank_near_seeds(spark):
    """Two disconnected 3-cycles: seeding one component leaves the
    other with rank 0 — proximity-to-trust, not raw popularity."""
    from process_alphafold3_outputs_spark.operators.graph import (
        personalized_pagerank,
    )

    cyc_a = [(1, 2), (2, 3), (3, 1)]
    cyc_b = [(10, 11), (11, 12), (12, 10)]
    df = spark.createDataFrame(cyc_a + cyc_b, "src long, dst long")
    sdf = spark.createDataFrame([(1,)], "node long")
    ranks = {r.node: r.rank
             for r in personalized_pagerank(df, sdf, iters=30).collect()}
    assert sum(ranks[x] for x in (1, 2, 3)) == pytest.approx(1.0, abs=1e-9)
    for x in (10, 11, 12):
        assert ranks[x] == 0.0
    # unmatched seeds: empty result, not an error
    off = spark.createDataFrame([(99,)], "node long")
    assert personalized_pagerank(df, off).count() == 0
