"""Hypothesis differentials for the round-10 kernels: CDC changelog
application vs a pure-Python log replay, ranking metrics vs a plain
trec_eval restatement, and the exact KS distance vs a brute-force CDF
sweep."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from process_alphafold3_outputs_spark.operators.drift import ks_distance
from process_alphafold3_outputs_spark.operators.maintenance import (
    apply_changelog,
)
from process_alphafold3_outputs_spark.operators.ranking import (
    ranking_metrics,
)

_SET = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

keys = st.integers(min_value=0, max_value=6)
ops = st.sampled_from(["I", "U", "D"])


@pytest.fixture(scope="module")
def cdc_runner(spark):
    def run(snap_rows, change_rows):
        snap = spark.createDataFrame(snap_rows, "k long, v long")
        ch = spark.createDataFrame(
            change_rows, "k long, v long, seq long, op string"
        )
        out = apply_changelog(snap, ch, ["k"])
        return {r.k: r.v for r in out.collect()}

    return run


@settings(**_SET)
@given(
    snap=st.lists(keys, min_size=0, max_size=6, unique=True),
    changes=st.lists(
        st.tuples(keys, st.integers(0, 99), ops),
        min_size=0,
        max_size=20,
    ),
)
def test_changelog_equals_ordered_log_replay(cdc_runner, snap, changes):
    """apply_changelog == replaying the log in seq order per key (seqs
    made unique per key by construction, as the contract requires)."""
    snap_rows = [(k, k * 10) for k in snap]
    seen: dict[int, int] = {}
    change_rows = []
    for k, v, op in changes:
        seen[k] = seen.get(k, 0) + 1
        change_rows.append((k, v, seen[k], op))

    got = cdc_runner(snap_rows, change_rows)

    state = {k: v for k, v in snap_rows}
    for k, v, seq, op in sorted(change_rows, key=lambda r: (r[0], r[2])):
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = v
    assert got == state


rel_grades = st.integers(min_value=1, max_value=3)


@pytest.fixture(scope="module")
def ranking_runner(spark):
    def run(hits_rows, qrel_rows, k):
        hits = spark.createDataFrame(
            hits_rows, "query_id long, doc_id long, rank int"
        )
        qrels = spark.createDataFrame(
            qrel_rows, "query_id long, doc_id long, rel int"
        )
        out = ranking_metrics(hits, qrels, k=k)
        return {
            r.query_id: (
                r.n_rel, r.n_hits, r.n_rel_hit, r.precision_k,
                r.recall_k, r.rr, r.ap_k, r.ndcg_k,
            )
            for r in out.collect()
        }

    return run


@settings(**_SET)
@given(
    runs=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 9)),
        min_size=0, max_size=15, unique=True,
    ),
    judgments=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 9), rel_grades),
        min_size=1, max_size=15,
        unique_by=lambda t: (t[0], t[1]),
    ),
    k=st.integers(min_value=1, max_value=5),
)
def test_ranking_matches_plain_treceval(ranking_runner, runs, judgments, k):
    """ranking_metrics == a from-scratch Python trec_eval over random
    runs and graded judgments (ranks assigned by enumeration order)."""
    by_q: dict[int, list[int]] = {}
    hits_rows = []
    for q, d in runs:
        by_q.setdefault(q, []).append(d)
        hits_rows.append((q, d, len(by_q[q])))
    got = ranking_runner(hits_rows, judgments, k)

    qrels: dict[int, dict[int, int]] = {}
    for q, d, rel in judgments:
        qrels.setdefault(q, {})[d] = rel
    want = {}
    for q, judged in qrels.items():
        ranked = [d for d in by_q.get(q, [])][:k]
        rels = [judged.get(d, 0) for d in ranked]
        n_rel_hit = sum(1 for r in rels if r >= 1)
        first = next((i + 1 for i, r in enumerate(rels) if r >= 1), None)
        ap_num, cum = 0.0, 0
        for i, r in enumerate(rels):
            if r >= 1:
                cum += 1
                ap_num += cum / (i + 1)
        dcg = sum(
            (2 ** r - 1) / math.log2(i + 2)
            for i, r in enumerate(rels)
            if r >= 1
        )
        ideal = sorted(judged.values(), reverse=True)[:k]
        idcg = sum(
            (2 ** r - 1) / math.log2(i + 2) for i, r in enumerate(ideal)
        )
        want[q] = (
            len(judged),
            len(ranked),
            n_rel_hit,
            round(n_rel_hit / k, 6),
            round(n_rel_hit / len(judged), 6),
            round(1.0 / first, 6) if first else 0.0,
            round(ap_num / min(len(judged), k), 6),
            round(dcg / idcg, 6),
        )
    assert got == want


@pytest.fixture(scope="module")
def ks_runner(spark):
    def run(a, b):
        ra = spark.createDataFrame([(float(v),) for v in a], "v double")
        rb = spark.createDataFrame([(float(v),) for v in b], "v double")
        return ks_runner_collect(ks_distance(ra, rb, "v"))

    def ks_runner_collect(df):
        r = df.collect()[0]
        return r.n_ref, r.n_cur, r.ks

    return run


@settings(**_SET)
@given(
    a=st.lists(st.integers(0, 20), min_size=1, max_size=20),
    b=st.lists(st.integers(0, 20), min_size=1, max_size=20),
)
def test_ks_matches_bruteforce_cdf_sweep(ks_runner, a, b):
    n_ref, n_cur, ks = ks_runner(a, b)
    assert (n_ref, n_cur) == (len(a), len(b))
    grid = sorted(set(a) | set(b))
    want = max(
        abs(
            sum(1 for v in a if v <= x) / len(a)
            - sum(1 for v in b if v <= x) / len(b)
        )
        for x in grid
    )
    assert ks == round(want, 6)
