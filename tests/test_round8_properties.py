"""Hypothesis properties for the late round-8 kernels: DoReMi simplex
invariants, MMR selection invariants, language-split reassembly."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_WORDS = ["the", "cat", "und", "der", "le", "chat", "zeta", "quark",
          "sol", "mar"]


@pytest.fixture(scope="module")
def doremi_runner(spark):
    from process_alphafold3_outputs_spark.operators.text import (
        doremi_mixture,
    )

    def run(rows):
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )
        return doremi_mixture(docs, iters=3).collect()

    return run


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(0, 2),  # domain index
            st.lists(st.sampled_from(_WORDS), min_size=1, max_size=8),
        ),
        min_size=2,
        max_size=12,
    )
)
def test_doremi_weights_form_a_simplex_ordered_by_excess(doremi_runner, docs):
    rows = [(i, " ".join(ws), f"s{d}") for i, (d, ws) in enumerate(docs)]
    out = doremi_runner(rows)
    # simplex: weights sum to ~1 (per-step 9-dp rounds bound the drift)
    assert abs(sum(r.weight for r in out) - 1.0) < 1e-5
    assert all(r.weight > 0 for r in out)
    # EG monotonicity: every step multiplies by exp(eta*excess) from a
    # common start and shares the normalizer, so weight order follows
    # excess order (ties in excess give near-equal weights)
    ranked = sorted(out, key=lambda r: r.excess)
    for a, b in zip(ranked, ranked[1:]):
        assert b.weight >= a.weight - 1e-8


@pytest.fixture(scope="module")
def mmr_runner(spark):
    from process_alphafold3_outputs_spark.operators.similarity import (
        mmr_rerank,
        topk_bruteforce,
    )
    from pyspark.sql import functions as F

    def run(vecs, k):
        emb = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>",
        )
        sel = mmr_rerank(emb, query_id=0, k=k, n_candidates=6, lam=0.7)
        top = topk_bruteforce(emb, F.col("vec_id") == 0, k=6)
        return sel.collect(), top.orderBy("rk").collect()

    return run


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vecs=st.lists(
        st.lists(
            st.integers(1, 9).map(float), min_size=3, max_size=3
        ),
        min_size=3,
        max_size=8,
    ),
    k=st.integers(1, 4),
)
def test_mmr_selection_invariants(mmr_runner, vecs, k):
    sel, top = mmr_runner(vecs, k)
    ids = [r.vec_id for r in sorted(sel, key=lambda r: r.rk)]
    # contiguous ranks, distinct picks, bounded by k and candidates
    assert [r.rk for r in sorted(sel, key=lambda r: r.rk)] == list(
        range(1, len(ids) + 1)
    )
    assert len(set(ids)) == len(ids) <= k
    # the first pick is the relevance argmax (id tiebreak) — MMR never
    # demotes rank 1
    assert ids[0] == top[0].neighbor_id
    # every pick came from the candidate pool
    assert set(ids) <= {r.neighbor_id for r in top}


@pytest.fixture(scope="module")
def split_runner(spark):
    from process_alphafold3_outputs_spark.operators.text import (
        split_by_language,
    )

    def run(words):
        docs = spark.createDataFrame(
            [(1, " ".join(words))], "doc_id long, text string"
        )
        return sorted(
            split_by_language(docs, para_words=4).collect(),
            key=lambda r: r.seg_id,
        )

    return run


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(words=st.lists(st.sampled_from(_WORDS), min_size=1, max_size=24))
def test_split_by_language_reassembles_losslessly(split_runner, words):
    segs = split_runner(words)
    # segments reassemble the normalized document exactly
    assert " ".join(s.seg_text for s in segs) == " ".join(words)
    # adjacent segments never share a language (else they'd be merged)
    for a, b in zip(segs, segs[1:]):
        assert a.lang != b.lang
    assert [s.seg_id for s in segs] == list(range(1, len(segs) + 1))


@pytest.fixture(scope="module")
def expect_runner(spark):
    from process_alphafold3_outputs_spark.operators.expect import (
        check_expectations,
    )

    rules = [
        {"column": "x", "check": "not_null"},
        {"column": "x", "check": "unique"},
        {"column": "x", "check": "range", "min": 2, "max": 7},
        {"column": "s", "check": "in_set", "values": ["a", "b"]},
        {"column": "s", "check": "regex", "pattern": "^[ab]"},
    ]

    def run(rows):
        df = spark.createDataFrame(rows, "x int, s string")
        return (
            {(r.column, r.check): (r.n_violations, r.passed)
             for r in check_expectations(df, rules).collect()},
            rules,
        )

    return run


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(0, 9)),
            st.one_of(st.none(), st.sampled_from(["a", "b", "c", "zz"])),
        ),
        min_size=0,
        max_size=12,
    )
)
def test_expectations_match_independent_model(expect_runner, rows):
    got, _ = expect_runner(rows)
    xs = [x for x, _ in rows]
    ss = [s for _, s in rows]
    nn_x = [x for x in xs if x is not None]
    nn_s = [s for s in ss if s is not None]
    want = {
        ("x", "not_null"): sum(1 for x in xs if x is None),
        ("x", "unique"): len(nn_x) - len(set(nn_x)),
        ("x", "range"): sum(1 for x in nn_x if not (2 <= x <= 7)),
        ("s", "in_set"): sum(1 for s in nn_s if s not in ("a", "b")),
        ("s", "regex"): sum(1 for s in nn_s if not s[:1] in ("a", "b")),
    }
    for key, exp in want.items():
        n_viol, passed = got[key]
        assert n_viol == exp, (key, n_viol, exp)
        assert passed == (exp == 0), key
