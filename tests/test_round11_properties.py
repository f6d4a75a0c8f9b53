"""Hypothesis differentials for the round-11 kernels: the one-scan
profiler vs a pure-Python restatement, fused chi-square drift vs the
plain per-category formula, and the banded KS vs a brute-force banded
CDF sweep."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from process_alphafold3_outputs_spark.operators.drift import (
    chi2_drift_many,
    ks_distance_banded,
)
from process_alphafold3_outputs_spark.operators.profiling import (
    profile_table,
    top_values,
)

_SET = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

vals = st.one_of(st.none(), st.integers(min_value=-5, max_value=5))
cats = st.one_of(st.none(), st.sampled_from(["a", "b", "c", " NULL", ""]))


@pytest.fixture(scope="module")
def profile_runner(spark):
    def run(rows):
        df = spark.createDataFrame(rows, "x long, y string")
        return (
            {r.col_name: r for r in profile_table(df).collect()},
            top_values(df, ["y"], k=3).collect(),
        )

    return run


@settings(**_SET)
@given(
    rows=st.lists(st.tuples(vals, cats), min_size=0, max_size=15),
)
def test_profile_matches_pure_python(profile_runner, rows):
    prof, top = profile_runner(rows)
    xs = [r[0] for r in rows]
    ys = [r[1] for r in rows]
    n = len(rows)
    for col, data, render in (("x", xs, str), ("y", ys, lambda s: s)):
        got = prof[col]
        nn = [v for v in data if v is not None]
        assert got.n_rows == n
        assert got.n_null == n - len(nn)
        assert got.n_distinct == len(set(nn))
        if n:
            assert got.null_frac == round((n - len(nn)) / n, 6)
        else:
            assert got.null_frac is None
        if nn:
            assert got.min_value == render(min(nn))
            assert got.max_value == render(max(nn))
        else:
            assert got.min_value is None and got.max_value is None
    # top_values: counts and the deterministic tie-break order
    counts = Counter(ys)
    expected = sorted(
        counts.items(),
        key=lambda kv: (-kv[1], kv[0] is None, kv[0] or ""),
    )[:3]
    assert [(r.value, r.n) for r in top] == expected
    assert [r.rank for r in top] == list(range(1, len(expected) + 1))


@pytest.fixture(scope="module")
def chi2_runner(spark):
    def run(ref_rows, cur_rows):
        ref = spark.createDataFrame(ref_rows, "p string, q string")
        cur = spark.createDataFrame(cur_rows, "p string, q string")
        return {
            r.col_name: r
            for r in chi2_drift_many(ref, cur, ["p", "q"]).collect()
        }

    return run


def _chi2_pure(ref_vals, cur_vals):
    rc, cc = Counter(ref_vals), Counter(cur_vals)
    n_ref, n_cur = len(ref_vals), len(cur_vals)
    cats = set(rc) | set(cc)
    chi2 = 0.0
    for c in cats:
        e = max(rc.get(c, 0), 0.5) * n_cur / n_ref
        chi2 += (cc.get(c, 0) - e) ** 2 / e
    return len(cats), round(chi2, 6)


@settings(**_SET)
@given(
    ref=st.lists(st.tuples(cats, cats), min_size=1, max_size=15),
    cur=st.lists(st.tuples(cats, cats), min_size=1, max_size=15),
)
def test_chi2_many_matches_pure_python(chi2_runner, ref, cur):
    got = chi2_runner(ref, cur)
    for i, col in enumerate(("p", "q")):
        ncat, chi2 = _chi2_pure(
            [r[i] for r in ref], [r[i] for r in cur]
        )
        g = got[col]
        assert (g.n_ref, g.n_cur) == (len(ref), len(cur))
        assert g.n_categories == ncat, col
        assert math.isclose(g.chi2, chi2, rel_tol=0, abs_tol=1.5e-6), col


@pytest.fixture(scope="module")
def ks_banded_runner(spark):
    def run(ref_vals, cur_vals, width):
        ref = spark.createDataFrame([(v,) for v in ref_vals], "v double")
        cur = spark.createDataFrame([(v,) for v in cur_vals], "v double")
        return ks_distance_banded(ref, cur, "v", width=width).collect()[0]

    return run


@settings(**_SET)
@given(
    ref=st.lists(
        st.floats(-50, 50, allow_nan=False), min_size=1, max_size=20
    ),
    cur=st.lists(
        st.floats(-50, 50, allow_nan=False), min_size=1, max_size=20
    ),
    width=st.sampled_from([1.0, 5.0, 10.0]),
)
def test_ks_banded_matches_brute_force(ks_banded_runner, ref, cur, width):
    got = ks_banded_runner(ref, cur, width)
    band = lambda v: math.floor(v / width) * width  # noqa: E731
    rb = sorted(band(v) for v in ref)
    cb = sorted(band(v) for v in cur)
    grid = sorted(set(rb) | set(cb))
    d = max(
        abs(
            sum(v <= x for v in rb) / len(rb)
            - sum(v <= x for v in cb) / len(cb)
        )
        for x in grid
    )
    assert (got.n_ref, got.n_cur) == (len(ref), len(cur))
    assert math.isclose(got.ks, round(d, 6), rel_tol=0, abs_tol=1.5e-6)
