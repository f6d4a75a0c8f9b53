"""One-scan table-profiling pins: hand-computed per-column stats,
NULL accounting, heavy-hitter ranking with collision-proof NULL keys,
and the approx-distinct scale path."""

from __future__ import annotations

import pytest

from process_alphafold3_outputs_spark.operators.profiling import (
    profile_table,
    top_values,
)

SCHEMA = "a bigint, b string, c double"
ROWS = [
    (1, "x", 1.5),
    (2, "x", None),
    (2, None, 2.5),
    (None, "y", 2.5),
]


def _df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_profile_hand_computed(spark):
    out = {r.col_name: r for r in profile_table(_df(spark)).collect()}
    assert set(out) == {"a", "b", "c"}
    a = out["a"]
    assert (a.dtype, a.n_rows, a.n_null, a.n_distinct) == ("bigint", 4, 1, 2)
    assert a.null_frac == 0.25
    assert (a.min_value, a.max_value) == ("1", "2")
    b = out["b"]
    assert (b.n_null, b.n_distinct, b.min_value, b.max_value) == (
        1, 2, "x", "y"
    )
    c = out["c"]
    assert (c.dtype, c.n_null, c.n_distinct) == ("double", 1, 2)
    # min/max computed on the NATIVE type, cast after
    assert (c.min_value, c.max_value) == ("1.5", "2.5")


def test_profile_column_subset_and_missing(spark):
    out = profile_table(_df(spark), ["a"]).collect()
    assert [r.col_name for r in out] == ["a"]
    with pytest.raises(ValueError, match="not in the frame"):
        profile_table(_df(spark), ["a", "nope"])


def test_profile_all_null_and_empty(spark):
    allnull = spark.createDataFrame([(None,), (None,)], "v string")
    r = profile_table(allnull).collect()[0]
    assert (r.n_rows, r.n_null, r.null_frac, r.n_distinct) == (2, 2, 1.0, 0)
    assert r.min_value is None and r.max_value is None
    empty = spark.createDataFrame([], "v string")
    r = profile_table(empty).collect()[0]
    assert (r.n_rows, r.n_null, r.n_distinct) == (0, 0, 0)
    assert r.null_frac is None  # 0/0 is undefined, not 0.0


def test_profile_approx_within_rsd(spark):
    """The HLL++ scale path lands within its documented 5% rsd on a
    10k-distinct column (generous 3-sigma bound)."""
    df = spark.range(10_000).selectExpr("id AS v")
    got = {
        r.col_name: r for r in profile_table(df, approx=True).collect()
    }["v"].n_distinct
    assert abs(got - 10_000) <= 0.15 * 10_000


def test_top_values_hand_computed_with_null_rank(spark):
    df = spark.createDataFrame(
        [("x",), ("x",), ("x",), (None,), (None,), ("y",)], "v string"
    )
    got = top_values(df, ["v"], k=2).collect()
    assert [(r.value, r.n, r.rank) for r in got] == [("x", 3, 1), (None, 2, 2)]


def test_top_values_null_distinct_from_empty_string(spark):
    """NULL and '' are different values (collision-proof (is_null, v)
    keying — the chi2_drift discipline)."""
    df = spark.createDataFrame([("",), ("",), (None,)], "v string")
    got = top_values(df, ["v"], k=3).collect()
    assert [(r.value, r.n) for r in got] == [("", 2), (None, 1)]
    with pytest.raises(ValueError, match="k must be"):
        top_values(df, ["v"], k=0)


def test_top_values_tie_break_deterministic(spark):
    """Equal counts break by (is_null asc, value asc): stable across
    engines and runs."""
    df = spark.createDataFrame(
        [("b",), ("a",), (None,)], "v string"
    )
    got = top_values(df, ["v"], k=3).collect()
    assert [(r.value, r.rank) for r in got] == [("a", 1), ("b", 2), (None, 3)]
