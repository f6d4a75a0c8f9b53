"""Semantics of the time-series resampling family
(operators/temporal.py): gapfill spine coverage, each fill policy
against hand-computed values, the counted explode guard, and OHLC
tie-break determinism."""

from __future__ import annotations

import pytest

from process_alphafold3_outputs_spark.operators.temporal import (
    ohlc_downsample,
    time_bucket_gapfill,
)


def _series(spark, rows):
    return spark.createDataFrame(rows, "k string, t long, v double")


@pytest.fixture(scope="module")
def gappy(spark):
    # key "a": observations in buckets 0, 30, 40 (width 10) -> gaps at
    # 10 and 20; key "b": single observation (no spine beyond itself)
    return _series(
        spark,
        [
            ("a", 1, 10.0),
            ("a", 5, 20.0),  # bucket 0: avg 15.0
            ("a", 33, 30.0),  # bucket 30
            ("a", 47, 90.0),  # bucket 40
            ("b", 100, 7.0),  # bucket 100
        ],
    )


def _by_key_bucket(df):
    return {
        (r["k"], r["bucket"]): (r["n"], r["value"])
        for r in df.collect()
    }


def test_gapfill_spine_is_dense_per_key(spark, gappy):
    out = time_bucket_gapfill(gappy, ["k"], "t", "v", 10, fill="none")
    got = _by_key_bucket(out)
    assert sorted(b for k, b in got if k == "a") == [0, 10, 20, 30, 40]
    assert sorted(b for k, b in got if k == "b") == [100]
    # gap rows carry n=0 and NULL value under fill="none"
    assert got[("a", 10)] == (0, None)
    assert got[("a", 20)] == (0, None)
    assert got[("a", 0)] == (2, 15.0)


def test_gapfill_locf_and_zero(spark, gappy):
    locf = _by_key_bucket(
        time_bucket_gapfill(gappy, ["k"], "t", "v", 10, fill="locf")
    )
    assert locf[("a", 10)] == (0, 15.0)
    assert locf[("a", 20)] == (0, 15.0)
    assert locf[("a", 30)] == (1, 30.0)
    zero = _by_key_bucket(
        time_bucket_gapfill(gappy, ["k"], "t", "v", 10, fill="zero")
    )
    assert zero[("a", 10)] == (0, 0.0)
    assert zero[("a", 0)] == (2, 15.0)


def test_gapfill_linear_interpolates_hand_computed(spark, gappy):
    out = _by_key_bucket(
        time_bucket_gapfill(gappy, ["k"], "t", "v", 10, fill="linear")
    )
    # neighbors: bucket 0 -> 15.0, bucket 30 -> 30.0
    # bucket 10: 15 + (30-15) * (10-0)/(30-0) = 20.0
    # bucket 20: 15 + (30-15) * (20-0)/(30-0) = 25.0
    assert out[("a", 10)] == (0, 20.0)
    assert out[("a", 20)] == (0, 25.0)
    # observed buckets pass through untouched
    assert out[("a", 40)] == (1, 90.0)
    assert out[("b", 100)] == (1, 7.0)


def test_gapfill_negative_timestamps_bucket_correctly(spark):
    # floor-div semantics: -1 belongs to bucket -10, not bucket 0
    df = _series(spark, [("a", -1, 1.0), ("a", 11, 2.0)])
    out = _by_key_bucket(
        time_bucket_gapfill(df, ["k"], "t", "v", 10, fill="none")
    )
    assert sorted(b for _, b in out) == [-10, 0, 10]
    assert out[("a", -10)] == (1, 1.0)


def test_gapfill_count_agg_and_sum(spark, gappy):
    out = _by_key_bucket(
        time_bucket_gapfill(gappy, ["k"], "t", "v", 10, agg="count",
                            fill="zero")
    )
    assert out[("a", 0)] == (2, 2.0)
    assert out[("a", 10)] == (0, 0.0)
    s = _by_key_bucket(
        time_bucket_gapfill(gappy, ["k"], "t", "v", 10, agg="sum",
                            fill="none")
    )
    assert s[("a", 0)] == (2, 30.0)


def test_gapfill_guard_refuses_wide_span(spark):
    df = _series(spark, [("a", 0, 1.0), ("a", 10_000_000, 2.0)])
    with pytest.raises(ValueError, match="max_buckets"):
        time_bucket_gapfill(df, ["k"], "t", "v", 1, max_buckets=1000)
    # same span, coarser width: passes the guard
    out = time_bucket_gapfill(
        df, ["k"], "t", "v", 100_000, max_buckets=1000
    )
    assert out.count() == 101


def test_gapfill_param_validation(spark, gappy):
    with pytest.raises(ValueError, match="width"):
        time_bucket_gapfill(gappy, ["k"], "t", "v", 0)
    with pytest.raises(ValueError, match="fill"):
        time_bucket_gapfill(gappy, ["k"], "t", "v", 10, fill="nope")
    with pytest.raises(ValueError, match="agg"):
        time_bucket_gapfill(gappy, ["k"], "t", "v", 10, agg="median")


def test_ohlc_hand_computed_with_tiebreak(spark):
    df = spark.createDataFrame(
        [
            # bucket 0: ties at t=1 -> seq breaks open (seq 0 first),
            # ties at t=9 -> seq breaks close (seq 4 last)
            ("a", 1, 0, 5.0),
            ("a", 1, 1, 3.0),
            ("a", 4, 2, 99.0),
            ("a", 9, 3, 1.0),
            ("a", 9, 4, 7.0),
            ("a", 12, 5, 42.0),  # bucket 10
        ],
        "k string, t long, seq long, v double",
    )
    out = {
        r["bucket"]: (r["n"], r["open"], r["high"], r["low"], r["close"])
        for r in ohlc_downsample(
            df, ["k"], "t", "v", 10, seq_col="seq"
        ).collect()
    }
    assert out[0] == (5, 5.0, 99.0, 1.0, 7.0)
    assert out[10] == (1, 42.0, 42.0, 42.0, 42.0)


def test_ohlc_width_validation(spark, gappy):
    with pytest.raises(ValueError, match="width"):
        ohlc_downsample(gappy, ["k"], "t", "v", -5)
