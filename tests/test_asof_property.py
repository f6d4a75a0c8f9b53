"""Hypothesis differential: the as-of join kernel vs pandas.merge_asof
(backward, inclusive)."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from process_alphafold3_outputs_spark.operators.asof import as_of_join

keys = st.integers(min_value=0, max_value=2)
times = st.integers(min_value=0, max_value=50)


@pytest.fixture(scope="module")
def asof_runner(spark):
    def run(left_rows, right_rows):
        left = spark.createDataFrame(left_rows, "k long, t long, lid long")
        right = spark.createDataFrame(right_rows, "k long, t long, v long")
        out = as_of_join(left, right, ["k"], "t", "t", ["v"])
        return {(r.k, r.t, r.lid): r.asof_v for r in out.collect()}

    return run


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(st.tuples(keys, times), min_size=1, max_size=15, unique=True),
    right=st.lists(st.tuples(keys, times), min_size=1, max_size=15, unique=True),
)
def test_asof_matches_pandas_merge_asof(asof_runner, left, right):
    left_rows = [(k, t, i) for i, (k, t) in enumerate(left)]
    right_rows = [(k, t, 100 + i) for i, (k, t) in enumerate(right)]
    got = asof_runner(left_rows, right_rows)

    lpd = pd.DataFrame(left_rows, columns=["k", "t", "lid"]).sort_values("t")
    rpd = pd.DataFrame(right_rows, columns=["k", "t", "v"]).sort_values("t")
    merged = pd.merge_asof(
        lpd, rpd, on="t", by="k", direction="backward", allow_exact_matches=True
    )
    want = {
        (int(r.k), int(r.t), int(r.lid)): (None if pd.isna(r.v) else int(r.v))
        for r in merged.itertuples()
    }
    assert got == want


def test_asof_null_right_payload_stays_on_matched_row(spark):
    """A NULL payload on the MATCHED right row must surface as NULL —
    not the previous/following right row's non-NULL value (advice r11:
    the per-column ignorenulls carry skipped past the matched row while
    _bts and the tolerance check still pointed at it). Differential:
    pandas.merge_asof returns NULL in every one of these cells."""
    left = spark.createDataFrame(
        [(1, 10, 0), (1, 25, 1)], "k long, t long, lid long"
    )
    right = spark.createDataFrame(
        [(1, 5, 100), (1, 9, None), (1, 30, None), (1, 40, 300)],
        "k long, t long, v long",
    )
    for direction, want in (
        # backward from t=10/25: matched right row is t=9 (v NULL)
        ("backward", {0: None, 1: None}),
        # forward from t=10/25: matched right row is t=30 (v NULL)
        ("forward", {0: None, 1: None}),
        # nearest: t=10 -> 9 (NULL); t=25 -> 30 (NULL)
        ("nearest", {0: None, 1: None}),
    ):
        out = as_of_join(
            left, right, ["k"], "t", "t", ["v"], direction=direction
        )
        got = {r.lid: r.asof_v for r in out.collect()}
        assert got == want, direction
    # pandas agreement on the backward case
    lpd = pd.DataFrame([(1, 10, 0), (1, 25, 1)], columns=["k", "t", "lid"])
    rpd = pd.DataFrame(
        [(1, 5, 100.0), (1, 9, None), (1, 30, None), (1, 40, 300.0)],
        columns=["k", "t", "v"],
    )
    merged = pd.merge_asof(lpd, rpd, on="t", by="k", direction="backward")
    assert merged["v"].isna().all()
    # and the matched-row timestamps still gate tolerance: t=25 with
    # tolerance 5 has no backward match within range at all
    tol = as_of_join(
        left, right, ["k"], "t", "t", ["v"], tolerance=5
    ).collect()
    assert {r.lid: r.asof_v for r in tol} == {0: None, 1: None}
