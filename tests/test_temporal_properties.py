"""Hypothesis differential for the temporal resampling kernels:
time_bucket_gapfill (every fill policy) and ohlc_downsample vs
pure-Python restatements on random sparse integer series."""

from __future__ import annotations

import math
import statistics

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from process_alphafold3_outputs_spark.operators.temporal import (
    ohlc_downsample,
    time_bucket_gapfill,
)

_SET = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

obs = st.tuples(
    st.sampled_from(["a", "b"]),
    st.integers(min_value=-50, max_value=50),  # t
    st.integers(min_value=-9, max_value=9),  # v
)


def _py_gapfill(rows, width, agg, fill):
    buckets: dict[tuple[str, int], list[float]] = {}
    for k, t, v in rows:
        b = t - (((t % width) + width) % width)
        buckets.setdefault((k, b), []).append(float(v))
    out = {}
    for key in {k for k, _, _ in rows}:
        bs = sorted(b for (k, b) in buckets if k == key)
        observed = {}
        for b in bs:
            vs = buckets[(key, b)]
            val = {
                "avg": sum(vs) / len(vs),
                "sum": sum(vs),
                "min": min(vs),
                "max": max(vs),
                "count": float(len(vs)),
            }[agg]
            observed[b] = round(val, 6)
        lo, hi = bs[0], bs[-1]
        series = list(range(lo, hi + 1, width))
        prev = None
        for b in series:
            if b in observed:
                out[(key, b)] = (len(buckets[(key, b)]), observed[b])
                prev = b
            else:
                if fill == "zero":
                    v = 0.0
                elif fill == "none":
                    v = None
                elif fill == "locf":
                    v = observed[prev]
                else:  # linear — interior gaps always have neighbors
                    nxt = next(x for x in series if x > b and x in observed)
                    pv, nv = observed[prev], observed[nxt]
                    v = round(pv + (nv - pv) * (b - prev) / (nxt - prev), 6)
                out[(key, b)] = (0, v)
    return out


@pytest.fixture(scope="module")
def runner(spark):
    def run(rows, **kw):
        df = spark.createDataFrame(rows, "k string, t long, v double")
        return {
            (r["k"], r["bucket"]): (r["n"], r["value"])
            for r in time_bucket_gapfill(df, ["k"], "t", "v", **kw).collect()
        }

    return run


@settings(**_SET)
@given(
    rows=st.lists(obs, min_size=1, max_size=12),
    width=st.sampled_from([3, 7, 10]),
    agg=st.sampled_from(["avg", "sum", "min", "max", "count"]),
    fill=st.sampled_from(["none", "zero", "locf", "linear"]),
)
def test_gapfill_matches_pure_python(runner, rows, width, agg, fill):
    rows = [(k, t, float(v)) for k, t, v in rows]
    got = runner(rows, width=width, agg=agg, fill=fill)
    want = _py_gapfill(rows, width, agg, fill)
    assert set(got) == set(want)
    for key in want:
        gn, gv = got[key]
        wn, wv = want[key]
        assert gn == wn, (key, got[key], want[key])
        if wv is None:
            assert gv is None, key
        else:
            assert gv == pytest.approx(wv, abs=1e-6), (
                key,
                got[key],
                want[key],
            )


@pytest.fixture(scope="module")
def ohlc_runner(spark):
    def run(rows, width):
        df = spark.createDataFrame(
            rows, "k string, t long, seq long, v double"
        )
        return {
            (r["k"], r["bucket"]): (
                r["n"], r["open"], r["high"], r["low"], r["close"]
            )
            for r in ohlc_downsample(
                df, ["k"], "t", "v", width, seq_col="seq"
            ).collect()
        }

    return run


@settings(**_SET)
@given(
    rows=st.lists(obs, min_size=1, max_size=12),
    width=st.sampled_from([3, 10]),
)
def test_ohlc_matches_pure_python(ohlc_runner, rows, width):
    # unique seq per row makes ties deterministic
    seqd = [(k, t, i, float(v)) for i, (k, t, v) in enumerate(rows)]
    got = ohlc_runner(seqd, width)
    groups: dict[tuple[str, int], list[tuple[int, int, float]]] = {}
    for k, t, seq, v in seqd:
        b = t - (((t % width) + width) % width)
        groups.setdefault((k, b), []).append((t, seq, v))
    for key, g in groups.items():
        g.sort()
        want = (
            len(g),
            g[0][2],
            max(v for _, _, v in g),
            min(v for _, _, v in g),
            g[-1][2],
        )
        assert got[key] == want, (key, got[key], want)
    assert set(got) == set(groups)
