"""Hypothesis property tests for the gaps-and-islands kernel (SURVEY §5.2 #3)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from process_alphafold3_outputs_spark.operators.islands import find_islands

from .reference_model import grouped

value_sets = st.sets(st.integers(min_value=0, max_value=200), min_size=0, max_size=60)
gaps = st.integers(min_value=1, max_value=5)
lengths = st.integers(min_value=1, max_value=6)


@pytest.fixture(scope="module")
def islands_runner(spark):
    def run(values: set[int], max_gap: int, min_length: int):
        if not values:
            return {}
        df = spark.createDataFrame(
            [("g", v) for v in sorted(values)], "grp string, v int"
        )
        kept = find_islands(df, ["grp"], "v", max_gap, min_length).collect()
        out: dict[int, list[int]] = {}
        for r in kept:
            out.setdefault(r.island_start, []).append(r.v)
        return {k: sorted(vs) for k, vs in out.items()}

    return run


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(values=value_sets, max_gap=gaps, min_length=lengths)
def test_islands_match_reference_algorithm(islands_runner, values, max_gap, min_length):
    got = islands_runner(values, max_gap, min_length)
    want = {
        g[0]: g for g in grouped(sorted(values), max_gap=max_gap, min_length=min_length)
    }
    assert got == want
    # invariants: island sizes >= min_length; intra-island gaps <= max_gap
    for start, members in got.items():
        assert len(members) >= min_length
        assert start == min(members)
        assert all(b - a <= max_gap for a, b in zip(members, members[1:]))
