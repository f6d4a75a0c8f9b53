"""Differential tests against the ACTUAL reference implementation
(SURVEY §5.2 #4): the pure-Python kernels (`find_consecutive_groups`,
`identify_interacting_residues`, `process_consecutive_interactions`)
are loaded from /root/reference at TEST RUNTIME via ast extraction +
exec — nothing is copied into this repo, and the Biopython-importing
module top level is never executed. Skipped when the reference isn't
present.
"""

from __future__ import annotations

import ast
import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

REF_PATH = "/root/reference/process_af3_outputs.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_PATH), reason="reference snapshot not available"
)


@pytest.fixture(scope="module")
def ref():
    """Exec only the three dependency-light reference functions."""
    import logging

    import pandas as pd

    src = open(REF_PATH).read()
    tree = ast.parse(src)
    wanted = {
        "find_consecutive_groups",
        "identify_interacting_residues",
        "process_consecutive_interactions",
    }
    ns: dict = {"logging": logging, "pd": pd}
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in wanted:
            exec(compile(ast.Module([node], []), REF_PATH, "exec"), ns)
    assert wanted <= set(ns)
    return ns


# ---------------------------------------------------------------------------
# islands kernel vs the reference's find_consecutive_groups
# ---------------------------------------------------------------------------
@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    values=st.sets(st.integers(min_value=0, max_value=120), max_size=40),
    max_gap=st.integers(min_value=1, max_value=4),
    min_length=st.integers(min_value=1, max_value=5),
)
def test_model_islands_match_reference(ref, values, max_gap, min_length):
    from . import reference_model as model

    got = model.grouped(sorted(values), max_gap=max_gap, min_length=min_length)
    want = ref["find_consecutive_groups"](
        sorted(values), max_gap=max_gap, min_length=min_length
    )
    assert got == want


def test_spark_islands_match_reference(ref, spark):
    import random

    rng = random.Random(11)
    cases = [
        sorted(rng.sample(range(80), rng.randint(0, 30))) for _ in range(12)
    ]
    rows = [("g%d" % i, v) for i, vals in enumerate(cases) for v in vals]
    if not rows:
        return
    from process_alphafold3_outputs_spark.operators.islands import find_islands

    df = spark.createDataFrame(rows, "grp string, v int")
    kept = find_islands(df, ["grp"], "v", 2, 3).collect()
    got: dict[str, dict[int, list[int]]] = {}
    for r in kept:
        got.setdefault(r.grp, {}).setdefault(r.island_start, []).append(r.v)
    for i, vals in enumerate(cases):
        want = {
            g[0]: sorted(g)
            for g in ref["find_consecutive_groups"](vals, max_gap=2, min_length=3)
        }
        mine = {k: sorted(v) for k, v in got.get("g%d" % i, {}).items()}
        assert mine == want


# ---------------------------------------------------------------------------
# PAE threshold kernel vs the reference's identify_interacting_residues
# ---------------------------------------------------------------------------
def test_interacting_residues_match_reference(ref, spark):
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(5)
    rows = []
    chain_rows = []
    expected: dict[str, list[int]] = {}
    for i in range(8):
        la, lb = 6 + i % 4, 5 + i % 3
        n = la + lb
        mat = rng.rand(n, n) * 30
        mat[0:la, la : la + 3] = 2.0  # plant a low block
        job = f"j{i}"
        pae_df = pd.DataFrame(mat)
        expected[job] = ref["identify_interacting_residues"](
            pae_df, [la, lb], "A", "B", 15.0, 3
        )
        for r in range(n):
            for c in range(n):
                rows.append((job, r, c, float(mat[r][c])))
        chain_rows.append((job, "A", 0, la))
        chain_rows.append((job, "B", 1, lb))

    from process_alphafold3_outputs_spark.operators.intervals import (
        identify_interacting_residues,
    )
    from process_alphafold3_outputs_spark.params import ScreenParams

    pae = spark.createDataFrame(
        rows, "job string, scored_token int, aligned_token int, pae float"
    )
    chains = spark.createDataFrame(
        chain_rows, "job string, chain_id string, chain_index int, token_length int"
    )
    params = ScreenParams(min_residues_cutoff=3)
    got: dict[str, list[int]] = {}
    for r in identify_interacting_residues(pae, chains, params).collect():
        got.setdefault(r.job, []).append(r.partner_res)
    for job, want in expected.items():
        assert sorted(got.get(job, [])) == sorted(want), job


# ---------------------------------------------------------------------------
# two-level islands vs the reference's process_consecutive_interactions
# ---------------------------------------------------------------------------
def test_two_level_islands_match_reference(ref, spark):
    import random

    rng = random.Random(23)
    contact_maps = []
    for _ in range(10):
        cmap = {}
        for k in sorted(rng.sample(range(1, 40), rng.randint(0, 15))):
            cmap[k] = sorted(rng.sample(range(1, 30), rng.randint(1, 6)))
        contact_maps.append(cmap)

    rows = [
        (f"j{i}", k, p)
        for i, cmap in enumerate(contact_maps)
        for k, ps in cmap.items()
        for p in ps
    ]
    if not rows:
        return
    from process_alphafold3_outputs_spark.plans.pipeline import two_level_islands

    contacts = spark.createDataFrame(rows, "job string, partner_res int, poi_res int")
    got: dict[str, set] = {}
    for r in two_level_islands(contacts).collect():
        got.setdefault(r.job, set()).add((r.p_min, r.p_max, r.c_min, r.c_max))

    for i, cmap in enumerate(contact_maps):
        # the reference iterates a raw set for level 2 — feed it sorted
        # (its own docstring requirement; SURVEY §2.2 #7)
        ci = ref["process_consecutive_interactions"](
            {k: sorted(v) for k, v in cmap.items()}
        )
        want = set()
        for grp, cgs in ci.items():
            for cg in cgs:
                want.add((min(grp), max(grp), min(cg), max(cg)))
        assert got.get(f"j{i}", set()) == want, f"j{i}"
