"""Repo-wide physical-plan lint: every registered query's executed plan
is checked for the two classic scale-killers —

- ``CartesianProduct`` / non-broadcast ``NestedLoopJoin``: an O(N·M)
  join that slipped past a missing equi-condition (broadcast NLJ over a
  literal-sized side is allowed where whitelisted);
- ``BatchEvalPython`` (row-at-a-time Python UDF): the slow path this
  codebase bans — Python is allowed ONLY as Arrow-batched
  mapInPandas/applyInPandas islands, and only in the whitelisted
  file/codec/packing queries.

Plans are built against sf0.001 (analysis + physical planning only —
materialisation is the oracle mirror's job), so the lint adds seconds,
not minutes, and catches a regression in ANY query the moment it is
registered.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

QUERIES = entrymod.all_queries()

#: queries whose plan legitimately contains a broadcast nested-loop /
#: cartesian over a LITERAL-sized side (param grids), with the reason
CARTESIAN_OK = {
    "af3_param_sweep",       # cutoff grid: literal param list cross job rows
}

#: queries allowed an Arrow-batched Python island (mapInPandas /
#: applyInPandas) — the documented codec/parse/pack boundaries
ARROW_PYTHON_OK = {
    "file_read_atoms",             # mmCIF tokenizer
    "file_chains_from_cifs",       # mmCIF tokenizer
    "file_read_summaries",         # JSON read w/ encoding fallback (latin-1 retry)
    "file_sink_interaction_cifs",  # CIF writer
    "file_sink_overlay_models",    # CIF writer
    "file_sink_pymol_scripts",     # .pml file writer (sink executor)
    "multimodal_features",         # codec boundary
    "multimodal_features_real",    # asset synthesis + real decode
    "multimodal_phash_real",       # asset synthesis + real decode
    "multimodal_near_dup_real",    # asset synthesis + real decode
    "multimodal_frame_sample",     # codec boundary
    "af3_rmsd_overlay",            # Kabsch 3x3 SVD per (job, model)
    "text_compression_ratio",      # zlib DEFLATE island (C impl per batch)
}


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for name, fn in QUERIES.items():
        try:
            out[name] = (
                fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
            )
        except Exception as exc:  # noqa: BLE001 — lint must name the query
            pytest.fail(f"{name}: plan build failed: {exc}")
    return out


def test_no_unexpected_cartesian_products(plans):
    bad = {
        name
        for name, plan in plans.items()
        if "CartesianProduct" in plan and name not in CARTESIAN_OK
    }
    assert bad == set(), f"cartesian product in: {sorted(bad)}"


def test_no_row_at_a_time_python_udfs(plans):
    bad = {name for name, plan in plans.items() if "BatchEvalPython" in plan}
    assert bad == set(), f"row-at-a-time Python UDF in: {sorted(bad)}"


def test_arrow_python_islands_only_where_whitelisted(plans):
    markers = ("MapInPandas", "FlatMapGroupsInPandas", "ArrowEvalPython")
    bad = {
        name
        for name, plan in plans.items()
        if any(m in plan for m in markers) and name not in ARROW_PYTHON_OK
    }
    assert bad == set(), f"unexpected Python island in: {sorted(bad)}"
