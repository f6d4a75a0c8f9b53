"""Plan contracts: the physical-plan properties the 100 TB design relies
on must not regress — pushdown into scans, column pruning, broadcast
join selection. (`.explain`-as-a-test, per SURVEY §4.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from process_alphafold3_outputs_spark.operators.intervals import (
    identify_interacting_residues,
)
from process_alphafold3_outputs_spark.params import ScreenParams


def formatted_plan(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_and_projection_reach_parquet_scan(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = li.filter(F.col("l_quantity") > 45.0).select("l_orderkey", "l_quantity")
    plan = formatted_plan(q)
    assert "GreaterThan(l_quantity,45.0)" in plan  # predicate pushdown
    assert "struct<l_orderkey:bigint,l_quantity:double>" in plan  # pruning


def test_pae_cutoff_pushed_into_scan(spark, af3):
    ir = identify_interacting_residues(af3["pae_long"], af3["chains"], ScreenParams())
    plan = formatted_plan(ir)
    assert "LessThan(pae,15.0)" in plan  # I7: filter BEFORE the N² table leaves disk
    # every join in the kernel broadcasts its tiny side; no sort-merge
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_dim_joins_broadcast(spark, sf_dir):
    from process_alphafold3_outputs_spark.plans.driver_queries import (
        revenue_per_nation,
    )

    plan = formatted_plan(revenue_per_nation(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2  # nation + region at minimum


def test_screen_is_scan_plus_filter_only(spark, af3):
    from process_alphafold3_outputs_spark.operators.screen import screen_binders

    plan = formatted_plan(screen_binders(af3["predictions"], ScreenParams()))
    assert "Exchange" not in plan  # the screen must not shuffle
