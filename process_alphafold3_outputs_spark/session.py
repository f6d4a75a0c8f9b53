"""SparkSession factory tuned for the target execution profile.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` in one JVM; the configs
below are the ones that also matter on a real multi-executor cluster
(AQE, shuffle-partition sizing, Arrow for the pandas-UDF boundary).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "af3spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``spark.sql.shuffle.partitions`` is pinned to the core count: the
    default 200 over-parallelises local/small data, and AQE coalescing
    handles the rest. Session timezone is UTC so timestamp semantics
    match the DuckDB oracle.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        # UI off by default (test noise); bench.py turns it on to read
        # stage-level shuffle totals from the REST API for the scale probe
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
