"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship on sf0.001 (smoke, rows>0).
``queries()`` / ``oracle_sql()`` — SURVEY §2 operator inventory, each
Spark query paired with a DuckDB-runnable ANSI-SQL oracle (the driver
compares row count + schema + order-insensitive value hash at sf0.01).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from process_alphafold3_outputs_spark.plans import driver_queries as _dq  # noqa: E402
from process_alphafold3_outputs_spark.plans import driver_queries_ext  # noqa: E402,F401  (registers extension queries)
from process_alphafold3_outputs_spark.plans import driver_queries_af3  # noqa: E402,F401  (registers AF3 pipeline queries)
from process_alphafold3_outputs_spark.plans import driver_queries_files  # noqa: E402,F401  (registers file-boundary source/sink queries)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on /root/testdata/sf0.001: gaps-and-islands sessionization
    of the events stream (the reference's core O23 kernel re-expressed as
    window transforms; SURVEY §2)."""
    return _dq.sessionize(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_dq._QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_dq._ORACLE)
