"""Readers for the driver's parquet test tables (TESTDATA.md).

Plain ``spark.read.parquet`` — columnar scan with predicate pushdown,
column pruning and row-group skipping for free. At 100 TB the same
call works against a partitioned table root; nothing here assumes
single-file layout.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: embeddings.embedding dimensionality (TESTDATA.md table contract —
#: fixed-width array<float>; operators take ``dim`` as a parameter so
#: no Spark job ever fires at plan-build time to probe it)
EMBEDDING_DIM = 64

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet carries INT64 TIMESTAMP(NANOS) which Spark's
        # parquet reader rejects; read the raw nanos as LONG. Queries
        # convert with ``ts div 1e9`` (exact integer math — double
        # division would lose sub-second precision at 1.7e18 nanos).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
