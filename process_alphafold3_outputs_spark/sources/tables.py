"""Readers for the driver's parquet test tables (TESTDATA.md).

Plain ``spark.read.parquet`` — columnar scan with predicate pushdown,
column pruning and row-group skipping for free. At 100 TB the same
call works against a partitioned table root; nothing here assumes
single-file layout.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

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
    # Every date/timestamp -> epoch cast in the query suite assumes UTC
    # (DuckDB oracles treat naive temporals as UTC); pin the session
    # timezone so results match regardless of the host timezone of the
    # session we were handed.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # The driver has shipped events.ts under two encodings across
        # regenerations: INT64 TIMESTAMP(NANOS) (Spark's parquet reader
        # rejects it; read raw nanos as LONG — event_seconds() then
        # divides by 1e9) and plain TIMESTAMP (surfaces as
        # TIMESTAMP_NTZ; event_seconds() casts via the UTC session tz).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def event_seconds(df: DataFrame, col: str = "ts") -> Column:
    """Epoch-seconds (BIGINT) expression for the events ``ts`` column.

    Sniffs the bound dtype so queries survive the driver regenerating
    the test parquet with either encoding:

    - ``timestamp`` / ``timestamp_ntz``  -> ``cast(timestamp) cast(long)``
      (floor to whole seconds; session tz is UTC per ``load_table``)
    - ``bigint`` (epoch nanos)           -> ``col div 1e9`` (exact
      integer math — double division loses sub-second precision at
      1.7e18 nanos)
    """
    dtype = dict(df.dtypes).get(col, "bigint")
    if dtype.startswith("timestamp"):
        return F.col(col).cast("timestamp").cast("long")
    return F.expr(f"{col} div 1000000000")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
