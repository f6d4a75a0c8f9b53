"""Physical layout helpers for the big AF3 tables (SURVEY §4.3).

At 100 TB, ``pae_long`` / ``atoms`` must land partitioned so per-job
work prunes at the directory level and per-job joins co-locate. Jobs
are high-cardinality, so the partition column is a bounded hash bucket
of the job key; readers filtering one job (or a compact job set) derive
its bucket and prune every other directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def with_job_bucket(df: DataFrame, n_buckets: int = 64) -> DataFrame:
    return df.withColumn(
        "job_bucket", F.pmod(F.xxhash64("job"), F.lit(n_buckets)).cast("int")
    )


def write_job_bucketed(
    df: DataFrame, path: str, n_buckets: int = 64, codec: str = "zstd"
) -> None:
    """Write partitioned by job_bucket, sorted by job within partitions
    (row-group stat clustering → min/max skipping on the job column)."""
    (
        with_job_bucket(df, n_buckets)
        .repartition("job_bucket")
        .sortWithinPartitions("job")
        .write.mode("overwrite")
        .option("compression", codec)
        .partitionBy("job_bucket")
        .parquet(path)
    )


def read_for_jobs(
    spark: SparkSession, path: str, jobs: list[str], n_buckets: int = 64
) -> DataFrame:
    """Read only the buckets containing ``jobs``: the job_bucket
    predicate is a partition filter (directory pruning), the job
    predicate then row-group-skips inside the bucket."""
    df = spark.read.parquet(path)
    bucket_of = df.sparkSession.createDataFrame(
        [(j,) for j in jobs], "job string"
    ).select(F.pmod(F.xxhash64("job"), F.lit(n_buckets)).cast("int").alias("b"))
    buckets = [r.b for r in bucket_of.distinct().collect()]
    return df.filter(F.col("job_bucket").isin(buckets) & F.col("job").isin(jobs))
