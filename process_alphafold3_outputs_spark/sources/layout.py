"""Physical layout helpers for the big AF3 tables (SURVEY §4.3).

At 100 TB, ``pae_long`` / ``atoms`` must land partitioned so per-job
work prunes at the directory level and per-job joins co-locate. Jobs
are high-cardinality, so the partition column is a bounded hash bucket
of the job key; readers filtering one job (or a compact job set) derive
its bucket and prune every other directory.
"""

from __future__ import annotations

import re

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


def zorder_key(
    a, b, a_min: int, a_max: int, b_min: int, b_max: int, bits: int = 16
):
    """Morton (Z-order) interleave of two integer columns as a pure
    Column — the multi-dimensional clustering key behind Delta/Iceberg
    ``OPTIMIZE ZORDER BY``: sorting by it clusters rows so that BOTH
    columns' per-file min/max ranges stay narrow, and point/range
    predicates on EITHER column row-group-skip after the rewrite (a
    single-column sort only ever helps that one column).

    Each value is min-max scaled into ``bits`` bits against a
    caller-known [min, max] domain (domains are table metadata at
    100 TB — deriving them here would cost a full scan), then bit i of
    a/b lands at position 2i+1 / 2i. Pure shift/AND arithmetic —
    whole-stage codegen, no UDF; exactly restatable in ANSI SQL
    (``floor`` of the scale division on both sides — Spark's
    cast-to-long truncates where DuckDB's rounds, so neither cast is
    used; exact while (hi-lo)·(2^bits − 1) < 2^53).
    """
    def scaled(col, lo, hi):
        span = max(hi - lo, 1)
        c = F.least(F.greatest(col.cast("long"), F.lit(lo)), F.lit(hi))
        return F.floor((c - F.lit(lo)) * F.lit((1 << bits) - 1) / F.lit(span))

    sa, sb = scaled(a, a_min, a_max), scaled(b, b_min, b_max)
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftrightunsigned(sa, i).bitwiseAND(F.lit(1)), 2 * i + 1)
            + F.shiftleft(F.shiftrightunsigned(sb, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    a: str,
    b: str,
    a_min: int,
    a_max: int,
    b_min: int,
    b_max: int,
    bits: int = 16,
    n_files: int = 32,
    codec: str = "zstd",
) -> None:
    """Rewrite ``df`` clustered on the Z-curve of (a, b):
    range-partition by the Morton key (``repartitionByRange`` samples
    the key — no global single-partition sort) and sort within each
    partition, so every output file covers one compact Z-range and its
    parquet footer min/max stats stay tight on BOTH columns."""
    key = zorder_key(
        F.col(a), F.col(b), a_min, a_max, b_min, b_max, bits
    ).alias("_z")
    (
        df.withColumn("_z", key)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .option("compression", codec)
        .parquet(path)
    )


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_mb: int = 512,
    sort_within_by: list[str] | None = None,
    codec: str = "zstd",
) -> int:
    """Compact a small-files parquet directory into ~``target_mb``
    output files — the operational fix for the classic small-files
    problem (a streaming sink or over-parallel writer leaves thousands
    of KB-sized files; every later scan then pays one task + one footer
    read per file, and the NameNode/listing cost grows unbounded).

    File count = ceil(current_bytes / target_mb) from the SOURCE
    LISTING (no data scan to size the job; local-filesystem walk here —
    an object-store deployment swaps in its listing API, the rewrite
    plan is unchanged); the rewrite itself is one pass — a coalesce
    when shrinking (no shuffle; compaction is always a shrink) plus an
    optional ``sortWithinPartitions`` to restore row-group stat
    clustering. Returns the number of output files requested. Content
    equality and file-count collapse are pytest-pinned.
    """
    import math
    import os

    total = 0
    for root, _dirs, files in os.walk(src):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(src)
    out = df.coalesce(n_files)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    out.write.mode("overwrite").option("compression", codec).parquet(dst)
    return n_files


def write_ordered_shards(
    df: DataFrame,
    path: str,
    order_col: str,
    n_shards: int = 32,
    codec: str = "zstd",
) -> None:
    """Write ``df`` as training shards that, read in file order, stream
    rows in ``order_col`` order — the materialization step after a
    mixture-interleave (:func:`~..operators.text.interleave_sources`
    emits the order key; this writes the curriculum).

    ``repartitionByRange`` SAMPLES the key to pick shard boundaries —
    no global single-partition sort ever happens (the classic scale
    trap of ``orderBy().write``); ``sortWithinPartitions`` then orders
    each shard locally. Global order holds across shard boundaries
    because range partitions are disjoint and monotone by partition id
    (pinned by the layout pytest reading the files back)."""
    (
        df.repartitionByRange(n_shards, F.col(order_col))
        .sortWithinPartitions(order_col)
        .write.mode("overwrite")
        .option("compression", codec)
        .parquet(path)
    )


def write_with_bloom(
    df: DataFrame,
    path: str,
    bloom_cols: list[str],
    expected_ndv: int = 1_000_000,
    codec: str = "zstd",
) -> None:
    """Parquet write with per-column BLOOM FILTERS — the point-lookup
    pruning lever for 100 TB layouts: a reader filtering on
    ``col = literal`` consults the row group's bloom bitmap and skips
    groups that cannot contain the key, which dictionary/min-max stats
    cannot do for high-cardinality unsorted columns (a uuid/doc_id
    probe otherwise scans every group whose [min, max] straddles it —
    at random layout that is ALL of them).

    Uses the standard parquet-mr writer options
    (``parquet.bloom.filter.enabled#<col>`` /
    ``parquet.bloom.filter.expected.ndv#<col>``); size the ndv to the
    real distinct count — oversizing wastes footer bytes, undersizing
    inflates the false-positive rate and with it the skipped-group
    miss rate."""
    w = df.write.mode("overwrite").option("compression", codec)
    for c in bloom_cols:
        w = w.option(f"parquet.bloom.filter.enabled#{c}", "true")
        w = w.option(f"parquet.bloom.filter.expected.ndv#{c}", str(expected_ndv))
    w.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 64,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Save ``df`` as a Spark BUCKETED table (``bucketBy`` +
    ``saveAsTable``) — the ingest-once / join-many layout lever the
    directory-partition helpers above cannot provide: two tables
    bucketed by the same join key with the SAME bucket count join with
    ZERO Exchange (each task reads matching bucket files from both
    sides), and with matching ``sortBy`` the sort-merge join skips its
    sorts too. At 100 TB this turns every repeated fact-to-fact join
    on the bucket key from a full dual shuffle into a local merge —
    the single biggest recurring-shuffle eliminator Spark offers.

    Bucket pruning also applies: an equality predicate on the bucket
    column scans 1/n_buckets of the files. Requires a catalog
    (``saveAsTable``; plain ``.parquet(path)`` writes no bucket
    metadata and Spark will not trust the layout). The zero-Exchange
    contract is pinned by tests/test_layout_state.py."""
    w = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def file_stats(
    spark: SparkSession,
    path: str,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """(partition..., file_name, bytes) — one row per DATA file under
    ``path`` (local, ``hdfs://``, ``s3a://``), with hive-style ``k=v``
    path segments surfaced as columns for the requested
    ``partition_cols``. Control files (``_SUCCESS``, ``_metadata``,
    dotfiles) are skipped.

    Implemented as a ``binaryFile`` scan with the ``content`` column
    PRUNED AWAY: Spark's own file index performs the recursive listing
    JVM-side (parallelized across executors past the
    ``parallelPartitionDiscovery`` threshold), and ``BinaryFileFormat``
    only opens a file when the ``content`` column is required — so the
    scan is metadata-only, one row per file, at listing speed. The
    prior implementation iterated a Hadoop ``listFiles`` handle from
    Python, paying ~4 Py4J round trips per file: the bench layout probe
    measured it at 51 s for a 10 K-file tree vs sub-second for this
    form. Path segments are parsed relationally (regexp on the
    directory part), so the whole operator stays in the JVM.

    This is the input side of
    :func:`..operators.maintenance.compaction_plan` for plain parquet
    directories; at table-format scale (Delta / Iceberg) the manifest
    table replaces this listing and feeds the same planner."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    root = fs.getFileStatus(hpath).getPath().toString()
    pcols = partition_cols or []
    listing = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path", F.col("length").alias("bytes"))
    )
    # relative path under the canonical root; the listing already hides
    # _/.-prefixed names (Spark's file-index convention), the filter is
    # a defensive restatement of the contract
    rel = F.regexp_replace(
        "path", "^" + re.escape(root) + "/?", ""
    ).alias("file_name")
    base = listing.select(rel, "bytes").filter(
        ~F.element_at(F.split("file_name", "/"), -1).rlike("^[_.]")
    )
    dirpart = F.regexp_extract("file_name", r"^(.*/)?[^/]+$", 1)
    return base.select(
        *[
            F.when(
                dirpart.rlike(f"(^|/){re.escape(k)}="),
                F.regexp_extract(dirpart, f"(^|/){re.escape(k)}=([^/]*)", 2),
            ).alias(k)
            for k in pcols
        ],
        "file_name",
        "bytes",
    )
