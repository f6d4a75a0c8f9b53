"""Physical layout (job-bucketed parquet + partition pruning), the
error side-output, the salted aggregation, and the stateful streaming
dedup operator."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from process_alphafold3_outputs_spark.operators.util import two_phase_agg
from process_alphafold3_outputs_spark.sources.af3_json import read_summary_errors
from process_alphafold3_outputs_spark.sources.layout import (
    read_for_jobs,
    write_job_bucketed,
)


def test_job_bucketed_layout_prunes_partitions(spark, af3, tmp_path):
    path = str(tmp_path / "pae_bucketed")
    write_job_bucketed(af3["pae_long"], path, n_buckets=8)
    assert any(d.startswith("job_bucket=") for d in os.listdir(path))

    jobs = ["fold_poi_partner_0002"]
    got = read_for_jobs(spark, path, jobs, n_buckets=8)
    assert {r.job for r in got.select("job").distinct().collect()} == set(jobs)
    # partition pruning visible in the plan
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "job_bucket" in plan
    src = af3["pae_long"].filter(F.col("job") == jobs[0]).count()
    assert got.count() == src


def test_summary_errors_side_output(spark, tmp_path):
    from process_alphafold3_outputs_spark.fixtures import write_file_corpus

    d = str(tmp_path / "corpus")
    write_file_corpus(d, n_jobs=3, seed=1)
    errs = read_summary_errors(spark, d).collect()
    assert any("corrupt_json_job" in e.path for e in errs)
    # the latin-1 file fails the utf-8 JVM parse and is reported too
    # (the robust reader separately recovers it into the data path)
    assert all(e.raw_prefix for e in errs)


def test_two_phase_agg_equals_plain(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    salted = {
        (r.l_returnflag): (round(r.total, 2), r.n_rows)
        for r in two_phase_agg(li, ["l_returnflag"], "l_quantity").collect()
    }
    plain = {
        (r.l_returnflag): (round(r.total, 2), r.n)
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("total"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert salted == plain


def test_streaming_exact_dedup_across_batches(spark, tmp_path):
    from process_alphafold3_outputs_spark.streaming.state import (
        streaming_exact_dedup,
    )

    src = str(tmp_path / "docs_src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    batch1 = spark.createDataFrame(
        [(1, "hello world"), (2, "unique one"), (3, "hello world")],
        "doc_id long, text string",
    )
    batch1.write.mode("append").parquet(src)

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    dedup = streaming_exact_dedup(stream)
    q = (
        dedup.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        first = {
            r.doc_id for r in spark.sql("SELECT * FROM dedup_out").collect()
        }
        # batch 2: a repeat of "hello world" (must be dropped — state
        # remembers across batches) and one new text
        spark.createDataFrame(
            [(10, "hello world"), (11, "brand new")],
            "doc_id long, text string",
        ).write.mode("append").parquet(src)
        q.processAllAvailable()
        second = {
            r.doc_id for r in spark.sql("SELECT * FROM dedup_out").collect()
        }
    finally:
        q.stop()

    assert first == {1, 2}  # min doc_id per group in batch 1
    assert second == {1, 2, 11}  # 10 deduped against state, 11 new


def test_streaming_lsh_near_dedup_across_batches(spark, tmp_path):
    """Band-bucket state must flag near-dups within a batch AND against
    earlier batches; the emitted edges carry the bucket keeper. The
    streaming per-row signature must agree with the batch kernel (same
    md5 band arithmetic), so identical text ⇒ all bands match."""
    from process_alphafold3_outputs_spark.streaming.state import (
        streaming_lsh_near_dedup,
    )

    src = str(tmp_path / "lsh_src")
    ckpt = str(tmp_path / "lsh_ckpt")
    os.makedirs(src)

    base = ("the quick brown fox jumps over the lazy dog while the band "
            "plays a slow tune for the silent crowd tonight")
    other = "completely different text about distributed query engines"
    spark.createDataFrame(
        [(1, base), (2, other), (3, base)], "doc_id long, text string"
    ).write.mode("append").parquet(src)

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    edges = streaming_lsh_near_dedup(stream, n_bands=4, rows_per_band=3)
    q = (
        edges.writeStream.outputMode("append")
        .format("memory")
        .queryName("lsh_edges")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        first = [
            (r.doc_id, r.keeper_doc_id)
            for r in spark.sql("SELECT * FROM lsh_edges").collect()
        ]
        # same-batch duplicate: doc 3 == doc 1 ⇒ all 4 bands emit (3→1)
        assert set(first) == {(3, 1)} and len(first) == 4
        # batch 2: another copy arrives much later ⇒ deduped vs STATE
        spark.createDataFrame(
            [(10, base), (11, "yet more unrelated words entirely")],
            "doc_id long, text string",
        ).write.mode("append").parquet(src)
        q.processAllAvailable()
        second = [
            (r.doc_id, r.keeper_doc_id)
            for r in spark.sql("SELECT * FROM lsh_edges").collect()
        ]
    finally:
        q.stop()
    assert set(second) == {(3, 1), (10, 1)}
    assert len([e for e in second if e == (10, 1)]) == 4  # one per band
    assert not any(d in (2, 11) for d, _ in second)  # uniques untouched


def test_streaming_segment_dedup_cross_batch(spark, tmp_path):
    """A segment emitted in batch 1 must suppress its re-appearance in
    batch 2; within a batch the (doc_id, chunk_id) minimum wins — the
    batch kernel's first-occurrence rule, cross-batch."""
    import os

    from process_alphafold3_outputs_spark.streaming.state import (
        streaming_segment_dedup,
    )

    src = str(tmp_path / "segsrc")
    os.makedirs(src)

    def drop(name, rows):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("overwrite").parquet(os.path.join(src, name))

    drop("b1", [(1, "a b c d"), (2, "a b x y")])
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        streaming_segment_dedup(stream, seg_words=2)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("seg_dedup_out")
        .start()
    )
    try:
        q.processAllAvailable()
        first = {
            (r.doc_id, r.chunk_id, r.chunk_text)
            for r in spark.sql("SELECT * FROM seg_dedup_out").collect()
        }
        # batch 2: doc 3 repeats "a b" and "c d"; only "z z" is new
        drop("b2", [(3, "a b c d z z")])
        q.processAllAvailable()
        final = {
            (r.doc_id, r.chunk_id, r.chunk_text)
            for r in spark.sql("SELECT * FROM seg_dedup_out").collect()
        }
    finally:
        q.stop()

    assert (1, 0, "a b") in first and (1, 1, "c d") in first
    assert (2, 1, "x y") in first
    # doc 2 lost its "a b" to doc 1 (lower doc_id, same batch)
    assert not any(d == 2 and t == "a b" for d, _, t in first)
    new = final - first
    assert new == {(3, 2, "z z")}


# --------------------------------------------------------------------------
# Z-order clustering
# --------------------------------------------------------------------------


def test_zorder_key_interleaves_known_bits(spark):
    from process_alphafold3_outputs_spark.sources.layout import zorder_key

    # identity domains [0, 2^bits - 1] => scaled value == input value
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (15, 15)], "a long, b long"
    )
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select(
            "a", "b", zorder_key(F.col("a"), F.col("b"), 0, 15, 0, 15, 4).alias("z")
        ).collect()
    }

    def morton(a, b, bits=4):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i + 1) | ((b >> i) & 1) << (2 * i)
        return z

    for (a, b), z in got.items():
        assert z == morton(a, b), (a, b, z)


def test_write_zordered_tightens_file_stats_on_both_columns(spark, tmp_path):
    """The point of the Z-rewrite: a point/range predicate on EITHER
    column should be able to skip most files via footer min/max. Write
    the same table unsorted and z-ordered and compare how many files a
    mid-domain point predicate intersects."""
    import pyarrow.parquet as pq

    from process_alphafold3_outputs_spark.sources.layout import write_zordered

    n, side = 4096, 64  # a 64x64 grid, shuffled arrival order
    rows = [((i * 2654435761) % n,) for i in range(n)]
    df = (
        spark.createDataFrame(rows, "k long")
        .select((F.col("k") % side).alias("x"), (F.col("k") / side).cast("long").alias("y"))
    )
    plain, zpath = str(tmp_path / "plain"), str(tmp_path / "zord")
    df.repartition(16).write.parquet(plain)
    write_zordered(df, zpath, "x", "y", 0, side - 1, 0, side - 1, bits=6, n_files=16)

    def hit_fraction(path, col, val):
        files = [
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
        ]
        hits = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
            hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
            hits += lo <= val <= hi
        return hits / len(files)

    for col in ("x", "y"):
        assert hit_fraction(plain, col, side // 2) == 1.0  # shuffled: no skipping
        assert hit_fraction(zpath, col, side // 2) <= 0.5  # z-clustered: most files skip


def test_compact_parquet_collapses_small_files(spark, tmp_path):
    from process_alphafold3_outputs_spark.sources.layout import compact_parquet

    src, dst = str(tmp_path / "small"), str(tmp_path / "compact")
    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    df.repartition(64).write.parquet(src)  # 64 tiny files
    n_src = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_src == 64

    n_req = compact_parquet(spark, src, dst, target_mb=512, sort_within_by=["k"])
    n_dst = len([f for f in os.listdir(dst) if f.endswith(".parquet")])
    assert n_req == n_dst == 1  # a few hundred KB -> one 512 MB-target file

    # content identical
    a = sorted(r["id"] for r in spark.read.parquet(dst).collect())
    assert a == list(range(10_000))


def test_write_ordered_shards_global_order_across_files(spark, tmp_path):
    """Shards read in file order must stream rows in order-key order:
    per-file ranges are disjoint AND each file is internally sorted —
    without any global single-partition sort in the plan."""
    import glob as _glob

    from process_alphafold3_outputs_spark.operators import text as _text
    from process_alphafold3_outputs_spark.sources.layout import (
        write_ordered_shards,
    )

    rows = [(i, f"doc {i}", "a" if i % 2 == 0 else "b") for i in range(500)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    ordered = _text.interleave_sources(docs, {"a": 3.0, "b": 1.0})
    out = str(tmp_path / "shards")
    write_ordered_shards(ordered, out, "order_key", n_shards=8)

    files = sorted(_glob.glob(out + "/part-*.parquet"))
    assert len(files) > 1
    ranges = []
    total = 0
    for f in files:
        vals = [r.order_key for r in spark.read.parquet(f).collect()]
        total += len(vals)
        if not vals:
            continue
        assert vals == sorted(vals), f"file {f} not internally sorted"
        ranges.append((min(vals), max(vals)))
    assert total == 500
    # part file name order == partition id order == disjoint ascending ranges
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, "shard ranges overlap"


def test_write_with_bloom_stores_bitmaps_and_identical_data(spark, tmp_path):
    """The bloom options must reach the parquet writer: the bloom file
    carries the extra bitmap bytes (per filtered column) while the DATA
    is identical — and a point-lookup still returns the right rows."""
    import glob
    import os

    from process_alphafold3_outputs_spark.sources.layout import (
        write_with_bloom,
    )

    df = spark.range(200_000).selectExpr(
        "id", "md5(cast(id as string)) AS k"
    )
    plain, bloomed = str(tmp_path / "plain"), str(tmp_path / "bloom")
    df.coalesce(1).write.mode("overwrite").option(
        "compression", "zstd"
    ).parquet(plain)
    write_with_bloom(df.coalesce(1), bloomed, ["k"], expected_ndv=200_000)

    size = lambda d: sum(  # noqa: E731
        os.path.getsize(p) for p in glob.glob(os.path.join(d, "*.parquet"))
    )
    # a 200k-ndv bloom bitmap is ~100+ KiB; data pages are identical
    assert size(bloomed) > size(plain) + 50_000
    a = spark.read.parquet(plain)
    b = spark.read.parquet(bloomed)
    assert b.count() == a.count() == 200_000
    probe = b.filter("k = md5('137')").collect()
    assert [r.id for r in probe] == [137]


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    """The write_bucketed_table contract: same key + same bucket count
    => the join plan contains NO Exchange (co-located bucketed scans),
    and with matching sortBy no explicit Sort either."""
    from process_alphafold3_outputs_spark.sources.layout import (
        write_bucketed_table,
    )
    from pyspark.sql import functions as F

    a = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    spark.sql("DROP TABLE IF EXISTS bkt_a")
    spark.sql("DROP TABLE IF EXISTS bkt_b")
    write_bucketed_table(a, "bkt_a", ["k"], n_buckets=8, sort_cols=["k"])
    write_bucketed_table(b, "bkt_b", ["k"], n_buckets=8, sort_cols=["k"])
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the shuffle-join path so the assertion is about
        # bucketing, not about broadcast sidestepping it
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 1000
        got = {
            (r.k, r.va, r.vb)
            for r in joined.filter(F.col("k") < 3).collect()
        }
        assert got == {(0, 0, 0), (1, 2, 3), (2, 4, 6)}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_bucketed_table_prunes_buckets_on_point_predicate(spark):
    from process_alphafold3_outputs_spark.sources.layout import (
        write_bucketed_table,
    )
    from pyspark.sql import functions as F

    spark.sql("DROP TABLE IF EXISTS bkt_p")
    df = spark.range(0, 4000).select(F.col("id").alias("k"))
    write_bucketed_table(df, "bkt_p", ["k"], n_buckets=16)
    auto = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    old = spark.conf.get(auto)
    try:
        # the auto planner drops bucketed scans it deems unneeded
        # (filter-only queries); force it so bucket pruning engages
        spark.conf.set(auto, "false")
        q = spark.table("bkt_p").filter(F.col("k") == 123)
        plan = q._jdf.queryExecution().executedPlan().toString()
        # the scan node reports the selected-bucket count
        assert "SelectedBucketsCount: 1 out of 16" in plan, plan
        assert q.count() == 1
    finally:
        spark.conf.set(auto, old)
        spark.sql("DROP TABLE IF EXISTS bkt_p")
