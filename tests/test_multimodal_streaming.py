"""Multimodal plumbing (stubbed codecs, real Spark shape) and the
Structured Streaming ingest path."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from process_alphafold3_outputs_spark.operators import multimodal
from process_alphafold3_outputs_spark.params import ScreenParams
from process_alphafold3_outputs_spark.streaming.ingest import (
    session_stream,
    watch_summaries,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "spark engine"), (3, "hello world")],
        "doc_id long, text string",
    )
    return multimodal.from_documents(docs)


def test_media_schema_and_summary(media):
    assert dict(media.dtypes)["content"] == "binary"
    s = {r.modality: (r.n_assets, r.total_bytes) for r in multimodal.media_summary(media).collect()}
    assert s["text/blob"][0] == 3 and s["text/blob"][1] > 0


def test_fake_decode_is_deterministic(media):
    rows = {r.asset_id: r for r in multimodal.extract_features(media, fake=True).collect()}
    assert len(rows[1].features) == multimodal.FEATURE_DIM
    assert rows[1].features == rows[3].features  # same bytes -> same features
    assert rows[1].content_hash == rows[3].content_hash
    assert rows[1].features != rows[2].features
    assert all(0 <= f < 1 for f in rows[1].features)


def test_real_decode_raises(media):
    with pytest.raises(Exception) as ei:
        multimodal.extract_features(media, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_resize_and_frames_codec_boundary_raises(media):
    """Without fake=True the codec boundary raises AT EXECUTION (plans
    build fine — only the Python worker step is stubbed)."""
    with pytest.raises(Exception) as e1:
        multimodal.resize_images(media, 224, 224).collect()
    assert "NotImplementedError" in str(e1.value) or isinstance(
        e1.value, NotImplementedError
    )
    with pytest.raises(Exception) as e2:
        multimodal.sample_frames(media, 1000).collect()
    assert "NotImplementedError" in str(e2.value) or isinstance(
        e2.value, NotImplementedError
    )


def test_resize_plumbing_with_fake_codec(media):
    out = {r.asset_id: r for r in multimodal.resize_images(media, 224, 224, fake=True).collect()}
    assert len(out) == 3
    assert out[1].meta.width == 224 and out[1].meta.height == 224
    assert out[1].meta.codec == "fake-resized"
    # deterministic: same input bytes -> same fake-resized bytes
    assert bytes(out[1].content) == bytes(out[3].content)
    assert bytes(out[1].content) != bytes(out[2].content)


def test_sample_frames_fanout_with_fake_codec(spark):
    """Frame fan-out derives from meta.duration_ms: one row per step."""
    media = spark.createDataFrame(
        [
            (10, "video/mp4", b"blob-a", (640, 480, 3500, "h264")),
            (11, "video/mp4", b"blob-b", (640, 480, 900, "h264")),
            (12, "video/mp4", b"blob-c", (None, None, None, "h264")),  # no duration
        ],
        multimodal.MEDIA_SCHEMA,
    )
    rows = multimodal.sample_frames(media, 1000, fake=True).collect()
    by_asset = {}
    for r in rows:
        by_asset.setdefault(r.asset_id, []).append(r)
    assert sorted(r.frame_ms for r in by_asset[10]) == [0, 1000, 2000, 3000]
    assert sorted(r.frame_ms for r in by_asset[11]) == [0]
    assert 12 not in by_asset  # no duration -> no frames, no error
    # deterministic per (content, t)
    f0 = [bytes(r.content) for r in sorted(by_asset[10], key=lambda r: r.frame_ms)]
    assert len(set(f0)) == 4


def test_watch_folder_screen(spark, tmp_path):
    from process_alphafold3_outputs_spark.fixtures import write_file_corpus

    inbox = str(tmp_path / "inbox")
    out = str(tmp_path / "screened")
    ckpt = str(tmp_path / "ckpt")
    corpus = write_file_corpus(inbox, n_jobs=8, seed=5)

    q = watch_summaries(spark, inbox, out, ckpt, ScreenParams())
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.read.parquet(out)
    jobs = {r.job for r in got.collect()}
    from . import reference_model as model

    want = {
        p["job"]
        for p in corpus["predictions"].to_dict("records")
        if model.screen_job(p)
    }
    # latin-1 landmine is dropped on the streaming path (no fallback
    # reparse there); every utf-8 binder must be present
    assert want <= jobs


def test_session_window_stream(spark, tmp_path):
    src = str(tmp_path / "events_src")
    rows = [
        (1, "2024-01-01 00:00:00", 10.0),
        (1, "2024-01-01 00:10:00", 5.0),
        (1, "2024-01-01 02:00:00", 1.0),  # new session after 30-min gap
        (2, "2024-01-01 00:00:00", 7.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_s string, value double").select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value"
    )
    df.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("user_id long, ts timestamp, value double").parquet(src)
    agg = session_stream(stream, gap="30 minutes", watermark="0 seconds")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sessions_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.user_id, r.n_events, r.total_value)
            for r in spark.sql("SELECT * FROM sessions_out").collect()
        }
    finally:
        q.stop()
    assert (1, 2, 15.0) in got  # first session: two events within gap
    assert (1, 1, 1.0) in got
    assert (2, 1, 7.0) in got


def test_session_stream_drops_late_data_past_watermark(spark, tmp_path):
    """True watermark semantics in append mode: an event arriving AFTER
    the watermark has passed its session is dropped — the finalized
    session keeps its original count. Three micro-batches: (1) the
    session, (2) a fresh event far ahead that advances the watermark,
    (3) a late straggler inside the now-closed session."""
    import os

    src = str(tmp_path / "late_src")
    os.makedirs(src)
    schema = "user_id long, ts timestamp, value double"

    def write_batch(name, rows):
        df = spark.createDataFrame(
            rows, "user_id long, ts_s string, value double"
        ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value")
        df.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, name))

    write_batch("b1", [(1, "2024-01-01 10:00:00", 1.0), (1, "2024-01-01 10:05:00", 1.0)])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    agg = session_stream(stream, gap="30 minutes", watermark="30 minutes")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_sessions")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: event-time max jumps to 12:00 -> watermark 11:30 on
        # the NEXT batch, far past the first session's 10:35 end
        write_batch("b2", [(1, "2024-01-01 12:00:00", 1.0)])
        q.processAllAvailable()
        # batch 3: straggler at 10:06 (< watermark 11:30) must be DROPPED
        write_batch("b3", [(1, "2024-01-01 10:06:00", 99.0)])
        q.processAllAvailable()
        # batch 4: advance far enough to also close the 12:00 session
        write_batch("b4", [(1, "2024-01-01 14:00:00", 1.0)])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM late_sessions").collect()
    finally:
        q.stop()
    closed = {(r.session_start.strftime("%H:%M"), r.n_events, r.total_value) for r in rows}
    # first session finalized with its ORIGINAL two events, not the straggler
    assert ("10:00", 2, 2.0) in closed
    assert not any(v == 99.0 or v == 101.0 for _, _, v in closed)


def test_windowed_stream_matches_batch_tumbling(spark, tmp_path):
    """Stream↔batch parity: the finalized tumbling windows of the
    streaming aggregation equal the batch groupBy(window) over the same
    static data — one code shape, no drift."""
    from process_alphafold3_outputs_spark.streaming.ingest import windowed_stream

    src = str(tmp_path / "win_src")
    rows = [
        ("click", "2024-01-01 00:10:00", 1.0),
        ("click", "2024-01-01 05:59:59", 2.5),   # same 6h window
        ("click", "2024-01-01 06:00:00", 4.0),   # next window boundary
        ("view", "2024-01-01 01:00:00", 10.0),
        ("view", "2024-01-02 01:00:00", 0.25),   # next day
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts_s string, value double"
    ).select("event_type", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    df.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        "event_type string, ts timestamp, value double"
    ).parquet(src)
    q = (
        windowed_stream(stream, window="6 hours", watermark="0 seconds")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.event_type, r.window_start, r.n_events, r.total_value)
            for r in spark.sql("SELECT * FROM win_out").collect()
        }
    finally:
        q.stop()

    batch = {
        (r.event_type, r.window_start, r.n_events, r.total_value)
        for r in (
            df.groupBy(F.window("ts", "6 hours"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 2).alias("total_value"),
            )
            .select(
                "event_type",
                F.col("window.start").cast("long").alias("window_start"),
                "n_events",
                "total_value",
            )
        ).collect()
    }
    assert got == batch
    assert len(got) == 4  # two click windows, two view windows


def test_windowed_stream_sliding_multi_membership(spark, tmp_path):
    """slide < window: one event must appear in window/slide windows."""
    from process_alphafold3_outputs_spark.streaming.ingest import windowed_stream

    src = str(tmp_path / "slide_src")
    df = spark.createDataFrame(
        [("click", "2024-01-01 03:30:00", 1.0)],
        "event_type string, ts_s string, value double",
    ).select("event_type", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    df.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        "event_type string, ts timestamp, value double"
    ).parquet(src)
    q = (
        windowed_stream(stream, window="2 hours", slide="1 hour", watermark="0 seconds")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("slide_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            (r.window_start, r.window_end)
            for r in spark.sql("SELECT * FROM slide_out").collect()
        )
    finally:
        q.stop()
    # 03:30 falls into [02:00,04:00) and [03:00,05:00)
    assert len(got) == 2
    assert all(we - ws == 7200 for ws, we in got)
    assert got[1][0] - got[0][0] == 3600


def test_windowed_stream_append_emits_once_after_watermark(spark, tmp_path):
    """Append mode: a window row appears only after the watermark passes
    its end, and late events into that window are dropped."""
    import os

    from process_alphafold3_outputs_spark.streaming.ingest import windowed_stream

    src = str(tmp_path / "append_src")
    os.makedirs(src)
    schema = "event_type string, ts timestamp, value double"

    def write_batch(name, rows):
        spark.createDataFrame(
            rows, "event_type string, ts_s string, value double"
        ).select(
            "event_type", F.col("ts_s").cast("timestamp").alias("ts"), "value"
        ).write.mode("append").parquet(src)

    write_batch("b1", [("click", "2024-01-01 00:10:00", 1.0)])
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        windowed_stream(stream, window="1 hour", watermark="0 seconds")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("append_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # window [00:00,01:00) not yet finalized — nothing emitted
        assert spark.sql("SELECT * FROM append_out").count() == 0
        # far-future event advances the watermark past the window end
        write_batch("b2", [("click", "2024-01-01 09:00:00", 2.0)])
        q.processAllAvailable()
        rows = {
            (r.window_start, r.n_events, r.total_value)
            for r in spark.sql("SELECT * FROM append_out").collect()
        }
        assert (1704067200, 1, 1.0) in rows  # 2024-01-01 00:00 UTC epoch
        # a straggler into the finalized window is dropped
        write_batch("b3", [("click", "2024-01-01 00:20:00", 100.0)])
        q.processAllAvailable()
        write_batch("b4", [("click", "2024-01-01 23:00:00", 3.0)])
        q.processAllAvailable()
        final = {
            (r.window_start, r.n_events, r.total_value)
            for r in spark.sql("SELECT * FROM append_out").collect()
        }
    finally:
        q.stop()
    # the 00:00 window still shows exactly the pre-straggler aggregate
    assert (1704067200, 1, 1.0) in final
    assert not any(n == 2 and ws == 1704067200 for ws, n, _ in final)


def test_watch_documents_streams_quality_signals(spark, tmp_path):
    """Two parquet drops into the inbox: each micro-batch must produce
    the same signals the batch Gopher kernel computes, tagged by epoch,
    with no row processed twice."""
    import os

    from process_alphafold3_outputs_spark.operators.text import gopher_quality
    from process_alphafold3_outputs_spark.streaming.ingest import watch_documents

    inbox = str(tmp_path / "inbox")
    out = str(tmp_path / "quality_out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(inbox)
    schema = "doc_id long, text string, lang string, source string, n_chars long"

    def drop(rows):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(inbox)

    good = "the quick brown fox and that dog have fun with it " * 6
    drop([(1, good, "en", "web", len(good)), (2, "too short", "en", "web", 9)])
    q = watch_documents(spark, inbox, out, ckpt)
    try:
        q.processAllAvailable()
        drop([(3, good + "extra", "en", "books", len(good) + 5)])
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.read.parquet(out)
    assert got.count() == 3  # each doc exactly once across epochs
    by_id = {r["doc_id"]: r for r in got.collect()}
    assert by_id[1]["keep"] == 1 and by_id[2]["keep"] == 0 and by_id[3]["keep"] == 1
    # signal parity with the direct batch kernel
    batch = {
        r["doc_id"]: r
        for r in gopher_quality(
            spark.read.parquet(inbox)
        ).collect()
    }
    for did, row in by_id.items():
        for c in ("n_words", "mean_word_len", "alpha_word_frac", "keep"):
            assert row[c] == batch[did][c], (did, c)
    # the two drops arrived in different epochs
    assert len({r["epoch_id"] for r in got.collect()}) == 2


def test_interval_join_stream_matches_batch(spark, tmp_path):
    """Stream-stream interval join parity: the SAME interval_join code
    over two file-source streams emits exactly the rows the batch run
    produces over the same static data (attribution: each click joins
    the views of its user within the 10 minutes before it)."""
    from process_alphafold3_outputs_spark.streaming.ingest import interval_join

    csrc, vsrc = str(tmp_path / "clicks"), str(tmp_path / "views")
    clicks = [
        (1, "2024-01-01 00:10:00", "click", 1.0),
        (1, "2024-01-01 00:30:00", "click", 2.0),
        (2, "2024-01-01 00:10:00", "click", 3.0),
    ]
    views = [
        (1, "2024-01-01 00:05:00", "view", 0.5),   # joins click@00:10 only
        (1, "2024-01-01 00:22:00", "view", 0.7),   # joins click@00:30 only
        (1, "2024-01-01 00:31:00", "view", 0.9),   # after both clicks: no join
        (2, "2024-01-01 00:09:59", "view", 0.1),   # joins click@00:10
        (3, "2024-01-01 00:10:00", "view", 0.2),   # key with no clicks
    ]
    schema = "user_id long, ts_s string, event_type string, value double"

    def mkdf(rows):
        return spark.createDataFrame(rows, schema).select(
            "user_id", F.col("ts_s").cast("timestamp").alias("ts"),
            "event_type", "value",
        )

    mkdf(clicks).write.parquet(csrc)
    mkdf(views).write.parquet(vsrc)
    stream_schema = "user_id long, ts timestamp, event_type string, value double"
    cs = spark.readStream.schema(stream_schema).parquet(csrc)
    vs = spark.readStream.schema(stream_schema).parquet(vsrc)

    q = (
        interval_join(cs, vs, within="10 minutes", watermark="0 seconds")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ij_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.user_id, str(r.c_ts), str(r.v_ts))
            for r in spark.sql("SELECT * FROM ij_out").collect()
        }
    finally:
        q.stop()

    batch = {
        (r.user_id, str(r.c_ts), str(r.v_ts))
        for r in interval_join(
            mkdf(clicks), mkdf(views), within="10 minutes"
        ).collect()
    }
    assert got == batch
    assert got == {
        (1, "2024-01-01 00:10:00", "2024-01-01 00:05:00"),
        (1, "2024-01-01 00:30:00", "2024-01-01 00:22:00"),
        (2, "2024-01-01 00:10:00", "2024-01-01 00:09:59"),
    }


def test_watch_documents_dedup_across_epochs(spark, tmp_path):
    """Cross-epoch exact dedup with restart-safe parquet state: a doc
    re-dropped in a later epoch (or duplicated within one) must not
    reach the keeper table twice."""
    from process_alphafold3_outputs_spark.streaming.ingest import (
        watch_documents_dedup,
    )

    inbox = str(tmp_path / "inbox")
    out = str(tmp_path / "kept")
    hashes = str(tmp_path / "hashes")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string, lang string, source string, n_chars long"

    def drop(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(inbox)

    drop([(1, "alpha", "en", "s", 5), (2, "beta", "en", "s", 4),
          (3, "alpha", "en", "s", 5)])  # intra-batch dup of 1
    q = watch_documents_dedup(spark, inbox, out, hashes, ckpt)
    try:
        q.processAllAvailable()
        got0 = {r["doc_id"] for r in spark.read.parquet(out).collect()}
        assert got0 == {1, 2}

        # epoch 1: one repeat ("alpha") + one new
        drop([(4, "alpha", "en", "s", 5), (5, "gamma", "en", "s", 5)])
        q.processAllAvailable()
        got1 = {r["doc_id"] for r in spark.read.parquet(out).collect()}
        assert got1 == {1, 2, 5}
    finally:
        q.stop()

    # the rolled-forward hash table holds all three distinct texts
    # (latest committed snapshot — state is versioned per epoch)
    from process_alphafold3_outputs_spark.streaming.ingest import read_state
    assert read_state(spark, hashes, "text_hash string").count() == 3


def test_watch_documents_scored_matches_batch(spark, tmp_path):
    """Stream-scored fluency equals batch scoring with the same
    pretrained model (scoring is per-doc with a static model — no
    cross-doc state), and unseen bigrams take the alpha-floor rather
    than being dropped."""
    from process_alphafold3_outputs_spark.operators.text import (
        bigram_lm_model,
        score_with_bigram_model,
    )
    from process_alphafold3_outputs_spark.streaming.ingest import (
        watch_documents_scored,
    )

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    train = spark.createDataFrame(
        [
            (100, "the cat sat on the mat", "en", "s", 22),
            (101, "the dog sat on the rug", "en", "s", 22),
        ],
        schema,
    )
    model_path = str(tmp_path / "model")
    bigram_lm_model(train).write.parquet(model_path)

    inbox = str(tmp_path / "inbox")
    out = str(tmp_path / "scored")
    ckpt = str(tmp_path / "ckpt")
    rows0 = [(1, "the cat sat on the rug", "en", "s", 22)]
    rows1 = [(2, "quantum flux capacitors hum loudly", "en", "s", 34),
             (3, "solo", "en", "s", 4)]
    spark.createDataFrame(rows0, schema).coalesce(1).write.mode("append").parquet(inbox)
    q = watch_documents_scored(spark, inbox, model_path, out, ckpt)
    try:
        q.processAllAvailable()
        spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(inbox)
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = {
        r["doc_id"]: (r["n_bigrams"], r["avg_nll"], r["ppl"])
        for r in spark.read.parquet(out).collect()
    }
    model = spark.read.parquet(model_path)
    batch = {
        r["doc_id"]: (r["n_bigrams"], r["avg_nll"], r["ppl"])
        for r in score_with_bigram_model(
            spark.createDataFrame(rows0 + rows1, schema), model
        ).collect()
    }
    assert streamed == batch
    # unseen-heavy doc 2 scores strictly worse (alpha-floor) than the
    # in-distribution doc 1; short doc 3 carries the 0/NULL contract
    assert streamed[2][1] > streamed[1][1]
    assert streamed[3] == (0, None, None)


def test_watch_media_dedup_perceptual_across_epochs(spark, tmp_path):
    """A perceptually-near image re-dropped in a later epoch (or
    duplicated within one) must not reach the keeper table twice;
    genuinely different images pass."""
    import numpy as np

    from process_alphafold3_outputs_spark.operators import codecs
    from process_alphafold3_outputs_spark.streaming.ingest import (
        watch_media_dedup,
    )

    rng = np.random.RandomState(5)
    base = rng.randint(0, 256, (16, 16, 3)).astype("uint8")
    near = base.copy()
    near[0, 0] = (near[0, 0].astype(int) + 2).clip(0, 255).astype("uint8")
    other = rng.randint(0, 256, (16, 16, 3)).astype("uint8")

    schema = ("asset_id long, modality string, content binary, "
              "meta struct<width:int, height:int, duration_ms:int, codec:string>")

    def drop(rows):
        spark.createDataFrame(
            [(i, "image/bmp", bytearray(codecs.encode_bmp(img)),
              {"width": img.shape[1], "height": img.shape[0],
               "duration_ms": None, "codec": "bmp"})
             for i, img in rows],
            schema,
        ).coalesce(1).write.mode("append").parquet(inbox)

    inbox = str(tmp_path / "inbox")
    out = str(tmp_path / "kept")
    hashes = str(tmp_path / "hashes")
    ckpt = str(tmp_path / "ckpt")

    drop([(1, base), (2, near)])          # 2 is an intra-batch near-dup
    q = watch_media_dedup(spark, inbox, out, hashes, ckpt, max_hamming=8)
    try:
        q.processAllAvailable()
        got0 = {r["asset_id"] for r in spark.read.parquet(out).collect()}
        assert got0 == {1}

        drop([(3, near), (4, other)])     # 3 repeats epoch-0 content
        q.processAllAvailable()
        got1 = {r["asset_id"] for r in spark.read.parquet(out).collect()}
        assert got1 == {1, 4}
    finally:
        q.stop()
    from process_alphafold3_outputs_spark.streaming.ingest import read_state
    assert read_state(
        spark, hashes, "asset_id long, h_hi long, h_lo long"
    ).count() == 2


def test_watch_documents_near_dedup_across_epochs(spark, tmp_path):
    """A near-duplicate (one word changed) re-dropped in a later epoch
    must not reach the keeper table; novel docs pass."""
    from process_alphafold3_outputs_spark.streaming.ingest import (
        watch_documents_near_dedup,
    )

    base = ("the quick brown fox jumps over the lazy dog while the band "
            "plays a slow tune in the quiet town tonight")
    near = base.replace("slow", "fast")
    other = "entirely different content about query engines and shuffles here"

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    inbox = str(tmp_path / "inbox")
    out = str(tmp_path / "kept")
    bands = str(tmp_path / "bands")
    ckpt = str(tmp_path / "ckpt")

    def drop(rows):
        spark.createDataFrame(
            [(i, t, "en", "s", len(t)) for i, t in rows], schema
        ).coalesce(1).write.mode("append").parquet(inbox)

    drop([(1, base), (2, other)])
    q = watch_documents_near_dedup(spark, inbox, out, bands, ckpt)
    try:
        q.processAllAvailable()
        assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1, 2}
        drop([(3, near),
              (4, "brand new unseen sentence with many novel words inside")])
        q.processAllAvailable()
        got = {r.doc_id for r in spark.read.parquet(out).collect()}
        assert 3 not in got and 4 in got
    finally:
        q.stop()


def test_state_table_stays_compact_over_many_epochs(spark, tmp_path):
    """10 micro-batches must end with a single-digit-file state table
    (versioned snapshots, pruned + size-coalesced — the r4 verdict's
    state-lifecycle gap) and dedup decisions identical to running the
    batch kernel over the union."""
    import glob
    import os

    from process_alphafold3_outputs_spark.streaming.ingest import (
        read_state,
        watch_documents_dedup,
    )

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    inbox = str(tmp_path / "inbox")
    out = str(tmp_path / "kept")
    hashes = str(tmp_path / "hashes")
    ckpt = str(tmp_path / "ckpt")

    def drop(epoch):
        # each drop: one brand-new text + one repeat of epoch 0's
        rows = [(epoch * 10, f"text number {epoch}", "en", "s", 10),
                (epoch * 10 + 1, "text number 0", "en", "s", 10)]
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(inbox)

    drop(0)  # inbox must exist before the stream starts
    q = watch_documents_dedup(spark, inbox, out, hashes, ckpt)
    try:
        q.processAllAvailable()
        for epoch in range(1, 10):
            drop(epoch)
            q.processAllAvailable()
    finally:
        q.stop()

    kept = {r.doc_id for r in spark.read.parquet(out).collect()}
    # exactly one keeper per distinct text: epoch 0's doc 1 is an
    # intra-batch dup of doc 0, every later epoch keeps only its novel doc
    assert kept == {e * 10 for e in range(10)}
    # state: all 10 distinct hashes, in at most 2 data files total
    n_state = read_state(spark, hashes, "text_hash string").count()
    assert n_state == 10
    data_files = glob.glob(os.path.join(hashes, "**", "*.parquet"),
                           recursive=True)
    assert len(data_files) <= 2, sorted(data_files)
    # and at most 2 snapshot dirs survive pruning
    snaps = [d for d in os.listdir(hashes) if d.startswith("v_")]
    assert len(snaps) <= 2, snaps


def test_state_replay_is_idempotent(spark, tmp_path):
    """Crash-replay semantics of the versioned state: re-running an
    epoch against the state reads (before_epoch) reproduces the same
    decisions, re-writing its snapshot and its epoch output in place —
    no duplicate rows, no state drift."""
    from process_alphafold3_outputs_spark.operators.dedup import (
        incremental_exact_dedup,
        incremental_hashes,
    )
    from process_alphafold3_outputs_spark.streaming.ingest import (
        _write_epoch_output,
        read_state,
        roll_state,
    )

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    out = str(tmp_path / "kept")
    hashes = str(tmp_path / "hashes")

    def run_epoch(epoch, rows):
        batch = spark.createDataFrame(rows, schema)
        seen = read_state(spark, hashes, "text_hash string",
                          before_epoch=epoch)
        kept = incremental_exact_dedup(batch, seen)
        _write_epoch_output(kept, out, epoch)
        roll_state(incremental_hashes(seen, batch), hashes, epoch)

    run_epoch(0, [(1, "alpha", "en", "s", 5)])
    run_epoch(1, [(2, "alpha", "en", "s", 5), (3, "beta", "en", "s", 4)])
    before = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    state_before = read_state(spark, hashes, "text_hash string").count()

    # crash-replay epoch 1: same epoch_id, same input
    run_epoch(1, [(2, "alpha", "en", "s", 5), (3, "beta", "en", "s", 4)])
    after = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert after == before == [1, 3]
    assert read_state(spark, hashes, "text_hash string").count() == state_before == 2


def test_watch_audio_dedup_spectral_across_epochs(spark, tmp_path):
    """A re-encoded (slightly noisy) copy of a clip re-dropped in a
    later epoch must not reach the keeper table; genuinely different
    audio passes — the spectral twin of the perceptual image watcher."""
    import numpy as np

    from process_alphafold3_outputs_spark.operators import codecs
    from process_alphafold3_outputs_spark.streaming.ingest import (
        read_state,
        watch_audio_dedup,
    )

    rate = 8000
    t = np.arange(rate) / rate
    base = np.sin(2 * np.pi * 440 * t) * np.exp(-t)
    near = base + np.random.RandomState(2).randn(rate) * 0.005
    other = np.sin(2 * np.pi * 1700 * t**2)

    schema = ("asset_id long, modality string, content binary, "
              "meta struct<width:int, height:int, duration_ms:int, codec:string>")

    def drop(rows):
        spark.createDataFrame(
            [(i, "audio/wav", bytearray(codecs.encode_wav(rate, s)),
              {"width": None, "height": None, "duration_ms": 1000,
               "codec": "pcm"})
             for i, s in rows],
            schema,
        ).coalesce(1).write.mode("append").parquet(inbox)

    inbox = str(tmp_path / "inbox")
    out = str(tmp_path / "kept")
    hashes = str(tmp_path / "hashes")
    ckpt = str(tmp_path / "ckpt")

    drop([(1, base), (2, near)])          # 2 is an intra-batch near-dup
    q = watch_audio_dedup(spark, inbox, out, hashes, ckpt, max_hamming=3)
    try:
        q.processAllAvailable()
        assert {r.asset_id for r in spark.read.parquet(out).collect()} == {1}
        drop([(3, near), (4, other)])     # 3 repeats epoch-0 content
        q.processAllAvailable()
        got = {r.asset_id for r in spark.read.parquet(out).collect()}
        assert got == {1, 4}
    finally:
        q.stop()
    assert read_state(
        spark, hashes, "asset_id long, h_hi long, h_lo long"
    ).count() == 2


def test_lsh_band_watcher_replay_between_append_and_state_swap(spark, tmp_path):
    """The exact crash window ADVICE r5 flagged for the LSH band
    watcher: the epoch's output append lands but the process dies
    BEFORE roll_state swaps the band snapshot in. On restart,
    foreachBatch replays the epoch with the same epoch_id; the replay
    must (a) read the pre-epoch state (its own half-written epoch never
    visible), (b) overwrite its own epoch output in place — identical
    rows, no duplicate appends — and (c) leave the band table exactly
    as a never-crashed run would."""
    from process_alphafold3_outputs_spark.operators.dedup import (
        incremental_near_dedup,
    )
    from process_alphafold3_outputs_spark.streaming.ingest import (
        _write_epoch_output,
        read_state,
        roll_state,
    )

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    band_schema = "doc_id long, band int, band_sig string"
    out = str(tmp_path / "kept")
    bands = str(tmp_path / "bands")

    base = "the quick brown fox jumps over the lazy dog again and again"
    near = base + " today"          # near-dup of base (shares bands)
    other = "completely different content about spark shuffle partitioning"

    epochs = {
        0: [(1, base, "en", "s", len(base))],
        1: [(2, near, "en", "s", len(near)),     # near-dups history doc 1
            (3, other, "en", "s", len(other))],  # novel
    }

    def run_epoch(epoch, crash_before_state_swap=False):
        batch = spark.createDataFrame(epochs[epoch], schema)
        seen = read_state(spark, bands, band_schema, before_epoch=epoch)
        kept, updated = incremental_near_dedup(batch, seen)
        _write_epoch_output(kept, out, epoch)
        if crash_before_state_swap:
            return  # simulated kill between append and state swap
        roll_state(updated, bands, epoch)

    run_epoch(0)
    run_epoch(1, crash_before_state_swap=True)
    # crashed run's output already landed; state still at epoch 0 only
    assert read_state(spark, bands, band_schema, before_epoch=1).count() > 0
    mid = sorted(
        (r.doc_id, r.text) for r in spark.read.parquet(out).collect()
    )

    run_epoch(1)  # restart: full replay of the same epoch
    after = sorted(
        (r.doc_id, r.text) for r in spark.read.parquet(out).collect()
    )
    assert after == mid == [(1, base), (3, other)]  # no duplicate appends
    # band table == a never-crashed run's: docs 1 and 3 contribute bands,
    # the near-dup 2 contributes none
    state = read_state(spark, bands, band_schema)
    assert set(r.doc_id for r in state.select("doc_id").distinct().collect()) == {1, 3}


def test_watch_documents_dsir_stream_equals_batch(spark, tmp_path):
    """Train the ratio table batch, score a 2-epoch stream, assert the
    union equals batch scoring with the same table."""
    from process_alphafold3_outputs_spark.operators.text import (
        dsir_bucket_logratios,
        dsir_score_with_ratios,
    )
    from process_alphafold3_outputs_spark.streaming.ingest import (
        watch_documents_dsir,
    )

    inbox = str(tmp_path / "inbox")
    ratios_p = str(tmp_path / "ratios")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def rows(ids_texts):
        return spark.createDataFrame(
            [(i, t, "en", "s", len(t)) for i, t in ids_texts],
            "doc_id long, text string, lang string, source string, n_chars long",
        )

    train = rows([(100, "the quick brown fox"), (101, "zz qq ww")])
    target = rows([(200, "the quick brown fox jumps")])
    dsir_bucket_logratios(train, target, m_buckets=64).write.parquet(ratios_p)

    e1 = [(1, "the quick brown fox"), (2, "totally novel words")]
    e2 = [(3, "zz qq ww"), (4, "the quick fox")]
    rows(e1).coalesce(1).write.mode("append").parquet(inbox)
    q = watch_documents_dsir(spark, inbox, ratios_p, out, ckpt, m_buckets=64)
    try:
        q.processAllAvailable()
        rows(e2).coalesce(1).write.mode("append").parquet(inbox)
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.doc_id, r.n_grams, r.log_weight)
        for r in spark.read.parquet(out).collect()
    }
    ratios = spark.read.parquet(ratios_p)
    want = {
        (r.doc_id, r.n_grams, r.log_weight)
        for r in dsir_score_with_ratios(
            rows(e1 + e2), ratios, m_buckets=64
        ).collect()
    }
    assert got == want and len(got) == 4


def test_watch_documents_substrings_across_epochs(spark, tmp_path):
    """Cross-epoch substring dedup: a sentence dropped in epoch 0 is
    cut from every epoch-1 doc that embeds it; epoch-1-internal
    repeats are cut too; the gram table rolls forward."""
    from process_alphafold3_outputs_spark.streaming.ingest import (
        watch_documents_substrings,
    )

    inbox = str(tmp_path / "inbox")
    out = str(tmp_path / "stripped")
    grams = str(tmp_path / "grams")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string, lang string, source string, n_chars long"

    def drop(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(inbox)

    drop([(1, "a b c d e", "en", "s", 9)])
    q = watch_documents_substrings(
        spark, inbox, out, grams, ckpt, min_words=5
    )
    try:
        q.processAllAvailable()
        drop([(10, "x a b c d e y", "en", "s", 13),
              (11, "p q r s t", "en", "s", 9),
              (12, "z p q r s t w", "en", "s", 13)])
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["doc_id"]: r["clean_text"]
        for r in spark.read.parquet(out).collect()
    }
    assert got == {1: "a b c d e", 10: "x y", 11: "p q r s t",
                   12: "z w"}


def test_read_state_type_clash_fails_fast(spark, tmp_path):
    """A state snapshot whose column TYPES contradict the declared
    schema (old md5 STRING hashes vs current xxhash64 BIGINT) must
    raise a migration error, not silently null every value through an
    implicit cast in the downstream join."""
    import pytest

    from process_alphafold3_outputs_spark.streaming.ingest import (
        read_state,
        roll_state,
    )

    state = str(tmp_path / "grams")
    roll_state(
        spark.createDataFrame([("abcd" * 8,)], "gh string"), state, 0
    )
    with pytest.raises(ValueError, match="incompatible version"):
        read_state(spark, state, "gh long", before_epoch=2)
    # same-typed read still works
    assert read_state(spark, state, "gh string", before_epoch=2).count() == 1


def test_substrings_watcher_pins_md5_state_lineage(spark, tmp_path):
    """A restart over gram state written by the old md5-STRING version
    keeps hashing in md5 for that lineage: the epoch-0 sentence is
    still stripped from an epoch-1 doc (a mode mix would join bigints
    against strings and strip NOTHING), and the rolled state stays
    string-typed."""
    from process_alphafold3_outputs_spark.operators.dedup import (
        incremental_strip_substrings,
    )
    from process_alphafold3_outputs_spark.streaming.ingest import (
        _substrings_process_batch,
        peek_state_field_type,
        roll_state,
    )

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    grams = str(tmp_path / "grams")
    out = str(tmp_path / "stripped")

    # epoch 0 as the OLD code would have run it: md5 string grams
    e0 = spark.createDataFrame([(1, "a b c d e", "en", "s", 9)], schema)
    _, md5_state = incremental_strip_substrings(
        e0,
        spark.createDataFrame([], "gh string"),
        min_words=5,
        hash_mode="md5",
    )
    roll_state(md5_state, grams, 0)
    assert peek_state_field_type(spark, grams, "gh", before_epoch=1) == "string"

    # epoch 1 under the NEW code: lineage pin must resolve md5
    e1 = spark.createDataFrame(
        [(10, "x a b c d e y", "en", "s", 13)], schema
    )
    _substrings_process_batch(e1, 1, grams, out, min_words=5)
    got = {
        r["doc_id"]: r["clean_text"]
        for r in spark.read.parquet(out).collect()
    }
    assert got == {10: "x y"}  # cross-restart duplicate STRIPPED
    # rolled state stays in the lineage's type
    assert peek_state_field_type(spark, grams, "gh", before_epoch=2) == "string"


def test_watch_documents_classifier_matches_batch(spark, tmp_path):
    """Stream scoring with a TRAINED logistic model equals batch
    classifier_score of the union with the same frozen weights — the
    train-batch / gate-stream contract for the quality classifier."""
    from process_alphafold3_outputs_spark.operators.text import (
        classifier_score,
        train_quality_classifier,
    )
    from process_alphafold3_outputs_spark.streaming.ingest import (
        watch_documents_classifier,
    )
    from pyspark.sql import functions as SF

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    train = spark.createDataFrame(
        [
            (100 + i,
             "good clean prose here" if i % 2 == 0 else "spam buy now",
             "en", "hq" if i % 2 == 0 else "web", 20)
            for i in range(20)
        ],
        schema,
    )
    model_path = str(tmp_path / "clf")
    train_quality_classifier(
        train, SF.col("source") == "hq", dim=16, iters=3, lr=2.0, seed="t"
    ).write.parquet(model_path)

    inbox = str(tmp_path / "inbox")
    out = str(tmp_path / "gated")
    ckpt = str(tmp_path / "ckpt")
    rows0 = [(1, "good clean prose here again", "en", "s", 27)]
    rows1 = [(2, "spam buy now please", "en", "s", 19)]
    spark.createDataFrame(rows0, schema).coalesce(1).write.mode("append").parquet(inbox)
    q = watch_documents_classifier(spark, inbox, model_path, out, ckpt, seed="t")
    try:
        q.processAllAvailable()
        spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(inbox)
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = {
        r["doc_id"]: (r["clf_score"], r["keep"])
        for r in spark.read.parquet(out).collect()
    }
    mrows = spark.read.parquet(model_path).collect()
    model = {r["bucket"]: r["weight"] for r in mrows}
    weights = [model.get(b, 0.0) for b in range(max(model) + 1)]
    batch = {
        r["doc_id"]: (r["clf_score"], r["keep"])
        for r in classifier_score(
            spark.createDataFrame(rows0 + rows1, schema),
            weights=weights,
            bias=model[-1],
            seed="t",
        ).collect()
    }
    assert streamed == batch
    assert streamed[1][1] is True and streamed[2][1] is False


def test_watch_queries_hybrid_matches_batch(spark, tmp_path):
    """Hybrid-search serving: a query stream served in two micro-batches
    against frozen corpus/embeddings snapshots equals the batch
    hybrid_search_many of the union — per-query results depend only on
    the query and the frozen sides."""
    from process_alphafold3_outputs_spark.operators.text import (
        hybrid_search_many,
    )
    from process_alphafold3_outputs_spark.streaming.ingest import (
        watch_queries_hybrid,
    )

    docs = spark.createDataFrame(
        [
            (1, "spark shuffle spark query engine"),
            (2, "spark spark shuffle query data"),
            (3, "data plane with nothing else"),
            (7, "query data query data spark"),
        ],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(1, [1.0, 0.2]), (2, [-0.5, 1.0]), (3, [0.8, 0.1]), (7, [0.9, 0.4])],
        "vec_id long, embedding array<float>",
    )
    docs_path = str(tmp_path / "docs")
    emb_path = str(tmp_path / "emb")
    docs.write.parquet(docs_path)
    emb.write.parquet(emb_path)

    inbox = str(tmp_path / "qinbox")
    out = str(tmp_path / "results")
    ckpt = str(tmp_path / "qckpt")

    def drop(rows):
        spark.createDataFrame(rows, "query_id long, term string").coalesce(
            1
        ).write.mode("append").parquet(inbox)

    drop([(3, "spark"), (3, "query")])
    q = watch_queries_hybrid(
        spark, inbox, docs_path, emb_path, out, ckpt, k=4, k_each=3
    )
    try:
        q.processAllAvailable()
        drop([(7, "data")])
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {
        (r.query_id, r.doc_id): (r.rrf_score, r.lex_rank, r.vec_rank, r.rk)
        for r in spark.read.parquet(out).collect()
    }
    all_q = spark.createDataFrame(
        [(3, "spark"), (3, "query"), (7, "data")],
        "query_id long, term string",
    )
    batch = {
        (r.query_id, r.doc_id): (r.rrf_score, r.lex_rank, r.vec_rank, r.rk)
        for r in hybrid_search_many(docs, emb, all_q, k=4, k_each=3).collect()
    }
    assert streamed == batch and batch


def test_watch_documents_doremi_matches_batch(spark, tmp_path):
    """Streamed DoReMi weights after N epochs equal the batch
    doremi_mixture over the union of all drops: the per-(domain,
    token) and per-domain-doc count states are additive, and the EG
    iteration is a pure function of the merged counts."""
    from process_alphafold3_outputs_spark.operators.text import (
        doremi_mixture,
    )
    from process_alphafold3_outputs_spark.streaming.ingest import (
        watch_documents_doremi,
    )

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    inbox = str(tmp_path / "inbox")
    out = str(tmp_path / "weights")
    counts = str(tmp_path / "counts")
    docs_state = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")

    batch1 = [(i, "the cat sat on the mat", "en", "easy", 22)
              for i in range(10)]
    batch2 = [(100 + i, f"zeta{i} quark{i} boson{i} gluon{i}", "en", "hard", 30)
              for i in range(10)]

    def drop(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(inbox)

    drop(batch1)
    q = watch_documents_doremi(
        spark, inbox, out, counts, docs_state, ckpt, iters=3
    )
    try:
        q.processAllAvailable()
        drop(batch2)
        q.processAllAvailable()
    finally:
        q.stop()

    epochs = sorted(
        int(r.epoch_id)
        for r in spark.read.option("basePath", out).parquet(out)
        .select("epoch_id").distinct().collect()
    )
    latest = (
        spark.read.option("basePath", out).parquet(out)
        .filter(F.col("epoch_id") == epochs[-1])
        .drop("epoch_id")
    )
    union = spark.createDataFrame(batch1 + batch2, schema)
    want = doremi_mixture(union, iters=3)
    got_rows = {r.source: r for r in latest.collect()}
    want_rows = {r.source: r for r in want.collect()}
    assert set(got_rows) == set(want_rows) == {"easy", "hard"}
    for s in want_rows:
        for f in ("n_docs", "n_tokens", "loss", "excess", "weight"):
            assert got_rows[s][f] == want_rows[s][f], (s, f)
    # the hard domain outweighs the easy one in the final table too
    assert got_rows["hard"].weight > got_rows["easy"].weight


def test_doremi_state_replay_is_idempotent(spark, tmp_path):
    """Crash-replaying a DoReMi epoch (same epoch_id, same input)
    reproduces identical count state and identical weights: state
    reads exclude the replayed epoch's own snapshot, so the merge
    never double-counts the batch."""
    from process_alphafold3_outputs_spark.operators.text import (
        domain_doc_counts,
        domain_token_counts,
        doremi_weights_from_losses,
        merge_domain_doc_counts,
        merge_domain_token_counts,
        surprisal_losses_from_counts,
    )
    from process_alphafold3_outputs_spark.streaming.ingest import (
        _write_epoch_output,
        read_state,
        roll_state,
    )

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    out = str(tmp_path / "weights")
    counts = str(tmp_path / "counts")
    docs_state = str(tmp_path / "docs")

    def run_epoch(epoch, rows):
        batch = spark.createDataFrame(rows, schema)
        prev_dt = read_state(spark, counts, "source string, tok string, c long",
                             before_epoch=epoch)
        prev_nd = read_state(spark, docs_state, "source string, n_docs long",
                             before_epoch=epoch)
        roll_state(merge_domain_token_counts(
            prev_dt, domain_token_counts(batch)), counts, epoch)
        roll_state(merge_domain_doc_counts(
            prev_nd, domain_doc_counts(batch)), docs_state, epoch)
        dt = read_state(spark, counts, "source string, tok string, c long",
                        before_epoch=epoch + 1)
        nd = read_state(spark, docs_state, "source string, n_docs long",
                        before_epoch=epoch + 1)
        w = doremi_weights_from_losses(
            surprisal_losses_from_counts(dt, nd), iters=2)
        _write_epoch_output(w, out, epoch)

    e0 = [(1, "the cat sat", "en", "easy", 11)]
    e1 = [(2, "zeta quark boson", "en", "hard", 16)]
    run_epoch(0, e0)
    run_epoch(1, e1)
    before = sorted(
        (r.source, r.n_tokens, r.weight)
        for r in spark.read.option("basePath", out).parquet(out)
        .filter(F.col("epoch_id") == 1).collect()
    )
    state_before = sorted(
        (r.source, r.tok, r.c)
        for r in read_state(spark, counts,
                            "source string, tok string, c long").collect()
    )

    run_epoch(1, e1)  # crash-replay: same epoch_id, same input
    after = sorted(
        (r.source, r.n_tokens, r.weight)
        for r in spark.read.option("basePath", out).parquet(out)
        .filter(F.col("epoch_id") == 1).collect()
    )
    state_after = sorted(
        (r.source, r.tok, r.c)
        for r in read_state(spark, counts,
                            "source string, tok string, c long").collect()
    )
    assert after == before
    assert state_after == state_before
    # both domains present with all tokens counted exactly once
    assert sum(c for _, _, c in state_after) == 6


def test_watch_documents_langs_routes_segments(spark, tmp_path):
    """Streamed language routing equals the batch split on the union
    (stateless per-doc kernel), and segments land under per-language
    partitions readers can prune on."""
    from process_alphafold3_outputs_spark.operators.text import (
        split_by_language,
    )
    from process_alphafold3_outputs_spark.streaming.ingest import (
        watch_documents_langs,
    )

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    inbox = str(tmp_path / "inbox")
    out = str(tmp_path / "routed")
    ckpt = str(tmp_path / "ckpt")
    en = "the cat and the dog is to the mat and of it"
    fr = "le chat et les chiens est le la des les et le"
    b1 = [(1, en + " " + fr, "en", "s", 50)]
    b2 = [(2, en, "en", "s", 40)]

    def drop(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(inbox)

    drop(b1)
    q = watch_documents_langs(spark, inbox, out, ckpt, para_words=12)
    try:
        q.processAllAvailable()
        drop(b2)
        q.processAllAvailable()
    finally:
        q.stop()

    got = (
        spark.read.option("basePath", out).parquet(out)
        .select("doc_id", "seg_id", "lang", "seg_text")
    )
    want = split_by_language(
        spark.createDataFrame(b1 + b2, schema), para_words=12
    ).select("doc_id", "seg_id", "lang", "seg_text")
    g = sorted(map(tuple, got.collect()))
    w = sorted(map(tuple, want.collect()))
    assert g == w
    # the physical layout is per-language: a lang=fr directory exists
    import glob
    assert glob.glob(f"{out}/epoch_id=*/lang=fr")


def test_watch_documents_expect_reports_per_epoch(spark, tmp_path):
    """A clean drop passes every default rule; a later drop with a
    duplicate id and a null text fails exactly those rules in ITS
    epoch's report — the per-delivery quality time-series."""
    from process_alphafold3_outputs_spark.streaming.ingest import (
        watch_documents_expect,
    )

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    inbox = str(tmp_path / "inbox")
    out = str(tmp_path / "reports")
    ckpt = str(tmp_path / "ckpt")

    def drop(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(inbox)

    drop([(1, "alpha", "en", "s", 5), (2, "beta", "en", "s", 4)])
    q = watch_documents_expect(spark, inbox, out, ckpt)
    try:
        q.processAllAvailable()
        drop([(3, "gamma", "en", "s", 5), (3, None, "en", "s", 4)])
        q.processAllAvailable()
    finally:
        q.stop()

    rep = spark.read.option("basePath", out).parquet(out)
    epochs = sorted(int(r.epoch_id) for r in
                    rep.select("epoch_id").distinct().collect())
    assert len(epochs) == 2
    first = {(r.column, r.check): r for r in
             rep.filter(F.col("epoch_id") == epochs[0]).collect()}
    assert all(r.passed for r in first.values())
    second = {(r.column, r.check): r for r in
              rep.filter(F.col("epoch_id") == epochs[-1]).collect()}
    assert not second[("doc_id", "unique")].passed
    assert second[("doc_id", "unique")].n_violations == 1
    assert not second[("text", "not_null")].passed
    assert second[("doc_id", "not_null")].passed
