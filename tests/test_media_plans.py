"""Media-corpus curation (``plans.media``): the JVM-side format census
must agree byte-for-byte with the Python ``codecs.sniff``, stay inside
whole-stage codegen (no Python workers), and the composed
``curate_media`` pipeline must dedup each modality by its own hash
family while passing distinct content through."""

from __future__ import annotations

import numpy as np
import pytest

from process_alphafold3_outputs_spark.operators import avi, codecs, gif, jpeg, multimodal
from process_alphafold3_outputs_spark.plans import media as media_plans


def _rgb(h, w, seed=0):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3), dtype=np.uint8)


def _assets():
    # DISTINCT pixels per format: the same image in two containers is a
    # true perceptual duplicate and curate_media would (correctly) drop
    # one — see test_curate_media_dedups_each_modality for that case
    pal = _rgb(1, 16, 2).reshape(16, 3)
    gif_img = pal[np.random.RandomState(3).randint(0, 16, (8, 8))]
    rate = 8000
    t = np.arange(rate) / rate
    tone = np.sin(2 * np.pi * 440 * t) * np.exp(-t)
    frames = [_rgb(8, 8, i + 10) for i in range(3)]
    return {
        "bmp": codecs.encode_bmp(_rgb(8, 8, 1)),
        "ppm": codecs.encode_ppm(_rgb(8, 8, 21)),
        "png": codecs.encode_png(_rgb(8, 8, 41)),
        "jpeg": jpeg.encode_jpeg(_rgb(8, 8, 61)),
        "gif": gif.encode_gif(gif_img),
        "wav": codecs.encode_wav(rate, tone),
        "avi": avi.encode_mjpeg_avi(frames, fps=10.0),
        "other": b"\x00\x01\x02 opaque blob of unknown provenance",
    }


def _media_df(spark, rows):
    return spark.createDataFrame(
        [(i, "media", bytearray(content),
          {"width": None, "height": None, "duration_ms": None, "codec": None})
         for i, content in rows],
        multimodal.MEDIA_SCHEMA,
    )


def test_format_col_agrees_with_python_sniff(spark):
    assets = _assets()
    df = _media_df(spark, list(enumerate(assets.values())))
    got = {
        r.asset_id: r.fmt
        for r in df.select(
            "asset_id", media_plans.format_col("content").alias("fmt")
        ).collect()
    }
    for i, (name, content) in enumerate(assets.items()):
        sniffed = codecs.sniff(bytes(content))
        want = sniffed if sniffed is not None else "other"
        assert got[i] == want, (name, got[i], want)


def test_format_census_is_jvm_only(spark):
    df = _media_df(spark, list(enumerate(_assets().values())))
    summary = media_plans.media_format_summary(df)
    plan = summary._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                   "FlatMapGroupsInPandas"):
        assert marker not in plan, f"format census touched Python: {marker}"
    rows = {r.fmt: r.n_assets for r in summary.collect()}
    assert rows == {"bmp": 1, "ppm": 1, "png": 1, "jpeg": 1, "gif": 1,
                    "wav": 1, "avi": 1, "other": 1}
    total = {r.fmt: r.total_bytes for r in summary.collect()}
    assets = _assets()
    assert total["avi"] == len(assets["avi"])


def test_curate_media_dedups_each_modality(spark):
    img = _rgb(16, 16, 5)
    near_img = img.copy()
    near_img[0, 0] = (near_img[0, 0].astype(int) + 2).clip(0, 255).astype(np.uint8)
    other_img = _rgb(16, 16, 6)
    rate = 8000
    t = np.arange(rate) / rate
    tone = np.sin(2 * np.pi * 440 * t) * np.exp(-t)
    near_tone = tone + np.random.RandomState(7).randn(rate) * 0.005
    chirp = np.sin(2 * np.pi * 1700 * t**2)
    blob = b"\x00\x01 unknown bytes"
    rows = [
        (0, codecs.encode_bmp(img)),
        (1, codecs.encode_png(near_img)),   # cross-FORMAT perceptual dup of 0
        (2, codecs.encode_bmp(other_img)),  # distinct image
        (10, codecs.encode_wav(rate, tone)),
        (11, codecs.encode_wav(rate, near_tone)),  # spectral dup of 10
        (12, codecs.encode_wav(rate, chirp)),      # distinct audio
        (20, blob),
        (21, blob),                          # exact dup of 20
        (22, b"\x00\x02 different bytes"),
    ]
    kept = {
        r.asset_id: r.fmt
        for r in media_plans.curate_media(
            _media_df(spark, rows), max_hamming=3
        ).collect()
    }
    assert set(kept) == {0, 2, 10, 12, 20, 22}
    assert kept[0] == "bmp" and kept[10] == "wav" and kept[20] == "other"


def test_curate_media_passes_everything_when_distinct(spark):
    rows = list(enumerate(_assets().values()))
    kept = media_plans.curate_media(_media_df(spark, rows)).collect()
    assert len(kept) == len(rows)


def test_magic_table_matches_codecs_sniff_exhaustively():
    """Every magic spec in plans.media mirrors codecs.sniff: encode a
    probe for each format and check both classifiers agree — a new
    format added to one side must fail here until added to both."""
    assets = _assets()
    assert set(a for a in (codecs.sniff(bytes(v)) for v in assets.values())
               if a is not None) == {"bmp", "ppm", "png", "jpeg", "gif",
                                     "wav", "avi"}


def test_media_cli_commands(spark, tmp_path):
    import json

    from process_alphafold3_outputs_spark.corpus_cli import build_parser, run

    media_path = str(tmp_path / "media")
    blob = b"\x00\x01 unknown bytes"
    rows = [(0, codecs.encode_bmp(_rgb(8, 8, 1))), (1, blob), (2, blob)]
    _media_df(spark, rows).write.parquet(media_path)

    out1 = str(tmp_path / "census")
    res = run(build_parser().parse_args(
        ["media-stats", "--media", media_path, "--out", out1]), spark=spark)
    assert res["rows"] == 2  # bmp + other
    got = {r.fmt: r.n_assets for r in spark.read.parquet(out1).collect()}
    assert got == {"bmp": 1, "other": 2}

    out2 = str(tmp_path / "curated")
    res = run(build_parser().parse_args(
        ["media-curate", "--media", media_path, "--out", out2]), spark=spark)
    assert res["rows"] == 2  # exact dup blob dropped
    kept = {r.asset_id for r in spark.read.parquet(out2).collect()}
    assert kept == {0, 1}
