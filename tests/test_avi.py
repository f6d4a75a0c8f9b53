"""MJPEG-AVI container (``operators.avi``) + the real video
frame-sampling path in ``multimodal.sample_frames``: container
round-trip, cadence math, downstream per-frame decodability, and the
inter-frame-codec error boundary."""

from __future__ import annotations

import numpy as np
import pytest

from process_alphafold3_outputs_spark.operators import (
    avi,
    codecs,
    jpeg,
    multimodal,
)


def _frames(n: int, h: int = 16, w: int = 24) -> list[np.ndarray]:
    out = []
    y, x = np.mgrid[0:h, 0:w]
    for i in range(n):
        plane = ((x * 5 + y * 3 + i * 40) % 256).astype(np.uint8)
        out.append(plane[..., None].repeat(3, axis=2))
    return out


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def test_avi_roundtrip_preserves_fps_and_frames():
    frames = _frames(6)
    data = avi.encode_mjpeg_avi(frames, fps=5.0, quality=90)
    assert codecs.sniff(data) == "avi"
    fps, out = avi.read_mjpeg_avi(data)
    assert fps == pytest.approx(5.0)
    assert len(out) == 6
    for ref, enc in zip(frames, out):
        assert _psnr(ref, jpeg.decode_jpeg(enc)) > 35.0


def test_avi_preencoded_jpeg_frames_pass_through():
    frames = _frames(3)
    pre = [jpeg.encode_jpeg(f, quality=90) for f in frames]
    data = avi.encode_mjpeg_avi(pre, fps=10.0)
    _, out = avi.read_mjpeg_avi(data)
    assert [bytes(o) for o in out] == pre  # bytes untouched


def test_sample_cadence_picks_at_or_before_tick():
    data = avi.encode_mjpeg_avi(_frames(10), fps=10.0)  # 1000 ms clip
    samples = avi.sample_avi_frames(data, every_ms=250)
    assert [t for t, _ in samples] == [0, 250, 500, 750]
    _, frames = avi.read_mjpeg_avi(data)
    # tick t maps to frame floor(t*fps/1000)
    assert [f for _, f in samples] == [frames[i] for i in (0, 2, 5, 7)]


def test_avi_error_boundaries():
    with pytest.raises(ValueError, match="not an AVI"):
        avi.read_mjpeg_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="no frames"):
        avi.encode_mjpeg_avi([])
    with pytest.raises(ValueError, match="share dimensions"):
        avi.encode_mjpeg_avi([_frames(1)[0], _frames(1, h=8, w=8)[0]])
    # a non-JPEG 00dc payload = inter-frame codec territory
    good = bytearray(avi.encode_mjpeg_avi(_frames(1)))
    p = bytes(good).find(b"00dc")
    good[p + 8 : p + 11] = b"\x00\x00\x01"  # clobber the JPEG SOI
    with pytest.raises(Exception, match="MJPEG"):
        avi.read_mjpeg_avi(bytes(good))


def test_sample_frames_real_path_in_spark(spark):
    data = avi.encode_mjpeg_avi(_frames(8), fps=10.0, quality=90)  # 800 ms
    media = spark.createDataFrame(
        [(7, "video/avi", bytearray(data),
          {"width": 24, "height": 16, "duration_ms": 800, "codec": "mjpg"})],
        multimodal.MEDIA_SCHEMA,
    )
    rows = sorted(
        multimodal.sample_frames(media, every_ms=200, fake=False).collect(),
        key=lambda r: r.frame_ms,
    )
    assert [r.frame_ms for r in rows] == [0, 200, 400, 600]
    # every sampled frame is standalone JPEG decodable downstream
    for r in rows:
        img = jpeg.decode_jpeg(bytes(r.content))
        assert img.shape == (16, 24, 3)


def test_sample_frames_real_path_rejects_other_codecs(spark):
    media = spark.createDataFrame(
        [(1, "video/mp4", bytearray(b"\x00\x00\x00 ftypmp42"),
          {"width": 4, "height": 4, "duration_ms": 100, "codec": "h264"})],
        multimodal.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="MJPEG-AVI|NotImplementedError"):
        multimodal.sample_frames(media, every_ms=50, fake=False).collect()


def test_sampled_frames_feed_image_pipeline(spark):
    """Composition: video -> frames -> extract_features, all real."""
    data = avi.encode_mjpeg_avi(_frames(4), fps=10.0, quality=90)
    media = spark.createDataFrame(
        [(3, "video/avi", bytearray(data),
          {"width": 24, "height": 16, "duration_ms": 400, "codec": "mjpg"})],
        multimodal.MEDIA_SCHEMA,
    )
    frames_df = multimodal.sample_frames(media, every_ms=100, fake=False)
    from pyspark.sql import functions as F
    as_media = frames_df.select(
        (F.col("asset_id") * 1000 + F.col("frame_ms")).alias("asset_id"),
        F.lit("image/jpeg").alias("modality"),
        "content",
        F.struct(
            F.lit(24).alias("width"), F.lit(16).alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit("jpeg").alias("codec"),
        ).alias("meta"),
    )
    feats = multimodal.extract_features(as_media, fake=False).collect()
    assert len(feats) == 4
    assert all(len(r.features) == multimodal.FEATURE_DIM for r in feats)
