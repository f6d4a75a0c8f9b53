"""Real (non-fake) multimodal codec path: pure-Python BMP/PPM decode,
feature extraction from actual pixels, and nearest-neighbour resize —
the one executable codec boundary this container supports.
"""

from __future__ import annotations

import numpy as np
import pytest

from process_alphafold3_outputs_spark.operators import codecs, multimodal


def _rgb(h: int, w: int, seed: int = 0) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (5, 4), (17, 9)])
def test_bmp_roundtrip_including_row_padding(w, h):
    img = _rgb(h, w, seed=w * 100 + h)
    out = codecs.decode_bmp(codecs.encode_bmp(img))
    np.testing.assert_array_equal(out, img)


@pytest.mark.parametrize("w,h", [(1, 1), (4, 3), (16, 2)])
def test_ppm_roundtrip(w, h):
    img = _rgb(h, w, seed=w + h)
    out = codecs.decode_ppm(codecs.encode_ppm(img))
    np.testing.assert_array_equal(out, img)


def test_ppm_header_comments_and_whitespace():
    img = _rgb(2, 3)
    raw = codecs.encode_ppm(img)
    assert raw.startswith(b"P6\n3 2\n255\n")
    commented = b"P6\n# a comment\n 3\t2 # trailing\n255\n" + raw[11:]
    np.testing.assert_array_equal(codecs.decode_ppm(commented), img)


def test_bmp_rejects_unsupported():
    with pytest.raises(ValueError):
        codecs.decode_bmp(b"BM" + b"\x00" * 10)  # truncated
    img = codecs.encode_bmp(_rgb(2, 2))
    # flip compression field to BI_RLE8
    bad = bytearray(img)
    bad[30] = 1
    with pytest.raises(ValueError):
        codecs.decode_bmp(bytes(bad))


def test_resize_nearest_dims_and_determinism():
    img = _rgb(8, 6, seed=5)
    small = codecs.resize_nearest(img, 3, 4)
    assert small.shape == (4, 3, 3)
    np.testing.assert_array_equal(small, codecs.resize_nearest(img, 3, 4))
    # identity resize is a no-op
    np.testing.assert_array_equal(codecs.resize_nearest(img, 6, 8), img)


def _media_df(spark, assets):
    return spark.createDataFrame(
        [
            (i, mod, bytearray(content),
             {"width": None, "height": None, "duration_ms": None,
              "codec": fmt})
            for i, (mod, fmt, content) in enumerate(assets)
        ],
        multimodal.MEDIA_SCHEMA,
    )


def test_extract_features_real_decode(spark):
    bmp_img, ppm_img = _rgb(4, 5, seed=1), _rgb(3, 3, seed=2)
    media = _media_df(spark, [
        ("image/bmp", "bmp", codecs.encode_bmp(bmp_img)),
        ("image/ppm", "ppm", codecs.encode_ppm(ppm_img)),
    ])
    rows = {r.asset_id: r for r in
            multimodal.extract_features(media, fake=False).collect()}
    for aid, img in ((0, bmp_img), (1, ppm_img)):
        want = codecs.image_features(img, multimodal.FEATURE_DIM)
        got = [round(float(v), 6) for v in rows[aid].features]
        assert got == pytest.approx(want, abs=1e-5), aid
    # channel means are real pixel statistics, not hash noise
    assert rows[0].features[2] == pytest.approx(
        bmp_img[:, :, 0].mean() / 255.0, abs=1e-5)


def test_extract_features_real_boundary_still_raises(spark):
    media = _media_df(spark, [("text/blob", "raw", b"not an image")])
    with pytest.raises(Exception, match="NotImplementedError|BMP/PPM"):
        multimodal.extract_features(media, fake=False).collect()


def test_resize_images_real_roundtrip(spark):
    img = _rgb(10, 8, seed=3)
    media = _media_df(spark, [
        ("image/bmp", "bmp", codecs.encode_bmp(img)),
        ("image/ppm", "ppm", codecs.encode_ppm(img)),
    ])
    out = {r.asset_id: r for r in
           multimodal.resize_images(media, 4, 5, fake=False).collect()}
    for aid, fmt in ((0, "bmp"), (1, "ppm")):
        row = out[aid]
        assert row.meta.width == 4 and row.meta.height == 5
        assert row.meta.codec == fmt
        got_fmt, rgb = codecs.decode_image(bytes(row.content))
        assert got_fmt == fmt
        np.testing.assert_array_equal(rgb, codecs.resize_nearest(img, 4, 5))


# --------------------------------------------------------------------------
# WAV (PCM audio via stdlib wave)
# --------------------------------------------------------------------------


def test_wav_roundtrip_and_features():
    rate = 8000
    t = np.arange(rate) / rate               # 1 second
    sine = 0.5 * np.sin(2 * np.pi * 440 * t)  # 440 Hz half-amplitude
    blob = codecs.encode_wav(rate, sine)
    assert codecs.sniff(blob) == "wav"
    got_rate, samples = codecs.decode_wav(blob)
    assert got_rate == rate and len(samples) == rate
    np.testing.assert_allclose(samples, sine, atol=1e-3)  # 16-bit quantization
    feats = codecs.audio_features(got_rate, samples, 8)
    assert len(feats) == 8
    assert feats[0] == pytest.approx(1.0 / 3600.0, abs=1e-6)   # duration
    assert feats[1] == pytest.approx(0.5 / np.sqrt(2), abs=1e-3)  # sine RMS
    assert feats[2] == pytest.approx(0.5, abs=1e-3)            # peak
    # 440 Hz crosses zero ~880 times/sec over 8000 samples
    assert feats[3] == pytest.approx(880.0 / 8000.0, abs=0.01)


def test_extract_features_decodes_wav_assets(spark):
    rate = 4000
    sine = 0.25 * np.sin(2 * np.pi * 100 * np.arange(rate) / rate)
    media = _media_df(spark, [
        ("audio/wav", "wav", codecs.encode_wav(rate, sine)),
        ("image/bmp", "bmp", codecs.encode_bmp(_rgb(4, 4, seed=9))),
    ])
    rows = {r.asset_id: r for r in
            multimodal.extract_features(media, fake=False).collect()}
    got_rate, samples = codecs.decode_wav(
        codecs.encode_wav(rate, sine))
    want = codecs.audio_features(got_rate, samples, multimodal.FEATURE_DIM)
    got = [round(float(v), 6) for v in rows[0].features]
    assert got == pytest.approx(want, abs=1e-6)
    assert len(rows[1].features) == multimodal.FEATURE_DIM  # image path intact


def test_wav_rejects_unsupported_width():
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(4)  # 32-bit PCM not supported
        w.setframerate(8000)
        w.writeframes(b"\x00" * 32)
    with pytest.raises(NotImplementedError):
        codecs.decode_wav(buf.getvalue())


# --------------------------------------------------------------------------
# perceptual average hash
# --------------------------------------------------------------------------


def test_average_hash_identical_and_near_images():
    img = _rgb(16, 12, seed=4)
    h1 = codecs.average_hash(img)
    h2 = codecs.average_hash(img.copy())
    assert h1 == h2
    # tiny noise on ONE pixel: hash moves by at most a few bits
    noisy = img.copy()
    noisy[0, 0] = (noisy[0, 0].astype(int) + 3).clip(0, 255).astype("uint8")
    assert codecs.hamming64(h1, codecs.average_hash(noisy)) <= 4
    # inverted image is maximally different in structure
    inv = (255 - img.astype(int)).astype("uint8")
    assert codecs.hamming64(h1, codecs.average_hash(inv)) >= 32
    # words stay inside unsigned-32
    for w in (*h1, *codecs.average_hash(inv)):
        assert 0 <= w < (1 << 32)


def test_image_hashes_real_path_matches_direct(spark):
    imgs = [_rgb(8, 8, seed=7), _rgb(10, 6, seed=8)]
    media = _media_df(spark, [
        ("image/bmp", "bmp", codecs.encode_bmp(imgs[0])),
        ("image/ppm", "ppm", codecs.encode_ppm(imgs[1])),
    ])
    rows = {r.asset_id: (r.h_hi, r.h_lo) for r in
            multimodal.image_hashes(media, fake=False).collect()}
    for aid, img in enumerate(imgs):
        assert rows[aid] == codecs.average_hash(img), aid


def test_image_near_dup_pairs_banded(spark):
    base = _rgb(16, 16, seed=11)
    near = base.copy()
    near[0, 0] = (near[0, 0].astype(int) + 2).clip(0, 255).astype("uint8")
    inverted = (255 - base.astype(int)).astype("uint8")
    media = _media_df(spark, [
        ("image/bmp", "bmp", codecs.encode_bmp(base)),
        ("image/bmp", "bmp", codecs.encode_bmp(near)),
        ("image/bmp", "bmp", codecs.encode_bmp(inverted)),
    ])
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in multimodal.image_near_dup_pairs(media, max_hamming=8,
                                                 fake=False).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] <= 4
    assert not any(2 in p for p in pairs)  # inverted image never pairs


# --------------------------------------------------------------------------
# PNG (stdlib zlib inflate + scanline unfiltering)
# --------------------------------------------------------------------------


@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (8, 8), (17, 9)])
def test_png_roundtrip(w, h):
    img = _rgb(h, w, seed=w * 7 + h)
    out = codecs.decode_png(codecs.encode_png(img))
    np.testing.assert_array_equal(out, img)


def test_bmp_png_bmp_roundtrip():
    # cross-format: the compressed path reproduces the raw path exactly
    img = _rgb(6, 11, seed=42)
    via_png = codecs.decode_png(codecs.encode_png(codecs.decode_bmp(
        codecs.encode_bmp(img))))
    np.testing.assert_array_equal(codecs.decode_bmp(
        codecs.encode_bmp(via_png)), img)


def _png_with_filter(img: np.ndarray, ftype: int) -> bytes:
    """Hand-build a PNG whose every scanline uses filter ``ftype``,
    applying the forward filter per the W3C spec — exercises the
    decoder's unfilter paths that encode_png (filter 0) never emits."""
    import struct
    import zlib

    h, w, _ = img.shape
    bpp = 3
    raw = bytearray()
    prior = np.zeros(w * bpp, dtype=np.int32)
    for y in range(h):
        line = img[y].reshape(-1).astype(np.int32)
        filt = np.empty_like(line)
        for i in range(len(line)):
            a = int(line[i - bpp]) if i >= bpp else 0
            b = int(prior[i])
            c = int(prior[i - bpp]) if i >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filt[i] = (line[i] - pred) % 256
        raw += bytes([ftype]) + filt.astype(np.uint8).tobytes()
        prior = line

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (codecs.PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_unfilters_every_filter_type(ftype):
    img = _rgb(5, 7, seed=ftype + 10)
    np.testing.assert_array_equal(
        codecs.decode_png(_png_with_filter(img, ftype)), img)


def test_png_rgba_alpha_dropped_and_gray_broadcast():
    import struct
    import zlib

    def build(color, channels, px):
        h, w = px.shape[:2]
        raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))

        def chunk(ctype, data):
            return (struct.pack(">I", len(data)) + ctype + data
                    + struct.pack(">I", zlib.crc32(ctype + data)))

        ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
        return (codecs.PNG_MAGIC + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))

    rgba = np.dstack([_rgb(3, 4, seed=1),
                      np.full((3, 4, 1), 128, dtype=np.uint8)])
    np.testing.assert_array_equal(
        codecs.decode_png(build(6, 4, rgba)), rgba[:, :, :3])
    gray = _rgb(2, 5, seed=2)[:, :, :1]
    out = codecs.decode_png(build(0, 1, gray))
    np.testing.assert_array_equal(out, np.repeat(gray, 3, axis=2))


def test_png_rejects_unsupported_variants():
    img = codecs.encode_png(_rgb(2, 2))
    # flip the interlace byte inside IHDR (offset 8+8+IHDR[12] = 28)
    bad = bytearray(img)
    bad[28] = 1
    with pytest.raises(ValueError, match="interlac"):
        codecs.decode_png(bytes(bad))
    with pytest.raises(ValueError):
        codecs.decode_png(b"\x89PNG\r\n\x1a\n" + b"\x00" * 4)
    # truncated pixel stream
    depth = bytearray(img)
    depth[24] = 16  # bit depth
    with pytest.raises(ValueError, match="unsupported"):
        codecs.decode_png(bytes(depth))


def test_png_sniff_and_image_entrypoints():
    img = _rgb(4, 4, seed=9)
    data = codecs.encode_png(img)
    assert codecs.sniff(data) == "png"
    fmt, rgb = codecs.decode_image(data)
    assert fmt == "png"
    np.testing.assert_array_equal(rgb, img)
    np.testing.assert_array_equal(
        codecs.decode_image(codecs.encode_image("png", img))[1], img)


def test_extract_features_real_decode_png(spark):
    img = _rgb(4, 5, seed=11)
    media = _media_df(spark, [("image/png", "png", codecs.encode_png(img))])
    row = multimodal.extract_features(media, fake=False).collect()[0]
    want = codecs.image_features(img, multimodal.FEATURE_DIM)
    assert [round(float(v), 6) for v in row.features] == pytest.approx(
        want, abs=1e-5)


def test_resize_images_real_png(spark):
    img = _rgb(10, 8, seed=12)
    media = _media_df(spark, [("image/png", "png", codecs.encode_png(img))])
    row = multimodal.resize_images(media, 4, 5, fake=False).collect()[0]
    assert row.meta.codec == "png"
    fmt, rgb = codecs.decode_image(bytes(row.content))
    assert fmt == "png"
    np.testing.assert_array_equal(rgb, codecs.resize_nearest(img, 4, 5))


# --------------------------------------------------------------------------
# audio fingerprint + near-dup (spectral sign hash)
# --------------------------------------------------------------------------


def _tone(rate=8000, freq=440.0, seconds=1.0, decay=True):
    t = np.arange(int(rate * seconds)) / rate
    s = np.sin(2 * np.pi * freq * t)
    return s * np.exp(-t) if decay else s


def test_audio_fingerprint_is_level_invariant_and_discriminates():
    rate = 8000
    a = _tone(rate)
    fa = codecs.audio_fingerprint(rate, a)
    # level changes do not move a single bit (delta-sign hash)
    assert codecs.audio_fingerprint(rate, a * 0.25) == fa
    # small additive noise: a few bits at most
    noisy = a + np.random.RandomState(0).randn(len(a)) * 0.01
    assert codecs.hamming64(fa, codecs.audio_fingerprint(rate, noisy)) <= 3
    # structurally different audio: far away
    t = np.arange(rate) / rate
    chirp = np.sin(2 * np.pi * 1700 * t**2)
    assert codecs.hamming64(fa, codecs.audio_fingerprint(rate, chirp)) > 10


def test_audio_fingerprint_short_clip_padding():
    hi, lo = codecs.audio_fingerprint(8000, np.array([0.5, -0.5]))
    assert isinstance(hi, int) and isinstance(lo, int)
    assert 0 <= hi < 2**32 and 0 <= lo < 2**32


def test_audio_near_dup_pairs_spark(spark):
    rate = 8000
    base = _tone(rate)
    noisy = base + np.random.RandomState(1).randn(len(base)) * 0.005
    t = np.arange(rate) / rate
    other = np.sin(2 * np.pi * 1700 * t**2)
    media = _media_df(spark, [
        ("audio/wav", "wav", codecs.encode_wav(rate, base)),
        ("audio/wav", "wav", codecs.encode_wav(rate, noisy)),
        ("audio/wav", "wav", codecs.encode_wav(rate, other)),
    ])
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in multimodal.audio_near_dup_pairs(media, max_hamming=3)
             .collect()}
    assert (0, 1) in pairs          # re-encoded near-dup found
    assert (0, 2) not in pairs      # different content not paired
    assert (1, 2) not in pairs
    # image near-dup over the same banded helper still behaves (shared
    # machinery regression guard)
    with pytest.raises(Exception, match="PCM WAV|NotImplementedError"):
        multimodal.audio_near_dup_pairs(
            _media_df(spark, [("image/bmp", "bmp",
                               codecs.encode_bmp(_rgb(4, 4)))]),
            fake=False,
        ).collect()


# --------------------------------------------------------------------------
# property tests: lossless codecs must round-trip ANY image exactly
# --------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _images(draw):
    h = draw(st.integers(min_value=1, max_value=12))
    w = draw(st.integers(min_value=1, max_value=12))
    data = draw(st.binary(min_size=h * w * 3, max_size=h * w * 3))
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3).copy()


@settings(max_examples=25, deadline=None)
@given(_images())
def test_property_png_roundtrip_exact(img):
    np.testing.assert_array_equal(
        codecs.decode_png(codecs.encode_png(img)), img)


@settings(max_examples=25, deadline=None)
@given(_images())
def test_property_bmp_roundtrip_exact(img):
    np.testing.assert_array_equal(
        codecs.decode_bmp(codecs.encode_bmp(img)), img)


@settings(max_examples=25, deadline=None)
@given(_images())
def test_property_ppm_roundtrip_exact(img):
    np.testing.assert_array_equal(
        codecs.decode_ppm(codecs.encode_ppm(img)), img)


@settings(max_examples=10, deadline=None)
@given(_images())
def test_property_jpeg_decodes_to_same_shape(img):
    from process_alphafold3_outputs_spark.operators import jpeg

    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90))
    assert out.shape == img.shape and out.dtype == np.uint8


@settings(max_examples=25, deadline=None)
@given(_images())
def test_property_gif_roundtrip_exact(img):
    # the strategy caps images at 12x12 = 144 px, so distinct colors
    # always fit a GIF palette and the round trip must be EXACT
    from process_alphafold3_outputs_spark.operators import gif

    np.testing.assert_array_equal(
        gif.decode_gif(gif.encode_gif(img)), img)


def test_avi_blob_hits_codec_boundary_not_decode_error(spark):
    """sniff() knows 'avi', but the image guards must route any
    non-image format to the NotImplementedError codec boundary — not
    let it fall through to decode_image's generic ValueError."""
    from process_alphafold3_outputs_spark.operators import avi as avi_mod

    frames = [_rgb(4, 4, seed=s) for s in (1, 2)]
    blob = avi_mod.encode_mjpeg_avi(frames, fps=5)
    assert codecs.sniff(blob) == "avi"
    media = _media_df(spark, [("video", "avi", blob)])
    for build in (
        lambda: multimodal.extract_features(media, fake=False),
        lambda: multimodal.resize_images(media, 2, 2, fake=False),
        lambda: multimodal.image_hashes(media, fake=False),
    ):
        with pytest.raises(Exception) as ei:
            build().collect()
        msg = str(ei.value)
        assert "NotImplementedError" in msg or isinstance(
            ei.value, NotImplementedError
        )
        assert "ValueError" not in msg.split("NotImplementedError")[0]


def test_resample_audio_length_tone_and_alias_rejection():
    rate, target = 8000, 4000
    t = np.arange(rate) / rate  # 1 s
    low = np.sin(2 * np.pi * 440 * t) * 0.5       # below target Nyquist
    high = np.sin(2 * np.pi * 3500 * t) * 0.5     # above target Nyquist
    out_low = codecs.resample_audio(rate, low, target)
    out_high = codecs.resample_audio(rate, high, target)
    assert len(out_low) == len(out_high) == target
    rms = lambda x: float(np.sqrt(np.mean(x**2)))  # noqa: E731
    # in-band tone survives (within windowing tolerance)...
    assert abs(rms(out_low) - rms(low)) / rms(low) < 0.1
    # ...out-of-band tone is attenuated by the anti-alias filter
    assert rms(out_high) < 0.25 * rms(high)
    # deterministic
    np.testing.assert_array_equal(
        out_low, codecs.resample_audio(rate, low, target)
    )
    # upsample: length scales, identity rate is a copy
    assert len(codecs.resample_audio(rate, low, 16000)) == 2 * rate
    np.testing.assert_array_equal(
        codecs.resample_audio(rate, low, rate), low
    )


def test_spark_resample_audio_roundtrip_and_boundary(spark):
    rate, target = 8000, 4000
    t = np.arange(rate) / rate
    tone = np.sin(2 * np.pi * 440 * t) * 0.5
    wav = codecs.encode_wav(rate, tone)
    media = _media_df(
        spark, [("audio/wav", "pcm", wav), ("image", "bmp",
                                            codecs.encode_bmp(_rgb(4, 4)))]
    )
    out = multimodal.resample_audio(
        media.filter("asset_id = 0"), target
    ).collect()
    assert len(out) == 1 and out[0].sample_rate == target
    r2, s2 = codecs.decode_wav(bytes(out[0].content))
    assert r2 == target and len(s2) == target
    # non-WAV asset hits the codec boundary, not a decode error
    with pytest.raises(Exception) as ei:
        multimodal.resample_audio(media.filter("asset_id = 1"), target).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )
    # fake path keeps the plumbing drivable without the codec
    fake = multimodal.resample_audio(media, target, fake=True).collect()
    assert {r.asset_id for r in fake} == {0, 1}
