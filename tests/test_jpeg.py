"""Pure-Python baseline JPEG codec (``operators.jpeg``): round-trip
reconstruction bounds, spec-path coverage (4:2:0 upsampling, restart
markers, byte stuffing, zigzag, canonical Huffman), a direct DCT-matrix
differential, and the honest error boundary (progressive, truncation).

JPEG is lossy, so round trips are PSNR-bounded rather than exact; the
flat-image case IS exact (a constant block quantizes to a lone DC
coefficient at any quality).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from process_alphafold3_outputs_spark.operators import codecs, jpeg, multimodal


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 99.0 if mse == 0 else float(10 * np.log10(255.0**2 / mse))


def _smooth(h: int, w: int) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    return (
        np.dstack(
            [
                128 + 100 * np.sin(x / 15),
                128 + 100 * np.cos(y / 17),
                128 + 80 * np.sin((x + y) / 21),
            ]
        )
        .clip(0, 255)
        .astype(np.uint8)
    )


def test_dct_matrix_is_orthonormal():
    c = jpeg._dct_matrix()
    np.testing.assert_allclose(c @ c.T, np.eye(8), atol=1e-12)


def test_zigzag_is_a_permutation_with_spec_prefix():
    zz = jpeg._zigzag()
    assert sorted(zz) == [(r, c) for r in range(8) for c in range(8)]
    # the spec's first diagonal steps (T.81 Figure 5)
    assert zz[:6] == [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2)]


def test_canonical_huffman_codes_are_prefix_free():
    codes = jpeg._canonical_codes(jpeg._AC_LUMA_BITS, jpeg._AC_LUMA_VALS)
    assert len(codes) == sum(jpeg._AC_LUMA_BITS)
    as_bits = {format(c, f"0{ln}b") for c, ln in codes.values()}
    assert len(as_bits) == len(codes)  # distinct
    for a in as_bits:
        for b in as_bits:
            if a != b:
                assert not b.startswith(a), (a, b)


def test_flat_image_roundtrips_exactly():
    # flat 128 gray: every DCT coefficient is 0 after the level shift,
    # so reconstruction is EXACT at any quality; other flat values may
    # sit half a quantization step off (legitimate DC rounding) — bound
    # those at 1
    for q in (50, 85, 95):
        img = np.full((16, 24, 3), 128, dtype=np.uint8)
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=q))
        np.testing.assert_array_equal(out, img)
        img77 = np.full((16, 24, 3), 77, dtype=np.uint8)
        out77 = jpeg.decode_jpeg(jpeg.encode_jpeg(img77, quality=q))
        assert np.abs(out77.astype(int) - 77).max() <= 1


@pytest.mark.parametrize("w,h", [(8, 8), (33, 41), (17, 9)])
def test_roundtrip_psnr_on_smooth_images(w, h):
    img = _smooth(h, w)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90))
    assert out.shape == img.shape
    assert _psnr(img, out) > 38.0


def test_quality_ladder_monotone():
    img = _smooth(32, 32)
    scores = [
        _psnr(img, jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=q)))
        for q in (20, 50, 90)
    ]
    assert scores[0] < scores[1] < scores[2]


def test_noise_roundtrip_bounded():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (24, 24, 3), dtype=np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=95))
    assert _psnr(img, out) > 30.0


def test_420_subsampling_roundtrip_and_sof_factors():
    img = _smooth(35, 41)  # non-multiple of 16: pad + crop both exercised
    data = jpeg.encode_jpeg(img, quality=90, subsampling="420")
    # SOF0 declares Y at 2x2, chroma at 1x1
    sof = data.find(b"\xff\xc0")
    assert data[sof + 11] == 0x22 and data[sof + 14] == 0x11
    out = jpeg.decode_jpeg(data)
    assert out.shape == img.shape
    assert _psnr(img, out) > 35.0
    # 4:2:0 loses chroma detail vs 4:4:4 but stays close on smooth data
    assert _psnr(img, jpeg.decode_jpeg(jpeg.encode_jpeg(img, 90))) >= _psnr(
        img, out
    ) - 1e-9


def test_restart_markers_roundtrip_identically():
    img = _smooth(35, 41)
    plain = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90))
    with_rst = jpeg.decode_jpeg(
        jpeg.encode_jpeg(img, quality=90, restart_interval=2)
    )
    # restart markers change the container, not the pixels
    np.testing.assert_array_equal(plain, with_rst)
    assert b"\xff\xd0" in jpeg.encode_jpeg(img, quality=90, restart_interval=2)


def test_byte_stuffing_survives():
    # an image engineered to produce many 0xFF bytes in the entropy
    # stream — any unstuffing bug corrupts the stream mid-scan
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (40, 40, 3), dtype=np.uint8)
    data = jpeg.encode_jpeg(img, quality=99)
    assert b"\xff\x00" in data  # stuffing actually happened
    out = jpeg.decode_jpeg(data)
    assert _psnr(img, out) > 28.0


def test_single_block_dc_only_matches_direct_idct():
    """A hand-quantized DC-only block must decode to exactly what the
    orthonormal IDCT predicts — pins dequant + IDCT + level shift
    against an independent computation."""
    img = np.full((8, 8, 3), 200, dtype=np.uint8)
    data = jpeg.encode_jpeg(img, quality=90)
    out = jpeg.decode_jpeg(data)
    # direct reference: Y=200 (gray): DC = 8*(200-128)=576 pre-quant;
    # with quality-90 luma q[0,0], the decoder must reproduce
    # round(576/q)*q/8 + 128 in every pixel
    qy, _ = jpeg._quality_tables(90)
    want = round(
        np.round(8 * (200.0 - 128.0) / qy[0, 0]) * qy[0, 0] / 8.0 + 128.0
    )
    np.testing.assert_array_equal(out, np.full((8, 8, 3), want, np.uint8))


def test_error_boundaries():
    img = _smooth(16, 16)
    data = bytearray(jpeg.encode_jpeg(img))
    # flip SOF0 -> SOF2 (progressive)
    sof = bytes(data).find(b"\xff\xc0")
    data[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        jpeg.decode_jpeg(bytes(data))
    with pytest.raises(ValueError, match="not a JPEG"):
        jpeg.decode_jpeg(b"\x89PNG1234")
    with pytest.raises(ValueError, match="no SOS"):
        jpeg.decode_jpeg(b"\xff\xd8\xff\xd9")
    with pytest.raises(ValueError):
        jpeg.encode_jpeg(np.zeros((0, 4, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="subsampling"):
        jpeg.encode_jpeg(img, subsampling="422x")


def test_codecs_entrypoints_route_jpeg():
    img = _smooth(12, 20)
    data = codecs.encode_image("jpeg", img)
    assert codecs.sniff(data) == "jpeg"
    fmt, rgb = codecs.decode_image(data)
    assert fmt == "jpeg"
    assert _psnr(img, rgb) > 38.0


def test_extract_features_real_decode_jpeg(spark):
    """The Spark-side real path: a JPEG asset flows through
    extract_features(fake=False) and the features equal those computed
    from the decoded pixels."""
    img = _smooth(12, 16)
    data = codecs.encode_image("jpeg", img)
    media = spark.createDataFrame(
        [(0, "image/jpeg", bytearray(data),
          {"width": 16, "height": 12, "duration_ms": None, "codec": "jpeg"})],
        multimodal.MEDIA_SCHEMA,
    )
    row = multimodal.extract_features(media, fake=False).collect()[0]
    want = codecs.image_features(
        codecs.decode_image(data)[1], multimodal.FEATURE_DIM
    )
    assert [round(float(v), 6) for v in row.features] == pytest.approx(
        want, abs=1e-5
    )


def test_resize_images_real_jpeg(spark):
    img = _smooth(20, 16)
    media = spark.createDataFrame(
        [(0, "image/jpeg", bytearray(codecs.encode_image("jpeg", img)),
          {"width": 16, "height": 20, "duration_ms": None, "codec": "jpeg"})],
        multimodal.MEDIA_SCHEMA,
    )
    row = multimodal.resize_images(media, 8, 10, fake=False).collect()[0]
    assert row.meta.codec == "jpeg"
    fmt, rgb = codecs.decode_image(bytes(row.content))
    assert fmt == "jpeg" and rgb.shape == (10, 8, 3)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_fuzz_truncation_and_corruption_raise_cleanly(seed):
    """Truncated or bit-flipped streams must raise (ValueError or a
    clearly-typed error), never hang or return garbage silently — a
    malformed asset in a 100 TB corpus must fail the row, not the
    executor."""
    rng = np.random.RandomState(seed)
    img = _smooth(16, 16)
    data = bytearray(jpeg.encode_jpeg(img, quality=80))
    # truncate at an arbitrary point past the header
    cut = rng.randint(30, len(data) - 1)
    try:
        jpeg.decode_jpeg(bytes(data[:cut]))
    except (ValueError, struct.error, IndexError):
        pass
    # flip a byte somewhere in the stream
    flip = rng.randint(2, len(data) - 3)
    mutated = bytearray(data)
    mutated[flip] ^= 0xFF
    try:
        out = jpeg.decode_jpeg(bytes(mutated))
        # a survivable flip (entropy data) must still produce a valid frame
        assert out.dtype == np.uint8 and out.ndim == 3
    except (ValueError, KeyError, struct.error, IndexError):
        pass

