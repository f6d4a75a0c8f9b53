"""GIF codec (``operators.gif``): LZW round-trips are EXACT (palette
format — lossless for ≤256-color images), dictionary growth + CLEAR
resets, multi-frame decode, interlace, sub-block framing, and the
palette-size boundary."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from process_alphafold3_outputs_spark.operators import codecs, gif


def _paletted(h, w, ncolors, seed=0):
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, (ncolors, 3), dtype=np.uint8)
    return pal[rng.randint(0, ncolors, (h, w))]


@pytest.mark.parametrize("ncolors", [2, 5, 16, 200, 256])
def test_roundtrip_exact_across_palette_sizes(ncolors):
    img = _paletted(23, 31, ncolors, seed=ncolors)
    np.testing.assert_array_equal(gif.decode_gif(gif.encode_gif(img)), img)


def test_roundtrip_forces_dictionary_growth_and_clear():
    # large noisy index stream -> LZW table hits 4096 and resets
    img = _paletted(120, 130, 256, seed=1)
    data = gif.encode_gif(img)
    np.testing.assert_array_equal(gif.decode_gif(data), img)


def test_lzw_primitives_roundtrip():
    rng = np.random.RandomState(4)
    for n in (2, 3, 5, 8):
        syms = rng.randint(0, 1 << n, 5000).tolist()
        enc = gif._lzw_encode(n, syms)
        assert gif._lzw_decode(n, enc) == syms


def test_multi_frame_decode_composites_on_canvas():
    """Hand-build a 2-frame GIF: frame 2 overwrites a sub-rectangle."""
    base = _paletted(10, 10, 4, seed=2)
    f1 = gif.encode_gif(base)
    patch = _paletted(4, 4, 4, seed=3)
    f2 = gif.encode_gif(patch)
    # splice frame 2's descriptor+data into file 1 before the trailer,
    # repositioned at (3, 2) with its own local palette
    def parts(data):
        flags = data[10]
        n = 2 << (flags & 7)
        pal = data[13 : 13 + n * 3]
        body = data[13 + n * 3 : -1]  # image descriptor..data, no trailer
        return flags, pal, body

    flags2, pal2, body2 = parts(f2)
    # rewrite frame-2 descriptor: position (3,2) + local color table
    assert body2[0] == 0x2C
    _, _, w2, h2, _ = struct.unpack_from("<HHHHB", body2, 1)
    ldesc = b"\x2c" + struct.pack(
        "<HHHHB", 3, 2, w2, h2, 0x80 | (flags2 & 7)
    ) + pal2 + body2[10:]
    combined = f1[:-1] + ldesc + b"\x3b"
    frames = gif.decode_gif_frames(combined)
    assert len(frames) == 2
    np.testing.assert_array_equal(frames[0], base)
    want = base.copy()
    want[2:6, 3:7] = patch
    np.testing.assert_array_equal(frames[1], want)


def test_interlaced_frame_deinterlaces():
    img = _paletted(16, 8, 8, seed=5)
    data = bytearray(gif.encode_gif(img))
    # flip the interlace bit in the image descriptor and reorder rows
    # into the 4-pass order the flag promises
    n = 2 << (data[10] & 7)
    desc_at = 13 + n * 3
    assert data[desc_at] == 0x2C
    data[desc_at + 9] |= 0x40
    h = img.shape[0]
    order = (list(range(0, h, 8)) + list(range(4, h, 8))
             + list(range(2, h, 4)) + list(range(1, h, 2)))
    permuted = img[order]
    inner = gif.encode_gif(permuted)
    # swap in the permuted image's LZW payload (same palette? palettes
    # are built from unique colors — same color set, same palette)
    n2 = 2 << (inner[10] & 7)
    payload = inner[13 + n2 * 3 + 10 :-1]
    rebuilt = bytes(data[: desc_at + 10]) + payload + b"\x3b"
    np.testing.assert_array_equal(gif.decode_gif(rebuilt), img)


def test_palette_overflow_raises():
    rng = np.random.RandomState(6)
    img = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)  # ~1024 colors
    with pytest.raises(ValueError, match="distinct colors"):
        gif.encode_gif(img)


def test_error_boundaries():
    with pytest.raises(ValueError, match="not a GIF"):
        gif.decode_gif(b"PNG....")
    with pytest.raises(ValueError, match="no image frames"):
        gif.decode_gif(b"GIF89a" + struct.pack("<HHBBB", 1, 1, 0, 0, 0) + b"\x3b")


def test_codecs_entrypoints_route_gif():
    img = _paletted(9, 12, 7, seed=7)
    data = codecs.encode_image("gif", img)
    assert codecs.sniff(data) == "gif"
    fmt, rgb = codecs.decode_image(data)
    assert fmt == "gif"
    np.testing.assert_array_equal(rgb, img)


def test_quantize_colors_bounds_palette_and_enables_gif():
    rng = np.random.RandomState(8)
    img = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)  # ~1024 colors
    q = gif.quantize_colors(img, n=256)
    assert len(np.unique(q.reshape(-1, 3), axis=0)) <= 256
    # quantized image round-trips through GIF exactly
    np.testing.assert_array_equal(gif.decode_gif(gif.encode_gif(q)), q)
    # mean absolute error stays modest (boxes average nearby colors)
    assert np.abs(q.astype(int) - img.astype(int)).mean() < 24
    # already-paletted images pass through untouched
    small = _paletted(8, 8, 5, seed=9)
    np.testing.assert_array_equal(gif.quantize_colors(small, 256), small)
    # determinism
    np.testing.assert_array_equal(q, gif.quantize_colors(img, n=256))
