"""Pure-Python image codecs for the multimodal pipeline: uncompressed
24-bit BMP (BITMAPINFOHEADER, BI_RGB), binary PPM (P6), 8-bit PNG
(grayscale/RGB/RGBA, non-interlaced — stdlib ``zlib`` inflate +
per-row unfiltering), baseline JPEG (sequential DCT, Huffman,
4:4:4 / 4:2:2 / 4:2:0 — ``operators.jpeg``), and GIF87a/89a
(palette + variable-width LZW — ``operators.gif``).

These formats need no external library — BMP/PPM are fixed headers over
raw RGB samples, PNG's DEFLATE stream is stdlib, JPEG's entropy coding
and DCT are implemented from the public T.81 spec — so
``operators.multimodal`` has REAL decode paths for every common still
image format in this container. Only video remains behind the
documented ``NotImplementedError`` boundary.

Format layouts are public knowledge (BMP: Windows BITMAPFILEHEADER +
BITMAPINFOHEADER; PPM: the netpbm P6 spec; PNG: RFC 2083 / the W3C PNG
spec — chunk framing, filter types 0-4, Paeth predictor; JPEG: ITU-T
T.81). Decoded output is a numpy ``(height, width, 3)`` uint8 array in
RGB order, top-down (PNG alpha is dropped, grayscale broadcast to RGB).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

#: formats :func:`decode_image` can actually decode — guard membership
#: with this, not ``fmt is None`` (sniff also returns non-image formats
#: like 'avi' that must hit the NotImplementedError codec boundary, not
#: a generic decode ValueError)
IMAGE_FORMATS = frozenset({"bmp", "ppm", "png", "gif", "jpeg"})


def sniff(content: bytes) -> str | None:
    """'bmp'|'ppm'|'png'|'jpeg'|'wav'|None for an asset's first bytes."""
    if content[:2] == b"BM":
        return "bmp"
    if content[:2] == b"P6":
        return "ppm"
    if content[:8] == PNG_MAGIC:
        return "png"
    if content[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if content[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        return "wav"
    if content[:4] == b"RIFF" and content[8:12] == b"AVI ":
        return "avi"
    return None


# --------------------------------------------------------------------------
# BMP — uncompressed 24bpp, BITMAPINFOHEADER
# --------------------------------------------------------------------------

def decode_bmp(content: bytes) -> np.ndarray:
    if content[:2] != b"BM":
        raise ValueError("not a BMP stream")
    if len(content) < 54:
        raise ValueError("truncated BMP header")
    pixel_offset = struct.unpack_from("<I", content, 10)[0]
    header_size = struct.unpack_from("<I", content, 14)[0]
    if header_size < 40:
        raise ValueError(f"unsupported DIB header size {header_size}")
    width, height = struct.unpack_from("<ii", content, 18)
    planes, bpp = struct.unpack_from("<HH", content, 26)
    compression = struct.unpack_from("<I", content, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"only uncompressed 24bpp BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    if width <= 0 or height == 0:
        raise ValueError(f"bad dimensions {width}x{height}")
    bottom_up = height > 0
    height = abs(height)
    row_stride = (width * 3 + 3) & ~3  # rows pad to 4-byte boundary
    need = pixel_offset + row_stride * height
    if len(content) < need:
        raise ValueError("truncated BMP pixel data")
    raw = np.frombuffer(
        content, dtype=np.uint8, count=row_stride * height, offset=pixel_offset
    ).reshape(height, row_stride)
    bgr = raw[:, : width * 3].reshape(height, width, 3)
    rgb = bgr[:, :, ::-1]
    if bottom_up:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def encode_bmp(rgb: np.ndarray) -> bytes:
    h, w, c = rgb.shape
    if c != 3:
        raise ValueError("expected (h, w, 3) RGB array")
    row_stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_stride), dtype=np.uint8)
    rows[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pixels = rows.tobytes()
    file_header = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels),
                      2835, 2835, 0, 0)
    return file_header + dib + pixels


# --------------------------------------------------------------------------
# PPM — binary P6, maxval <= 255
# --------------------------------------------------------------------------

def decode_ppm(content: bytes) -> np.ndarray:
    if content[:2] != b"P6":
        raise ValueError("not a P6 PPM stream")
    # header = magic, width, height, maxval as whitespace-separated
    # tokens; '#' starts a comment through end-of-line
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if pos < len(content) and content[pos : pos + 1] == b"#":
            while pos < len(content) and content[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        tokens.append(content[start:pos])
    pos += 1  # single whitespace byte after maxval, then raster
    width, height, maxval = (int(t) for t in tokens)
    if width <= 0 or height <= 0 or not (0 < maxval < 256):
        raise ValueError(f"bad PPM header {width}x{height} maxval={maxval}")
    need = width * height * 3
    if len(content) - pos < need:
        raise ValueError("truncated PPM raster")
    return (
        np.frombuffer(content, dtype=np.uint8, count=need, offset=pos)
        .reshape(height, width, 3)
        .copy()
    )


def encode_ppm(rgb: np.ndarray) -> bytes:
    h, w, c = rgb.shape
    if c != 3:
        raise ValueError("expected (h, w, 3) RGB array")
    return b"P6\n%d %d\n255\n" % (w, h) + rgb.astype(np.uint8).tobytes()


# --------------------------------------------------------------------------
# PNG — 8-bit depth, color types 0 (gray) / 2 (RGB) / 6 (RGBA),
# non-interlaced. Inflate via stdlib zlib; scanline unfiltering per the
# W3C PNG spec (filter types 0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth).
# --------------------------------------------------------------------------

_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def _unfilter_row(
    ftype: int, row: np.ndarray, prior: np.ndarray, bpp: int
) -> np.ndarray:
    """Reconstruct one scanline from its filtered bytes. Types 0/1/2 are
    vectorized; Average and Paeth reference the just-reconstructed left
    neighbour so they run a per-byte loop (fine for the Arrow-batched
    decode path — each image decodes once inside a mapInPandas batch)."""
    if ftype == 0:
        return row
    if ftype == 2:
        return (row.astype(np.int32) + prior).astype(np.uint8)
    if ftype == 1:
        # recon[x] = filt[x] + recon[x-bpp]: a cumulative sum mod 256
        # down each byte lane of width bpp
        lanes = row.reshape(-1, bpp).astype(np.int64)
        return (np.cumsum(lanes, axis=0) % 256).astype(np.uint8).reshape(-1)
    recon = row.astype(np.int32)
    pr = prior.astype(np.int32)
    if ftype == 3:
        for i in range(len(recon)):
            a = int(recon[i - bpp]) if i >= bpp else 0
            recon[i] = (recon[i] + (a + int(pr[i])) // 2) % 256
        return recon.astype(np.uint8)
    if ftype == 4:
        for i in range(len(recon)):
            a = int(recon[i - bpp]) if i >= bpp else 0
            b = int(pr[i])
            c = int(pr[i - bpp]) if i >= bpp else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            recon[i] = (recon[i] + pred) % 256
        return recon.astype(np.uint8)
    raise ValueError(f"bad PNG filter type {ftype}")


def decode_png(content: bytes) -> np.ndarray:
    if content[:8] != PNG_MAGIC:
        raise ValueError("not a PNG stream")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(content):
        length, ctype = struct.unpack_from(">I4s", content, pos)
        pos += 8
        data = content[pos : pos + length]
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        pos += length + 4  # payload + CRC (CRC not verified: zlib's
        # adler32 already guards the pixel stream end-to-end)
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    w, h, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    channels = _PNG_CHANNELS.get(color)
    if depth != 8 or channels is None or comp != 0 or filt != 0:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, color={color}, "
            f"compression={comp}, filter={filt}) — 8-bit gray/RGB/RGBA only"
        )
    if interlace != 0:
        raise ValueError("interlaced (Adam7) PNG not supported")
    if w <= 0 or h <= 0:
        raise ValueError(f"bad dimensions {w}x{h}")
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) < (stride + 1) * h:
        raise ValueError("truncated PNG pixel data")
    out = np.empty((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    p = 0
    for y in range(h):
        ftype = raw[p]
        p += 1
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=p).copy()
        p += stride
        prior = _unfilter_row(ftype, row, prior, channels)
        out[y] = prior
    px = out.reshape(h, w, channels)
    if channels == 1:
        px = np.repeat(px, 3, axis=2)
    return np.ascontiguousarray(px[:, :, :3])


def encode_png(rgb: np.ndarray) -> bytes:
    """8-bit RGB PNG, filter type 0 per scanline, one zlib IDAT."""
    h, w, c = rgb.shape
    if c != 3:
        raise ValueError("expected (h, w, 3) RGB array")
    body = rgb.astype(np.uint8)
    raw = b"".join(b"\x00" + body[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


# --------------------------------------------------------------------------
# shared entry points used by operators.multimodal
# --------------------------------------------------------------------------

def decode_image(content: bytes) -> tuple[str, np.ndarray]:
    """(format, rgb array) for a supported stream; ValueError otherwise."""
    fmt = sniff(content)
    if fmt == "bmp":
        return fmt, decode_bmp(content)
    if fmt == "ppm":
        return fmt, decode_ppm(content)
    if fmt == "png":
        return fmt, decode_png(content)
    if fmt == "jpeg":
        from . import jpeg

        return fmt, jpeg.decode_jpeg(content)
    if fmt == "gif":
        from . import gif

        return fmt, gif.decode_gif(content)
    raise ValueError("unsupported image format")


def encode_image(fmt: str, rgb: np.ndarray) -> bytes:
    if fmt == "bmp":
        return encode_bmp(rgb)
    if fmt == "ppm":
        return encode_ppm(rgb)
    if fmt == "png":
        return encode_png(rgb)
    if fmt == "jpeg":
        from . import jpeg

        return jpeg.encode_jpeg(rgb)
    if fmt == "gif":
        from . import gif

        return gif.encode_gif(rgb)
    raise ValueError(f"unsupported image format {fmt!r}")


def resize_nearest(rgb: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbour resample — deterministic integer index math."""
    h, w = rgb.shape[:2]
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    return np.ascontiguousarray(rgb[rows][:, cols])


def image_features(rgb: np.ndarray, dim: int) -> list[float]:
    """``dim`` deterministic floats in [0, 1]: normalized dimensions,
    per-channel means, and luminance spread — a real (if simple)
    feature vector computed from decoded pixels."""
    flat = rgb.reshape(-1, 3).astype(np.float64) / 255.0
    luma = flat @ np.array([0.2126, 0.7152, 0.0722])
    h, w = rgb.shape[:2]
    feats = [
        min(w / 4096.0, 1.0),
        min(h / 4096.0, 1.0),
        float(flat[:, 0].mean()),
        float(flat[:, 1].mean()),
        float(flat[:, 2].mean()),
        float(luma.std()),
        float(luma.min()),
        float(luma.max()),
    ]
    return [float(round(v, 6)) for v in feats[:dim]]


# --------------------------------------------------------------------------
# WAV — PCM audio via the stdlib ``wave`` module (no external codec
# libraries needed): 8/16-bit mono or multichannel
# --------------------------------------------------------------------------


def decode_wav(content: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, samples float64 in [-1, 1], channels averaged) for
    a PCM WAV container. Raises on compressed/float WAV (honest codec
    boundary, same policy as the image side)."""
    import io
    import wave

    with wave.open(io.BytesIO(content), "rb") as w:
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        rate = w.getframerate()
        frames = w.readframes(w.getnframes())
    if width == 2:
        samples = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        samples = (
            np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0
        ) / 128.0
    else:
        raise NotImplementedError(f"unsupported PCM sample width {width}")
    if n_ch > 1:
        samples = samples.reshape(-1, n_ch).mean(axis=1)
    return rate, samples


def encode_wav(rate: int, samples: np.ndarray) -> bytes:
    """16-bit mono PCM WAV from float samples in [-1, 1]."""
    import io
    import wave

    pcm = np.clip(samples, -1.0, 1.0)
    ints = np.round(pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(ints.tobytes())
    return buf.getvalue()


def audio_features(rate: int, samples: np.ndarray, dim: int) -> list[float]:
    """``dim`` deterministic floats in [0, 1] from decoded PCM:
    normalized duration, RMS level, peak, zero-crossing rate, and a
    4-bin coarse energy envelope."""
    n = max(len(samples), 1)
    dur = n / float(rate) if rate else 0.0
    rms = float(np.sqrt(np.mean(samples**2))) if len(samples) else 0.0
    peak = float(np.max(np.abs(samples))) if len(samples) else 0.0
    zc = (
        float(np.mean(np.abs(np.diff(np.signbit(samples).astype(np.int8)))))
        if len(samples) > 1
        else 0.0
    )
    feats = [min(dur / 3600.0, 1.0), min(rms, 1.0), min(peak, 1.0), zc]
    for q in np.array_split(samples, 4):
        feats.append(float(np.sqrt(np.mean(q**2))) if len(q) else 0.0)
    return [float(round(v, 6)) for v in feats[:dim]]


# --------------------------------------------------------------------------
# perceptual hash (aHash): 8x8 nearest-resize -> luma -> mean threshold
# --------------------------------------------------------------------------


def average_hash(rgb: np.ndarray) -> tuple[int, int]:
    """(hi, lo) 32-bit words of the 64-bit average hash: nearest-resize
    to 8x8, FIXED-POINT ITU-R 709 luma (2126·R + 7152·G + 722·B — all
    integer, so the mean threshold ``luma·64 > Σluma`` is exact on
    every engine; float luma puts cells exactly AT the mean one ulp
    from flipping between engines), bit i (row-major y*8+x) set iff
    strictly above the mean. Two words keep every value inside
    signed-64 (same packing policy as simhash64)."""
    small = resize_nearest(rgb, 8, 8)
    luma = small.astype(np.int64) @ np.array([2126, 7152, 722], dtype=np.int64)
    total = int(luma.sum())
    bits = (luma.reshape(-1) * 64 > total).astype(np.int64)  # row-major
    hi = int(sum(int(bits[i]) << i for i in range(32)))
    lo = int(sum(int(bits[32 + i]) << i for i in range(32)))
    return hi, lo


def hamming64(a: tuple[int, int], b: tuple[int, int]) -> int:
    """Hamming distance between two (hi, lo) average hashes."""
    return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")


# --------------------------------------------------------------------------
# audio fingerprint: coarse spectral-envelope sign hash (the
# Haitsma-Kalker / Chromaprint family of robust hashes, public
# technique): frame the signal, per-frame log-band energies via a
# numpy FFT, hash = sign of the (band, time) energy DELTAS. Robust to
# level changes (deltas) and small noise (coarse bands); two encodings
# of the same recording land within small Hamming distance.
# --------------------------------------------------------------------------

_AFP_BANDS = 8          # frequency bands per frame -> 8 delta bits
_AFP_FRAMES = 9         # analysis frames -> 8 frame-to-frame deltas


def audio_fingerprint(rate: int, samples: np.ndarray) -> tuple[int, int]:
    """(hi, lo) 32-bit words of a 64-bit spectral fingerprint: the
    clip is split into _AFP_FRAMES equal frames; each frame's spectrum
    collapses into _AFP_BANDS log-spaced band energies; bit (f, b) is
    set iff band b's energy ROSE from frame f to f+1 (8 deltas x 8
    bands = 64 bits, packed row-major). Deterministic: fixed framing,
    fixed bands, integer threshold on a float comparison whose inputs
    are exact sums — no RNG, no library DSP."""
    n = len(samples)
    if n < _AFP_FRAMES * 2:
        samples = np.pad(samples, (0, _AFP_FRAMES * 2 - n))
        n = len(samples)
    frame_len = n // _AFP_FRAMES
    energies = np.zeros((_AFP_FRAMES, _AFP_BANDS))
    for f in range(_AFP_FRAMES):
        frame = samples[f * frame_len : (f + 1) * frame_len]
        spec = np.abs(np.fft.rfft(frame)) ** 2
        # log-spaced band edges over the positive spectrum (DC dropped)
        edges = np.unique(
            np.geomspace(1, len(spec) - 1, _AFP_BANDS + 1).astype(int)
        )
        while len(edges) < _AFP_BANDS + 1:  # tiny frames: pad edges
            edges = np.append(edges, edges[-1] + 1)
        for b in range(_AFP_BANDS):
            lo_e, hi_e = edges[b], edges[b + 1]
            energies[f, b] = spec[lo_e:hi_e].sum() if hi_e > lo_e else 0.0
    bits = (np.diff(energies, axis=0) > 0).astype(np.int64).reshape(-1)
    hi = int(sum(int(bits[i]) << i for i in range(32)))
    lo = int(sum(int(bits[32 + i]) << i for i in range(32)))
    return hi, lo


def resample_audio(
    rate: int, samples: np.ndarray, target_rate: int, taps: int = 63
) -> np.ndarray:
    """Deterministic sample-rate conversion (pure numpy, no library
    DSP — same policy as every codec here): downsampling applies a
    Hamming-windowed-sinc anti-alias low-pass (cutoff at the TARGET
    Nyquist) before picking output samples by linear interpolation at
    exact rational positions; upsampling is linear interpolation (the
    signal is already band-limited below the new Nyquist)."""
    if target_rate <= 0 or rate <= 0:
        raise ValueError("rates must be positive")
    if target_rate == rate or len(samples) == 0:
        return samples.astype(np.float64, copy=True)
    x = samples.astype(np.float64)
    if target_rate < rate:
        # windowed-sinc low-pass, cutoff = target Nyquist / input rate
        fc = 0.5 * target_rate / rate
        m = np.arange(taps) - (taps - 1) / 2.0
        h = 2 * fc * np.sinc(2 * fc * m) * np.hamming(taps)
        h /= h.sum()
        x = np.convolve(x, h, mode="same")
    n_out = int(len(x) * target_rate // rate)
    # exact rational positions: pos_i = i * rate / target (float64 on
    # integer inputs — deterministic)
    pos = np.arange(n_out) * (rate / target_rate)
    i0 = np.minimum(pos.astype(np.int64), len(x) - 1)
    i1 = np.minimum(i0 + 1, len(x) - 1)
    frac = pos - i0
    return x[i0] * (1 - frac) + x[i1] * frac
