"""Pure-Python GIF codec (GIF87a/89a — the public W3C/CompuServe spec):
palette-indexed images with LZW-compressed index streams.

Decoder: logical screen descriptor, global/local color tables,
graphic-control and application extensions (skipped), per-frame LZW
decode (variable code width 3-12 bits, CLEAR/EOI handling, LSB-first
sub-block bit packing). Multi-frame GIFs decode to a list of frames;
interlaced frames are de-interlaced (the 4-pass row order). Transparency
is ignored (frames composite as opaque — fine for the feature-extraction
use here).

Encoder: GIF89a, single frame, global color table built from the
image's distinct colors (≤256 required — GIF is a palette format; a
true-color image must be quantized upstream), LZW with the exact
code-width schedule the decoder mirrors. Lossless for any image that
fits a 256-color palette — so round-trip equality tests are EXACT,
unlike JPEG.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")


# --------------------------------------------------------------------------
# LZW (GIF variant: LSB-first, variable 3-12 bit codes, CLEAR/EOI)
# --------------------------------------------------------------------------


def _lzw_decode(min_code_size: int, data: bytes) -> list[int]:
    clear = 1 << min_code_size
    eoi = clear + 1
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    code_size = min_code_size + 1
    out: list[int] = []
    prev: list[int] | None = None
    bitbuf = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < code_size:
            if pos >= len(data):
                return out  # missing EOI: tolerate (common in the wild)
            bitbuf |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = bitbuf & ((1 << code_size) - 1)
        bitbuf >>= code_size
        nbits -= code_size
        if code == clear:
            table = [[i] for i in range(clear)] + [[], []]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if code < len(table) and (code < clear or table[code]):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"corrupt GIF LZW stream (code {code})")
        out.extend(entry)
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    raise AssertionError("unreachable")


def _lzw_encode(min_code_size: int, indices: list[int]) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    def fresh() -> tuple[dict, int, int]:
        return (
            {(i,): i for i in range(clear)},
            eoi + 1,          # next code the DECODER will assign
            min_code_size + 1,
        )

    table, next_code, code_size = fresh()
    emit(clear, code_size)
    prefix: tuple[int, ...] = ()
    for sym in indices:
        cand = prefix + (sym,)
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], code_size)
        # mirror the decoder exactly: it appends one entry per emitted
        # code (after the first), then widens when the table fills
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << code_size) + 1 and code_size < 12:
            code_size += 1
        if next_code >= 4096:
            emit(clear, code_size)
            table, next_code, code_size = fresh()
        prefix = (sym,)
    if prefix:
        emit(table[prefix], code_size)
    emit(eoi, code_size)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


# --------------------------------------------------------------------------
# container
# --------------------------------------------------------------------------


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    out = np.empty_like(rows)
    out[order] = rows
    return out


def decode_gif_frames(content: bytes) -> list[np.ndarray]:
    """Every frame of a GIF as (h, w, 3) uint8 RGB arrays (frames are
    decoded independently on their own canvas region over the logical
    screen; disposal semantics are 'replace' — adequate for sampling)."""
    if content[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF stream")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", content, 6)
    pos = 13
    global_pal = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        global_pal = np.frombuffer(
            content, dtype=np.uint8, count=n * 3, offset=pos
        ).reshape(n, 3)
        pos += n * 3
    canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
    frames: list[np.ndarray] = []
    while pos < len(content):
        b = content[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(content) and content[pos] != 0:
                pos += 1 + content[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            x, y, w, h, lflags = struct.unpack_from("<HHHHB", content, pos + 1)
            pos += 10
            pal = global_pal
            if lflags & 0x80:
                n = 2 << (lflags & 7)
                pal = np.frombuffer(
                    content, dtype=np.uint8, count=n * 3, offset=pos
                ).reshape(n, 3)
                pos += n * 3
            if pal is None:
                raise ValueError("GIF frame has no color table")
            min_code = content[pos]
            pos += 1
            lzw = bytearray()
            while pos < len(content) and content[pos] != 0:
                ln = content[pos]
                lzw += content[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(min_code, bytes(lzw))
            if len(idx) < w * h:
                raise ValueError("truncated GIF frame data")
            arr = np.array(idx[: w * h], dtype=np.int32).reshape(h, w)
            if arr.max() >= len(pal):
                raise ValueError("GIF index out of palette range")
            rows = pal[arr]
            if lflags & 0x40:
                rows = _deinterlace(rows)
            canvas[y : y + h, x : x + w] = rows
            frames.append(canvas.copy())
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
    if not frames:
        raise ValueError("GIF contains no image frames")
    return frames


def decode_gif(content: bytes) -> np.ndarray:
    """First frame as (h, w, 3) uint8 RGB."""
    return decode_gif_frames(content)[0]


def encode_gif(rgb: np.ndarray) -> bytes:
    """Single-frame GIF89a for an (h, w, 3) uint8 image with ≤256
    distinct colors (GIF is palette-indexed: quantize upstream if
    needed — raising beats silently mangling colors)."""
    h, w, c = rgb.shape
    if c != 3:
        raise ValueError("expected (h, w, 3) RGB array")
    flat = rgb.reshape(-1, 3)
    pal, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError(
            f"{len(pal)} distinct colors: GIF needs <=256 (quantize first)"
        )
    # palette size must be a power of two, minimum 2 entries
    bits = max(1, int(len(pal) - 1).bit_length())
    padded = np.zeros((1 << bits, 3), dtype=np.uint8)
    padded[: len(pal)] = pal
    min_code = max(2, bits)
    lzw = _lzw_encode(min_code, inverse.astype(int).tolist())
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += padded.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out += bytes([min_code])
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out += bytes([len(block)]) + block
    out += b"\x00\x3b"
    return bytes(out)


def quantize_colors(rgb: np.ndarray, n: int = 256) -> np.ndarray:
    """Median-cut color quantization (Heckbert 1982 — public technique):
    an (h, w, 3) uint8 image reduced to at most ``n`` distinct colors,
    each pixel mapped to the mean color of its box. Deterministic (ties
    split on the lowest channel index, boxes keyed by creation order) —
    the upstream step that makes any true-color image GIF-encodable."""
    h, w, _ = rgb.shape
    flat = rgb.reshape(-1, 3).astype(np.int32)
    uniq, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(uniq) <= n:
        return rgb.copy()
    boxes = [np.arange(len(uniq))]  # index sets into uniq
    while len(boxes) < n:
        # split the box with the largest channel range (weighted splits
        # would need per-color counts; range-cut is the classic form)
        spans = [
            (uniq[b].max(axis=0) - uniq[b].min(axis=0)).max() if len(b) > 1 else -1
            for b in boxes
        ]
        i = int(np.argmax(spans))
        if spans[i] <= 0:
            break  # every box is a single color
        box = boxes[i]
        ch = int(np.argmax(uniq[box].max(axis=0) - uniq[box].min(axis=0)))
        order = box[np.argsort(uniq[box][:, ch], kind="stable")]
        mid = len(order) // 2
        boxes[i] = order[:mid]
        boxes.append(order[mid:])
    palette_of = np.zeros(len(uniq), dtype=np.int32)
    centers = np.zeros((len(boxes), 3), dtype=np.uint8)
    for k, b in enumerate(boxes):
        palette_of[b] = k
        centers[k] = np.round(uniq[b].mean(axis=0)).astype(np.uint8)
    return centers[palette_of[inverse]].reshape(h, w, 3)
