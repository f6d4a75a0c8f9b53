"""Pure-Python baseline JPEG codec (ITU-T T.81 / ISO 10918-1 — public
spec): sequential DCT, 8-bit, Huffman-coded. No external libraries —
numpy for the 8x8 DCT only.

Decoder: SOI/APPn/COM/DQT/DHT/DRI/SOF0/SOF1/SOS parsing, canonical
Huffman tables built FROM THE STREAM's DHT segments (files are
self-describing), restart markers, chroma subsampling (4:4:4 / 4:2:2 /
4:2:0 via per-component sampling factors), byte-unstuffing, dequant +
de-zigzag + orthonormal IDCT, full-range YCbCr→RGB (BT.601).
Progressive (SOF2) and arithmetic-coded variants raise ValueError —
the honest boundary.

Encoder: baseline 4:4:4, quality-scaled Annex-K quantization tables,
standard Huffman tables (emitted in DHT, so any spec-conforming
decoder — including this module's — reads them back), DC prediction,
zigzag + run-length AC coding, 0xFF byte stuffing.

JPEG is lossy: round-trip equality is PSNR-bounded, not exact — the
pytest differential checks reconstruction error against the
quantization step size, plus a known-block IDCT differential vs a
direct numpy DCT-matrix reference.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# shared math
# --------------------------------------------------------------------------


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix C: forward = C @ X @ C.T."""
    n = np.arange(8)
    c = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16)
    c[0, :] = 1.0
    scale = np.full(8, np.sqrt(2.0 / 8.0))
    scale[0] = np.sqrt(1.0 / 8.0)
    return c * scale[:, None]


_C = _dct_matrix()


def _zigzag() -> list[tuple[int, int]]:
    """The 64 (row, col) pairs in JPEG zigzag scan order (generated,
    not memorized: diagonal s walks bottom-up when s is even)."""
    order = []
    for s in range(15):
        cells = [(r, s - r) for r in range(8) if 0 <= s - r < 8]
        order.extend(reversed(cells) if s % 2 == 0 else cells)
    return order


_ZZ = _zigzag()
_ZZ_ROWS = np.array([r for r, _ in _ZZ])
_ZZ_COLS = np.array([c for _, c in _ZZ])

# Annex-K base quantization tables (public spec, Tables K.1/K.2)
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# Standard Huffman table specs (Annex K): (bits[1..16], values). The
# encoder writes these into DHT; the decoder ALWAYS reads tables from
# the stream, so interop holds for any canonical tables.
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) via the canonical construction of
    T.81 Annex C (codes assigned in value order, incrementing within a
    length, doubling at each length step)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol — the decoder-side view."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, vals).items()
    }


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    unstuffing; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(self.data):
                self.bitbuf = (self.bitbuf << 8) | 0
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart markers are consumed by the MCU loop, not here
                    self.marker = nxt
                    continue
                else:
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8

    def get(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        v = (self.bitbuf >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.bitbuf &= (1 << self.nbits) - 1
        return v

    def align_and_skip_rst(self) -> None:
        """Byte-align and consume one RSTn marker (restart interval)."""
        self.bitbuf = 0
        self.nbits = 0
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2  # past FF Dn
            self.marker = None

    def decode_huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.get(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("corrupt JPEG: no Huffman code matched in 16 bits")

    def receive_extend(self, s: int) -> int:
        if s == 0:
            return 0
        v = self.get(s)
        if v < (1 << (s - 1)):
            v -= (1 << s) - 1
        return v


def decode_jpeg(data: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB from a baseline sequential JPEG stream."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                tbl = np.zeros((8, 8), dtype=np.int32)
                tbl[_ZZ_ROWS, _ZZ_COLS] = np.frombuffer(
                    seg[i : i + 64], dtype=np.uint8
                ).astype(np.int32)
                qt[tq] = tbl
                i += 64
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _decode_table(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            precision = seg[0]
            if precision != 8:
                raise ValueError(f"{precision}-bit JPEG not supported")
            h, w = struct.unpack_from(">HH", seg, 1)
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + c * 3 : 9 + c * 3]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker == 0xC2:
            raise ValueError("progressive JPEG not supported (baseline only)")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                        0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG frame type SOF{marker - 0xC0}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            sel = {}
            for c in range(ns):
                cs, tt = seg[1 + c * 2 : 3 + c * 2]
                sel[cs] = (tt >> 4, tt & 15)
            return _decode_scan(
                data, pos + seglen, frame, sel, qt, huff_dc, huff_ac,
                restart_interval,
            )
        pos += seglen
    raise ValueError("no SOS segment found")


def _decode_scan(data, pos, frame, sel, qt, huff_dc, huff_ac, restart_interval):
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        for c in comps
    }
    pred = {c["id"]: 0 for c in comps}
    rd = _BitReader(data, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                rd.align_and_skip_rst()
                pred = {c["id"]: 0 for c in comps}
            for c in comps:
                td, ta = sel[c["id"]]
                dct_tbl, act_tbl = huff_dc[td], huff_ac[ta]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        s = rd.decode_huff(dct_tbl)
                        pred[c["id"]] += rd.receive_extend(s)
                        zz[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = rd.decode_huff(act_tbl)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break
                            k += r
                            if k > 63:
                                raise ValueError("corrupt JPEG: AC index > 63")
                            zz[k] = rd.receive_extend(s)
                            k += 1
                        coef = np.zeros((8, 8), dtype=np.float64)
                        coef[_ZZ_ROWS, _ZZ_COLS] = zz
                        coef *= q
                        block = _C.T @ coef @ _C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1
    # upsample each component to full resolution, crop, color-convert
    full = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        # round like the 3-component path (truncation gave a half-LSB
        # downward bias and an inconsistency between the decode paths)
        y = np.clip(full[0], 0, 255).round()
        return np.repeat(y[:, :, None], 3, axis=2).astype(np.uint8)
    if len(full) != 3:
        raise ValueError(f"unsupported component count {len(full)}")
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.dstack([r, g, b]), 0, 255).round().astype(np.uint8)


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-fill per spec


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_Q_LUMA, _Q_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int32))
    return out[0], out[1]


def _magnitude(v: int) -> tuple[int, int]:
    """(category s, s-bit value code) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    code = v if v > 0 else v + (1 << s) - 1
    return s, code


def _encode_block(wr, pred, block, q, dc, ac):
    """Forward DCT + quantize + Huffman-code one 8x8 block; returns the
    new DC predictor."""
    coef = _C @ block @ _C.T
    zz = np.round(coef / q)[_ZZ_ROWS, _ZZ_COLS].astype(np.int64)
    diff = int(zz[0]) - pred
    s, code = _magnitude(diff)
    hc, hl = dc[s]
    wr.put(hc, hl)
    if s:
        wr.put(code, s)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = (nz[-1] + 1) if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            hc, hl = ac[0xF0]  # ZRL
            wr.put(hc, hl)
            run -= 16
        s, code = _magnitude(v)
        hc, hl = ac[(run << 4) | s]
        wr.put(hc, hl)
        wr.put(code, s)
        run = 0
    if last < 63:
        hc, hl = ac[0x00]  # EOB
        wr.put(hc, hl)
    return int(zz[0])


def encode_jpeg(
    rgb: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JPEG bytes for an (h, w, 3) uint8 RGB array.

    ``subsampling``: '444' (one 8x8 per component per MCU) or '420'
    (16x16 MCU: four Y blocks + one 2x2-mean-downsampled block each of
    Cb/Cr — the layout real-world JPEGs overwhelmingly use).
    ``restart_interval`` > 0 emits DRI + an RSTn marker every N MCUs
    (DC predictors reset) — exercised by the decoder's restart path.
    """
    h, w, c = rgb.shape
    if c != 3:
        raise ValueError("expected (h, w, 3) RGB array")
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    qy, qc = _quality_tables(quality)
    f = rgb.astype(np.float64)
    r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
    planes = [
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
    ]
    # sampling factors per component (Y, Cb, Cr)
    sf = [(1, 1)] * 3 if subsampling == "444" else [(2, 2), (1, 1), (1, 1)]
    hmax = max(x for x, _ in sf)
    vmax = max(y for _, y in sf)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    def pad_to(p: np.ndarray, th: int, tw: int) -> np.ndarray:
        ph0, pw0 = p.shape
        pp = np.empty((th, tw), dtype=np.float64)
        pp[:ph0, :pw0] = p
        pp[ph0:, :pw0] = p[-1:, :]        # edge-replicate pad
        pp[:, pw0:] = pp[:, pw0 - 1 : pw0]
        return pp

    comps = []
    for ci, ((ch, cv), p) in enumerate(zip(sf, planes)):
        if (hmax // ch, vmax // cv) != (1, 1):
            ry, rx = vmax // cv, hmax // ch
            th, tw = -(-p.shape[0] // ry) * ry, -(-p.shape[1] // rx) * rx
            p = pad_to(p, th, tw)
            # box-mean downsample (the conventional chroma filter)
            p = p.reshape(th // ry, ry, tw // rx, rx).mean(axis=(1, 3))
        comps.append(pad_to(p, mcuy * cv * 8, mcux * ch * 8) - 128.0)

    dc_tabs = [
        _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS),
        _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS),
    ]
    ac_tabs = [
        _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS),
        _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ]
    wr = _BitWriter()
    pred = [0, 0, 0]
    body = bytearray()
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                wr.flush()
                body += bytes(wr.out)
                wr = _BitWriter()
                body += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                pred = [0, 0, 0]
            for ci, (ch, cv) in enumerate(sf):
                tsel = 0 if ci == 0 else 1
                q = qy if ci == 0 else qc
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        pred[ci] = _encode_block(
                            wr,
                            pred[ci],
                            comps[ci][y0 : y0 + 8, x0 : x0 + 8],
                            q,
                            dc_tabs[tsel],
                            ac_tabs[tsel],
                        )
            mcu_count += 1
    wr.flush()
    body += bytes(wr.out)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    def dqt(tq: int, tbl: np.ndarray) -> bytes:
        return bytes([tq]) + bytes(int(x) for x in tbl[_ZZ_ROWS, _ZZ_COLS])

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)

    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, (ch, cv), tq in ((1, sf[0], 0), (2, sf[1], 1), (3, sf[2], 1)):
        sof += bytes([cid, (ch << 4) | cv, tq])
    sos = bytes([3])
    for cid, tt in ((1, 0x00), (2, 0x11), (3, 0x11)):
        sos += bytes([cid, tt])
    sos += bytes([0, 63, 0])  # Ss, Se, Ah/Al — baseline fixed
    head = (
        b"\xff\xd8"
        + seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + seg(0xDB, dqt(0, qy))
        + seg(0xDB, dqt(1, qc))
        + seg(0xC0, sof)
        + seg(0xC4, dht(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS))
        + seg(0xC4, dht(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS))
        + seg(0xC4, dht(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS))
        + seg(0xC4, dht(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS))
    )
    if restart_interval:
        head += seg(0xDD, struct.pack(">H", restart_interval))
    return head + seg(0xDA, sos) + bytes(body) + b"\xff\xd9"
