"""Pure-Python MJPEG-in-AVI video container (RIFF 'AVI ' — the public
Microsoft/OpenDML layout): enough of the container to make video frame
sampling a REAL decode path in this environment.

Motion-JPEG stores each video frame as an independent baseline-JPEG
image inside ``00dc`` chunks of the ``movi`` list, so with
``operators.jpeg`` in hand the whole pipeline — container parse, frame
extraction at a sampling cadence, per-frame pixel decode — runs without
external codec libraries. Inter-frame codecs (H.264 etc.) remain the
honest ``NotImplementedError`` boundary.

Writer: minimal single-stream MJPG AVI (avih + strl/strh/strf headers,
word-aligned ``00dc`` chunks). Reader: walks RIFF chunks, takes fps
from ``avih.dwMicroSecPerFrame`` and frames from the ``movi`` list —
self-describing, so reader/writer cannot drift.
"""

from __future__ import annotations

import struct

import numpy as np

AVI_MAGIC_PREFIX = b"RIFF"


def is_avi(content: bytes) -> bool:
    return content[:4] == b"RIFF" and content[8:12] == b"AVI "


# --------------------------------------------------------------------------
# writer
# --------------------------------------------------------------------------


def encode_mjpeg_avi(
    frames: list[np.ndarray] | list[bytes],
    fps: float = 10.0,
    quality: int = 85,
) -> bytes:
    """MJPG AVI bytes from RGB frames (arrays are JPEG-encoded here;
    pre-encoded JPEG bytes pass through untouched)."""
    from . import jpeg

    if not frames:
        raise ValueError("no frames")
    encoded: list[bytes] = []
    w = h = None
    for f in frames:
        if isinstance(f, np.ndarray):
            if w is None:
                h, w = f.shape[:2]
            elif f.shape[:2] != (h, w):
                raise ValueError("all frames must share dimensions")
            encoded.append(jpeg.encode_jpeg(f, quality=quality))
        else:
            data = bytes(f)
            if data[:3] != b"\xff\xd8\xff":
                raise ValueError("pre-encoded frames must be JPEG")
            encoded.append(data)
    if w is None:  # all pre-encoded: read dims from the first SOF0
        first = encoded[0]
        sof = first.find(b"\xff\xc0")
        if sof < 0:
            raise ValueError("cannot find SOF0 in pre-encoded frame")
        h, w = struct.unpack_from(">HH", first, sof + 5)

    def chunk(cid: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return cid + struct.pack("<I", len(payload)) + payload + pad

    def lst(four: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", four + payload)

    n = len(encoded)
    usec = int(round(1_000_000 / fps))
    maxb = max(len(e) for e in encoded)
    avih = struct.pack(
        "<14I", usec, maxb * int(fps + 1), 0, 0, n, 0, 1, maxb, w, h,
        0, 0, 0, 0,
    )
    # strh after the two FOURCCs: flags, priority, language,
    # initial_frames, scale, rate (rate/scale = fps), start, length,
    # buffer size, quality, sample_size, then rcFrame
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, int(round(fps)), 0,
                      n, maxb, 0xFFFFFFFF, 0)
        + struct.pack("<4h", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", e) for e in encoded))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


# --------------------------------------------------------------------------
# reader
# --------------------------------------------------------------------------


def _walk_chunks(data: bytes, pos: int, end: int):
    """Yield (chunk_id, payload_start, payload_len) within [pos, end)."""
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        yield cid, pos + 8, length
        pos += 8 + length + (length % 2)  # word alignment


def read_mjpeg_avi(content: bytes) -> tuple[float, list[bytes]]:
    """(fps, [jpeg frame bytes]) from an MJPG AVI stream."""
    if not is_avi(content):
        raise ValueError("not an AVI stream")
    fps = 0.0
    frames: list[bytes] = []

    def walk_list(pos: int, end: int) -> None:
        nonlocal fps
        for cid, p, ln in _walk_chunks(content, pos, end):
            if cid == b"LIST":
                four = content[p : p + 4]
                if four in (b"hdrl", b"movi", b"strl", b"rec "):
                    walk_list(p + 4, p + ln)
            elif cid == b"avih" and ln >= 4:
                (usec,) = struct.unpack_from("<I", content, p)
                if usec:
                    fps = 1_000_000 / usec
            elif cid[2:4] == b"dc":  # compressed video frame
                frame = content[p : p + ln]
                if frame[:3] != b"\xff\xd8\xff":
                    raise NotImplementedError(
                        "only MJPEG video decodes in this environment "
                        "(inter-frame codecs need libraries not present)"
                    )
                frames.append(frame)

    walk_list(12, len(content))
    if not frames:
        raise ValueError("AVI contains no video frames")
    return (fps or 10.0), frames


def sample_avi_frames(
    content: bytes, every_ms: int
) -> list[tuple[int, bytes]]:
    """[(frame_ms, jpeg bytes)] — the frame whose timestamp is nearest
    at-or-before each ``every_ms`` tick, up to the clip duration."""
    fps, frames = read_mjpeg_avi(content)
    duration_ms = int(len(frames) * 1000 / fps)
    out = []
    for t in range(0, duration_ms, int(every_ms)):
        idx = min(int(t * fps / 1000), len(frames) - 1)
        out.append((t, frames[idx]))
    return out
