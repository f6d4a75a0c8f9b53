"""Multimodal columns: image/audio/video as opaque ``binary`` content +
typed metadata struct (the same pattern the engine already uses for
mmCIF structures — SURVEY §7.1 M7).

The Spark-side plumbing — schema, partitioning, Arrow batch shape,
UDF signatures — is real and tested. The codec step is REAL for every
common format, all pure-Python via the ``operators.codecs`` entry
points (no external libraries needed): uncompressed 24-bit BMP, binary
PPM (P6), 8-bit PNG (stdlib-zlib inflate + scanline unfiltering),
GIF87a/89a (palette + LZW, ``operators.gif``), baseline JPEG (T.81
sequential DCT, ``operators.jpeg``), PCM WAV audio, and MJPEG-in-AVI
video frame extraction (``operators.avi``). Only inter-frame video
codecs (H.264 etc.) genuinely require libraries absent from this
container; they stay behind ``NotImplementedError`` unless
``fake=True``, which substitutes a deterministic md5-derived
pseudo-decode (stable across runs/engines, so tests and oracles can
cover the full pipeline shape).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: canonical multimodal schema: one row per asset
MEDIA_SCHEMA = (
    "asset_id long, modality string, content binary, "
    "meta struct<width:int, height:int, duration_ms:int, codec:string>"
)

FEATURE_DIM = 8

_FEATURES_SCHEMA = (
    "asset_id long, modality string, n_bytes long, content_hash string, "
    f"features array<float>"
)


def from_documents(docs: DataFrame) -> DataFrame:
    """Demo adapter: treat each document's utf-8 bytes as an opaque
    asset (what a real corpus does with image/audio blobs)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("text/blob").alias("modality"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit("raw").alias("codec"),
        ).alias("meta"),
    )


def _fake_decode(content: bytes) -> list[float]:
    """Deterministic pseudo-decode: FEATURE_DIM floats in [0,1) derived
    from the md5 of the bytes — a stable stand-in for a real feature
    extractor with the same batch shape."""
    import hashlib

    h = hashlib.md5(content).hexdigest()
    return [int(h[i * 4 : i * 4 + 4], 16) / 65536.0 for i in range(FEATURE_DIM)]


def extract_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode + featurize each asset via ``mapInPandas`` (Arrow batches;
    one Python worker call per partition batch, never per row).

    ``fake=False`` REALLY decodes BMP/PPM/PNG/GIF/JPEG assets (pure-Python
    ``operators.codecs``) and computes pixel-derived features; any other
    format raises NotImplementedError at execution time — that is the
    honest codec boundary for libraries this container doesn't ship.
    ``fake=True`` substitutes the deterministic md5 pseudo-decode for
    every asset regardless of format.
    """

    def run(batches) -> Iterator:
        import hashlib

        import pandas as pd

        from . import codecs

        for pdf in batches:
            feats, hashes, sizes = [], [], []
            for content in pdf["content"]:
                b = bytes(content)
                sizes.append(len(b))
                hashes.append(hashlib.md5(b).hexdigest())
                if fake:
                    feats.append(_fake_decode(b))
                    continue
                fmt = codecs.sniff(b)
                if fmt != "wav" and fmt not in codecs.IMAGE_FORMATS:
                    raise NotImplementedError(
                        "only BMP/PPM/PNG/GIF/JPEG image and PCM WAV audio decode "
                        "ship "
                        "in this environment; pass fake=True for the "
                        "deterministic stub decode of other formats"
                    )
                if fmt == "wav":
                    rate, samples = codecs.decode_wav(b)
                    feats.append(
                        codecs.audio_features(rate, samples, FEATURE_DIM)
                    )
                else:
                    _, rgb = codecs.decode_image(b)
                    feats.append(codecs.image_features(rgb, FEATURE_DIM))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": sizes,
                    "content_hash": hashes,
                    "features": feats,
                }
            )

    return media.mapInPandas(run, _FEATURES_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int, fake: bool = False) -> DataFrame:
    """Resize every image asset via ``mapInPandas``. The Spark plumbing
    — Arrow batch shape, meta-struct update, content pass-through — is
    real and tested. ``fake=False`` REALLY resizes BMP/PPM/PNG/GIF/JPEG assets
    (nearest-neighbour, pure-Python ``operators.codecs``) and re-encodes
    in the same format; other formats raise NotImplementedError at
    execution (the codec boundary). ``fake=True`` substitutes a
    deterministic re-encode (md5(content ‖ w×h) bytes) with the correct
    meta."""

    def run(batches) -> Iterator:
        import hashlib

        import pandas as pd

        from . import codecs

        for pdf in batches:
            out_content, out_codec = [], []
            for c in pdf["content"]:
                b = bytes(c)
                if fake:
                    out_content.append(
                        hashlib.md5(b + f":{width}x{height}".encode()).digest()
                    )
                    out_codec.append("fake-resized")
                    continue
                if codecs.sniff(b) not in codecs.IMAGE_FORMATS:
                    raise NotImplementedError(
                        "only BMP/PPM/PNG/GIF/JPEG resize ships in this environment; "
                        "pass fake=True for the deterministic stub transform"
                    )
                fmt, rgb = codecs.decode_image(b)
                out_content.append(
                    codecs.encode_image(
                        fmt, codecs.resize_nearest(rgb, width, height)
                    )
                )
                out_codec.append(fmt)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "content": out_content,
                    "meta": [
                        {
                            "width": width,
                            "height": height,
                            "duration_ms": (m or {}).get("duration_ms"),
                            "codec": codec,
                        }
                        for m, codec in zip(pdf["meta"], out_codec)
                    ],
                }
            )

    return media.mapInPandas(run, MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int, fake: bool = False) -> DataFrame:
    """Video frame sampling: LATERAL-style fan-out — one output row per
    sampled frame (asset_id, frame_ms, content).

    ``fake=False`` REALLY extracts frames from MJPEG-AVI assets
    (pure-Python RIFF walk, ``operators.avi``; each emitted frame is
    standalone JPEG bytes that :func:`extract_features` or
    :func:`image_hashes` can decode downstream). Inter-frame codecs
    (H.264 etc.) raise NotImplementedError at execution — the codec
    boundary. ``fake=True`` derives frame count from
    ``meta.duration_ms`` and emits deterministic md5-derived frame
    bytes so the fan-out shape and partitioning stay testable for
    formats without a real path."""

    def run(batches) -> Iterator:
        import hashlib

        import pandas as pd

        from . import avi, codecs

        for pdf in batches:
            rows = []
            for asset_id, content, meta in zip(
                pdf["asset_id"], pdf["content"], pdf["meta"]
            ):
                b = bytes(content)
                if not fake:
                    if codecs.sniff(b) != "avi":
                        raise NotImplementedError(
                            "only MJPEG-AVI video decodes in this "
                            "environment; pass fake=True for the "
                            "deterministic stub frames"
                        )
                    for t, frame in avi.sample_avi_frames(b, every_ms):
                        rows.append(
                            {
                                "asset_id": asset_id,
                                "frame_ms": t,
                                "content": frame,
                            }
                        )
                    continue
                duration = (meta or {}).get("duration_ms") or 0
                for t in range(0, int(duration), int(every_ms)):
                    rows.append(
                        {
                            "asset_id": asset_id,
                            "frame_ms": t,
                            "content": hashlib.md5(
                                b + f"@{t}".encode()
                            ).digest(),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_ms", "content"]
            )

    return media.mapInPandas(run, "asset_id long, frame_ms int, content binary")


def media_summary(media: DataFrame) -> DataFrame:
    """Pure-relational metadata summary (no decode): per modality count,
    total bytes — the query that must NOT touch Python at any scale."""
    return media.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum(F.length("content")).alias("total_bytes"),
    )


_PHASH_SCHEMA = (
    "asset_id long, modality string, h_hi long, h_lo long"
)


def image_hashes(media: DataFrame, fake: bool = False) -> DataFrame:
    """(asset_id, modality, h_hi, h_lo) — 64-bit perceptual average
    hash per image asset (two 32-bit words; near-duplicate images land
    within small Hamming distance — join these through the simhash64
    band machinery for candidate pairs). ``fake=True`` hashes the md5
    pseudo-decode instead (plumbing-only path for formats without a
    real codec here)."""

    def run(batches) -> Iterator:
        import hashlib

        import numpy as np
        import pandas as pd

        from . import codecs

        for pdf in batches:
            his, los = [], []
            for content in pdf["content"]:
                b = bytes(content)
                if fake:
                    h = hashlib.md5(b).digest()
                    his.append(int.from_bytes(h[:4], "little"))
                    los.append(int.from_bytes(h[4:8], "little"))
                    continue
                fmt = codecs.sniff(b)
                if fmt not in codecs.IMAGE_FORMATS:
                    raise NotImplementedError(
                        "image_hashes needs a decodable image "
                        "(BMP/PPM/PNG/GIF/JPEG); "
                        "pass fake=True for the stub path"
                    )
                _, rgb = codecs.decode_image(b)
                hi, lo = codecs.average_hash(rgb)
                his.append(hi)
                los.append(lo)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "h_hi": his,
                    "h_lo": los,
                }
            )

    return media.mapInPandas(run, _PHASH_SCHEMA)


def image_near_dup_pairs(
    media: DataFrame, max_hamming: int = 3, fake: bool = False
) -> DataFrame:
    """(id_a, id_b, hamming) — near-duplicate image candidate pairs by
    perceptual hash: each asset's 64-bit aHash splits into four 16-bit
    bands; assets sharing ANY band become candidates (pigeonhole: two
    hashes within Hamming distance 3 of each other share at least one
    band — same guarantee as the simhash64 banding), then the exact
    Hamming distance filters to ``max_hamming``.

    RECALL BOUND: candidate generation is complete only for pairs
    within Hamming distance 3 (4 bands ⇒ a distance-4+ pair can differ
    in every band and never meet). The default threshold matches that
    guarantee; passing ``max_hamming`` > 3 widens the FILTER but pairs
    beyond distance 3 surface only when they happen to share a band —
    output is then "banded candidates within threshold", not all pairs
    within threshold.

    Scale shape: the self-join keys on (band index, band value) — an
    inverted-index join, never an all-pairs cross; Hamming is JVM-side
    ``bit_count`` over the xor of the two words."""
    return _banded_hamming_pairs(image_hashes(media, fake=fake), max_hamming)


def _banded_hamming_pairs(h: DataFrame, max_hamming: int) -> DataFrame:
    """(id_a, id_b, hamming) candidate pairs over any (asset_id, h_hi,
    h_lo) 64-bit hash table: four 16-bit bands, inverted-index
    self-join, exact JVM-side bit_count filter — shared by the image
    aHash and audio fingerprint families."""
    bands = h.select(
        "asset_id",
        "h_hi",
        "h_lo",
        F.posexplode(
            F.array(
                F.col("h_hi") % 65536,
                (F.col("h_hi") / 65536).cast("long"),
                F.col("h_lo") % 65536,
                (F.col("h_lo") / 65536).cast("long"),
            )
        ).alias("band", "bval"),
    )
    a = bands.select(
        F.col("asset_id").alias("id_a"),
        F.col("h_hi").alias("a_hi"),
        F.col("h_lo").alias("a_lo"),
        "band",
        "bval",
    )
    b = bands.select(
        F.col("asset_id").alias("id_b"),
        F.col("h_hi").alias("b_hi"),
        F.col("h_lo").alias("b_lo"),
        "band",
        "bval",
    )
    return (
        a.join(b, ["band", "bval"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (
                F.bit_count(F.col("a_hi").bitwiseXOR(F.col("b_hi")))
                + F.bit_count(F.col("a_lo").bitwiseXOR(F.col("b_lo")))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def audio_hashes(media: DataFrame, fake: bool = False) -> DataFrame:
    """(asset_id, modality, h_hi, h_lo) — 64-bit spectral fingerprint
    per PCM WAV asset (``codecs.audio_fingerprint``: sign of log-band
    energy deltas over 9 analysis frames — level-invariant and robust
    to small noise, the Haitsma-Kalker family). Same two-word packing
    as the image aHash so the banded Hamming machinery is shared.
    ``fake=True`` hashes the md5 pseudo-decode (plumbing path for
    formats without a real audio codec here)."""

    def run(batches) -> Iterator:
        import hashlib

        import pandas as pd

        from . import codecs

        for pdf in batches:
            his, los = [], []
            for content in pdf["content"]:
                b = bytes(content)
                if fake:
                    h = hashlib.md5(b).digest()
                    his.append(int.from_bytes(h[:4], "little"))
                    los.append(int.from_bytes(h[4:8], "little"))
                    continue
                if codecs.sniff(b) != "wav":
                    raise NotImplementedError(
                        "audio_hashes needs PCM WAV; pass fake=True for "
                        "the stub path"
                    )
                rate, samples = codecs.decode_wav(b)
                hi, lo = codecs.audio_fingerprint(rate, samples)
                his.append(hi)
                los.append(lo)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "h_hi": his,
                    "h_lo": los,
                }
            )

    return media.mapInPandas(run, _PHASH_SCHEMA)


def audio_near_dup_pairs(
    media: DataFrame, max_hamming: int = 3, fake: bool = False
) -> DataFrame:
    """(id_a, id_b, hamming) — near-duplicate audio candidate pairs by
    spectral fingerprint: the audio twin of
    :func:`image_near_dup_pairs`, sharing its banded inverted-index
    join, pigeonhole guarantee, and the >3 recall bound."""
    return _banded_hamming_pairs(audio_hashes(media, fake=fake), max_hamming)


def incremental_image_near_dup(
    new_media: DataFrame,
    seen_hashes: DataFrame,
    max_hamming: int = 3,
    fake: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """(kept_media, updated_hashes) — a NEW shipment of image assets
    deduped against the perceptual-hash HISTORY: an asset whose aHash
    sits within ``max_hamming`` of any historical hash (banded
    candidate join — same pigeonhole guarantee AND the same >3 recall
    bound as :func:`image_near_dup_pairs`) or of an earlier asset in
    the same shipment is dropped; survivors append their hashes to the
    rolling (asset_id, h_hi, h_lo) table.

    History participates ONLY as its hash table (3 longs per asset —
    the compressed-representation policy of incremental_exact_dedup);
    historical pixels are never re-decoded."""
    return _incremental_hash_near_dup(
        image_hashes(new_media, fake=fake), new_media, seen_hashes, max_hamming
    )


def incremental_audio_near_dup(
    new_media: DataFrame,
    seen_hashes: DataFrame,
    max_hamming: int = 3,
    fake: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """(kept_media, updated_hashes) — the audio twin of
    :func:`incremental_image_near_dup`: a NEW shipment of WAV assets
    deduped against the rolling spectral-fingerprint history (same
    banded join, same >3 recall bound, historical samples never
    re-decoded)."""
    return _incremental_hash_near_dup(
        audio_hashes(new_media, fake=fake), new_media, seen_hashes, max_hamming
    )


def _incremental_hash_near_dup(
    h: DataFrame,
    new_media: DataFrame,
    seen_hashes: DataFrame,
    max_hamming: int,
) -> tuple[DataFrame, DataFrame]:
    hist = seen_hashes.select(
        F.col("asset_id").alias("_hid"),
        F.col("h_hi").alias("_hhi"),
        F.col("h_lo").alias("_hlo"),
    )

    def bands(df, idc, hic, loc):
        return df.select(
            F.col(idc).alias("_id"),
            F.col(hic).alias("_hi"),
            F.col(loc).alias("_lo"),
            F.posexplode(
                F.array(
                    F.col(hic) % 65536,
                    (F.col(hic) / 65536).cast("long"),
                    F.col(loc) % 65536,
                    (F.col(loc) / 65536).cast("long"),
                )
            ).alias("band", "bval"),
        )

    nb = bands(h, "asset_id", "h_hi", "h_lo")
    hb = bands(hist, "_hid", "_hhi", "_hlo")
    ham = F.bit_count(F.col("a._hi").bitwiseXOR(F.col("b._hi"))) + F.bit_count(
        F.col("a._lo").bitwiseXOR(F.col("b._lo"))
    )
    dup_vs_hist = (
        nb.alias("a")
        .join(hb.alias("b"), ["band", "bval"])
        .filter(ham <= max_hamming)
        .select(F.col("a._id").alias("asset_id"))
        .distinct()
    )
    # intra-shipment: keep the lowest id of each near-dup pair
    dup_within = (
        nb.alias("a")
        .join(nb.alias("b"), ["band", "bval"])
        .filter(F.col("a._id") > F.col("b._id"))
        .filter(ham <= max_hamming)
        .select(F.col("a._id").alias("asset_id"))
        .distinct()
    )
    drops = dup_vs_hist.union(dup_within).distinct()
    kept = new_media.join(drops, "asset_id", "left_anti")
    kept_hashes = h.join(drops, "asset_id", "left_anti").select(
        "asset_id", "h_hi", "h_lo"
    )
    updated = seen_hashes.select("asset_id", "h_hi", "h_lo").unionByName(
        kept_hashes
    )
    return kept, updated


def resample_audio(
    media: DataFrame, target_rate: int, fake: bool = False
) -> DataFrame:
    """Resample every WAV asset to ``target_rate`` via ``mapInPandas``
    — the audio twin of :func:`resize_images`. ``fake=False`` REALLY
    resamples PCM WAV (windowed-sinc anti-alias + linear interpolation,
    pure-numpy ``codecs.resample_audio``) and re-encodes 16-bit PCM;
    non-WAV assets hit the NotImplementedError codec boundary.
    ``fake=True`` substitutes a deterministic md5 stub (plumbing
    testable without the codec)."""

    def run(batches):
        import hashlib

        import pandas as pd

        from . import codecs

        for pdf in batches:
            out_content, out_rate = [], []
            for content in pdf["content"]:
                b = bytes(content)
                if fake:
                    out_content.append(
                        hashlib.md5(b + f":{target_rate}".encode()).digest()
                    )
                    out_rate.append(target_rate)
                    continue
                if codecs.sniff(b) != "wav":
                    raise NotImplementedError(
                        "resample_audio needs PCM WAV; pass fake=True for "
                        "the deterministic stub transform"
                    )
                rate, samples = codecs.decode_wav(b)
                out_content.append(
                    codecs.encode_wav(
                        target_rate,
                        codecs.resample_audio(rate, samples, target_rate),
                    )
                )
                out_rate.append(target_rate)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "content": out_content,
                    "sample_rate": out_rate,
                }
            )

    return media.mapInPandas(
        run,
        "asset_id long, modality string, content binary, sample_rate int",
    )
