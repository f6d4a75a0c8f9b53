"""Media-corpus curation: the multimodal twin of ``plans.corpus`` —
format census, per-modality near-dedup, and a composed curation
pipeline over the canonical (asset_id, modality, content, meta) frame.

Scale shape notes (the point of the module):
- Format classification is PURE JVM — binary-prefix CASE expressions
  inside whole-stage codegen (``format_col``). A 100 TB census never
  touches Python: magic-byte matching is a projection, not a decode.
- Decodes happen only inside the near-dup hash kernels (Arrow-batched,
  once per asset), and only for the formats that need them; dedup
  joins are the shared banded inverted-index machinery.
- Exact fallback for undecodable formats is JVM ``md5`` over the raw
  bytes — content-hash dedup without a byte of Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.multimodal import audio_hashes, image_hashes

#: sniffable format -> (offset-1-based, hex prefix) conjunctions,
#: mirroring operators.codecs.sniff byte-for-byte (pinned by pytest)
_MAGIC = {
    "bmp": [(1, "424D")],
    "ppm": [(1, "5036")],
    "png": [(1, "89504E470D0A1A0A")],
    "jpeg": [(1, "FFD8FF")],
    "gif87": [(1, "474946383761")],
    "gif89": [(1, "474946383961")],
    "wav": [(1, "52494646"), (9, "57415645")],
    "avi": [(1, "52494646"), (9, "41564920")],
}

IMAGE_FORMATS = ("bmp", "ppm", "png", "jpeg", "gif")


def format_col(content: Column | str = "content") -> Column:
    """Format label from magic bytes — a JVM CASE over binary
    substrings (whole-stage codegen; no Python, no decode). Emits
    'bmp'|'ppm'|'png'|'jpeg'|'gif'|'wav'|'avi'|'other'."""
    c = F.col(content) if isinstance(content, str) else content

    def match(spec: list[tuple[int, str]]) -> Column:
        cond = None
        for off, hexpat in spec:
            n = len(hexpat) // 2
            piece = F.substring(c, off, n) == F.lit(bytes.fromhex(hexpat))
            cond = piece if cond is None else (cond & piece)
        return cond

    out = F.when(match(_MAGIC["bmp"]), "bmp")
    for name in ("ppm", "png", "jpeg"):
        out = out.when(match(_MAGIC[name]), name)
    out = out.when(match(_MAGIC["gif87"]) | match(_MAGIC["gif89"]), "gif")
    out = out.when(match(_MAGIC["wav"]), "wav")
    out = out.when(match(_MAGIC["avi"]), "avi")
    return out.otherwise("other")


def media_format_summary(media: DataFrame) -> DataFrame:
    """(fmt, n_assets, total_bytes, max_bytes) — the format census a
    multimodal intake runs FIRST, entirely JVM-side (magic-byte CASE +
    hash aggregate; at 100 TB this is a single scan with map-side
    combine and zero Python workers)."""
    return (
        media.select(
            format_col("content").alias("fmt"),
            F.length("content").alias("_n"),
        )
        .groupBy("fmt")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum("_n").alias("total_bytes"),
            F.max("_n").alias("max_bytes"),
        )
    )


def curate_media(
    media: DataFrame, max_hamming: int = 3, fake: bool = False
) -> DataFrame:
    """Surviving assets after per-modality near-dedup — the composed
    media-intake pipeline:

    1. format census routes each asset JVM-side (``format_col``);
    2. decodable IMAGES dedup by perceptual aHash (banded Hamming
       join, drop the higher id of each pair within ``max_hamming``);
    3. WAV audio dedups by spectral fingerprint (same machinery);
    4. everything else (video containers, unknown blobs) dedups
       EXACTLY by JVM ``md5(content)`` — no decode, no Python.

    Output: the input rows minus dropped duplicates, plus the ``fmt``
    column. Decodes run once per asset inside the hash kernels; every
    join is hash- or band-keyed — no all-pairs stage anywhere.
    """
    tagged = media.withColumn("fmt", format_col("content"))
    images = tagged.filter(F.col("fmt").isin(*IMAGE_FORMATS))
    audio = tagged.filter(F.col("fmt") == "wav")
    rest = tagged.filter(
        ~F.col("fmt").isin(*IMAGE_FORMATS) & (F.col("fmt") != "wav")
    )

    def pair_drops(h: DataFrame) -> DataFrame:
        from ..operators.multimodal import _banded_hamming_pairs

        return (
            _banded_hamming_pairs(h, max_hamming)
            .select(F.col("id_b").alias("asset_id"))
            .distinct()
        )

    img_drops = pair_drops(image_hashes(images, fake=fake))
    aud_drops = pair_drops(audio_hashes(audio, fake=fake))
    # exact duplicates among the undecodable rest: keep min asset_id
    # per content hash (JVM md5 over binary; hash-agg, no window)
    rest_keep = (
        rest.groupBy(F.md5("content").alias("_h"))
        .agg(F.min("asset_id").alias("asset_id"))
        .select("asset_id")
    )
    rest_kept = rest.join(rest_keep, "asset_id", "left_semi")
    img_kept = images.join(img_drops, "asset_id", "left_anti")
    aud_kept = audio.join(aud_drops, "asset_id", "left_anti")
    return img_kept.unionByName(aud_kept).unionByName(rest_kept)
