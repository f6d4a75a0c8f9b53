"""Custom stateful streaming operator: cross-batch exact dedup.

``applyInPandasWithState`` keyed by text hash — the state is simply
"has this hash been emitted before"; first occurrence passes through,
later occurrences are dropped, across micro-batches and restarts
(state lives in the checkpoint). This is the streaming face of
``operators.dedup.exact_dedup`` for a continuously-ingested corpus.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "doc_id long, text_hash string"
STATE_SCHEMA = "seen boolean"


def _dedup_fn(key, pdfs: Iterable, state: GroupState):
    import pandas as pd

    if state.exists:
        # hash already emitted in an earlier batch: drop everything
        for _ in pdfs:
            pass
        return iter(())
    best = None
    for pdf in pdfs:
        m = int(pdf["doc_id"].min())
        best = m if best is None else min(best, m)
    state.update((True,))
    if best is None:
        return iter(())
    return iter([pd.DataFrame({"doc_id": [best], "text_hash": [key[0]]})])


BAND_OUTPUT_SCHEMA = "doc_id long, keeper_doc_id long, band int"
BAND_STATE_SCHEMA = "keeper long"


def _lsh_fn(key, pdfs: Iterable, state: GroupState):
    import pandas as pd

    ids: set[int] = set()
    for pdf in pdfs:
        ids.update(int(x) for x in pdf["doc_id"])
    if not ids:
        return iter(())
    if state.exists:
        keeper = int(state.get[0])
    else:
        keeper = min(ids)
        state.update((keeper,))
    dups = sorted(ids - {keeper})
    if not dups:
        return iter(())
    return iter(
        [
            pd.DataFrame(
                {
                    "doc_id": dups,
                    "keeper_doc_id": [keeper] * len(dups),
                    "band": [int(key[0])] * len(dups),
                }
            )
        ]
    )


def streaming_lsh_near_dedup(
    docs_stream: DataFrame,
    n_bands: int = 4,
    rows_per_band: int = 3,
    shingle_k: int = 3,
) -> DataFrame:
    """Cross-batch NEAR-dup detection — the streaming face of
    ``operators.dedup.lsh_dup_buckets``.

    The MinHash band signature is computed as a PURE PROJECTION
    (higher-order functions over the per-row shingle array — identical
    md5 arithmetic to the batch ``minhash_sig_array``, min over the hex
    string), because a streaming query cannot shuffle-aggregate before
    its stateful operator. Each document then fans out to its
    ``n_bands`` (band, band_sig) keys; ``applyInPandasWithState`` keeps
    one keeper (first-seen min doc id) per bucket in the checkpoint and
    emits a (doc_id, keeper_doc_id, band) DUPLICATE EDGE for every
    later arrival that shares a bucket — across micro-batches and
    restarts.

    One stateful operator only: the per-doc "any band matched" verdict
    would be a second stateful aggregation in the same query (restricted
    in Structured Streaming); consumers take
    ``edges.select('doc_id').distinct()`` per sink batch, or feed the
    accumulated edges to ``dedup.connected_components`` for transitive
    clusters."""
    bands = minhash_band_projection(
        docs_stream, n_bands, rows_per_band, shingle_k
    )
    return bands.groupBy("band", "band_sig").applyInPandasWithState(
        _lsh_fn,
        outputStructType=BAND_OUTPUT_SCHEMA,
        stateStructType=BAND_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def minhash_band_projection(
    docs_stream: DataFrame,
    n_bands: int = 4,
    rows_per_band: int = 3,
    shingle_k: int = 3,
) -> DataFrame:
    """(doc_id, band, band_sig) as a PURE per-row projection — no
    shuffle, no aggregation — so it is legal upstream of a stateful
    streaming operator AND directly comparable (pytest-pinned) to the
    batch ``dedup.minhash_sig_array`` band signatures."""
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    w = F.split(norm, " ")
    shingles = F.array_distinct(
        F.when(F.size(w) < shingle_k, F.array(norm)).otherwise(
            F.transform(
                F.sequence(F.lit(0), F.size(w) - shingle_k),
                lambda i: F.concat_ws(" ", F.slice(w, i + 1, shingle_k)),
            )
        )
    )
    n_hashes = n_bands * rows_per_band

    from ..operators.dedup import MINHASH_P

    # ONE md5 per shingle (the base-value array), then each seed's
    # min is a linear permutation over that array — mirrors the batch
    # _minhash_base/_minhash_perm arithmetic exactly (pytest-pinned).
    # Closure via factory, NOT a lambda default arg: PySpark reads a
    # two-parameter lambda as an (element, index) higher-order function
    # and would bind the "seed" to the element index column (turning
    # every permutation into index arithmetic — all bands identical,
    # the batch-parity contract silently broken).
    bases = F.transform(
        shingles,
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
        % MINHASH_P,
    )

    def seed_perm(seed: int):
        return lambda v: (F.lit(2 * seed + 1) * v + F.lit(seed * seed + 7)) % MINHASH_P

    sig = docs_stream.select(
        "doc_id",
        *[
            F.array_min(F.transform(bases, seed_perm(seed)))
            .cast("string")
            .alias(f"_h{seed}")
            for seed in range(n_hashes)
        ],
    )
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "|",
                            *[
                                F.col(f"_h{b * rows_per_band + r}")
                                for r in range(rows_per_band)
                            ],
                        ).alias("band_sig"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("_b"),
    ).select("doc_id", F.col("_b.band").alias("band"), F.col("_b.band_sig").alias("band_sig"))
    return bands


def streaming_exact_dedup(docs_stream: DataFrame) -> DataFrame:
    """``docs_stream``: streaming DataFrame with (doc_id, text).
    Emits one (doc_id, text_hash) per never-seen-before normalized
    text — the kept document per duplicate group, first-batch-wins
    (min doc_id within the batch of first appearance)."""
    hashed = docs_stream.select(
        "doc_id",
        F.md5(F.lower(F.regexp_replace(F.trim("text"), r"\s+", " "))).alias(
            "text_hash"
        ),
    )
    return hashed.groupBy("text_hash").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SEG_OUTPUT_SCHEMA = "doc_id long, chunk_id int, chunk_text string, seg_hash string"
SEG_STATE_SCHEMA = "seen boolean"


def _segment_fn(key, pdfs: Iterable, state: GroupState):
    import pandas as pd

    if state.exists:
        for _ in pdfs:
            pass
        return iter(())
    best = None
    for pdf in pdfs:
        for doc_id, chunk_id, chunk_text in zip(
            pdf["doc_id"], pdf["chunk_id"], pdf["chunk_text"]
        ):
            cand = (int(doc_id), int(chunk_id), str(chunk_text))
            if best is None or cand[:2] < best[:2]:
                best = cand
    state.update((True,))
    if best is None:
        return iter(())
    return iter(
        [
            pd.DataFrame(
                {
                    "doc_id": [best[0]],
                    "chunk_id": [best[1]],
                    "chunk_text": [best[2]],
                    "seg_hash": [key[0]],
                }
            )
        ]
    )


def streaming_segment_dedup(
    docs_stream: DataFrame, seg_words: int = 20
) -> DataFrame:
    """Streaming face of :func:`~..operators.dedup.segment_dedup`:
    documents are segmented per row (pure projection — legal upstream
    of the stateful operator), and each distinct segment is emitted
    exactly ONCE across the whole stream, first-batch-wins with the
    batch kernel's (doc_id, chunk_id) tie-break inside a batch. Output
    is the kept (doc_id, chunk_id, chunk_text) rows in append mode —
    per-document reassembly is a batch concern downstream (a second
    stateful stage in the same query would hit Spark's multi-stateful
    restrictions).

    State per distinct segment hash is one boolean — the same
    keeper-state shape as :func:`streaming_exact_dedup`."""
    norm = F.lower(F.regexp_replace(F.trim("text"), r"\s+", " "))
    w = F.split(norm, " ")
    n = F.size(w)
    starts = F.sequence(
        F.lit(0),
        F.greatest(
            F.ceil((n - F.lit(seg_words)) / F.lit(seg_words)).cast("int"),
            F.lit(0),
        )
        * F.lit(seg_words),
        F.lit(seg_words),
    )
    segs = docs_stream.select(
        "doc_id", F.posexplode(starts).alias("chunk_id", "_start"), w.alias("_w")
    ).select(
        "doc_id",
        "chunk_id",
        F.concat_ws(
            " ", F.slice(F.col("_w"), F.col("_start") + 1, seg_words)
        ).alias("chunk_text"),
    )
    segs = segs.withColumn("seg_hash", F.md5("chunk_text"))
    return segs.groupBy("seg_hash").applyInPandasWithState(
        _segment_fn,
        outputStructType=SEG_OUTPUT_SCHEMA,
        stateStructType=SEG_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
