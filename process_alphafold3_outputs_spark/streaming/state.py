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
