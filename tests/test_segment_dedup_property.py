"""Hypothesis property test: segment_dedup vs a sequential first-seen
reference over random small-vocabulary corpora (where word-window
collisions are common)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from process_alphafold3_outputs_spark.operators import dedup

VOCAB = ["a", "b", "c"]

corpora = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=12).map(" ".join),
    min_size=1,
    max_size=8,
)


def _segments(words: list[str], w: int) -> list[str]:
    """Mirror of chunk_documents with overlap=0: windows at 0, w, 2w, …
    (documents shorter than one window yield themselves)."""
    if len(words) <= w:
        return [" ".join(words)]
    return [" ".join(words[s : s + w]) for s in range(0, len(words), w)]


def _reference(texts: list[str], w: int):
    """Sequential first-seen scan in (doc_id, chunk_id) order."""
    seen: set[str] = set()
    out = {}
    for doc_id, text in enumerate(texts):
        segs = _segments(text.split(), w)
        kept = []
        for s in segs:
            if s not in seen:
                seen.add(s)
                kept.append(s)
        out[doc_id] = (len(segs), len(kept), " ".join(kept))
    return out


@pytest.fixture(scope="module")
def seg_runner(spark):
    def run(texts: list[str], w: int):
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        return {
            r["doc_id"]: (r["n_segments"], r["n_kept"], r["dedup_text"])
            for r in dedup.segment_dedup(df, seg_words=w).collect()
        }

    return run


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=corpora, w=st.integers(min_value=1, max_value=4))
def test_segment_dedup_matches_sequential_first_seen(seg_runner, texts, w):
    assert seg_runner(texts, w) == _reference(texts, w)
