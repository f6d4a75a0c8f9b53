"""Distributed BPE trainer vs a pure-Python reference implementation
on the same corpus (differential pin: merge table and segmentation
must match exactly — same tie-break, same left-to-right apply)."""

from __future__ import annotations

from collections import Counter

import pytest

from process_alphafold3_outputs_spark.operators import bpe


# -- pure-Python reference trainer (textbook dict-loop BPE) ----------------

def _ref_word_counts(texts):
    wc = Counter()
    for t in texts:
        for w in " ".join((t or "").lower().split()).split(" "):
            if w:
                wc[w] += 1
    return wc


def _ref_apply(syms, left, right):
    out = []
    for s in syms:
        if out and out[-1] == left and s == right:
            out[-1] = left + right
        else:
            out.append(s)
    return out


def _ref_train(texts, n_merges, min_pair_count=2):
    wc = _ref_word_counts(texts)
    vocab = {w: list(w) for w in wc}
    merges = []
    for rank in range(n_merges):
        pc = Counter()
        for w, syms in vocab.items():
            n = wc[w]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += n
        if not pc:
            break
        # count DESC then lexicographic pair — the trainer's tie-break
        (left, right), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_pair_count:
            break
        merges.append((rank, left, right, left + right, cnt))
        vocab = {w: _ref_apply(s, left, right) for w, s in vocab.items()}
    return merges, vocab, wc


TEXTS = [
    "low lower lowest low low",
    "new newer newest new news",
    "widest wide wider wide",
    "low new wide lowest",
    "the the the them theme",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_merge_table_matches_reference(spark, docs):
    got = [
        (r.rank, r.left, r.right, r.merged, r.n_occurrences)
        for r in bpe.train_bpe(docs, n_merges=12).orderBy("rank").collect()
    ]
    want, _, _ = _ref_train(TEXTS, 12)
    assert got == want
    assert len(got) > 3  # the corpus genuinely trains several merges


def test_segmentation_matches_reference(spark, docs):
    merges = bpe.train_bpe(docs, n_merges=8)
    got = {
        r.w: (r.n, list(r.pieces))
        for r in bpe.segment_words(docs, merges).collect()
    }
    _, ref_vocab, ref_wc = _ref_train(TEXTS, 8)
    assert got == {w: (ref_wc[w], s) for w, s in ref_vocab.items()}
    # every word reassembles exactly from its pieces
    for w, (_, pieces) in got.items():
        assert "".join(pieces) == w


def test_min_pair_count_stops_training(spark):
    docs = spark.createDataFrame(
        [(0, "ab ab"), (1, "cd")], "doc_id long, text string"
    )
    m = bpe.train_bpe(docs, n_merges=10, min_pair_count=2).collect()
    # only (a,b) reaches count 2; (c,d) is a hapax pair
    assert [(r.left, r.right, r.n_occurrences) for r in m] == [("a", "b", 2)]


def test_deterministic_across_runs(spark, docs):
    a = bpe.train_bpe(docs, n_merges=6).collect()
    b = bpe.train_bpe(docs, n_merges=6).collect()
    assert a == b
