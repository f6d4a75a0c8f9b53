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


# -- batched merge selection (r7) ------------------------------------------

NON_INTERACTING_TEXTS = [
    # four disjoint-symbol bigram families with clearly separated
    # counts; no merge's output ever forms a pair that outranks the
    # remaining candidates, so a batched schedule must equal the
    # sequential one exactly
    "ab ab ab ab ab ab ab ab",
    "cd cd cd cd cd cd cd",
    "ef ef ef ef ef ef",
    "gh gh gh gh gh",
]


def test_batched_equals_sequential_on_non_interacting_fixture(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(NON_INTERACTING_TEXTS)],
        "doc_id long, text string",
    )
    seq = [
        (r.rank, r.left, r.right, r.merged, r.n_occurrences)
        for r in bpe.train_bpe(docs, n_merges=4, batch_merges=1)
        .orderBy("rank").collect()
    ]
    bat = [
        (r.rank, r.left, r.right, r.merged, r.n_occurrences)
        for r in bpe.train_bpe(docs, n_merges=4, batch_merges=4)
        .orderBy("rank").collect()
    ]
    assert seq == bat and len(seq) == 4
    # adaptive schedule: same exactness contract — on a non-interacting
    # fixture the batch size only changes how many driver rounds run,
    # never which merges are learned
    ada = [
        (r.rank, r.left, r.right, r.merged, r.n_occurrences)
        for r in bpe.train_bpe(docs, n_merges=4, batch_merges="auto")
        .orderBy("rank").collect()
    ]
    assert seq == ada


def test_adaptive_batch_deterministic_across_runs(spark, docs):
    """batch_merges="auto" must train identical tables on re-run (the
    schedule is a pure function of the ordered candidate stream)."""
    def run():
        return [
            (r.rank, r.left, r.right, r.merged, r.n_occurrences)
            for r in bpe.train_bpe(docs, n_merges=12, batch_merges="auto")
            .orderBy("rank").collect()
        ]
    a, b = run(), run()
    assert a == b and len(a) > 0


def test_batch_merges_1_is_reference_identical(spark, docs):
    got = [
        (r.rank, r.left, r.right, r.merged, r.n_occurrences)
        for r in bpe.train_bpe(docs, n_merges=12, batch_merges=1)
        .orderBy("rank").collect()
    ]
    want, _, _ = _ref_train(TEXTS, 12)
    assert got == want


def test_selector_skips_interacting_pairs():
    # (a,b) picked first; (b,c) shares b -> skipped; (x,y) disjoint ->
    # picked; (a,b)'s merged token "ab" as a symbol -> skipped
    cands = [
        {"l": "a", "r": "b", "cnt": 10},
        {"l": "b", "r": "c", "cnt": 9},
        {"l": "x", "r": "y", "cnt": 8},
        {"l": "ab", "r": "z", "cnt": 7},
        {"l": "q", "r": "r", "cnt": 1},  # below min_pair_count
    ]
    got = bpe._select_non_interacting(cands, m=4, min_pair_count=2)
    assert got == [("a", "b", 10), ("x", "y", 8)]


def test_batched_segmentation_reconstructs_words(spark, docs):
    merges = bpe.train_bpe(docs, n_merges=12, batch_merges=4)
    seg = bpe.segment_words(docs, merges)
    from pyspark.sql import functions as F

    bad = seg.filter(F.concat_ws("", "pieces") != F.col("w")).count()
    assert bad == 0
    ranks = [r.rank for r in merges.orderBy("rank").collect()]
    assert ranks == list(range(len(ranks)))


def test_tokenize_corpus_matches_per_doc_replay(spark, docs):
    # vocabulary-join token counts == replaying the merges over every
    # document's own words (the pure-Python reference)
    merges_df = bpe.train_bpe(docs, n_merges=10)
    got = {
        r.doc_id: (r.n_words, r.n_tokens)
        for r in bpe.tokenize_corpus(docs, merges_df).collect()
    }
    rules = [
        (r.left, r.right) for r in merges_df.orderBy("rank").collect()
    ]
    for i, t in enumerate(TEXTS):
        words = " ".join(t.lower().split()).split(" ")
        n_tokens = 0
        for w in words:
            syms = list(w)
            for left, right in rules:
                syms = _ref_apply(syms, left, right)
            n_tokens += len(syms)
        assert got[i] == (len(words), n_tokens), f"doc {i}"
