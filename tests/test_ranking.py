"""IR metric pins for operators/ranking.py — hand-built run + judgments
with the formulas restated independently in plain Python."""

from __future__ import annotations

import math

from process_alphafold3_outputs_spark.operators.ranking import (
    ranking_metrics,
    ranking_summary,
)

HITS = "query_id long, doc_id long, rank int"
QRELS = "query_id long, doc_id long, rel int"


def test_ranking_metrics_hand_computed(spark):
    hits = spark.createDataFrame(
        [
            # q1: rel at ranks 1 and 3, miss at 2
            (1, 102, 1), (1, 999, 2), (1, 101, 3),
            # q3 has hits but NO qrels -> dropped from the report
            (3, 101, 1),
        ],
        HITS,
    )
    qrels = spark.createDataFrame(
        [(1, 101, 2), (1, 102, 1), (1, 103, 1), (2, 104, 1)],
        QRELS,
    )
    out = {
        r.query_id: r
        for r in ranking_metrics(hits, qrels, k=3).collect()
    }
    assert set(out) == {1, 2}  # q3 unjudged -> dropped

    r1 = out[1]
    assert (r1.n_rel, r1.n_hits, r1.n_rel_hit) == (3, 3, 2)
    assert r1.precision_k == round(2 / 3, 6)
    assert r1.recall_k == round(2 / 3, 6)
    assert r1.rr == 1.0
    # AP@3: precision at relevant ranks (1/1 at rank 1, 2/3 at rank 3)
    # over min(n_rel, k) = 3
    assert r1.ap_k == round((1 / 1 + 2 / 3) / 3, 6)
    dcg = (2**1 - 1) / math.log2(2) + (2**2 - 1) / math.log2(4)
    idcg = (
        (2**2 - 1) / math.log2(2)
        + (2**1 - 1) / math.log2(3)
        + (2**1 - 1) / math.log2(4)
    )
    assert r1.ndcg_k == round(dcg / idcg, 6)

    # judged query with NO hits: defined zeros, not NULLs
    r2 = out[2]
    assert (r2.n_rel, r2.n_hits, r2.n_rel_hit) == (1, 0, 0)
    assert (r2.precision_k, r2.recall_k, r2.rr, r2.ap_k, r2.ndcg_k) == (
        0.0, 0.0, 0.0, 0.0, 0.0,
    )


def test_ranking_metrics_k_truncates_run_and_ideal(spark):
    """Rank-(k+1) hits are invisible, and IDCG is the ideal of the TOP
    k judgments, so a perfect-but-deep run cannot score ndcg 1."""
    hits = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], HITS
    )
    qrels = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 1), (1, 12, 1)], QRELS
    )
    out = ranking_metrics(hits, qrels, k=2).collect()[0]
    assert out.n_hits == 2 and out.n_rel_hit == 2
    assert out.precision_k == 1.0
    assert out.recall_k == round(2 / 3, 6)
    assert out.ndcg_k == 1.0  # top-2 of the run == top-2 ideal


def test_ranking_perfect_run_is_all_ones(spark):
    """A run that returns the judged docs in ideal gain order scores 1
    on precision (k = n_rel), rr, ap and ndcg."""
    qrels = spark.createDataFrame(
        [(1, 1, 3), (1, 2, 2), (1, 3, 1)], QRELS
    )
    hits = spark.createDataFrame(
        [(1, 1, 1), (1, 2, 2), (1, 3, 3)], HITS
    )
    r = ranking_metrics(hits, qrels, k=3).collect()[0]
    assert (r.precision_k, r.recall_k, r.rr, r.ap_k, r.ndcg_k) == (
        1.0, 1.0, 1.0, 1.0, 1.0,
    )
    s = ranking_summary(ranking_metrics(hits, qrels, k=3)).collect()[0]
    assert s.n_queries == 1 and s.map_k == 1.0 and s.mean_ndcg_k == 1.0


def test_ranking_summary_macro_average(spark):
    """Macro: the 1-judgment query and the 3-judgment query weigh the
    same in every mean."""
    qrels = spark.createDataFrame(
        [(1, 1, 1), (2, 2, 1), (2, 3, 1), (2, 4, 1)], QRELS
    )
    hits = spark.createDataFrame(
        [(1, 1, 1), (2, 9, 1), (2, 2, 2)], HITS
    )
    m = ranking_metrics(hits, qrels, k=2)
    s = ranking_summary(m).collect()[0]
    assert s.n_queries == 2
    # q1 recall 1.0; q2 recall 1/3 -> macro mean
    assert s.mean_recall_k == round((1.0 + round(1 / 3, 6)) / 2, 6)
    assert s.mrr == round((1.0 + 0.5) / 2, 6)
