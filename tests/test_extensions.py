"""Behavioral tests for the training-data-pipeline extensions: planted
near-duplicates must be found; LSH recall must be measured and sane."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from process_alphafold3_outputs_spark.operators import dedup, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the band plays "
        "a slow tune and the crowd watches in silence until the end"
    )
    near = base.replace("slow tune", "fast tune")  # one word differs
    far = "completely different content about spark query engines and shuffles"
    rows = [
        (0, base),
        (1, base),                      # exact dup of 0
        (2, "  " + base.upper() + "  "),  # exact dup after normalization
        (3, near),                      # near dup of 0
        (4, far),
        (5, "short text"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(docs):
    groups = {r.keeper_doc_id: r.n_copies for r in dedup.exact_dedup(docs).collect()}
    assert groups[0] == 3  # docs 0,1,2 collapse
    kept = {r.doc_id for r in dedup.exact_dedup_keep(docs).collect()}
    assert kept == {0, 3, 4, 5}


def test_jaccard_finds_planted_near_dup(docs):
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in dedup.jaccard_pairs(docs, 0.5).collect()}
    assert (0, 3) in pairs and pairs[(0, 3)] > 0.7
    assert not any({a, b} == {0, 4} for a, b in pairs)


def test_lsh_candidates_cover_exact_dups(docs):
    cand = {(r.doc_a, r.doc_b) for r in dedup.lsh_candidate_pairs(docs).collect()}
    assert (0, 1) in cand and (0, 2) in cand and (1, 2) in cand
    assert (0, 3) in cand  # near dup shares most shingles -> some band agrees


def test_simhash_identical_for_dups(docs):
    sh = {r.doc_id: r.simhash for r in dedup.simhash(docs).collect()}
    assert sh[0] == sh[1] == sh[2]
    assert sh[0] != sh[4]
    groups = {r.keeper_doc_id: r.n_docs for r in dedup.simhash_dup_groups(docs).collect()}
    assert groups.get(0, 0) >= 3


def test_topk_bruteforce_and_lsh_recall(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = similarity.topk_bruteforce(emb, F.col("vec_id") < 5, k=3)
    rows = exact.collect()
    assert len(rows) == 5 * 3
    assert all(0 < r.sim <= 1.0 or r.sim > -1.0 for r in rows)
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append((r.rk, r.sim))
    for q, lst in per_q.items():
        lst.sort()
        sims = [s for _, s in lst]
        assert sims == sorted(sims, reverse=True)  # rank order == sim order

    rec = similarity.recall_vs_bruteforce(emb, F.col("vec_id") < 5, k=3, n_planes=4)
    vals = {r.query_id: r.recall for r in rec.collect()}
    # recall is measured, not asserted high (random hyperplanes on random
    # vectors); it must at least be a valid fraction when present
    assert all(0 <= v <= 1 for v in vals.values())


def test_language_id_and_quality(spark):
    rows = [
        (1, "the cat and the dog of the house is to be found"),
        (2, "el perro y la casa de que es grande la vida"),
        (3, "der hund und die katze ist nicht hier"),
        (4, "xyzzy plugh"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    langs = {r.doc_id: r.pred_lang for r in text.language_id(docs).collect()}
    assert langs == {1: "en", 2: "es", 3: "de", 4: "und"}

    q = {r.doc_id: r for r in text.quality_scores(docs).collect()}
    assert q[1].n_words == 12
    assert q[1].stopword_ratio > 0.3
    assert q[4].punct_ratio == 0.0

    tc = {r.doc_id: r for r in text.token_counts(docs).collect()}
    assert tc[4].n_ws_tokens == 2 and tc[4].n_bpe_ish_tokens == 2

    fp = {r.doc_id: r for r in text.fingerprints(docs).collect()}
    assert len({fp[i].exact_fp for i in (1, 2, 3, 4)}) == 4


def test_embedding_near_dup_lsh_recall(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_near_dup(emb, threshold=0.5).collect()
    }
    approx = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_near_dup_lsh(emb, threshold=0.5, n_planes=4).collect()
    }
    # LSH candidates are a subset of exact pairs (same final filter)
    assert approx <= exact
    if exact:
        assert len(approx) / len(exact) > 0.1  # sane recall on random data


def test_topk_ivf_matches_exact_when_probing_all_cells(spark, sf_dir):
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {
        (r.query_id, r.neighbor_id, r.rk)
        for r in similarity.topk_bruteforce(emb, F.col("vec_id") < 4, k=3).collect()
    }
    # probing every cell degrades IVF to exact search
    full = {
        (r.query_id, r.neighbor_id, r.rk)
        for r in similarity.topk_ivf(
            emb, F.col("vec_id") < 4, k=3, n_cells=8, n_probe=8
        ).collect()
    }
    assert full == exact


def test_lsh_bucket_plan_build_fires_no_spark_job(spark, sf_dir):
    """Plan construction must be fully lazy: the old implementation ran
    a ``.first()`` dim probe (one Spark job per call) at build time."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sc = spark.sparkContext
    sc.setJobGroup("lsh-plan-build", "lazy-probe")
    df = similarity.lsh_buckets(emb, n_planes=4)
    ids = sc.statusTracker().getJobIdsForGroup("lsh-plan-build")
    sc.setJobGroup("lsh-plan-build-done", "done")
    assert list(ids) == []
    # and the plan still executes correctly afterwards
    assert df.limit(5).count() == 5


def test_ivf_centroids_plan_has_no_global_window_exchange(spark, sf_dir):
    """Centroid selection compiles to TakeOrderedAndProject (parallel
    partial top-k), not a single-partition global row_number window
    over the whole corpus."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = similarity.ivf_centroids(emb, n_cells=8)
    jvm = spark._jvm
    plan = cents._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "TakeOrderedAndProject" in plan
    rows = cents.collect()
    assert [r.cell for r in sorted(rows, key=lambda r: r.cell)] == list(range(8))
