"""Driver-contract queries for the training-data-pipeline extensions
(dedup / similarity / text analysis), with full DuckDB oracle SQL that
reproduces each construction bit-for-bit (md5-based hashing, double
fold dot products, replace-arithmetic word counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup, similarity, text
from ..sources.tables import load_table
from .driver_queries import register

# shared SQL fragments -------------------------------------------------------

_NORM = r"SELECT doc_id, lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS t FROM documents"

_SHINGLES = f"""
    norm AS ({_NORM}),
    words AS (SELECT doc_id, t, string_split(t, ' ') AS w FROM norm),
    shingles AS (
        SELECT DISTINCT doc_id,
               CASE WHEN len(w) < 3 THEN t
                    ELSE array_to_string(w[i:i+2], ' ') END AS shingle
        FROM words, unnest(generate_series(1, greatest(len(w) - 2, 1))) s(i)
    )
"""


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------
@register(
    "dedup_exact",
    sql=f"""
    WITH norm AS ({_NORM})
    SELECT md5(t) AS text_hash, min(doc_id) AS keeper_doc_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM norm GROUP BY md5(t)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# MinHash + LSH candidate pairs
# --------------------------------------------------------------------------
@register(
    "dedup_minhash_lsh",
    sql=f"""
    WITH {_SHINGLES},
    mh AS (
        SELECT doc_id, s.seed,
               min(md5(CAST(s.seed AS VARCHAR) || ':' || shingle)) AS minhash
        FROM shingles, unnest(generate_series(0, 11)) s(seed)
        GROUP BY doc_id, s.seed
    ),
    bands AS (
        SELECT doc_id, seed // 3 AS band,
               string_agg(minhash, '|' ORDER BY seed) AS band_sig
        FROM mh GROUP BY doc_id, seed // 3
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.lsh_candidate_pairs(
        load_table(spark, sf_dir, "documents"), n_bands=4, rows_per_band=3
    )


# --------------------------------------------------------------------------
# n-gram Jaccard pairs (exact, inverted-index join)
# --------------------------------------------------------------------------
@register(
    "dedup_jaccard",
    sql=f"""
    WITH {_SHINGLES},
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        FROM shingles a JOIN shingles b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.5
    """,
)
def dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.jaccard_pairs(load_table(spark, sf_dir, "documents"), threshold=0.5)


# --------------------------------------------------------------------------
# SimHash signatures
# --------------------------------------------------------------------------
@register(
    "dedup_simhash",
    sql=f"""
    WITH norm AS ({_NORM}),
    toks AS (SELECT doc_id, md5(unnest(string_split(t, ' '))) AS h FROM norm),
    bits AS (SELECT doc_id, h, b.bit FROM toks, unnest(generate_series(0, 15)) b(bit)),
    votes AS (
        SELECT doc_id, bit,
               sum(CASE WHEN CAST(floor(
                     (strpos('0123456789abcdef', substr(h, (bit // 4) + 1, 1)) - 1)
                     / power(2, bit % 4)) AS INT) % 2 = 1
                   THEN 1 ELSE -1 END) AS vote
        FROM bits GROUP BY doc_id, bit
    )
    SELECT doc_id,
           CAST(sum(CASE WHEN vote > 0 THEN CAST(power(2, bit) AS BIGINT) ELSE 0 END)
                AS BIGINT) AS simhash
    FROM votes GROUP BY doc_id
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# exact cosine top-k (brute force baseline)
# --------------------------------------------------------------------------
_TOPK_K = 5
_N_QUERIES = 8


@register(
    "similarity_topk",
    sql=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
               FROM embeddings WHERE vec_id < {_N_QUERIES}),
    c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS ce FROM embeddings),
    scored AS (
        SELECT query_id, neighbor_id,
               list_dot_product(qe, ce) /
                 (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce))) AS s
        FROM q, c WHERE query_id <> neighbor_id
    )
    SELECT query_id, neighbor_id, CAST(rk AS INT) AS rk, round(s, 6) AS sim
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY s DESC, neighbor_id) AS rk
          FROM scored)
    WHERE rk <= {_TOPK_K}
    """,
)
def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.topk_bruteforce(emb, F.col("vec_id") < _N_QUERIES, k=_TOPK_K)


# --------------------------------------------------------------------------
# language ID
# --------------------------------------------------------------------------
def _sql_count_word(word: str) -> str:
    pad = f"(' ' || t || ' ')"
    needle = f"' {word} '"
    return (
        f"CAST(floor((length({pad}) - length(replace({pad}, {needle}, ' ')))"
        f" / {len(word) + 1}) AS BIGINT)"
    )


def _sql_lang_score(lang: str) -> str:
    return " + ".join(_sql_count_word(w) for w in text.LANG_MARKERS[lang])


@register(
    "text_language_id",
    sql=f"""
    WITH norm AS ({_NORM}),
    scores AS (SELECT doc_id,
        {", ".join(f"{_sql_lang_score(lang)} AS score_{lang}" for lang in sorted(text.LANG_MARKERS))}
        FROM norm)
    SELECT doc_id,
           CASE WHEN greatest(score_de, score_en, score_es, score_fr) = 0 THEN 'und'
                {"".join(f"WHEN score_{lang} = greatest(score_de, score_en, score_es, score_fr) THEN '{lang}' " for lang in sorted(text.LANG_MARKERS))}
                ELSE 'und' END AS pred_lang
    FROM scores
    """,
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.language_id(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# quality scores
# --------------------------------------------------------------------------
@register(
    "text_quality",
    sql=f"""
    WITH norm AS (SELECT doc_id, text,
                         lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
                  FROM documents)
    SELECT doc_id,
           length(text) AS n_chars,
           CAST(len(string_split(t, ' ')) AS BIGINT) AS n_words,
           round((length(t) - len(string_split(t, ' ')) + 1)
                 / len(string_split(t, ' ')), 4) AS avg_word_len,
           round((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
                 / greatest(length(text), 1), 4) AS punct_ratio,
           round(({" + ".join(_sql_count_word(w) for w in text.EN_STOPWORDS)})
                 / len(string_split(t, ' ')), 4) AS stopword_ratio
    FROM norm
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.quality_scores(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# token counts
# --------------------------------------------------------------------------
@register(
    "text_token_count",
    sql=f"""
    WITH norm AS (SELECT doc_id, text,
                         lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
                  FROM documents)
    SELECT doc_id,
           CAST(len(string_split(t, ' ')) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
                AS BIGINT) AS n_bpe_ish_tokens
    FROM norm
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.token_counts(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# fingerprints
# --------------------------------------------------------------------------
@register(
    "text_fingerprint",
    sql=f"""
    WITH {_SHINGLES}
    SELECT n.doc_id, md5(n.t) AS exact_fp, r.rolling_fp
    FROM norm n JOIN (SELECT doc_id, min(md5(shingle)) AS rolling_fp
                      FROM shingles GROUP BY doc_id) r
      ON n.doc_id = r.doc_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.fingerprints(load_table(spark, sf_dir, "documents"))
