"""Fuzzy entity resolution — blocked pairwise matching over DISTINCT
canonical names, transitive-closure canonicalization, mapped back to
the row level.

An LLM-scale corpus pipeline needs this for source/author/domain
canonicalization (the same name spelled three ways must count as one
entity for mixture budgeting and dedup-by-source). The construction is
the classic three-stage ER pipeline, each stage in its Spark-native
scale shape:

1. **Canonicalize + deduplicate the name space** BEFORE any pairwise
   work: matching runs on ``distinct(normalized_name)``, not on rows.
   At 100 TB the row table is arbitrarily large but the distinct-name
   table is vocabulary-sized — the quadratic stage never sees row
   cardinality.
2. **Blocking**: candidate pairs only within a block (first token of
   the normalized name). The block join is one hash shuffle on the
   block key; per-block work is O(b²) in BLOCK size, never corpus
   size. Hot blocks are a data-quality signal (a vocabulary whose
   every name shares one first word needs a finer key — compose the
   block column accordingly, e.g. first token + length bucket).
3. **Transitive closure**: an edit-distance match is not transitive
   ("aa"~"ab"~"bb" but "aa"!~"bb" at distance 1), so entities are the
   CONNECTED COMPONENTS of the match graph — the same O(log n)
   pointer-doubling kernel the near-dup dedup family uses
   (:func:`..operators.dedup.connected_components`; string node ids
   propagate fine — the label min is lexicographic).

Match predicate: ``levenshtein(a, b) <= max_distance`` — a JVM
built-in on both sides of the blocked self-join, whole-stage codegen,
no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import connected_components


def normalized_name(col: Column) -> Column:
    """Lowercased, whitespace-collapsed name — the canonical form all
    matching compares (same normalization contract as the text-dedup
    family's ``normalized``)."""
    return F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))


def name_match_pairs(
    names: DataFrame,
    name_col: str = "name",
    max_distance: int = 2,
    block_col: Column | None = None,
) -> DataFrame:
    """(name_a, name_b) — unordered (a < b) pairs of DISTINCT names
    with ``levenshtein <= max_distance`` inside the same block.

    ``block_col``: blocking key expression over the name column;
    default first whitespace token. Blocking is part of the match
    SPEC (pairs straddling blocks are non-matches by definition) —
    deterministic and oracle-reproducible, like every candidate
    generator in this repo."""
    blk = (
        block_col
        if block_col is not None
        else F.split(F.col(name_col), " ")[0]
    )
    b = names.select(F.col(name_col).alias("_n")).distinct().withColumn(
        "_blk", blk if block_col is not None else F.split("_n", " ")[0]
    )
    left = b.select(F.col("_n").alias("name_a"), "_blk")
    right = b.select(F.col("_n").alias("name_b"), "_blk")
    return (
        left.join(right, "_blk")
        .filter(
            (F.col("name_a") < F.col("name_b"))
            & (F.levenshtein("name_a", "name_b") <= max_distance)
        )
        .select("name_a", "name_b")
    )


def resolve_entities(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_distance: int = 2,
) -> DataFrame:
    """(``id_col``, name_norm, entity_id) — every input row labeled
    with its entity: ``entity_id`` is the MIN ``id_col`` across all
    rows whose normalized names fall in the same connected component
    of the match graph. Unmatched names form singleton entities.

    Note: the component fixpoint is EAGER at plan-build time
    (inherent to connected components — same contract as
    ``clean_corpus(near_dedup="clusters")``)."""
    rows = df.select(
        F.col(id_col), normalized_name(F.col(name_col)).alias("name_norm")
    )
    names = rows.select(F.col("name_norm").alias("_n")).distinct()
    pairs = name_match_pairs(names, "_n", max_distance=max_distance)
    comp = connected_components(pairs, src="name_a", dst="name_b")
    labeled = (
        rows.join(
            comp.select(
                F.col("doc_id").alias("name_norm"),
                F.col("cluster_id").alias("_canon"),
            ),
            "name_norm",
            "left",
        )
        .withColumn("_canon", F.coalesce("_canon", "name_norm"))
    )
    # entity id = min row id per canonical name-cluster; the canon
    # table is vocabulary-sized -> broadcast back onto the rows
    ents = labeled.groupBy("_canon").agg(F.min(id_col).alias("entity_id"))
    return labeled.join(F.broadcast(ents), "_canon").select(
        id_col, "name_norm", "entity_id"
    )
