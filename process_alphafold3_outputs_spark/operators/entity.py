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


def incremental_resolve(
    new_rows: DataFrame,
    canon: DataFrame,
    id_col: str,
    name_col: str,
    max_distance: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """(labeled_rows, updated_canon) — a NEW shipment resolved against
    the accumulated entity CANON table (name_norm, entity_id) without
    reprocessing history: the incremental sibling of
    :func:`resolve_entities`, same contract as the incremental dedup
    family (history participates only as its vocabulary-sized canon
    table; historical rows are never rescanned).

    Assignment, in deterministic precedence order:

    1. **exact adoption** — a normalized name already in canon keeps
       that entity_id;
    2. **fuzzy adoption** — an unseen name within ``max_distance`` of
       ≥1 canon names (same blocking as the batch path) adopts the
       MINIMUM matching entity_id. Existing entities are never merged
       by a bridging shipment name (the standard incremental
       compromise — batch re-resolution is the offline rebuild that
       would merge them);
    3. **new entities** — leftover names cluster among THEMSELVES
       (connected components over the shipment-local match graph);
       each cluster becomes a new entity whose id is the minimum
       ``id_col`` across its rows.

    ``updated_canon`` = canon ∪ the shipment's new (name_norm,
    entity_id) mappings — idempotent under replay."""
    rows = new_rows.select(
        F.col(id_col), normalized_name(F.col(name_col)).alias("name_norm")
    )
    names = rows.select(F.col("name_norm").alias("_n")).distinct()
    cn = canon.select(
        F.col("name_norm").alias("_cn"), F.col("entity_id").alias("_ceid")
    )
    exact = names.join(
        cn.withColumnRenamed("_cn", "_n"), "_n"
    ).select("_n", F.col("_ceid").alias("entity_id"))
    unseen = names.join(exact.select("_n"), "_n", "left_anti")
    # fuzzy adoption: blocked lev join against canon names
    u_blk = unseen.withColumn("_blk", F.split("_n", " ")[0])
    c_blk = cn.withColumn("_blk", F.split("_cn", " ")[0])
    fuzzy = (
        u_blk.join(c_blk, "_blk")
        .filter(F.levenshtein("_n", "_cn") <= max_distance)
        .groupBy("_n")
        .agg(F.min("_ceid").alias("entity_id"))
    )
    leftover = unseen.join(fuzzy.select("_n"), "_n", "left_anti")
    pairs = name_match_pairs(
        leftover.withColumnRenamed("_n", "name"), "name",
        max_distance=max_distance,
    )
    comp = connected_components(pairs, src="name_a", dst="name_b")
    lcanon = (
        leftover.join(
            comp.select(
                F.col("doc_id").alias("_n"), F.col("cluster_id").alias("_c")
            ),
            "_n",
            "left",
        )
        .withColumn("_c", F.coalesce("_c", "_n"))
    )
    # new entity id = min row id across the cluster's rows
    new_ids = (
        lcanon.join(rows.withColumnRenamed("name_norm", "_n"), "_n")
        .groupBy("_c")
        .agg(F.min(id_col).alias("entity_id"))
    )
    fresh = lcanon.join(F.broadcast(new_ids), "_c").select("_n", "entity_id")
    mapping = exact.unionByName(fuzzy).unionByName(fresh)
    labeled = rows.join(
        mapping.withColumnRenamed("_n", "name_norm"), "name_norm"
    ).select(id_col, "name_norm", "entity_id")
    updated = canon.select("name_norm", "entity_id").unionByName(
        mapping.select(F.col("_n").alias("name_norm"), "entity_id")
    )
    return labeled, updated
