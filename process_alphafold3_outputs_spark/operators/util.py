"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition a too-coarsely-partitioned input so CPU-heavy
    expression pipelines (md5 shingling, bit-voting, dot products) use
    every core.

    Fires only in local mode, where the driver test files are single
    row-group parquet (unsplittable → the whole pipeline would run on
    one core). On a real cluster a 100 TB scan already arrives in
    thousands of partitions, and master != local makes this a no-op —
    no gratuitous shuffle of the big table. (Deliberately NOT
    implemented via df.rdd.getNumPartitions(): materialising the RDD
    lineage defeats whole-stage codegen and costs more than it saves.)"""
    spark = df.sparkSession
    if not spark.sparkContext.master.startswith("local"):
        return df
    target = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    return df.repartition(target, *key_cols) if key_cols else df.repartition(target)


def two_phase_agg(df, keys: list[str], value_col: str, n_salts: int = 16):
    """Skew-safe aggregation: salt the grouping key, partially aggregate
    per (salt, keys), then finalize per keys. Heavy-hitter keys (a few
    keys carrying most rows) stop bottlenecking one reducer — each hot
    key's rows split across ``n_salts`` partial groups.

    Partial sums/counts compose exactly; avg is derived at the end.
    (AQE's skew-join handling covers joins; this covers aggregations.)
    """
    from pyspark.sql import functions as F

    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*keys, F.monotonically_increasing_id()), F.lit(n_salts))
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        F.sum(value_col).alias("_psum"), F.count(F.lit(1)).alias("_pcnt")
    )
    return partial.groupBy(*keys).agg(
        F.sum("_psum").alias("total"),
        F.sum("_pcnt").alias("n_rows"),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key salting pattern: the BIG side gets a
    deterministic per-row salt (hash of all its columns mod n_salts —
    never rand(): a retried task must re-derive the same salt), the
    SMALL side is replicated ×``n_salts``, and the join key becomes
    (key, salt) — a single hot key now spreads over ``n_salts``
    reducers instead of one straggler task.

    Result equals ``big.join(small, key, how)`` exactly (pytest-pinned).
    Use when AQE's skew-join split can't help — e.g. the skew is in a
    single key of a shuffled join whose partitions can't be subdivided
    further, or the join feeds a downstream stage that must stay
    partitioned by (key, salt). For a small side that fits in memory,
    plain ``broadcast(small)`` is still the first choice; salting is
    the fallback when it doesn't. Supports 'inner' and 'left' (the
    shapes where per-row replication semantics are sound).
    """
    from pyspark.sql import functions as F

    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    b = big.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = b.join(s, [key, "_salt"], how)
    return out.drop("_salt")


def skew_salted_join(
    big: "DataFrame",
    small: "DataFrame",
    keys: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> "DataFrame":
    """Join with identical results to ``big.join(small, keys, how)``
    but with every hot key's rows split across ``n_salts`` partitions —
    the join-side twin of :func:`two_phase_agg` for when a handful of
    keys carry most of the big side and even AQE's skew splitting
    leaves stragglers (AQE splits a skewed PARTITION; a single giant
    KEY still lands in one sort-merge group).

    Mechanics: the big side gets a per-row salt (row-hash, result-
    neutral — the salt is part of the join key only to spread the
    shuffle); the small side is replicated ``n_salts``× so every
    (key, salt) finds its match. Small-side shuffle volume multiplies
    by n_salts — use for genuinely small-to-medium right sides (a
    broadcast join needs no salting at all; this covers the
    too-big-to-broadcast, skewed-key middle ground).

    ``how``: inner/left joins only (semantics of right/outer joins
    change under replication)."""
    from pyspark.sql import functions as F

    if how not in ("inner", "left"):
        raise ValueError(f"skew_salted_join supports inner/left, got {how!r}")
    big_s = big.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(*keys, F.monotonically_increasing_id()), F.lit(n_salts)
        ),
    )
    small_s = small.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0).cast("long"), F.lit(n_salts - 1).cast("long"))),
    )
    return big_s.join(small_s, [*keys, "_salt"], how).drop("_salt")
