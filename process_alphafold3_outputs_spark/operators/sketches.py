"""Mergeable approximate sketches — the counting layer a 100 TB corpus
profile runs where exact DISTINCT/percentile shuffles would dominate:

- HyperLogLog distinct counts (Apache DataSketches HLL via Spark 4's
  ``hll_sketch_agg``): each partition builds a fixed-size sketch,
  partial aggregation merges them map-side, and ONE sketch-sized row
  per group crosses the shuffle — vs an exact count-distinct that
  shuffles every distinct value. Sketches are stored/unioned across
  shipments (``hll_union_agg``), so per-split profiles roll up to a
  corpus profile WITHOUT rescanning (mergeability pinned by pytest).
- Approximate percentiles (``percentile_approx``) with the same
  partial-merge shape.

Approximate results have no bit-exact cross-engine oracle (DuckDB's
estimator differs), so these are pinned by error-bound differentials
against the exact aggregates at test scale instead of a SQL oracle —
the documented exception path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_by(
    df: DataFrame, group_col: str, value_col: str, lg_k: int = 12
) -> DataFrame:
    """(group, approx_distinct) — HLL distinct ``value_col`` per group.
    ``lg_k``=12 → ~1.6% relative standard error in ~4 KB per group,
    independent of cardinality."""
    return df.groupBy(group_col).agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col(value_col), F.lit(lg_k))
        ).alias("approx_distinct")
    )


def distinct_sketches(
    df: DataFrame, group_col: str, value_col: str, lg_k: int = 12
) -> DataFrame:
    """(group, sketch BINARY) — the mergeable form: persist these per
    shipment/partition and roll up with :func:`merge_sketches` instead
    of rescanning history."""
    return df.groupBy(group_col).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("sketch")
    )


def merge_sketches(sketches: DataFrame, by: list[str] | None = None) -> DataFrame:
    """Union (group?, sketch) rows into one estimate per ``by`` group
    (grand total when ``by`` is None) — sketch-sized rows only; the
    original data is never touched."""
    agg = F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch"))).alias(
        "approx_distinct"
    )
    if by:
        return sketches.groupBy(*by).agg(agg)
    return sketches.agg(agg)


def approx_percentiles_by(
    df: DataFrame,
    group_col: str,
    value_col: str,
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    accuracy: int = 10000,
) -> DataFrame:
    """(group, p_50, p_90, ...) — approximate percentiles with bounded
    rank error 1/``accuracy`` and fixed sketch memory; same
    partial-merge scale shape as the HLL path."""
    cols = [
        F.percentile_approx(value_col, F.lit(p), F.lit(accuracy)).alias(
            f"p_{str(p).replace('0.', '').ljust(2, '0')}"
        )
        for p in percentiles
    ]
    return df.groupBy(group_col).agg(*cols)
