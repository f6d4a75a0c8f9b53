"""As-of (point-in-time) join — a kernel Spark lacks natively.

Expressed as the union-and-carry window pattern: interleave both sides
ordered by (key, ts, side) and carry the last right-side payload
forward with ``last(ignorenulls)``; keep the left rows. One shuffle
(the window partition by key), no range explosion — at 100 TB this
beats the bucketize-and-filter rewrite whenever right-side history per
key fits a partition, and AQE handles skewed keys.

Semantics: backward inclusive — each left row gets the right row with
the greatest ``right_ts <= left_ts`` (DuckDB's ``ASOF JOIN`` ON
``l.ts >= r.ts``, which the oracle uses to cross-validate). The right
side must be unique per (key, ts); pre-aggregate duplicates upstream
or matches are ambiguous in ANY engine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
) -> DataFrame:
    """Left rows + the most recent right ``payload`` columns as of the
    left timestamp (inclusive). Unmatched left rows keep NULL payloads."""
    on = list(on)
    l_tag = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(right.schema[p].dataType).alias(f"_p_{p}") for p in payload],
        F.struct(*left.columns).alias("_row"),
    )
    r_tag = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.col(p).alias(f"_p_{p}") for p in payload],
        F.lit(None)
        .cast(l_tag.schema["_row"].dataType)
        .alias("_row"),
    )
    combined = l_tag.unionByName(r_tag)
    # right rows at the same ts sort BEFORE left rows -> inclusive match
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = combined.select(
        "*",
        *[
            F.last(f"_p_{p}", ignorenulls=True).over(w).alias(f"_c_{p}")
            for p in payload
        ],
    )
    out = carried.filter(F.col("_is_left") == 1)
    return out.select(
        F.col("_row.*"),
        *[F.col(f"_c_{p}").alias(f"asof_{p}") for p in payload],
    )
