"""As-of (point-in-time) join — a kernel Spark lacks natively.

Expressed as the union-and-carry window pattern: interleave both sides
ordered by (key, ts, side) and carry the nearest right-side payload
across with ``last/first(ignorenulls)``; keep the left rows. One
shuffle (the window partition by key), no range explosion — at 100 TB
this beats the bucketize-and-filter rewrite whenever right-side history
per key fits a partition, and AQE handles skewed keys.

The full ``merge_asof`` surface (pandas/polars parity):

- ``direction="backward"`` (default) — greatest ``right_ts <=
  left_ts`` (DuckDB's ``ASOF JOIN`` ON ``l.ts >= r.ts``, which the
  oracle uses to cross-validate).
- ``direction="forward"`` — smallest ``right_ts >= left_ts``.
- ``direction="nearest"`` — whichever of the two is closer in time;
  exact ties break BACKWARD (deterministic, documented — engines and
  libraries disagree here, so the contract must say).
- ``tolerance`` (seconds) — a match farther than this from the left
  timestamp is discarded (payloads NULL), applied per direction BEFORE
  the nearest pick, matching pandas.

All directions are inclusive at equality. The right side must be
unique per (key, ts); pre-aggregate duplicates upstream or matches are
ambiguous in ANY engine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DIRECTIONS = ("backward", "forward", "nearest")


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    direction: str = "backward",
    tolerance: int | None = None,
) -> DataFrame:
    """Left rows + the as-of right ``payload`` columns (named
    ``asof_<col>``) per ``direction``/``tolerance``. Unmatched left
    rows keep NULL payloads."""
    if direction not in _DIRECTIONS:
        raise ValueError(
            f"direction must be one of {_DIRECTIONS} (got {direction!r})"
        )
    if tolerance is not None and tolerance < 0:
        raise ValueError(f"tolerance must be >= 0 (got {tolerance})")
    on = list(on)
    payload = list(payload)
    l_tag = left.select(
        *on,
        F.col(left_ts).cast("long").alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(right.schema[p].dataType).alias(f"_p_{p}") for p in payload],
        F.struct(*left.columns).alias("_row"),
    )
    r_tag = right.select(
        *on,
        F.col(right_ts).cast("long").alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.col(p).alias(f"_p_{p}") for p in payload],
        F.lit(None)
        .cast(l_tag.schema["_row"].dataType)
        .alias("_row"),
    )
    combined = l_tag.unionByName(r_tag)

    need_b = direction in ("backward", "nearest")
    need_f = direction in ("forward", "nearest")
    carried = combined
    # The carry is ONE struct of (ts, payload...) per right row, not a
    # per-column carry: a struct with NULL fields is still non-NULL, so
    # last/first(ignorenulls) always lands on the MATCHED right row. A
    # per-column carry skips a NULL payload value and surfaces an
    # older/farther right row's value while _bts/_fts (and the
    # tolerance check) still point at the nearest row — pandas
    # merge_asof returns NULL there, and now so do we.
    r_struct = F.when(
        F.col("_is_left") == 0,
        F.struct(
            F.col("_ts").alias("t"),
            *[
                F.col(f"_p_{p}").alias(f"p{i}")
                for i, p in enumerate(payload)
            ],
        ),
    )
    if need_b:
        # right rows at the same ts sort BEFORE left rows -> inclusive
        wb = (
            Window.partitionBy(*on)
            .orderBy(F.col("_ts"), F.col("_is_left"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carried = carried.select(
            "*", F.last(r_struct, ignorenulls=True).over(wb).alias("_b")
        ).select(
            "*",
            F.col("_b.t").alias("_bts"),
            *[
                F.col(f"_b.p{i}").alias(f"_b_{p}")
                for i, p in enumerate(payload)
            ],
        ).drop("_b")
    if need_f:
        # left rows sort BEFORE right rows at the same ts -> the right
        # row lands inside the left row's following frame (inclusive)
        wf = (
            Window.partitionBy(*on)
            .orderBy(F.col("_ts"), F.col("_is_left").desc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        carried = carried.select(
            "*", F.first(r_struct, ignorenulls=True).over(wf).alias("_f")
        ).select(
            "*",
            F.col("_f.t").alias("_fts"),
            *[
                F.col(f"_f.p{i}").alias(f"_f_{p}")
                for i, p in enumerate(payload)
            ],
        ).drop("_f")

    out = carried.filter(F.col("_is_left") == 1)

    def ok_b():
        c = F.col("_bts").isNotNull()
        if tolerance is not None:
            c = c & (F.col("_ts") - F.col("_bts") <= tolerance)
        return c

    def ok_f():
        c = F.col("_fts").isNotNull()
        if tolerance is not None:
            c = c & (F.col("_fts") - F.col("_ts") <= tolerance)
        return c

    if direction == "backward":
        pick = [F.when(ok_b(), F.col(f"_b_{p}")) for p in payload]
    elif direction == "forward":
        pick = [F.when(ok_f(), F.col(f"_f_{p}")) for p in payload]
    else:  # nearest — ties break backward (documented contract)
        use_b = ok_b() & (
            ~ok_f()
            | (F.col("_ts") - F.col("_bts") <= F.col("_fts") - F.col("_ts"))
        )
        pick = [
            F.when(use_b, F.col(f"_b_{p}")).otherwise(
                F.when(ok_f(), F.col(f"_f_{p}"))
            )
            for p in payload
        ]
    return out.select(
        F.col("_row.*"),
        *[c.alias(f"asof_{p}") for c, p in zip(pick, payload)],
    )
