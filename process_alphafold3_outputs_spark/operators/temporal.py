"""Time-series resampling — the hypertable-rollup family (TimescaleDB
``time_bucket_gapfill``/``locf``/``interpolate``, kdb ``xbar``) that a
metrics/monitoring consumer of the events stream needs and that plain
``GROUP BY window()`` cannot give (a GROUP BY emits only buckets that
HAVE rows; a monitoring chart, a rate calculation, or a downstream
as-of consumer needs the empty buckets to exist, filled by an explicit
policy).

Two operators:

- :func:`time_bucket_gapfill` — per-key dense bucket spine (every
  bucket between each key's first and last observation) with the
  bucket aggregate and explicit fill policies: ``locf`` (last
  observation carried forward), ``linear`` (interpolation between the
  neighboring observed buckets), ``zero``, ``none`` (NULL, with the
  ``n`` column marking gaps as 0-count).
- :func:`ohlc_downsample` — open/high/low/close + count per bucket
  (the canonical numeric downsample), open/close tie-broken by an
  explicit sequence column so the result is deterministic under
  duplicate timestamps on EVERY engine.

Scale posture (100 TB events): the raw stream collapses to
(key, bucket) grain in ONE hash aggregation with map-side combine
before anything else happens — everything downstream (spine build,
fill windows) runs on the bucket-bounded table, never on raw events.
The spine explode is linear in emitted buckets; a counted guard
refuses loudly when ``(span / width)`` exceeds ``max_buckets`` for any
key (the ks_distance ``max_values`` / privacy ``max_support``
discipline: a silent 10^9-row explode is a bug, not a feature), and
the fill windows partition by key — no global sort anywhere.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_FILLS = ("none", "zero", "locf", "linear")
_AGGS = ("avg", "sum", "min", "max", "count")


def _bucket(ts_sec: Column, width: int) -> Column:
    # floor-div then re-scale: exact integer math (never double floor)
    return (ts_sec - (((ts_sec % width) + width) % width)).cast("long")


def _agg_expr(agg: str, value_col: str) -> Column:
    v = F.col(value_col).cast("double")
    if agg == "count":
        return F.count(v).cast("double")
    return getattr(F, agg)(v)


def time_bucket_gapfill(
    df: DataFrame,
    keys: Sequence[str],
    ts_sec_col: str,
    value_col: str,
    width: int,
    agg: str = "avg",
    fill: str = "locf",
    max_buckets: int = 1_000_000,
) -> DataFrame:
    """(keys..., bucket, n, value) — ``agg`` of ``value_col`` per
    ``width``-second bucket, with EVERY bucket between each key's first
    and last observation present. ``n`` is the observation count (0 on
    gap rows); ``value`` on a gap row follows ``fill``:

    - ``none``   — NULL (the honest raw form)
    - ``zero``   — 0.0 (rate/sum semantics)
    - ``locf``   — last observed bucket's value carried forward
    - ``linear`` — linear interpolation between the previous and next
      observed buckets (both always exist on an interior gap, because
      the spine is bounded by each key's own first/last observation)

    ``ts_sec_col`` must be epoch seconds (BIGINT) — the engine-portable
    time representation used across the event suite. Values round to
    6 dp so filled series hash identically cross-engine.

    One aggregation over the raw stream, then bucket-bounded work only.
    Refuses loudly if any key's span would emit more than
    ``max_buckets`` buckets — re-bucket coarser rather than explode.
    """
    keys = list(keys)
    if width <= 0:
        raise ValueError(f"width must be positive seconds (got {width})")
    if fill not in _FILLS:
        raise ValueError(f"fill must be one of {_FILLS} (got {fill!r})")
    if agg not in _AGGS:
        raise ValueError(f"agg must be one of {_AGGS} (got {agg!r})")

    b = df.select(
        *keys,
        _bucket(F.col(ts_sec_col).cast("long"), width).alias("bucket"),
        F.col(value_col),
    )
    bucketed = b.groupBy(*keys, "bucket").agg(
        F.count(F.col(value_col).cast("double")).cast("long").alias("n"),
        F.round(_agg_expr(agg, value_col), 6).alias("_v"),
    )

    spans = bucketed.groupBy(*keys).agg(
        F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi")
    )
    # Counted guard (the max_values / max_support discipline): the
    # explode size is knowable from the spans table, which is
    # key-bounded — one tiny job now beats an unbounded explode later.
    worst = spans.agg(
        F.max(((F.col("_hi") - F.col("_lo")) / width + 1).cast("long"))
    ).first()[0]
    if worst is not None and worst > max_buckets:
        raise ValueError(
            f"gapfill would emit {worst} buckets for the widest key "
            f"(max_buckets={max_buckets}); widen `width` or raise the "
            f"guard explicitly"
        )
    spine = spans.select(
        *keys,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.lit(int(width)))
        ).alias("bucket"),
    )
    j = spine.join(bucketed, [*keys, "bucket"], "left")
    filled = j.select(
        *keys,
        "bucket",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        F.col("_v"),
    )

    if fill == "none":
        value = F.col("_v")
    elif fill == "zero":
        value = F.coalesce(F.col("_v"), F.lit(0.0))
    elif fill == "locf":
        w_prev = (
            Window.partitionBy(*keys)
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        value = F.last("_v", ignorenulls=True).over(w_prev)
    else:  # linear
        w_prev = (
            Window.partitionBy(*keys)
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        w_next = (
            Window.partitionBy(*keys)
            .orderBy("bucket")
            .rowsBetween(0, Window.unboundedFollowing)
        )
        obs_bucket = F.when(F.col("_v").isNotNull(), F.col("bucket"))
        pv = F.last("_v", ignorenulls=True).over(w_prev)
        pb = F.last(obs_bucket, ignorenulls=True).over(w_prev)
        nv = F.first("_v", ignorenulls=True).over(w_next)
        nb = F.first(obs_bucket, ignorenulls=True).over(w_next)
        value = F.when(F.col("_v").isNotNull(), F.col("_v")).otherwise(
            F.when(
                pv.isNotNull() & nv.isNotNull(),
                pv + (nv - pv) * (F.col("bucket") - pb) / (nb - pb),
            )
        )

    return filled.select(
        *keys,
        "bucket",
        "n",
        F.round(value, 6).alias("value"),
    )


def ohlc_downsample(
    df: DataFrame,
    keys: Sequence[str],
    ts_sec_col: str,
    value_col: str,
    width: int,
    seq_col: str | None = None,
) -> DataFrame:
    """(keys..., bucket, n, open, high, low, close) per ``width``-second
    bucket — ONE hash aggregation with map-side combine (min_by/max_by
    on the (ts, seq) order key; never a window over raw events).

    ``seq_col`` breaks ties between observations sharing a timestamp
    (pass the event id); without it, duplicate-timestamp open/close is
    engine-dependent — so the default refuses to guess and uses the
    value itself as the tiebreak, which is at least deterministic.
    Values round to 6 dp (house hash-stability rule).
    """
    keys = list(keys)
    if width <= 0:
        raise ValueError(f"width must be positive seconds (got {width})")
    ts = F.col(ts_sec_col).cast("long")
    tie = F.col(seq_col) if seq_col is not None else F.col(value_col)
    order = F.struct(ts.alias("t"), tie.alias("s"))
    v = F.col(value_col).cast("double")
    return (
        df.select(
            *keys,
            _bucket(ts, width).alias("bucket"),
            order.alias("_o"),
            v.alias("_v"),
        )
        .groupBy(*keys, "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.min_by("_v", "_o"), 6).alias("open"),
            F.round(F.max("_v"), 6).alias("high"),
            F.round(F.min("_v"), 6).alias("low"),
            F.round(F.max_by("_v", "_o"), 6).alias("close"),
        )
    )
