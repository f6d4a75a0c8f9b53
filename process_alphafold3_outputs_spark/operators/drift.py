"""Distribution-drift monitoring between two snapshots of the same
column — the "did last week's data move" check a production training
pipeline runs before every refresh: PSI (population stability index,
the credit-scoring standard), the exact two-sample Kolmogorov–Smirnov
distance, and the chi-square statistic for categorical frequency drift.

Complements the existing drift surfaces: ``text_vocab_drift`` watches
the TOKEN distribution; these watch any numeric or categorical COLUMN
(quality scores, document lengths, source mix, embedding norms).

Scale shape: every statistic reduces each side to an
aggregate-bounded table first (bins, distinct values, categories) —
one scan per side, then arithmetic on the small tables. The KS
numerator is kept in exact integers (|cum_r·n_c − cum_c·n_r| over the
merged value grid) with ONE division at the end, so the oracle
comparison has no float-accumulation order to disagree on — the same
exact-integer discipline as the t-closeness EMD screen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _all() -> Window:
    """Whole-frame window for totals over an ALREADY-AGGREGATED small
    table (bins / distinct values / categories) — never over raw rows.
    Built lazily: constructing a WindowSpec needs an active session."""
    return Window.partitionBy()


def psi_report(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    n_bins: int = 10,
) -> DataFrame:
    """One-row report: (column, n_bins, n_ref, n_cur, psi) — the
    population stability index of ``cur`` against ``ref`` over
    fixed-width bins spanning the REFERENCE range (the production
    convention: the scorecard's bins are frozen at training time;
    values outside the reference range clamp into the edge bins).
    NULLs are excluded on both sides. Laplace-smoothed proportions
    ((count + 0.5) / (n + 0.5·bins)) keep empty bins finite without
    dropping them — an empty-vs-full bin is exactly the drift PSI
    must see. Rule of thumb: < 0.1 stable, 0.1–0.25 drifting, > 0.25
    shifted.

    The bin edges derive from ref min/max with identical arithmetic on
    both engines (no quantile estimation — fixed-width is
    deterministic cross-engine where quantile interpolation is not)."""
    r = ref.select(F.col(col).cast("double").alias("_x")).filter(
        F.col("_x").isNotNull()
    )
    c = cur.select(F.col(col).cast("double").alias("_x")).filter(
        F.col("_x").isNotNull()
    )
    bounds = _checked_bounds(r, col)
    grid = (
        ref.sparkSession.range(n_bins)
        .select(F.col("id").cast("int").alias("_bin"))
        .join(binned_counts(r, bounds, n_bins, "ref"), "_bin", "left")
        .join(binned_counts(c, bounds, n_bins, "cur"), "_bin", "left")
        .select(
            "_bin",
            F.coalesce("_c_ref", F.lit(0)).alias("_c_ref"),
            F.coalesce("_c_cur", F.lit(0)).alias("_c_cur"),
        )
    )
    return psi_from_binned(grid, col, n_bins)


def _checked_bounds(r: DataFrame, col: str) -> DataFrame:
    """One-row (_mn, _mx) frame from the non-NULL reference values —
    refusing loudly when the reference side is empty or all-NULL. An
    unguarded degenerate reference makes every current-side value bin
    to NULL and drop, so the report reads psi=0.0 ("stable") on no
    evidence at all; the guard follows :func:`ks_distance`'s
    loud-refusal discipline. The bounds are collected (two scalars)
    and re-emitted as a literal one-row frame, so downstream binning
    keeps the same broadcast-join shape."""
    row = r.agg(F.min("_x").alias("_mn"), F.max("_x").alias("_mx")).collect()[0]
    if row["_mn"] is None:
        raise ValueError(
            f"drift reference side has no non-NULL {col!r} values; "
            "reference bins are undefined. Check the reference "
            "snapshot before gating on this report."
        )
    return r.sparkSession.createDataFrame(
        [(float(row["_mn"]), float(row["_mx"]))], "_mn double, _mx double"
    )


def binned_counts(
    side: DataFrame, bounds: DataFrame, n_bins: int, label: str,
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """(_bin, _c_{label}) — fixed-width bin counts of ``side``'s ``_x``
    column against a 1-row ``bounds`` (_mn, _mx) frame. The bin
    arithmetic is the cross-engine-deterministic form shared by the
    oracle SQL; the streaming watcher bins each micro-batch against the
    FROZEN reference bounds it persisted at epoch 0. ``extra_keys``
    carries grouping columns (e.g. a time bucket) through the count —
    the :func:`psi_timeline` grain."""
    extra = list(extra_keys or [])
    return (
        side.crossJoin(F.broadcast(bounds))
        .select(
            *extra,
            F.when(F.col("_mx") == F.col("_mn"), F.lit(0))
            .otherwise(
                F.least(
                    F.lit(n_bins - 1),
                    F.greatest(
                        F.lit(0),
                        F.floor(
                            (F.col("_x") - F.col("_mn"))
                            * n_bins
                            / (F.col("_mx") - F.col("_mn"))
                        ).cast("int"),
                    ),
                )
            )
            .alias("_bin")
        )
        .groupBy(*extra, "_bin")
        .agg(F.count(F.lit(1)).cast("long").alias(f"_c_{label}"))
    )


def psi_from_binned(grid: DataFrame, col: str, n_bins: int) -> DataFrame:
    """The grid→PSI half of :func:`psi_report`: ``grid`` holds one row
    per bin 0..n_bins−1 with ``_c_ref``/``_c_cur`` counts (the
    streaming drift watcher keeps exactly this grid as its rolling
    state and calls here per epoch — stream and batch share the
    kernel)."""
    g = (
        grid.withColumn("_n_ref", F.sum("_c_ref").over(_all()))
        .withColumn("_n_cur", F.sum("_c_cur").over(_all()))
    )
    p_ref = (F.col("_c_ref") + 0.5) / (F.col("_n_ref") + 0.5 * n_bins)
    p_cur = (F.col("_c_cur") + 0.5) / (F.col("_n_cur") + 0.5 * n_bins)
    return g.agg(
        F.max("_n_ref").cast("long").alias("n_ref"),
        F.max("_n_cur").cast("long").alias("n_cur"),
        F.round(F.sum((p_cur - p_ref) * F.log(p_cur / p_ref)), 6).alias(
            "psi"
        ),
    ).select(
        F.lit(col).alias("col_name"),
        F.lit(n_bins).cast("int").alias("n_bins"),
        "n_ref",
        "n_cur",
        "psi",
    )


def ks_distance(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    max_values: int = 1_000_000,
) -> DataFrame:
    """One-row report: (column, n_ref, n_cur, ks) — the exact
    two-sample Kolmogorov–Smirnov distance
    ``max_x |F_ref(x) − F_cur(x)|`` evaluated over the merged observed
    value grid (where the step functions can differ; between observed
    values both CDFs are flat). NULLs excluded.

    Exact integers until the end: the maximized quantity is
    ``|cum_ref·n_cur − cum_cur·n_ref|`` (BIGINT — no float CDF
    accumulation), divided once by ``n_ref·n_cur``. Each side
    collapses to its distinct-value count table first; the merge and
    the running sums are bounded by DISTINCT VALUES — which for a
    discrete/banded column is small, but for a continuous column at
    100 TB approaches the row count, and the running sum is one
    ordered pass. ``max_values`` is the same guard discipline as
    t-closeness's ``max_support``: the merged-grid size is counted
    first (two aggregate-bounded counts) and the exact statistic
    refuses to run past it with guidance to band first (KS over bands
    is the standard high-cardinality form, and banding bounds the
    error by the band width) — or to raise the cap deliberately."""
    v_grid = (
        ref.select(F.col(col).cast("double").alias("_x"))
        .filter(F.col("_x").isNotNull())
        .union(
            cur.select(F.col(col).cast("double").alias("_x")).filter(
                F.col("_x").isNotNull()
            )
        )
        .agg(F.countDistinct("_x").alias("_v"))
        .collect()[0][0]
    )
    if v_grid > max_values:
        raise ValueError(
            f"ks_distance merged grid has {v_grid} distinct {col!r} "
            f"values (> max_values={max_values}); the exact statistic "
            "runs one ordered pass over the grid. Band the column "
            "first (e.g. floor(value / width) — KS over bands bounds "
            "the error by the band width) or raise max_values "
            "deliberately."
        )
    def counts(side: DataFrame, label: str) -> DataFrame:
        return (
            side.select(F.col(col).cast("double").alias("_x"))
            .filter(F.col("_x").isNotNull())
            .groupBy("_x")
            .agg(F.count(F.lit(1)).cast("long").alias(f"_c_{label}"))
        )

    merged = counts(ref, "ref").join(
        counts(cur, "cur"), "_x", "full_outer"
    ).select(
        "_x",
        F.coalesce("_c_ref", F.lit(0)).alias("_c_ref"),
        F.coalesce("_c_cur", F.lit(0)).alias("_c_cur"),
    )
    w = Window.orderBy("_x").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    stepped = (
        merged.select(
            F.sum("_c_ref").over(w).alias("_cum_ref"),
            F.sum("_c_cur").over(w).alias("_cum_cur"),
        )
        .withColumn("_n_ref", F.max("_cum_ref").over(_all()))
        .withColumn("_n_cur", F.max("_cum_cur").over(_all()))
        .withColumn(
            # decimal(38,0) before the cross-multiplication: BIGINT
            # cums wrap silently under ANSI-off once each side passes
            # ~3e9 rows (cum·n → 9.2e18) — max_values bounds DISTINCT
            # values, not row counts. Same overflow fix as the
            # t-closeness EMD numerators.
            "_num",
            F.abs(
                F.col("_cum_ref").cast("decimal(38,0)") * F.col("_n_cur")
                - F.col("_cum_cur").cast("decimal(38,0)")
                * F.col("_n_ref")
            ),
        )
    )
    return stepped.agg(
        F.max("_n_ref").cast("long").alias("n_ref"),
        F.max("_n_cur").cast("long").alias("n_cur"),
        F.round(
            F.max("_num")
            / (F.max("_n_ref").cast("double") * F.max("_n_cur")),
            6,
        ).alias("ks"),
    ).select(F.lit(col).alias("col_name"), "n_ref", "n_cur", "ks")


def ks_distance_banded(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    width: float,
    max_values: int = 1_000_000,
) -> DataFrame:
    """One-row report: (col_name, band_width, n_ref, n_cur, ks) — the
    exact two-sample KS statistic over FLOOR-BANDED values
    (``floor(x / width) · width``): the 100 TB path for a continuous
    column, where :func:`ks_distance`'s merged grid of distinct raw
    values approaches the row count and the exact form refuses past
    ``max_values``.

    Banding is the standard high-cardinality KS form: both empirical
    CDFs are evaluated on the shared band grid, so the banded statistic
    differs from the true KS by at most the largest probability mass
    either side places strictly inside one band — shrink ``width`` to
    tighten, at the cost of grid size (still bounded by
    range / width, never by rows). Same exact-integer numerator
    discipline as the exact form (the banded values feed the identical
    kernel)."""
    if not width > 0:
        raise ValueError(f"width must be > 0 (got {width})")

    def band(side: DataFrame) -> DataFrame:
        return side.select(
            (
                F.floor(F.col(col).cast("double") / F.lit(float(width)))
                * F.lit(float(width))
            ).alias(col)
        )

    return (
        ks_distance(band(ref), band(cur), col, max_values=max_values)
        .select(
            "col_name",
            F.lit(float(width)).alias("band_width"),
            "n_ref",
            "n_cur",
            "ks",
        )
    )


def chi2_drift(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    max_values: int = 100_000,
) -> DataFrame:
    """One-row report: (column, n_ref, n_cur, n_categories, chi2) —
    Pearson's chi-square statistic of the CURRENT category counts
    against frequencies expected from the REFERENCE proportions
    (``e_i = n_cur · ref_i / n_ref``; ``χ² = Σ (o_i − e_i)²/e_i``).
    Categories absent from the reference contribute via a 0.5 Laplace
    floor on the reference count (a brand-new category is
    infinite-surprise otherwise); NULL is a category of its own (a
    NULL-rate shift is drift). Compare against the chi-square quantile
    for (categories − 1) dof, or track the raw statistic over time.

    NULL is keyed as the pair (is_null=true, '') rather than a string
    sentinel — a sentinel like ' NULL' silently merges the NULL bucket
    with a genuine category holding that exact string.

    ``max_values`` is the :func:`ks_distance` cardinality discipline:
    the totals flow through one unpartitioned window over the category
    table, which is fine for true categoricals but unbounded if a
    caller passes a high-cardinality column (an id, a free-text field).
    Cardinality is counted first (one aggregate-bounded scan of both
    sides) and the statistic refuses to run past the cap with guidance
    — bucket/band the column first, or raise the cap deliberately."""
    v_cats = (
        ref.select(F.col(col).cast("string").alias("_x"))
        .union(cur.select(F.col(col).cast("string").alias("_x")))
        .agg(F.countDistinct("_x").alias("_v"))
        .collect()[0][0]
    )
    if v_cats > max_values:
        raise ValueError(
            f"chi2_drift merged category table has {v_cats} distinct "
            f"{col!r} values (> max_values={max_values}); chi-square "
            "is a CATEGORICAL statistic and the totals run through one "
            "unpartitioned window over the category table. Bucket or "
            "band the column first (for numerics use psi_report / "
            "ks_distance_banded) or raise max_values deliberately."
        )

    def counts(side: DataFrame, label: str) -> DataFrame:
        return (
            side.select(
                F.col(col).cast("string").isNull().alias("_is_null"),
                F.coalesce(F.col(col).cast("string"), F.lit(""))
                .alias("_v"),
            )
            .groupBy("_is_null", "_v")
            .agg(F.count(F.lit(1)).cast("long").alias(f"_c_{label}"))
        )

    merged = (
        counts(ref, "ref")
        .join(counts(cur, "cur"), ["_is_null", "_v"], "full_outer")
        .select(
            F.coalesce("_c_ref", F.lit(0)).alias("_c_ref"),
            F.coalesce("_c_cur", F.lit(0)).alias("_c_cur"),
        )
        .withColumn("_n_ref", F.sum("_c_ref").over(_all()))
        .withColumn("_n_cur", F.sum("_c_cur").over(_all()))
    )
    # NULL-safe denominator: with an empty reference the per-row terms
    # go NULL (never a DIVIDE_BY_ZERO under ANSI — aggregates evaluate
    # eagerly, so the outer guard alone can't prevent it) and the outer
    # raise_error below converts the degenerate total into a loud
    # failure.
    e = (
        F.greatest(F.col("_c_ref").cast("double"), F.lit(0.5))
        * F.col("_n_cur")
        / F.when(F.col("_n_ref") > 0, F.col("_n_ref"))
    )
    # lazy loud guard (no extra driver action): an empty side has no
    # defined statistic — raise at execution instead of emitting a
    # NULL chi2 a gate could misread as "no drift" (the _checked_bounds
    # discipline, in assert-form because the category table is already
    # execution-side here). e == 0 exactly when the CURRENT side is
    # empty (hypothesis-found): NULL the term so the aggregate survives
    # ANSI mode long enough for the guard to fire.
    term = (F.col("_c_cur") - e) * (F.col("_c_cur") - e) / F.when(e > 0, e)
    chi2_expr = F.when(
        (F.max("_n_ref") > 0) & (F.max("_n_cur") > 0),
        F.round(F.sum(term), 6),
    ).otherwise(
        F.raise_error(
            F.lit(
                "chi2_drift: a side is empty (reference or current); "
                "the statistic is undefined. Check both snapshots "
                "before gating on this report."
            )
        ).cast("double")
    )
    return merged.agg(
        F.max("_n_ref").cast("long").alias("n_ref"),
        F.max("_n_cur").cast("long").alias("n_cur"),
        F.count(F.lit(1)).cast("long").alias("n_categories"),
        chi2_expr.alias("chi2"),
    ).select(
        F.lit(col).alias("col_name"), "n_ref", "n_cur", "n_categories",
        "chi2",
    )


def psi_report_many(
    ref: DataFrame,
    cur: DataFrame,
    cols: list[str],
    n_bins: int = 10,
) -> DataFrame:
    """One row per column: (col_name, n_bins, n_ref, n_cur, psi) — PSI
    for MANY numeric columns in ONE scan per side: a single min/max
    aggregation freezes every column's reference bins, then each side
    unpivots to (col_name, value) rows and bins in one pass (the
    fused-projection discipline every per-column loop here follows —
    N columns must never cost N corpus scans). Per-column semantics
    identical to :func:`psi_report` (NULLs excluded per column;
    out-of-range clamps; Laplace smoothing)."""
    if not cols:
        raise ValueError("cols must be non-empty")
    # ONE min/max scan freezes every column's bins; the collected row
    # doubles as the degenerate-reference guard (same loud refusal as
    # _checked_bounds — an all-NULL reference column would silently
    # drop every current-side value and read "stable").
    brow = ref.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"_mx_{c}") for c in cols],
    ).collect()[0]
    bad = [c for c in cols if brow[f"_mn_{c}"] is None]
    if bad:
        raise ValueError(
            f"drift reference side has no non-NULL values for {bad}; "
            "reference bins are undefined for those columns. Check "
            "the reference snapshot before gating on this report."
        )
    # long-form bounds: (col_name, _mn, _mx) — literal one-row-per-col
    # frame, broadcast everywhere
    bounds_long = ref.sparkSession.createDataFrame(
        [
            (c, float(brow[f"_mn_{c}"]), float(brow[f"_mx_{c}"]))
            for c in cols
        ],
        "col_name string, _mn double, _mx double",
    )

    def long_form(side: DataFrame) -> DataFrame:
        return side.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("col_name"),
                            F.col(c).cast("double").alias("_x"),
                        )
                        for c in cols
                    ]
                )
            ).alias("_v")
        ).select("_v.col_name", "_v._x").filter(F.col("_x").isNotNull())

    def binned(side: DataFrame, label: str) -> DataFrame:
        return (
            long_form(side)
            .join(F.broadcast(bounds_long), "col_name")
            .select(
                "col_name",
                F.when(F.col("_mx") == F.col("_mn"), F.lit(0))
                .otherwise(
                    F.least(
                        F.lit(n_bins - 1),
                        F.greatest(
                            F.lit(0),
                            F.floor(
                                (F.col("_x") - F.col("_mn"))
                                * n_bins
                                / (F.col("_mx") - F.col("_mn"))
                            ).cast("int"),
                        ),
                    )
                )
                .alias("_bin"),
            )
            .groupBy("col_name", "_bin")
            .agg(F.count(F.lit(1)).cast("long").alias(f"_c_{label}"))
        )

    spark = ref.sparkSession
    grid = (
        spark.range(n_bins)
        .select(F.col("id").cast("int").alias("_bin"))
        .crossJoin(
            spark.createDataFrame(
                [(c,) for c in cols], "col_name string"
            )
        )
        .join(binned(ref, "ref"), ["col_name", "_bin"], "left")
        .join(binned(cur, "cur"), ["col_name", "_bin"], "left")
        .select(
            "col_name",
            "_bin",
            F.coalesce("_c_ref", F.lit(0)).alias("_c_ref"),
            F.coalesce("_c_cur", F.lit(0)).alias("_c_cur"),
        )
    )
    wc = Window.partitionBy("col_name")
    g = (
        grid.withColumn("_n_ref", F.sum("_c_ref").over(wc))
        .withColumn("_n_cur", F.sum("_c_cur").over(wc))
    )
    p_ref = (F.col("_c_ref") + 0.5) / (F.col("_n_ref") + 0.5 * n_bins)
    p_cur = (F.col("_c_cur") + 0.5) / (F.col("_n_cur") + 0.5 * n_bins)
    return (
        g.groupBy("col_name")
        .agg(
            F.max("_n_ref").cast("long").alias("n_ref"),
            F.max("_n_cur").cast("long").alias("n_cur"),
            F.round(
                F.sum((p_cur - p_ref) * F.log(p_cur / p_ref)), 6
            ).alias("psi"),
        )
        .select(
            "col_name",
            F.lit(n_bins).cast("int").alias("n_bins"),
            "n_ref",
            "n_cur",
            "psi",
        )
    )


def js_divergence(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    n_bins: int = 10,
) -> DataFrame:
    """One-row report: (col_name, n_bins, n_ref, n_cur, js) — the
    Jensen–Shannon divergence between the two snapshots over the same
    frozen reference-range bins as :func:`psi_report` (same Laplace
    smoothing, clamping, NULL exclusion). JS complements PSI: it is
    symmetric, always finite, and bounded in [0, ln 2] — a calibrated
    scale across columns where PSI's magnitude depends on how extreme
    the log-ratios get. Natural-log form; divide by ln 2 for bits."""
    r = ref.select(F.col(col).cast("double").alias("_x")).filter(
        F.col("_x").isNotNull()
    )
    c = cur.select(F.col(col).cast("double").alias("_x")).filter(
        F.col("_x").isNotNull()
    )
    bounds = _checked_bounds(r, col)
    grid = (
        ref.sparkSession.range(n_bins)
        .select(F.col("id").cast("int").alias("_bin"))
        .join(binned_counts(r, bounds, n_bins, "ref"), "_bin", "left")
        .join(binned_counts(c, bounds, n_bins, "cur"), "_bin", "left")
        .select(
            F.coalesce("_c_ref", F.lit(0)).alias("_c_ref"),
            F.coalesce("_c_cur", F.lit(0)).alias("_c_cur"),
        )
        .withColumn("_n_ref", F.sum("_c_ref").over(_all()))
        .withColumn("_n_cur", F.sum("_c_cur").over(_all()))
    )
    p = (F.col("_c_ref") + 0.5) / (F.col("_n_ref") + 0.5 * n_bins)
    q = (F.col("_c_cur") + 0.5) / (F.col("_n_cur") + 0.5 * n_bins)
    m = (p + q) / 2
    return grid.agg(
        F.max("_n_ref").cast("long").alias("n_ref"),
        F.max("_n_cur").cast("long").alias("n_cur"),
        F.round(
            F.sum(p * F.log(p / m) + q * F.log(q / m)) / 2, 6
        ).alias("js"),
    ).select(
        F.lit(col).alias("col_name"),
        F.lit(n_bins).cast("int").alias("n_bins"),
        "n_ref",
        "n_cur",
        "js",
    )


def chi2_drift_many(
    ref: DataFrame,
    cur: DataFrame,
    cols: list[str],
    max_values: int = 100_000,
) -> DataFrame:
    """One row per column: (col_name, n_ref, n_cur, n_categories,
    chi2) — the chi-square categorical drift of MANY columns in ONE
    scan per side (the fused-projection discipline :func:`psi_report_many`
    applies to the numeric columns): each side unpivots to
    (col_name, is_null, value) rows and aggregates once; the per-column
    semantics are exactly :func:`chi2_drift` (collision-proof NULL
    keying, 0.5 Laplace floor for unseen categories, loud failure on
    an empty reference).

    ``max_values`` caps PER-COLUMN category cardinality via
    ``approx_count_distinct`` (rsd 1%): N EXACT multi-distincts in one
    agg plan an N-way Expand — every ref+cur row replicated
    ``len(cols)`` times, exactly the row-multiplication the
    candidate_keys guard refuses past 45 combos — while N HLL
    accumulators share ONE un-expanded scan pair. A cost guard needs
    no exactness: the refusal threshold carries a 2% tolerance
    (refuse only past ``max_values * 1.02``) so a column genuinely
    UNDER the cap cannot be spuriously refused by estimator noise
    (rsd 1% ⇒ ±3σ ≈ 3%; a column within the tolerance band may land
    on either side, and either outcome is safe — the chi2 statistic
    itself stays exact; the cap only bounds the full-outer join's
    category fan). The refusal names every offending column with its
    estimate — the :func:`ks_distance` loud-refusal discipline
    applied to the fused form."""
    if not cols:
        raise ValueError("cols must be non-empty")
    # one fused cardinality scan per side (no per-column loop, no
    # Expand): approximate distinct count for EVERY column before the
    # real work runs
    crow = (
        ref.select(
            *[F.col(c).cast("string").alias(c) for c in cols]
        )
        .union(
            cur.select(*[F.col(c).cast("string").alias(c) for c in cols])
        )
        .agg(
            *[
                F.approx_count_distinct(F.col(c), 0.01).alias(f"_v_{c}")
                for c in cols
            ]
        )
        .collect()[0]
    )
    # 2% estimator-noise tolerance: an under-cap column must never be
    # refused by HLL jitter alone (advice r13)
    over = {
        c: crow[f"_v_{c}"]
        for c in cols
        if crow[f"_v_{c}"] > max_values * 1.02
    }
    if over:
        raise ValueError(
            f"chi2_drift_many: columns over max_values={max_values} "
            f"distinct categories (approx_count_distinct, rsd 1%): "
            f"{over}; chi-square is a CATEGORICAL "
            "statistic — bucket or band these columns first (for "
            "numerics use psi_report_many / ks_distance_banded) or "
            "raise max_values deliberately."
        )

    def counts(side: DataFrame, label: str) -> DataFrame:
        long = side.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("col_name"),
                            F.col(c).cast("string").isNull()
                            .alias("_is_null"),
                            F.coalesce(F.col(c).cast("string"), F.lit(""))
                            .alias("_v"),
                        )
                        for c in cols
                    ]
                )
            ).alias("_e")
        ).select("_e.*")
        return long.groupBy("col_name", "_is_null", "_v").agg(
            F.count(F.lit(1)).cast("long").alias(f"_c_{label}")
        )

    merged = (
        counts(ref, "ref")
        .join(counts(cur, "cur"), ["col_name", "_is_null", "_v"],
              "full_outer")
        .select(
            "col_name",
            F.coalesce("_c_ref", F.lit(0)).alias("_c_ref"),
            F.coalesce("_c_cur", F.lit(0)).alias("_c_cur"),
        )
    )
    wc = Window.partitionBy("col_name")
    merged = (
        merged.withColumn("_n_ref", F.sum("_c_ref").over(wc))
        .withColumn("_n_cur", F.sum("_c_cur").over(wc))
    )
    e = (
        F.greatest(F.col("_c_ref").cast("double"), F.lit(0.5))
        * F.col("_n_cur")
        / F.when(F.col("_n_ref") > 0, F.col("_n_ref"))
    )
    term = (F.col("_c_cur") - e) * (F.col("_c_cur") - e) / F.when(e > 0, e)
    chi2_expr = F.when(
        (F.max("_n_ref") > 0) & (F.max("_n_cur") > 0),
        F.round(F.sum(term), 6),
    ).otherwise(
        F.raise_error(
            F.lit(
                "chi2_drift_many: a column is empty on one side "
                "(reference or current); the statistic is undefined. "
                "Check both snapshots before gating on this report."
            )
        ).cast("double")
    )
    return merged.groupBy("col_name").agg(
        F.max("_n_ref").cast("long").alias("n_ref"),
        F.max("_n_cur").cast("long").alias("n_cur"),
        F.count(F.lit(1)).cast("long").alias("n_categories"),
        chi2_expr.alias("chi2"),
    )


def psi_timeline(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    ts_sec_col: str,
    width: int,
    n_bins: int = 10,
    max_buckets: int = 1_000_000,
) -> DataFrame:
    """(col_name, bucket, n_bins, n_ref, n_cur, psi) — the PSI of each
    ``width``-second bucket of ``cur`` against the FROZEN reference
    bins: the "WHEN did the distribution move" table between the
    two-snapshot :func:`psi_report` and the streaming
    ``watch_table_drift``. Bins and bounds freeze from the reference
    exactly as in :func:`psi_report` (same loud empty-reference guard,
    same Laplace smoothing and edge-bin clamping); the current side
    collapses to (bucket, bin) grain in ONE scan, so every downstream
    row count is buckets x n_bins — never raw events.

    Rising psi across buckets localizes drift onset to a time window;
    gate on the latest bucket, chart the rest.

    The bucket spine is DENSE between the first and last observed
    bucket: a bucket with ZERO current rows — a total data outage, the
    strongest drift signal of all — emits an ``n_cur=0`` row (psi NULL;
    0 rows have no distribution) instead of silently vanishing from
    the timeline (advice r11). Refuses loudly past ``max_buckets``
    spine rows — the gapfill counted-guard discipline; re-bucket
    coarser rather than explode."""
    if width <= 0:
        raise ValueError(f"width must be positive seconds (got {width})")
    r = ref.select(F.col(col).cast("double").alias("_x")).filter(
        F.col("_x").isNotNull()
    )
    bounds = _checked_bounds(r, col)
    rb = binned_counts(r, bounds, n_bins, "ref")
    t = F.col(ts_sec_col).cast("long")
    c = cur.select(
        (t - (((t % width) + width) % width)).alias("_bucket"),
        F.col(col).cast("double").alias("_x"),
    ).filter(F.col("_x").isNotNull())
    cb = binned_counts(c, bounds, n_bins, "cur", extra_keys=["_bucket"])
    # Materialize the bucket-bounded aggregate once so the spine-bounds
    # read and the grid join share it — the raw current stream is
    # scanned exactly once (the gapfill checkpoint discipline).
    cb = cb.localCheckpoint(eager=True)
    # DENSE spine between first and last observed bucket: an empty
    # bucket emits an n_cur=0 row (outage == drift signal) instead of
    # vanishing. The collected bounds are two scalars off the
    # checkpointed aggregate, doubling as the counted loud-refusal
    # guard.
    brow = cb.agg(
        F.min("_bucket").alias("_mn"), F.max("_bucket").alias("_mx")
    ).collect()[0]
    spark_ = ref.sparkSession
    if brow["_mn"] is None:
        # empty current side: no observed buckets, empty timeline
        spine = cb.select(
            "_bucket", F.lit(0).alias("_bin")
        ).limit(0)
    else:
        n_spine = (brow["_mx"] - brow["_mn"]) // width + 1
        if n_spine > max_buckets:
            raise ValueError(
                f"psi_timeline spine spans {n_spine} buckets "
                f"(> max_buckets={max_buckets}); widen `width` or "
                "raise the cap deliberately."
            )
        spine = (
            spark_.range(int(n_spine))
            .select(
                (F.lit(int(brow["_mn"])) + F.col("id") * width)
                .cast("long")
                .alias("_bucket")
            )
            .select(
                "_bucket",
                F.explode(
                    F.sequence(F.lit(0), F.lit(n_bins - 1))
                ).alias("_bin"),
            )
        )
    grid = (
        spine.join(cb, ["_bucket", "_bin"], "left")
        .join(F.broadcast(rb), "_bin", "left")
        .select(
            "_bucket",
            "_bin",
            F.coalesce("_c_ref", F.lit(0)).alias("_c_ref"),
            F.coalesce("_c_cur", F.lit(0)).alias("_c_cur"),
        )
    )
    wb = Window.partitionBy("_bucket")
    g = grid.withColumn("_n_ref", F.sum("_c_ref").over(wb)).withColumn(
        "_n_cur", F.sum("_c_cur").over(wb)
    )
    p_ref = (F.col("_c_ref") + 0.5) / (F.col("_n_ref") + 0.5 * n_bins)
    p_cur = (F.col("_c_cur") + 0.5) / (F.col("_n_cur") + 0.5 * n_bins)
    return (
        g.groupBy("_bucket")
        .agg(
            F.max("_n_ref").cast("long").alias("n_ref"),
            F.max("_n_cur").cast("long").alias("n_cur"),
            # an outage bucket (n_cur=0) has NO distribution: psi NULL
            # with the zero count alongside — never a smoothed
            # uniform-vs-ref number a gate could misread as measured
            F.when(
                F.max("_n_cur") > 0,
                F.round(
                    F.sum((p_cur - p_ref) * F.log(p_cur / p_ref)), 6
                ),
            ).alias("psi"),
        )
        .select(
            F.lit(col).alias("col_name"),
            F.col("_bucket").alias("bucket"),
            F.lit(n_bins).cast("int").alias("n_bins"),
            "n_ref",
            "n_cur",
            "psi",
        )
    )
