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


# --------------------------------------------------------------------------
# count-min sketch (Cormode & Muthukrishnan 2005) — hand-rolled as a
# (d × w) count table so it IS a DataFrame: mergeable by cell-wise sum,
# md5-derived row hashes reproducible in ANSI SQL (unlike the opaque
# binary sketches above, this family carries a full DuckDB oracle).
# --------------------------------------------------------------------------


def _cms_bucket(j, value, w: int, seed: str):
    """Row-j bucket of ``value``: top-60-bit md5 of 'seed-j:value' mod w
    — the same hash shape as the Bloom bitmap (bit-reproducible in
    DuckDB)."""
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(seed + "-"),
                        j.cast("string"),
                        F.lit(":"),
                        value,
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % w
    )


def cms_table(
    df: DataFrame,
    value_col: str,
    w: int = 256,
    d: int = 4,
    seed: str = "cms-v1",
) -> DataFrame:
    """(j, bucket, cnt) — a count-min sketch of ``value_col`` as a
    table of at most d·w cells (fixed size regardless of corpus or
    vocabulary). Each occurrence increments one bucket per hash row;
    estimates read the MIN across rows (always an OVERestimate —
    collisions only add).

    Scale shape: the explode multiplies rows ×d, but the aggregation
    keys on (j, bucket) with ≤ d·w groups — map-side combine collapses
    each partition to sketch size before the shuffle, so shuffle bytes
    are O(partitions · d·w), independent of data volume. Sketches from
    different shipments MERGE by cell-wise sum (:func:`merge_cms`) —
    profile rollups never rescan history.

    The input is projected to the value column and ``spread`` (local-
    mode only) BEFORE the ×d md5 explode: the hash work is the whole
    cost of the build, and a single-row-group parquet scan would
    otherwise run it on one core (keyless round-robin, not hash-by-
    value — a heavy-hitter value must not pin its hashing to one
    task). Counts are partitioning-invariant, so the result is
    bit-identical."""
    from .util import spread

    rows = spread(df.select(F.col(value_col).cast("string").alias("_v"))).select(
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("j"),
        F.col("_v"),
    )
    return (
        rows.select(
            "j", _cms_bucket(F.col("j"), F.col("_v"), w, seed).alias("bucket")
        )
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_cms(*tables: DataFrame) -> DataFrame:
    """Cell-wise sum of CMS tables built with the SAME (w, d, seed) —
    exactly the sketch of the concatenated inputs (pinned by pytest)."""
    out = tables[0]
    for t in tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("j", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    cms: DataFrame,
    items: DataFrame,
    value_col: str,
    w: int = 256,
    d: int = 4,
    seed: str = "cms-v1",
) -> DataFrame:
    """(item, est_cnt) — CMS frequency estimate for each row of
    ``items``: min over the d hash rows of the item's cell (absent
    cells count 0). The sketch side is at most d·w rows — broadcast;
    the probe side explodes ×d only."""
    probes = items.select(
        F.col(value_col).cast("string").alias("item"),
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("j"),
    ).withColumn(
        "bucket", _cms_bucket(F.col("j"), F.col("item"), w, seed)
    )
    return (
        probes.join(F.broadcast(cms), ["j", "bucket"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce("cnt", F.lit(0).cast("long"))).alias("est_cnt"))
    )


def histogram_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 64,
    qs: tuple[float, ...] = (0.5, 0.9),
) -> DataFrame:
    """(group, q, approx) — quantiles from a FIXED-BIN histogram
    sketch: the deterministic member of the sketch family (HLL and
    percentile_approx have no bit-exact cross-engine oracle; this one
    does — every step is integer bin arithmetic + one linear
    interpolation, reproduced exactly by the DuckDB oracle).

    Sketch shape: one (group, bin) count table — ``n_bins`` rows per
    group cross the shuffle regardless of data size, partial counts
    combine map-side, and histograms from different shipments MERGE by
    adding bin counts (mergeability pinned by pytest). Error bound:
    one bin width = (hi-lo)/n_bins, the classic fixed-histogram
    trade-off; values outside [lo, hi) clamp into the edge bins.

    Estimator: for each q, find the first bin where the cumulative
    count reaches ``q * total`` and interpolate linearly inside it
    (left edge + fraction-of-bin * width). 6-dp rounding defuses libm
    last-ulp drift, same policy as the similarity rows.

    NULL values are excluded BEFORE binning: floor(NULL) would
    propagate into a NULL bin that still counts toward ``total``
    (skewing every estimate), and NULL bins sort NULLS FIRST in Spark
    but NULLS LAST in DuckDB — a latent cross-engine parity break.
    Quantiles are statistics of the present values, same contract as
    percentile_cont."""
    width = (hi - lo) / n_bins
    bin_col = F.least(
        F.greatest(
            F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)), F.lit(0)
        ),
        F.lit(n_bins - 1),
    ).cast("int")
    hist = df.filter(F.col(value_col).isNotNull()).groupBy(
        F.col(group_col), bin_col.alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return histogram_sketch_quantiles(hist, group_col, lo, hi, n_bins, qs)


def histogram_sketch_quantiles(
    hist: DataFrame,
    group_col: str,
    lo: float,
    hi: float,
    n_bins: int,
    qs: tuple[float, ...] = (0.5, 0.9),
) -> DataFrame:
    """Quantile read-off over a prebuilt/merged (group, bin, cnt)
    histogram table — the merge path: sum bin counts across shipments
    first (``groupBy(group, bin).sum(cnt)``), then read quantiles off
    the merged sketch without touching any raw data."""
    from pyspark.sql import Window

    width = (hi - lo) / n_bins
    w = (
        Window.partitionBy(group_col)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy(group_col)
    cum = (
        hist.withColumn("cum", F.sum("cnt").over(w))
        .withColumn("total", F.sum("cnt").over(wt))
    )
    out = None
    for q in qs:
        target = F.lit(float(q)) * F.col("total")
        # first bin whose cumulative reaches the target
        hit = cum.filter(F.col("cum") >= target).groupBy(group_col).agg(
            F.min_by(
                F.struct("bin", "cnt", "cum", "total"), F.col("bin")
            ).alias("_h")
        )
        est = hit.select(
            F.col(group_col),
            F.lit(float(q)).alias("q"),
            F.round(
                F.lit(lo)
                + (
                    F.col("_h.bin")
                    + (
                        F.lit(float(q)) * F.col("_h.total")
                        - (F.col("_h.cum") - F.col("_h.cnt"))
                    )
                    / F.col("_h.cnt")
                )
                * F.lit(width),
                6,
            ).alias("approx"),
        )
        out = est if out is None else out.unionByName(est)
    return out


def hll_deterministic(
    df: DataFrame,
    group_col: str,
    value_col: str,
    m: int = 256,
    seed: str = "hll-v1",
) -> DataFrame:
    """(group, raw_est, n_empty) — HyperLogLog distinct estimate built
    from scratch on DETERMINISTIC md5 hashing, the oracle-checkable
    twin of :func:`approx_distinct_by` (DataSketches HLL estimates
    cannot be reproduced by another engine; this one is bit-exact in
    ANSI SQL, so the approx-distinct family gets a hard correctness
    row, not just an error-band differential).

    Construction (classic Flajolet HLL, m power-of-two registers):
    60-bit md5 hash → low bits pick the register, the remaining
    W = 60 - log2(m) bits' leading-zero count + 1 is rho; each register
    keeps max(rho) — ONE (group, register)-keyed aggregation with
    map-side combine, m rows per group across the shuffle, mergeable
    by max like any HLL. The harmonic sum is computed in INTEGER
    arithmetic (sum of 2^(53-rho) via shiftleft — exact and
    order-independent, where summing 2^-rho doubles would round by
    shuffle order), then one double division.

    ``raw_est`` is the uncorrected estimate (alpha_m·m²/Z);
    ``n_empty`` ships alongside so consumers can apply linear-counting
    small-range correction (m·ln(m/V) uses libm ln — deliberately NOT
    computed here, where cross-engine ulp drift would break the
    oracle)."""
    filled, max_rho, scale = _hll_filled_registers(
        df, group_col, value_col, m, seed
    )
    z = filled.groupBy("g").agg(
        F.sum(F.expr(f"shiftleft(1L, {max_rho} - M)")).alias("_z"),
        F.sum(F.when(F.col("M") == 0, 1).otherwise(0)).cast("long").alias(
            "n_empty"
        ),
    )
    return z.select(
        F.col("g").alias(group_col),
        F.round(F.lit(scale) / F.col("_z"), 3).alias("raw_est"),
        "n_empty",
    )


def _hll_filled_registers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    m: int,
    seed: str,
):
    """(filled (g, reg, M) register table, max_rho, harmonic scale) —
    the shared construction behind :func:`hll_deterministic` and
    :func:`hll_overlap`; registers are max-mergeable."""
    if m & (m - 1) or m < 16:
        raise ValueError(f"m must be a power of two >= 16, got {m}")
    wbits = 60 - m.bit_length() + 1  # log2(m) for power-of-two m
    max_rho = wbits + 1
    alpha = 0.7213 / (1 + 1.079 / m)
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(seed + ":"), F.col(value_col).cast("string")
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    # deliberately NOT spread: the (g, reg) register-max aggregate
    # combines map-side off the scan and the paired in-session A/B read
    # the pre-repartition as a loss on both HLL driver rows (distinct
    # 2.05 s with vs 1.70 s without; overlap 2.27 vs 1.93) — unlike the
    # CMS build, whose ×d explode does win from spreading.
    hashed = df.select(F.col(group_col).alias("g"), F.col(value_col)).select(
        "g", h.alias("_h")
    )
    rho = F.when(F.col("_w") == 0, F.lit(max_rho)).otherwise(
        F.lit(wbits) - F.length(F.bin("_w")) + 1
    )
    mx = (
        hashed.select(
            "g",
            (F.col("_h") % m).alias("reg"),
            # integer div, NOT double division: _h has 60 bits and a
            # double round-trip would corrupt the low bits above 2^53
            F.expr(f"_h div {m}").alias("_w"),
        )
        .withColumn("rho", rho)
        .groupBy("g", "reg")
        .agg(F.max("rho").alias("M"))
    )
    regs = (
        df.select(F.col(group_col).alias("g"))
        .distinct()
        .select("g", F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("reg"))
    )
    filled = regs.join(mx, ["g", "reg"], "left").withColumn(
        "M", F.coalesce("M", F.lit(0))
    )
    return filled, max_rho, float(alpha * m * m * (1 << max_rho))


def hll_overlap(
    df: DataFrame,
    group_col: str,
    value_col: str,
    m: int = 256,
    seed: str = "hll-v1",
) -> DataFrame:
    """(group_a, group_b, est_a, est_b, est_union, est_overlap) — the
    pairwise distinct-value OVERLAP matrix between groups, by
    inclusion–exclusion on max-merged HLL registers
    (``|A∩B| ≈ est(A) + est(B) − est(A∪B)``; the union sketch is the
    register-wise max — HLL's defining mergeability). This is the
    cross-crawl / cross-source vocabulary-overlap diagnostic that is
    unpayable exactly at 100 TB (an exact pairwise distinct-intersect
    is k² corpus-sized set operations) but costs k²·m sketch rows
    here, with the corpus read ONCE for the register table.

    Same deterministic md5 construction and exact integer harmonic
    sums as :func:`hll_deterministic`, so every estimate reproduces
    bit-for-bit in ANSI SQL. Pairs are emitted once (group_a <
    group_b)."""
    filled, max_rho, scale = _hll_filled_registers(
        df, group_col, value_col, m, seed
    )
    zs = filled.groupBy("g").agg(
        F.sum(F.expr(f"shiftleft(1L, {max_rho} - M)")).alias("_z")
    )
    a = filled.select(F.col("g").alias("_ga"), "reg", F.col("M").alias("_Ma"))
    b = filled.select(F.col("g").alias("_gb"), "reg", F.col("M").alias("_Mb"))
    zu = (
        a.join(b, "reg")
        .filter(F.col("_ga") < F.col("_gb"))
        .groupBy("_ga", "_gb")
        .agg(
            F.sum(
                F.expr(f"shiftleft(1L, {max_rho} - greatest(_Ma, _Mb))")
            ).alias("_zu")
        )
    )
    ea = F.round(F.lit(scale) / F.col("_za"), 3)
    eb = F.round(F.lit(scale) / F.col("_zb"), 3)
    eu = F.round(F.lit(scale) / F.col("_zu"), 3)
    return (
        zu.join(zs.select(F.col("g").alias("_ga"), F.col("_z").alias("_za")), "_ga")
        .join(zs.select(F.col("g").alias("_gb"), F.col("_z").alias("_zb")), "_gb")
        .select(
            F.col("_ga").alias("group_a"),
            F.col("_gb").alias("group_b"),
            ea.alias("est_a"),
            eb.alias("est_b"),
            eu.alias("est_union"),
            # clamp at 0: near-disjoint groups can estimate a small
            # NEGATIVE intersection from sketch noise (est_a + est_b <
            # est_union); a negative overlap is never meaningful, so
            # floor it — mirrored in the SQL oracle for parity
            F.round(F.greatest(ea + eb - eu, F.lit(0.0)), 3).alias(
                "est_overlap"
            ),
        )
    )


def cms_join_size(
    cms_a: DataFrame, cms_b: DataFrame, d: int = 4
) -> DataFrame:
    """(est_join_size) — equi-join cardinality estimate
    ``|A ⋈ B| = Σ_v f_A(v)·f_B(v)`` by count-min INNER PRODUCT
    (Cormode & Muthukrishnan 2005, §4.2): per hash row, dot the two
    sketches' cells and take the MIN across rows — always an
    OVERestimate (collisions only add cross terms). This is the
    pre-flight the optimizer-less world needs at 100 TB: both sides'
    sketches are d·w-cell tables built in one pass each (and mergeable
    across shipments), so "how big would this join be?" costs sketch
    arithmetic instead of the join.

    Both sketches must share (w, d, seed); pass the same ``d`` here.
    Exact integer arithmetic throughout — bit-reproducible in ANSI SQL.

    The hash-row axis is generated from ``sequence(0, d-1)`` rather
    than from the sketches' own rows so that an EMPTY input sketch
    (empty source table) estimates 0 instead of propagating NULL —
    matching the SQL oracle's seeds-driven form."""
    ip = (
        cms_a.select("j", "bucket", F.col("cnt").alias("_ca"))
        .join(
            cms_b.select("j", "bucket", F.col("cnt").alias("_cb")),
            ["j", "bucket"],
        )
        .groupBy("j")
        .agg(F.sum(F.col("_ca") * F.col("_cb")).alias("_ip"))
    )
    js = cms_a.sparkSession.range(d).select(
        F.col("id").cast("int").alias("j")
    )
    return js.join(ip, "j", "left").agg(
        F.coalesce(
            F.min(F.coalesce("_ip", F.lit(0).cast("long"))),
            F.lit(0).cast("long"),
        ).alias("est_join_size")
    )
