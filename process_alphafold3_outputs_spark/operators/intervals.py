"""Chain-interval offsets + the matrix-slice count-threshold kernel.

O16-O19 (process_af3_outputs.py:185-224): per-job prefix sums of chain
token lengths give each chain a global token interval [start, end);
the core query counts, for every partner token (matrix column), how
many POI tokens (matrix rows) have PAE strictly below the cutoff, and
keeps partner tokens with count >= min_residues.

Spark shape (SURVEY §2 O18): long-form ``pae_long`` is filtered by
``pae < cutoff`` FIRST (predicate pushdown into the parquet scan at
scale), then range-joined against the per-job interval table, then a
single hash aggregation keyed (job, aligned_token).

Scale note on the interval join: ``bounds`` has ONE ROW PER JOB, so it
grows linearly with the corpus (10^8 jobs × ~50 B ≈ 5 GB) — far past
any sane broadcast threshold. The join therefore carries NO broadcast
hint: both sides are keyed by ``job``, so AQE picks a shuffle hash
join (skew-safe) at scale and still auto-broadcasts when the screened
job list is genuinely small (the common case after a selective
screen). Forcing the broadcast was a driver-OOM at 100× — see
VERDICT r1 "What's wrong #1".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..params import ScreenParams


def chain_intervals(chains: DataFrame) -> DataFrame:
    """Prefix-sum offsets (O16, :201-204): start = sum of token_length of
    preceding chains in chain_index order; end = start + token_length."""
    w = (
        Window.partitionBy("job")
        .orderBy("chain_index")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return chains.select(
        "job",
        "chain_id",
        "chain_index",
        "token_length",
        F.coalesce(F.sum("token_length").over(w), F.lit(0)).alias("start"),
    ).withColumn("end", F.col("start") + F.col("token_length"))


def identify_interacting_residues(
    pae_long: DataFrame,
    chains: DataFrame,
    params: ScreenParams,
    jobs: DataFrame | None = None,
    width_source: str = "chains",
) -> DataFrame:
    """Partner residues with >= min_residues POI tokens under the PAE
    cutoff (O17-O19, :197-224). Returns (job, partner_res) with
    ``partner_res`` 1-based chain-local (:222).

    ``jobs`` optionally restricts to screened binders (semi-join).

    ``width_source``: where the O17 bounds guard gets the matrix width.
    ``"chains"`` (default) derives width as Σ token_length — free (the
    interval table is already built), and equivalent whenever the CIF
    token count matches the matrix (true for well-formed AF3 output);
    at 100 TB this halves the pae_long I/O. ``"pae"`` measures the
    actual matrix via a groupBy over ``pae_long`` — exact reference
    parity even for truncated/malformed matrices, at the cost of ONE
    EXTRA FULL PASS over the biggest table (kept for the malformed-
    width parity test; see tests/test_pipeline.py).

    ``min_residues_cutoff <= 0`` short-circuits to "every in-range
    partner token": the reference computes ``sum(slice < cutoff, axis=0)
    >= min_residues``, which is vacuously true for every partner column
    when min_residues <= 0 — a hit-based groupBy would wrongly drop
    columns with zero sub-cutoff entries.
    """
    iv = chain_intervals(chains)
    poi = iv.filter(F.col("chain_id") == params.poi_chain).select(
        "job", F.col("start").alias("poi_start"), F.col("end").alias("poi_end")
    )
    partner = iv.filter(F.col("chain_id") == params.partner_chain).select(
        "job",
        F.col("start").alias("partner_start"),
        F.col("end").alias("partner_end"),
    )
    # Bounds guard (O17, :209-211): the reference checks only the PARTNER
    # slice against the matrix width (start_partner >= width or
    # end_partner > width ⇒ reject); the POI slice is unchecked.
    if width_source == "chains":
        width = iv.groupBy("job").agg(
            F.sum("token_length").alias("matrix_width")
        )
    else:
        width = pae_long.groupBy("job").agg(
            (F.max("aligned_token") + 1).alias("matrix_width")
        )
    bounds = (
        poi.join(partner, "job")
        .join(width, "job")
        .filter(
            (F.col("partner_start") < F.col("matrix_width"))
            & (F.col("partner_end") <= F.col("matrix_width"))
        )
        .select("job", "poi_start", "poi_end", "partner_start", "partner_end")
    )
    if jobs is not None:
        bounds = bounds.join(jobs.select("job"), "job", "left_semi")

    if int(params.min_residues_cutoff) <= 0:
        # Reference parity: sum(pae_slice < cutoff, axis=0) >= min_res
        # is always true when min_res <= 0 — every in-range partner
        # token survives, regardless of PAE content. But a job whose PAE
        # matrix is missing/unparseable is still SKIPPED by the reference
        # (extract_pae_data failure drops the job before the slice), and
        # width_source="chains" never consults pae_long — so guard with a
        # cheap aggregated semi-join on the jobs that do have a matrix.
        if width_source == "chains":
            bounds = bounds.join(
                pae_long.select("job").distinct(), "job", "left_semi"
            )
        return (
            bounds.filter(F.col("partner_end") > F.col("partner_start"))
            .select(
                "job",
                F.explode(
                    F.sequence(
                        F.lit(1), F.col("partner_end") - F.col("partner_start")
                    )
                ).alias("partner_res"),
            )
        )

    # No broadcast hint: bounds is one-row-per-job (linear in corpus
    # size) — AQE broadcasts it only when actually small.
    hits = (
        pae_long.filter(F.col("pae") < F.lit(float(params.max_pae_cutoff)))
        .join(bounds, "job")
        .filter(
            F.col("scored_token").between(F.col("poi_start"), F.col("poi_end") - 1)
            & F.col("aligned_token").between(
                F.col("partner_start"), F.col("partner_end") - 1
            )
        )
    )
    return (
        hits.groupBy("job", "aligned_token", "partner_start")
        .agg(F.count(F.lit(1)).alias("n_poi_tokens"))
        .filter(F.col("n_poi_tokens") >= F.lit(int(params.min_residues_cutoff)))
        # Index rebase (O19, :222): global token -> 1-based chain-local id.
        .select(
            "job",
            (F.col("aligned_token") - F.col("partner_start") + 1).alias("partner_res"),
        )
    )
