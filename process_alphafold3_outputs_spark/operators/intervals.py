"""Chain-interval offsets + the matrix-slice count-threshold kernel.

O16-O19 (process_af3_outputs.py:185-224): per-job prefix sums of chain
token lengths give each chain a global token interval [start, end);
the core query counts, for every partner token (matrix column), how
many POI tokens (matrix rows) have PAE strictly below the cutoff, and
keeps partner tokens with count >= min_residues.

Spark shape (SURVEY §2 O18): long-form ``pae_long`` is filtered by
``pae < cutoff`` FIRST (predicate pushdown into the parquet scan at
scale), then range-joined against the tiny per-job interval table
(broadcast — KBs even at 10^8 jobs per partition batch), then a single
hash aggregation keyed (job, aligned_token). One shuffle total.
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
    width_source: str = "pae",
) -> DataFrame:
    """Partner residues with >= min_residues POI tokens under the PAE
    cutoff (O17-O19, :197-224). Returns (job, partner_res) with
    ``partner_res`` 1-based chain-local (:222).

    ``jobs`` optionally restricts to screened binders (semi-join).

    ``width_source``: where the O17 bounds guard gets the matrix width.
    ``"pae"`` (default) measures the actual matrix via a groupBy over
    ``pae_long`` — exact reference parity, but ONE EXTRA FULL PASS over
    the biggest table. ``"chains"`` derives width as Σ token_length —
    free (the interval table is already built), and equivalent whenever
    the CIF token count matches the matrix (true for well-formed AF3
    output); at 100 TB this halves the pae_long I/O.
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

    hits = (
        pae_long.filter(F.col("pae") < F.lit(float(params.max_pae_cutoff)))
        .join(F.broadcast(bounds), "job")
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
