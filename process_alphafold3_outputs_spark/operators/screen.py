"""Binder screen — O5-O8 (process_af3_outputs.py:66-105).

Input: ``predictions`` DataFrame, one row per AF3 job:
  (job STRING, iptm DOUBLE?, ptm DOUBLE?, chain_pair_pae_min ARRAY<ARRAY<DOUBLE>>?)

Semantics reproduced exactly:
  - missing iptm/ptm default to 0 (``data.get(k, 0)``, :82-83)      -> coalesce
  - reject when iptm < min_iptm OR ptm < min_ptm (equality passes, :86)
  - chain label outside A-E rejects the job (:89-94)                -> literal index
  - pae = chain_pair_pae_min[poi][partner]; reject when >= cutoff or
    out-of-bounds / missing (:96-103)                               -> try element_at ⇒ null ⇒ filtered

Everything is native Column expressions — constant-folded literals,
fully pushdown-able, whole-stage-codegen'd. No shuffle: the screen is a
scan + filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..params import CHAIN_TO_INDEX, ScreenParams


def screen_binders(predictions: DataFrame, params: ScreenParams) -> DataFrame:
    """Return passing jobs with their effective (iptm, ptm, pae_value).

    Unknown chain labels make ``poi_idx``/``partner_idx`` None at plan
    build time, which we treat as an empty result (reference returns
    False for every job, :91-94).
    """
    poi_idx = CHAIN_TO_INDEX.get(params.poi_chain)
    partner_idx = CHAIN_TO_INDEX.get(params.partner_chain)
    df = predictions.select(
        "job",
        F.coalesce(F.col("iptm"), F.lit(0.0)).alias("iptm"),
        F.coalesce(F.col("ptm"), F.lit(0.0)).alias("ptm"),
        "chain_pair_pae_min",
    )
    if poi_idx is None or partner_idx is None:
        return df.select("job", "iptm", "ptm", F.lit(None).cast("double").alias("pae_value")).limit(0)

    # element_at is 1-based; OOB on an array yields null under ANSI-off /
    # try semantics, which the filter then drops (reference rejects, :100).
    pae_value = F.try_element_at(
        F.try_element_at(F.col("chain_pair_pae_min"), F.lit(poi_idx + 1)),
        F.lit(partner_idx + 1),
    )
    return (
        df.withColumn("pae_value", pae_value)
        .filter(
            (F.col("iptm") >= F.lit(float(params.min_iptm_cutoff)))
            & (F.col("ptm") >= F.lit(float(params.min_ptm_cutoff)))
            & F.col("pae_value").isNotNull()
            & (F.col("pae_value") < F.lit(float(params.max_pae_cutoff)))
        )
        .select("job", "iptm", "ptm", "pae_value")
    )
