"""3-D contact join — O20-O22 (process_af3_outputs.py:226-251).

The reference builds a KD-tree per job (``NeighborSearch``, :233) and
queries every atom of every interacting partner residue for POI atoms
within ``max_dist`` Å (:242). Spark has no native spatial join; two
physical strategies, both pure-plan:

(a) grid-cell bucket join (default, scales): bin x,y,z into cells of
    edge ``max_dist``; explode the PARTNER side (the smaller one — only
    atoms of interacting residues survive the semi-join) to its 27
    neighbouring cells; equi-join on (job, cx, cy, cz) — a plain hash
    join — then the exact Euclidean filter. Shuffle keys lead with
    ``job`` so the join never mixes jobs.

(b) per-job numpy brute force via ``applyInPandas`` (lower constant
    factor for small jobs; used as the differential-test oracle).

Output: contact pairs (job, partner_res, poi_res) — the long form of
the reference's ``contact_map`` dict (:234-249); ``collect_set``
presentation is left to the report stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..params import ScreenParams

_NEIGHBOR_OFFSETS = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)]


def contact_pairs_grid(
    atoms: DataFrame,
    interacting: DataFrame,
    params: ScreenParams,
    model_id: int = 0,
) -> DataFrame:
    """Strategy (a). ``atoms``: (job, model_id, chain_id, residue_id, x, y, z);
    ``interacting``: (job, partner_res) from the PAE kernel.

    Join-key choice preserved from the reference (SURVEY §2.2 #8):
    ``partner_res`` (1-based token position) is compared against the
    CIF author residue id (:231, :237).
    """
    d = float(params.max_dist)
    # Both sides keep only standard-AA residues (``is_aa(residue)``,
    # process_af3_outputs.py:230-231 — ligands/ions never contact).
    base = atoms.filter((F.col("model_id") == model_id) & F.col("is_aa"))

    poi = base.filter(F.col("chain_id") == params.poi_chain).select(
        "job",
        F.col("residue_id").alias("poi_res"),
        "x",
        "y",
        "z",
        F.floor(F.col("x") / d).cast("int").alias("cx"),
        F.floor(F.col("y") / d).cast("int").alias("cy"),
        F.floor(F.col("z") / d).cast("int").alias("cz"),
    )

    # Semi-join filter (O21, :231/:237): only interacting partner residues.
    partner = (
        base.filter(F.col("chain_id") == params.partner_chain)
        .join(
            interacting.select("job", F.col("partner_res").alias("residue_id")),
            ["job", "residue_id"],
            "left_semi",
        )
        .select("job", F.col("residue_id").alias("partner_res"), "x", "y", "z")
    )

    # 27-cell expansion on the partner side only (SURVEY §7.2): one
    # explode of a literal 27-element array, no row explosion on POI.
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"), F.lit(dz).alias("dz"))
            for dx, dy, dz in _NEIGHBOR_OFFSETS
        ]
    )
    partner_cells = partner.withColumn("_o", F.explode(offsets)).select(
        "job",
        "partner_res",
        F.col("x").alias("px"),
        F.col("y").alias("py"),
        F.col("z").alias("pz"),
        (F.floor(F.col("x") / d).cast("int") + F.col("_o.dx")).alias("cx"),
        (F.floor(F.col("y") / d).cast("int") + F.col("_o.dy")).alias("cy"),
        (F.floor(F.col("z") / d).cast("int") + F.col("_o.dz")).alias("cz"),
    )

    dist2 = (
        (F.col("px") - F.col("x")) ** 2
        + (F.col("py") - F.col("y")) ** 2
        + (F.col("pz") - F.col("z")) ** 2
    )
    return (
        partner_cells.join(poi, ["job", "cx", "cy", "cz"])
        .filter(dist2 < F.lit(d * d))
        .select("job", "partner_res", "poi_res")
        .distinct()
    )


def contact_pairs_numpy(
    atoms: DataFrame,
    interacting: DataFrame,
    params: ScreenParams,
    model_id: int = 0,
) -> DataFrame:
    """Strategy (b): per-job vectorised brute force (O(P·Q) on in-job
    atom counts, fine at AF3 sizes). Arrow-batched grouped-map UDF."""
    import pandas as pd

    d2 = float(params.max_dist) ** 2
    poi_chain, partner_chain = params.poi_chain, params.partner_chain

    base = atoms.filter(
        (F.col("model_id") == model_id)
        & F.col("is_aa")
        & F.col("chain_id").isin([poi_chain, partner_chain])
    )
    tagged = base.join(
        interacting.select("job", F.col("partner_res").alias("residue_id"))
        .withColumn("_chain", F.lit(partner_chain)),
        ["job", "residue_id"],
        "left",
    ).filter(
        (F.col("chain_id") == poi_chain)
        | ((F.col("chain_id") == partner_chain) & F.col("_chain").isNotNull())
    )

    def per_job(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        poi_m = pdf["chain_id"] == poi_chain
        p = pdf.loc[poi_m, ["residue_id", "x", "y", "z"]]
        q = pdf.loc[~poi_m, ["residue_id", "x", "y", "z"]]
        if p.empty or q.empty:
            return pd.DataFrame(columns=["job", "partner_res", "poi_res"])
        pxyz = p[["x", "y", "z"]].to_numpy()
        qxyz = q[["x", "y", "z"]].to_numpy()
        dist2 = ((qxyz[:, None, :] - pxyz[None, :, :]) ** 2).sum(axis=2)
        qi, pi = np.nonzero(dist2 < d2)
        out = pd.DataFrame(
            {
                "job": pdf["job"].iloc[0],
                "partner_res": q["residue_id"].to_numpy()[qi],
                "poi_res": p["residue_id"].to_numpy()[pi],
            }
        )
        return out.drop_duplicates()

    return tagged.groupBy("job").applyInPandas(
        per_job, "job string, partner_res int, poi_res int"
    )


def contact_map(contacts: DataFrame) -> DataFrame:
    """O22 (:239-249): distinct POI contacts per partner residue,
    sorted for deterministic hashing (reference used an unordered set)."""
    return contacts.groupBy("job", "partner_res").agg(
        F.sort_array(F.collect_set("poi_res")).alias("poi_contacts")
    )
