"""Driver-contract queries for the AF3 pipeline itself, oracle-checked
end-to-end: a deterministic fixture corpus is materialised once under
``.cache/af3_query_corpus`` and BOTH engines read the same parquet —
Spark through the operator stack, DuckDB through a full SQL
re-statement of the reference semantics (screen → chain intervals →
PAE count-threshold → 3-D contacts → two-level islands → report).

This makes the flagship itself part of the hash-checked correctness
gate instead of a weaker rows-only check.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.intervals import identify_interacting_residues
from ..operators.screen import screen_binders
from ..operators.spatial import contact_pairs_grid
from ..params import ScreenParams
from .driver_queries import register

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
CORPUS_DIR = os.path.join(_REPO_ROOT, ".cache", "af3_query_corpus")
_N_JOBS, _SEED = 12, 7

PARAMS = ScreenParams()  # reference defaults


def _ensure_corpus() -> str:
    from ..fixtures import write_corpus

    marker = os.path.join(CORPUS_DIR, "atoms.parquet")
    if not os.path.exists(marker):
        write_corpus(CORPUS_DIR, n_jobs=_N_JOBS, seed=_SEED)
    return CORPUS_DIR


def _tables(spark: SparkSession) -> dict[str, DataFrame]:
    d = _ensure_corpus()
    return {
        n: spark.read.parquet(os.path.join(d, f"{n}.parquet"))
        for n in ("predictions", "chains", "pae_long", "atoms")
    }


_ensure_corpus()

# ---------------------------------------------------------------------------
# shared oracle CTEs (DuckDB reads the same parquet the Spark side reads)
# ---------------------------------------------------------------------------

_P = CORPUS_DIR


def base_cte(
    preds_path: str, chains_path: str, pae_path: str, atoms_path: str
) -> str:
    """The full reference pipeline (screen → intervals → PAE threshold →
    contacts) as DuckDB CTEs over four parquet tables — shared by the
    AF3 corpus oracles here and the file-boundary sink oracles in
    driver_queries_files."""
    return f"""
    preds AS (SELECT * FROM '{preds_path}'),
    chains AS (SELECT * FROM '{chains_path}'),
    pae AS (SELECT * FROM '{pae_path}'),
    atoms AS (SELECT * FROM '{atoms_path}'),
    screen AS (
        SELECT job,
               round(coalesce(iptm, 0), 6) AS iptm,
               round(coalesce(ptm, 0), 6) AS ptm,
               round(chain_pair_pae_min[1][2], 6) AS pae_value
        FROM preds
        WHERE coalesce(iptm, 0) >= 0.0 AND coalesce(ptm, 0) >= 0.0
          AND chain_pair_pae_min IS NOT NULL
          AND len(chain_pair_pae_min) >= 1 AND len(chain_pair_pae_min[1]) >= 2
          AND chain_pair_pae_min[1][2] < 15.0
    ),
    iv AS (
        SELECT job, chain_id, token_length,
               CAST(coalesce(sum(token_length) OVER (
                   PARTITION BY job ORDER BY chain_index
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                   AS start
        FROM chains
    ),
    poi AS (SELECT job, start AS ps, start + token_length AS pe FROM iv WHERE chain_id = 'A'),
    par AS (SELECT job, start AS qs, start + token_length AS qe FROM iv WHERE chain_id = 'B'),
    width AS (SELECT job, sum(token_length) AS w FROM chains GROUP BY job),
    inter AS (
        SELECT l.job, CAST(l.aligned_token - b.qs + 1 AS BIGINT) AS partner_res
        FROM pae l
        JOIN (SELECT p.job, ps, pe, qs, qe
              FROM poi p JOIN par q ON p.job = q.job
              JOIN width w ON w.job = p.job
              WHERE qs < w AND qe <= w) b ON l.job = b.job
        JOIN screen s ON s.job = l.job
        WHERE l.pae < 15.0
          AND l.scored_token BETWEEN b.ps AND b.pe - 1
          AND l.aligned_token BETWEEN b.qs AND b.qe - 1
        GROUP BY l.job, l.aligned_token, b.qs
        HAVING count(*) >= 5
    ),
    contacts AS (
        SELECT DISTINCT pa.job, CAST(pa.residue_id AS BIGINT) AS partner_res,
               CAST(po.residue_id AS BIGINT) AS poi_res
        FROM atoms pa
        JOIN atoms po ON pa.job = po.job
        JOIN inter i ON i.job = pa.job AND i.partner_res = pa.residue_id
        WHERE pa.model_id = 0 AND po.model_id = 0
          AND pa.chain_id = 'B' AND po.chain_id = 'A'
          AND pa.is_aa AND po.is_aa
          AND (pa.x - po.x) * (pa.x - po.x) + (pa.y - po.y) * (pa.y - po.y)
              + (pa.z - po.z) * (pa.z - po.z) <= {float(PARAMS.max_dist) ** 2}
    )
"""


_BASE = base_cte(
    f"{_P}/predictions.parquet",
    f"{_P}/chains.parquet",
    f"{_P}/pae_long.parquet",
    f"{_P}/atoms.parquet",
)

_ISLANDS = """
    ck AS (SELECT DISTINCT job, partner_res FROM contacts),
    d1 AS (SELECT job, partner_res,
                  CASE WHEN partner_res - lag(partner_res) OVER
                            (PARTITION BY job ORDER BY partner_res) > 1
                       THEN 1 ELSE 0 END AS brk
           FROM ck),
    s1 AS (SELECT job, partner_res,
                  sum(brk) OVER (PARTITION BY job ORDER BY partner_res
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
           FROM d1),
    k1 AS (SELECT job, partner_res,
                  min(partner_res) OVER (PARTITION BY job, isl) AS p_isl,
                  count(*) OVER (PARTITION BY job, isl) AS sz
           FROM s1),
    lvl1 AS (SELECT job, partner_res, p_isl FROM k1 WHERE sz >= 3),
    uni AS (SELECT DISTINCT c.job, l.p_isl, c.poi_res
            FROM contacts c JOIN lvl1 l
              ON c.job = l.job AND c.partner_res = l.partner_res),
    d2 AS (SELECT job, p_isl, poi_res,
                  CASE WHEN poi_res - lag(poi_res) OVER
                            (PARTITION BY job, p_isl ORDER BY poi_res) > 2
                       THEN 1 ELSE 0 END AS brk
           FROM uni),
    s2 AS (SELECT job, p_isl, poi_res,
                  sum(brk) OVER (PARTITION BY job, p_isl ORDER BY poi_res
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
           FROM d2),
    k2 AS (SELECT job, p_isl, poi_res,
                  min(poi_res) OVER (PARTITION BY job, p_isl, isl) AS c_isl,
                  count(*) OVER (PARTITION BY job, p_isl, isl) AS sz
           FROM s2),
    lvl2 AS (SELECT job, p_isl, c_isl, poi_res FROM k2 WHERE sz >= 3),
    pranges AS (SELECT job, p_isl, min(partner_res) AS p_min, max(partner_res) AS p_max
                FROM lvl1 GROUP BY job, p_isl),
    cranges AS (SELECT job, p_isl, c_isl, min(poi_res) AS c_min, max(poi_res) AS c_max
                FROM lvl2 GROUP BY job, p_isl, c_isl)
"""


@register(
    "af3_screen",
    sql=f"WITH {_BASE} SELECT job, iptm, ptm, pae_value FROM screen",
)
def af3_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tables(spark)
    s = screen_binders(t["predictions"], PARAMS)
    return s.select(
        "job",
        F.round("iptm", 6).alias("iptm"),
        F.round("ptm", 6).alias("ptm"),
        F.round("pae_value", 6).alias("pae_value"),
    )


@register(
    "af3_interacting_residues",
    sql=f"WITH {_BASE} SELECT job, partner_res FROM inter",
)
def af3_interacting_residues(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tables(spark)
    binders = screen_binders(t["predictions"], PARAMS)
    return identify_interacting_residues(
        t["pae_long"], t["chains"], PARAMS, jobs=binders
    ).select("job", F.col("partner_res").cast("long"))


@register(
    "af3_contacts",
    sql=f"WITH {_BASE} SELECT job, partner_res, poi_res FROM contacts",
)
def af3_contacts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tables(spark)
    binders = screen_binders(t["predictions"], PARAMS)
    inter = identify_interacting_residues(t["pae_long"], t["chains"], PARAMS, jobs=binders)
    return contact_pairs_grid(t["atoms"], inter, PARAMS).select(
        "job",
        F.col("partner_res").cast("long"),
        F.col("poi_res").cast("long"),
    )


#: the report projection over the base+islands CTEs — shared with the
#: CSV-sink readback oracle in driver_queries_files
REPORT_SELECT = """
    SELECT c.job AS "Folder_name",
           CAST(c.c_min AS VARCHAR) || '-' || CAST(c.c_max AS VARCHAR)
               AS "Contact_residues_POI_chain_A",
           substr(sa.sequence, CAST(c.c_min AS INT), CAST(c.c_max - c.c_min + 1 AS INT))
               AS "Contact_sequence",
           CAST(p.p_min AS VARCHAR) || '-' || CAST(p.p_max AS VARCHAR)
               AS "Interacting_residues_Partner_chain_B",
           substr(sb.sequence, CAST(p.p_min AS INT), CAST(p.p_max - p.p_min + 1 AS INT))
               AS "Interacting_sequence"
    FROM cranges c
    JOIN pranges p ON p.job = c.job AND p.p_isl = c.p_isl
    JOIN chains sa ON sa.job = c.job AND sa.chain_id = 'A'
    JOIN chains sb ON sb.job = c.job AND sb.chain_id = 'B'
"""


@register(
    "af3_interaction_report",
    sql=f"""
    WITH {_BASE},
    {_ISLANDS}
    {REPORT_SELECT}
    """,
)
def af3_interaction_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline import interaction_report

    t = _tables(spark)
    return interaction_report(
        t["predictions"], t["chains"], t["pae_long"], t["atoms"], PARAMS
    )


@register(
    "af3_screen_sql",
    sql=f"WITH {_BASE} SELECT job, iptm, ptm, pae_value FROM screen",
)
def af3_screen_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same screen through the spark.sql surface (temp views) —
    proves the SQL API reaches the kernels with identical semantics."""
    from ..params import CHAIN_TO_INDEX
    from .sql_views import register_af3_views, screen_binders_sql

    register_af3_views(spark, _tables(spark))
    return screen_binders_sql(
        spark,
        CHAIN_TO_INDEX[PARAMS.poi_chain],
        CHAIN_TO_INDEX[PARAMS.partner_chain],
        PARAMS.min_iptm_cutoff,
        PARAMS.min_ptm_cutoff,
        PARAMS.max_pae_cutoff,
    )


# ---------------------------------------------------------------------------
# parameter sweep: 6 cutoff combinations in one corpus pass
# ---------------------------------------------------------------------------
_SWEEP_PAES = [8.0, 12.0, 15.0]
_SWEEP_MINRES = [3, 5]

_SWEEP_COUNTS = f"""
    iv2 AS (
        SELECT job, chain_id, token_length,
               CAST(coalesce(sum(token_length) OVER (
                   PARTITION BY job ORDER BY chain_index
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                   AS start
        FROM chains
    ),
    b2 AS (
        SELECT p.job, p.start AS ps, p.start + p.token_length AS pe,
               q.start AS qs, q.start + q.token_length AS qe
        FROM (SELECT * FROM iv2 WHERE chain_id = 'A') p
        JOIN (SELECT * FROM iv2 WHERE chain_id = 'B') q ON p.job = q.job
        JOIN (SELECT job, sum(token_length) AS w FROM chains GROUP BY job) w
          ON w.job = p.job
        WHERE q.start < w AND q.start + q.token_length <= w
    ),
    counts AS (
        SELECT l.job, CAST(l.aligned_token - b2.qs + 1 AS BIGINT) AS partner_res,
               {", ".join(f"sum(CASE WHEN l.pae < {pae} THEN 1 ELSE 0 END) AS n_{int(pae)}" for pae in _SWEEP_PAES)}
        FROM pae l JOIN b2 ON l.job = b2.job
        WHERE l.pae < {max(_SWEEP_PAES)}
          AND l.scored_token BETWEEN b2.ps AND b2.pe - 1
          AND l.aligned_token BETWEEN b2.qs AND b2.qe - 1
        GROUP BY l.job, l.aligned_token, b2.qs
    )
"""

_SWEEP_SELECTS = " UNION ALL ".join(
    f"SELECT {i} AS param_id, job, partner_res FROM counts WHERE n_{int(pae)} >= {mr}"
    for i, (pae, mr) in enumerate((p, m) for p in _SWEEP_PAES for m in _SWEEP_MINRES)
)


@register(
    "af3_param_sweep",
    sql=f"""
    WITH preds AS (SELECT * FROM '{_P}/predictions.parquet'),
    chains AS (SELECT * FROM '{_P}/chains.parquet'),
    pae AS (SELECT * FROM '{_P}/pae_long.parquet'),
    {_SWEEP_COUNTS}
    {_SWEEP_SELECTS}
    """,
)
def af3_param_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sweep import sweep_grid, sweep_interacting_residues

    t = _tables(spark)
    grid = sweep_grid(_SWEEP_PAES, _SWEEP_MINRES)
    return sweep_interacting_residues(t["pae_long"], t["chains"], grid)


# ---------------------------------------------------------------------------
# Kabsch RMSD of overlay models onto model 0 — the extension the
# reference README claims (README.md:98-104) but whose script never
# executes (``Superimposer`` is a dead import,
# process_af3_outputs.py:10). No SQL oracle: the optimal-superposition
# RMSD needs a 3x3 SVD, which is not ANSI-SQL-expressible — the driver
# records the weaker rows-only check here, and the exact values are
# pinned by the sequential-numpy differential in
# tests/test_structures_rmsd.py.
# ---------------------------------------------------------------------------
@register("af3_rmsd_overlay", sql=None)
def af3_rmsd_overlay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.structures import superimpose_models

    t = _tables(spark)
    out = superimpose_models(t["atoms"], ref_model=0, atom_name="CA")
    # round to 3 decimals: the trace identity's cancellation noise near
    # rmsd=0 sits at the 1e-6 level and depends on within-group row
    # order, so a finer rounding would be partitioning-dependent; exact
    # SVD values are the differential pytest's job
    return out.select(
        "job", "model_id", "n_atoms", F.round("rmsd", 3).alias("rmsd")
    )
