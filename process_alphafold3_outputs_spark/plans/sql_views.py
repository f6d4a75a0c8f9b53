"""SQL API surface: register the engine's tables as temp views so every
kernel is reachable through ``spark.sql`` as well as the DataFrame API
(same Catalyst plans either way)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

AF3_TABLES = ("predictions", "chains", "pae_long", "atoms")


def register_af3_views(
    spark: SparkSession, tables: dict[str, DataFrame], prefix: str = "af3_"
) -> list[str]:
    names = []
    for name, df in tables.items():
        view = f"{prefix}{name}"
        df.createOrReplaceTempView(view)
        names.append(view)
    return names


SCREEN_SQL = """
SELECT job,
       round(coalesce(iptm, 0), 6) AS iptm,
       round(coalesce(ptm, 0), 6) AS ptm,
       round(try_element_at(try_element_at(chain_pair_pae_min, {poi}), {partner}), 6)
           AS pae_value
FROM af3_predictions
WHERE coalesce(iptm, 0) >= {min_iptm}
  AND coalesce(ptm, 0) >= {min_ptm}
  AND try_element_at(try_element_at(chain_pair_pae_min, {poi}), {partner}) < {max_pae}
"""


def screen_binders_sql(
    spark: SparkSession, poi_idx: int, partner_idx: int,
    min_iptm: float = 0.0, min_ptm: float = 0.0, max_pae: float = 15.0,
) -> DataFrame:
    """The O5-O8 binder screen as a spark.sql query over the registered
    views — identical semantics (and plan) to operators.screen."""
    return spark.sql(
        SCREEN_SQL.format(
            poi=poi_idx + 1, partner=partner_idx + 1,
            min_iptm=float(min_iptm), min_ptm=float(min_ptm),
            max_pae=float(max_pae),
        )
    )
