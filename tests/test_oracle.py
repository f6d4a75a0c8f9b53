"""Local mirror of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same parquet tables; compare row count + sorted-column schema + values."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from process_alphafold3_outputs_spark.sources.tables import TABLE_NAMES

# Full registry (driver-visible + deferred): the local mirror keeps
# covering shape queries the driver window can no longer see.
QUERIES = entrymod.all_queries()
ORACLE = entrymod.all_oracle_sql()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(name, spark, sf_dir):
    try:
        got = normalize(QUERIES[name](spark, sf_dir).toPandas())
    finally:
        # staged pipeline queries persist fan-out points per call and the
        # mirror runs ~90 queries in ONE session — release each query's
        # blocks so pinned storage doesn't compound across the suite
        spark.catalog.clearCache()
    want = normalize(duck_con(sf_dir).execute(ORACLE[name]).fetchdf())
    assert list(got.columns) == list(want.columns), name
    assert len(got) == len(want), name
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_every_query_has_oracle_or_is_flagged():
    missing = set(QUERIES) - set(ORACLE)
    # non-SQL-expressible ops may omit oracles; keep the list explicit
    assert missing <= entrymod._NO_ORACLE_OK, (
        f"unexpected oracle-less queries: {missing - entrymod._NO_ORACLE_OK}"
    )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
