"""Schema-drift guard: plan construction must survive the driver
regenerating ``events.parquet`` with either ``ts`` encoding.

Rounds 1-2 saw ``ts`` as INT64 TIMESTAMP(NANOS) (read as BIGINT nanos
via ``nanosAsLong``); the round-3 regeneration shipped plain TIMESTAMP
(read as TIMESTAMP_NTZ) and broke five ``ts div 1e9`` call sites at
*analysis* time — four red driver signals from one silent data change.
This test builds every registered query against BOTH encodings
(analysis only — ``df.schema`` forces the analyzer but launches no
jobs), so the next drift fails here first, with a named query.
"""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pytest

import __spark_entry__ as entrymod
from process_alphafold3_outputs_spark.sources.tables import (
    TABLE_NAMES,
    event_seconds,
    load_table,
)

SF_DIR = "/root/testdata/sf0.001"


def _variant_dir(tmp_path_factory, encoding: str) -> str:
    """sf0.001 with events.ts re-encoded; other tables symlinked."""
    out = str(tmp_path_factory.mktemp(f"events_{encoding}"))
    for name in TABLE_NAMES:
        src = os.path.join(SF_DIR, f"{name}.parquet")
        dst = os.path.join(out, f"{name}.parquet")
        if name != "events":
            os.symlink(src, dst)
            continue
        ev = pd.read_parquet(src)
        ts = pd.to_datetime(ev["ts"])
        if encoding == "bigint_nanos":
            # ns-normalize first: a datetime64[us] int64 view is micros
            ev["ts"] = ts.astype("datetime64[ns]").astype("int64")
        else:  # timestamp (micros — what the r3 regeneration shipped)
            ev["ts"] = ts
        ev.to_parquet(dst, index=False,
                      coerce_timestamps="us" if encoding == "timestamp"
                      else None)
    return out


@pytest.fixture(scope="module", params=["bigint_nanos", "timestamp"])
def events_variant_dir(request, tmp_path_factory):
    if shutil.which("true") is None:  # pragma: no cover - sanity
        pytest.skip("no POSIX env")
    return _variant_dir(tmp_path_factory, request.param)


def test_event_seconds_both_encodings_agree(spark, events_variant_dir):
    ev = load_table(spark, events_variant_dir, "events")
    got = (
        ev.select(event_seconds(ev).alias("t"))
        .orderBy("t")
        .limit(5)
        .collect()
    )
    raw = pd.to_datetime(pd.read_parquet(
        os.path.join(SF_DIR, "events.parquet"))["ts"])
    # normalize to ns first — parquet micros surface as datetime64[us],
    # whose int64 view is micros, not nanos
    want = sorted(raw.astype("datetime64[ns]").astype("int64")
                  // 1_000_000_000)[:5]
    assert [r.t for r in got] == list(want)


def test_all_queries_analyze_on_both_encodings(spark, events_variant_dir):
    """Every registered query's plan must ANALYZE against this events
    encoding. ``fn(...).schema`` resolves the full plan (the r3 failure
    mode was an AnalysisException at select()); no job runs."""
    failures = {}
    for name, fn in entrymod.queries().items():
        try:
            df = fn(spark, events_variant_dir)
            _ = df.schema
        except Exception as exc:  # noqa: BLE001 — collect all, report once
            failures[name] = f"{type(exc).__name__}: {exc}"
    assert not failures, (
        "queries failed analysis on this events encoding:\n"
        + "\n".join(f"  {n}: {e[:300]}" for n, e in sorted(failures.items()))
    )
