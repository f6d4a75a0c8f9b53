"""Fresh-process driver-contract oracle compare (the grading driver's check).

Usage:
    python tools/oracle_compare.py [--sf-dir /root/testdata/sf0.01] name [name ...]
    python tools/oracle_compare.py --all          # every oracle-paired query

For each name: run the registered Spark query and the DuckDB oracle SQL
over the same parquet dir, canonicalize both (sort columns by name, sort
rows, round floats to 9 significant digits the way the driver hashes),
and report MATCH / MISMATCH.  Prints one JSON line at the end:
{"bad": [...], "checked": N}.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        return float(f"{v:.9g}")
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    try:
        import datetime
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(f"{float(v):.9g}")
        if isinstance(v, (datetime.datetime, datetime.date)):
            return str(v)
    except Exception:  # noqa: BLE001
        pass
    return v


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--all", action="store_true")
    ap.add_argument(
        "--full",
        action="store_true",
        help="use all_queries()/all_oracle_sql() (includes deferred mirror queries)",
    )
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "12g")
        .getOrCreate()
    )
    import __spark_entry__ as m

    if args.full:
        Q, O = m.all_queries(), m.all_oracle_sql()
    else:
        Q, O = m.queries(), m.oracle_sql()
    names = sorted(O.keys()) if args.all else args.names
    con = duckdb.connect()
    for t in TABLES:
        p = f"{args.sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    bad = []
    for name in names:
        if name not in O:
            print(f"{name}: NO ORACLE (skipped)")
            continue
        try:
            df = Q[name](spark, args.sf_dir)
            s_cols = df.columns
            s_rows = [tuple(r) for r in df.collect()]
            cur = con.execute(O[name])
            d_cols = [c[0] for c in cur.description]
            d_rows = cur.fetchall()
            a, b = _canon(s_rows, s_cols), _canon(d_rows, d_cols)
            if sorted(s_cols) != sorted(d_cols):
                bad.append(name)
                print(f"{name}: SCHEMA MISMATCH {sorted(s_cols)} vs {sorted(d_cols)}")
            elif a != b:
                bad.append(name)
                print(f"{name}: ROWS MISMATCH spark={len(a)} duck={len(b)}")
                for i, (x, y) in enumerate(zip(a, b)):
                    if x != y:
                        print(f"  first diff row {i}:\n   spark {x}\n   duck  {y}")
                        break
            else:
                print(f"{name}: MATCH ({len(a)} rows)")
        except Exception as e:  # noqa: BLE001
            bad.append(name)
            print(f"{name}: ERROR {type(e).__name__}: {e}")
    print(json.dumps({"bad": bad, "checked": len(names)}))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
