"""Declarative data-quality expectations over any DataFrame — the
Deequ/Great-Expectations family (Schelter et al. 2018, "Automating
Large-Scale Data Quality Verification"): completeness, uniqueness,
range, set-membership and pattern constraints evaluated in ONE scan +
ONE aggregation, returning a violations table instead of a boolean (so
the report composes into pipelines and dashboards).

Scale shape: every check compiles to a conditional sum (or a
count/count-distinct pair) inside a single hash aggregation — at any
corpus size the cost is the scan; the result is a rules-sized row
exploded into the report. NULL semantics: ``not_null`` counts nulls;
every OTHER check skips nulls (a null is a completeness problem, not a
range/set/pattern problem — count it once, under the check that owns
it)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CHECKS = ("not_null", "unique", "range", "in_set", "regex", "predicate",
           "freshness")


def check_expectations(df: DataFrame, rules: list[dict]) -> DataFrame:
    """(rule_id, column, check, n_violations, n_rows, passed) — one row
    per rule. Rules::

        {"column": "x", "check": "not_null"}
        {"column": "x", "check": "unique"}            # extra copies
        {"column": "x", "check": "range", "min": lo, "max": hi}
        {"column": "x", "check": "in_set", "values": [...]}
        {"column": "x", "check": "regex", "pattern": r"..."}
        {"column": "x", "check": "predicate", "sql": "x < y * 2"}
        {"column": "ts", "check": "freshness", "max_age_s": 3600,
         "as_of": <epoch seconds>}       # rows older than the horizon

    ``unique`` counts duplicate EXTRAS among non-null values
    (``count(x) − count(DISTINCT x)``). ``predicate`` evaluates an
    arbitrary boolean SQL expression (may reference several columns —
    ``column`` is only the report label); rows where it is false OR
    NULL count as violations — a constraint that cannot be evaluated
    is not satisfied (set-semantics differ from the per-column checks
    because a multi-column predicate has no single null-owning
    column). ``freshness`` counts rows whose (timestamp-castable)
    column is older than ``as_of − max_age_s`` — ``as_of`` is an
    EXPLICIT epoch-seconds parameter, never wall-clock inside the
    plan (a query that reads the clock is unreproducible and breaks
    retry idempotence; the caller owns "now"). A table whose newest
    row is stale fails with n_violations = n_rows of the stale
    region, which is also the right gate signal ("how much is
    late"), not just a boolean."""
    aggs = []
    for i, r in enumerate(rules):
        check = r["check"]
        if check not in _CHECKS:
            raise ValueError(f"unknown check {check!r}")
        c = F.col(r["column"])
        if check == "not_null":
            v = F.sum(c.isNull().cast("long"))
        elif check == "unique":
            v = F.count(c) - F.countDistinct(c)
        elif check == "range":
            v = F.sum(
                ((c < F.lit(r["min"])) | (c > F.lit(r["max"]))).cast("long")
            )
        elif check == "in_set":
            v = F.sum((~c.isin(list(r["values"]))).cast("long"))
        elif check == "regex":
            v = F.sum((~c.rlike(r["pattern"])).cast("long"))
        elif check == "predicate":
            v = F.sum(
                (~F.coalesce(F.expr(r["sql"]), F.lit(False))).cast("long")
            )
        else:  # freshness
            horizon = int(r["as_of"]) - int(r["max_age_s"])
            v = F.sum(
                (
                    c.cast("timestamp").cast("long") < F.lit(horizon)
                ).cast("long")
            )
        aggs.append(F.coalesce(v, F.lit(0)).cast("long").alias(f"_v{i}"))
    row = df.agg(F.count(F.lit(1)).alias("_n"), *aggs)
    reports = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("rule_id"),
                F.lit(r["column"]).alias("column"),
                F.lit(r["check"]).alias("check"),
                F.col(f"_v{i}").alias("n_violations"),
            )
            for i, r in enumerate(rules)
        ]
    )
    return (
        row.select(F.explode(reports).alias("_r"), F.col("_n"))
        .select(
            "_r.rule_id",
            "_r.column",
            "_r.check",
            "_r.n_violations",
            F.col("_n").alias("n_rows"),
            (F.col("_r.n_violations") == 0).alias("passed"),
        )
    )
