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
    # deliberately NOT spread: the rule aggregates partially combine
    # map-side off the scan; the paired in-session A/B read a local-mode
    # pre-repartition as a pure loss (1.86 s with vs 1.07 s without).
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


_NUMERIC_PREFIXES = (
    "tinyint", "smallint", "int", "bigint", "float", "double", "decimal",
)


def infer_expectations(
    df: DataFrame,
    cols: list[str] | None = None,
    max_set_values: int = 20,
) -> DataFrame:
    """(col_name, check, min_value, max_value, allowed_values) — a
    PROPOSED expectation suite inferred from the table itself: the
    bridge from the discovery axis (``profiling``) to the contract
    axis (``check_expectations``). A new 100 TB table arrives; profile
    it, freeze the inferred suite, and gate every later drop against
    it. Inference rules (Deequ's "constraint suggestion" idea —
    Schelter et al. 2018):

    - no NULLs observed             -> ``not_null``
    - distinct == rows (and > 0)    -> ``unique``
    - numeric column, any non-NULL  -> ``range`` [observed min, max]
    - 1 <= distinct <= max_set_values -> ``in_set`` (sorted values,
      also comma-joined in ``allowed_values`` for the report)

    The suite is SELF-CONSISTENT by construction: every inferred rule
    passes :func:`check_expectations` on the profiled table itself
    (pytest-pinned) — violations appear only when LATER data breaks
    the frozen contract, which is exactly the gate semantics.

    Scale shape: ONE fused profile aggregation (the profile_table
    shape), collected as a single column-bounded row (the
    psi_report_many bounds discipline), then ONE more scan collecting
    sorted value sets ONLY for the columns the first pass proved are
    under ``max_set_values`` — collect_set is never applied to a
    column whose cardinality is unknown. Inference reads data twice,
    never more, at any column count."""
    dtypes = dict(df.dtypes)
    if cols is None:
        cols = [c for c, _ in df.dtypes]
    missing = [c for c in cols if c not in dtypes]
    if missing:
        raise ValueError(f"columns not in the frame: {missing}")
    if max_set_values < 1:
        raise ValueError(
            f"max_set_values must be >= 1 (got {max_set_values})"
        )

    def numeric(c: str) -> bool:
        return dtypes[c].startswith(_NUMERIC_PREFIXES)

    prow = df.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        *[F.count(c).cast("long").alias(f"_nn_{c}") for c in cols],
        *[F.countDistinct(c).cast("long").alias(f"_nd_{c}") for c in cols],
        *[
            (
                F.min(F.col(c).cast("double"))
                if numeric(c)
                else F.lit(None).cast("double")
            ).alias(f"_mn_{c}")
            for c in cols
        ],
        *[
            (
                F.max(F.col(c).cast("double"))
                if numeric(c)
                else F.lit(None).cast("double")
            ).alias(f"_mx_{c}")
            for c in cols
        ],
    ).collect()[0]
    n = prow["_n"]
    set_cols = [
        c for c in cols if 1 <= prow[f"_nd_{c}"] <= max_set_values
    ]
    sets: dict[str, str] = {}
    if set_cols:
        srow = df.agg(
            *[
                F.array_join(
                    F.sort_array(
                        F.collect_set(F.col(c).cast("string"))
                    ),
                    ",",
                ).alias(f"_s_{c}")
                for c in set_cols
            ],
            *[
                F.max(F.col(c).cast("string").contains(","))
                .alias(f"_comma_{c}")
                for c in set_cols
            ],
        ).collect()[0]
        dirty = [c for c in set_cols if srow[f"_comma_{c}"]]
        if dirty:
            raise ValueError(
                f"infer_expectations: categorical values in {dirty} "
                "contain ',' — the comma-joined allowed_values report "
                "column would not round-trip through "
                "rules_from_inferred. Exclude those columns via `cols` "
                "or clean the values upstream."
            )
        sets = {c: srow[f"_s_{c}"] for c in set_cols}
    rows = []
    for c in cols:
        nn, nd = prow[f"_nn_{c}"], prow[f"_nd_{c}"]
        if n > 0 and nn == n:
            rows.append((c, "not_null", None, None, None))
        if n > 0 and nd == n:
            rows.append((c, "unique", None, None, None))
        if numeric(c) and nn > 0:
            rows.append(
                (c, "range", float(prow[f"_mn_{c}"]),
                 float(prow[f"_mx_{c}"]), None)
            )
        if c in sets:
            rows.append((c, "in_set", None, None, sets[c]))
    return df.sparkSession.createDataFrame(
        rows,
        "col_name string, check string, min_value double, "
        "max_value double, allowed_values string",
    )


def rules_from_inferred(report_rows) -> list[dict]:
    """Inferred-suite rows (collected from :func:`infer_expectations`)
    -> the ``rules`` list :func:`check_expectations` takes. The
    round-trip is the contract workflow: infer once, persist the
    suite table, load + convert + check on every later drop."""
    rules = []
    for r in report_rows:
        if r.check in ("not_null", "unique"):
            rules.append({"column": r.col_name, "check": r.check})
        elif r.check == "range":
            rules.append(
                {"column": r.col_name, "check": "range",
                 "min": r.min_value, "max": r.max_value}
            )
        elif r.check == "in_set":
            rules.append(
                {"column": r.col_name, "check": "in_set",
                 "values": (r.allowed_values or "").split(",")}
            )
        else:
            raise ValueError(f"unknown inferred check {r.check!r}")
    return rules
