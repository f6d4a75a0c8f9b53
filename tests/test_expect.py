

def test_freshness_check_counts_stale_rows(spark):
    from process_alphafold3_outputs_spark.operators.expect import (
        check_expectations,
    )

    df = spark.createDataFrame(
        [(100,), (900,), (1000,), (None,)], "ts long"
    )
    out = check_expectations(
        df,
        [{"column": "ts", "check": "freshness", "max_age_s": 200,
          "as_of": 1000}],
    ).collect()[0]
    # horizon = 800: the t=100 row is stale; NULL ts is a completeness
    # problem (not_null owns it), not a freshness one
    assert (out.n_violations, out.n_rows, out.passed) == (1, 4, False)
    fresh = check_expectations(
        df,
        [{"column": "ts", "check": "freshness", "max_age_s": 1000,
          "as_of": 1000}],
    ).collect()[0]
    assert fresh.passed is True


def test_infer_expectations_self_consistent_and_guards(spark):
    """The inferred suite is self-consistent by construction: every
    proposed rule passes check_expectations on the profiled table
    itself; a later drop that breaks the frozen contract fails it.
    Guards: comma-bearing categorical values refuse loudly (the
    allowed_values round trip would corrupt), bad cols/cap refuse."""
    import pytest as _pt

    from process_alphafold3_outputs_spark.operators.expect import (
        check_expectations,
        infer_expectations,
        rules_from_inferred,
    )

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 12.5), (3, "a", 11.0)],
        "id bigint, cat string, x double",
    )
    suite = infer_expectations(df).collect()
    got = {(r.col_name, r.check): r for r in suite}
    # id: complete, unique, ranged; cat: complete + tiny set;
    # x: complete, unique, ranged (+ its own 3-value set)
    assert ("id", "not_null") in got and ("id", "unique") in got
    assert got[("id", "range")].min_value == 1.0
    assert got[("id", "range")].max_value == 3.0
    assert got[("cat", "in_set")].allowed_values == "a,b"
    assert ("cat", "unique") not in got  # 'a' repeats
    assert got[("x", "range")].max_value == 12.5
    # self-consistency: the suite passes on the table it came from
    report = check_expectations(df, rules_from_inferred(suite))
    assert all(r.passed for r in report.collect())
    # a breaking drop fails the frozen contract
    drop = spark.createDataFrame(
        [(1, "zzz", 99.0), (None, "a", 11.0)],
        "id bigint, cat string, x double",
    )
    later = {
        (r.column, r.check): r.passed
        for r in check_expectations(
            drop, rules_from_inferred(suite)
        ).collect()
    }
    assert later[("id", "not_null")] is False
    assert later[("cat", "in_set")] is False
    assert later[("x", "range")] is False
    # guards
    with _pt.raises(ValueError, match="not in the frame"):
        infer_expectations(df, ["nope"])
    with _pt.raises(ValueError, match="max_set_values"):
        infer_expectations(df, max_set_values=0)
    dirty = spark.createDataFrame([("a,b",), ("c",)], "cat string")
    with _pt.raises(ValueError, match="contain ','"):
        infer_expectations(dirty)


def test_cli_expect_infer(spark, tmp_path):
    from process_alphafold3_outputs_spark import corpus_cli

    d = str(tmp_path / "t")
    spark.range(10).selectExpr(
        "id", "CAST(id % 3 AS STRING) AS g"
    ).write.parquet(d)
    out = str(tmp_path / "o")
    args = corpus_cli.build_parser().parse_args(
        ["expect", "--input", d, "--out", out, "--infer",
         "--max-set-values", "3"]
    )
    res = corpus_cli.run(args, spark)
    assert res["rows"] > 0
    got = {
        (r.col_name, r.check) for r in spark.read.parquet(out).collect()
    }
    assert ("id", "unique") in got and ("g", "in_set") in got
