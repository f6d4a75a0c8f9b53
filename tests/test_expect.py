

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
