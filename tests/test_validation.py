"""Validation-rule engine tests."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from spk_sl_validation_spark.operators.validation import Check, flag_violations, validate


def _checks():
    return [
        Check("positive", F.col("x") > 0, "x > 0"),
        Check("not_null_name", F.col("name").isNotNull(), "name IS NOT NULL"),
    ]


def _df(spark):
    return spark.createDataFrame(
        [
            Row(x=1, name="a"),
            Row(x=-2, name="b"),
            Row(x=3, name=None),
            Row(x=None, name="d"),  # null predicate counts as violation
        ]
    )


def test_validate_counts(spark):
    report = {r.check: r for r in validate(_df(spark), _checks()).collect()}
    assert report["positive"].n_violations == 2  # -2 and null x
    assert report["not_null_name"].n_violations == 1
    assert report["positive"].n_rows == 4
    assert abs(report["positive"].violation_rate - 0.5) < 1e-12


def test_flag_violations_rows(spark):
    flagged = {
        (r.x, r.name): r.failed_checks for r in flag_violations(_df(spark), _checks()).collect()
    }
    assert flagged[(1, "a")] == []
    assert flagged[(-2, "b")] == ["positive"]
    assert flagged[(3, None)] == ["not_null_name"]
    assert flagged[(None, "d")] == ["positive"]


def test_validate_is_single_scan(spark, sf_dir):
    from spk_sl_validation_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem")
    checks = [
        Check("q", F.col("l_quantity") > 0),
        Check("d", F.col("l_discount") >= 0),
        Check("p", F.col("l_extendedprice") > 0),
    ]
    plan = validate(li, checks)._jdf.queryExecution().executedPlan().toString()
    # All checks fold into one aggregate over one scan — N rules must
    # not mean N scans.
    assert plan.count("FileScan parquet") == 1 or plan.count("Scan parquet") == 1


def test_observe_checks_free_metrics(spark):
    from spk_sl_validation_spark.operators.validation import observe_checks

    observed, obs = observe_checks(_df(spark), _checks())
    # Metrics accumulate during the caller's own action — here a noop
    # write standing in for the pipeline's real sink.
    observed.write.mode("overwrite").format("noop").save()
    got = obs.get
    assert got["positive"] == 2
    assert got["not_null_name"] == 1
    assert got["__n"] == 4
