"""Column profiler: exact goldens, approx tolerance, no-Expand plan."""

from __future__ import annotations

from pyspark.sql import functions as F


def _df(spark):
    rows = [
        (1, "a", None),
        (2, "a", 5.0),
        (3, None, 5.0),
        (4, "b", 7.5),
        (4, "b", 7.5),
    ]
    return spark.createDataFrame(rows, ["k", "s", "v"])


def test_profile_goldens(spark):
    from kkbox_churn_prediction_spark.operators.profile import profile_table

    out = {r["column"]: r.asDict() for r in profile_table(_df(spark), ["k", "s", "v"]).collect()}
    assert out["k"] == {
        "column": "k", "n_rows": 5, "n_null": 0, "n_distinct": 4,
        "min_str": "1", "max_str": "4",
    }
    assert out["s"]["n_null"] == 1 and out["s"]["n_distinct"] == 2
    assert out["s"]["min_str"] == "a" and out["s"]["max_str"] == "b"
    assert out["v"]["n_null"] == 1 and out["v"]["n_distinct"] == 2
    assert out["v"]["min_str"] == "5.0" and out["v"]["max_str"] == "7.5"


def test_all_null_column(spark):
    from kkbox_churn_prediction_spark.operators.profile import profile_table

    df = _df(spark).withColumn("z", F.lit(None).cast("int"))
    row = {r["column"]: r for r in profile_table(df, ["z"]).collect()}["z"]
    assert row["n_null"] == 5 and row["n_distinct"] == 0
    assert row["min_str"] is None and row["max_str"] is None


def test_approx_mode_tolerance_and_single_pass(spark):
    from kkbox_churn_prediction_spark.operators.profile import profile_table

    df = spark.range(20000).select(
        F.col("id").alias("k"), (F.col("id") % 997).alias("m")
    )
    out = {r["column"]: r for r in profile_table(df, ["k", "m"], approx=True).collect()}
    assert abs(out["k"]["n_distinct"] - 20000) / 20000 < 0.05
    assert abs(out["m"]["n_distinct"] - 997) / 997 < 0.05
    # approx profile is ONE aggregation job — no join in the plan
    plan = profile_table(df, ["k", "m"], approx=True)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_exact_plan_has_no_expand(spark):
    from kkbox_churn_prediction_spark.operators.profile import profile_table

    plan = (
        profile_table(_df(spark), ["k", "s", "v"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" not in plan
