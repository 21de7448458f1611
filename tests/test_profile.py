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


def test_table_checksum_order_invariant_and_sensitive(spark):
    from kkbox_churn_prediction_spark.operators.profile import table_checksum

    rows = [(1, "a", None), (2, "b", "x"), (3, "c", "y")]
    cols = ["id", "s", "t"]
    a = table_checksum(spark.createDataFrame(rows, cols), cols).first()
    # same rows, reversed order, different partitioning → identical
    b = table_checksum(
        spark.createDataFrame(list(reversed(rows)), cols).repartition(7), cols
    ).first()
    assert (a["n_rows"], a["checksum_sum"], a["checksum_xor"]) == (
        b["n_rows"], b["checksum_sum"], b["checksum_xor"],
    )
    # one changed value → both reductions move
    c = table_checksum(
        spark.createDataFrame([(1, "a", None), (2, "b", "x"), (3, "c", "z")], cols),
        cols,
    ).first()
    assert c["checksum_sum"] != a["checksum_sum"]
    assert c["checksum_xor"] != a["checksum_xor"]
    # NULL vs empty string must differ (sentinel, not concat_ws skip)
    sch = "id bigint, s string, t string"
    d = table_checksum(spark.createDataFrame([(1, "a", "")], sch), cols).first()
    e = table_checksum(spark.createDataFrame([(1, "a", None)], sch), cols).first()
    assert d["checksum_sum"] != e["checksum_sum"]
    # duplicate pair: xor cancels (documented blind spot), sum catches
    f = table_checksum(
        spark.createDataFrame(rows + [rows[0], rows[0]], cols), cols
    ).first()
    assert f["checksum_xor"] == a["checksum_xor"]
    assert f["checksum_sum"] != a["checksum_sum"] and f["n_rows"] == 5
