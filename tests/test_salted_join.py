"""Salted skew join: row-identical to the plain join, salt in the key."""

from __future__ import annotations

from pyspark.sql import functions as F


def _sides(spark):
    # skewed big side: one hot conversation
    big = spark.range(2000).select(
        F.when(F.col("id") < 1800, F.lit("hot")).otherwise(
            F.concat(F.lit("c"), F.col("id") % 37)
        ).alias("conv_id"),
        F.col("id").alias("turn_idx"),
    )
    small = spark.createDataFrame(
        [("hot", 1), ("c3", 2), ("c5", 3), ("absent", 9)], ["conv_id", "dim"]
    )
    return big, small


def test_salted_inner_equals_plain(spark):
    from kkbox_churn_prediction_spark.operators.skew import salted_join

    big, small = _sides(spark)
    plain = sorted(map(tuple, big.join(small, "conv_id").collect()))
    salted = sorted(map(tuple, salted_join(big, small, "conv_id", salt_buckets=8).collect()))
    assert salted == plain and len(plain) == 1800 + 2000 // 37 * 0 + len(
        [1 for i in range(1800, 2000) if i % 37 in (3, 5)]
    )


def test_salted_left_equals_plain(spark):
    from kkbox_churn_prediction_spark.operators.skew import salted_join

    big, small = _sides(spark)
    plain = sorted(map(tuple, big.join(small, "conv_id", "left").collect()))
    salted = sorted(
        map(tuple, salted_join(big, small, "conv_id", salt_buckets=8, how="left").collect())
    )
    assert salted == plain


def test_salt_is_in_the_join_key(spark):
    from kkbox_churn_prediction_spark.operators.skew import salted_join

    big, small = _sides(spark)
    plan = (
        salted_join(big, small, "conv_id", salt_buckets=8)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "_salt" in plan
