"""Cohort retention matrix (signup-week × age-week activity).

The standard churn dashboard: bucket every entity into the week of
its FIRST turn (the cohort), then count how many of each cohort are
still active k weeks later. The reference's monthly KPI SQL computes
the marginal actives per month (``sql/04_kpi_metrics.sql``); the
cohort matrix is its two-dimensional generalization and the direct
input to retention-curve plots.

Spark-first shape: cohort assignment is a window MIN over the same
conv_id partitioning everything else uses (no sort — unordered
frame), then ONE distinct + ONE hash agg produce the matrix. Weeks
are integer epoch-week indices (TZ-safe integer arithmetic, the same
``floor(epoch_us(date_trunc week)/week_us)`` key the HLL rollup uses
for cross-engine parity). Retention rate joins the cohort-size row
back via a broadcast of the tiny age-0 slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_WEEK_US = 7 * 86_400 * 1_000_000


def _week_no(ts_col):
    return F.floor(
        F.unix_micros(F.date_trunc("week", ts_col)) / F.lit(_WEEK_US)
    ).cast("bigint")


def cohort_retention(turns: DataFrame) -> DataFrame:
    """Rows ``(cohort_week, age_weeks, n_active, cohort_size,
    retention)``: distinct conversations of cohort c active in week
    c+k, the cohort's size (its age-0 actives — every entity is
    active in its first week by construction), and the ratio."""
    w = Window.partitionBy("conv_id")
    with_cohort = turns.select(
        "conv_id",
        _week_no(F.col("ts")).alias("week_no"),
    ).withColumn("cohort_week", F.min("week_no").over(w))
    active = (
        with_cohort.select(
            "conv_id",
            "cohort_week",
            (F.col("week_no") - F.col("cohort_week")).cast("int").alias("age_weeks"),
        )
        .distinct()
        .groupBy("cohort_week", "age_weeks")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    sizes = (
        active.where(F.col("age_weeks") == 0)
        .select("cohort_week", F.col("n_active").alias("cohort_size"))
    )
    return active.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "age_weeks",
        "n_active",
        "cohort_size",
        (F.col("n_active") / F.col("cohort_size")).alias("retention"),
    )
