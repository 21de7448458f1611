"""Bucketed co-located join: the shuffle-elimination layout for
repeated joins on the same key (SURVEY §4 custom #1; the local stand-in
for Iceberg `bucket(conv_id)` partitioning, which needs the Iceberg
runtime jar this image lacks — see ``sources.io``)."""

from __future__ import annotations

import tempfile
from datetime import datetime, timedelta

import pandas as pd
import pytest

from kkbox_churn_prediction_spark.sources.synth import to_spark


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    t0 = datetime(2024, 1, 1)
    pdf = pd.DataFrame(
        {
            "conv_id": [f"c{i % 50}" for i in range(500)],
            "turn_idx": [i // 50 for i in range(500)],
            "role": ["user"] * 500,
            "text": ["x"] * 500,
            "tool": [None] * 500,
            "ts": [t0 + timedelta(minutes=i) for i in range(500)],
        }
    )
    df = to_spark(spark, pdf)
    for name in ("bt_turns", "bt_feats"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    # external tables with explicit locations (the session's warehouse
    # dir is a static config; bucketing metadata lives in the catalog
    # either way)
    df.write.bucketBy(8, "conv_id").sortBy("conv_id", "ts").option(
        "path", str(wh / "bt_turns")
    ).saveAsTable("bt_turns")
    df.groupBy("conv_id").count().write.bucketBy(8, "conv_id").option(
        "path", str(wh / "bt_feats")
    ).saveAsTable("bt_feats")
    yield "bt_turns", "bt_feats"
    for name in ("bt_turns", "bt_feats"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    """Both sides bucketed by conv_id with the same bucket count →
    the join plan contains NO Exchange (the co-location contract that
    Iceberg bucket partitioning provides at 10^12 rows)."""
    t, f = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(t).join(spark.table(f), "conv_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 500
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_unbucketed_join_does_shuffle(spark, bucketed_tables):
    """Control: the same join against a genuinely unbucketed side
    (round-tripped through plain parquet, so no bucket metadata and
    no inherited distribution) shuffles — proving the Exchange
    elimination above came from the bucket layout, not broadcast."""
    t, _ = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        with tempfile.TemporaryDirectory() as d:
            spark.table(t).groupBy("conv_id").count().write.mode(
                "overwrite"
            ).parquet(d)
            plain = spark.read.parquet(d)
            joined = spark.table(t).join(plain, "conv_id")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" in plan
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_date_partitioned_scan_prunes(spark, tmp_path):
    """Writing day-partitioned parquet (the local stand-in for Iceberg
    `days(ts)`) and filtering on the partition column must prune at
    the scan: the lookback predicate of the as-of join then skips
    whole days of data before any I/O — the load-bearing optimization
    at 10^12 turns."""
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    t0 = datetime(2024, 1, 1)
    pdf = pd.DataFrame(
        {
            "conv_id": ["c1"] * 96,
            "turn_idx": range(96),
            "role": ["user"] * 96,
            "text": ["x"] * 96,
            "tool": [None] * 96,
            "ts": [t0 + timedelta(hours=i) for i in range(96)],  # 4 days
        }
    )
    out = f"{tmp_path}/by_day"
    to_spark(spark, pdf).withColumn("day", F.to_date("ts")).write.partitionBy(
        "day"
    ).parquet(out)

    df = spark.read.parquet(out).where(F.col("day") == "2024-01-02")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "2024-01-02" in plan  # the literal reached the partition filter
    assert df.count() == 24
