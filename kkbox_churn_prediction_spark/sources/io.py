"""Sinks: parquet always; Iceberg when the runtime is on the classpath.

The reference sinks are CSV/Parquet COPY (``src/make_dataset.py:118-136``,
``features_comprehensive_processor.py:94``) plus Postgres upsert
(``sql/02_create_core_tables.sql:107-117``). The engine's production
sink is an Iceberg table (partitioned ``days(ts)`` + bucket(conv_id),
MERGE INTO for idempotent upsert); the Iceberg jars are NOT in this
image, so it is gated and falls back to partitioned parquet, which
the checkpoint manifest (``plans.manifest``) makes idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Table  # noqa: SLF001
        return True
    except Exception:
        return False


ICEBERG_DDL = """
CREATE TABLE IF NOT EXISTS {table} (
    conv_id STRING NOT NULL,
    turn_idx INT NOT NULL,
    role STRING,
    text STRING,
    tool STRING,
    ts TIMESTAMP
) USING iceberg
PARTITIONED BY (days(ts), bucket(64, conv_id))
"""


def write_transcripts(df: DataFrame, path_or_table: str) -> None:
    """Iceberg append when available; else date-partitioned parquet
    (same pruning behavior for the as-of lookback predicate)."""
    spark = df.sparkSession
    if iceberg_available(spark) and "." in path_or_table:
        df.writeTo(path_or_table).append()
        return
    from pyspark.sql import functions as F

    (
        df.withColumn("_dt", F.to_date("ts"))
        .write.mode("overwrite")
        .partitionBy("_dt")
        .parquet(path_or_table)
    )


def write_features(df: DataFrame, path: str, partition_cols: tuple[str, ...] = ()) -> None:
    w = df.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)
