"""Resample + forward-fill: density, gap zeros, carry semantics."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _d(day, h=12):
    return dt.datetime(2024, 1, day, h, 0)


def _stream(spark, parts=1):
    rows = [
        ("a", 0, "x", _d(1)),
        ("a", 1, "y", _d(1, 13)),  # same day, later: y wins the day
        ("a", 2, "z", _d(4)),      # days 2,3 are gaps
        ("b", 0, "q", _d(2)),
    ]
    return spark.createDataFrame(
        rows, ["conv_id", "turn_idx", "val", "ts"]
    ).repartition(parts)


def test_daily_grid_dense_with_gap_zeros(spark):
    from kkbox_churn_prediction_spark.operators.resample import resample_ffill

    out = (
        resample_ffill(_stream(spark), "conv_id", "ts", "val", "turn_idx")
        .orderBy("conv_id", "bucket_ts")
        .toPandas()
    )
    a = out[out["conv_id"] == "a"]
    assert [t.day for t in a["bucket_ts"]] == [1, 2, 3, 4]
    assert all(t.hour == 0 for t in a["bucket_ts"])  # wall-clock midnight
    assert list(a["n_rows"]) == [2, 0, 0, 1]
    # day 1 carries 'y' (later same-day row wins); gaps carry it; day 4 -> z
    assert list(a["val_ffill"]) == ["y", "y", "y", "z"]
    b = out[out["conv_id"] == "b"]
    assert len(b) == 1 and b["val_ffill"].iloc[0] == "q"


def test_subdaily_buckets_and_tie_break(spark):
    from kkbox_churn_prediction_spark.operators.resample import resample_ffill

    rows = [
        ("c", 0, "first", dt.datetime(2024, 1, 1, 0, 10)),
        ("c", 1, "second", dt.datetime(2024, 1, 1, 0, 10)),  # same ts: turn_idx breaks
        ("c", 2, "later", dt.datetime(2024, 1, 1, 13, 0)),
    ]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "val", "ts"])
    out = (
        resample_ffill(df, "conv_id", "ts", "val", "turn_idx", step_seconds=21600)
        .orderBy("bucket_ts")
        .toPandas()
    )
    # 6h buckets: 00:00, 06:00, 12:00
    assert [t.hour for t in out["bucket_ts"]] == [0, 6, 12]
    assert list(out["n_rows"]) == [2, 0, 1]
    assert list(out["val_ffill"]) == ["second", "second", "later"]


def test_step_must_tile_day(spark):
    from kkbox_churn_prediction_spark.operators.resample import resample_ffill

    with pytest.raises(ValueError):
        resample_ffill(_stream(spark), "conv_id", "ts", "val", "turn_idx", step_seconds=7 * 3600)


def test_partition_invariant(spark):
    from kkbox_churn_prediction_spark.operators.resample import resample_ffill

    a = sorted(map(tuple, resample_ffill(_stream(spark, 1), "conv_id", "ts", "val", "turn_idx").collect()))
    b = sorted(map(tuple, resample_ffill(_stream(spark, 5), "conv_id", "ts", "val", "turn_idx").collect()))
    assert a == b


def test_total_observed_rows_preserved(spark):
    from kkbox_churn_prediction_spark.operators.resample import resample_ffill

    out = resample_ffill(_stream(spark), "conv_id", "ts", "val", "turn_idx")
    assert out.agg(F.sum("n_rows")).first()[0] == 4
