"""Round-3 continuation: Brown double exponential smoothing."""

from __future__ import annotations

import datetime as dt

import pytest

from kkbox_churn_prediction_spark.operators.windows import (
    brown_double_daily,
    ewma_daily,
)


def _daily_turns(spark, counts):
    rows = []
    for i, c in enumerate(counts):
        day = dt.datetime(2024, 1, 1) + dt.timedelta(days=i)
        rows += [(f"c{i}_{j}", day + dt.timedelta(seconds=j)) for j in range(c)]
    return spark.createDataFrame(rows, "conv_id string, ts timestamp")


def test_brown_constant_series_is_flat(spark):
    rows = sorted(
        brown_double_daily(_daily_turns(spark, [12] * 15)).collect(),
        key=lambda r: r.d,
    )
    for r in rows:
        assert r.s1 == pytest.approx(12.0)
        assert r.s2 == pytest.approx(12.0)
    for r in rows[1:]:
        assert r.forecast == pytest.approx(12.0)
        assert r.forecast_err == pytest.approx(0.0)


def test_brown_beats_single_ewma_on_a_ramp(spark):
    # a steady ramp: single EWMA lags behind (negative forecast err
    # everywhere); the double-smoothing forecast cancels most of the lag
    counts = [10 + 5 * i for i in range(20)]
    turns = _daily_turns(spark, counts)
    brown = {r.d: r for r in brown_double_daily(turns, halving_days=3).collect()}
    ewma = {r.d: r for r in ewma_daily(turns, halving_days=3).collect()}
    days = sorted(brown)[5:]  # skip warm-up
    brown_mae = sum(abs(brown[d].forecast_err) for d in days) / len(days)
    ewma_mae = sum(abs(ewma[d].forecast_err) for d in days) / len(days)
    assert brown_mae < ewma_mae


def test_brown_first_day_sentinels(spark):
    rows = sorted(
        brown_double_daily(_daily_turns(spark, [5, 8, 11])).collect(),
        key=lambda r: r.d,
    )
    assert rows[0].forecast == -1.0 and rows[0].forecast_err == 0.0
