"""Algebraic invariants for the round-3 session operators: CCF swap
symmetry, STL shift equivariance, rolling-active window monotonicity,
ESS bounds."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _ts(day: int, hour: int = 0):
    return dt.datetime(2024, 2, day, hour, 0, 0)


def _two_role_turns(spark, user_daily, assistant_daily):
    rows = []
    for day, n in enumerate(user_daily, start=1):
        rows += [("c1", i, "user", _ts(day, i % 24)) for i in range(n)]
    for day, n in enumerate(assistant_daily, start=1):
        rows += [
            ("c1", 500 + i, "assistant", _ts(day, i % 24)) for i in range(n)
        ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts timestamp"
    )


def test_ccf_role_swap_mirrors_lag_axis(spark):
    from kkbox_churn_prediction_spark.operators.windows import ccf_daily

    t = _two_role_turns(
        spark, [3, 1, 4, 1, 5, 9, 2, 6], [2, 7, 1, 8, 2, 8, 1, 8]
    )
    ab = {r["lag"]: r["ccf"] for r in ccf_daily(t, "user", "assistant", 3).collect()}
    ba = {r["lag"]: r["ccf"] for r in ccf_daily(t, "assistant", "user", 3).collect()}
    for k in range(-3, 4):
        if ab[k] is None:
            assert ba[-k] is None
        else:
            assert ab[k] == pytest.approx(ba[-k], abs=1e-9)


def test_stl_shift_equivariance(spark):
    from kkbox_churn_prediction_spark.operators.windows import stl_daily

    base = [4, 7, 2, 9, 5, 8, 3, 6, 4, 7, 2, 9, 5, 8]
    shifted = [c + 10 for c in base]

    def series(counts):
        rows = []
        for day, n in enumerate(counts, start=1):
            rows += [("c1", i, "user", _ts(day, i % 24)) for i in range(n)]
        return spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, ts timestamp"
        )

    a = {r["d"].day: r for r in stl_daily(series(base)).collect()}
    b = {r["d"].day: r for r in stl_daily(series(shifted)).collect()}
    for day in a:
        # trend absorbs the +10 level shift; seasonal and remainder are
        # shift-invariant (both defined on detrended values)
        assert b[day]["trend"] == pytest.approx(a[day]["trend"] + 10, abs=1e-6)
        assert b[day]["seasonal"] == pytest.approx(a[day]["seasonal"], abs=1e-6)
        assert b[day]["remainder"] == pytest.approx(
            a[day]["remainder"], abs=1e-6
        )


def test_rolling_active_monotone_in_window(spark):
    from kkbox_churn_prediction_spark.operators.windows import (
        rolling_active_entities,
    )

    rows = []
    for i in range(80):
        rows.append(
            ("c%d" % (i % 7), i, "user", _ts(1 + (i * 3) % 11, i % 24))
        )
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts timestamp"
    )
    w1 = {r["d"]: r["active_window"] for r in rolling_active_entities(t, 1).collect()}
    w3 = {r["d"]: r["active_window"] for r in rolling_active_entities(t, 3).collect()}
    w7 = {r["d"]: r["active_window"] for r in rolling_active_entities(t, 7).collect()}
    n_convs = t.select("conv_id").distinct().count()
    for d, v in w3.items():
        assert v >= w1.get(d, 0)
        assert w7[d] >= v
        assert w7[d] <= n_convs


def test_ess_bounds_and_scale_invariance(spark):
    from kkbox_churn_prediction_spark.operators.sampling import (
        weight_diagnostics,
    )

    df = spark.createDataFrame(
        [(float(1 + i % 5),) for i in range(40)], "weight double"
    )
    r = weight_diagnostics(df, "weight").collect()[0]
    assert 1.0 <= r["ess"] <= r["n_rows"]
    # ESS is scale-invariant: w → 10w leaves ess/ess_frac/cv unchanged
    r10 = weight_diagnostics(
        df.withColumn("weight", F.col("weight") * 10), "weight"
    ).collect()[0]
    assert r10["ess"] == pytest.approx(r["ess"], abs=1e-6)
    assert r10["cv_w"] == pytest.approx(r["cv_w"], abs=1e-6)
    assert r10["max_w_share"] == pytest.approx(r["max_w_share"], abs=1e-6)
