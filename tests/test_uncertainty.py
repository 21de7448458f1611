"""Round-3 continuation: temperature scaling, conformal intervals,
pinball loss — hand goldens and statistical invariants."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kkbox_churn_prediction_spark.operators.calibration import (
    conformal_interval,
    pinball_loss,
    temperature_scaling,
)


def _preds(spark, rows):
    return spark.createDataFrame(rows, "fold string, y int, p double")


def test_temperature_identity_when_calibrated(spark):
    # labels drawn to exactly match per-bin confidence -> T ~= 1
    rows = []
    for i in range(20):
        p = (i + 0.5) / 20.0
        n_pos = round(p * 100)
        rows += [("a", 1, p)] * n_pos + [("a", 0, p)] * (100 - n_pos)
    out = temperature_scaling(_preds(spark, rows), "fold", "y", "p", n_bins=20)
    t = out.select("temperature").distinct().collect()
    assert len(t) == 1
    assert t[0].temperature == pytest.approx(1.0, abs=0.05)


def test_temperature_compresses_overconfident(spark):
    # overconfident: true rate pulled halfway to 0.5 -> T > 1
    rows = []
    for i in range(20):
        p = (i + 0.5) / 20.0
        true = 0.5 + (p - 0.5) * 0.4
        n_pos = round(true * 100)
        rows += [("a", 1, p)] * n_pos + [("a", 0, p)] * (100 - n_pos)
    out = temperature_scaling(_preds(spark, rows), "fold", "y", "p", n_bins=20)
    t = out.select("temperature").distinct().collect()[0].temperature
    assert t > 1.5
    # temp_prob must be closer to 0.5 than avg_conf on extreme bins
    row = out.where(F.col("bin") == 19).collect()[0]
    assert abs(row.temp_prob - 0.5) < abs(row.avg_conf - 0.5)


def test_conformal_hand_golden(spark):
    # one group; cal scores are |y - mean|; mean over cal ys [0..9]*10
    # = 45; alpha=0.1 with n_cal=10 -> k = ceil(11*0.9) = 10 -> qhat =
    # max cal score = 45
    rows = [("g", i * 10, "cal") for i in range(10)]
    rows += [("g", 45, "test"), ("g", 0, "test"), ("g", 200, "test")]
    df = spark.createDataFrame(rows, "grp string, y int, sp string")
    out = conformal_interval(df, "grp", "y", "sp", alpha=0.1).collect()[0]
    assert out.n_cal == 10 and out.n_test == 3
    assert out.k == 10
    assert out.qhat == pytest.approx(45.0)
    # covered: |45-45|=0 <= 45, |0-45|=45 <= 45; |200-45|=155 > 45
    assert out.coverage == pytest.approx(2 / 3, abs=1e-6)
    assert out.mean_width == pytest.approx(90.0)


def test_conformal_coverage_guarantee(spark):
    # iid cal/test from the same discrete distribution: achieved
    # coverage >= 1 - alpha in expectation; with this deterministic
    # construction both halves are identical so coverage >= 0.9 holds
    rows = []
    for i in range(500):
        y = (i * 37) % 100
        rows.append(("g", y, "cal" if i % 2 == 0 else "test"))
    df = spark.createDataFrame(rows, "grp string, y int, sp string")
    out = conformal_interval(df, "grp", "y", "sp", alpha=0.1).collect()[0]
    assert out.coverage >= 0.9


def test_pinball_hand_golden(spark):
    # cal ys 0..100 -> q(0.5)=50 exactly; test ys {40, 60}:
    # loss = mean(max(.5*(y-50), .5*(50-y))) = mean(5, 5) = 5
    rows = [("g", i, "cal") for i in range(101)]
    rows += [("g", 40, "test"), ("g", 60, "test")]
    df = spark.createDataFrame(rows, "grp string, y int, sp string")
    out = {
        r.tau: r
        for r in pinball_loss(df, "grp", "y", "sp", (0.5,), exact=True).collect()
    }
    assert out[0.5].q_pred == pytest.approx(50.0)
    assert out[0.5].n_eval == 2
    assert out[0.5].pinball == pytest.approx(5.0)


def test_pinball_asymmetric_taus(spark):
    # tau=0.9 penalizes under-prediction 9x over-prediction
    rows = [("g", i, "cal") for i in range(101)]
    rows += [("g", 100, "test")]  # above q90=90
    df = spark.createDataFrame(rows, "grp string, y int, sp string")
    out = {
        r.tau: r
        for r in pinball_loss(
            df, "grp", "y", "sp", (0.1, 0.9), exact=True
        ).collect()
    }
    # q10 = 10, y=100: loss = 0.1*(100-10) = 9; q90 = 90: 0.9*(100-90) = 9
    assert out[0.1].pinball == pytest.approx(9.0)
    assert out[0.9].pinball == pytest.approx(9.0)


def test_pinball_proper_scoring(spark):
    # the pinball loss at tau is minimized by the true tau-quantile:
    # a predictor fitted on the SAME distribution beats a shifted one
    rows = [("g", (i * 13) % 200, "cal") for i in range(400)]
    rows += [("g", (i * 13) % 200, "test") for i in range(400)]
    df = spark.createDataFrame(rows, "grp string, y int, sp string")
    good = pinball_loss(df, "grp", "y", "sp", (0.5,), exact=True).collect()[0]
    shifted = df.withColumn(
        "y", F.when(F.col("sp") == "cal", F.col("y") + 60).otherwise(F.col("y"))
    )
    bad = pinball_loss(shifted, "grp", "y", "sp", (0.5,), exact=True).collect()[0]
    assert good.pinball < bad.pinball
