"""Round-3 continuation: group fairness metrics + schema drift."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kkbox_churn_prediction_spark.operators.fairness import group_fairness
from kkbox_churn_prediction_spark.operators.profile import schema_drift_report


def _preds(spark, rows):
    return spark.createDataFrame(rows, "g string, y int, yhat int")


def test_fairness_hand_golden(spark):
    # group a: tp=2 fp=1 fn=1 tn=1 -> pos_rate 3/5, tpr 2/3, fpr 1/2
    rows = [
        ("a", 1, 1), ("a", 1, 1), ("a", 0, 1), ("a", 1, 0), ("a", 0, 0),
        ("b", 1, 1), ("b", 0, 0),
    ]
    out = {
        r.group: r
        for r in group_fairness(
            _preds(spark, rows), F.col("g"), F.col("y"), F.col("yhat")
        ).collect()
    }
    a = out["a"]
    assert (a.tp, a.fp, a.fn, a.tn) == (2, 1, 1, 1)
    assert a.pos_rate == pytest.approx(0.6)
    assert a.tpr == pytest.approx(2 / 3, abs=1e-6)
    assert a.fpr == pytest.approx(0.5)
    b = out["b"]
    assert b.pos_rate == pytest.approx(0.5)


def test_fairness_identical_groups_zero_gaps(spark):
    # two groups with IDENTICAL confusion behavior -> every gap is 0
    block = [(1, 1), (1, 0), (0, 1), (0, 0), (1, 1)]
    rows = [("a", y, p) for y, p in block] + [("b", y, p) for y, p in block]
    out = group_fairness(
        _preds(spark, rows), F.col("g"), F.col("y"), F.col("yhat")
    ).collect()
    for r in out:
        assert r.dp_gap == pytest.approx(0.0)
        assert r.tpr_gap == pytest.approx(0.0)
        assert r.fpr_gap == pytest.approx(0.0)


def test_fairness_degenerate_cohort(spark):
    # group with no negatives: fpr must be a defined 0.0, not NULL
    rows = [("a", 1, 1), ("a", 1, 0), ("b", 0, 1), ("b", 1, 1)]
    out = {
        r.group: r
        for r in group_fairness(
            _preds(spark, rows), F.col("g"), F.col("y"), F.col("yhat")
        ).collect()
    }
    assert out["a"].fpr == 0.0
    assert out["a"].tpr == pytest.approx(0.5)


def test_fairness_dp_gap_detects_skew(spark):
    # group a always predicted positive, b never -> dp gaps symmetric
    rows = [("a", 1, 1)] * 4 + [("b", 1, 0)] * 4
    out = {
        r.group: r
        for r in group_fairness(
            _preds(spark, rows), F.col("g"), F.col("y"), F.col("yhat")
        ).collect()
    }
    assert out["a"].dp_gap == pytest.approx(0.5)
    assert out["b"].dp_gap == pytest.approx(-0.5)


def test_schema_drift_hand_golden(spark):
    rows = [
        # early half: a never null, 2 distinct; b half null
        (1, "x", "p"), (1, "y", None), (1, "x", "q"), (1, "y", None),
        # late half: a gains a null + new value
        (0, None, "p"), (0, "z", "p"),
    ]
    df = spark.createDataFrame(rows, "early int, a string, b string")
    out = {
        r.column: r
        for r in schema_drift_report(
            df, ["a", "b"], F.col("early") == 1
        ).collect()
    }
    a = out["a"]
    assert (a.n_early, a.n_late) == (4, 2)
    assert a.null_rate_early == pytest.approx(0.0)
    assert a.null_rate_late == pytest.approx(0.5)
    assert a.null_rate_delta == pytest.approx(-0.5)
    assert (a.ndv_early, a.ndv_late) == (2, 1)
    b = out["b"]
    assert b.null_rate_early == pytest.approx(0.5)
    assert (b.ndv_early, b.ndv_late) == (2, 1)


def test_schema_drift_all_null_column(spark):
    df = spark.createDataFrame(
        [(1, None), (0, None)], "early int, c string"
    )
    out = schema_drift_report(df, ["c"], F.col("early") == 1).collect()[0]
    assert out.ndv_early == 0 and out.ndv_late == 0
    assert out.null_rate_early == 1.0 and out.null_rate_late == 1.0


def test_schema_drift_numeric_columns(spark):
    df = spark.createDataFrame(
        [(1, 1.5, 10), (1, 2.5, 10), (0, 1.5, 20), (0, None, 30)],
        "early int, v double, u long",
    )
    out = {
        r.column: r
        for r in schema_drift_report(df, ["v", "u"], F.col("early") == 1).collect()
    }
    assert (out["v"].ndv_early, out["v"].ndv_late) == (2, 1)
    assert out["v"].null_rate_late == pytest.approx(0.5)
    assert (out["u"].ndv_early, out["u"].ndv_late) == (1, 2)
