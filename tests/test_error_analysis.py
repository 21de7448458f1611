"""Goldens for the error-analysis tail reports (hardest examples +
business-cost rollup, reference src/error_analysis.py:245-308)."""

from __future__ import annotations

import pytest


@pytest.fixture()
def preds(spark):
    # id, p, y — engineered so every category is non-empty and ordered
    rows = [
        ("e01", 0.95, 1),  # TP
        ("e02", 0.90, 0),  # FP (most confident waste)
        ("e03", 0.80, 0),  # FP
        ("e04", 0.45, 1),  # FN (closest miss)
        ("e05", 0.30, 1),  # FN
        ("e06", 0.10, 1),  # FN (high-confidence error: conf 0.9)
        ("e07", 0.05, 0),  # TN
        ("e08", 0.60, 1),  # TP
        ("e09", 0.55, 0),  # FP (borderline)
        ("e10", 0.20, 0),  # TN
    ]
    return spark.createDataFrame(rows, "event_id string, p double, y int")


def test_hardest_examples_categories_and_order(spark, preds):
    from kkbox_churn_prediction_spark.operators.error_analysis import (
        hardest_examples,
    )

    out = hardest_examples(preds, "event_id", "y", "p", k=2).collect()
    by_cat = {}
    for r in out:
        by_cat.setdefault(r["category"], []).append(r)
    # FN sorted by p DESC: e04 (0.45) then e05 (0.30)
    assert [r["event_id"] for r in by_cat["false_negative"]] == ["e04", "e05"]
    # FP sorted by p DESC: e02 (0.90) then e03 (0.80)
    assert [r["event_id"] for r in by_cat["false_positive"]] == ["e02", "e03"]
    # high-confidence errors by confidence DESC: e02 (0.9), e06 (0.9);
    # exact tie at 0.9 breaks on event_id ASC
    assert [r["event_id"] for r in by_cat["high_confidence_error"]] == [
        "e02",
        "e06",
    ]
    hc = by_cat["high_confidence_error"][0]
    assert hc["confidence"] == 0.9 and hc["pred_binary"] == 1 and hc["y"] == 0
    assert hc["error"] == 0.9


def test_hardest_examples_plans_take_ordered(spark, preds):
    """Each branch must plan TakeOrderedAndProject (partition-local
    top-k heaps), never a global sort exchange."""
    from kkbox_churn_prediction_spark.operators.error_analysis import (
        hardest_examples,
    )

    plan = (
        hardest_examples(preds, "event_id", "y", "p", k=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert plan.count("TakeOrderedAndProject") == 3
    assert "Exchange SinglePartition" not in plan


def test_confusion_costs_golden(spark, preds):
    from kkbox_churn_prediction_spark.operators.error_analysis import (
        confusion_costs,
    )

    r = confusion_costs(preds, "y", "p", fp_cost=10.0, fn_cost=50.0).first()
    # tp: e01,e08 / tn: e07,e10 / fp: e02,e03,e09 / fn: e04,e05,e06
    assert (r["tp"], r["tn"], r["fp"], r["fn"]) == (2, 2, 3, 3)
    assert r["total_fp_cost"] == 30.0 and r["total_fn_cost"] == 150.0
    assert r["total_cost"] == 180.0
    # all-positive baseline: (tn+fp)=5 actual negatives * 10 = 50
    # all-negative baseline: (tp+fn)=5 actual positives * 50 = 250
    assert r["cost_vs_all_positive"] == round(180.0 / 50.0, 6)
    assert r["cost_vs_all_negative"] == round(180.0 / 250.0, 6)
    assert r["savings_vs_baseline"] == 50.0 - 180.0


def test_confusion_costs_empty_input_defined(spark):
    """Empty input: confusion counts are UNDEFINED (NULL — the
    oracle's SUM-over-empty answer; the old coalesce-to-0 convention
    diverged cross-engine, r5 empty-sweep), while the guarded
    baseline ratios still collapse to a defined 0.0."""
    from kkbox_churn_prediction_spark.operators.error_analysis import (
        confusion_costs,
    )

    df = spark.createDataFrame([], "event_id string, p double, y int")
    r = confusion_costs(df, "y", "p").first()
    assert (r["tp"], r["tn"], r["fp"], r["fn"]) == (None, None, None, None)
    assert r["total_cost"] is None and r["savings_vs_baseline"] is None
    assert r["cost_vs_all_positive"] == 0.0 and r["cost_vs_all_negative"] == 0.0
