"""Expanding vs sliding fold policies (VERDICT #4; reference
``src/temporal_cv.py:110-150`` TemporalSplit)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pyspark.sql.functions as F
import pytest


def test_make_folds_policies(spark):
    from kkbox_churn_prediction_spark.plans.folds import make_folds

    start = datetime(2024, 1, 8)
    sliding = make_folds(spark, start, 4, step_days=7, policy="sliding").collect()
    expanding = make_folds(spark, start, 4, step_days=7, policy="expanding").collect()
    assert [r["lookback_days"] for r in sorted(sliding, key=lambda r: r["cutoff_ts"])] == [7, 7, 7, 7]
    assert [r["lookback_days"] for r in sorted(expanding, key=lambda r: r["cutoff_ts"])] == [7, 14, 21, 28]
    # every expanding fold's window reaches the SAME start: cutoff - lookback
    starts = {
        r["cutoff_ts"] - timedelta(days=r["lookback_days"]) for r in expanding
    }
    assert starts == {datetime(2024, 1, 1)}
    with pytest.raises(ValueError):
        make_folds(spark, start, 2, policy="bogus")


def test_expanding_cutoffs_reaches_common_start(spark):
    from kkbox_churn_prediction_spark.plans.folds import expanding_cutoffs

    cutoffs = spark.createDataFrame(
        [(datetime(2024, 1, 8),), (datetime(2024, 1, 15),), (datetime(2024, 1, 29),)],
        "cutoff_ts timestamp",
    )
    out = expanding_cutoffs(cutoffs, base_lookback_days=7).collect()
    got = {r["cutoff_ts"]: r["lookback_days"] for r in out}
    assert got == {
        datetime(2024, 1, 8): 7,
        datetime(2024, 1, 15): 14,
        datetime(2024, 1, 29): 28,
    }


@pytest.fixture(scope="module")
def tiny_matrix(spark):
    rows = [
        (c, datetime(2024, 1, 8) + timedelta(days=7 * i))
        for c in ("c1", "c2")
        for i in range(3)
    ]
    return spark.createDataFrame(rows, "conv_id string, cutoff_ts timestamp")


@pytest.fixture(scope="module")
def tiny_folds(spark):
    rows = [
        (f"fold_{i}", datetime(2024, 1, 8) + timedelta(days=7 * i)) for i in range(3)
    ]
    return spark.createDataFrame(rows, "fold string, cutoff_ts timestamp")


def test_assign_cv_folds_expanding(tiny_matrix, tiny_folds):
    from kkbox_churn_prediction_spark.plans.folds import assign_cv_folds

    out = assign_cv_folds(tiny_matrix, tiny_folds, "expanding").collect()
    by = {}
    for r in out:
        by.setdefault((r["fold"], r["split"]), set()).add(
            (r["conv_id"], r["cutoff_ts"])
        )
    b = [datetime(2024, 1, 8) + timedelta(days=7 * i) for i in range(3)]
    # fold_0 is the first boundary → no validation fold for it
    assert not any(f == "fold_0" for f, _ in by)
    assert by[("fold_1", "val")] == {("c1", b[1]), ("c2", b[1])}
    assert by[("fold_1", "train")] == {("c1", b[0]), ("c2", b[0])}
    assert by[("fold_2", "val")] == {("c1", b[2]), ("c2", b[2])}
    # expanding: trains on ALL prior boundaries
    assert by[("fold_2", "train")] == {
        ("c1", b[0]), ("c2", b[0]), ("c1", b[1]), ("c2", b[1])
    }


def test_assign_cv_folds_sliding(tiny_matrix, tiny_folds):
    from kkbox_churn_prediction_spark.plans.folds import assign_cv_folds

    out = assign_cv_folds(tiny_matrix, tiny_folds, "sliding").collect()
    by = {}
    for r in out:
        by.setdefault((r["fold"], r["split"]), set()).add(r["cutoff_ts"])
    b = [datetime(2024, 1, 8) + timedelta(days=7 * i) for i in range(3)]
    # sliding: trains only on the immediately-previous boundary
    assert by[("fold_2", "train")] == {b[1]}
    assert by[("fold_1", "train")] == {b[0]}


def test_backtest_expanding_widens_window(spark):
    """A turn older than max(horizons) before a late cutoff is
    invisible to the sliding policy but counted by expanding's
    *_full window."""
    from kkbox_churn_prediction_spark.plans.folds import backtest

    turns = spark.createDataFrame(
        [
            ("c1", 0, "user", "early turn", None, datetime(2024, 1, 2, 10)),
            ("c1", 1, "user", "late turn", None, datetime(2024, 1, 16, 10)),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    folds = spark.createDataFrame(
        [("fold_a", datetime(2024, 1, 8)), ("fold_b", datetime(2024, 1, 22))],
        "fold string, cutoff_ts timestamp",
    )
    exp = backtest(turns, folds, (1, 3, 7), 3, lookback_policy="expanding")
    rows = {(r["conv_id"], r["fold"]): r for r in exp.collect()}
    late = rows[("c1", "fold_b")]
    # 7d horizon sees only the late turn; the expanding full window
    # (lookback 21d: back to Jan 1) also sees the early turn
    assert late["turn_cnt_7d"] == 1
    assert late["turn_cnt_full"] == 2
    early = rows[("c1", "fold_a")]
    assert early["turn_cnt_full"] == 1
    # sliding: full columns absent, 7d counts unchanged
    sli = backtest(turns, folds, (1, 3, 7), 3, lookback_policy="sliding")
    assert "turn_cnt_full" not in sli.columns
    srows = {(r["conv_id"], r["fold"]): r for r in sli.collect()}
    assert srows[("c1", "fold_b")]["turn_cnt_7d"] == 1
