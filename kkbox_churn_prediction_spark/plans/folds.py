"""Backtest fold driver (reference ``src/backtest.py:309-331`` +
``src/temporal_cv.py:94-150``).

The reference loops folds in Python, re-templating SQL text and
materializing a pandas frame per fold (``backtest.py:75-82``), then
tags each CSV with a ``window`` column (``:334-338``). Here folds are
DATA: the cutoff grid carries a fold tag, ALL folds compute in one
Catalyst plan (the as-of join replicates turns per qualifying fold
cutoff), and the fold tag partitions the output — zero driver-side
loops.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kkbox_churn_prediction_spark.operators.horizons import DEFAULT_SPECS
from kkbox_churn_prediction_spark.operators.labels import entity_labels
from kkbox_churn_prediction_spark.plans.backfill import backfill_features


def make_folds(
    spark: SparkSession,
    start: datetime,
    n_folds: int,
    step_days: int = 7,
) -> DataFrame:
    """Sliding fold grid: fold i cuts at start + i*step. Expanding vs
    sliding only changes the feature lookback, which is a horizon
    parameter, not a grid property."""
    rows = [
        (f"fold_{i}", start + timedelta(days=i * step_days)) for i in range(n_folds)
    ]
    return spark.createDataFrame(rows, "fold string, cutoff_ts timestamp")


def backtest(
    turns: DataFrame,
    folds: DataFrame,
    horizons_days: tuple[int, ...] = (1, 3, 7),
    label_horizon_days: int = 3,
) -> DataFrame:
    """Features as-of each fold cutoff + next-event label AFTER it —
    the (feature-cutoff, label-window) pair of the reference's
    ``cutoff_YYYY-MM:expire_YYYY-MM`` windows (``backtest.py:8-16``).
    Inner join features⋈labels on (conv_id, cutoff_ts) = J5.
    """
    cutoffs = folds.select("cutoff_ts").distinct()
    feats = backfill_features(turns, cutoffs, horizons_days, DEFAULT_SPECS)
    labels = entity_labels(turns, cutoffs, label_horizon_days)
    out = feats.join(labels, ["conv_id", "cutoff_ts"], "inner")
    return out.join(F.broadcast(folds), ["cutoff_ts"], "inner")
