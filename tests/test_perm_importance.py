"""Permutation feature importance: the signal feature loses AUC when
permuted; a noise feature doesn't."""

from __future__ import annotations

import pytest

from kkbox_churn_prediction_spark.operators.error_analysis import (
    permutation_importance,
)


def test_perm_importance_separates_signal_from_noise(spark):
    rows = []
    for i in range(400):
        signal = float((i * 13) % 100) / 100.0
        noise = float((i * 29) % 97) / 97.0
        y = 1 if signal > 0.6 else 0
        rows.append((i, y, signal, noise))
    df = spark.createDataFrame(rows, "id long, y int, f_sig double, f_noise double")
    out = {
        r.feature: r
        for r in permutation_importance(
            df, "id", "y", {"f_sig": 8.0, "f_noise": 1.0}, intercept=-4.0
        ).collect()
    }
    assert out["base"].auc > 0.99  # the scorer ranks y perfectly
    assert out["base"].importance == 0.0
    assert out["f_sig"].importance > 0.3  # breaking the signal hurts
    assert abs(out["f_noise"].importance) < 0.05  # noise doesn't matter
    assert out["base"].n_pos + out["base"].n_neg == 400


def test_perm_importance_is_a_true_permutation(spark):
    # every variant scores the same multiset of rows: pos/neg counts
    # identical across variants (labels never permuted)
    rows = [(i, i % 3 == 0 and 1 or 0, float(i % 7), float(i % 11)) for i in range(120)]
    df = spark.createDataFrame(rows, "id long, y int, a double, b double")
    out = permutation_importance(df, "id", "y", {"a": 1.0, "b": -0.5}).collect()
    assert len(out) == 3
    assert len({(r.n_pos, r.n_neg) for r in out}) == 1
