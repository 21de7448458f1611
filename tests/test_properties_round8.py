"""Algebraic invariants for the round-3 robust/outlier operators —
the property-round discipline (catches formula bugs oracles mirror).
"""

from __future__ import annotations

import pytest

from kkbox_churn_prediction_spark.operators.robust import (
    esd_topk_outliers,
    huber_location,
)


def test_huber_shift_equivariance(spark):
    vals = [((i * 11) % 40 + (i % 5) * 6,) for i in range(300)]
    df = spark.createDataFrame([(float(v[0]),) for v in vals], "v double")
    df_shift = spark.createDataFrame(
        [(float(v[0] + 1000),) for v in vals], "v double"
    )
    a = huber_location(df, "v").collect()[0]
    b = huber_location(df_shift, "v").collect()[0]
    # location estimators commute with translation; scale is invariant
    assert b.huber_mu == pytest.approx(a.huber_mu + 1000, abs=1e-5)
    assert b.median == a.median + 1000
    assert b.mad == a.mad
    assert b.k == a.k


def test_esd_zscores_shift_invariant(spark):
    rows = [(i, 50 + (i * 13) % 9) for i in range(40)]
    rows[7] = (7, 500)
    shifted = [(k, v + 10000) for k, v in rows]
    a = sorted(
        esd_topk_outliers(
            spark.createDataFrame(rows, "k int, v long"), "k", "v", n_rounds=3
        ).collect(),
        key=lambda r: r.round,
    )
    b = sorted(
        esd_topk_outliers(
            spark.createDataFrame(shifted, "k int, v long"), "k", "v", n_rounds=3
        ).collect(),
        key=lambda r: r.round,
    )
    # studentized scores don't move under translation; picks agree
    assert [r.key for r in a] == [r.key for r in b]
    for ra, rb in zip(a, b):
        assert rb.zscore == pytest.approx(ra.zscore, abs=1e-6)
        assert rb.value == ra.value + 10000


def test_esd_first_pick_is_global_argmax_z(spark):
    # round 1 must equal the one-shot max-|z| point
    rows = [(i, (i * 17) % 23) for i in range(50)]
    rows[31] = (31, 400)
    df = spark.createDataFrame(rows, "k int, v long")
    out = esd_topk_outliers(df, "k", "v", n_rounds=1).collect()[0]
    assert out.key == 31 and out.round == 1
