"""Round-3 continuation: causal / rank statistics operators.

Hand-computed goldens for Mann-Whitney U (midranks with ties),
quantile treatment effects (exact + approx paths), and the IPW ATE
on a saturated confounded design where the Hajek estimator recovers
the true effect exactly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kkbox_churn_prediction_spark.operators.abtest import (
    ipw_ate,
    mann_whitney_u,
    quantile_treatment_effect,
)


def test_mann_whitney_hand_golden(spark):
    # a = [1,2,3], b = [2,4]; midranks 1, 2.5, 2.5, 4, 5
    # R_a = 7.5 -> U_a = 1.5, AUC = 0.25, tie term = 6
    # var_U = 0.5 * (6 - 6/20) = 2.85, z = -1.5/sqrt(2.85)
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (2, "b"), (4, "b")], "v int, g string"
    )
    row = mann_whitney_u(df, F.col("v"), F.col("g")).collect()[0]
    assert row.n_a == 3 and row.n_b == 2
    assert row.u_a == pytest.approx(1.5)
    assert row.auc == pytest.approx(0.25)
    assert row.z_stat == pytest.approx(-1.5 / 2.85**0.5, abs=1e-6)


def test_mann_whitney_group_swap_negates(spark):
    rows = [(i % 7 + (3 if i % 2 else 0), "a" if i % 3 else "b") for i in range(60)]
    df = spark.createDataFrame(rows, "v int, g string")
    fwd = mann_whitney_u(df, F.col("v"), F.col("g")).collect()[0]
    rev = mann_whitney_u(
        df, F.col("v"), F.col("g"), group_a="b", group_b="a"
    ).collect()[0]
    assert fwd.z_stat == pytest.approx(-rev.z_stat, abs=1e-6)
    assert fwd.auc == pytest.approx(1.0 - rev.auc, abs=1e-6)
    # U_a + U_b = n_a * n_b
    assert fwd.u_a + rev.u_a == pytest.approx(fwd.n_a * fwd.n_b)


def test_qte_exact_golden(spark):
    units = spark.createDataFrame(
        [(v, "a") for v in (1, 2, 3, 4)] + [(v, "b") for v in (11, 12, 13, 14)],
        "y int, arm string",
    )
    out = {
        r.q: r
        for r in quantile_treatment_effect(
            units, "arm", "y", (0.25, 0.5, 0.75), exact=True
        ).collect()
    }
    assert out[0.5].q_a == pytest.approx(2.5)
    assert out[0.5].q_b == pytest.approx(12.5)
    assert out[0.5].qte == pytest.approx(10.0)
    assert out[0.25].qte == pytest.approx(10.0)


def test_qte_default_is_approx_path(spark):
    units = spark.createDataFrame(
        [(v % 50, "a" if v % 2 else "b") for v in range(400)], "y int, arm string"
    )
    q = quantile_treatment_effect(units, "arm", "y", (0.5,))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "percentile_approx" in plan or "approx_percentile" in plan
    exact = quantile_treatment_effect(units, "arm", "y", (0.5,), exact=True)
    a = q.collect()[0]
    e = exact.collect()[0]
    assert a.qte == pytest.approx(e.qte, abs=1.0)


def test_ipw_ate_recovers_effect_on_saturated_design(spark):
    # x=0: 8 ctrl y=10, 2 treat y=15 | x=1: 2 ctrl y=13, 8 treat y=18
    # true ATE = 5; naive = 17.4 - 10.6 = 6.8; saturated logistic gives
    # e(0)=0.2, e(1)=0.8 and Hajek-IPW recovers exactly 5.0
    rows = (
        [(0, 10, 0)] * 8
        + [(1, 15, 0)] * 2
        + [(0, 13, 1)] * 2
        + [(1, 18, 1)] * 8
    )
    units = spark.createDataFrame(rows, "t int, y int, x int")
    row = ipw_ate(units, "t", "y", "x", max_bin=1).collect()[0]
    assert row.n_treat == 10 and row.n_ctrl == 10
    assert row.ate_naive == pytest.approx(6.8, abs=1e-6)
    assert row.ate_ipw == pytest.approx(5.0, abs=1e-4)
    # fitted propensity hits the saturated cell rates
    import math

    e0 = 1.0 / (1.0 + math.exp(-row.b))
    e1 = 1.0 / (1.0 + math.exp(-(row.a + row.b)))
    assert e0 == pytest.approx(0.2, abs=1e-4)
    assert e1 == pytest.approx(0.8, abs=1e-4)


def test_ipw_matches_naive_when_unconfounded(spark):
    # treatment independent of x -> propensity flat -> IPW == naive
    rows = [(i % 2, 10 + 3 * (i % 2) + (i % 5), i % 4) for i in range(80)]
    units = spark.createDataFrame(rows, "t int, y int, x int")
    row = ipw_ate(units, "t", "y", "x", max_bin=3).collect()[0]
    assert row.ate_ipw == pytest.approx(row.ate_naive, abs=1e-6)
