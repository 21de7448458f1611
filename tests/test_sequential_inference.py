"""Round-3 continuation: effect sizes, BH-FDR, deterministic
permutation test, always-valid mSPRT — hand goldens + invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kkbox_churn_prediction_spark.functions.text import stable_hash48
from kkbox_churn_prediction_spark.operators.abtest import (
    benjamini_hochberg,
    effect_sizes,
    msprt_always_valid,
    permutation_test,
)


def _vals(spark, a, b):
    rows = [("a", int(v)) for v in a] + [("b", int(v)) for v in b]
    return spark.createDataFrame(rows, "g string, y long")


def test_effect_sizes_hand_golden(spark):
    # a=[1,2,3], b=[4,5,6]: var=1 each, sp2=1 -> d=-3; g=d*(1-3/15)=-2.4;
    # every a-draw < every b-draw -> Cliff's delta = -1
    out = effect_sizes(_vals(spark, [1, 2, 3], [4, 5, 6]), F.col("y"), F.col("g")).collect()[0]
    assert out.n_a == 3 and out.n_b == 3
    assert out.mean_diff == pytest.approx(-3.0)
    assert out.cohens_d == pytest.approx(-3.0)
    assert out.hedges_g == pytest.approx(-2.4)
    assert out.cliffs_delta == pytest.approx(-1.0)


def test_effect_sizes_shift_invariant(spark):
    a, b = [3, 7, 9, 9, 12], [5, 5, 8, 14]
    base = effect_sizes(_vals(spark, a, b), F.col("y"), F.col("g")).collect()[0]
    shft = effect_sizes(
        _vals(spark, [v + 100 for v in a], [v + 100 for v in b]),
        F.col("y"),
        F.col("g"),
    ).collect()[0]
    assert shft.cohens_d == pytest.approx(base.cohens_d, abs=1e-9)
    assert shft.hedges_g == pytest.approx(base.hedges_g, abs=1e-9)
    assert shft.cliffs_delta == pytest.approx(base.cliffs_delta, abs=1e-9)
    assert shft.mean_diff == pytest.approx(base.mean_diff, abs=1e-9)


def test_effect_sizes_scale_invariant(spark):
    a, b = [3, 7, 9, 9, 12], [5, 5, 8, 14]
    base = effect_sizes(_vals(spark, a, b), F.col("y"), F.col("g")).collect()[0]
    scl = effect_sizes(
        _vals(spark, [v * 3 for v in a], [v * 3 for v in b]),
        F.col("y"),
        F.col("g"),
    ).collect()[0]
    # d and delta are scale-free; the mean gap scales by 3
    assert scl.cohens_d == pytest.approx(base.cohens_d, abs=1e-6)
    assert scl.cliffs_delta == pytest.approx(base.cliffs_delta, abs=1e-9)
    assert scl.mean_diff == pytest.approx(base.mean_diff * 3, abs=1e-6)


def test_bh_fdr_hand_golden(spark):
    # p = k/100 for k=1..5, m=5: p*m/rank = 0.05 everywhere -> all
    # adjusted to 0.05, all rejected at alpha=0.05
    df = spark.createDataFrame(
        [(f"h{k}", k / 100.0) for k in range(1, 6)], "key string, p double"
    )
    out = {r.key: r for r in benjamini_hochberg(df, "key", "p", 0.05).collect()}
    assert all(out[f"h{k}"].p_adj == pytest.approx(0.05) for k in range(1, 6))
    assert all(out[f"h{k}"].reject == 1 for k in range(1, 6))


def test_bh_fdr_monotone_and_bounded(spark):
    ps = [0.001, 0.011, 0.02, 0.24, 0.5, 0.8, 0.98]
    df = spark.createDataFrame(
        [(f"h{i}", p) for i, p in enumerate(ps)], "key string, p double"
    )
    rows = sorted(benjamini_hochberg(df, "key", "p", 0.05).collect(), key=lambda r: r.rank)
    adj = [r.p_adj for r in rows]
    assert adj == sorted(adj)  # step-up adjustment is monotone in rank
    for r in rows:
        assert r.p_adj >= r.p_value - 1e-9
        assert r.p_adj <= 1.0


def test_permutation_null_constant_metric(spark):
    # constant metric: every permuted diff == observed diff == 0 -> p = 1
    df = spark.createDataFrame([(f"u{i}", 7) for i in range(40)], "u string, y long")
    out = permutation_test(df, F.col("u"), F.col("y"), n_perms=50, salt="t").collect()[0]
    assert out.n_units == 40
    assert out.obs_diff == pytest.approx(0.0)
    assert out.n_ge == 50
    assert out.p_value == pytest.approx(1.0)


def test_permutation_detects_planted_effect(spark):
    # plant the effect ON the observed assignment: y = 1000 * obs_arm.
    # every pseudo-permutation breaks the alignment -> p ~= 1/(K+1)
    units = spark.createDataFrame([(f"u{i}",) for i in range(60)], "u string")
    planted = units.select(
        "u",
        (
            F.pmod(stable_hash48(F.concat(F.lit("tobs"), F.col("u"))), F.lit(2))
            * F.lit(1000)
            + F.length("u")
        ).alias("y"),
    )
    out = permutation_test(
        planted, F.col("u"), F.col("y"), n_perms=100, salt="t"
    ).collect()[0]
    assert abs(out.obs_diff) > 900
    assert out.p_value < 0.05


def test_permutation_deterministic(spark):
    df = spark.createDataFrame(
        [(f"u{i}", (i * 37) % 19) for i in range(50)], "u string, y long"
    )
    a = permutation_test(df, F.col("u"), F.col("y"), n_perms=60, salt="s").collect()[0]
    b = permutation_test(df, F.col("u"), F.col("y"), n_perms=60, salt="s").collect()[0]
    assert a == b


def _series(spark, xs):
    return spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(xs)], "d int, x double"
    )


def test_msprt_null_stays_at_one(spark):
    # zero effect: log lambda = 0.5*ln(1/(1+n)) < 0 -> p pinned at 1
    out = msprt_always_valid(_series(spark, [0.0] * 20), "d", "x", sigma2=1.0)
    rows = sorted(out.collect(), key=lambda r: r.d)
    assert all(r.p_always_valid == pytest.approx(1.0) for r in rows)
    assert [r.n for r in rows] == list(range(1, 21))


def test_msprt_rejects_strong_drift(spark):
    # constant effect 10 with sigma2=1: evidence accumulates, the
    # always-valid p is nonincreasing and ends tiny
    out = msprt_always_valid(_series(spark, [10.0] * 15), "d", "x", sigma2=1.0)
    rows = sorted(out.collect(), key=lambda r: r.d)
    ps = [r.p_always_valid for r in rows]
    assert all(ps[i + 1] <= ps[i] + 1e-12 for i in range(len(ps) - 1))
    assert ps[-1] < 1e-6


def test_msprt_peeking_never_unrejects(spark):
    # a burst then silence: running-max construction keeps p at its
    # minimum (always-valid under continuous monitoring)
    xs = [8.0] * 5 + [0.0] * 10
    rows = sorted(
        msprt_always_valid(_series(spark, xs), "d", "x", sigma2=1.0).collect(),
        key=lambda r: r.d,
    )
    ps = [r.p_always_valid for r in rows]
    assert all(ps[i + 1] <= ps[i] + 1e-12 for i in range(len(ps) - 1))
