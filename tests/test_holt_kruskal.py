"""Holt linear smoothing recursion + Kruskal-Wallis H test."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from kkbox_churn_prediction_spark.operators.abtest import kruskal_wallis
from kkbox_churn_prediction_spark.operators.windows import holt_linear_daily


def _daily_turns(spark, counts):
    """One row per turn: counts[i] turns on day i."""
    base = datetime(2024, 3, 1)
    rows = [
        (f"c{d}_{j}", base + timedelta(days=d, minutes=j))
        for d, c in enumerate(counts)
        for j in range(c)
    ]
    return spark.createDataFrame(rows, "conv_id string, ts timestamp")


# ----------------------------------------------------------- Holt linear
def _holt_ref(ys, a=0.25, b=0.125):
    import math

    def q(x):
        return (
            math.floor(x * 1e9 + 0.5)
            if x >= 0
            else -math.floor(-x * 1e9 + 0.5)
        )

    lq = ys[0] * 10**9
    bq = (ys[1] - ys[0]) * 10**9 if len(ys) > 1 else 0
    out = [(float(ys[0]), bq / 1e9, -1.0, 0.0)]
    for y in ys[1:]:
        lp, bp = lq / 1e9, bq / 1e9
        fc = lp + bp
        lq = q(a * float(y) + (1 - a) * (lp + bp))
        bq = q(b * (lq / 1e9 - lp) + (1 - b) * bp)
        out.append((lq / 1e9, bq / 1e9, fc, float(y) - fc))
    return out


def test_holt_matches_scalar_reference(spark):
    counts = [10, 16, 13, 22, 25, 19, 30, 28]
    got = sorted(
        holt_linear_daily(_daily_turns(spark, counts)).collect(),
        key=lambda r: r["d"],
    )
    ref = _holt_ref(counts)
    for r, (lv, tr, fc, err) in zip(got, ref):
        assert r["level"] == pytest.approx(lv, abs=1e-6)
        assert r["trend"] == pytest.approx(tr, abs=1e-6)
        assert r["forecast"] == pytest.approx(fc, abs=1e-6)
        assert r["forecast_err"] == pytest.approx(err, abs=1e-6)


def test_holt_constant_series_locks_level_zero_trend(spark):
    counts = [7] * 10
    got = holt_linear_daily(_daily_turns(spark, counts)).collect()
    for r in got:
        assert r["level"] == pytest.approx(7.0, abs=1e-6)
        assert r["trend"] == pytest.approx(0.0, abs=1e-6)


def test_holt_linear_ramp_tracks_slope(spark):
    # y_t = 5 + 3t: init b0 = 3 is exact, so level/trend stay locked
    counts = [5 + 3 * t for t in range(12)]
    got = sorted(
        holt_linear_daily(_daily_turns(spark, counts)).collect(),
        key=lambda r: r["d"],
    )
    last = got[-1]
    assert last["trend"] == pytest.approx(3.0, abs=1e-6)
    assert last["forecast_err"] == pytest.approx(0.0, abs=1e-6)


def test_holt_single_day_degenerate(spark):
    got = holt_linear_daily(_daily_turns(spark, [9])).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["level"], r["trend"], r["forecast"]) == (9.0, 0.0, -1.0)


# ------------------------------------------------------- Kruskal-Wallis
def _grouped(spark, groups):
    rows = [(g, float(v)) for g, vals in groups.items() for v in vals]
    return spark.createDataFrame(rows, "g string, v double")


def _kw_ref(groups):
    """Textbook midrank Kruskal-Wallis with tie correction."""
    pooled = sorted(
        (v, g) for g, vals in groups.items() for v in vals
    )
    n = len(pooled)
    ranks, i = {}, 0
    vals = [p[0] for p in pooled]
    while i < n:
        j = i
        while j < n and vals[j] == vals[i]:
            j += 1
        mid = (i + 1 + j) / 2.0
        for t in range(i, j):
            ranks[t] = mid
        i = j
    rsum = {g: 0.0 for g in groups}
    for idx, (v, g) in enumerate(pooled):
        rsum[g] += ranks[idx]
    h = 12.0 / (n * (n + 1)) * sum(
        rsum[g] ** 2 / len(vals_g) for g, vals_g in groups.items()
    ) - 3 * (n + 1)
    from collections import Counter

    ties = Counter(vals)
    tt = sum(t**3 - t for t in ties.values())
    c = 1 - tt / (n**3 - n)
    return h, c, (h / c if c > 0 else 0.0)


def test_kruskal_matches_textbook_formula(spark):
    groups = {
        "a": [1, 2, 2, 3, 5, 8],
        "b": [2, 4, 4, 6, 9],
        "c": [5, 5, 7, 10, 11, 12],
    }
    out = {r["grp"]: r for r in kruskal_wallis(
        _grouped(spark, groups), F.col("v"), F.col("g")
    ).collect()}
    h, c, hc = _kw_ref(groups)
    any_row = out["a"]
    assert any_row["n_total"] == 17 and any_row["k_groups"] == 3
    assert any_row["h_stat"] == pytest.approx(h, abs=1e-5)
    assert any_row["tie_correction"] == pytest.approx(c, abs=1e-6)
    assert any_row["h_corrected"] == pytest.approx(hc, abs=1e-5)
    assert any_row["dof"] == 2
    for g, vals in groups.items():
        assert out[g]["n"] == len(vals)


def test_kruskal_identical_groups_h_near_zero(spark):
    # same distribution in every group -> mean ranks equal, H == 0
    groups = {"a": [1, 2, 3, 4], "b": [1, 2, 3, 4], "c": [1, 2, 3, 4]}
    out = kruskal_wallis(
        _grouped(spark, groups), F.col("v"), F.col("g")
    ).collect()
    assert out[0]["h_stat"] == pytest.approx(0.0, abs=1e-6)
    mrs = {r["grp"]: r["mean_rank"] for r in out}
    assert len(set(mrs.values())) == 1


def test_kruskal_two_groups_squares_mann_whitney_z(spark):
    # with k=2 and no ties, H == z^2 of the rank-sum test
    from kkbox_churn_prediction_spark.operators.abtest import mann_whitney_u

    groups = {"a": [1, 4, 6, 9, 13], "b": [2, 3, 7, 20, 22, 25]}
    d = _grouped(spark, groups)
    kw = kruskal_wallis(d, F.col("v"), F.col("g")).collect()[0]
    mw = mann_whitney_u(d, F.col("v"), F.col("g"), "a", "b").collect()[0]
    assert kw["h_corrected"] == pytest.approx(mw["z_stat"] ** 2, abs=1e-4)
