"""Survival labels / KM curve / decay / rhythm operators.

Golden values are hand-computed on tiny fixtures; the leak-trap cases
mirror the as-of join's discipline (an event exactly AT the cutoff is
the feature side's business, never the label side's).
"""

from __future__ import annotations

import math
from datetime import datetime, timedelta

import pandas as pd
import pytest

from kkbox_churn_prediction_spark.operators.decay import decayed_counts
from kkbox_churn_prediction_spark.operators.rhythm import (
    activity_profile,
    daily_regularity,
    interarrival_stats,
)
from kkbox_churn_prediction_spark.operators.survival import km_curve, survival_labels

T0 = datetime(2024, 1, 1, 12, 0, 0)


def _turns(spark, rows):
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    return spark.createDataFrame(pdf)


def _cutoffs(spark, *ts):
    return spark.createDataFrame(pd.DataFrame({"cutoff_ts": list(ts)}))


class TestSurvivalLabels:
    def test_duration_and_censoring(self, spark):
        cutoff = T0
        rows = [
            # returns 36h after cutoff -> ceil(1.5d) = 2, observed
            ("a", 0, "user", "x", None, cutoff + timedelta(hours=36)),
            # returns exactly at the horizon boundary (inclusive) -> 14, observed
            ("b", 0, "user", "x", None, cutoff + timedelta(days=14)),
            # only activity BEFORE the cutoff -> censored at 14
            ("c", 0, "user", "x", None, cutoff - timedelta(hours=1)),
            # event exactly AT the cutoff must NOT count (strictly after)
            ("d", 0, "user", "x", None, cutoff),
            # non-qualifying role inside horizon -> censored
            ("e", 0, "assistant", "x", None, cutoff + timedelta(days=1)),
        ]
        out = survival_labels(_turns(spark, rows), _cutoffs(spark, cutoff), 14)
        got = {r["conv_id"]: (r["duration_days"], r["observed"]) for r in out.collect()}
        assert got == {
            "a": (2, 1),
            "b": (14, 1),
            "c": (14, 0),
            "d": (14, 0),
            "e": (14, 0),
        }

    def test_first_event_wins(self, spark):
        cutoff = T0
        rows = [
            ("a", 0, "user", "x", None, cutoff + timedelta(days=5)),
            ("a", 1, "user", "x", None, cutoff + timedelta(days=2)),
        ]
        out = survival_labels(_turns(spark, rows), _cutoffs(spark, cutoff), 14).collect()
        assert out[0]["duration_days"] == 2 and out[0]["observed"] == 1


class TestKMCurve:
    def test_textbook_values(self, spark):
        # classic product-limit worked example:
        # durations (observed): 1(1), 2(1), 3(0 censored), 4(1), 5(0)
        pdf = pd.DataFrame(
            {
                "conv_id": list("abcde"),
                "cutoff_ts": [T0] * 5,
                "duration_days": [1, 2, 3, 4, 5],
                "observed": [1, 1, 0, 1, 0],
            }
        )
        out = km_curve(spark.createDataFrame(pdf)).orderBy("t").collect()
        s = {r["t"]: (r["n_risk"], r["n_event"], r["survival"]) for r in out}
        assert s[1][:2] == (5, 1) and abs(s[1][2] - 4 / 5) < 1e-12
        assert s[2][:2] == (4, 1) and abs(s[2][2] - 4 / 5 * 3 / 4) < 1e-12
        # censoring at 3 leaves survival flat
        assert s[3][:2] == (3, 0) and abs(s[3][2] - 0.6) < 1e-12
        # event at 4 among 2 at risk: 0.6 * 1/2
        assert s[4][:2] == (2, 1) and abs(s[4][2] - 0.3) < 1e-12
        assert s[5][:2] == (1, 0) and abs(s[5][2] - 0.3) < 1e-12

    def test_monotone_nonincreasing(self, spark):
        pdf = pd.DataFrame(
            {
                "conv_id": [f"c{i}" for i in range(20)],
                "cutoff_ts": [T0] * 20,
                "duration_days": [1 + i % 7 for i in range(20)],
                "observed": [i % 3 != 0 for i in range(20)],
            }
        )
        pdf["observed"] = pdf["observed"].astype(int)
        vals = [
            r["survival"]
            for r in km_curve(spark.createDataFrame(pdf)).orderBy("t").collect()
        ]
        assert all(a >= b - 1e-12 for a, b in zip(vals, vals[1:]))

    def test_all_events_reach_zero(self, spark):
        # every subject observed at the same t: factor hits 0 exactly;
        # the LN(1)-shield + MIN-guard must pin survival to 0, not NaN
        pdf = pd.DataFrame(
            {
                "conv_id": ["a", "b"],
                "cutoff_ts": [T0] * 2,
                "duration_days": [3, 3],
                "observed": [1, 1],
            }
        )
        out = km_curve(spark.createDataFrame(pdf)).collect()
        assert out[0]["survival"] == 0.0


class TestDecay:
    def test_known_weights(self, spark):
        cutoff = T0
        rows = [
            # one day old: weight 0.5 under hl=1, 0.5^(1/7) under hl=7
            ("a", 0, "user", "x", None, cutoff - timedelta(days=1)),
            # two days old, tool call
            ("a", 1, "tool", "x", "error", cutoff - timedelta(days=2)),
        ]
        out = decayed_counts(
            _turns(spark, rows), _cutoffs(spark, cutoff), (1.0, 7.0), 28
        ).collect()
        r = out[0]
        assert abs(r["decayed_turns_hl1d"] - (0.5 + 0.25)) < 1e-12
        assert abs(r["decayed_tool_hl1d"] - 0.25) < 1e-12
        assert abs(r["decayed_turns_hl7d"] - (0.5 ** (1 / 7) + 0.5 ** (2 / 7))) < 1e-12

    def test_leak_guard_and_zero_fill(self, spark):
        cutoff = T0
        rows = [
            # future turn: excluded entirely from the decayed sums
            ("a", 0, "user", "x", None, cutoff + timedelta(hours=1)),
            # beyond the 28-day lookback: also excluded
            ("a", 1, "user", "x", None, cutoff - timedelta(days=40)),
        ]
        out = decayed_counts(_turns(spark, rows), _cutoffs(spark, cutoff)).collect()
        r = out[0]
        assert r["decayed_turns_hl1d"] == 0.0 and r["decayed_turns_hl7d"] == 0.0


class TestRhythm:
    def test_periodic_is_antibursty(self, spark):
        rows = [
            ("a", i, "user", "x", None, T0 + timedelta(minutes=10 * i)) for i in range(5)
        ]
        r = interarrival_stats(_turns(spark, rows)).collect()[0]
        assert r["n_gaps"] == 4
        assert abs(r["mean_gap_s"] - 600.0) < 1e-9
        assert r["sd_gap_s"] == 0.0
        assert r["cv_gap"] == 0.0 and r["burstiness"] == -1.0

    def test_min_gaps_filter(self, spark):
        rows = [
            ("a", 0, "user", "x", None, T0),
            ("a", 1, "user", "x", None, T0 + timedelta(minutes=1)),
        ]
        # one gap only -> dropped
        assert interarrival_stats(_turns(spark, rows)).count() == 0

    def test_entropy_extremes(self, spark):
        # conv a: all 8 turns in one hour -> entropy 0
        rows = [("a", i, "user", "x", None, T0 + timedelta(minutes=i)) for i in range(8)]
        # conv b: uniform over 4 distinct hours -> entropy ln(4)
        rows += [
            ("b", i, "user", "x", None, T0 + timedelta(hours=i % 4, minutes=i))
            for i in range(8)
        ]
        got = {r["conv_id"]: r for r in activity_profile(_turns(spark, rows)).collect()}
        assert abs(got["a"]["hour_entropy"]) < 1e-12 and got["a"]["n_active_hours"] == 1
        assert abs(got["b"]["hour_entropy"] - math.log(4)) < 1e-12
        assert got["b"]["n_active_hours"] == 4

    def test_weekend_frac(self, spark):
        sat = datetime(2024, 1, 6, 10, 0, 0)  # Saturday
        mon = datetime(2024, 1, 8, 10, 0, 0)  # Monday
        rows = [
            ("a", 0, "user", "x", None, sat),
            ("a", 1, "user", "x", None, mon),
            ("a", 2, "user", "x", None, mon + timedelta(hours=1)),
        ]
        r = activity_profile(_turns(spark, rows)).collect()[0]
        assert abs(r["weekend_frac"] - 1 / 3) < 1e-12

    def test_fano(self, spark):
        # constant 2 turns/day over 3 days -> var 0, fano 0
        rows = [
            ("a", 2 * d + j, "user", "x", None, T0 + timedelta(days=d, minutes=j))
            for d in range(3)
            for j in range(2)
        ]
        r = daily_regularity(_turns(spark, rows)).collect()[0]
        assert r["n_active_days"] == 3
        assert r["mean_daily_turns"] == 2.0
        assert r["var_daily_turns"] == 0.0 and r["fano_factor"] == 0.0


def test_gini_concentration_matches_numpy(spark):
    import numpy as np
    import pandas as pd

    from kkbox_churn_prediction_spark.operators.rhythm import gini_concentration

    rng = np.random.default_rng(13)
    x = rng.integers(1, 100, size=400).astype(float)

    def gini_ref(a):
        a = np.sort(a)
        n = len(a)
        r = np.arange(1, n + 1)
        # average-rank correction for ties
        s = pd.Series(a)
        r = s.rank(method="average").to_numpy()
        return 2 * np.sum(r * a) / (n * a.sum()) - (n + 1) / n

    df = spark.createDataFrame(pd.DataFrame({"v": x}))
    out = gini_concentration(df, "v").collect()[0]
    assert out["n"] == 400
    assert abs(out["gini"] - gini_ref(x)) < 1e-6
    # degenerate: all equal → gini 0
    same = spark.createDataFrame(pd.DataFrame({"v": [5.0] * 50}))
    assert gini_concentration(same, "v").collect()[0]["gini"] == 0.0


def test_neyman_allocation_properties(spark):
    import numpy as np
    import pandas as pd

    from kkbox_churn_prediction_spark.operators.sampling import neyman_allocation

    rng = np.random.default_rng(3)
    rows = []
    # stratum 0: big & high variance; 1: big & low variance; 2: tiny
    rows += [(0, float(v)) for v in rng.normal(100, 50, 300)]
    rows += [(1, float(v)) for v in rng.normal(100, 1, 300)]
    rows += [(2, float(v)) for v in rng.normal(100, 50, 4)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["s", "v"]))
    out = {r["s"]: r for r in neyman_allocation(df, "s", "v", 100).collect()}
    # high-variance stratum gets far more than the equal-size low-var one
    assert out[0]["alloc"] > 5 * out[1]["alloc"]
    # cap: no stratum exceeds its population; budget respected
    assert all(out[s]["alloc"] <= out[s]["n_rows"] for s in out)
    assert sum(out[s]["alloc"] for s in out) <= 100
    # zero-variance stratum falls back to size weight (alloc > 0 possible)
    one = spark.createDataFrame(pd.DataFrame({"s": [0] * 10, "v": [7.0] * 10}))
    o = neyman_allocation(one, "s", "v", 5).collect()[0]
    assert o["stddev"] == 0.0 and o["alloc"] == 5


class TestActivityTrend:
    def test_golden_slope_and_intercept(self, spark):
        from kkbox_churn_prediction_spark.operators.rhythm import activity_trend

        rows = []
        # conv "up": 1/2/3 turns on Jan 1/2/3 -> slope 1, intercept 1
        for day, cnt in [(0, 1), (1, 2), (2, 3)]:
            for k in range(cnt):
                rows.append(
                    ("up", k, "user", "x", None, datetime(2024, 1, 1 + day, 8, k))
                )
        # conv "flat1day": everything on one day -> zero x-variance -> NULL
        rows += [("flat1day", k, "user", "x", None, datetime(2024, 2, 1, 9, k)) for k in range(5)]
        out = {r["conv_id"]: r for r in activity_trend(_turns(spark, rows)).collect()}
        assert out["up"]["n_active_days"] == 3
        assert out["up"]["slope"] == pytest.approx(1.0, abs=1e-6)
        assert out["up"]["intercept"] == pytest.approx(1.0, abs=1e-6)
        assert out["flat1day"]["n_active_days"] == 1
        assert out["flat1day"]["slope"] is None
        assert out["flat1day"]["intercept"] is None

    def test_slope_shift_invariance_and_sign(self, spark):
        from kkbox_churn_prediction_spark.operators.rhythm import activity_trend

        rows = []
        # fading: 5/3/1 turns across three days -> slope -2
        for day, cnt in [(0, 5), (1, 3), (2, 1)]:
            for k in range(cnt):
                rows.append(
                    ("down", k, "user", "x", None, datetime(2024, 3, 10 + day, 8, k))
                )
        a = {r["conv_id"]: r for r in activity_trend(_turns(spark, rows)).collect()}
        b = {
            r["conv_id"]: r
            for r in activity_trend(_turns(spark, rows), origin="2020-06-15").collect()
        }
        assert a["down"]["slope"] == pytest.approx(-2.0, abs=1e-6)
        # slope is origin-shift invariant; the intercept is defined AT
        # the origin so it legitimately moves with it
        assert b["down"]["slope"] == pytest.approx(a["down"]["slope"], abs=1e-6)


def test_weekly_bounce_rate_golden(spark):
    from kkbox_churn_prediction_spark.operators.rhythm import weekly_bounce_rate

    t0 = datetime(2024, 1, 1)  # Monday
    rows = [
        # week 1: conv a bounces (1 turn), conv b doesn't (2 turns)
        ("a", 0, "user", "x", None, t0),
        ("b", 0, "user", "x", None, t0 + timedelta(hours=1)),
        ("b", 1, "assistant", "y", None, t0 + timedelta(hours=2)),
        # conv c STARTS in week 1 but continues into week 2:
        # counted in week 1's cohort, not bounced
        ("c", 0, "user", "x", None, t0 + timedelta(days=6)),
        ("c", 1, "user", "y", None, t0 + timedelta(days=8)),
        # week 2: one bounce
        ("d", 0, "user", "x", None, t0 + timedelta(days=7)),
    ]
    turns = _turns_frame(spark, rows)
    out = {r["week"]: r for r in weekly_bounce_rate(turns).collect()}
    wk1 = out[t0]
    assert wk1["n_started"] == 3 and wk1["n_bounced"] == 1
    assert wk1["bounce_rate"] == round(1 / 3, 6)
    wk2 = out[t0 + timedelta(days=7)]
    assert wk2["n_started"] == 1 and wk2["n_bounced"] == 1


def _turns_frame(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )


class TestLogrank:
    def test_identical_cohorts_null(self, spark):
        from kkbox_churn_prediction_spark.operators.survival import logrank_test

        rows = []
        for c in ("a", "b"):
            rows += [(c, 2, 1), (c, 5, 1), (c, 9, 0), (c, 14, 0)]
        df = spark.createDataFrame(rows, "cohort string, duration_days int, observed int")
        r = logrank_test(df).collect()[0]
        assert r["z_stat"] == 0.0 and r["chi2"] == 0.0
        assert r["o_a"] == 2 and r["o_b"] == 2
        assert r["e_a"] == 2.0  # symmetric design

    def test_hand_math_two_times(self, spark):
        from kkbox_churn_prediction_spark.operators.survival import logrank_test

        # t=1: a dies (1 event), both at risk (n_a=2, n_b=2)
        # t=2: b dies (1 event), at risk n_a=1, n_b=2
        # censored tails at t=3
        rows = [("a", 1, 1), ("a", 3, 0), ("b", 2, 1), ("b", 3, 0)]
        df = spark.createDataFrame(rows, "cohort string, duration_days int, observed int")
        r = logrank_test(df).collect()[0]
        # E_a = 1*(2/4) + 1*(1/3) = 5/6
        assert r["e_a"] == round(0.5 + 1 / 3, 6)
        assert r["o_a"] == 1 and r["o_b"] == 1
        # V = 1*(1/2)*(1/2)*(4-1)/(4-1)=0.25 ; + 1*(1/3)*(2/3)*(3-1)/(3-1)=2/9
        v = 0.25 + 2 / 9
        assert r["variance"] == round(v, 6)
        import math

        z = (1 - (0.5 + 1 / 3)) / math.sqrt(v)
        assert r["z_stat"] == round(z, 6)

    def test_one_sided_events_significant(self, spark):
        from kkbox_churn_prediction_spark.operators.survival import logrank_test

        # cohort a: everyone dies at t=1; cohort b: all censored at 14
        rows = [("a", 1, 1)] * 10 + [("b", 14, 0)] * 10
        df = spark.createDataFrame(rows, "cohort string, duration_days int, observed int")
        r = logrank_test(df).collect()[0]
        assert r["o_a"] == 10 and r["o_b"] == 0
        assert r["z_stat"] > 3.0 and r["chi2"] > 9.0


def test_label_rate_by_horizon_monotone_golden(spark):
    from kkbox_churn_prediction_spark.operators.survival import label_rate_by_horizon

    # durations: 1,2,5,10 observed; 14 censored (never positive)
    rows = [(1, 1), (2, 1), (5, 1), (10, 1), (14, 0)]
    df = spark.createDataFrame(rows, "duration_days int, observed int")
    out = {r["horizon_days"]: r for r in label_rate_by_horizon(df, (1, 3, 7, 14)).collect()}
    assert out[1]["n_positive"] == 1 and out[1]["positive_rate"] == 0.2
    assert out[3]["n_positive"] == 2
    assert out[7]["n_positive"] == 3
    assert out[14]["n_positive"] == 4 and out[14]["positive_rate"] == 0.8
    # monotone in h by construction
    rates = [out[h]["positive_rate"] for h in (1, 3, 7, 14)]
    assert rates == sorted(rates)
    assert all(r["n"] == 5 for r in out.values())
