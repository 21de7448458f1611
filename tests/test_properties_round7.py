"""Algebraic invariants for the newest stats family (VERDICT r2 task
#6): difference-in-differences and the deseasonalized anomaly screen.

These two landed last in round 2 with goldens + plan audits but no
property tests; the invariants here are the ones a wrong
implementation is most likely to break silently.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# difference-in-differences
# ---------------------------------------------------------------------------

_PANEL = [
    # (arm, pre, post) — integer metrics (the operator's exact-decimal
    # contract); arm b has a genuine +5-ish effect on top of its trend
    ("a", 10, 14), ("a", 12, 15), ("a", 8, 13), ("a", 11, 16), ("a", 9, 12),
    ("b", 20, 29), ("b", 22, 33), ("b", 18, 28), ("b", 21, 30), ("b", 19, 27),
]


def _did(spark, rows):
    from kkbox_churn_prediction_spark.operators.abtest import diff_in_diff

    df = spark.createDataFrame(rows, "arm string, x long, y long")
    return diff_in_diff(df, "arm", "x", "y").first()


def test_did_invariant_to_unit_level_shift(spark):
    """Adding ANY constant to every unit's pre AND post cancels in the
    per-unit delta d = post − pre: did and t_stat must be bit-equal;
    the cell means shift by exactly the constant."""
    base = _did(spark, _PANEL)
    shifted = _did(spark, [(g, x + 1000, y + 1000) for g, x, y in _PANEL])
    assert shifted["did"] == base["did"]
    assert shifted["t_stat"] == base["t_stat"]
    for c in ("pre_a", "post_a", "pre_b", "post_b"):
        assert shifted[c] == base[c] + 1000.0


def test_did_sign_flips_under_arm_swap(spark):
    """Relabeling a↔b negates the estimate and its t statistic, and
    transposes the cell means."""
    base = _did(spark, _PANEL)
    swapped = _did(
        spark, [("b" if g == "a" else "a", x, y) for g, x, y in _PANEL]
    )
    assert swapped["did"] == -base["did"]
    assert swapped["t_stat"] == -base["t_stat"]
    assert (swapped["pre_a"], swapped["post_a"]) == (base["pre_b"], base["post_b"])
    assert (swapped["n_a"], swapped["n_b"]) == (base["n_b"], base["n_a"])


def test_did_zero_when_trends_parallel(spark):
    """Parallel trends with no treatment effect → did exactly 0 even
    when the arms sit at very different levels."""
    rows = [("a", 10, 17), ("a", 20, 27), ("b", 100, 107), ("b", 200, 207)]
    r = _did(spark, rows)
    assert r["did"] == 0.0 and r["t_stat"] == 0.0


# ---------------------------------------------------------------------------
# deseasonalized daily anomalies
# ---------------------------------------------------------------------------

_MONDAY = datetime(2024, 1, 1)  # 2024-01-01 is a Monday


def _turns_from_daily_counts(spark, counts):
    """One synthetic turn row per unit of count, day i = _MONDAY + i."""
    rows = []
    for i, n in enumerate(counts):
        day = _MONDAY + timedelta(days=i)
        for j in range(n):
            rows.append((f"c{i}", j, "user", "x", None, day + timedelta(minutes=j)))
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    return spark.createDataFrame(pdf)


def test_weekly_periodic_series_fires_raw_but_not_deseasonalized(spark):
    """A PERFECTLY weekly-periodic series (Sunday always spikes) is
    the motivating case: the raw trailing-z alarms every Sunday, the
    weekday-adjusted screen must fire ZERO anomalies (every residual
    is exactly 0)."""
    from kkbox_churn_prediction_spark.operators.windows import (
        daily_anomalies,
        daily_anomalies_deseasonalized,
    )

    week = [10, 12, 10, 12, 10, 12, 100]  # Mon..Sun, Sunday spike
    turns = _turns_from_daily_counts(spark, week * 4)
    raw = daily_anomalies(turns, trailing_days=6, z_threshold=3.0).collect()
    # every Sunday has a full 6-day quiet trailing window → fires
    raw_fired = [r["d"] for r in raw if r["is_anomaly"]]
    assert len(raw_fired) >= 3
    assert all(d.weekday() == 6 for d in raw_fired)

    adj = daily_anomalies_deseasonalized(
        turns, trailing_days=6, z_threshold=3.0
    ).collect()
    assert all(not r["is_anomaly"] for r in adj)
    assert all(r["residual"] == 0.0 for r in adj)


def test_deseasonalized_fires_on_genuine_departure(spark):
    """The screen still alarms when a day departs from ITS OWN
    weekday's norm: weekly pattern + small period-3 jitter (so
    residual spread is non-zero) + one 30× Wednesday."""
    from kkbox_churn_prediction_spark.operators.windows import (
        daily_anomalies_deseasonalized,
    )

    week = [10, 12, 10, 12, 10, 12, 100]
    counts = [n + (i % 3) for i, n in enumerate(week * 4)]
    outlier_idx = 7 * 3 + 2  # Wednesday of week 4
    counts[outlier_idx] = 300
    turns = _turns_from_daily_counts(spark, counts)
    adj = {
        r["d"]: r
        for r in daily_anomalies_deseasonalized(
            turns, trailing_days=6, z_threshold=3.0
        ).collect()
    }
    assert adj[_MONDAY + timedelta(days=outlier_idx)]["is_anomaly"]


def test_online_anomalies_causal_and_fire_on_departure(spark):
    """daily_anomalies_online: (1) on the perfectly periodic series it
    behaves like the retrospective screen (zero alarms once every
    weekday has priors — residuals exactly 0); (2) it is CAUSAL: an
    outlier on the final day cannot change any earlier day's output
    (the retrospective variant fails exactly this check); (3) the
    outlier day itself alarms."""
    from kkbox_churn_prediction_spark.operators.windows import (
        daily_anomalies_deseasonalized,
        daily_anomalies_online,
    )

    week = [10, 12, 10, 12, 10, 12, 100]
    counts = [n + (i % 3) for i, n in enumerate(week * 4)]
    turns_clean = _turns_from_daily_counts(spark, counts)
    spiked = list(counts)
    spiked[-1] = 500  # outlier on the LAST day only
    turns_spiked = _turns_from_daily_counts(spark, spiked)

    def by_day(df):
        return {r["d"]: (r["residual"], r["z_resid"], r["is_anomaly"])
                for r in df.collect()}

    clean = by_day(daily_anomalies_online(turns_clean))
    spike = by_day(daily_anomalies_online(turns_spiked))
    last_day = max(spike)
    # causality: every day BEFORE the outlier is bit-identical
    for d in clean:
        if d < last_day:
            assert spike[d] == clean[d]
    assert spike[last_day][2]  # the outlier day alarms
    # the retrospective screen is NOT causal on the same data — its
    # weekday means absorb the final-day outlier (this is the
    # documented difference, not a bug)
    retro_clean = by_day(daily_anomalies_deseasonalized(turns_clean))
    retro_spike = by_day(daily_anomalies_deseasonalized(turns_spiked))
    assert any(
        retro_spike[d] != retro_clean[d] for d in retro_clean if d < last_day
    )
