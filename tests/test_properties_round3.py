"""Property-based invariants for the round-2 additions: Kaplan-Meier
vs an independent numpy reference, CMS never-underestimates, hopping
conservation, funnel monotonicity, decay bounds. Same discipline as
test_properties.py: few examples, each a whole randomized table."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

T0 = datetime(2024, 1, 1)

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _km_numpy(durations, observed):
    """Independent product-limit reference: plain loops, no Spark, no
    SQL — the same role the pandas oracle plays for the backfill."""
    n = len(durations)
    out = {}
    s = 1.0
    at_risk = n
    for t in sorted(set(durations)):
        d = sum(1 for x, o in zip(durations, observed) if x == t and o)
        leaving = sum(1 for x in durations if x == t)
        factor = 1.0 - d / at_risk
        s = 0.0 if factor <= 0 else s * factor
        out[t] = (at_risk, d, s)
        at_risk -= leaving
    return out


@settings(**SETTINGS)
@given(
    pairs=st.lists(
        st.tuples(st.integers(min_value=1, max_value=10), st.booleans()),
        min_size=1,
        max_size=40,
    )
)
def test_property_km_matches_numpy(spark, pairs):
    from kkbox_churn_prediction_spark.operators.survival import km_curve

    pdf = pd.DataFrame(
        {
            "conv_id": [f"c{i}" for i in range(len(pairs))],
            "cutoff_ts": [T0] * len(pairs),
            "duration_days": [p[0] for p in pairs],
            "observed": [int(p[1]) for p in pairs],
        }
    )
    got = {r["t"]: r for r in km_curve(spark.createDataFrame(pdf)).collect()}
    ref = _km_numpy([p[0] for p in pairs], [p[1] for p in pairs])
    assert set(got) == set(ref)
    for t, (n_risk, d, s) in ref.items():
        assert got[t]["n_risk"] == n_risk
        assert got[t]["n_event"] == d
        assert abs(got[t]["survival"] - s) < 1e-9


@settings(**SETTINGS)
@given(
    keys=st.lists(
        st.sampled_from(["a", "b", "c", "d", "e", "f"]), min_size=1, max_size=60
    ),
    width=st.sampled_from([4, 8, 32]),
)
def test_property_cms_never_underestimates(spark, keys, width):
    from kkbox_churn_prediction_spark.operators.cms import cms_build, cms_estimate

    df = spark.createDataFrame(pd.DataFrame({"k": keys, "b": ["w1"] * len(keys)}))
    sk = cms_build(df, "k", "b", depth=4, width=width)
    probes = spark.createDataFrame(pd.DataFrame({"k": sorted(set(keys)) + ["absent"]}))
    est = {r["k"]: r["cms_count"] for r in cms_estimate(sk, probes, width=width, depth=4).collect()}
    exact = pd.Series(keys).value_counts().to_dict()
    for k, c in exact.items():
        assert est[k] >= c
    # absent key may collide upward but never below zero
    assert est.get("absent", 0) >= 0


@settings(**SETTINGS)
@given(
    offsets=st.lists(st.integers(min_value=0, max_value=100_000), min_size=1, max_size=50),
    ratio=st.sampled_from([1, 2, 3, 4]),
)
def test_property_hopping_conservation(spark, offsets, ratio):
    """Total replicated turn-count = n_turns × (width/slide), and every
    per-window count is positive."""
    from kkbox_churn_prediction_spark.operators.windows import hopping_window_counts

    rows = [
        ("a", i, "user", "x", None, T0 + timedelta(seconds=o))
        for i, o in enumerate(offsets)
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    out = hopping_window_counts(
        spark.createDataFrame(pdf), 3600 * ratio, 3600
    ).collect()
    assert sum(r["n_turns"] for r in out) == len(offsets) * ratio
    assert all(r["n_turns"] >= 1 and r["n_convs"] == 1 for r in out)


@settings(**SETTINGS)
@given(
    roles=st.lists(
        st.sampled_from(["system", "user", "assistant", "tool"]),
        min_size=1,
        max_size=30,
    )
)
def test_property_funnel_monotone(spark, roles):
    """reached_step3 ≤ reached_step2 ≤ reached_step1 per entity, and a
    completed hop implies both endpoints reached."""
    from kkbox_churn_prediction_spark.operators.funnel import funnel_steps

    rows = [
        ("a", i, r, "x", None, T0 + timedelta(seconds=i)) for i, r in enumerate(roles)
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    r = funnel_steps(spark.createDataFrame(pdf)).collect()[0]
    assert r["reached_step3"] <= r["reached_step2"] <= r["reached_step1"]
    if r["hop1_seconds"] >= 0:
        assert r["reached_step1"] == 1 and r["reached_step2"] == 1
    if r["hop2_seconds"] >= 0:
        assert r["reached_step2"] == 1 and r["reached_step3"] == 1


@settings(**SETTINGS)
@given(
    ages_h=st.lists(st.integers(min_value=1, max_value=27 * 24), min_size=1, max_size=40)
)
def test_property_decay_bounds(spark, ages_h):
    """0 < decayed sum ≤ n_turns, and the 7d-half-life sum dominates
    the 1d one (slower decay ⇒ larger weights)."""
    from kkbox_churn_prediction_spark.operators.decay import decayed_counts

    cutoff = datetime(2024, 2, 1)
    rows = [
        ("a", i, "user", "x", None, cutoff - timedelta(hours=h))
        for i, h in enumerate(ages_h)
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    cut = spark.createDataFrame(pd.DataFrame({"cutoff_ts": [cutoff]}))
    r = decayed_counts(spark.createDataFrame(pdf), cut, (1.0, 7.0), 28).collect()[0]
    n = len(ages_h)
    assert 0 < r["decayed_turns_hl1d"] <= n + 1e-9
    assert r["decayed_turns_hl1d"] <= r["decayed_turns_hl7d"] <= n + 1e-9
