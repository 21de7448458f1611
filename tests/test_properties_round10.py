"""Algebraic invariants for the round-3 session-2 operators —
properties the oracle cannot check because both engines would share
the same bug (the DiD/deseasonalized discipline from round 2).
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F


def _turns(spark, days=20, per_day=12, seed=7):
    rng = np.random.default_rng(seed)
    base = dt.datetime(2024, 1, 1)
    rows = []
    k = 0
    for d in range(days):
        for _ in range(per_day + int(rng.integers(0, 6))):
            rows.append(
                (
                    f"c{int(rng.integers(0, 30))}",
                    k,
                    ["user", "assistant", "tool", "system"][int(rng.integers(0, 4))],
                    base + dt.timedelta(days=d, minutes=int(rng.integers(0, 1400))),
                )
            )
            k += 1
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts timestamp"
    )


def test_markov_stationary_sums_to_one_and_matches_eigen(spark):
    """π must (a) sum to ~1 and (b) agree with the direct left-eigen
    solve of the empirical transition matrix."""
    from kkbox_churn_prediction_spark.operators.lags import (
        markov_stationary,
        role_transitions,
    )

    df = _turns(spark)
    out = markov_stationary(df).collect()
    assert sum(r["pi"] for r in out) == pytest.approx(1.0, abs=1e-4)
    # numpy reference: stationary of the row-stochastic matrix
    trans = role_transitions(df).collect()
    states = sorted({r["from_state"] for r in trans})
    idx = {s: i for i, s in enumerate(states)}
    P = np.zeros((len(states), len(states)))
    for r in trans:
        if r["to_state"] in idx:
            P[idx[r["from_state"]], idx[r["to_state"]]] = r["n"]
    P = P / P.sum(axis=1, keepdims=True)
    vals, vecs = np.linalg.eig(P.T)
    v = np.real(vecs[:, np.argmin(abs(vals - 1))])
    v = v / v.sum()
    got = {r["state"]: r["pi"] for r in out}
    for s in states:
        assert got[s] == pytest.approx(v[idx[s]], abs=1e-4)


def test_bayes_ab_complement_symmetry(spark):
    """P(B>A) computed with swapped arms must equal 1 − P(B>A):
    the posterior is continuous, so ties carry no mass."""
    from kkbox_churn_prediction_spark.operators.abtest import bayes_ab_binary

    units = spark.createDataFrame(
        [("a", 1)] * 13 + [("a", 0)] * 17 + [("b", 1)] * 19 + [("b", 0)] * 11,
        "arm string, succ int",
    )
    p = bayes_ab_binary(units, "arm", "succ").collect()[0]["prob_b_beats_a"]
    swapped = units.select(
        F.when(F.col("arm") == "a", "b").otherwise("a").alias("arm"), "succ"
    )
    q = bayes_ab_binary(swapped, "arm", "succ").collect()[0]["prob_b_beats_a"]
    assert p + q == pytest.approx(1.0, abs=1e-5)


def test_page_hinkley_scale_invariance(spark):
    """The detector runs on shares-of-total, so replicating every turn
    k times must leave ph and alarms exactly unchanged."""
    from kkbox_churn_prediction_spark.operators.windows import page_hinkley_daily

    df = _turns(spark, days=15)
    tripled = df.union(df).union(df)
    a = {r["d"]: (r["ph"], r["alarm_flag"]) for r in page_hinkley_daily(df).collect()}
    b = {
        r["d"]: (r["ph"], r["alarm_flag"])
        for r in page_hinkley_daily(tripled).collect()
    }
    assert set(a) == set(b)
    for d in a:
        assert a[d][0] == pytest.approx(b[d][0], abs=2e-6)
        assert a[d][1] == b[d][1]


def test_holt_winters_level_shift_equivariance(spark):
    """Adding a constant c to every daily count shifts the level by
    ~c and leaves the seasonal states (differences from level)
    essentially unchanged."""
    import pandas as pd

    from kkbox_churn_prediction_spark.operators.windows import holt_winters_daily

    base = dt.datetime(2024, 1, 1)
    pattern = [12, 25, 18, 30, 15, 22, 27]
    rows, rows_shift = [], []
    for d in range(21):
        y = pattern[d % 7]
        for j in range(y):
            rows.append(("c", d * 1000 + j, "user", base + dt.timedelta(days=d, minutes=j)))
        for j in range(y + 40):
            rows_shift.append(
                ("c", d * 1000 + j, "user", base + dt.timedelta(days=d, minutes=j))
            )
    sch = "conv_id string, turn_idx int, role string, ts timestamp"
    a = pd.DataFrame(
        [r.asDict() for r in holt_winters_daily(spark.createDataFrame(rows, sch)).collect()]
    )
    b = pd.DataFrame(
        [
            r.asDict()
            for r in holt_winters_daily(
                spark.createDataFrame(rows_shift, sch)
            ).collect()
        ]
    )
    assert np.allclose(b["level"] - a["level"], 40.0, atol=1e-6)
    assert np.allclose(b["seasonal"], a["seasonal"], atol=1e-6)
    assert np.allclose(b["trend"], a["trend"], atol=1e-6)


def test_theil_properties(spark):
    """Theil T: scale-invariant (x → 3x unchanged) and increases
    under a mean-preserving concentration."""
    from kkbox_churn_prediction_spark.operators.rhythm import theil_index

    vals = [4.0, 9.0, 2.0, 7.0, 5.0, 3.0, 6.0, 4.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    t = theil_index(df, "v").collect()[0]["theil_t"]
    df3 = spark.createDataFrame([(3 * v,) for v in vals], "v double")
    t3 = theil_index(df3, "v").collect()[0]["theil_t"]
    assert t3 == pytest.approx(t, abs=1e-6)
    # move mass from the poorest to the richest, totals unchanged
    conc = vals.copy()
    conc[2] -= 1.5
    conc[1] += 1.5
    tc = theil_index(
        spark.createDataFrame([(v,) for v in conc], "v double"), "v"
    ).collect()[0]["theil_t"]
    assert tc > t


def test_hhi_merge_monotonicity(spark):
    """Merging two groups into one can only increase HHI."""
    from kkbox_churn_prediction_spark.operators.rhythm import hhi_concentration

    rows = [("a",)] * 30 + [("b",)] * 20 + [("c",)] * 50
    df = spark.createDataFrame(rows, "source string")
    h = hhi_concentration(df, "source").collect()[0]["hhi"]
    merged = df.select(
        F.when(F.col("source") == "b", "a").otherwise(F.col("source")).alias("source")
    )
    hm = hhi_concentration(merged, "source").collect()[0]["hhi"]
    assert hm > h


def test_gopher_rules_are_monotone_in_thresholds(spark):
    """Loosening every threshold can only increase pass counts."""
    from kkbox_churn_prediction_spark.operators.textstats import (
        gopher_quality_flags,
    )

    rng = np.random.default_rng(3)
    words = ["alpha", "beta", "gamma", "delta", "x", "!!", "longishword"]
    docs = spark.createDataFrame(
        [
            (
                i,
                " ".join(words[rng.integers(0, len(words))] for _ in range(int(rng.integers(5, 60)))),
                f"s{i % 3}",
            )
            for i in range(60)
        ],
        "doc_id long, text string, source string",
    )
    strict = gopher_quality_flags(docs).collect()
    loose = gopher_quality_flags(
        docs,
        min_words=1,
        max_punct_ratio=0.9,
        min_alpha_word_ratio=0.1,
        max_dup_word_ratio=0.99,
        min_mean_word_len=0.5,
        max_mean_word_len=50.0,
    ).collect()
    s = {r["source"]: r for r in strict}
    l = {r["source"]: r for r in loose}
    for src in s:
        assert l[src]["pass_all"] >= s[src]["pass_all"]
        assert l[src]["pass_word_count"] >= s[src]["pass_word_count"]


def test_circadian_rotation_equivariance(spark):
    """Shifting every timestamp by +3h rotates the mean hour by 3
    (mod 24) and leaves R unchanged."""
    from kkbox_churn_prediction_spark.operators.rhythm import circadian_profile

    df = _turns(spark, days=10)
    shifted = df.withColumn("ts", F.col("ts") + F.expr("INTERVAL 3 HOURS"))
    a = {r["role"]: r for r in circadian_profile(df).collect()}
    b = {r["role"]: r for r in circadian_profile(shifted).collect()}
    for role in a:
        assert b[role]["resultant_r"] == pytest.approx(
            a[role]["resultant_r"], abs=1e-6
        )
        assert (b[role]["mean_hour"] - a[role]["mean_hour"]) % 24 == pytest.approx(
            3.0, abs=1e-4
        )


def test_dispersion_poisson_near_one(spark):
    """True Poisson counts should produce VMR near 1 (not flagged)."""
    from kkbox_churn_prediction_spark.operators.association import dispersion_test

    rng = np.random.default_rng(42)
    rows = [("g", float(v)) for v in rng.poisson(8.0, size=4000)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = dispersion_test(df, "v", "g").collect()[0]
    assert 0.9 < r["vmr"] < 1.12
    assert r["overdispersed_flag"] == 0
