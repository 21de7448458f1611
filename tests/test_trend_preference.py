"""Round-3 continuation: Theil-Sen trend, Durbin-Levinson PACF,
tool retry chains, Bradley-Terry preference fit."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kkbox_churn_prediction_spark.operators.lags import tool_retry_chains
from kkbox_churn_prediction_spark.operators.preference import (
    bradley_terry,
    preference_pairs_from_turns,
)
from kkbox_churn_prediction_spark.operators.windows import (
    daily_acf,
    pacf_daily,
    theil_sen_daily,
)


def _daily_turns(spark, counts):
    rows = []
    for i, c in enumerate(counts):
        day = dt.datetime(2024, 1, 1) + dt.timedelta(days=i)
        rows += [(f"c{i}_{j}", day + dt.timedelta(seconds=j)) for j in range(c)]
    return spark.createDataFrame(rows, "conv_id string, ts timestamp")


def test_theil_sen_exact_linear(spark):
    counts = [10 + 3 * i for i in range(12)]
    out = theil_sen_daily(_daily_turns(spark, counts)).collect()[0]
    assert out.n_days == 12
    assert out.n_pairs == 12 * 11 // 2
    assert out.slope_per_day == pytest.approx(3.0)


def test_theil_sen_robust_to_one_outlier(spark):
    counts = [10 + 3 * i for i in range(12)]
    counts[5] = 500  # one corrupted day
    out = theil_sen_daily(_daily_turns(spark, counts)).collect()[0]
    # the median of pairwise slopes shrugs off a single outlier day
    assert out.slope_per_day == pytest.approx(3.0, abs=0.5)


def test_pacf_lag1_equals_acf_lag1(spark):
    counts = [10, 14, 9, 22, 17, 13, 25, 11, 19, 16, 21, 12, 18, 15]
    turns = _daily_turns(spark, counts)
    acf1 = {r.lag: r.acf for r in daily_acf(turns, max_lag=4).collect()}[1]
    out = {r.lag: r for r in pacf_daily(turns).collect()}
    assert out[1].pacf == pytest.approx(acf1, abs=1e-6)
    assert set(out) == {1, 2, 3, 4}
    for r in out.values():  # finite, sane range for a real series
        assert r.pacf is not None and abs(r.pacf) <= 1.5


def test_pacf_constant_series_is_null(spark):
    out = pacf_daily(_daily_turns(spark, [7] * 10)).collect()
    assert all(r.pacf is None for r in out)


def _tool_conv(spark, tools):
    base = dt.datetime(2024, 3, 1)
    rows = [
        ("c1", i, t, base + dt.timedelta(minutes=i)) for i, t in enumerate(tools)
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, tool string, ts timestamp"
    )


def test_retry_chains_hand_golden(spark):
    out = {
        r.tool: r
        for r in tool_retry_chains(
            _tool_conv(spark, ["a", "a", "a", "b", "a", None])
        ).collect()
    }
    assert out["a"].n_calls == 4
    assert out["a"].n_chains == 2
    assert out["a"].n_retries == 2
    assert out["a"].max_chain_len == 3
    assert out["a"].retry_rate == pytest.approx(0.5)
    assert out["b"].n_calls == 1 and out["b"].n_retries == 0
    assert None not in out  # null tools are not calls


def test_retry_chains_cross_conv_isolation(spark):
    # the same tool ending one conv and starting the next is NOT a retry
    base = dt.datetime(2024, 3, 1)
    rows = [
        ("c1", 0, "a", base),
        ("c2", 0, "a", base + dt.timedelta(minutes=1)),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, tool string, ts timestamp"
    )
    out = tool_retry_chains(df).collect()[0]
    assert out.n_retries == 0 and out.n_chains == 2


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "winner string, loser string")


def test_bradley_terry_two_item_closed_form(spark):
    # A beats B 3:1 -> P(A beats B) = 3/4 -> p_A/p_B = 3; mean-1
    # normalization gives (1.5, 0.5); the 2-item MM lands there in one step
    rows = [("a", "b")] * 3 + [("b", "a")]
    out = {r.item: r for r in bradley_terry(_pairs(spark, rows), ["a", "b"]).collect()}
    assert out["a"].bt_score == pytest.approx(1.5, abs=1e-6)
    assert out["b"].bt_score == pytest.approx(0.5, abs=1e-6)
    assert out["a"].rank == 1 and out["b"].rank == 2
    assert out["a"].wins == 3 and out["a"].matches == 4


def test_bradley_terry_swap_flips_ranking(spark):
    rows = [("a", "b")] * 5 + [("b", "c")] * 5 + [("a", "c")] * 5
    fwd = {r.item: r.rank for r in bradley_terry(_pairs(spark, rows), ["a", "b", "c"]).collect()}
    swp = {
        r.item: r.rank
        for r in bradley_terry(
            _pairs(spark, [(l, w) for w, l in rows]), ["a", "b", "c"]
        ).collect()
    }
    assert fwd["a"] == 1 and swp["a"] == 3


def test_bradley_terry_probability_recovery(spark):
    # a round-robin with consistent 2:1 ratios: fitted strengths must
    # reproduce the pairwise win odds p_i/(p_i+p_j)
    rows = (
        [("a", "b")] * 6 + [("b", "a")] * 3
        + [("b", "c")] * 6 + [("c", "b")] * 3
        + [("a", "c")] * 8 + [("c", "a")] * 2
    )
    out = {r.item: r.bt_score for r in bradley_terry(_pairs(spark, rows), ["a", "b", "c"]).collect()}
    p_ab = out["a"] / (out["a"] + out["b"])
    assert p_ab == pytest.approx(6 / 9, abs=0.05)
    assert out["a"] > out["b"] > out["c"]


def test_preference_pairs_winner_logic(spark):
    base = dt.datetime(2024, 5, 1)
    rows = [
        ("c1", 0, "user", "hi", base),
        ("c1", 1, "assistant", "longer reply", base + dt.timedelta(seconds=1)),
        ("c1", 2, "user", "same length!", base + dt.timedelta(seconds=2)),
        ("c1", 3, "assistant", "ok", base + dt.timedelta(seconds=3)),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, ts timestamp"
    )
    got = [(r.winner, r.loser) for r in preference_pairs_from_turns(df).collect()]
    # turn0->1: assistant longer; 1->2: tie (12 chars) -> lexicographic
    # least wins (assistant); 2->3: user longer
    assert ("assistant", "user") in got
    assert ("user", "assistant") in got
    assert len(got) == 3


def test_bradley_terry_driver_and_distributed_identical(spark):
    rows = [
        ("a", "b"), ("a", "b"), ("a", "c"), ("b", "c"),
        ("c", "a"), ("b", "a"), ("a", "c"), ("a", "b"),
    ]
    pairs = spark.createDataFrame(rows, "winner string, loser string")
    items = ["a", "b", "c"]
    d = bradley_terry(pairs, items, mode="driver").collect()
    s = bradley_terry(pairs, items, mode="distributed").collect()
    assert sorted(map(tuple, d)) == sorted(map(tuple, s))
