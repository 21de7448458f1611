"""Round-3 engagement/trend family: rolling_active_entities, ccf_daily,
mann_kendall_daily, vocab_richness — hand-computed goldens plus the
algebraic invariants each estimator must satisfy."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F


def _ts(day: int, hour: int = 0):
    return dt.datetime(2024, 1, day, hour, 0, 0)


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts timestamp"
    )


# ---------------------------------------------------------------------------
# rolling_active_entities
# ---------------------------------------------------------------------------


def test_rolling_active_hand_computed(spark):
    from kkbox_churn_prediction_spark.operators.windows import (
        rolling_active_entities,
    )

    # c1 active days 1,2 ; c2 active day 1 ; c3 active day 4
    rows = [
        ("c1", 0, "user", _ts(1)),
        ("c1", 1, "user", _ts(1, 5)),  # same day dup — must not double-count
        ("c1", 2, "user", _ts(2)),
        ("c2", 0, "user", _ts(1)),
        ("c3", 0, "user", _ts(4)),
    ]
    out = rolling_active_entities(_turns(spark, rows), window_days=3)
    got = {
        r["d"].day: (r["active_day"], r["active_window"], r["stickiness"])
        for r in out.collect()
    }
    # windows ending day d cover (d-3, d]
    assert got[1] == (2, 2, 1.0)
    assert got[2] == (1, 2, 0.5)
    assert got[3] == (0, 2, 0.0)  # gap day: c1,c2 still in window
    assert got[4] == (1, 2, 0.5)  # c1 (day 2) + c3
    assert set(got) == {1, 2, 3, 4}  # bounded by corpus max day


def test_rolling_active_window1_equals_daily_distinct(spark):
    from kkbox_churn_prediction_spark.operators.windows import (
        rolling_active_entities,
    )

    rows = [
        ("c%d" % (i % 5), i, "user", _ts(1 + i % 7, i % 24)) for i in range(60)
    ]
    out = rolling_active_entities(_turns(spark, rows), window_days=1)
    for r in out.collect():
        assert r["active_window"] == r["active_day"]
        assert r["stickiness"] == 1.0


# ---------------------------------------------------------------------------
# ccf_daily
# ---------------------------------------------------------------------------


def _role_turns(spark, user_daily, assistant_daily):
    rows = []
    for day, n in enumerate(user_daily, start=1):
        rows += [("c1", i, "user", _ts(day, i % 24)) for i in range(n)]
    for day, n in enumerate(assistant_daily, start=1):
        rows += [
            ("c1", 100 + i, "assistant", _ts(day, i % 24)) for i in range(n)
        ]
    return _turns(spark, rows)


def test_ccf_identical_series_peaks_at_zero(spark):
    from kkbox_churn_prediction_spark.operators.windows import ccf_daily

    series = [1, 5, 2, 8, 3, 9, 4]
    t = _role_turns(spark, series, series)
    out = {r["lag"]: r["ccf"] for r in ccf_daily(t, max_lag=2).collect()}
    assert out[0] == pytest.approx(1.0, abs=1e-6)
    assert all(abs(out[k]) < 1.0 for k in out if k != 0)


def test_ccf_shifted_series_peaks_at_shift(spark):
    from kkbox_churn_prediction_spark.operators.windows import ccf_daily

    a = [1, 9, 2, 8, 1, 7, 2, 9, 1]
    b = a[1:] + [5]  # b today mirrors a tomorrow → a lags b → peak at lag -1?
    # b_{t} = a_{t+1}: positive correlation of a_t with b_{t-1}... lag k
    # means pairing a_t with b_{t-k}; b_{t-1} = a_t, so peak at k = +1.
    t = _role_turns(spark, a, b)
    out = {r["lag"]: r["ccf"] for r in ccf_daily(t, max_lag=3).collect()}
    peak = max(out, key=lambda k: out[k] if out[k] is not None else -9)
    assert peak == 1
    assert out[1] > 0.9


def test_ccf_symmetric_counts_and_lag_range(spark):
    from kkbox_churn_prediction_spark.operators.windows import ccf_daily

    t = _role_turns(spark, [3, 1, 4, 1, 5, 9, 2], [2, 7, 1, 8, 2, 8, 1])
    rows = ccf_daily(t, max_lag=3).collect()
    got = {r["lag"]: r["n_pairs"] for r in rows}
    assert set(got) == set(range(-3, 4))
    for k in range(1, 4):
        assert got[k] == got[-k] == 7 - k
    assert got[0] == 7


# ---------------------------------------------------------------------------
# mann_kendall_daily
# ---------------------------------------------------------------------------


def test_mann_kendall_strictly_increasing(spark):
    from kkbox_churn_prediction_spark.operators.windows import (
        mann_kendall_daily,
    )

    # day d has d turns → strictly increasing daily series, no ties
    rows = []
    for day in range(1, 9):
        rows += [("c1", i, "user", _ts(day, i % 24)) for i in range(day)]
    r = mann_kendall_daily(_turns(spark, rows)).collect()[0]
    n = 8
    assert r["n_days"] == n
    assert r["s_stat"] == n * (n - 1) // 2
    assert r["tau_b"] == pytest.approx(1.0, abs=1e-6)
    var = n * (n - 1) * (2 * n + 5) / 18.0
    assert r["var_s"] == pytest.approx(var, abs=1e-6)
    assert r["z_stat"] == pytest.approx((r["s_stat"] - 1) / math.sqrt(var), abs=1e-5)


def test_mann_kendall_constant_series_is_null_trend(spark):
    from kkbox_churn_prediction_spark.operators.windows import (
        mann_kendall_daily,
    )

    rows = []
    for day in range(1, 7):
        rows += [("c1", i, "user", _ts(day, i % 12)) for i in range(3)]
    r = mann_kendall_daily(_turns(spark, rows)).collect()[0]
    assert r["s_stat"] == 0
    assert r["z_stat"] == 0.0
    assert r["tau_b"] == 0.0
    # all 6 days tied at 3 → var fully consumed by the tie term
    assert r["var_s"] == pytest.approx(0.0, abs=1e-9)


def test_mann_kendall_sign_flip_under_reversal(spark):
    from kkbox_churn_prediction_spark.operators.windows import (
        mann_kendall_daily,
    )

    up, down = [], []
    counts = [2, 5, 3, 7, 4, 9]
    for day, c in enumerate(counts, start=1):
        up += [("c1", i, "user", _ts(day, i % 24)) for i in range(c)]
    for day, c in enumerate(reversed(counts), start=1):
        down += [("c1", i, "user", _ts(day, i % 24)) for i in range(c)]
    ru = mann_kendall_daily(_turns(spark, up)).collect()[0]
    rd = mann_kendall_daily(_turns(spark, down)).collect()[0]
    assert ru["s_stat"] == -rd["s_stat"]
    assert ru["tau_b"] == pytest.approx(-rd["tau_b"], abs=1e-9)
    assert ru["z_stat"] == pytest.approx(-rd["z_stat"], abs=1e-9)


# ---------------------------------------------------------------------------
# vocab_richness
# ---------------------------------------------------------------------------


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_vocab_richness_hand_computed(spark):
    from kkbox_churn_prediction_spark.operators.textstats import (
        vocab_richness,
    )

    r = vocab_richness(_docs(spark, ["a a b", "c"])).collect()[0]
    # counts: a=2, b=1, c=1 → N=4, V=3, f1=2, f2=1
    assert (r["total_tokens"], r["vocab_size"], r["f1"], r["f2"]) == (4, 3, 2, 1)
    assert r["chao1"] == pytest.approx(3 + 2 * 1 / (2 * 2), abs=1e-9)
    assert r["coverage"] == pytest.approx(0.5, abs=1e-9)


def test_vocab_richness_no_singletons_means_full_coverage(spark):
    from kkbox_churn_prediction_spark.operators.textstats import (
        vocab_richness,
    )

    r = vocab_richness(_docs(spark, ["x y x y", "x y"])).collect()[0]
    assert r["f1"] == 0
    assert r["chao1"] == pytest.approx(r["vocab_size"], abs=1e-9)
    assert r["coverage"] == pytest.approx(1.0, abs=1e-9)


def test_vocab_richness_chao1_at_least_observed(spark):
    from kkbox_churn_prediction_spark.operators.textstats import (
        vocab_richness,
    )

    texts = ["the quick brown fox", "the lazy dog", "a b c the quick"]
    r = vocab_richness(_docs(spark, texts)).collect()[0]
    assert r["chao1"] >= r["vocab_size"]
    assert 0.0 <= r["coverage"] <= 1.0


# ---------------------------------------------------------------------------
# granger_daily
# ---------------------------------------------------------------------------


def test_granger_detects_lagged_dependence_direction(spark):
    from kkbox_churn_prediction_spark.operators.windows import granger_daily

    # b today = a yesterday + small noise: a→b should dominate b→a
    a = [3, 9, 2, 8, 4, 7, 1, 9, 3, 8, 2, 7, 5, 9]
    noise = [1, 0, 1, 0, 0, 1, 0, 1, 1, 0, 1, 0, 0, 1]
    b = [5] + [x + e for x, e in zip(a[:-1], noise[1:])]
    t = _role_turns(spark, a, b)
    out = {r["direction"]: r for r in granger_daily(t).collect()}
    assert set(out) == {"a_to_b", "b_to_a"}
    assert out["a_to_b"]["n_obs"] == len(a) - 1
    assert out["a_to_b"]["f_stat"] is not None
    assert out["a_to_b"]["f_stat"] > 10 * max(out["b_to_a"]["f_stat"] or 0.0, 0.1)
    # near-copy → tiny unrestricted RSS in the a→b direction
    assert out["a_to_b"]["rss_u"] < out["a_to_b"]["rss_r"] / 10


def test_granger_perfect_copy_null_guards_infinite_f(spark):
    from kkbox_churn_prediction_spark.operators.windows import granger_daily

    # b today = a yesterday EXACTLY: rss_u is 0, so F is infinite and the
    # division guard must yield NULL rather than a blow-up.
    a = [3, 9, 2, 8, 4, 7, 1, 9, 3, 8, 2, 7, 5, 9]
    b = [5] + a[:-1]
    t = _role_turns(spark, a, b)
    out = {r["direction"]: r for r in granger_daily(t).collect()}
    assert out["a_to_b"]["rss_u"] == pytest.approx(0.0, abs=1e-6)
    assert out["a_to_b"]["f_stat"] is None


def test_granger_matches_numpy_least_squares(spark):
    import numpy as np

    from kkbox_churn_prediction_spark.operators.windows import granger_daily

    a = [4, 7, 3, 9, 5, 6, 2, 8, 4, 7]
    b = [6, 3, 8, 4, 9, 2, 7, 5, 8, 3]
    t = _role_turns(spark, a, b)
    out = {r["direction"]: r for r in granger_daily(t).collect()}

    av, bv = np.array(a, float), np.array(b, float)
    y, yl, xl = bv[1:], bv[:-1], av[:-1]
    one = np.ones_like(y)
    Xu = np.column_stack([one, yl, xl])
    Xr = np.column_stack([one, yl])
    rss = lambda X: float(
        np.sum((y - X @ np.linalg.lstsq(X, y, rcond=None)[0]) ** 2)
    )
    rss_u, rss_r = rss(Xu), rss(Xr)
    m = len(y)
    f = (rss_r - rss_u) / (rss_u / (m - 3))
    g = out["a_to_b"]
    assert g["rss_r"] == pytest.approx(rss_r, abs=1e-4)
    assert g["rss_u"] == pytest.approx(rss_u, abs=1e-4)
    assert g["f_stat"] == pytest.approx(f, abs=1e-3)


def test_granger_constant_predictor_is_null_guarded(spark):
    from kkbox_churn_prediction_spark.operators.windows import granger_daily

    # constant a series → singular design in both directions' cross term
    a = [5] * 10
    b = [3, 7, 2, 8, 4, 6, 1, 9, 5, 2]
    t = _role_turns(spark, a, b)
    out = {r["direction"]: r for r in granger_daily(t).collect()}
    # det = 0 when a predictor has zero variance → NULL rss_u / f_stat
    assert out["a_to_b"]["rss_u"] is None
    assert out["a_to_b"]["f_stat"] is None
