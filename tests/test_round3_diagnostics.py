"""Round-3 diagnostics family: stl_daily, balance_weights +
weight_diagnostics, skew_diagnosis."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _ts(day: int, hour: int = 0):
    return dt.datetime(2024, 1, day, hour, 0, 0)


def _turns(spark, daily_counts, start_day=1):
    rows = []
    for off, n in enumerate(daily_counts):
        day = start_day + off
        rows += [("c1", i, "user", _ts(day, i % 24)) for i in range(n)]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts timestamp"
    )


# ---------------------------------------------------------------------------
# stl_daily
# ---------------------------------------------------------------------------


def test_stl_constant_series_flat_decomposition(spark):
    from kkbox_churn_prediction_spark.operators.windows import stl_daily

    out = stl_daily(_turns(spark, [5] * 14)).collect()
    for r in out:
        assert r["trend"] == pytest.approx(5.0, abs=1e-9)
        assert r["seasonal"] == pytest.approx(0.0, abs=1e-9)
        assert r["remainder"] == pytest.approx(0.0, abs=1e-9)


def test_stl_trend_is_rolling_median_robust_to_spike(spark):
    from kkbox_churn_prediction_spark.operators.windows import stl_daily

    # flat 5s with one spike day: the 7-point MEDIAN trend stays 5 on
    # every interior day, so the spike lands entirely outside trend
    counts = [5, 5, 5, 5, 5, 50, 5, 5, 5, 5, 5]
    out = {r["d"].day: r for r in stl_daily(_turns(spark, counts)).collect()}
    for day in range(4, 9):  # interior days (full 7-point windows)
        assert out[day]["trend"] == pytest.approx(5.0, abs=1e-9)
    # decomposition identity holds everywhere
    for r in out.values():
        assert r["n_turns"] - r["trend"] - r["seasonal"] == pytest.approx(
            r["remainder"], abs=1e-6
        )


def test_stl_even_edge_window_interpolates(spark):
    from kkbox_churn_prediction_spark.operators.windows import stl_daily

    # day 2's window is days 1..5 (5 rows, odd) but day 2 of a 4-day
    # series has a 4-row window → average of the two middles
    out = {r["d"].day: r for r in stl_daily(_turns(spark, [1, 2, 3, 4])).collect()}
    # day 1 window = [1,2,3,4] → median 2.5
    assert out[1]["trend"] == pytest.approx(2.5, abs=1e-9)
    # day 4 window = [1,2,3,4] → 2.5
    assert out[4]["trend"] == pytest.approx(2.5, abs=1e-9)


# ---------------------------------------------------------------------------
# balance_weights + weight_diagnostics
# ---------------------------------------------------------------------------


def _docs(spark, sources):
    return spark.createDataFrame(
        [(i, "text %d" % i, s) for i, s in enumerate(sources)],
        "doc_id long, text string, source string",
    )


def test_balance_weights_equalize_group_totals(spark):
    from kkbox_churn_prediction_spark.operators.sampling import (
        balance_weights,
    )

    df = balance_weights(_docs(spark, ["a"] * 8 + ["b"] * 2), "source")
    per = {
        r["source"]: r["tw"]
        for r in df.groupBy("source").agg(F.sum("weight").alias("tw")).collect()
    }
    assert per["a"] == pytest.approx(per["b"], abs=1e-9)
    mean_w = df.agg(F.avg("weight")).collect()[0][0]
    assert mean_w == pytest.approx(1.0, abs=1e-9)


def test_weight_diagnostics_uniform_is_fully_effective(spark):
    from kkbox_churn_prediction_spark.operators.sampling import (
        weight_diagnostics,
    )

    df = spark.range(20).withColumn("weight", F.lit(2.5))
    r = weight_diagnostics(df, "weight").collect()[0]
    assert r["n_rows"] == 20
    assert r["ess"] == pytest.approx(20.0, abs=1e-6)
    assert r["ess_frac"] == pytest.approx(1.0, abs=1e-6)
    assert r["cv_w"] == pytest.approx(0.0, abs=1e-6)
    assert r["max_w_share"] == pytest.approx(1 / 20, abs=1e-6)


def test_weight_diagnostics_dominant_weight_collapses_ess(spark):
    from kkbox_churn_prediction_spark.operators.sampling import (
        weight_diagnostics,
    )

    rows = [(float(1000.0),)] + [(1.0,)] * 99
    df = spark.createDataFrame(rows, "weight double")
    r = weight_diagnostics(df, "weight").collect()[0]
    # ESS = (1099)^2 / (10^6 + 99) ≈ 1.2 — one row dominates
    assert r["ess"] < 2.0
    assert r["ess_frac"] < 0.02
    assert r["max_w_share"] == pytest.approx(1000.0 / 1099.0, abs=1e-6)
    # consistency: ESS/n == 1/(1+cv²)
    assert r["ess_frac"] == pytest.approx(1.0 / (1.0 + r["cv_w"] ** 2), abs=1e-4)


# ---------------------------------------------------------------------------
# skew_diagnosis
# ---------------------------------------------------------------------------


def test_skew_diagnosis_hand_computed(spark):
    from kkbox_churn_prediction_spark.operators.skew import skew_diagnosis

    # 99 keys with 1 row, 1 hot key with 101 rows → n=200, mean=2.0
    rows = [("k%03d" % i, 0, "user", _ts(1)) for i in range(99)]
    rows += [("hot", i, "user", _ts(1, i % 24)) for i in range(101)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts timestamp"
    )
    r = skew_diagnosis(df, "conv_id").collect()[0]
    assert (r["n_rows"], r["n_keys"], r["max_count"]) == (200, 100, 101)
    assert r["mean_count"] == pytest.approx(2.0, abs=1e-9)
    assert r["max_to_mean"] == pytest.approx(50.5, abs=1e-9)
    # p99: smallest c with cum keys >= 99 → c=1 covers 99 keys
    assert r["p99_count"] == 1
    assert r["salt_buckets"] == 51  # ceil(101/2)


def test_skew_diagnosis_uniform_keys_need_no_salt(spark):
    from kkbox_churn_prediction_spark.operators.skew import skew_diagnosis

    rows = [("k%d" % (i % 10), i, "user", _ts(1 + i % 5)) for i in range(50)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts timestamp"
    )
    r = skew_diagnosis(df, "conv_id").collect()[0]
    assert r["max_to_mean"] == pytest.approx(1.0, abs=1e-9)
    assert r["salt_buckets"] == 1
    assert r["p99_count"] == r["max_count"] == 5


# ---------------------------------------------------------------------------
# compression_ratio
# ---------------------------------------------------------------------------


def test_compression_ratio_matches_zlib_exactly(spark):
    import zlib

    from kkbox_churn_prediction_spark.operators.textstats import (
        compression_ratio,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    for i, t in enumerate(texts):
        raw = t.encode("utf-8")
        comp = len(zlib.compress(raw, 6))
        assert got[i]["raw_bytes"] == len(raw)
        assert got[i]["compressed_bytes"] == comp
        expect = comp / max(len(raw), 1)
        assert got[i]["ratio"] == pytest.approx(expect, abs=1e-6)


def test_compression_ratio_flags_repetitive_text(spark):
    from kkbox_churn_prediction_spark.operators.textstats import (
        compression_ratio,
    )

    natural = (
        "Measurement beats intuition when the corpus is large; every "
        "screen in the pipeline exists because a failure mode slipped "
        "past the previous one and someone traced it back."
    )
    boiler = "click here to subscribe " * 40
    df = spark.createDataFrame(
        [(0, natural), (1, boiler)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    assert not got[0]["low_entropy"]
    assert got[1]["low_entropy"]
    assert got[1]["ratio"] < got[0]["ratio"]
