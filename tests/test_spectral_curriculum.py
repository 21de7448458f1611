"""Round-3 continuation: periodogram, LSH recall eval, curriculum order."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kkbox_churn_prediction_spark.operators.dedup import lsh_recall_eval
from kkbox_churn_prediction_spark.operators.sampling import curriculum_order
from kkbox_churn_prediction_spark.operators.windows import periodogram_daily


def _daily_turns(spark, counts):
    rows = []
    for i, c in enumerate(counts):
        day = dt.datetime(2024, 1, 1) + dt.timedelta(days=i)
        rows += [(f"c{i}_{j}", day + dt.timedelta(seconds=j)) for j in range(c)]
    return spark.createDataFrame(rows, "conv_id string, ts timestamp")


def test_periodogram_finds_weekly_rhythm(spark):
    # clean period-7 square wave over 8 weeks -> period 7 ranks first
    counts = [30 if i % 7 == 0 else 10 for i in range(56)]
    out = {r.period: r for r in periodogram_daily(_daily_turns(spark, counts)).collect()}
    assert out[7].rank == 1
    assert out[7].power_norm > 0.5


def test_periodogram_constant_series(spark):
    out = periodogram_daily(_daily_turns(spark, [5] * 21)).collect()
    for r in out:
        assert r.power == pytest.approx(0.0, abs=1e-9)
        assert r.power_norm == pytest.approx(0.0, abs=1e-9)


def test_periodogram_period4_signal(spark):
    counts = [20 if i % 4 == 0 else 8 for i in range(48)]
    out = {r.period: r for r in periodogram_daily(_daily_turns(spark, counts)).collect()}
    assert out[4].rank == 1
    # the harmonic at period 2 carries energy too, but 4 dominates
    assert out[4].power > out[7].power


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_lsh_recall_perfect_on_identical_docs(spark):
    # identical docs share every band -> all true pairs are candidates
    texts = ["alpha beta gamma delta epsilon zeta"] * 4 + [
        "totally different words here now indeed",
        "another unrelated document body text sample",
    ]
    out = lsh_recall_eval(_docs(spark, texts), threshold=0.9).collect()[0]
    assert out.n_true == 6  # C(4,2)
    assert out.n_common == 6
    assert out.recall == pytest.approx(1.0)
    assert 0.0 < out.precision <= 1.0


def test_lsh_recall_bounds(spark):
    texts = [
        f"the quick brown fox jumps over lazy dog number {i} extra filler words"
        for i in range(10)
    ] + ["the quick brown fox jumps over lazy dog number 0 extra filler words"]
    out = lsh_recall_eval(_docs(spark, texts), threshold=0.5).collect()[0]
    assert out.n_common <= min(out.n_true, out.n_candidates)
    assert 0.0 <= out.recall <= 1.0 and 0.0 <= out.precision <= 1.0


def _scored_docs(spark, n=40):
    return spark.createDataFrame(
        [(i, (i * 13) % 100 + 1) for i in range(n)], "doc_id long, n_chars long"
    )


def test_curriculum_stages_are_quartiles(spark):
    out = curriculum_order(
        _scored_docs(spark), F.col("n_chars"), n_stages=4, exact=True
    ).collect()
    from collections import Counter

    sizes = Counter(r.stage for r in out)
    assert set(sizes) == {1, 2, 3, 4}
    assert max(sizes.values()) - min(sizes.values()) <= 2  # near-balanced
    # stages are monotone in score: every stage-1 doc scores <= every stage-4 doc
    s1max = max(r.score for r in out if r.stage == 1)
    s4min = min(r.score for r in out if r.stage == 4)
    assert s1max <= s4min


def test_curriculum_sort_key_orders_stages(spark):
    out = curriculum_order(
        _scored_docs(spark), F.col("n_chars"), n_stages=4, exact=True
    ).collect()
    ordered = sorted(out, key=lambda r: r.sort_key)
    stages = [r.stage for r in ordered]
    assert stages == sorted(stages)  # the single key streams easy -> hard


def test_curriculum_deterministic_and_windowless(spark):
    df = _scored_docs(spark)
    a = sorted(
        curriculum_order(df, F.col("n_chars"), exact=True).collect(),
        key=lambda r: r.doc_id,
    )
    b = sorted(
        curriculum_order(df, F.col("n_chars"), exact=True).collect(),
        key=lambda r: r.doc_id,
    )
    assert a == b
    plan = curriculum_order(df, F.col("n_chars"), exact=True)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # scale contract: no global row-number
