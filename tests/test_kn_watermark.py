"""Round-3 continuation: Kneser-Ney LM scoring + out-of-order depth."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kkbox_churn_prediction_spark.operators.lags import out_of_order_depth
from kkbox_churn_prediction_spark.operators.textstats import (
    kneser_ney_logprob_score,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_kn_scores_fluent_above_scrambled(spark):
    # corpus dominated by one phrase: docs repeating it are "fluent",
    # a scrambled doc pays for impossible transitions
    fluent = "the cat sat on the mat"
    texts = [fluent] * 8 + ["mat the on sat cat the"]
    out = {r.doc_id: r for r in kneser_ney_logprob_score(_docs(spark, texts)).collect()}
    assert out[0].avg_kn_logprob > out[8].avg_kn_logprob
    assert out[0].ppl < out[8].ppl


def test_kn_bigram_counts_and_ppl_roundtrip(spark):
    texts = ["a b c d", "b c d e f"]
    out = {r.doc_id: r for r in kneser_ney_logprob_score(_docs(spark, texts)).collect()}
    assert out[0].n_bigrams == 3 and out[1].n_bigrams == 4
    for r in out.values():
        assert r.ppl == pytest.approx(
            round(math.exp(-r.avg_kn_logprob), 6), abs=2e-6
        )
        assert r.avg_kn_logprob < 0  # probabilities < 1


def test_kn_discount_reserves_mass(spark):
    # every observed bigram must get p < its unsmoothed MLE (the
    # discount takes mass), so avg logprob sits below the ML score
    texts = ["x y x y x y"]
    out = kneser_ney_logprob_score(_docs(spark, texts)).collect()[0]
    # the MLE of each bigram here is 1.0 -> ln = 0; KN must be < 0
    assert out.avg_kn_logprob < 0


def _events(spark, rows):
    # rows: (arrival, event_ts_us, tiebreak)
    return spark.createDataFrame(rows, "arr long, us long, tb long")


def test_out_of_order_hand_golden(spark):
    m = 1_000_000
    rows = [
        (1, 10 * m, 1),
        (2, 5 * m, 2),   # 5s behind the mark (10)
        (3, 20 * m, 3),
        (4, 6 * m, 4),   # 14s behind the mark (20)
        (5, 21 * m, 5),
    ]
    out = out_of_order_depth(
        _events(spark, rows), F.col("arr"), F.col("us"), F.col("tb"), exact=True
    ).collect()[0]
    assert out.n_events == 5 and out.n_late == 2
    assert out.late_rate == pytest.approx(0.4)
    assert out.max_late_us == 14 * m
    assert out.p50_late_s == pytest.approx(9.5)
    assert out.p95_late_s == pytest.approx(13.55)


def test_out_of_order_sorted_stream_has_no_lates(spark):
    rows = [(i, i * 1_000_000, i) for i in range(50)]
    out = out_of_order_depth(
        _events(spark, rows), F.col("arr"), F.col("us"), F.col("tb"), exact=True
    ).collect()[0]
    assert out.n_late == 0 and out.max_late_us == 0
    assert out.p99_late_s == 0.0


def test_out_of_order_bucketing_matches_bruteforce(spark):
    # pseudo-random fixture; compare against a single-pass brute force
    m = 1_000_000
    rows = []
    for i in range(200):
        ts = ((i * 7919) % 200) * m
        rows.append((i, ts, i))
    out = out_of_order_depth(
        _events(spark, rows),
        F.col("arr"),
        F.col("us"),
        F.col("tb"),
        n_buckets=16,
        exact=True,
    ).collect()[0]
    # brute force in python
    prior, lates = None, []
    for _, ts, _ in rows:
        if prior is not None and prior > ts:
            lates.append(prior - ts)
        prior = ts if prior is None else max(prior, ts)
    assert out.n_late == len(lates)
    assert out.max_late_us == max(lates)
    lates.sort()
    import statistics

    def q_cont(data, q):
        idx = q * (len(data) - 1)
        lo, hi = int(idx), min(int(idx) + 1, len(data) - 1)
        g = idx - lo
        return data[lo] + g * (data[hi] - data[lo])

    assert out.p50_late_s == pytest.approx(q_cont(lates, 0.5) / 1e6, abs=1e-5)
    assert out.p99_late_s == pytest.approx(q_cont(lates, 0.99) / 1e6, abs=1e-5)
