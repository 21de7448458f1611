"""Bigram PMI collocation goldens."""

from __future__ import annotations

import math


def test_pmi_golden(spark):
    from kkbox_churn_prediction_spark.operators.textstats import bigram_pmi

    # corpus: 'a b' always together (perfect collocation), 'x' floats
    rows = [("d1", "a b x a b"), ("d2", "a b x x")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {(r["w1"], r["w2"]): r for r in bigram_pmi(df, min_count=2).collect()}

    # words: a:3 b:3 x:3, nw=9; bigrams: d1: ab,bx,xa,ab d2: ab,bx,xx -> nb=7
    # 'a b' c12=3; 'b x' c12=2; others c12=1 filtered
    assert set(out) == {("a", "b"), ("b", "x")}
    ab = out[("a", "b")]
    assert ab["c12"] == 3
    want = math.log2((3 / 7) / ((3 / 9) * (3 / 9)))
    assert abs(ab["pmi"] - want) < 1e-12

    bx = out[("b", "x")]
    want_bx = math.log2((2 / 7) / ((3 / 9) * (3 / 9)))
    assert abs(bx["pmi"] - want_bx) < 1e-12


def test_threshold_is_exact(spark):
    from kkbox_churn_prediction_spark.operators.textstats import bigram_pmi

    df = spark.createDataFrame([("d", "p q p q p q")], ["doc_id", "text"])
    # 'p q' occurs 3x, 'q p' occurs 2x
    assert {r["w1"] + " " + r["w2"] for r in bigram_pmi(df, min_count=3).collect()} == {"p q"}
    assert len(bigram_pmi(df, min_count=4).collect()) == 0
