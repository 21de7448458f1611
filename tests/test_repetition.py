"""Repetition/boilerplate stats goldens (Gopher/C4-style filters)."""

from __future__ import annotations

import math


def _df(spark):
    rows = [
        ("uniq", "a b c d"),            # all distinct
        ("rep", "x x x x"),             # one word repeated
        ("mix", "a b a b"),             # alternating: all bigrams distinct? a-b, b-a, a-b
        ("empty", "   "),
        ("one", "solo"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_repetition_goldens(spark):
    from kkbox_churn_prediction_spark.operators.textstats import repetition_stats

    out = {r["doc_id"]: r.asDict() for r in repetition_stats(_df(spark)).collect()}
    assert len(out) == 5

    u = out["uniq"]
    assert u["n_words"] == 4 and u["dup_word_frac"] == 0.0
    assert u["top_word_frac"] == 0.25
    assert abs(u["word_entropy"] - 2.0) < 1e-9  # 4 equiprobable words
    assert u["n_bigrams"] == 3 and u["dup_bigram_frac"] == 0.0

    r = out["rep"]
    assert r["dup_word_frac"] == 0.75  # 1 - 1/4
    assert r["top_word_frac"] == 1.0
    assert abs(r["word_entropy"]) < 1e-9
    # bigrams: 'x x' three times -> 1 - 1/3
    assert abs(r["dup_bigram_frac"] - (1 - 1 / 3)) < 1e-9

    m = out["mix"]
    assert m["dup_word_frac"] == 0.5
    assert abs(m["word_entropy"] - 1.0) < 1e-9
    # bigrams: 'a b','b a','a b' -> 3 total, 2 distinct
    assert m["n_bigrams"] == 3
    assert abs(m["dup_bigram_frac"] - (1 - 2 / 3)) < 1e-9

    e = out["empty"]
    assert e["n_words"] == 0 and e["word_entropy"] == 0.0
    assert e["dup_word_frac"] == 0.0 and e["n_bigrams"] == 0

    o = out["one"]
    assert o["n_words"] == 1 and o["n_bigrams"] == 0
    assert o["top_word_frac"] == 1.0 and o["word_entropy"] == 0.0


def test_entropy_matches_direct_formula(spark):
    from kkbox_churn_prediction_spark.operators.textstats import repetition_stats

    text = "w1 w1 w1 w2 w2 w3"
    df = spark.createDataFrame([("d", text)], ["doc_id", "text"])
    got = repetition_stats(df).first()["word_entropy"]
    probs = [3 / 6, 2 / 6, 1 / 6]
    want = -sum(p * math.log2(p) for p in probs)
    assert abs(got - want) < 1e-12
