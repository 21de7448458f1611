"""Composed corpus-curation pipeline: verdict precedence, canonical
selection, and the one-scan/one-shuffle plan contract."""

from __future__ import annotations

import pytest


def _docs(spark):
    rows = [
        # kept: long clean english text
        (1, "the cat sat on the mat and the dog ran to the park in the sun today", "en"),
        # duplicate of 1 (same normalized text, higher id → dropped)
        (2, "  The cat sat on the mat and the dog ran to the park in the sun today ", "en"),
        # low quality: short AND punct-heavy (fails 2 of 3 checks →
        # quality 1/3); its lang is also not 'en', so this row proves
        # quality outranks lang in the verdict precedence
        (3, "der!!! ??? !!!", "de"),
        # wrong lang: long german text passing quality
        (4, "der hund und die katze sind ein gutes team und das ist der beweis "
            "und die geschichte ist lang", "de"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_verdict_precedence_and_canonical(spark):
    from kkbox_churn_prediction_spark.plans.curation import curate_corpus

    got = {r["doc_id"]: r for r in curate_corpus(_docs(spark)).collect()}
    assert got[1]["verdict"] == "kept" and got[1]["dup_group_size"] == 2
    assert got[2]["verdict"] == "duplicate"
    assert got[3]["verdict"] == "low_quality"  # quality outranks lang
    assert got[4]["verdict"] == "wrong_lang"
    assert got[4]["pred_lang"] == "de"


def test_report_totals(spark):
    from kkbox_churn_prediction_spark.plans.curation import (
        curate_corpus,
        curation_report,
    )

    rep = {r["verdict"]: (r["n_docs"], r["total_tokens"])
           for r in curation_report(curate_corpus(_docs(spark))).collect()}
    assert rep["kept"][0] == 1 and rep["duplicate"][0] == 1
    assert sum(n for n, _ in rep.values()) == 4


def test_single_scan_plan(tmp_path, spark):
    """All per-doc signals fuse into one projection: exactly ONE
    parquet scan in the physical plan (the dedup self-agg reuses it
    via the exchange, not a second read)."""
    from kkbox_churn_prediction_spark.plans.curation import curate_corpus

    _docs(spark).write.mode("overwrite").parquet(f"{tmp_path}/docs")
    df = curate_corpus(spark.read.parquet(f"{tmp_path}/docs"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_scans = plan.count("Scan parquet")
    assert n_scans <= 2  # base + self-agg branch; never one per operator
    # exactly one join (the dedup self-agg join) — quality, language,
    # and the dedup key never add joins of their own
    n_joins = sum(plan.count(j) for j in
                  ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"))
    assert n_joins == 1
    got = {r["doc_id"]: r["verdict"] for r in df.collect()}
    assert got[1] == "kept"


def test_tfidf_top_terms_ranks_distinctive_words(spark):
    from kkbox_churn_prediction_spark.operators.textstats import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "the cat the cat zebra"),
            (2, "the dog the dog"),
            (3, "the bird"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["term"]))
    # 'the' appears in every doc (df=3, lowest idf); distinctive terms win
    assert sorted(by_doc[1])[0][1] == "cat"      # tf=2, df=1
    assert sorted(by_doc[2])[0][1] == "dog"
    assert sorted(by_doc[3])[0][1] == "bird"
    # k bound respected and ranks dense from 1
    assert all(len(v) <= 2 and min(r for r, _ in v) == 1 for v in by_doc.values())


def test_bm25_matches_reference_formula(spark):
    import math

    from kkbox_churn_prediction_spark.operators.textstats import bm25_scores

    texts = {
        1: "cat dog cat fish",
        2: "cat cat cat cat cat cat cat cat",   # high tf, long doc
        3: "dog bird",
        4: "fish fish dog",
        5: "zebra lion",                        # no query terms → excluded
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    terms, k1, b = ("cat", "dog"), 1.2, 0.75
    got = {r["doc_id"]: r for r in bm25_scores(docs, terms, k=10, k1=k1, b=b).collect()}

    # independent reference computation
    toks = {d: t.split() for d, t in texts.items()}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    exp = {}
    for d, tv in toks.items():
        s, hits = 0.0, 0
        for t in terms:
            tf = tv.count(t)
            if tf == 0:
                continue
            df = sum(1 for v in toks.values() if t in v)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            s += idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * len(tv) / avgdl))
            hits += 1
        if hits:
            exp[d] = (round(s, 6), hits, len(tv))

    assert set(got) == set(exp) == {1, 2, 3, 4}
    for d, (score, hits, dl) in exp.items():
        assert got[d]["bm25"] == pytest.approx(score, abs=1e-6)
        assert got[d]["n_terms_hit"] == hits and got[d]["dl"] == dl
    # rank order: score desc, doc_id asc tiebreak; dense from 1
    ordered = sorted(exp, key=lambda d: (-exp[d][0], d))
    assert [got[d]["rank"] for d in ordered] == [1, 2, 3, 4]
    # length normalization: doc 2's raw tf=8 must not scale linearly
    assert got[2]["bm25"] < 8 * got[3]["bm25"]


def test_unigram_logprob_ranks_common_text_higher(spark):
    from kkbox_churn_prediction_spark.operators.textstats import unigram_logprob_score

    docs = spark.createDataFrame(
        [
            (1, "the the the the"),          # all high-frequency tokens
            (2, "the zzz qqq vvv"),          # mostly singletons
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in unigram_logprob_score(docs).collect()}
    assert got[1]["avg_token_logprob"] > got[2]["avg_token_logprob"]
    assert got[1]["n_scored_tokens"] == 4
    # numpy cross-check: 'the' appears 5/8 times; doc1 = ln(5/8)
    import math
    assert got[1]["avg_token_logprob"] == round(math.log(5 / 8), 6)


def test_vocab_coverage_oov_accounting(spark):
    from kkbox_churn_prediction_spark.operators.textstats import vocab_coverage

    docs = spark.createDataFrame(
        [
            (1, "the the the cat"),     # 'the' dominant
            (2, "the cat dog"),
            (3, "zebra quux"),          # fully OOV at vocab_size=2
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in vocab_coverage(docs, vocab_size=2).collect()}
    # vocab = {'the' (4), 'cat' (2)} — 'dog'/'zebra'/'quux' are OOV
    assert got[1]["n_tokens"] == 4 and got[1]["n_in_vocab"] == 4
    assert got[1]["oov_rate"] == 0.0
    assert got[2]["n_in_vocab"] == 2 and got[2]["oov_rate"] == pytest.approx(1 / 3, abs=1e-6)
    assert got[3]["n_in_vocab"] == 0 and got[3]["oov_rate"] == 1.0
    # deterministic tiebreak at the vocab boundary: count desc, term asc
    docs2 = spark.createDataFrame(
        [(1, "aa bb"), (2, "aa bb cc")], "doc_id long, text string"
    )
    # counts: aa=2, bb=2, cc=1 → vocab_size=1 picks 'aa' (term asc tiebreak)
    g2 = {r["doc_id"]: r for r in vocab_coverage(docs2, vocab_size=1).collect()}
    assert g2[1]["n_in_vocab"] == 1 and g2[2]["n_in_vocab"] == 1


def test_source_datacard_rates(spark):
    """Per-source rollup: rates come from the same verdict logic as
    curate_corpus, grouped by source."""
    import pyspark.sql.functions as F

    from kkbox_churn_prediction_spark.plans.curation import (
        curate_corpus,
        source_datacard,
    )

    good = "the a of and to in is " * 4  # high-quality english
    docs = spark.createDataFrame(
        [
            (1, "srcA", good + "one"),
            (2, "srcA", good + "one"),      # exact dup of doc 1 (normalized)
            (3, "srcA", good + "two"),
            (4, "srcB", "zz"),              # low quality (too short)
        ],
        ["doc_id", "source", "text"],
    )
    card = {r.source: r for r in source_datacard(docs).collect()}
    assert card["srcA"].n_docs == 3
    assert card["srcA"].dup_rate == pytest.approx(round(1 / 3, 6))
    assert card["srcB"].kept_rate == 0.0 and card["srcB"].n_docs == 1
    # cross-check totals against the underlying verdict table
    verdicts = curate_corpus(docs).groupBy("verdict").count().collect()
    vd = {r.verdict: r["count"] for r in verdicts}
    assert vd.get("duplicate") == 1


class TestDsirScores:
    def test_target_like_text_scores_higher(self, spark):
        from pyspark.sql import functions as F

        from kkbox_churn_prediction_spark.operators.textstats import dsir_scores

        rows = (
            [(i, "target", "alpha beta alpha beta") for i in range(10)]
            + [(100 + i, "raw", "gamma delta gamma delta") for i in range(10)]
            + [(200, "raw", "alpha beta alpha beta"),  # target-like raw doc
               (201, "raw", "alpha gamma beta delta")]  # half-half
        )
        docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
        out = {
            r["doc_id"]: r["dsir_logratio"]
            for r in dsir_scores(docs, F.col("source") == "target").collect()
        }
        # target-like text scores higher than raw-like, mixture between
        assert out[200] > out[201] > out[100]
        # the score is a log-RATIO: target-vocab positive, raw-vocab negative
        assert out[200] > 0 > out[100]
        # token counts surface
        assert all(
            r["n_scored_tokens"] == 4
            for r in dsir_scores(docs, F.col("source") == "target").collect()
        )

    def test_unseen_bucket_smoothing_finite(self, spark):
        from pyspark.sql import functions as F

        from kkbox_churn_prediction_spark.operators.textstats import dsir_scores

        # a word that appears ONLY in raw: target count 0 in its bucket
        docs = spark.createDataFrame(
            [(1, "t", "common words here"), (2, "r", "common words zzzunseen")],
            "doc_id long, source string, text string",
        )
        out = dsir_scores(docs, F.col("source") == "t").collect()
        assert all(
            r["dsir_logratio"] is not None and abs(r["dsir_logratio"]) < 50
            for r in out
        )


def test_vocab_growth_golden(spark):
    from datetime import datetime

    from kkbox_churn_prediction_spark.operators.textstats import vocab_growth

    w1 = datetime(2024, 1, 1)   # a Monday
    w2 = datetime(2024, 1, 8)
    rows = [
        ("a", 0, "user", "alpha beta", None, w1),
        ("b", 0, "user", "beta gamma", None, w1),
        # week 2: one repeat type + one new
        ("c", 0, "user", "gamma delta", None, w2),
    ]
    turns = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )
    out = sorted(vocab_growth(turns).collect(), key=lambda r: r["bucket"])
    assert [r["n_types"] for r in out] == [3, 2]       # {alpha,beta,gamma}, {gamma,delta}
    assert [r["n_new_types"] for r in out] == [3, 1]   # delta is the only new type
    assert [r["cum_types"] for r in out] == [3, 4]


def test_distinctive_terms_golden(spark):
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.textstats import distinctive_terms

    rows = (
        [(i, "t", "alpha common filler words here") for i in range(10)]
        + [(100 + i, "r", "omega common filler words here") for i in range(10)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = distinctive_terms(
        docs, F.col("source") == "t", k=3, min_count=2
    ).collect()
    by_side = {}
    for r in out:
        by_side.setdefault(r["side"], []).append(r)
    # the exclusive terms head each side's list with the largest |z|
    assert by_side["target"][0]["term"] == "alpha"
    assert by_side["rest"][0]["term"] == "omega"
    assert by_side["target"][0]["z"] > 0 > by_side["rest"][0]["z"]
    # shared terms score near zero
    shared = [r for r in out if r["term"] == "common"]
    assert all(abs(r["z"]) < 0.5 for r in shared)
    # counts surface for auditability
    assert by_side["target"][0]["yt"] == 10 and by_side["target"][0]["yr"] == 0


def test_heaps_law_duplicated_vs_fresh(spark):
    from datetime import datetime, timedelta

    from kkbox_churn_prediction_spark.operators.textstats import heaps_law_fit

    w0 = datetime(2024, 1, 1)

    def corpus(texts_by_week):
        rows = []
        for wk, text in enumerate(texts_by_week):
            rows.append(("c%d" % wk, 0, "user", text, None, w0 + timedelta(days=7 * wk)))
        return spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string,"
            " tool string, ts timestamp",
        )

    # fresh: every week brings brand-new vocabulary -> beta near 1
    fresh = corpus(
        [" ".join(f"w{wk}_{i}" for i in range(20)) for wk in range(6)]
    )
    b_fresh = heaps_law_fit(fresh).collect()[0]
    # re-crawled: the same 20 words every week -> beta 0 (flat curve)
    dup = corpus([" ".join(f"t{i}" for i in range(20))] * 6)
    b_dup = heaps_law_fit(dup).collect()[0]
    assert b_fresh["beta"] > 0.9
    assert abs(b_dup["beta"]) < 1e-6
    assert b_fresh["n_points"] == 6 and b_fresh["r2"] > 0.99


def test_vocab_threshold_coverage_golden(spark):
    from kkbox_churn_prediction_spark.operators.textstats import (
        vocab_threshold_coverage,
    )

    # 1 type ×10 occurrences, 2 types ×3, 4 types ×1 → 20 tokens
    text_parts = ["hot"] * 10 + ["warm1"] * 3 + ["warm2"] * 3 + [
        "cold1", "cold2", "cold3", "cold4",
    ]
    docs = spark.createDataFrame([(0, " ".join(text_parts))], "doc_id long, text string")
    out = {
        r["threshold"]: r
        for r in vocab_threshold_coverage(docs, thresholds=(1, 2, 5)).collect()
    }
    assert out[1]["n_types"] == 7 and out[1]["token_share"] == 1.0
    assert out[2]["n_types"] == 3
    assert out[2]["token_share"] == round(16 / 20, 6)
    assert out[5]["n_types"] == 1 and out[5]["token_share"] == 0.5
    # monotone: a higher floor never covers more
    assert out[1]["token_share"] >= out[2]["token_share"] >= out[5]["token_share"]


def test_distinct_ngram_diversity_golden(spark):
    from kkbox_churn_prediction_spark.operators.textstats import (
        distinct_ngram_diversity,
    )

    docs = spark.createDataFrame(
        [
            # template slice: same 3-token doc twice -> cross-doc dup
            ("tpl", "a b c"),
            ("tpl", "a b c"),
            # fresh slice: all-new tokens
            ("new", "p q r s"),
        ],
        "source string, text string",
    )
    out = {
        r["source"]: r for r in distinct_ngram_diversity(docs).collect()
    }
    tpl = out["tpl"]
    # 6 unigram tokens, 3 distinct; 4 bigrams, 2 distinct; 2 trigrams, 1 distinct
    assert tpl["n_unigrams"] == 6 and tpl["distinct_unigrams"] == 3
    assert tpl["distinct_1"] == 0.5
    assert tpl["n_bigrams"] == 4 and tpl["distinct_bigrams"] == 2
    assert tpl["distinct_2"] == 0.5
    assert tpl["n_trigrams"] == 2 and tpl["distinct_trigrams"] == 1
    assert tpl["distinct_3"] == 0.5
    new = out["new"]
    assert new["distinct_1"] == 1.0 and new["distinct_2"] == 1.0
    assert new["n_trigrams"] == 2 and new["distinct_3"] == 1.0


def test_distinct_ngram_diversity_short_docs(spark):
    from kkbox_churn_prediction_spark.operators.textstats import (
        distinct_ngram_diversity,
    )

    # one-word docs: no bigrams/trigrams anywhere in the slice
    docs = spark.createDataFrame(
        [("s", "solo"), ("s", "solo")], "source string, text string"
    )
    r = distinct_ngram_diversity(docs).collect()[0]
    assert r["n_unigrams"] == 2 and r["distinct_unigrams"] == 1
    assert r["n_bigrams"] == 0 and r["distinct_2"] == 0.0
    assert r["n_trigrams"] == 0 and r["distinct_3"] == 0.0


def test_readability_stats_golden(spark):
    from kkbox_churn_prediction_spark.operators.textstats import readability_stats

    docs = spark.createDataFrame(
        [
            # 4 words, 2 sentence-runs, syllables: the=1 cat=1 sat=1 down=1
            ("a", "The cat sat. Down!"),
            # no terminal punctuation -> min 1 sentence; rhythm -> 1 syllable floor
            ("a", "rhythm grd"),
            ("b", ""),
        ],
        "source string, text string",
    )
    out = {r["source"]: r for r in readability_stats(docs).collect()}
    a = out["a"]
    assert a["n_docs"] == 2
    assert a["n_words"] == 6  # 4 + 2
    assert a["n_sentences"] == 3  # 2 runs + floor(1)
    # syllables: the(1) cat(1) sat(1) down(1) + rhythm(y->1) grd(floor 1) = 6
    assert a["n_syllables"] == 6
    assert abs(a["words_per_sentence"] - 2.0) < 1e-12
    assert abs(a["syllables_per_word"] - 1.0) < 1e-12
    expected = 206.835 - 1.015 * 2.0 - 84.6 * 1.0
    assert abs(a["flesch_reading_ease"] - expected) < 1e-9
    # empty slice: all-zero counters, FRE at the formula's zero point
    b = out["b"]
    assert b["n_words"] == 0 and b["n_sentences"] == 0 and b["n_syllables"] == 0
    assert b["words_per_sentence"] == 0.0 and b["syllables_per_word"] == 0.0


def test_tokenizer_fertility_golden(spark):
    from kkbox_churn_prediction_spark.operators.textstats import tokenizer_fertility

    docs = spark.createDataFrame(
        [
            # 'the and is' -> 3 english stopword hits out of 3 tokens
            (0, "the and is"),
            # no stopwords of any profile -> 'und'
            (1, "zzz qqq"),
        ],
        "doc_id long, text string",
    )
    out = {r["lang"]: r for r in tokenizer_fertility(docs).collect()}
    en = out["en"]
    assert en["n_docs"] == 1
    assert en["n_bytes"] == 10 and en["n_chars"] == 10  # ASCII: bytes == chars
    assert en["n_words"] == 3
    # bpe-ish pieces: the(1) and(1) is(1) -> 3 (each ≤4 alpha chars)
    assert en["n_tokens"] == 3
    assert en["bytes_per_token"] == round(10 / 3, 6)
    assert en["tokens_per_word"] == 1.0
    und = out["und"]
    # zzz(1) qqq(1) -> 2 pieces over 2 words
    assert und["n_words"] == 2 and und["n_tokens"] == 2
    assert und["chars_per_token"] == 3.5  # 7 chars / 2 pieces


def test_tokenizer_fertility_long_words_split(spark):
    from kkbox_churn_prediction_spark.operators.textstats import tokenizer_fertility

    # a 10-letter word splits into ceil(10/4)=3 bpe-ish pieces
    docs = spark.createDataFrame(
        [(0, "abcdefghij")], "doc_id long, text string"
    )
    r = tokenizer_fertility(docs).collect()[0]
    assert r["lang"] == "und"
    assert r["n_words"] == 1 and r["n_tokens"] == 3
    assert r["tokens_per_word"] == 3.0
