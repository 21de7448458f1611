"""Goldens for the corpus-diagnostics additions: cross-source n-gram
overlap and the Zipf's-law fit."""

from __future__ import annotations

import math

import numpy as np
import pytest

from kkbox_churn_prediction_spark.operators.textstats import (
    source_overlap,
    zipf_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "source", "text"])


def test_source_overlap_hand_golden(spark):
    docs = _docs(
        spark,
        [
            (1, "crawlA", "one two three four"),
            (2, "crawlB", "one two three five"),  # shares trigram "one two three"
            (3, "crawlC", "совсем другой текст тут"),
        ],
    )
    rows = {(r.source_a, r.source_b): r for r in source_overlap(docs, n=3).collect()}
    # only A-B overlap; A has trigrams {one two three, two three four} (2),
    # B has 2, shared 1 → jaccard 1/3
    assert set(rows) == {("crawlA", "crawlB")}
    r = rows[("crawlA", "crawlB")]
    assert (r.n_shared, r.n_a, r.n_b) == (1, 2, 2)
    assert r.jaccard == pytest.approx(1 / 3, abs=1e-6)


def test_source_overlap_identical_sources_jaccard_one(spark):
    text = "alpha beta gamma delta epsilon"
    docs = _docs(spark, [(1, "x", text), (2, "y", text)])
    r = source_overlap(docs, n=3).first()
    assert r.jaccard == 1.0 and r.n_shared == r.n_a == r.n_b


def test_source_overlap_counts_distinct_grams_once(spark):
    # repeated trigram within one source must not inflate counts
    docs = _docs(
        spark,
        [
            (1, "x", "a b c a b c"),
            (2, "x", "a b c"),
            (3, "y", "a b c unrelated tail"),
        ],
    )
    r = source_overlap(docs, n=3).first()
    # x grams: {a b c, b c a, c a b} = 3; y: {a b c, b c unrelated,
    # c unrelated tail} = 3; shared = {a b c}
    assert (r.n_a, r.n_b, r.n_shared) == (3, 3, 1)


def test_zipf_matches_manual_ols(spark):
    docs = spark.createDataFrame(
        [(1, "a a a a b b c d"), (2, "a b b c")], ["doc_id", "text"]
    )
    row = zipf_stats(docs).first()
    assert row.vocab_size == 4 and row.total_tokens == 12
    # counts: a=5 b=4 c=2 d=1 → desc ranks 1,2,3,4 (no ties)
    x = np.log([1.0, 2.0, 3.0, 4.0])
    y = np.log([5.0, 4.0, 2.0, 1.0])
    slope = np.cov(x, y, ddof=1)[0, 1] / np.var(x, ddof=1)
    r2 = np.corrcoef(x, y)[0, 1] ** 2
    assert row.zipf_slope == pytest.approx(slope, abs=1e-6)
    assert row.zipf_r2 == pytest.approx(r2, abs=1e-6)


def test_zipf_average_rank_for_ties(spark):
    # b and c tie at 2 → both get rank (2+3)/2 = 2.5
    docs = spark.createDataFrame([(1, "a a a b b c c d")], ["doc_id", "text"])
    row = zipf_stats(docs).first()
    x = np.log([1.0, 2.5, 2.5, 4.0])
    y = np.log([3.0, 2.0, 2.0, 1.0])
    slope = np.cov(x, y, ddof=1)[0, 1] / np.var(x, ddof=1)
    assert row.zipf_slope == pytest.approx(slope, abs=1e-6)


def test_zipf_pure_zipf_corpus_slope_near_minus_one(spark):
    # frequencies ∝ 1/rank exactly → slope −1, r² 1
    words = []
    for rank in range(1, 41):
        words += [f"w{rank:02d}"] * max(1, round(1200 / rank))
    docs = spark.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])
    row = zipf_stats(docs).first()
    assert row.zipf_slope == pytest.approx(-1.0, abs=0.02)
    assert row.zipf_r2 > 0.999


# --- dialogue_pairs (SFT pair mining) --------------------------------------


def test_dialogue_pairs_strict_adjacency(spark):
    import datetime as dt

    from kkbox_churn_prediction_spark.operators.assemble import dialogue_pairs

    t0 = dt.datetime(2024, 1, 1)

    def turn(i, role, text):
        return ("c1", i, role, text, None, t0 + dt.timedelta(minutes=i))

    turns = spark.createDataFrame(
        [
            turn(0, "system", "sys prompt"),
            turn(1, "user", "question one"),
            turn(2, "assistant", "answer one"),      # pair
            turn(3, "user", "question two"),
            turn(4, "tool", "tool output"),
            turn(5, "assistant", "answer two"),      # NOT a pair (tool between)
            turn(6, "user", ""),
            turn(7, "assistant", "answer three"),    # NOT a pair (empty prompt)
            turn(8, "assistant", "follow-up"),       # NOT a pair (assistant prev)
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    rows = dialogue_pairs(turns).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.turn_idx, r.prompt, r.response) == (2, "question one", "answer one")
    assert (r.prompt_len, r.response_len) == (12, 10)


def test_zipf_degenerate_vocab_yields_null_not_error(spark):
    # every word same frequency → zero rank variance → NULL slope/r2
    docs = spark.createDataFrame([(1, "aa bb cc")], ["doc_id", "text"])
    row = zipf_stats(docs).first()
    assert row.vocab_size == 3 and row.total_tokens == 3
    assert row.zipf_slope is None and row.zipf_r2 is None


def test_triangle_empty_edge_set_all_zero(spark):
    from kkbox_churn_prediction_spark.operators.components import triangle_stats

    edges = spark.createDataFrame([], "doc_a string, doc_b string")
    row = triangle_stats(edges).first()
    assert (row.n_nodes, row.n_edges, row.n_triangles, row.n_wedges) == (0, 0, 0, 0)
    assert row.global_clustering == 0.0


def test_covariance_degenerate_inputs(spark):
    from kkbox_churn_prediction_spark.operators.similarity import (
        embedding_covariance,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert embedding_covariance(empty).count() == 0
    one = spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    rows = embedding_covariance(one).collect()
    assert len(rows) == 3 and all(r.cov is None for r in rows)


def test_bigram_logprob_matches_manual(spark):
    from kkbox_churn_prediction_spark.operators.textstats import (
        bigram_logprob_score,
    )

    # corpus: "a b a b" (doc1), "a c" (doc2)
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in bigram_logprob_score(docs).collect()}
    # bigram counts: (a b)=2, (b a)=1, (a c)=1; ctx: a→3, b→1
    # unigrams: a=3, b=2, c=1; T=6
    lam = 0.7
    p_ab = lam * 2 / 3 + (1 - lam) * 2 / 6
    p_ba = lam * 1 / 1 + (1 - lam) * 3 / 6
    p_ac = lam * 1 / 3 + (1 - lam) * 1 / 6
    d1 = (2 * math.log(p_ab) + math.log(p_ba)) / 3
    assert rows[1].n_bigrams == 3
    assert rows[1].avg_bigram_logprob == pytest.approx(round(d1, 6), abs=1e-6)
    assert rows[2].n_bigrams == 1
    assert rows[2].avg_bigram_logprob == pytest.approx(
        round(math.log(p_ac), 6), abs=1e-6
    )


def test_bigram_logprob_ranks_scrambled_text_lower(spark):
    from kkbox_churn_prediction_spark.operators.textstats import (
        bigram_logprob_score,
    )

    natural = "the cat sat on the mat and the dog sat on the rug " * 5
    scrambled = "mat the on dog sat rug the cat and on the sat the " * 5
    docs = spark.createDataFrame(
        [(1, natural), (2, scrambled)], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in bigram_logprob_score(docs).collect()}
    # both docs share the unigram distribution; only transitions differ
    assert rows[1].avg_bigram_logprob > rows[2].avg_bigram_logprob


def test_blocklist_filter_hand_golden(spark):
    from kkbox_churn_prediction_spark.operators.textstats import blocklist_filter

    docs = spark.createDataFrame(
        [
            (1, "BAD word bad again fine"),   # 2/5 blocked (case-folded)
            (2, "all clean words here"),
            (3, "bad"),                       # 1/1 blocked
        ],
        ["doc_id", "text"],
    )
    rows = {
        r.doc_id: r
        for r in blocklist_filter(docs, ("bad",), max_fraction=0.25).collect()
    }
    assert (rows[1].n_blocked, rows[1].n_tokens) == (2, 5)
    assert rows[1].blocked_fraction == 0.4 and not rows[1].keep
    assert rows[2].n_blocked == 0 and rows[2].keep
    assert rows[3].blocked_fraction == 1.0 and not rows[3].keep


def test_embedding_drift_reference_is_zero(spark):
    import numpy as np

    from kkbox_churn_prediction_spark.operators.similarity import embedding_drift

    rng = np.random.default_rng(3)
    rows = []
    vid = 0
    for label, shift in ((0, 0.0), (1, 0.0), (2, 5.0)):
        for _ in range(50):
            v = rng.normal(size=4) + shift
            rows.append((vid, [float(x) for x in v], label))
            vid += 1
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {r.label: r for r in embedding_drift(df, "label").collect()}
    # the reference group's distance to itself is exactly 0 / cos 1
    assert got[0].l2_to_ref == 0.0 and got[0].cosine_to_ref == 1.0
    # same-distribution group stays close; shifted group drifts far
    assert got[1].l2_to_ref < 1.0 < got[2].l2_to_ref
    assert got[2].l2_to_ref > 5.0  # shift of 5 in all 4 dims ⇒ L2 ≈ 10
    assert all(r.n_members == 50 for r in got.values())


class TestContrastivePairs:
    def test_pairs_complete_minus_false_negatives(self, spark):
        from pyspark.sql import functions as F

        from kkbox_churn_prediction_spark.operators.assemble import contrastive_pairs

        # 12 docs, 3 share dup key "dup"; one batch so pairs are global
        rows = [(i, "dup" if i < 3 else f"u{i}") for i in range(12)]
        docs = spark.createDataFrame(rows, "doc_id long, k string")
        out = contrastive_pairs(
            docs, 1, dup_key=F.col("k")
        ).collect()
        # C(12,2) minus the C(3,2) same-key pairs
        assert len(out) == 66 - 3
        keys = dict(rows)
        for r in out:
            assert r["a_id"] < r["b_id"]
            assert keys[r["a_id"]] != keys[r["b_id"]]

    def test_batches_partition_invariant(self, spark):
        from kkbox_churn_prediction_spark.operators.assemble import contrastive_pairs

        docs = spark.range(200).select(F_col_id())
        a = {(r["batch"], r["a_id"], r["b_id"]) for r in contrastive_pairs(docs.repartition(3), 8).collect()}
        b = {(r["batch"], r["a_id"], r["b_id"]) for r in contrastive_pairs(docs.repartition(17), 8).collect()}
        assert a == b
        # pair fan-out bounded: every pair stays within one hash batch
        assert all(x[0] in range(8) for x in a)


def F_col_id():
    from pyspark.sql import functions as F

    return F.col("id").alias("doc_id")


class TestSftPairQuality:
    def test_flags_and_keep_verdict(self, spark):
        from kkbox_churn_prediction_spark.operators.assemble import sft_pair_quality

        pairs = spark.createDataFrame(
            [
                ("c", 1, "tell me", "I'm sorry, I cannot help with that request", 7, 42),
                ("c", 3, "hi", "ok", 2, 2),
                ("c", 5, "explain widgets", "widgets are small components", 15, 28),
                ("c", 7, "hello", "AS AN AI assistant I will help you anyway", 5, 41),
            ],
            "conv_id string, turn_idx int, prompt string, response string,"
            " prompt_len long, response_len long",
        )
        out = {r["turn_idx"]: r for r in sft_pair_quality(pairs).collect()}
        assert out[1]["is_refusal"] == 1 and out[1]["keep"] == 0
        assert out[3]["is_short"] == 1 and out[3]["keep"] == 0
        assert out[5]["is_refusal"] == 0 and out[5]["is_short"] == 0 and out[5]["keep"] == 1
        # case-insensitive phrase match
        assert out[7]["is_refusal"] == 1
        # ratio surfaces rounded
        assert abs(out[5]["len_ratio"] - round(28 / 15, 6)) < 1e-9


class TestPrefixSharing:
    def test_sharing_counts_per_depth(self, spark):
        from datetime import datetime, timedelta

        from kkbox_churn_prediction_spark.operators.profile import prefix_sharing

        t0 = datetime(2024, 1, 1)
        rows = []
        # three convs share the same first turn; two of them also share
        # the second; third diverges at depth 2; conv d has 1 turn only
        scripts = {
            "a": ["sys", "hello", "x"],
            "b": ["sys", "hello", "y"],
            "c": ["sys", "other", "z"],
            "d": ["sys"],
        }
        for conv, texts in scripts.items():
            for i, tx in enumerate(texts):
                rows.append((conv, i, "user", tx, None, t0 + timedelta(minutes=i)))
        turns = spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string,"
            " tool string, ts timestamp",
        )
        out = {r["depth"]: r for r in prefix_sharing(turns).collect()}
        # depth 1: all four convs share one prefix
        assert out[1]["n_convs"] == 4
        assert out[1]["n_distinct_prefixes"] == 1
        assert out[1]["max_group"] == 4
        assert out[1]["sharing_factor"] == 4.0
        # depth 2: d drops out (1 turn); a+b share, c alone
        assert out[2]["n_convs"] == 3
        assert out[2]["n_distinct_prefixes"] == 2
        assert out[2]["max_group"] == 2
        # depth 3: all distinct
        assert out[3]["n_distinct_prefixes"] == 3
        assert out[3]["sharing_factor"] == 1.0

    def test_concat_ambiguity_guard(self, spark):
        from datetime import datetime, timedelta

        from kkbox_churn_prediction_spark.operators.profile import prefix_sharing

        t0 = datetime(2024, 1, 1)
        # ("ab", "c") vs ("a", "bc") must NOT collide at depth 2
        rows = [
            ("p", 0, "user", "ab", None, t0),
            ("p", 1, "user", "c", None, t0 + timedelta(minutes=1)),
            ("q", 0, "user", "a", None, t0),
            ("q", 1, "user", "bc", None, t0 + timedelta(minutes=1)),
        ]
        turns = spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string,"
            " tool string, ts timestamp",
        )
        out = {r["depth"]: r for r in prefix_sharing(turns, depths=(2,)).collect()}
        assert out[2]["n_distinct_prefixes"] == 2


class TestConversationOutcomes:
    def test_outcome_flags(self, spark):
        from datetime import datetime, timedelta

        from kkbox_churn_prediction_spark.operators.labels import (
            conversation_outcomes,
        )

        t0 = datetime(2024, 1, 1)
        rows = [
            # abandoned: ends with an unanswered user turn
            ("a", 0, "user", "hi", None, t0),
            ("a", 1, "assistant", "hello", None, t0 + timedelta(minutes=1)),
            ("a", 2, "user", "one more thing", None, t0 + timedelta(minutes=2)),
            # refusal-final assistant ending, with one tool call
            ("b", 0, "user", "do it", None, t0),
            ("b", 1, "assistant", "I cannot help with that", "search", t0 + timedelta(minutes=1)),
            # clean assistant ending
            ("c", 0, "user", "hey", None, t0),
            ("c", 1, "assistant", "done!", None, t0 + timedelta(minutes=1)),
        ]
        turns = spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string,"
            " tool string, ts timestamp",
        )
        out = {r["conv_id"]: r for r in conversation_outcomes(turns).collect()}
        assert out["a"]["abandoned"] == 1 and out["a"]["refusal_final"] == 0
        assert out["a"]["last_role"] == "user" and out["a"]["n_turns"] == 3
        assert out["b"]["refusal_final"] == 1 and out["b"]["abandoned"] == 0
        assert out["b"]["n_tool_calls"] == 1
        assert out["c"]["refusal_final"] == 0 and out["c"]["abandoned"] == 0


def test_tool_latency_stats_golden(spark):
    from datetime import datetime, timedelta

    from kkbox_churn_prediction_spark.operators.lags import tool_latency_stats

    t0 = datetime(2024, 1, 1)
    rows = [
        # conv a: search at +0 answered at +10s; search at +60 answered +90
        ("a", 0, "assistant", "q", "search", t0),
        ("a", 1, "assistant", "r", None, t0 + timedelta(seconds=10)),
        ("a", 2, "assistant", "q2", "search", t0 + timedelta(seconds=60)),
        ("a", 3, "assistant", "r2", None, t0 + timedelta(seconds=90)),
        # conv b: calc at +0 answered +5; trailing tool call (no next turn) dropped
        ("b", 0, "assistant", "q", "calc", t0),
        ("b", 1, "assistant", "r", None, t0 + timedelta(seconds=5)),
        ("b", 2, "assistant", "q2", "calc", t0 + timedelta(seconds=100)),
    ]
    turns = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )
    out = {r["tool"]: r for r in tool_latency_stats(turns).collect()}
    assert out["search"]["n_calls"] == 2 and out["search"]["n_convs"] == 1
    assert out["search"]["avg_gap_us"] == 20_000_000  # (10s + 30s) / 2
    assert out["search"]["max_gap_us"] == 30_000_000
    assert out["calc"]["n_calls"] == 1  # trailing call has no next turn
    assert out["calc"]["avg_gap_us"] == 5_000_000


def test_benford_profile_golden(spark):
    from kkbox_churn_prediction_spark.operators.profile import benford_profile

    # perfect multiplicative (log-uniform-ish) sample: 10^k scaled digits
    rows = [(float(d * 10**k),) for d in range(1, 10) for k in range(3)]
    # sub-1 values are excluded by contract
    rows += [(0.5,), (0.01,)]
    df = spark.createDataFrame(rows, "v double")
    out = {r["digit"]: r for r in benford_profile(df, "v").collect()}
    assert set(out) == set(range(1, 10))
    # uniform digit counts (3 each of 27): freq = 1/9 each
    for d in range(1, 10):
        assert out[d]["n"] == 3
        assert abs(out[d]["freq"] - round(3 / 27, 6)) < 1e-9
        assert out[d]["dev"] == round(out[d]["freq"] - out[d]["expected"], 6)
    # expected follows Benford exactly (literal table)
    assert out[1]["expected"] == 0.30103 and out[9]["expected"] == 0.045757


def test_daily_acf_alternating_series(spark):
    from datetime import datetime, timedelta

    from kkbox_churn_prediction_spark.operators.windows import daily_acf

    t0 = datetime(2024, 1, 1)
    rows = []
    # alternating 1/3 turns per day for 14 days: lag-1 ACF strongly
    # negative, lag-2 strongly positive
    for day in range(14):
        for k in range(1 if day % 2 == 0 else 3):
            rows.append(("c", k, "user", "x", None, t0 + timedelta(days=day, minutes=k)))
    turns = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )
    out = {r["lag"]: r for r in daily_acf(turns, max_lag=3).collect()}
    assert out[1]["acf"] < -0.8
    assert out[2]["acf"] > 0.8
    assert out[1]["n_pairs"] == 13 and out[2]["n_pairs"] == 12
    # constant series -> NULL acf
    const = [("c", 0, "user", "x", None, t0 + timedelta(days=d)) for d in range(5)]
    cdf = spark.createDataFrame(
        const,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )
    assert all(r["acf"] is None for r in daily_acf(cdf, max_lag=2).collect())


def test_tool_bigrams_chain_semantics(spark):
    from datetime import datetime, timedelta

    from kkbox_churn_prediction_spark.operators.lags import tool_bigrams

    t0 = datetime(2024, 1, 1)
    rows = [
        # conv a: search -> (plain turn) -> calc -> search
        ("a", 0, "assistant", "q", "search", t0),
        ("a", 1, "assistant", "chat", None, t0 + timedelta(minutes=1)),
        ("a", 2, "assistant", "q", "calc", t0 + timedelta(minutes=2)),
        ("a", 3, "assistant", "q", "search", t0 + timedelta(minutes=3)),
        # conv b: search -> calc
        ("b", 0, "assistant", "q", "search", t0),
        ("b", 1, "assistant", "q", "calc", t0 + timedelta(minutes=1)),
    ]
    turns = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )
    out = {(r["from_tool"], r["to_tool"]): r for r in tool_bigrams(turns).collect()}
    # intervening plain turn does NOT break the chain
    assert out[("search", "calc")]["n"] == 2
    assert out[("calc", "search")]["n"] == 1
    # conditional probability normalizes over the from-tool
    assert out[("search", "calc")]["p_cond"] == 1.0
    assert ("search", "search") not in out  # chains never cross conversations


def test_weekly_latency_sla_golden(spark):
    from datetime import datetime, timedelta

    from kkbox_churn_prediction_spark.operators.lags import weekly_latency_sla

    t0 = datetime(2024, 1, 1, 9, 0)  # a Monday
    rows = [
        # user at +0 answered at +60s (within 300s SLA)
        ("a", 0, "user", "q", None, t0),
        ("a", 1, "assistant", "r", None, t0 + timedelta(seconds=60)),
        # user at +1h answered 600s later (SLA breach)
        ("a", 2, "user", "q2", None, t0 + timedelta(hours=1)),
        ("a", 3, "assistant", "r2", None, t0 + timedelta(hours=1, seconds=600)),
        # unanswered trailing user turn: excluded entirely
        ("a", 4, "user", "q3", None, t0 + timedelta(hours=2)),
    ]
    turns = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )
    out = weekly_latency_sla(turns, sla_seconds=300).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_exchanges"] == 2
    assert r["sla_fraction"] == 0.5
    # exact interpolated median of {60s, 600s} = 330s, floor exact
    assert r["p50_latency_us"] == 330_000_000


def test_source_tf_cosine_golden(spark):
    from kkbox_churn_prediction_spark.operators.textstats import source_tf_cosine

    docs = spark.createDataFrame(
        [
            # A and B: same token distribution (scaled) -> cosine 1
            ("A", "x x y"),
            ("B", "x x x x y y"),
            # C: disjoint vocabulary -> cosine 0 vs both
            ("C", "z z z"),
            # D: partial overlap with A
            ("D", "x y y"),
        ],
        "source string, text string",
    )
    out = {(r["source_a"], r["source_b"]): r for r in source_tf_cosine(docs).collect()}
    ab = out[("A", "B")]
    assert ab["cosine"] == 1.0
    assert ab["dot"] == 2 * 4 + 1 * 2  # exact integer dot
    # disjoint pairs are ABSENT (no shared token -> no pair row), the
    # same sparse contract as source_overlap
    assert ("A", "C") not in out and ("B", "C") not in out
    ad = out[("A", "D")]
    import math

    # A = (x:2, y:1), D = (x:1, y:2): dot 4, |A|=|D|=sqrt(5)
    assert ad["dot"] == 4.0 and ad["n2_a"] == 5.0 and ad["n2_b"] == 5.0
    assert ad["cosine"] == round(4 / 5, 6)
    assert 0 < ad["cosine"] < ab["cosine"]


def test_refusal_rate_weekly_golden(spark):
    from datetime import datetime, timedelta

    import pandas as pd

    from kkbox_churn_prediction_spark.operators.assemble import refusal_rate_weekly

    t0 = datetime(2024, 1, 1, 10, 0, 0)  # a Monday
    rows = [
        # week 1: 1 refusal out of 2 assistant turns; user turns ignored
        ("a", 0, "assistant", "Sure, here you go", None, t0),
        ("a", 1, "assistant", "I can't help with that", None, t0 + timedelta(hours=1)),
        ("a", 2, "user", "i cannot even", None, t0 + timedelta(hours=2)),
        # week 2: 0 of 1
        ("b", 0, "assistant", "Done.", None, t0 + timedelta(days=7)),
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    out = sorted(
        refusal_rate_weekly(spark.createDataFrame(pdf)).collect(),
        key=lambda r: r["week"],
    )
    assert out[0]["n_turns"] == 2 and out[0]["n_refusals"] == 1
    assert out[0]["refusal_rate"] == 0.5
    assert out[1]["n_refusals"] == 0 and out[1]["refusal_rate"] == 0.0
