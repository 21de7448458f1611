"""Goldens for the round-2 late additions: BPE merge-pair counts,
CUSUM changepoints, and the triangle census.

Hand-computed references throughout; the triangle tests also pin the
two properties the degree-ordered algorithm must preserve (each
triangle counted exactly once; star graphs produce zero triangles
but many wedges).
"""

from __future__ import annotations

import datetime as dt

import pytest

from kkbox_churn_prediction_spark.operators.components import triangle_stats
from kkbox_churn_prediction_spark.operators.textstats import bpe_pair_counts
from kkbox_churn_prediction_spark.operators.windows import cusum_changepoints


def test_bpe_pair_counts_hand_golden(spark):
    # vocab: low(×2 docs → wf=2 each occurrence counted), lower, lowest
    docs = spark.createDataFrame(
        [(1, "low lower lowest"), (2, "low"), (3, None)], ["doc_id", "text"]
    )
    rows = {
        (r.left_sym, r.right_sym): r.pair_count
        for r in bpe_pair_counts(docs, top_n=100).collect()
    }
    # 'lo' and 'ow': low×2 + lower + lowest = 4
    assert rows[("l", "o")] == 4
    assert rows[("o", "w")] == 4
    # 'we': lower + lowest = 2; 'er' only lower; 'st' only lowest
    assert rows[("w", "e")] == 2
    assert rows[("e", "r")] == 1
    assert rows[("s", "t")] == 1
    assert ("t", "x") not in rows


def test_bpe_pair_counts_weighted_by_word_frequency(spark):
    # the same word repeated must multiply pair counts, and the
    # single-char word contributes nothing (sequence guard)
    docs = spark.createDataFrame([(1, "ab ab ab a")], ["doc_id", "text"])
    rows = bpe_pair_counts(docs, top_n=10).collect()
    assert len(rows) == 1
    assert (rows[0].left_sym, rows[0].right_sym, rows[0].pair_count) == ("a", "b", 3)


def test_bpe_top_n_is_deterministic(spark):
    docs = spark.createDataFrame(
        [(1, "ab cd ef gh")], ["doc_id", "text"]
    )
    # all four pairs tie at count 1 → tie-break on symbols keeps ab, cd
    out = [
        (r.left_sym, r.right_sym) for r in bpe_pair_counts(docs, top_n=2).collect()
    ]
    assert out == [("a", "b"), ("c", "d")]


def _daily_turns(spark, counts):
    rows = [
        (dt.datetime(2024, 1, 1 + d, 12, 0, 0),)
        for d, n in enumerate(counts)
        for _ in range(n)
    ]
    return spark.createDataFrame(rows, ["ts"])


def test_cusum_detects_level_shift_daily_z_misses(spark):
    # +1σ-ish persistent shift: each day individually unremarkable,
    # cumulative sum drifts monotonically past the threshold
    turns = _daily_turns(spark, [10] * 8 + [14] * 8)
    out = {r.d.day: r for r in cusum_changepoints(turns, threshold=2.0).collect()}
    # the regime boundary carries the extreme: |S_8| ≈ 7.7σ
    assert out[8].is_shift
    # mean-centering makes the full-series CUSUM return to exactly 0
    assert out[16].cusum == pytest.approx(0.0, abs=1e-6)
    # first day deviates < 1σ → can never be flagged at threshold 2
    assert not out[1].is_shift


def test_cusum_constant_series_all_zero(spark):
    turns = _daily_turns(spark, [5] * 6)
    rows = cusum_changepoints(turns, threshold=1.0).collect()
    assert all(r.cusum == 0.0 and not r.is_shift for r in rows)


def test_cusum_matches_numpy(spark):
    import numpy as np

    counts = [3, 9, 4, 12, 5, 5, 20, 2]
    turns = _daily_turns(spark, counts)
    got = [
        r.cusum
        for r in cusum_changepoints(turns, threshold=99.0).orderBy("d").collect()
    ]
    x = np.array(counts, dtype=float)
    dev = (x - x.mean()) / x.std(ddof=1)
    want = np.cumsum(dev)
    assert got == pytest.approx(list(np.round(want, 6)), abs=1e-6)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["doc_a", "doc_b"])


def test_triangle_census_hand_golden(spark):
    # triangle a-b-c plus pendant c-d: 1 triangle, 5 wedges, C=0.6
    row = triangle_stats(
        _edges(spark, [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")])
    ).first()
    assert (row.n_nodes, row.n_edges, row.n_triangles, row.n_wedges) == (4, 4, 1, 5)
    assert row.global_clustering == pytest.approx(0.6)


def test_triangle_star_graph_zero_triangles(spark):
    # K1,4 star: the hub's degree-ordered out-edges never form wedges
    # at the leaves, and there is no closing edge anywhere
    star = [("hub", f"leaf{i}") for i in range(4)]
    row = triangle_stats(_edges(spark, star)).first()
    assert row.n_triangles == 0
    assert row.n_wedges == 6  # C(4,2) at the hub
    assert row.global_clustering == 0.0


def test_triangle_clique_counts_each_once(spark):
    # K5: C(5,3)=10 triangles, 30 wedges, transitivity exactly 1
    nodes = [f"n{i}" for i in range(5)]
    k5 = [(a, b) for i, a in enumerate(nodes) for b in nodes[i + 1 :]]
    row = triangle_stats(_edges(spark, k5)).first()
    assert (row.n_triangles, row.n_wedges) == (10, 30)
    assert row.global_clustering == pytest.approx(1.0)


def test_triangle_dedups_and_ignores_direction_and_loops(spark):
    # duplicated / reversed / self-loop edges must not inflate the census
    row = triangle_stats(
        _edges(
            spark,
            [
                ("a", "b"),
                ("b", "a"),
                ("a", "b"),
                ("b", "c"),
                ("c", "a"),
                ("a", "a"),
            ],
        )
    ).first()
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (3, 3, 1)


# --- duplicate_spans (substring-level dedup) -------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_duplicate_spans_hand_golden(spark):
    from kkbox_churn_prediction_spark.operators.dedup import duplicate_spans

    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta unique one two three"),
            (2, "prefix words alpha beta gamma delta epsilon zeta suffix tail here"),
            (3, "totally different content with no overlap at all whatsoever"),
            (4, None),
        ],
    )
    r = {x.doc_id: x for x in duplicate_spans(docs, n=3).collect()}
    # only the two docs sharing the 6-token run appear
    assert set(r) == {1, 2}
    assert r[1].dup_tokens == 6 and r[2].dup_tokens == 6
    assert r[1].n_tokens == 10 and r[1].dup_fraction == 0.6
    assert r[1].n_dup_spans == 1


def test_duplicate_spans_merges_touching_intervals(spark):
    from kkbox_churn_prediction_spark.operators.dedup import duplicate_spans

    # two shared trigram runs separated by ONE private token: the
    # interval [pos, pos+2] of the second run touches the first run's
    # coverage, so they merge into one span in doc 1
    shared_a = "q w e"
    shared_b = "r t y"
    docs = _docs(
        spark,
        [
            (1, f"{shared_a} x {shared_b}"),  # qwe x rty: runs at 0 and 4
            (2, f"zz {shared_a} zz2 zz3"),
            (3, f"aa bb {shared_b} cc"),
        ],
    )
    r = {x.doc_id: x for x in duplicate_spans(docs, n=3).collect()}
    # doc1 grams: pos0 (q w e) dup, pos4 (r t y) dup; gap 4 ≤ n=3? no:
    # 4 > 0+3 → SEPARATE spans, covering 3+3=6 of 7 tokens
    assert r[1].n_dup_spans == 2 and r[1].dup_tokens == 6
    # adjacent case: doc where the runs abut with no private token
    docs2 = _docs(
        spark,
        [
            (1, f"{shared_a} {shared_b}"),  # contiguous: pos0 and pos3
            (2, f"zz {shared_a} zz2 zz3"),
            (3, f"aa bb {shared_b} cc"),
        ],
    )
    r2 = {x.doc_id: x for x in duplicate_spans(docs2, n=3).collect()}
    # pos3 ≤ pos0 + 3 → ONE merged span covering all 6 tokens
    assert r2[1].n_dup_spans == 1 and r2[1].dup_tokens == 6
    assert r2[1].dup_fraction == 1.0


def test_duplicate_spans_max_gram_docs_cap(spark):
    from kkbox_churn_prediction_spark.operators.dedup import duplicate_spans

    # a footer shared by ALL 5 docs is dropped when the cap is below 5
    docs = _docs(spark, [(i, f"body{i} text{i} common footer trigram") for i in range(5)])
    assert duplicate_spans(docs, n=3, max_gram_docs=4).count() == 0
    assert duplicate_spans(docs, n=3, max_gram_docs=None).count() == 5


# --- select_canonical (keep-best cluster collapse) --------------------------


def test_select_canonical_keep_best(spark):
    from kkbox_churn_prediction_spark.operators.components import select_canonical

    assignments = spark.createDataFrame(
        [(1, 1, 3), (2, 1, 3), (3, 1, 3), (7, 7, 2), (8, 7, 2)],
        "node long, component long, component_size int",
    )
    scores = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 50), (7, 5), (8, 5)],
        "doc_id long, score long",
    )
    rows = {r.component: r for r in select_canonical(assignments, scores).collect()}
    # cluster 1: doc 2 has the top score
    assert rows[1].canonical_id == 2
    assert (rows[1].n_members, rows[1].n_removed) == (3, 2)
    # cluster 7: tie at 5 → LARGER id wins
    assert rows[7].canonical_id == 8
    assert rows[7].n_removed == 1


def test_effective_sample_size_golden(spark):
    from kkbox_churn_prediction_spark.operators.components import (
        effective_sample_size,
    )

    # 4 singletons + 1 pair + 1 cluster of 4 -> 10 docs, 6 clusters
    rows = (
        [(i, i, 1) for i in range(4)]
        + [(10, 100, 2), (11, 100, 2)]
        + [(20 + i, 200, 4) for i in range(4)]
    )
    df = spark.createDataFrame(rows, "doc_id long, component long, cluster_size long")
    r = effective_sample_size(df).collect()[0]
    assert r["n_docs"] == 10 and r["n_clusters"] == 6
    # Σ m_k/k = 4/1 + 1/2 + 1/4 = 4.75 ; ESS = 36/4.75
    ess = 36 / 4.75
    assert r["ess"] == round(ess, 6)
    assert r["ess_ratio"] == round(ess / 10, 6)
    assert r["redundant_mass"] == round(10 - ess, 6)
    # no duplication at all -> ESS == n_docs exactly
    uniq = spark.createDataFrame([(i, i, 1) for i in range(5)],
                                 "doc_id long, component long, cluster_size long")
    u = effective_sample_size(uniq).collect()[0]
    assert u["ess"] == 5.0 and u["ess_ratio"] == 1.0 and u["redundant_mass"] == 0.0
