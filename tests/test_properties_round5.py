"""Property invariants for the late round-2 operators, on seeded
random corpora (deterministic — no flaky generation).

Each property is something the oracle compare can't check (it only
proves Spark == DuckDB on one dataset): structural truths that must
hold on ANY input.
"""

from __future__ import annotations

import random

import pytest

from kkbox_churn_prediction_spark.operators.components import triangle_stats
from kkbox_churn_prediction_spark.operators.dedup import duplicate_spans
from kkbox_churn_prediction_spark.operators.similarity import rrf_fuse
from kkbox_churn_prediction_spark.operators.textstats import bpe_pair_counts


def _random_docs(spark, seed, n_docs=30, vocab=12, max_len=40):
    rng = random.Random(seed)
    words = [f"w{i}" for i in range(vocab)]
    rows = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(1, max_len))))
        for i in range(n_docs)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_bpe_pair_counts_conserve_total(spark, seed):
    # Σ pair_count over ALL pairs = Σ_words (len(w)−1)·freq(w):
    # every adjacent character position contributes exactly once
    docs = _random_docs(spark, seed)
    pairs = bpe_pair_counts(docs, top_n=10_000).collect()
    got = sum(r.pair_count for r in pairs)
    toks = [
        w
        for (_, text) in docs.collect()
        for w in text.lower().split()
        if len(w) >= 2
    ]
    want = sum(len(w) - 1 for w in toks)
    assert got == want


@pytest.mark.parametrize("seed", [11, 12])
def test_duplicate_spans_coverage_bounds(spark, seed):
    # covered tokens never exceed the doc's token count, fractions in
    # (0, 1], spans ≥ 1 for every emitted doc
    docs = _random_docs(spark, seed, n_docs=20, vocab=4, max_len=25)
    for r in duplicate_spans(docs, n=3).collect():
        assert 0 < r.dup_tokens <= r.n_tokens
        assert 0 < r.dup_fraction <= 1.0
        assert r.n_dup_spans >= 1


def test_duplicate_spans_identical_docs_full_coverage(spark):
    text = "q w e r t y u i o p"
    docs = spark.createDataFrame(
        [(1, text), (2, text), (3, "totally unrelated words here zz")],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in duplicate_spans(docs, n=3).collect()}
    assert rows[1].dup_fraction == 1.0 and rows[2].dup_fraction == 1.0
    assert 3 not in rows


@pytest.mark.parametrize("seed", [21, 22])
def test_triangle_transitivity_bounded(spark, seed):
    # 3·triangles ≤ wedges on ANY graph (each triangle closes exactly
    # 3 wedges) ⇒ global clustering ∈ [0, 1]
    rng = random.Random(seed)
    nodes = [f"n{i}" for i in range(12)]
    edges = {
        tuple(sorted(rng.sample(nodes, 2))) for _ in range(25)
    }
    df = spark.createDataFrame(sorted(edges), ["doc_a", "doc_b"])
    row = triangle_stats(df).first()
    assert 3 * row.n_triangles <= row.n_wedges
    assert 0.0 <= row.global_clustering <= 1.0
    assert row.n_edges == len(edges)


def test_rrf_single_list_preserves_order(spark):
    # fusing ONE list is a monotone transform: fused_rank == rank
    a = spark.createDataFrame(
        [(d, r) for r, d in enumerate([9, 4, 7, 1], start=1)],
        "doc_id long, rank int",
    )
    rows = sorted(rrf_fuse([a], top_n=10).collect(), key=lambda r: r.fused_rank)
    assert [r.doc_id for r in rows] == [9, 4, 7, 1]
    assert [r.best_rank for r in rows] == [1, 2, 3, 4]
