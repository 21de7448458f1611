"""Forced-scale stress evidence for the auto-mode DISTRIBUTED paths.

The driver-replay fast paths (components / pagerank / k-core / rank
engine / quality-classifier fit) auto-select a driver replay under
the 2M-row session budget — which means the sf0.1 gates exercise the
replay, not the distributed iteration. Small-scale pytest equality
proves the two paths agree; THIS script proves the distributed paths
actually run and hold throughput at volumes ABOVE the budget, on
deterministically generated data (no RNG — the genbench discipline).

Usage: python tools/stress_bench.py   # prints one JSON line per case
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 2)


def main() -> None:
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.session import get_spark

    spark = get_spark(app_name="stress", master="local[32]")

    # ---- quality classifier: 250k docs -> 4.3M feature rows (>2M
    # budget, auto MUST take the distributed Newton loop)
    from kkbox_churn_prediction_spark.operators.quality_model import (
        hashed_doc_features,
        quality_classifier_fit,
    )

    n_docs = 250_000
    vocab = 1000
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(10) + F.pmod(F.col("id"), F.lit(40))),
                lambda i: F.concat(
                    F.lit("w"),
                    F.pmod(F.col("id") * 7 + i * 13, F.lit(vocab)).cast("string"),
                ),
            ),
        ).alias("text"),
    )
    label = F.length("text") >= F.lit(120)
    feats = hashed_doc_features(docs, label)
    n_feat_rows = feats.count()
    assert n_feat_rows > 2_000_000, n_feat_rows
    fit, sec = timed(
        lambda: quality_classifier_fit(feats, mode="auto").collect()
    )
    assert len(fit) == 17 and any(r["weight"] != 0.0 for r in fit)
    print(json.dumps({
        "case": "quality_fit_distributed", "docs": n_docs,
        "feature_rows": n_feat_rows, "sec": sec,
        "docs_per_sec": round(n_docs / sec, 1),
        "path": "distributed (rows > 2M replay budget)",
    }))

    # ---- connected components: 3M edges (>2M budget -> hash-min
    # distributed fixpoint with localCheckpoint rounds)
    from kkbox_churn_prediction_spark.operators.components import (
        connected_components,
        pagerank,
    )

    # the dedup load-shape: many small dense clusters (LSH dup blobs
    # share bands, so their pair graphs are low-diameter) — 300k
    # 10-node clusters, 3M intra-cluster edges
    n_edges, n_nodes = 3_000_000, 3_000_000
    edges = spark.range(n_edges).select(
        (F.floor(F.col("id") / 10) * 10 + F.pmod(F.col("id"), F.lit(9)))
        .alias("doc_a"),
        (
            F.floor(F.col("id") / 10) * 10
            + F.pmod(F.col("id") * 7 + 3, F.lit(10))
        ).alias("doc_b"),
    ).persist()
    edges.count()
    cc, sec = timed(
        lambda: connected_components(edges)
        .agg(F.count(F.lit(1)), F.countDistinct("component"))
        .collect()
    )
    print(json.dumps({
        "case": "connected_components_distributed", "edges": n_edges,
        "nodes": int(cc[0][0]), "components": int(cc[0][1]), "sec": sec,
        "edges_per_sec": round(n_edges / sec, 1),
        "path": "distributed (edges > 2M replay budget)",
    }))

    # ---- star components: 3M-edge ADVERSARIAL permutation graph
    # (long cycles, numbering uncorrelated with structure) — the
    # round-4 stress finding's fix path; hash-min refuses this graph
    # loudly and doubling degrades (41-80 rounds at n=1000)
    n_nodes2 = 600_000
    adv = spark.range(n_edges).select(
        F.pmod(F.col("id"), F.lit(n_nodes2)).alias("doc_a"),
        F.pmod(F.col("id") * 31 + 7, F.lit(n_nodes2)).alias("doc_b"),
    ).persist()
    adv.count()
    st, sec = timed(
        lambda: connected_components(
            adv, algorithm="star", mode="distributed", max_iter=15
        )
        .agg(F.count(F.lit(1)), F.countDistinct("component"))
        .collect()
    )
    print(json.dumps({
        "case": "star_components_adversarial", "edges": n_edges,
        "nodes": int(st[0][0]), "components": int(st[0][1]), "sec": sec,
        "edges_per_sec": round(n_edges / sec, 1),
        "path": "large-star/small-star distributed (permutation graph)",
    }))

    # ---- pagerank: same 3M-edge graph, 10 distributed power rounds
    pr, sec = timed(
        lambda: pagerank(edges, src="doc_a", dst="doc_b", iters=10)
        .agg(F.count(F.lit(1)), F.sum("rank"))
        .collect()
    )
    print(json.dumps({
        "case": "pagerank_distributed", "edges": n_edges,
        "nodes": int(pr[0][0]), "rank_mass": round(float(pr[0][1]), 3),
        "sec": sec, "edges_per_sec_per_iter": round(n_edges * 10 / sec, 1),
        "path": "distributed (edges > 2M replay budget)",
    }))


if __name__ == "__main__":
    main()
