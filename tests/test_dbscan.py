"""Round-3 continuation: LSH-DBSCAN density clustering."""

from __future__ import annotations

import math

import pytest

from kkbox_churn_prediction_spark.operators.components import lsh_dbscan


def _embs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _blob(center, k, eps=0.02):
    # k near-identical unit vectors around an axis
    out = []
    for i in range(k):
        v = list(center)
        v[(i + 1) % len(v)] += eps * (i + 1)
        n = math.sqrt(sum(x * x for x in v))
        out.append([x / n for x in v])
    return out


def test_dbscan_two_blobs_and_noise(spark):
    a = _blob([1.0, 0.0, 0.0, 0.0], 4)
    b = _blob([0.0, 1.0, 0.0, 0.0], 4)
    noise = [[0.5, 0.5, 0.5, 0.5]]
    rows = [(i, v) for i, v in enumerate(a + b + noise)]
    out = {
        r.vec_id: r
        for r in lsh_dbscan(
            _embs(spark, rows), threshold=0.9, min_pts=3, bucket_bits=None
        ).collect()
    }
    # each blob member sees the 3 others -> all core, one cluster per blob
    ca = {out[i].cluster for i in range(4)}
    cb = {out[i].cluster for i in range(4, 8)}
    assert len(ca) == 1 and len(cb) == 1 and ca != cb
    assert all(out[i].is_core == 1 for i in range(8))
    assert all(out[i].cluster_size == 4 for i in range(8))
    assert out[8].cluster == -1 and out[8].cluster_size == 0


def test_dbscan_border_chain(spark):
    # chain a-b-c: only b is core (2 neighbors); a and c are borders
    # attached to b's singleton-core cluster
    th = 0.95
    a = [1.0, 0.0]
    b = [math.cos(0.25), math.sin(0.25)]   # cos(a,b) ~ 0.969 >= th
    c = [math.cos(0.50), math.sin(0.50)]   # cos(b,c) ~ 0.969, cos(a,c) ~ 0.878 < th
    rows = [(1, a), (2, b), (3, c)]
    out = {
        r.vec_id: r
        for r in lsh_dbscan(
            _embs(spark, rows), threshold=th, min_pts=3, bucket_bits=None
        ).collect()
    }
    assert out[2].is_core == 1
    assert out[1].is_core == 0 and out[3].is_core == 0
    assert out[1].cluster == out[2].cluster == out[3].cluster == 2
    assert out[2].cluster_size == 3


def test_dbscan_min_pts_gate(spark):
    # a pair of mutual neighbors with min_pts=3: neither is core -> noise
    rows = [(1, [1.0, 0.0]), (2, [0.999, 0.01])]
    out = {
        r.vec_id: r
        for r in lsh_dbscan(
            _embs(spark, rows), threshold=0.9, min_pts=3, bucket_bits=None
        ).collect()
    }
    assert out[1].cluster == -1 and out[2].cluster == -1
    assert out[1].n_neighbors == 1  # the neighborhood was seen, just sub-core


def test_dbscan_deterministic(spark):
    a = _blob([1.0, 0.0, 0.0, 0.0], 5)
    rows = [(i, v) for i, v in enumerate(a)]
    r1 = sorted(
        lsh_dbscan(_embs(spark, rows), threshold=0.9, min_pts=3, bucket_bits=2).collect(),
        key=lambda r: r.vec_id,
    )
    r2 = sorted(
        lsh_dbscan(_embs(spark, rows), threshold=0.9, min_pts=3, bucket_bits=2).collect(),
        key=lambda r: r.vec_id,
    )
    assert r1 == r2
