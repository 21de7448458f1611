"""Distributed Lloyd k-means vs a lock-step numpy reference."""

from __future__ import annotations

import numpy as np


def _data(spark, n_per=40, k=3, dim=4, spread=0.05):
    """k well-separated blobs; ids interleave clusters so the pmod-k
    init picks one seed near each blob is NOT guaranteed — the test
    checks convergence, not luck."""
    rng = np.random.default_rng(7)
    centers = np.eye(k, dim) * 10.0
    rows = []
    for i in range(n_per * k):
        c = i % k
        v = centers[c] + rng.normal(0, spread, dim)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    return df, rows


def _numpy_lloyd(rows, k, iters):
    ids = np.array([r[0] for r in rows])
    X = np.array([r[1] for r in rows])
    # same init: min-id per (id % k) residue class
    cents = []
    for cls in range(k):
        sel = ids[ids % k == cls]
        cents.append(X[np.where(ids == sel.min())[0][0]])
    C = np.array(cents, dtype=float)
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        a = d.argmin(1)  # ties to lower index, same as struct-min
        for j in range(k):
            if (a == j).any():
                C[j] = X[a == j].mean(0)
    d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
    return d.argmin(1), C


def test_matches_numpy_reference(spark):
    from kkbox_churn_prediction_spark.operators.similarity import kmeans_fit

    k, iters = 3, 4
    df, rows = _data(spark, k=k)
    assigned, cents = kmeans_fit(df, k=k, iters=iters)
    got = {r["vec_id"]: r["cell"] for r in assigned.collect()}
    ref_assign, ref_C = _numpy_lloyd(rows, k, iters)
    for i, (vid, _) in enumerate(rows):
        assert got[vid] == ref_assign[i]
    assert np.allclose(np.array(cents), ref_C, atol=1e-9)


def test_converges_to_true_blobs(spark):
    from kkbox_churn_prediction_spark.operators.similarity import kmeans_fit

    df, rows = _data(spark, k=3)
    assigned, cents = kmeans_fit(df, k=3, iters=6)
    out = assigned.collect()
    # every row lands within its blob: same cell as all other rows of its blob
    by_blob = {}
    for r in out:
        by_blob.setdefault(r["vec_id"] % 3, set()).add(r["cell"])
    assert all(len(cells) == 1 for cells in by_blob.values())
    # three distinct cells, tight within-cluster distance
    assert len({next(iter(c)) for c in by_blob.values()}) == 3
    assert max(r["sq_dist"] for r in out) < 1.0


def test_assignment_partition_invariant(spark):
    from kkbox_churn_prediction_spark.operators.similarity import kmeans_fit

    df, _ = _data(spark)
    a, _ = kmeans_fit(df.repartition(1), k=3, iters=2)
    b, _ = kmeans_fit(df.repartition(9), k=3, iters=2)
    ga = sorted((r["vec_id"], r["cell"]) for r in a.collect())
    gb = sorted((r["vec_id"], r["cell"]) for r in b.collect())
    assert ga == gb
