"""Goldens for the embedding covariance sufficient statistic and the
PCA projection built on it — numpy is the reference implementation.
"""

from __future__ import annotations

import numpy as np
import pytest

from kkbox_churn_prediction_spark.operators.similarity import (
    embedding_covariance,
    pca_project,
)


def _emb_df(spark, X):
    rows = [(i, [float(v) for v in x]) for i, x in enumerate(X)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.fixture(scope="module")
def X():
    rng = np.random.default_rng(7)
    # anisotropic blob so the top component is unambiguous
    base = rng.normal(size=(200, 4))
    scale = np.array([5.0, 2.0, 0.5, 0.1])
    return (base * scale).astype(np.float32)


def test_covariance_matches_numpy(spark, X):
    got = {
        (r.dim_i, r.dim_j): r.cov
        for r in embedding_covariance(_emb_df(spark, X)).collect()
    }
    C = np.cov(X.astype(np.float64), rowvar=False, ddof=1)
    assert len(got) == 4 * 5 // 2
    for (i, j), v in got.items():
        assert i <= j
        assert v == pytest.approx(C[i, j], abs=2e-6)


def test_covariance_partition_invariant(spark, X):
    df = _emb_df(spark, X)
    a = sorted(map(tuple, embedding_covariance(df.repartition(1)).collect()))
    b = sorted(map(tuple, embedding_covariance(df.repartition(7)).collect()))
    for ra, rb in zip(a, b):
        assert ra[:2] == rb[:2]
        assert ra[2] == pytest.approx(rb[2], abs=2e-6)


def test_pca_projection_matches_numpy(spark, X):
    out = pca_project(_emb_df(spark, X), k=2).toPandas()
    C = np.zeros((4, 4))
    for r in embedding_covariance(_emb_df(spark, X)).collect():
        C[r.dim_i, r.dim_j] = C[r.dim_j, r.dim_i] = r.cov
    vals, vecs = np.linalg.eigh(C)
    order = np.argsort(vals)[::-1]
    for c, tag in enumerate(["pc0", "pc1"]):
        v = vecs[:, order[c]]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        got = out[out.pc == tag].sort_values("vec_id")["value"].to_numpy()
        want = X.astype(np.float64) @ v
        assert np.allclose(got, np.round(want, 6), atol=1e-4)


def test_pca_top_component_captures_dominant_axis(spark, X):
    # scale=[5,2,.5,.1] ⇒ pc0 must be ~±e0: projecting recovers dim 0
    out = pca_project(_emb_df(spark, X), k=1).toPandas()
    got = out.sort_values("vec_id")["value"].to_numpy()
    r = np.corrcoef(got, X[:, 0].astype(np.float64))[0, 1]
    assert abs(r) > 0.99


def test_pca_sign_deterministic_across_runs(spark, X):
    a = pca_project(_emb_df(spark, X), k=2).toPandas()
    b = pca_project(_emb_df(spark, X.copy()), k=2).toPandas()
    m = a.merge(b, on=["vec_id", "pc"])
    assert np.allclose(m.value_x, m.value_y)


# --- reciprocal-rank fusion --------------------------------------------------


def test_rrf_fuse_hand_golden(spark):
    from kkbox_churn_prediction_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(20, 1), (40, 2), (10, 3)], "doc_id long, rank int"
    )
    rows = {r.doc_id: r for r in rrf_fuse([a, b], k=60, top_n=10).collect()}
    # doc 20: 1/62 + 1/61; doc 10: 1/61 + 1/63; doc 30: 1/63; doc 40: 1/62
    assert rows[20].rrf_score == pytest.approx(round(1 / 62 + 1 / 61, 6))
    assert rows[10].rrf_score == pytest.approx(round(1 / 61 + 1 / 63, 6))
    assert rows[20].fused_rank == 1 and rows[10].fused_rank == 2
    assert rows[20].n_lists == 2 and rows[30].n_lists == 1
    assert rows[10].best_rank == 1  # doc 10 is rank 1 in list a
    # doc 40 (1/62) beats doc 30 (1/63)
    assert rows[40].fused_rank == 3 and rows[30].fused_rank == 4


def test_rrf_fuse_tie_breaks_on_doc_id(spark):
    from kkbox_churn_prediction_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame([(5, 1), (3, 2)], "doc_id long, rank int")
    b = spark.createDataFrame([(3, 1), (5, 2)], "doc_id long, rank int")
    rows = rrf_fuse([a, b], top_n=10).collect()
    # identical scores → smaller doc_id first
    assert [r.doc_id for r in sorted(rows, key=lambda r: r.fused_rank)] == [3, 5]


# --- Mahalanobis outliers ----------------------------------------------------


def test_mahalanobis_matches_numpy(spark, X):
    from kkbox_churn_prediction_spark.operators.similarity import (
        mahalanobis_outliers,
    )

    got = {
        r.vec_id: r.mahalanobis_sq
        for r in mahalanobis_outliers(_emb_df(spark, X), top_n=200).collect()
    }
    Xd = X.astype(np.float64)
    # replicate: covariance from the engine's rounded long form
    from kkbox_churn_prediction_spark.operators.similarity import (
        embedding_covariance,
    )

    C = np.zeros((4, 4))
    for r in embedding_covariance(_emb_df(spark, X)).collect():
        C[r.dim_i, r.dim_j] = C[r.dim_j, r.dim_i] = r.cov
    mu = Xd.mean(axis=0)
    prec = np.linalg.inv(C + 1e-6 * np.eye(4))
    diff = Xd - mu
    want = np.einsum("ij,jk,ik->i", diff, prec, diff)
    for i, w in enumerate(want):
        assert got[i] == pytest.approx(w, rel=1e-4)


def test_mahalanobis_flags_low_variance_axis_outlier(spark, X):
    from kkbox_churn_prediction_spark.operators.similarity import (
        mahalanobis_outliers,
    )

    # a point displaced 1.0 along the LOWEST-variance axis (σ=0.1) is a
    # huge Mahalanobis outlier even though its euclidean norm is modest
    Y = np.vstack([X, np.array([[0.0, 0.0, 0.0, 1.0]], dtype=np.float32)])
    top = mahalanobis_outliers(_emb_df(spark, Y), top_n=1).first()
    assert top.vec_id == len(Y) - 1
