"""Round-3 continuation: power-iteration eigenpair, LOF, edit-distance
near-dup pairs."""

from __future__ import annotations

import math

import pytest

from kkbox_churn_prediction_spark.operators.dedup import edit_distance_pairs
from kkbox_churn_prediction_spark.operators.similarity import (
    embedding_covariance,
    lof_scores,
)
from kkbox_churn_prediction_spark.operators.spectral import (
    power_iteration_top_eigen,
)


def _embs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


# ------------------------------------------------------------ power iteration
def test_power_iteration_converges_on_gapped_matrix(spark):
    np = pytest.importorskip("numpy")
    rng_vals = []
    # strong dominant direction e0 + small noise in other dims
    for i in range(60):
        v = [3.0 * (1 if i % 2 == 0 else -1), 0.0, 0.0, 0.0]
        v[1] = 0.3 * ((i * 7) % 5 - 2)
        v[2] = 0.2 * ((i * 11) % 7 - 3)
        v[3] = 0.1 * ((i * 13) % 3 - 1)
        rng_vals.append((i, [float(x) for x in v]))
    emb = _embs(spark, rng_vals)
    out = {
        r.dim: r
        for r in power_iteration_top_eigen(
            embedding_covariance(emb), n_iter=30
        ).collect()
    }
    X = np.array([v for _, v in rng_vals])
    C = np.cov(X, rowvar=False)
    vals, vecs = np.linalg.eigh(C)
    w = vecs[:, -1]
    if w[int(np.argmax(np.abs(w)))] < 0:
        w = -w
    got = np.array([out[d].loading for d in range(4)])
    assert float(np.dot(got, w)) == pytest.approx(1.0, abs=1e-4)
    assert out[0].eigenvalue == pytest.approx(float(vals[-1]), rel=1e-4)


def test_power_iteration_unit_norm_and_sign(spark):
    rows = [(i, [float((i * 3) % 7 - 3), float((i * 5) % 11 - 5)]) for i in range(40)]
    out = power_iteration_top_eigen(
        embedding_covariance(_embs(spark, rows)), n_iter=15
    ).collect()
    norm = math.sqrt(sum(r.loading**2 for r in out))
    assert norm == pytest.approx(1.0, abs=1e-5)
    pivot = max(out, key=lambda r: (abs(r.loading), -r.dim))
    assert pivot.loading > 0  # deterministic sign convention
    assert len({r.eigenvalue for r in out}) == 1 and out[0].eigenvalue > 0


# ------------------------------------------------------------------------ LOF
def test_lof_flags_isolated_point(spark):
    # blob near e0 (0.02 angular steps — comfortably above the 1e-6
    # cosine-rounding grain, so no rounded-zero distances hit the lrd
    # floor), one isolated point near -e1
    blob = [
        (i, [1.0, 0.02 * i, 0.0, 0.0])
        for i in range(8)
    ]
    rows = blob + [(99, [0.0, -1.0, 0.0, 0.0])]
    out = {r.vec_id: r for r in lof_scores(_embs(spark, rows), k=3).collect()}
    in_cluster = [out[i].lof for i in range(8)]
    # 1-D strip boundary effects put in-cluster LOF in ~[0.80, 1.29]
    assert all(l == pytest.approx(1.0, abs=0.35) for l in in_cluster)
    assert out[99].lof > 5.0  # isolated point: far sparser than its neighbors
    assert out[99].n_k == 3


def test_lof_uniform_grid_is_flat(spark):
    # all points on a circle (uniform density) -> LOF ~ 1 everywhere
    rows = [
        (i, [math.cos(2 * math.pi * i / 12), math.sin(2 * math.pi * i / 12)])
        for i in range(12)
    ]
    out = lof_scores(_embs(spark, rows), k=2).collect()
    assert all(r.lof == pytest.approx(1.0, abs=0.05) for r in out)


# ----------------------------------------------------------------- edit pairs
def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_editdist_catches_small_edit(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta epsilom"),  # 1 substitution
        (3, "alpha completely different text here ok"),
        (4, "zeta unrelated opening words entirely"),
    ]
    out = edit_distance_pairs(
        _docs(spark, rows), max_dist=5, length_bucket=16
    ).collect()
    pairs = {(r.doc_a, r.doc_b): r for r in out}
    assert (1, 2) in pairs
    assert pairs[(1, 2)].edit_dist == 1
    assert pairs[(1, 2)].similarity == pytest.approx(1 - 1 / 30, abs=1e-6)
    assert all(p == (1, 2) for p in pairs)  # others blocked or over threshold


def test_editdist_blocking_requires_same_first_token(spark):
    rows = [(1, "aaa bbb ccc"), (2, "aab bbb ccc")]  # 1 edit but first tokens differ
    out = edit_distance_pairs(_docs(spark, rows), max_dist=5).collect()
    assert out == []


def test_editdist_threshold_filters(spark):
    rows = [(1, "same start then wildly different tail x"), (2, "same start but another end qqqqqqqq")]
    out = edit_distance_pairs(_docs(spark, rows), max_dist=3).collect()
    assert out == []


# --------------------------------------------------- PPMI spectral factor
def test_pmi_factor_matches_numpy_on_synthetic_corpus(spark):
    np = pytest.importorskip("numpy")
    import math as _m

    import __spark_entry__ as entry

    # write a small corpus through the same gate path via a temp view?
    # The gate reads parquet; exercise the same construction inline:
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.functions.text import (
        normalize_text,
        tokens,
    )
    from kkbox_churn_prediction_spark.operators.spectral import (
        power_iteration_top_eigen,
    )

    # two 3-term cliques of different strength: {alpha,beta,zeta} in
    # 2/3 of docs (weak PMI ln1.5), {gamma,delta,eps} in 1/3 (strong
    # PMI ln3 → dominant λ = 2·ln3). Both cliques are 3-node so the
    # spectrum's negative tail (−w) never rivals the top (2w) — a
    # 2-node block has ±w and the "dominant" eigenpair is ambiguous,
    # and equal-strength cliques give a degenerate pair: numpy's
    # basis vector is then arbitrary
    corpus = [
        (
            i,
            "alpha beta zeta" if i % 3 != 2 else "gamma delta eps",
        )
        for i in range(30)
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(tokens(normalize_text(F.col("text"))))).alias(
            "term"
        ),
    )
    df_t = {r.term: r.c for r in toks.groupBy("term").agg(F.count("*").alias("c")).collect()}
    terms = sorted(df_t, key=lambda t: (-df_t[t], t))
    idx = {t: i for i, t in enumerate(terms)}
    D = len(corpus)
    # python PPMI + numpy eigh reference
    from collections import Counter

    co = Counter()
    for _, text in corpus:
        ts = sorted(set(text.split()), key=lambda t: idx[t])
        for a in range(len(ts)):
            for b in range(a + 1, len(ts)):
                co[(idx[ts[a]], idx[ts[b]])] += 1
    d = len(terms)
    M = np.zeros((d, d))
    for (i, j), c in co.items():
        v = max(0.0, round(_m.log(c * D / (df_t[terms[i]] * df_t[terms[j]])), 6))
        M[i, j] = M[j, i] = round(v * 1e6) / 1e6
    vals, vecs = np.linalg.eigh(M)
    k = int(np.argmax(np.abs(vals)))
    w = vecs[:, k]
    if w[int(np.argmax(np.abs(w)))] < 0:
        w = -w

    # engine: same PPMI pairs through the distributed power iteration
    pairs = []
    for (i, j), c in co.items():
        v = max(0.0, round(_m.log(c * D / (df_t[terms[i]] * df_t[terms[j]])), 6))
        pairs.append((i, j, v))
    mat = spark.createDataFrame(pairs, "dim_i int, dim_j int, cov double")
    out = {
        r.dim: r for r in power_iteration_top_eigen(mat, n_iter=40).collect()
    }
    got = np.array([out[i].loading for i in range(d) if i in out])
    ref = np.array([w[i] for i in range(d) if i in out])
    assert abs(float(np.dot(got, ref))) == pytest.approx(1.0, abs=1e-3)
    assert out[min(out)].eigenvalue == pytest.approx(float(vals[k]), rel=1e-3)


def test_power_iteration_driver_and_distributed_identical(spark):
    # the auto-switch must be invisible: same exact integer fixed
    # point, bit-identical loadings/eigenvalue in both modes
    rows = [
        (0, 0, 4.0), (0, 1, 1.2), (0, 2, -0.7), (0, 3, 0.3),
        (1, 1, 3.1), (1, 2, 0.9), (1, 3, -0.4),
        (2, 2, 2.6), (2, 3, 0.05),
        (3, 3, 1.9),
    ]
    cov = spark.createDataFrame(rows, "dim_i int, dim_j int, cov double")
    a = power_iteration_top_eigen(cov, 12, mode="driver").collect()
    b = power_iteration_top_eigen(cov, 12, mode="distributed").collect()
    da = {r["dim"]: (r["loading"], r["eigenvalue"]) for r in a}
    db = {r["dim"]: (r["loading"], r["eigenvalue"]) for r in b}
    assert da == db


def test_power_iteration_auto_picks_driver_for_small(spark):
    rows = [(0, 0, 2.0), (0, 1, 0.5), (1, 1, 1.0)]
    cov = spark.createDataFrame(rows, "dim_i int, dim_j int, cov double")
    out = power_iteration_top_eigen(cov, 8).collect()  # auto
    ref = power_iteration_top_eigen(cov, 8, mode="distributed").collect()
    assert {r["dim"]: r["loading"] for r in out} == {
        r["dim"]: r["loading"] for r in ref
    }
