"""Dedup family semantics + ANN recall + multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from kkbox_churn_prediction_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash,
)
from kkbox_churn_prediction_spark.operators.multimodal import (
    attach_media,
    extract_media_features,
    frame_sample_plan,
)
from kkbox_churn_prediction_spark.operators.similarity import (
    brute_force_topk,
    cosine_topk_pandas,
    hyperplane_bucket,
    lsh_bucketed_topk,
)


@pytest.fixture(scope="module")
def corpus(spark):
    """4 near-dup pairs + unrelated docs (deterministic)."""
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = []
    for i in range(4):
        words = base.split()
        words[2 + i] = f"ALT{i}"  # one-word perturbation → high jaccard
        rows.append((2 * i, base))
        rows.append((2 * i + 1, " ".join(words)))
    for i in range(8, 16):
        rows.append((i + 10, " ".join(f"tok{i}_{j}" for j in range(14))))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_exact_dedup_groups(spark, corpus):
    out = exact_dedup(corpus, F.col("text")).toPandas()
    # the 4 copies of `base` form one group of 4
    g = out[out.group_size == 4]
    assert set(g.doc_id) == {0, 2, 4, 6} and set(g.canonical_id) == {0}
    assert g[g.doc_id == 0].is_canonical.iloc[0] == 1
    assert (out[out.group_size == 1].is_canonical == 1).all()


def test_ngram_jaccard_finds_perturbed_pairs(spark, corpus):
    pairs = ngram_jaccard_pairs(corpus, n=3, threshold=0.4).toPandas()
    got = set(map(tuple, pairs[["doc_a", "doc_b"]].to_numpy()))
    # identical copies pair with jaccard 1.0
    assert (0, 2) in got and (0, 4) in got
    # perturbed docs pair with their source
    assert (0, 1) in got or (2, 1) in got
    assert pairs.jaccard.max() == 1.0


def test_minhash_lsh_candidates_superset_of_high_jaccard(spark, corpus):
    cands = set(
        map(tuple, minhash_lsh_candidates(corpus, n=3, bands=4, rows_per_band=2)
            .toPandas()[["doc_a", "doc_b"]].to_numpy())
    )
    # exact duplicates share every band → always candidates
    assert {(0, 2), (0, 4), (0, 6), (2, 4), (2, 6), (4, 6)} <= cands
    # unrelated docs should mostly not collide
    unrelated = {(a, b) for (a, b) in cands if a >= 18 and b >= 18}
    assert len(unrelated) == 0


def test_simhash_near_for_near_dups(spark, corpus):
    fps = {r["doc_id"]: r["simhash"] for r in simhash(corpus, bits=16).collect()}
    ham = bin(fps[0] ^ fps[1]).count("1")  # one-word perturbation
    ham_far = bin(fps[0] ^ fps[18]).count("1")  # unrelated
    assert fps[0] == fps[2]  # identical text → identical fingerprint
    assert ham <= 4 < ham_far


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(11)
    m = rng.normal(size=(200, 16))
    pdf = pd.DataFrame({"vec_id": range(200), "embedding": [r.astype("float32").tolist() for r in m]})
    return spark.createDataFrame(pdf)


def test_brute_force_topk_matches_numpy(spark, vectors):
    out = brute_force_topk(vectors, vectors.where("vec_id < 3"), k=5).toPandas()
    pdf = vectors.toPandas()
    m = np.stack(pdf.embedding.to_numpy()).astype("float64")
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    for q in range(3):
        cos = mn @ mn[q]
        cos[q] = -2
        want = np.argsort(np.round(-cos, 6), kind="stable")[:5]
        got = out[out.query_id == q].sort_values("rank").neighbor_id.to_numpy()
        assert list(got) == list(want)


def test_lsh_topk_recall_and_pandas_variant(spark, vectors):
    exact = brute_force_topk(vectors, vectors.where("vec_id < 10"), k=5).toPandas()
    approx = lsh_bucketed_topk(vectors, vectors.where("vec_id < 10"), k=5, bits=2).toPandas()
    e = set(map(tuple, exact[["query_id", "neighbor_id"]].to_numpy()))
    a = set(map(tuple, approx[["query_id", "neighbor_id"]].to_numpy()))
    recall = len(e & a) / len(e)
    assert recall >= 0.3  # 2-bit buckets: coarse but must catch same-quadrant hits

    qpd = vectors.where("vec_id < 3").toPandas()
    pud = cosine_topk_pandas(vectors, qpd, k=5).toPandas()
    bf = brute_force_topk(vectors, vectors.where("vec_id < 3"), k=5).toPandas()
    mism = (
        pud.sort_values(["query_id", "rank"]).reset_index(drop=True)[["query_id", "neighbor_id"]]
        .compare(bf.sort_values(["query_id", "rank"]).reset_index(drop=True)[["query_id", "neighbor_id"]])
    )
    assert mism.empty


def test_hyperplane_bucket_deterministic(spark, vectors):
    rng = np.random.default_rng(42)
    planes = rng.normal(size=(6, 16))
    b1 = hyperplane_bucket(vectors, planes).select("vec_id", "bucket").toPandas()
    b2 = hyperplane_bucket(vectors.repartition(7), planes).select("vec_id", "bucket").toPandas()
    assert b1.sort_values("vec_id").bucket.tolist() == b2.sort_values("vec_id").bucket.tolist()
    assert b1.bucket.nunique() > 8


def test_multimodal_plumbing(spark, corpus):
    media = attach_media(corpus)
    feats = extract_media_features(media).toPandas()
    assert len(feats) == corpus.count()
    assert (feats.n_bytes > 0).all()
    assert set(feats.columns) == {
        "media_id", "kind", "n_bytes", "width", "height", "n_frames", "fingerprint",
    }
    # deterministic fake decode: same payload → same dims
    f2 = extract_media_features(media.repartition(5)).toPandas()
    pd.testing.assert_frame_equal(
        feats.sort_values("media_id").reset_index(drop=True),
        f2.sort_values("media_id").reset_index(drop=True),
    )
    with pytest.raises(NotImplementedError):
        extract_media_features(media, strict=True)

    frames = frame_sample_plan(media, every_n=30).toPandas()
    assert (frames.frame_no % 30 == 0).all()
    assert frames.groupby("media_id").size().min() >= 1


def test_resize_plan_letterbox_geometry(spark, corpus):
    from kkbox_churn_prediction_spark.operators.multimodal import resize_plan

    media = attach_media(corpus)
    tw, th = 256, 144
    geo = resize_plan(media, target_w=tw, target_h=th).toPandas()
    assert len(geo) == corpus.count()
    # output fits the target box and preserves padding centering
    assert (geo.out_w <= tw).all() and (geo.out_h <= th).all()
    assert (geo.out_w > 0).all() and (geo.out_h > 0).all()
    # at least one dimension binds exactly (letterbox, not squash)
    assert ((geo.out_w == tw) | (geo.out_h == th)).all()
    assert (geo.pad_x == (tw - geo.out_w) // 2).all()
    assert (geo.pad_y == (th - geo.out_h) // 2).all()
    # integer aspect preservation: out_h == floor(src_h * out_w-side scale)
    wide = geo.src_w * th >= geo.src_h * tw
    exp_h = (geo.src_h.astype("int64") * tw) // geo.src_w
    assert (geo.out_h[wide] == exp_h[wide].clip(lower=1)).all()
    exp_w = (geo.src_w.astype("int64") * th) // geo.src_h
    assert (geo.out_w[~wide] == exp_w[~wide].clip(lower=1)).all()

    # degenerate zero-dim media (NULL payload) → all-zero geometry
    null_media = spark.createDataFrame(
        pd.DataFrame({"doc_id": [99], "text": [None]})
    ).select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit(None).cast("binary").alias("payload"),
        F.lit(None).cast("string").alias("mime"),
        F.col("doc_id").alias("source_doc_id"),
    )
    z = resize_plan(null_media, target_w=tw, target_h=th).toPandas()
    assert (z[["out_w", "out_h", "pad_x", "pad_y"]].to_numpy() == 0).all()


def test_decontaminate_flags_overlap(spark):
    from kkbox_churn_prediction_spark.operators.dedup import decontaminate

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),   # contains eval trigrams
            (2, "one two three four five six"),           # disjoint
            (3, "alpha beta gamma something else here"),  # 1 shared trigram only
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "eval_id long, text string"
    )
    got = {r["doc_id"]: r for r in decontaminate(corpus, ev, n=3, min_common=2).collect()}
    # doc 1 shares 3 of the eval's 3 trigrams; doc 3 only 1 (below threshold)
    assert set(got) == {1}
    assert got[1]["n_common"] == 3 and got[1]["eval_frac"] == 1.0


def test_cluster_centroids_matches_numpy(spark):
    import numpy as np

    from kkbox_churn_prediction_spark.operators.similarity import cluster_centroids

    rng = np.random.default_rng(23)
    vecs = rng.normal(size=(30, 5)).round(3)
    rows = [(i, int(i % 3), [float(x) for x in vecs[i]]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, bucket int, embedding array<double>")
    got = cluster_centroids(df, "bucket", "embedding").toPandas()
    for b in range(3):
        expect = vecs[np.arange(30) % 3 == b].mean(axis=0)
        g = got[got.bucket == b].sort_values("dim")
        assert (g["n_members"] == 10).all()
        np.testing.assert_allclose(g["centroid"].to_numpy(), np.round(expect, 6), atol=2e-6)


def test_quantize_roundtrip_error_and_cosine(spark):
    import numpy as np

    from kkbox_churn_prediction_spark.operators.similarity import (
        dequantize_expr,
        quantize_embeddings,
    )

    rng = np.random.default_rng(41)
    vecs = rng.normal(size=(50, 64))
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = quantize_embeddings(df)
    deq = q.select(
        "vec_id",
        dequantize_expr(F.col("qvec"), F.col("scale"), F.col("offset")).alias("d"),
    ).collect()
    for r in deq:
        orig = vecs[r["vec_id"]]
        rec = np.array(r["d"])
        # per-element error bounded by half a quantization step
        step = (orig.max() - orig.min()) / 255
        assert np.abs(rec - orig).max() <= step / 2 + 1e-9
        cos = rec @ orig / (np.linalg.norm(rec) * np.linalg.norm(orig))
        assert cos > 0.9999
    # constant vector: q all zero, exact reconstruction
    const = spark.createDataFrame([(0, [2.5] * 8)], "vec_id long, embedding array<double>")
    row = quantize_embeddings(const).first()
    assert set(row["qvec"]) == {0} and row["scale"] == 0.0


def test_fuzzy_pairs_blocking_and_distance(spark):
    from kkbox_churn_prediction_spark.operators.dedup import fuzzy_pairs

    base = "the quick brown fox jumps over the lazy dog near the river"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base.replace("river", "rivet")),      # 1 edit, same prefix/band
            (3, "XX " + base),                         # edit inside prefix → blocked out
            (4, base + " " + base),                    # different length band
            (5, "completely different text about engines and turbines"),
        ],
        "doc_id long, text string",
    )
    got = {(r["doc_a"], r["doc_b"]): r["lev_dist"]
           for r in fuzzy_pairs(docs, max_distance=3).collect()}
    assert got == {(1, 2): 1}  # recall contract: 3 and 4 are non-candidates

    # hot-block cap: 5 identical docs with max_block=3 → block dropped
    hot = spark.createDataFrame(
        [(i, base) for i in range(10, 15)], "doc_id long, text string"
    )
    assert fuzzy_pairs(hot, max_distance=3, max_block=3).count() == 0
    assert fuzzy_pairs(hot, max_distance=3).count() == 10  # 5 choose 2


def test_collapse_bursts_debounce(spark):
    from datetime import datetime, timedelta

    from kkbox_churn_prediction_spark.operators.dedup import collapse_bursts

    t0 = datetime(2024, 1, 1, 12, 0, 0)
    rows = (
        [("u1", "click", t0 + timedelta(microseconds=300_000 * i)) for i in range(3)]
        + [("u1", "click", t0 + timedelta(seconds=5))]      # new burst (>1s gap)
        + [("u1", "view", t0)]                              # different key
        + [("u2", "click", t0), ("u2", "click", t0)]        # exact-dup timestamps
    )
    df = spark.createDataFrame(rows, "user string, etype string, ts timestamp")
    out = collapse_bursts(df, ["user", "etype"], "ts", gap_us=1_000_000)
    got = sorted(
        ((r["user"], r["etype"], r["ts"], r["burst_size"], r["burst_span_us"])
         for r in out.collect())
    )
    assert got == [
        ("u1", "click", t0, 3, 600_000),
        ("u1", "click", t0 + timedelta(seconds=5), 1, 0),
        ("u1", "view", t0, 1, 0),
        ("u2", "click", t0, 2, 0),
    ]
    # partition-layout invariance
    got2 = sorted(
        ((r["user"], r["etype"], r["ts"], r["burst_size"], r["burst_span_us"])
         for r in collapse_bursts(
             df.repartition(5), ["user", "etype"], "ts", gap_us=1_000_000
         ).collect())
    )
    assert got == got2


def test_centroid_distance_outliers(spark):
    import math

    from kkbox_churn_prediction_spark.operators.similarity import (
        centroid_distance_outliers,
    )

    # 8 vectors near the origin, one far stray: the stray must flag,
    # the rest must not, and dist must match numpy exactly (clamped
    # identity form).
    base = [[0.1 * i, -0.1 * i, 0.05] for i in range(8)]
    stray = [[25.0, -25.0, 25.0]]
    rows = [(i, v) for i, v in enumerate(base + stray)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r["vec_id"]: r for r in centroid_distance_outliers(df, dim=3).collect()}
    assert len(out) == 9
    assert out[8]["is_outlier"] and out[8]["z"] > 2.0
    assert all(not out[i]["is_outlier"] for i in range(8))
    vecs = base + stray
    cent = [sum(v[j] for v in vecs) / 9 for j in range(3)]
    d8 = math.sqrt(sum((vecs[8][j] - cent[j]) ** 2 for j in range(3)))
    assert abs(out[8]["dist"] - d8) < 1e-6


def test_centroid_distance_outliers_degenerate(spark):
    from kkbox_churn_prediction_spark.operators.similarity import (
        centroid_distance_outliers,
    )

    # identical vectors: sd = 0 → z = 0, nothing flags, dist clamps
    # to exactly 0 (no sqrt(-epsilon) NaN from float cancellation)
    df = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0]) for i in range(4)], ["vec_id", "embedding"]
    )
    rows = centroid_distance_outliers(df, dim=3).collect()
    assert all(r["dist"] == 0.0 and r["z"] == 0.0 and not r["is_outlier"] for r in rows)


def test_recall_at_k_golden(spark):
    from kkbox_churn_prediction_spark.operators.similarity import recall_at_k

    exact = spark.createDataFrame(
        [(1, n, r) for r, n in enumerate([10, 11, 12], 1)]
        + [(2, n, r) for r, n in enumerate([20, 21, 22], 1)],
        "query_id long, neighbor_id long, rank int",
    )
    # query 1: 2/3 overlap; query 2: none (left-join zero path)
    approx = spark.createDataFrame(
        [(1, 10, 1), (1, 12, 2), (1, 99, 3), (2, 98, 1), (2, 97, 2), (2, 96, 3)],
        "query_id long, neighbor_id long, rank int",
    )
    out = {r["query_id"]: r for r in recall_at_k(approx, exact, 3).collect()}
    assert out[1]["n_exact"] == 3 and out[1]["n_hit"] == 2
    assert abs(out[1]["recall"] - 0.666667) < 1e-6
    assert out[2]["n_hit"] == 0 and out[2]["recall"] == 0.0
    # identical inputs -> perfect recall
    perfect = recall_at_k(exact, exact, 3).collect()
    assert all(r["recall"] == 1.0 for r in perfect)
    # rank pruning: rows beyond k never count
    pruned = recall_at_k(approx, exact, 2).collect()
    assert {r["query_id"]: r["n_exact"] for r in pruned} == {1: 2, 2: 2}


def test_embedding_diversity_golden(spark):
    from kkbox_churn_prediction_spark.operators.similarity import embedding_diversity

    rows = [
        # group 0: two opposite unit vectors -> mu=0, trace = mean||x||^2 = 1
        (1, 0, [1.0, 0.0]),
        (2, 0, [-1.0, 0.0]),
        # group 1: identical vectors -> trace 0 (collapsed)
        (3, 1, [3.0, 4.0]),
        (4, 1, [3.0, 4.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
    out = {r["label"]: r for r in embedding_diversity(df, "label").collect()}
    assert out[0]["n_vectors"] == 2
    assert abs(out[0]["trace_variance"] - 1.0) < 1e-9
    assert abs(out[0]["rms_radius"] - 1.0) < 1e-9
    assert out[1]["trace_variance"] == 0.0
    assert out[1]["rms_radius"] == 0.0


def test_containment_finds_doc_in_doc(spark):
    from kkbox_churn_prediction_spark.operators.dedup import containment_pairs

    short = "alpha beta gamma delta epsilon zeta"
    # the short doc verbatim inside a much longer one: Jaccard is
    # washed out by the big union, containment(A in B) stays 1.0
    long_ = " ".join(f"filler{j} pad{j} word{j}" for j in range(12)) + " " + short
    rows = [(1, short), (2, long_), (3, "totally unrelated content here now")]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))

    jac = ngram_jaccard_pairs(df, n=3, threshold=0.5).toPandas()
    assert jac.empty  # Jaccard misses the subset pair at 0.5

    con = containment_pairs(df, n=3, threshold=0.9).toPandas()
    assert set(map(tuple, con[["doc_a", "doc_b"]].to_numpy())) == {(1, 2)}
    row = con.iloc[0]
    assert row.containment_a_in_b == 1.0  # all of 1's shingles are in 2
    assert row.containment_b_in_a < 0.5
    # unrelated doc pairs with nobody
    assert 3 not in set(con.doc_a) | set(con.doc_b)


def test_containment_hot_shingle_cap_bounds_pairs(spark):
    from kkbox_churn_prediction_spark.operators.dedup import containment_pairs

    # every doc shares one hot stop-shingle; capping it removes the
    # quadratic pair blowup AND recomputes sizes on the capped stream
    hot = "the end of line"
    rows = [(i, f"unique{i} mark{i} tag{i} {hot}") for i in range(30)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    uncapped = containment_pairs(df, n=3, threshold=0.2)
    capped = containment_pairs(df, n=3, threshold=0.2, max_shingle_freq=10)
    assert uncapped.count() == 30 * 29 // 2  # hot shingles pair everyone
    assert capped.count() == 0


def test_random_projection_matches_numpy_and_preserves_distance(spark, vectors):
    from kkbox_churn_prediction_spark.operators.similarity import (
        _jl_signs,
        random_projection,
    )

    out = (
        random_projection(vectors, d_in=16, d_out=8, seed="jl")
        .toPandas()
        .sort_values("vec_id")
        .set_index("vec_id")
    )
    pdf = vectors.toPandas().sort_values("vec_id")
    x = np.stack(pdf.embedding.to_numpy()).astype("float64")
    signs = np.array(_jl_signs(16, 8, "jl"))
    want = (x @ signs.T) / np.sqrt(8.0)
    got = out[[f"proj_{j}" for j in range(8)]].to_numpy()
    assert np.allclose(got, want, atol=1e-9)
    # JL property: pairwise distances correlate strongly pre/post
    d_in = np.linalg.norm(x[:50, None] - x[None, :50], axis=2)[
        np.triu_indices(50, 1)
    ]
    d_out = np.linalg.norm(want[:50, None] - want[None, :50], axis=2)[
        np.triu_indices(50, 1)
    ]
    # 8 output dims from 16 keeps only a coarse JL guarantee — a
    # deterministic fixture measures 0.66 here; bound it away from 0
    assert np.corrcoef(d_in, d_out)[0, 1] > 0.5


class TestNdcgAtK:
    def _frame(self, spark, rows):
        return spark.createDataFrame(rows, "query_id long, neighbor_id long, rank int")

    def test_perfect_and_swapped(self, spark):
        from kkbox_churn_prediction_spark.operators.similarity import ndcg_at_k

        exact = self._frame(spark, [(1, 10, 1), (1, 11, 2), (1, 12, 3)])
        # identical ranking -> ndcg 1.0
        out = ndcg_at_k(exact, exact, k=3).collect()[0]
        assert out["ndcg"] == 1.0 and out["dcg"] == out["idcg"]
        # top two swapped -> dcg < idcg, still high
        import math

        swapped = self._frame(spark, [(1, 11, 1), (1, 10, 2), (1, 12, 3)])
        r = ndcg_at_k(swapped, exact, k=3).collect()[0]
        # rel: 10->3, 11->2, 12->1; dcg = 2/log2(2)+3/log2(3)+1/log2(4)
        dcg = 2 / 1.0 + 3 / math.log2(3) + 1 / 2.0
        idcg = 3 / 1.0 + 2 / math.log2(3) + 1 / 2.0
        assert r["dcg"] == round(dcg, 6)
        assert r["ndcg"] == round(dcg / idcg, 6)
        assert 0 < r["ndcg"] < 1.0

    def test_miss_scores_zero_relevance(self, spark):
        from kkbox_churn_prediction_spark.operators.similarity import ndcg_at_k

        exact = self._frame(spark, [(1, 10, 1), (1, 11, 2)])
        # approx returns a neighbor the exact top-k never saw
        approx = self._frame(spark, [(1, 99, 1), (1, 10, 2)])
        import math

        r = ndcg_at_k(approx, exact, k=2).collect()[0]
        # rel: 10->2, 11->1; dcg = 0/1 + 2/log2(3); idcg = 2/1 + 1/log2(3)
        assert r["dcg"] == round(2 / math.log2(3), 6)
        assert r["ndcg"] < 0.6
