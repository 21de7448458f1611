"""Calibration math (ECE / Brier / log-loss / bootstrap / isotonic)
and connected-components clustering."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F


def _pred_df(spark, n=2000, seed=7):
    rng = np.random.default_rng(seed)
    p = rng.uniform(0.001, 0.999, n)
    y = (rng.uniform(0, 1, n) < p * 0.8 + 0.1).astype(int)
    rows = [(f"id{i}", float(p[i]), int(y[i]), "a" if i % 2 == 0 else "b") for i in range(n)]
    return (
        spark.createDataFrame(rows, "event_id string, p double, y int, fold string"),
        p,
        y,
    )


def _ref_ece(y, p, n_bins, closed):
    """numpy transliteration of the reference semantics
    (src/calibration.py right-closed; src/backtest.py digitize/left)."""
    ece, N = 0.0, len(y)
    edges = np.linspace(0, 1, n_bins + 1)
    for b in range(n_bins):
        if closed == "right":
            mask = (p > edges[b]) & (p <= edges[b + 1])
        else:
            idx = np.digitize(p, edges) - 1
            mask = idx == b
        if not mask.any():
            continue
        ece += (mask.sum() / N) * abs(y[mask].mean() - p[mask].mean())
    return ece


@pytest.mark.parametrize("closed", ["right", "left"])
def test_ece_matches_numpy_reference(spark, closed):
    from kkbox_churn_prediction_spark.operators.calibration import ece

    df, p, y = _pred_df(spark)
    got = ece(df, "y", "p", n_bins=10, closed=closed).first()["ece"]
    assert got == pytest.approx(_ref_ece(y, p, 10, closed), abs=2e-6)


def test_prob_bin_edges(spark):
    """p==0 unbinned right-closed; p==1 unbinned left-closed."""
    from kkbox_churn_prediction_spark.operators.calibration import prob_bin

    df = spark.createDataFrame([(0.0,), (1.0,), (0.05,), (0.95,)], "p double")
    r = df.select("p", prob_bin(F.col("p"), 10, closed="right").alias("r"),
                  prob_bin(F.col("p"), 10, closed="left").alias("l")).collect()
    by_p = {row["p"]: row for row in r}
    assert by_p[0.0]["r"] is None and by_p[0.0]["l"] == 0
    assert by_p[1.0]["r"] == 9 and by_p[1.0]["l"] is None
    assert by_p[0.05]["r"] == 0 and by_p[0.95]["l"] == 9


def test_brier_logloss_matches_numpy(spark):
    from kkbox_churn_prediction_spark.operators.calibration import (
        LOGLOSS_EPS,
        brier_logloss_by_fold,
    )

    df, p, y = _pred_df(spark)
    rows = {r["fold"]: r for r in brier_logloss_by_fold(df, "fold", "y", "p").collect()}
    for fold, sel in (("a", slice(0, None, 2)), ("b", slice(1, None, 2))):
        pf, yf = p[sel], y[sel]
        pc = np.clip(pf, LOGLOSS_EPS, 1 - LOGLOSS_EPS)
        assert rows[fold]["brier"] == pytest.approx(np.mean((pf - yf) ** 2), abs=2e-6)
        ll = -np.mean(yf * np.log(pc) + (1 - yf) * np.log(1 - pc))
        assert rows[fold]["log_loss"] == pytest.approx(ll, abs=2e-6)
        assert rows[fold]["n"] == len(pf)


def _pairwise_auc(y, p):
    """O(n^2) reference: P(score_pos > score_neg) + 0.5·ties."""
    pos, neg = p[y == 1], p[y == 0]
    wins = (pos[:, None] > neg[None, :]).sum()
    ties = (pos[:, None] == neg[None, :]).sum()
    return (wins + 0.5 * ties) / (len(pos) * len(neg))


def test_auc_matches_pairwise_reference_with_ties(spark):
    from kkbox_churn_prediction_spark.operators.calibration import auc_ks_by_fold

    rng = np.random.default_rng(5)
    # coarse grid forces heavy ties — exercises the average-rank path
    p = rng.integers(0, 20, 1500) / 20.0 + 0.025
    y = (rng.uniform(0, 1, 1500) < p).astype(int)
    rows = [(float(p[i]), int(y[i]), "a") for i in range(1500)]
    df = spark.createDataFrame(rows, "p double, y int, fold string")
    r = auc_ks_by_fold(df, "fold", "y", "p").first()
    assert r["n_pos"] == int(y.sum()) and r["n_neg"] == int((1 - y).sum())
    assert r["auc"] == pytest.approx(_pairwise_auc(y, p), abs=2e-6)
    # KS vs numpy empirical CDF max-gap over the pooled support
    support = np.unique(p)
    f1 = np.array([(p[y == 1] <= s).mean() for s in support])
    f0 = np.array([(p[y == 0] <= s).mean() for s in support])
    assert r["ks"] == pytest.approx(np.abs(f1 - f0).max(), abs=2e-6)


def test_auc_binned_mode_bounds_error(spark):
    from kkbox_churn_prediction_spark.operators.calibration import auc_ks_by_fold

    df, p, y = _pred_df(spark, n=3000, seed=13)
    exact = auc_ks_by_fold(df, "fold", "y", "p").toPandas().set_index("fold")
    binned = (
        auc_ks_by_fold(df, "fold", "y", "p", bin_scores=256)
        .toPandas()
        .set_index("fold")
    )
    for fold in ("a", "b"):
        assert abs(exact.loc[fold, "auc"] - binned.loc[fold, "auc"]) < 1 / 256
        assert abs(exact.loc[fold, "ks"] - binned.loc[fold, "ks"]) < 2 / 256


def test_poisson_weights_deterministic_and_mean_one(spark):
    from kkbox_churn_prediction_spark.functions.text import stable_hash48
    from kkbox_churn_prediction_spark.operators.calibration import poisson_weight

    ids = spark.range(20000).select(F.col("id").cast("string").alias("id"))
    u = (
        F.pmod(stable_hash48(F.col("id")), F.lit(2**20)).cast("double")
        / F.lit(float(2**20))
    )
    w = ids.select(poisson_weight(u).alias("w"))
    stats = w.agg(F.avg("w").alias("m"), F.max("w").alias("mx"), F.min("w").alias("mn")).first()
    assert stats["m"] == pytest.approx(1.0, abs=0.02)
    assert stats["mn"] >= 0 and stats["mx"] <= 8
    # deterministic: identical on recompute
    assert w.groupBy("w").count().collect() == w.groupBy("w").count().collect()


def test_bootstrap_ci_brackets_point_estimate(spark):
    from kkbox_churn_prediction_spark.operators.calibration import (
        bootstrap_metric_ci,
        brier_logloss_by_fold,
    )

    df, p, y = _pred_df(spark, n=3000)
    ci = {r["metric"]: r for r in bootstrap_metric_ci(
        df, "event_id", "y", "p", n_replicates=32
    ).collect()}
    point = brier_logloss_by_fold(df.withColumn("g", F.lit("all")), "g", "y", "p").first()
    for metric, pt in (("brier", point["brier"]), ("log_loss", point["log_loss"])):
        r = ci[metric]
        assert r["ci_lower"] <= r["mean"] <= r["ci_upper"]
        # CI of the full-sample mean should bracket the point estimate
        assert r["ci_lower"] <= pt <= r["ci_upper"]
        # and be a nontrivial but tight band at n=3000
        assert 0 < r["ci_upper"] - r["ci_lower"] < 0.2


def _numpy_platt(x, t, n_iter=8):
    """Same Newton iteration on collected arrays — the ground truth
    the distributed fit must match to float round-off."""
    a, b = 1.0, 0.0
    for _ in range(n_iter):
        z = a * x + b
        q = 1.0 / (1.0 + np.exp(-z))
        r, w = q - t, q * (1.0 - q)
        g_a, g_b = (r * x).sum(), r.sum()
        h_aa, h_ab, h_bb = (w * x * x).sum(), (w * x).sum(), w.sum()
        det = h_aa * h_bb - h_ab * h_ab
        if abs(det) < 1e-12:
            break
        da = (h_bb * g_a - h_ab * g_b) / det
        db = (h_aa * g_b - h_ab * g_a) / det
        a, b = a - da, b - db
        if abs(da) < 1e-10 and abs(db) < 1e-10:
            break
    return a, b


def test_platt_scaling_matches_numpy_and_improves_calibration(spark):
    from kkbox_churn_prediction_spark.operators.calibration import (
        LOGLOSS_EPS,
        apply_platt,
        brier_logloss_by_fold,
        platt_scaling,
    )

    rng = np.random.default_rng(31)
    n = 4000
    # miscalibrated scores: true P(y=1) = sigmoid(2*logit(p)) != p
    p = rng.uniform(0.02, 0.98, n)
    logit = np.log(p / (1 - p))
    y = (rng.uniform(0, 1, n) < 1 / (1 + np.exp(-2 * logit))).astype(int)
    rows = [(float(p[i]), int(y[i]), "all") for i in range(n)]
    df = spark.createDataFrame(rows, "p double, y int, fold string")
    a, b = platt_scaling(df, "y", "p")
    # ground truth: same algorithm on collected arrays
    pc = np.clip(p, LOGLOSS_EPS, 1 - LOGLOSS_EPS)
    x = np.log(pc / (1 - pc))
    t_pos = (y.sum() + 1.0) / (y.sum() + 2.0)
    t_neg = 1.0 / ((n - y.sum()) + 2.0)
    t = np.where(y == 1, t_pos, t_neg)
    a_ref, b_ref = _numpy_platt(x, t)
    assert a == pytest.approx(a_ref, rel=1e-6)
    assert b == pytest.approx(b_ref, rel=1e-6, abs=1e-6)
    assert a == pytest.approx(2.0, abs=0.35)  # recovers the true slope
    # calibrated probabilities beat raw on log-loss
    cal = apply_platt(df, "p", a, b)
    raw = brier_logloss_by_fold(df, "fold", "y", "p").first()
    fixed = brier_logloss_by_fold(
        cal.withColumnRenamed("p_calibrated", "pcal"), "fold", "y", "pcal"
    ).first()
    assert fixed["log_loss"] < raw["log_loss"]


def _minimax_iso(sum_y, n):
    """Brute-force max_{j<=i} min_{k>=i} wavg(j..k) — the PAV identity."""
    m = len(n)
    out = []
    for i in range(m):
        best = -math.inf
        for j in range(i + 1):
            worst = math.inf
            for k in range(i, m):
                worst = min(worst, sum(sum_y[j:k + 1]) / sum(n[j:k + 1]))
            best = max(best, worst)
        out.append(best)
    return out


def test_isotonic_matches_minimax_and_is_monotone(spark):
    from kkbox_churn_prediction_spark.operators.calibration import isotonic_calibration

    df, _, _ = _pred_df(spark, n=4000, seed=11)
    got = isotonic_calibration(df, "fold", "y", "p", n_bins=15).toPandas()
    for fold, g in got.groupby("fold"):
        g = g.sort_values("bin").reset_index(drop=True)
        iso = g["iso_prob"].to_numpy()
        assert (np.diff(iso) >= -1e-12).all(), f"non-monotone fit in fold {fold}"
        sum_y = (g["frac_pos"] * g["n"]).round().astype(int).tolist()
        ref = _minimax_iso(sum_y, g["n"].tolist())
        np.testing.assert_allclose(iso, np.round(ref, 6), atol=2e-6)


def test_connected_components_small_graph(spark):
    from kkbox_churn_prediction_spark.operators.components import connected_components

    # two clusters (chain a-b-c-d, triangle x-y-z) + isolated pair (m,n)
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"), ("y", "z"), ("x", "z"), ("m", "n")],
        "doc_a string, doc_b string",
    )
    got = {r["node"]: (r["component"], r["component_size"])
           for r in connected_components(edges).collect()}
    assert {got[k] for k in "abcd"} == {("a", 4)}
    assert {got[k] for k in "xyz"} == {("x", 3)}
    assert got["m"] == ("m", 2) and got["n"] == ("m", 2)
    assert len(got) == 9


def test_components_doubling_handles_long_chains(spark):
    """A 60-node path has diameter 59: hash-min cannot close it in 12
    rounds (loud failure), pointer-jumping closes it in O(log n)."""
    from kkbox_churn_prediction_spark.operators.components import connected_components

    edges = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(59)],
        "doc_a string, doc_b string",
    )
    # pin the distributed rounds: auto mode resolves a 59-edge graph on
    # the driver via pointer jumping, which converges on any diameter
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=12, mode="distributed")
    got = connected_components(
        edges, algorithm="doubling", max_iter=12, mode="distributed"
    ).collect()
    assert len(got) == 60
    assert {r["component"] for r in got} == {"n000"}
    assert all(r["component_size"] == 60 for r in got)


def test_components_algorithms_agree_on_random_graph(spark):
    from kkbox_churn_prediction_spark.operators.components import connected_components

    rng = np.random.default_rng(17)
    nodes = [f"v{i}" for i in range(80)]
    edges = [(nodes[rng.integers(80)], nodes[rng.integers(80)]) for _ in range(70)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "doc_a string, doc_b string")
    r1 = sorted(map(tuple, connected_components(df).collect()))
    r2 = sorted(map(tuple, connected_components(df, algorithm="doubling").collect()))
    assert r1 == r2


def test_connected_components_partition_invariant(spark):
    """Cluster assignment must not depend on input partitioning."""
    from kkbox_churn_prediction_spark.operators.components import connected_components

    rng = np.random.default_rng(3)
    # random graph: 60 nodes, ring edges in groups of 6 → 10 components
    edges = [(f"n{g * 6 + i}", f"n{g * 6 + (i + 1) % 6}") for g in range(10) for i in range(6)]
    rng.shuffle(edges)
    df1 = spark.createDataFrame(edges, "doc_a string, doc_b string").coalesce(1)
    df8 = spark.createDataFrame(edges, "doc_a string, doc_b string").repartition(8)
    r1 = sorted(map(tuple, connected_components(df1).collect()))
    r8 = sorted(map(tuple, connected_components(df8).collect()))
    assert r1 == r8
    assert len({c for _, c, _ in r1}) == 10
    assert all(s == 6 for _, _, s in r1)


def test_pagerank_star_graph_and_mass(spark):
    from kkbox_churn_prediction_spark.operators.components import pagerank

    # undirected star: hub h with leaves l1..l4 — replicate the exact
    # 3-round power iteration in python and require equality
    edges = spark.createDataFrame(
        [("h", f"l{i}") for i in range(1, 5)], ["src", "dst"]
    )
    out = {r["node"]: r["rank"] for r in pagerank(edges, iters=3).collect()}
    n, d = 5, 0.85
    ranks = {v: 1.0 / n for v in out}
    deg = {"h": 4, "l1": 1, "l2": 1, "l3": 1, "l4": 1}
    nbrs = {"h": [f"l{i}" for i in range(1, 5)]}
    for l in nbrs["h"]:
        nbrs[l] = ["h"]
    for _ in range(3):
        ranks = {
            v: (1 - d) / n + d * sum(ranks[u] / deg[u] for u in nbrs[v])
            for v in ranks
        }
    for v, expect in ranks.items():
        assert abs(out[v] - expect) < 1e-12, v
    assert abs(sum(out.values()) - 1.0) < 1e-12  # mass conserved
    assert out["h"] > out["l1"] and len(set(out[f"l{i}"] for i in range(1, 5))) == 1


def test_duplication_weights_soft_dedup(spark):
    from kkbox_churn_prediction_spark.operators.components import (
        connected_components,
        duplication_weights,
    )

    # cluster {a,b,c} via a~b, b~c; pair {d,e}; f,g are singletons
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e")], ["doc_a", "doc_b"]
    )
    docs = spark.createDataFrame(
        [(x,) for x in "abcdefg"], ["doc_id"]
    )
    comps = connected_components(edges, "doc_a", "doc_b")
    out = {
        r["doc_id"]: (r["component"], r["cluster_size"], r["weight"])
        for r in duplication_weights(docs, comps).collect()
    }
    assert len(out) == 7  # EVERY corpus doc, clustered or not
    for x in "abc":
        assert out[x] == ("a", 3, round(1 / 3, 6))
    for x in "de":
        assert out[x] == ("d", 2, 0.5)
    for x in "fg":
        assert out[x] == (x, 1, 1.0)  # singleton: own id, weight 1
    # the corpus' effective size = Σ weights = #clusters + #singletons
    # (weights ship rounded to 6dp, so the sum is off by ≤ n·5e-7)
    assert abs(sum(w for _, _, w in out.values()) - 4.0) < 1e-5


def test_jsd_from_bins_matches_hand_math(spark):
    from kkbox_churn_prediction_spark.operators.psi import jsd_from_bins

    # disjoint support → exactly 1 bit (the JSD maximum; PSI would
    # need the clip here, JSD is finite by construction)
    disj = spark.createDataFrame(
        [("ref", 0)] * 5 + [("cur", 1)] * 5, "fold string, bin int"
    )
    got = {r["fold"]: r["jsd"]
           for r in jsd_from_bins(disj, "fold", "bin", "ref").collect()}
    assert got == {"cur": 1.0}
    # identical distributions → 0
    same = spark.createDataFrame(
        [("ref", 0)] * 3 + [("ref", 1)] * 2
        + [("b", 0)] * 3 + [("b", 1)] * 2,
        "fold string, bin int",
    )
    z = {r["fold"]: r["jsd"]
         for r in jsd_from_bins(same, "fold", "bin", "ref").collect()}
    assert z == {"b": 0.0}
    # half-overlap: p=(.5,.5,0), q=(0,.5,.5) → per-side Σ = .5·log2(2)
    # = .5 each, (p-side + q-side)/2 = 0.5
    half = spark.createDataFrame(
        [("ref", 1)] * 2 + [("ref", 2)] * 2
        + [("cur", 0)] * 2 + [("cur", 1)] * 2,
        "fold string, bin int",
    )
    h = {r["fold"]: r["jsd"]
         for r in jsd_from_bins(half, "fold", "bin", "ref").collect()}
    assert h == {"cur": 0.5}


def test_gains_table_perfect_model(spark):
    from kkbox_churn_prediction_spark.operators.calibration import gains_table

    # perfect separation: top band all positive, rest all negative
    rows = [(0.95, 1)] * 10 + [(0.05, 0)] * 90
    preds = spark.createDataFrame(rows, "p double, y int")
    out = {r["band"]: r for r in gains_table(preds, "p", "y").collect()}
    assert out[9]["n_pos"] == 10 and out[9]["cum_capture"] == 1.0
    # top band holds 10% of rows and 100% of positives -> lift 10
    assert abs(out[9]["lift"] - 10.0) < 1e-9
    # the bottom band's cumulative view is the whole population: lift 1
    assert abs(out[0]["lift"] - 1.0) < 1e-9
    assert out[0]["cum_capture"] == 1.0


def test_gains_table_no_positives_null(spark):
    from kkbox_churn_prediction_spark.operators.calibration import gains_table

    preds = spark.createDataFrame([(0.4, 0), (0.8, 0)], "p double, y int")
    out = gains_table(preds, "p", "y").collect()
    assert all(r["cum_capture"] is None and r["lift"] is None for r in out)


def test_isotonic_apply_monotone_and_null(spark):
    from kkbox_churn_prediction_spark.operators.calibration import (
        isotonic_apply,
        isotonic_calibration,
    )

    rows = []
    # miscalibrated but monotone-ish: y rate rises with p
    import itertools

    for i, p in enumerate(itertools.chain(*[[0.1 + 0.2 * b] * 40 for b in range(5)])):
        rows.append(("a", float(p), 1 if (i * 7) % 10 < p * 10 else 0))
    preds = spark.createDataFrame(rows, "fold string, p double, y int")
    fit = isotonic_calibration(preds, "fold", "y", "p", n_bins=10)
    out = isotonic_apply(preds, fit, n_bins=10).collect()
    # every row got a calibrated score, and the map is monotone in p
    got = sorted({(r["p"], r["p_cal"]) for r in out})
    assert all(c is not None for _, c in got)
    assert all(a[1] <= b[1] for a, b in zip(got, got[1:]))
    # a score in a bin the fit never saw -> NULL calibrated value
    extra = spark.createDataFrame([("a", 0.9999, 1)], "fold string, p double, y int")
    holes = isotonic_apply(extra, fit, n_bins=10).collect()
    assert holes[0]["p_cal"] is None


def test_brier_decomposition_identity(spark):
    from kkbox_churn_prediction_spark.operators.calibration import (
        brier_decomposition,
        brier_logloss_by_fold,
    )

    # constant-probability-per-bin preds: the binned identity is exact
    rows = []
    for p, frac_pos, n in [(0.15, 0.2, 50), (0.45, 0.5, 50), (0.85, 0.8, 50)]:
        pos = int(n * frac_pos)
        rows += [("a", p, 1)] * pos + [("a", p, 0)] * (n - pos)
    preds = spark.createDataFrame(rows, "fold string, p double, y int")
    dec = brier_decomposition(preds, "y", "p", n_bins=10).collect()[0]
    brier = brier_logloss_by_fold(preds, "fold", "y", "p").collect()[0]["brier"]
    # with constant p in each bin, rel - res + unc == Brier exactly
    assert abs(dec["brier_binned"] - brier) < 2e-6
    assert dec["uncertainty"] == 0.25  # ybar = 0.5
    assert dec["resolution"] > 0 and dec["reliability"] > 0


def test_label_noise_screen_golden(spark):
    from kkbox_churn_prediction_spark.operators.calibration import (
        label_noise_screen,
    )

    rows = (
        [(0.95, 1)] * 8 + [(0.95, 0)] * 2      # 20% flips in the confident-pos region
        + [(0.05, 0)] * 9 + [(0.05, 1)] * 1    # 10% flips in the confident-neg region
        + [(0.5, 1)] * 5 + [(0.5, 0)] * 5      # unconfident: ignored
    )
    preds = spark.createDataFrame(rows, "p double, y int")
    r = label_noise_screen(preds, "y", "p").collect()[0]
    assert r["n_rows"] == 30
    assert r["n_conf_pos"] == 10 and r["n_pos_disagree"] == 2
    assert r["flip_rate_pos"] == 0.2
    assert r["n_conf_neg"] == 10 and r["flip_rate_neg"] == 0.1
    # empty confident region -> NULL rate
    mid = spark.createDataFrame([(0.5, 1)] * 4, "p double, y int")
    r2 = label_noise_screen(mid, "y", "p").collect()[0]
    assert r2["flip_rate_pos"] is None and r2["flip_rate_neg"] is None


def test_platt_calibration_binned_recovers_slope_and_is_monotone(spark):
    """platt_calibration (per-fold binned Newton fit): on data whose
    true calibration map is p' = sigmoid(2·logit(p)), the binned fit
    recovers a ≈ 2 per fold, the map is strictly monotone in bin, and
    (a, b) are constant within a fold."""
    from kkbox_churn_prediction_spark.operators.calibration import (
        platt_calibration,
    )

    rng = np.random.default_rng(47)
    n = 6000
    p = rng.uniform(0.02, 0.98, n)
    logit = np.log(p / (1 - p))
    y = (rng.uniform(0, 1, n) < 1 / (1 + np.exp(-2 * logit))).astype(int)
    fold = np.where(rng.uniform(0, 1, n) < 0.5, "a", "b")
    rows = [(float(p[i]), int(y[i]), str(fold[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "p double, y int, fold string")
    out = platt_calibration(df, "fold", "y", "p", n_bins=20).collect()
    assert len(out) == 40  # 2 folds × 20 bins (p spans all bins)
    for f in ("a", "b"):
        frows = sorted((r for r in out if r["fold"] == f), key=lambda r: r["bin"])
        a_vals = {r["a"] for r in frows}
        assert len(a_vals) == 1  # one fit per fold
        assert frows[0]["a"] == pytest.approx(2.0, abs=0.5)
        probs = [r["platt_prob"] for r in frows]
        assert all(q2 > q1 for q1, q2 in zip(probs, probs[1:]))
        assert all(0.0 < q < 1.0 for q in probs)


def test_platt_calibration_degenerate_single_bin_keeps_init(spark):
    """A fold whose probabilities all land in ONE bin has a singular
    Hessian in the slope direction — the det-guard must keep the
    (a=1, b=0) init instead of emitting NaN."""
    from kkbox_churn_prediction_spark.operators.calibration import (
        platt_calibration,
    )

    rows = [(0.525, i % 2, "only") for i in range(50)]
    df = spark.createDataFrame(rows, "p double, y int, fold string")
    out = platt_calibration(df, "fold", "y", "p", n_bins=20).collect()
    assert len(out) == 1
    r = out[0]
    assert math.isfinite(r["platt_prob"]) and math.isfinite(r["a"])


def test_platt_apply_matches_scalar_apply_and_is_monotone(spark):
    """platt_apply (fit-table broadcast) must equal apply_platt with
    the same fold's rounded (a, b) literals, and preserve order."""
    from kkbox_churn_prediction_spark.operators.calibration import (
        apply_platt,
        platt_apply,
        platt_calibration,
    )

    rng = np.random.default_rng(53)
    n = 2000
    p = rng.uniform(0.02, 0.98, n)
    logit = np.log(p / (1 - p))
    y = (rng.uniform(0, 1, n) < 1 / (1 + np.exp(-2 * logit))).astype(int)
    df = spark.createDataFrame(
        [(float(p[i]), int(y[i]), "all") for i in range(n)],
        "p double, y int, fold string",
    )
    fit = platt_calibration(df, "fold", "y", "p", n_bins=20)
    a, b = fit.select("a", "b").first()
    got = {
        r["p"]: r["p_platt"] for r in platt_apply(df, fit, "fold", "p").collect()
    }
    want = {
        r["p"]: round(r["p_calibrated"], 6)
        for r in apply_platt(df, "p", a, b).collect()
    }
    assert got == pytest.approx(want, abs=1e-9)
    ordered = [got[k] for k in sorted(got)]
    assert all(v2 >= v1 for v1, v2 in zip(ordered, ordered[1:]))


def test_error_by_segment_golden(spark):
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.calibration import (
        error_by_segment,
    )

    rows = [
        # band 0: two rows, one correct (y=0,p=0.4->pred 0 OK),
        # one wrong (y=1,p=0.45->pred 0)
        (0.40, 0), (0.45, 1),
        # band 1: one row, correct
        (0.90, 1),
    ]
    df = spark.createDataFrame(rows, "p double, y int")
    seg = F.when(F.col("p") < 0.5, F.lit(0)).otherwise(F.lit(1))
    out = {r["segment"]: r for r in error_by_segment(df, seg, "y", "p").collect()}
    b0 = out[0]
    assert b0["n_samples"] == 2 and b0["accuracy"] == 0.5
    assert b0["mean_pred"] == round((0.40 + 0.45) / 2, 6)
    assert b0["actual_rate"] == 0.5 and b0["error_rate"] == 0.5
    b1 = out[1]
    assert b1["n_samples"] == 1 and b1["accuracy"] == 1.0 and b1["error_rate"] == 0.0


def test_pagerank_driver_and_distributed_agree(spark):
    from kkbox_churn_prediction_spark.operators.components import pagerank

    # irregular undirected graph: two hubs, a chain, an isolated pair
    rows = (
        [("h1", f"a{i}") for i in range(6)]
        + [("h2", f"a{i}") for i in range(3, 9)]
        + [("a0", "a1"), ("c1", "c2"), ("c2", "c3"), ("p1", "p2")]
    )
    edges = spark.createDataFrame(rows, ["src", "dst"]).repartition(8)
    dd = {
        r["node"]: r["rank"]
        for r in pagerank(edges, iters=4, mode="driver").collect()
    }
    ds = {
        r["node"]: r["rank"]
        for r in pagerank(edges, iters=4, mode="distributed").collect()
    }
    assert set(dd) == set(ds)
    for k in dd:
        assert abs(dd[k] - ds[k]) < 1e-12, k
    assert abs(sum(dd.values()) - 1.0) < 1e-12

    # DIRECTED dropout semantics: a sink node receives rank but sends
    # none; a pure source drops out of the frame after round 1
    dedges = spark.createDataFrame(
        [("s", "m"), ("m", "t"), ("t", "m")], ["src", "dst"]
    )
    for it in (1, 2, 3):
        dr = sorted(
            (r["node"], round(r["rank"], 12))
            for r in pagerank(
                dedges, iters=it, undirected=False, mode="driver"
            ).collect()
        )
        sr = sorted(
            (r["node"], round(r["rank"], 12))
            for r in pagerank(
                dedges, iters=it, undirected=False, mode="distributed"
            ).collect()
        )
        assert dr == sr, it


def test_connected_components_driver_and_distributed_agree(spark):
    from kkbox_churn_prediction_spark.operators.components import (
        connected_components,
    )

    # blob + LONG chain (exercises pointer jumping) + self-loop + pair
    rows = (
        [("b0", f"b{i}") for i in range(1, 5)]
        + [(f"c{i}", f"c{i+1}") for i in range(12)]  # 13-node chain
        + [("z", "z"), ("p", "q")]
    )
    edges = spark.createDataFrame(rows, ["doc_a", "doc_b"]).repartition(8)
    dd = sorted(
        map(tuple, connected_components(edges, mode="driver").collect())
    )
    ds = sorted(
        map(tuple, connected_components(edges, mode="distributed").collect())
    )
    assert dd == ds and len(dd) == 5 + 13 + 1 + 2
    by_node = dict((n, (c, s)) for n, c, s in dd)
    assert by_node["c12"] == ("c0", 13)  # chain closed transitively
    assert by_node["z"] == ("z", 1)
    assert by_node["b3"] == ("b0", 5)
