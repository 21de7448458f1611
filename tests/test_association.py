"""MI / chi-square association stats vs closed-form references."""

from __future__ import annotations

import math


def test_perfect_dependence(spark):
    from kkbox_churn_prediction_spark.operators.association import (
        chi_square,
        mutual_information,
    )

    rows = [("a", "x")] * 5 + [("b", "y")] * 5
    df = spark.createDataFrame(rows, ["u", "v"])
    mi = mutual_information(df, "u", "v").first()
    assert abs(mi["mi"] - 1.0) < 1e-12  # H = 1 bit, fully shared
    assert abs(mi["nmi"] - 1.0) < 1e-12
    ch = chi_square(df, "u", "v").first()
    assert abs(ch["chi2"] - 10.0) < 1e-9  # n * (2-1) for perfect 2x2
    assert ch["dof"] == 1 and abs(ch["cramers_v"] - 1.0) < 1e-12


def test_independence_is_zero(spark):
    from kkbox_churn_prediction_spark.operators.association import (
        chi_square,
        mutual_information,
    )

    rows = [(u, v) for u in "ab" for v in "xy" for _ in range(3)]
    df = spark.createDataFrame(rows, ["u", "v"])
    mi = mutual_information(df, "u", "v").first()
    assert abs(mi["mi"]) < 1e-12 and mi["nmi"] == 0.0 or abs(mi["nmi"]) < 1e-12
    ch = chi_square(df, "u", "v").first()
    assert abs(ch["chi2"]) < 1e-9 and abs(ch["cramers_v"]) < 1e-9


def test_mi_matches_direct_formula(spark):
    from kkbox_churn_prediction_spark.operators.association import mutual_information

    counts = {("a", "x"): 4, ("a", "y"): 1, ("b", "x"): 2, ("b", "y"): 3}
    rows = [kv for kv, c in counts.items() for _ in range(c)]
    df = spark.createDataFrame(rows, ["u", "v"])
    got = mutual_information(df, "u", "v").first()

    n = sum(counts.values())
    px = {u: sum(c for (a, _), c in counts.items() if a == u) / n for u in "ab"}
    py = {v: sum(c for (_, b), c in counts.items() if b == v) / n for v in "xy"}
    want = sum(
        (c / n) * math.log2((c / n) / (px[u] * py[v]))
        for (u, v), c in counts.items()
    )
    assert abs(got["mi"] - want) < 1e-12
    hx = -sum(p * math.log2(p) for p in px.values())
    assert abs(got["h_x"] - hx) < 1e-12
    assert abs(got["nmi"] - want / min(hx, got["h_y"])) < 1e-12


def test_chi2_sparse_cells_algebraic(spark):
    """Missing (observed-zero) cells are handled by the closed form —
    compare against the dense-grid chi-square computed in Python."""
    from kkbox_churn_prediction_spark.operators.association import chi_square

    counts = {("a", "x"): 6, ("b", "y"): 2, ("b", "x"): 2}  # (a,y) empty
    rows = [kv for kv, c in counts.items() for _ in range(c)]
    df = spark.createDataFrame(rows, ["u", "v"])
    got = chi_square(df, "u", "v").first()

    n = sum(counts.values())
    nx = {"a": 6, "b": 4}
    ny = {"x": 8, "y": 2}
    want = 0.0
    for u in "ab":
        for v in "xy":
            e = nx[u] * ny[v] / n
            o = counts.get((u, v), 0)
            want += (o - e) ** 2 / e
    assert abs(got["chi2"] - want) < 1e-9


def test_constant_column(spark):
    from kkbox_churn_prediction_spark.operators.association import (
        chi_square,
        mutual_information,
    )

    df = spark.createDataFrame([("k", v) for v in "xyxy"], ["u", "v"])
    mi = mutual_information(df, "u", "v").first()
    assert abs(mi["mi"]) < 1e-12 and mi["nmi"] == 0.0
    ch = chi_square(df, "u", "v").first()
    assert ch["cramers_v"] == 0.0 and ch["dof"] == 0


def test_correlation_matrix_matches_numpy(spark):
    import numpy as np
    import pandas as pd

    from kkbox_churn_prediction_spark.operators.association import correlation_matrix

    rng = np.random.default_rng(7)
    pdf = pd.DataFrame({"a": rng.normal(size=80)})
    pdf["b"] = pdf.a * 3 + rng.normal(size=80) * 0.2
    pdf["c"] = rng.normal(size=80)
    out = {(r["feature_a"], r["feature_b"]): r["pearson_r"]
           for r in correlation_matrix(spark.createDataFrame(pdf), ["a", "b", "c"]).collect()}
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    cm = np.corrcoef(pdf[["a", "b", "c"]].to_numpy().T)
    assert out[("a", "b")] == round(float(cm[0, 1]), 6)
    assert out[("a", "c")] == round(float(cm[0, 2]), 6)
    assert out[("b", "c")] == round(float(cm[1, 2]), 6)
    # one-pass contract: a single aggregate (no per-pair jobs/joins)
    plan = correlation_matrix(
        spark.createDataFrame(pdf), ["a", "b", "c"]
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Join") == 0


def test_cooccurrence_lift_matches_hand_counts(spark):
    from kkbox_churn_prediction_spark.operators.association import cooccurrence_lift

    # baskets: {a,b} x3, {a,c} x1, {b} x1, {c} x1  → N=6 groups
    rows = []
    for g, items in enumerate([["a", "b"], ["a", "b"], ["a", "b"],
                               ["a", "c"], ["b"], ["c"]]):
        rows += [(g, i) for i in items] + [(g, i) for i in items]  # dups collapse
    df = spark.createDataFrame(rows, "g long, item string")
    got = {(r["item_a"], r["item_b"]): r
           for r in cooccurrence_lift(df, "g", "item", min_support=1).collect()}
    ab = got[("a", "b")]
    assert ab["n_both"] == 3 and ab["n_a"] == 4 and ab["n_b"] == 4
    assert ab["lift"] == round(3 * 6 / (4 * 4), 6)    # 1.125 > 1: associated
    ac = got[("a", "c")]
    assert ac["n_both"] == 1 and ac["lift"] == round(1 * 6 / (4 * 2), 6)  # 0.75
    assert ("b", "c") not in got                       # never co-occur
    # min_support prunes
    assert set(cooccurrence_lift(df, "g", "item", min_support=2).toPandas()
               .apply(lambda r: (r.item_a, r.item_b), axis=1)) == {("a", "b")}


def test_cohens_kappa_textbook(spark):
    from kkbox_churn_prediction_spark.operators.association import cohens_kappa

    # classic 2x2: [[20, 5], [10, 15]] → po=0.7, pe=0.5, kappa=0.4
    rows = (
        [("y", "y")] * 20 + [("y", "n")] * 5 + [("n", "y")] * 10 + [("n", "n")] * 15
    )
    df = spark.createDataFrame(rows, ["a", "b"])
    r = cohens_kappa(df, "a", "b").first()
    assert r["n"] == 50
    assert abs(r["po"] - 0.7) < 1e-9
    assert abs(r["pe"] - 0.5) < 1e-9
    assert abs(r["kappa"] - 0.4) < 1e-9


def test_cohens_kappa_perfect_disagreement(spark):
    from kkbox_churn_prediction_spark.operators.association import cohens_kappa

    rows = [("y", "n")] * 5 + [("n", "y")] * 5
    df = spark.createDataFrame(rows, ["a", "b"])
    r = cohens_kappa(df, "a", "b").first()
    assert r["po"] == 0.0 and abs(r["pe"] - 0.5) < 1e-9
    assert abs(r["kappa"] - (-1.0)) < 1e-9


def test_cohens_kappa_degenerate_constant_raters(spark):
    from kkbox_churn_prediction_spark.operators.association import cohens_kappa

    # both raters constant and equal: pe = 1 → kappa 0 by convention
    df = spark.createDataFrame([("y", "y")] * 8, ["a", "b"])
    r = cohens_kappa(df, "a", "b").first()
    assert r["po"] == 1.0 and r["pe"] == 1.0 and r["kappa"] == 0.0

    # disjoint label sets: agreement 0, chance 0 → kappa 0
    dj = spark.createDataFrame([("y", "x")] * 4, ["a", "b"])
    r2 = cohens_kappa(dj, "a", "b").first()
    assert r2["po"] == 0.0 and r2["pe"] == 0.0 and r2["kappa"] == 0.0


class TestSpearman:
    def test_monotone_nonlinear_is_one(self, spark):
        from kkbox_churn_prediction_spark.operators.association import spearman_corr

        # y = x³: nonlinear but perfectly monotone -> spearman 1
        rows = [(x, x ** 3) for x in range(1, 11)]
        df = spark.createDataFrame(rows, "x long, y long")
        r = spearman_corr(df, "x", "y").collect()[0]
        assert r["spearman"] == 1.0 and r["n"] == 10
        # reversed -> -1
        rev = spark.createDataFrame([(x, -(x ** 3)) for x in range(1, 11)], "x long, y long")
        assert spearman_corr(rev, "x", "y").collect()[0]["spearman"] == -1.0

    def test_ties_match_scipy_convention(self, spark):
        from kkbox_churn_prediction_spark.operators.association import spearman_corr

        # hand check with ties: x=[1,1,2,3], y=[10,20,20,30]
        # rank_x = [1.5,1.5,3,4], rank_y = [1,2.5,2.5,4]
        import numpy as np

        xs = [1, 1, 2, 3]
        ys = [10, 20, 20, 30]
        rank_x = np.array([1.5, 1.5, 3, 4])
        rank_y = np.array([1, 2.5, 2.5, 4])
        expected = np.corrcoef(rank_x, rank_y)[0, 1]
        df = spark.createDataFrame(list(zip(xs, ys)), "x long, y long")
        r = spearman_corr(df, "x", "y").collect()[0]
        assert r["spearman"] == round(float(expected), 6)

    def test_constant_column_zero(self, spark):
        from kkbox_churn_prediction_spark.operators.association import spearman_corr

        df = spark.createDataFrame([(1, 5), (2, 5), (3, 5)], "x long, y long")
        assert spearman_corr(df, "x", "y").collect()[0]["spearman"] == 0.0
