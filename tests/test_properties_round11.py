"""Algebraic invariants for the round-3 session-3 operator batch."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F


# ----------------------------------------------------------------- CvM
def test_cvm_replication_invariance(spark):
    """Replicating BOTH samples k x leaves the CvM criterion unchanged
    (it is a functional of the two empirical CDFs and the pooled
    weights, all ratio-valued)."""
    from kkbox_churn_prediction_spark.operators.psi import cvm_from_bins

    cur, ref = [3, 7, 2, 8], [6, 1, 9, 4]
    def build(k):
        rows = []
        for b, n in enumerate(cur):
            rows += [("odd", b)] * (n * k)
        for b, n in enumerate(ref):
            rows += [("even", b)] * (n * k)
        return spark.createDataFrame(rows, "fold string, bin int")

    one = cvm_from_bins(build(1), "fold", "bin", "even").collect()[0]["cvm"]
    three = cvm_from_bins(build(3), "fold", "bin", "even").collect()[0]["cvm"]
    assert one == pytest.approx(three, abs=2e-6)


# ------------------------------------------------------------------ AP
def test_ap_invariant_under_monotone_score_transform(spark):
    """AP depends only on the ORDERING of distinct scores; any strictly
    increasing transform leaves it unchanged."""
    from kkbox_churn_prediction_spark.operators.calibration import (
        average_precision_by_fold,
    )

    rows = [("a", (i * 7) % 3 == 0, (i + 0.5) / 16.0) for i in range(16)]
    df = spark.createDataFrame(
        [(f, int(y), p) for f, y, p in rows], "fold string, y int, p double"
    )
    base = average_precision_by_fold(df, "fold", "y", "p").collect()[0]["ap"]
    warped = df.select("fold", "y", (F.col("p") * F.col("p") * 10.0).alias("p"))
    warp = average_precision_by_fold(warped, "fold", "y", "p").collect()[0]["ap"]
    assert base == pytest.approx(warp, abs=2e-6)


# ----------------------------------------------------------------- MRR
def test_mrr_perfect_retrieval_is_one(spark):
    from kkbox_churn_prediction_spark.operators.similarity import mrr_at_k

    exact = spark.createDataFrame(
        [(q, f"n{q}_{r}", r) for q in range(4) for r in range(1, 6)],
        "query_id int, neighbor_id string, rank int",
    )
    got = mrr_at_k(exact, exact, k=5).collect()
    assert all(r["rr"] == 1.0 and r["first_hit_rank"] == 1 for r in got)


# ---------------------------------------------------------------- Qini
def test_qini_control_scale_invariance_of_rate_gap(spark):
    """Duplicating every control unit (same response rates) leaves
    uplift_rate_gap unchanged and exactly doubles the qini count
    column's control expectation."""
    from kkbox_churn_prediction_spark.operators.calibration import qini_curve

    base_rows = []
    for i in range(12):
        base_rows.append(("t", 1 if i % 3 == 0 else 0, (i % 4) / 4.0))
        base_rows.append(("c", 1 if i % 4 == 0 else 0, (i % 4) / 4.0))
    df1 = spark.createDataFrame(base_rows, "arm string, y int, p double")
    dup = base_rows + [r for r in base_rows if r[0] == "c"]
    df2 = spark.createDataFrame(dup, "arm string, y int, p double")
    g1 = {r["decile"]: r for r in qini_curve(df1, "arm", "y", "p", n_bins=4).collect()}
    g2 = {r["decile"]: r for r in qini_curve(df2, "arm", "y", "p", n_bins=4).collect()}
    # deciles shift with N; compare the full-depth row (max decile)
    d1, d2 = g1[max(g1)], g2[max(g2)]
    assert d1["uplift_rate_gap"] == pytest.approx(d2["uplift_rate_gap"], abs=1e-6)
    assert d1["qini"] == pytest.approx(d2["qini"], abs=1e-6)


# ----------------------------------------------------------------- ICC
def test_icc_location_and_scale_invariance(spark):
    from kkbox_churn_prediction_spark.operators.association import icc_oneway

    groups = [[10, 12, 11, 14], [30, 29, 31], [22, 25, 24, 23, 26]]
    rows = [(f"g{i}", v) for i, g in enumerate(groups) for v in g]
    df = spark.createDataFrame(rows, "g string, v int")
    base = icc_oneway(df, "g", "v").collect()[0]["icc"]
    shifted = icc_oneway(
        df.select("g", (F.col("v") + 1000).alias("v")), "g", "v"
    ).collect()[0]["icc"]
    scaled = icc_oneway(
        df.select("g", (F.col("v") * 7).alias("v")), "g", "v"
    ).collect()[0]["icc"]
    assert base == pytest.approx(shifted, abs=1e-5)
    assert base == pytest.approx(scaled, abs=1e-5)


# ----------------------------------------------------------------- BPE
def test_bpe_merge_frequencies_non_increasing(spark):
    """Every pair in the merged alphabet maps to an n-gram of the
    previous alphabet with count <= the previous max, so the greedy
    merge frequencies are non-increasing in rank."""
    from kkbox_churn_prediction_spark.operators.textstats import bpe_train_merges

    wf = {"banana": 7, "bandana": 3, "ananas": 5, "cabana": 2, "nab": 4}
    docs = spark.createDataFrame(
        [(" ".join([w] * f),) for w, f in wf.items()], "text string"
    )
    counts = [
        r["pair_count"]
        for r in bpe_train_merges(docs, n_merges=6).orderBy("merge_rank").collect()
    ]
    assert counts == sorted(counts, reverse=True)


# ---------------------------------------------------------- silhouette
def test_silhouette_bounded_and_translation_invariant(spark):
    from kkbox_churn_prediction_spark.operators.similarity import (
        silhouette_by_label,
    )

    rows = [
        (i, [float(i % 3), float(i % 5), 1.0, 0.0], i % 2) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = silhouette_by_label(df).collect()
    for r in got:
        assert -1.0 <= r["mean_silhouette"] <= 1.0
    shifted = spark.createDataFrame(
        [(i, [v + 100.0 for v in e], l) for i, e, l in rows],
        "vec_id long, embedding array<float>, label int",
    )
    got2 = {r["label"]: r for r in silhouette_by_label(shifted).collect()}
    for r in got:
        assert r["mean_silhouette"] == pytest.approx(
            got2[r["label"]]["mean_silhouette"], abs=5e-5
        )


# --------------------------------------------------------------- Hurst
def test_hurst_translation_invariance(spark):
    """R/S works on mean-centered cumulative deviations, so adding a
    constant daily offset leaves every segment's R/S unchanged."""
    from kkbox_churn_prediction_spark.operators.windows import hurst_daily

    t0 = datetime(2024, 1, 1)
    xs = [(i * 31) % 11 + 2 for i in range(40)]

    def build(offset):
        rows = [
            (f"c{d}_{j}", t0 + timedelta(days=d, minutes=j))
            for d, c in enumerate(xs)
            for j in range(c + offset)
        ]
        return spark.createDataFrame(rows, "conv_id string, ts timestamp")

    a = {r["m"]: r["mean_rs"] for r in hurst_daily(build(0)).collect()}
    b = {r["m"]: r["mean_rs"] for r in hurst_daily(build(50)).collect()}
    for m in a:
        assert a[m] == pytest.approx(b[m], abs=5e-6)


# ----------------------------------------------------- tool attribution
def test_attribution_shares_sum_to_one(spark):
    from kkbox_churn_prediction_spark.operators.funnel import tool_attribution

    t0 = datetime(2024, 7, 1)
    rows = []
    seqs = [["a", "b", "buy"], ["b", "buy"], ["c", "a", "buy"], ["a", "buy"]]
    for c, seq in enumerate(seqs):
        for i, tool in enumerate(seq):
            rows.append((f"c{c}", i, "tool", None, tool, t0 + timedelta(minutes=i)))
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    got = tool_attribution(df, conversion_tool="buy").collect()
    assert sum(r["share_first"] for r in got) == pytest.approx(1.0, abs=1e-6)
    assert sum(r["share_last"] for r in got) == pytest.approx(1.0, abs=1e-6)
    assert sum(r["first_touch"] for r in got) == sum(r["last_touch"] for r in got)


# ----------------------------------------------- contiguity permutation
def test_contiguity_partition_invariance(spark):
    from kkbox_churn_prediction_spark.operators.profile import (
        turn_contiguity_audit,
    )

    t0 = datetime(2024, 5, 1)
    rows = [
        (f"c{c}", i, t0 + timedelta(minutes=i)) for c in range(8) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp")
    a = turn_contiguity_audit(df).collect()[0]
    b = turn_contiguity_audit(df.repartition(7)).collect()[0]
    assert a == b
