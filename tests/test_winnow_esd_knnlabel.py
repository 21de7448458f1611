"""Round-3 continuation: winnowing fingerprints, generalized-ESD
extraction, kNN label consistency."""

from __future__ import annotations

import pytest

from kkbox_churn_prediction_spark.operators.robust import esd_topk_outliers
from kkbox_churn_prediction_spark.operators.similarity import (
    knn_label_consistency,
)
from kkbox_churn_prediction_spark.operators.textstats import (
    winnow_fingerprints,
    winnow_overlap_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------------------------------------- winnowing
def test_winnow_guarantee_shared_substring_shares_fp(spark):
    # the winnowing guarantee: any shared run of >= w + k - 1 = 12
    # chars yields at least one shared fingerprint
    shared = "this exact phrase is shared verbatim between docs"
    rows = [
        (1, "unique prefix one %s and a tail" % shared),
        (2, "other lead-in text %s closing words" % shared),
        (3, "nothing in common with those at all here"),
    ]
    fps = winnow_fingerprints(_docs(spark, rows)).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2], "shared substring must share a fingerprint"


def test_winnow_short_doc_single_fingerprint(spark):
    rows = [(1, "abcdefg")]  # 3 k-grams < window -> one min fingerprint
    fps = winnow_fingerprints(_docs(spark, rows)).collect()
    assert len(fps) == 1
    rows2 = [(1, "abc")]  # shorter than k -> nothing
    assert winnow_fingerprints(_docs(spark, rows2)).collect() == []


def test_winnow_overlap_stats_flags_duplicates(spark):
    base = " ".join(f"tok{(i * 7919) % 1000:03d}" for i in range(60))
    rows = [(1, base), (2, base), (3, "a wholly different set of words xyz")]
    stats = {
        r.doc_id: r
        for r in winnow_overlap_stats(
            winnow_fingerprints(_docs(spark, rows))
        ).collect()
    }
    assert stats[1].share_ratio == 1.0 and stats[2].share_ratio == 1.0
    assert stats[3].share_ratio == 0.0
    assert stats[1].n_fingerprints == stats[2].n_fingerprints


# ------------------------------------------------------------------- ESD
def test_esd_unmasks_two_outliers(spark):
    # two gross spikes: a one-shot z-screen is masked by the larger
    # one inflating the std; ESD removes and re-studentizes
    rows = [(i, 100 + (i % 7)) for i in range(60)]
    rows[10] = (10, 10000)
    rows[20] = (20, 9000)
    df = spark.createDataFrame(rows, "k int, v long")
    out = sorted(
        esd_topk_outliers(df, "k", "v", n_rounds=3).collect(),
        key=lambda r: r.round,
    )
    assert out[0].key == 10 and out[0].value == 10000
    assert out[1].key == 20 and out[1].value == 9000
    # round-2 z (after removing the 10000) must exceed round-1's
    # masked z for the 9000 point
    assert out[1].zscore > 3.0
    assert out[2].value < 9000  # third pick is an ordinary point


def test_esd_tiebreak_is_min_key(spark):
    rows = [(1, 5), (2, 5), (3, 5), (4, 50), (5, 50)]
    df = spark.createDataFrame(rows, "k int, v long")
    out = sorted(
        esd_topk_outliers(df, "k", "v", n_rounds=2).collect(),
        key=lambda r: r.round,
    )
    assert [r.key for r in out] == [4, 5]  # equal z -> smaller key first


# ----------------------------------------------------------- kNN labels
def test_knn_label_consistency_flags_mislabels(spark):
    # two tight clusters with consistent labels + one point in
    # cluster A carrying cluster B's label
    rows = []
    for i in range(6):
        rows.append((i, [1.0, 0.02 * i], 0))
    for i in range(6, 12):
        rows.append((i, [-1.0, 0.02 * i], 1))
    rows.append((99, [1.0, 0.05], 1))  # mislabeled: sits in cluster A
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {r.vec_id: r for r in knn_label_consistency(df, k=3, method="brute").collect()}
    assert out[99].suspect == 1 and out[99].n_match == 0
    clean = [r for i, r in out.items() if i < 6]
    # cluster-A points see the mislabel among neighbors at most once
    assert all(r.consistency >= 0.6 for r in clean)
    assert all(out[i].suspect == 0 for i in range(6, 12))
    assert all(r.n_k == 3 for r in out.values())


# ----------------------------------------------------------- epoch budget
def test_epoch_budget_small_source_saturates(spark):
    from kkbox_churn_prediction_spark.operators.sampling import (
        epoch_budget_plan,
    )

    rows = (
        [(i, "big " * 400, "big_src") for i in range(50)]
        + [(1000 + i, "tiny doc here", "tiny_src") for i in range(2)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.source: r for r in epoch_budget_plan(df).collect()}
    # even split: the tiny source hits the epoch cap with waste;
    # the big source is under-epoched but well-utilized
    assert out["tiny_src"].epochs == 16.0
    assert out["big_src"].epochs < 2.1
    assert out["big_src"].utilization > out["tiny_src"].utilization
    # effective tokens never exceed the geometric-series ceiling
    for r in out.values():
        assert r.effective_tokens <= r.unique_tokens / (1 - 0.71) + 1e-6


# --------------------------------------------------------- quantile trend
def test_quantile_trend_near_optimal_pinball(spark):
    from datetime import datetime, timedelta

    from kkbox_churn_prediction_spark.operators.windows import (
        quantile_trend_daily,
    )

    # 100 days, base 100 + 3/day with +200 spikes every 10th day.
    # NOTE the true tau=0.9 optimum here is NOT slope 3: the line
    # weaves under the spike band (grid optimum ~ (a=300, b=1.0),
    # loss 17.09) — assert near-optimality of the pinball loss, not
    # a guessed slope.
    base = datetime(2024, 1, 1)
    daily = [100 + 3 * t + (200 if (t * 13) % 10 == 0 else 0) for t in range(100)]
    rows = []
    for t, n in enumerate(daily):
        day = base + timedelta(days=t)
        rows.extend((f"c{t}", day + timedelta(seconds=s)) for s in range(n))
    df = spark.createDataFrame(rows, "conv_id string, ts timestamp")
    hi = quantile_trend_daily(df, tau=0.9).collect()[0]
    lo = quantile_trend_daily(df, tau=0.1).collect()[0]
    assert hi.n_days == 100 and hi.tau == 0.9

    def pinball(a, b, tau):
        s = 0.0
        for t, x in enumerate(daily):
            r = x - a - b * t
            s += tau * r if r > 0 else (tau - 1.0) * r
        return s / len(daily)

    # grid optimum for this fixture (verified offline): ~17.09
    grid_best = min(
        pinball(a, b / 100.0, 0.9)
        for b in range(50, 350, 5)
        for a in range(50, 400, 10)
    )
    assert hi.pinball_loss <= grid_best * 1.05  # within 5% of optimal
    assert abs(hi.pinball_loss - pinball(hi.intercept, hi.slope, 0.9)) < 1e-4
    # the tau=0.9 line sits above the tau=0.1 line at mid-series
    mid = 50
    assert hi.intercept + hi.slope * mid > lo.intercept + lo.slope * mid
    # coverage: most days at or below the upper-band line
    below = sum(
        1 for t, x in enumerate(daily) if x <= hi.intercept + hi.slope * t
    )
    assert below >= 75


# ------------------------------------------------------------- modularity
def test_modularity_two_cliques_vs_random_partition(spark):
    from kkbox_churn_prediction_spark.operators.components import modularity

    # two disjoint triangles: perfect partition -> Q = 1/2 exactly
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)],
        "doc_a long, doc_b long",
    )
    good = spark.createDataFrame(
        [(n, 0 if n <= 3 else 1) for n in range(1, 7)], "node long, community long"
    )
    r = modularity(edges, good, community_col="community").collect()[0]
    assert r.modularity == pytest.approx(0.5, abs=1e-9)
    assert r.n_nodes == 6 and r.n_edges == 6 and r.n_communities == 2
    # mixed partition scores strictly worse
    bad = spark.createDataFrame(
        [(n, n % 2) for n in range(1, 7)], "node long, community long"
    )
    rb = modularity(edges, bad, community_col="community").collect()[0]
    assert rb.modularity < r.modularity


def test_modularity_single_community_is_zero(spark):
    from kkbox_churn_prediction_spark.operators.components import modularity

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "doc_a long, doc_b long"
    )
    one = spark.createDataFrame([(n, 7) for n in (1, 2, 3)], "node long, community long")
    r = modularity(edges, one, community_col="community").collect()[0]
    assert r.modularity == pytest.approx(0.0, abs=1e-9)


# ------------------------------------------------------------ ngram novelty
def test_ngram_novelty_separates_copies_from_originals(spark):
    from kkbox_churn_prediction_spark.operators.textstats import ngram_novelty

    base = " ".join(f"w{(i * 37) % 500}" for i in range(50))
    uniq = " ".join(f"u{(i * 41) % 500} only here" for i in range(20))
    rows = [(1, base), (2, base), (3, uniq)]
    out = {r.doc_id: r for r in ngram_novelty(_docs(spark, rows), n=3).collect()}
    assert out[1].novelty == 0.0 and out[2].novelty == 0.0  # exact copies
    assert out[3].novelty > 0.9  # original text
    rows2 = [(1, "a b")]  # < n tokens -> absent
    assert ngram_novelty(_docs(spark, rows2), n=3).collect() == []


# ------------------------------------------------------- deletion cascade
def test_deletion_cascade_reaches_linked_rows_only(spark):
    from kkbox_churn_prediction_spark.operators.privacy import (
        deletion_cascade_audit,
    )

    users = spark.createDataFrame([(i,) for i in range(10)], "uid long")
    orders = spark.createDataFrame(
        [(100 + i, i % 10) for i in range(30)], "oid long, uid long"
    )
    items = spark.createDataFrame(
        [(1000 + i, 100 + i % 30) for i in range(90)], "iid long, oid long"
    )
    dele = spark.createDataFrame([(3,), (7,)], "key long")
    out = {
        r.table: r
        for r in deletion_cascade_audit(
            {"users": users, "orders": orders, "items": items},
            dele,
            [("orders", "uid", "users", "uid"), ("items", "oid", "orders", "oid")],
            root_table="users",
            root_key="uid",
        ).collect()
    }
    assert out["users"].rows_affected == 2
    assert out["orders"].rows_affected == 6  # 3 orders per user
    assert out["items"].rows_affected == 18  # 3 items per order
    assert out["items"].share == 0.2
    # a table with no path from the root reports 0 affected
    out2 = deletion_cascade_audit(
        {"users": users, "lonely": items},
        dele,
        [],
        root_table="users",
        root_key="uid",
    ).collect()
    lon = [r for r in out2 if r.table == "lonely"][0]
    assert lon.rows_affected == 0 and lon.share == 0.0


def test_winnow_arrow_and_sql_impls_identical(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 4),
        (2, "abcd"),          # shorter than k -> nothing
        (3, "abcde"),         # exactly one k-gram -> single min
        (4, "répété café 日本語テキスト mixed unicode winnow " * 3),
        (5, ""),
    ]
    d = _docs(spark, rows)
    a = winnow_fingerprints(d, k=5, window=8, impl="arrow")
    s = winnow_fingerprints(d, k=5, window=8, impl="sql")
    assert a.exceptAll(s).count() == 0
    assert s.exceptAll(a).count() == 0


def test_quantile_trend_driver_and_distributed_identical(spark):
    from datetime import datetime, timedelta

    from kkbox_churn_prediction_spark.operators.windows import (
        quantile_trend_daily,
    )

    base = datetime(2024, 1, 1)
    daily = [100 + 3 * t + (200 if (t * 13) % 10 == 0 else 0) for t in range(60)]
    rows = []
    for t, n in enumerate(daily):
        day = base + timedelta(days=t)
        rows.extend((f"c{t}", day + timedelta(seconds=s)) for s in range(n))
    df = spark.createDataFrame(rows, "conv_id string, ts timestamp")
    for tau in (0.9, 0.5, 0.1):
        d = quantile_trend_daily(df, tau=tau, mode="driver").collect()
        s = quantile_trend_daily(df, tau=tau, mode="distributed").collect()
        assert list(map(tuple, d)) == list(map(tuple, s))
    # auto with a tiny day budget falls back to the distributed path
    a = quantile_trend_daily(df, tau=0.9, mode="auto", max_driver_days=3).collect()
    s = quantile_trend_daily(df, tau=0.9, mode="distributed").collect()
    assert list(map(tuple, a)) == list(map(tuple, s))
