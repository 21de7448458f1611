"""Deterministic sampling: partition invariance, rate accuracy,
stratum rates, salt redraw."""

from __future__ import annotations

from pyspark.sql import functions as F


def _ids(spark, n=20000, parts=1):
    return spark.range(n).repartition(parts).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "web").otherwise("books").alias("source"),
    )


def test_partition_invariant_and_rerun_stable(spark):
    from kkbox_churn_prediction_spark.operators.sampling import deterministic_sample

    a = {r["doc_id"] for r in deterministic_sample(_ids(spark, parts=1), "doc_id", 0.3).collect()}
    b = {r["doc_id"] for r in deterministic_sample(_ids(spark, parts=13), "doc_id", 0.3).collect()}
    assert a == b  # same rows regardless of partitioning
    # and a rerun re-selects the identical set
    c = {r["doc_id"] for r in deterministic_sample(_ids(spark, parts=7), "doc_id", 0.3).collect()}
    assert a == c


def test_rate_accuracy_and_salt_redraw(spark):
    from kkbox_churn_prediction_spark.operators.sampling import deterministic_sample

    df = _ids(spark)
    n = df.count()
    kept = deterministic_sample(df, "doc_id", 0.3).count()
    assert abs(kept / n - 0.3) < 0.02
    other = {r["doc_id"] for r in deterministic_sample(df, "doc_id", 0.3, salt="v2").collect()}
    base = {r["doc_id"] for r in deterministic_sample(df, "doc_id", 0.3).collect()}
    overlap = len(base & other) / len(base)
    assert 0.2 < overlap < 0.4  # independent draws overlap ≈ rate


def test_stratified_rates(spark):
    from kkbox_churn_prediction_spark.operators.sampling import stratified_sample

    df = _ids(spark)
    out = (
        stratified_sample(df, "source", {"web": 0.1, "books": 1.0}, "doc_id")
        .groupBy("source")
        .count()
        .collect()
    )
    got = {r["source"]: r["count"] for r in out}
    assert got["books"] == 10000  # rate 1.0 keeps everything
    assert abs(got["web"] / 10000 - 0.1) < 0.02


def test_capped_per_group(spark):
    from kkbox_churn_prediction_spark.operators.sampling import capped_per_group

    df = _ids(spark, n=1000)
    out = capped_per_group(df, "source", 7, "doc_id")
    counts = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    assert counts == {"web": 7, "books": 7}
    # deterministic: same rows on rerun and under different partitioning
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in capped_per_group(_ids(spark, n=1000, parts=9), "source", 7, "doc_id").collect()
    )
    assert a == b
    # uniform draw, not head-of-scan: kept ids are spread across range
    assert max(a) > 500


def test_subsample_nesting(spark):
    """A lower-rate sample with the same salt is a SUBSET of a
    higher-rate one (threshold monotonicity) — lets pipelines carve
    nested train/dev corpora without re-reading."""
    from kkbox_churn_prediction_spark.operators.sampling import deterministic_sample

    df = _ids(spark, n=5000)
    small = {r["doc_id"] for r in deterministic_sample(df, "doc_id", 0.1).collect()}
    big = {r["doc_id"] for r in deterministic_sample(df, "doc_id", 0.5).collect()}
    assert small <= big


def test_mixture_rates_natural_and_equalized():
    from kkbox_churn_prediction_spark.operators.sampling import mixture_rates

    counts = {"web": 80000, "books": 15000, "code": 5000}
    # T=1: natural proportions — every stratum sampled at the same rate
    r1 = mixture_rates(counts, target_rows=10000, temperature=1.0)
    assert abs(r1["web"] - r1["books"]) < 1e-9 and abs(r1["web"] - r1["code"]) < 1e-9
    exp_total = sum(r1[s] * counts[s] for s in counts)
    assert abs(exp_total - 10000) < 1.0
    # high T: equalized shares — small strata sampled at higher rates
    rT = mixture_rates(counts, target_rows=10000, temperature=100.0)
    assert rT["code"] > rT["books"] > rT["web"]
    assert abs(sum(rT[s] * counts[s] for s in counts) - 10000) < 1.0
    # clamping: target above a small stratum's capacity caps at 1.0
    rC = mixture_rates(counts, target_rows=90000, temperature=100.0)
    assert rC["code"] == 1.0 and rC["books"] == 1.0
    assert abs(sum(rC[s] * counts[s] for s in counts) - 90000) < 1.0
    assert rC["web"] <= 1.0


def test_weighted_sample_prefers_heavy_rows(spark):
    from kkbox_churn_prediction_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    # 100 light rows (w=1) + 10 heavy rows (w=50) per group: a k=5
    # weight-proportional draw should pick mostly heavy rows
    rows = [(i, "g", 1) for i in range(100)] + [(100 + i, "g", 50) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, w long")
    got = weighted_sample_per_group(df, "grp", 5, "doc_id", "w").collect()
    assert len(got) == 5
    heavy = sum(1 for r in got if r["doc_id"] >= 100)
    assert heavy >= 3  # heavy mass ~83% of total weight
    # deterministic under repartitioning
    a = sorted(r["doc_id"] for r in got)
    b = sorted(
        r["doc_id"]
        for r in weighted_sample_per_group(
            df.repartition(7), "grp", 5, "doc_id", "w"
        ).collect()
    )
    assert a == b
    # zero-weight rows never selected even at k >= group size
    z = spark.createDataFrame(
        [(1, "g", 0), (2, "g", 5), (3, "g", 5)], "doc_id long, grp string, w long"
    )
    picked = {r["doc_id"] for r in weighted_sample_per_group(z, "grp", 3, "doc_id", "w").collect()}
    assert 1 in picked  # k covers the whole group; zero-weight ranks LAST
    first_two = {
        r["doc_id"]
        for r in weighted_sample_per_group(z, "grp", 2, "doc_id", "w").collect()
    }
    assert first_two == {2, 3}


def _scored(spark):
    # two sources, quality with ties, deterministic tokens
    rows = []
    for i in range(40):
        src = "a" if i < 20 else "b"
        rows.append((i, src, (i % 4) / 4.0, 10 + (i % 7)))
    return spark.createDataFrame(
        rows, "doc_id long, source string, quality_score double, n_tokens long"
    )


def test_token_budget_select_greedy_fill(spark):
    from kkbox_churn_prediction_spark.operators.sampling import token_budget_select

    out = token_budget_select(_scored(spark), 60).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: (-r["quality_score"], r["doc_id"]))
        # predecessor mass under budget for every kept row; boundary row kept
        cum = 0
        for r in rs:
            assert cum < 60
            cum += r["n_tokens"]
            assert r["cum_tokens"] == sum(
                x["n_tokens"] for x in rs if (-x["quality_score"], x["doc_id"]) <= (-r["quality_score"], r["doc_id"])
            )
        # total reaches the budget (supply is ample in the fixture)
        assert cum >= 60
        # quality-downward-closed vs the full frame: no dropped doc of the
        # same source outranks a kept one
        kept_keys = {(r["doc_id"]) for r in rs}
        full = [
            x
            for x in _scored(spark).collect()
            if x["source"] == src and x["doc_id"] not in kept_keys
        ]
        worst_kept = min((r["quality_score"], -r["doc_id"]) for r in rs)
        for x in full:
            assert (x["quality_score"], -x["doc_id"]) <= worst_kept


def test_token_budget_threshold_brackets_exact(spark):
    from kkbox_churn_prediction_spark.operators.sampling import (
        token_budget_select,
        token_budget_threshold,
    )

    df = _scored(spark)
    budget = 60
    thr = token_budget_threshold(df, budget, n_buckets=8)
    rows = thr.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    exact = token_budget_select(df, budget).collect()
    exact_by_src = {}
    for r in exact:
        exact_by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        got = sum(r["n_tokens"] for r in rs)
        # covers the budget whenever the source has the supply
        assert got >= budget
        # selection is downward-closed in quality (bucket granularity):
        # every kept doc's quality >= every dropped doc's quality minus
        # one bucket width is guaranteed by construction; assert the
        # stronger invariant that minimum kept quality >= minimum
        # exact-kept quality (threshold can only widen at the boundary)
        min_thr = min(r["quality_score"] for r in rs)
        min_exact = min(r["quality_score"] for r in exact_by_src[src])
        assert min_thr <= min_exact + 1e-9
        # and the threshold keep-set contains every exact keep of
        # strictly higher quality than the threshold floor
        thr_ids = {r["doc_id"] for r in rs}
        for e in exact_by_src[src]:
            if e["quality_score"] > min_thr:
                assert e["doc_id"] in thr_ids


def test_token_budget_threshold_no_window(spark):
    from kkbox_churn_prediction_spark.operators.sampling import token_budget_threshold

    plan = token_budget_threshold(
        _scored(spark), 60, n_buckets=8
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # sort-free scale path


def _skewed_vals(spark, parts=4):
    # value ~ bin index: bin b has (b+1)*100 rows (heavily skewed up)
    rows = []
    i = 0
    for b in range(4):
        for _ in range((b + 1) * 100):
            rows.append((i, b * 10 + 5.0))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, v double").repartition(parts)


def test_distribution_match_uniformizes(spark):
    from kkbox_churn_prediction_spark.operators.sampling import (
        distribution_match_sample,
    )

    out = distribution_match_sample(
        _skewed_vals(spark), "v", [1.0] * 4, width=10
    ).collect()
    by_bin = {}
    for r in out:
        by_bin[r["bin"]] = by_bin.get(r["bin"], 0) + 1
    # scarcest-relative bin (0: 100 rows) keeps everything
    assert by_bin[0] == 100
    # every bin's kept count matches the target shape within hash noise
    for b in range(1, 4):
        assert abs(by_bin[b] - 100) <= 25
    # deterministic under partitioning
    again = distribution_match_sample(
        _skewed_vals(spark, parts=13), "v", [1.0] * 4, width=10
    ).collect()
    assert {r["doc_id"] for r in again} == {r["doc_id"] for r in out}


def test_distribution_match_zero_target_drops_bin(spark):
    from kkbox_churn_prediction_spark.operators.sampling import (
        distribution_match_sample,
    )

    out = distribution_match_sample(
        _skewed_vals(spark), "v", [1.0, 0.0, 1.0, 1.0], width=10
    ).collect()
    assert all(r["bin"] != 1 for r in out)
    assert any(r["bin"] == 0 for r in out)


def test_cluster_safe_split_never_straddles(spark):
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.sampling import cluster_safe_split

    # 300 docs in 60 clusters of 5
    assigned = spark.range(300).select(
        F.col("id").alias("doc_id"), (F.col("id") % 60).alias("canonical_id")
    )
    out = cluster_safe_split(assigned, val_rate=0.3).collect()
    sides = {}
    for r in out:
        sides.setdefault(r["canonical_id"], set()).add(r["split"])
    # no cluster straddles the boundary — the contamination guarantee
    assert all(len(s) == 1 for s in sides.values())
    # rate lands near the target at the CLUSTER level
    val_clusters = sum(1 for s in sides.values() if s == {"val"})
    assert 8 <= val_clusters <= 28
    # deterministic under repartitioning
    again = cluster_safe_split(assigned.repartition(7), val_rate=0.3).collect()
    assert {(r["doc_id"], r["split"]) for r in again} == {
        (r["doc_id"], r["split"]) for r in out
    }
