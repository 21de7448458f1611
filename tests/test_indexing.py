"""Dense index (two-phase rank) + deterministic negative sampling."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F


def test_dense_index_equals_global_rank(spark):
    from kkbox_churn_prediction_spark.operators.indexing import dense_index

    df = spark.range(5000).select((F.col("id") * 37 % 99991).alias("key"))
    out = dense_index(df, "key", n_buckets=16).collect()
    got = {r["key"]: r["idx"] for r in out}
    for rank, key in enumerate(sorted(got)):
        assert got[key] == rank
    assert sorted(got.values()) == list(range(5000))


def test_dense_index_partition_invariant(spark):
    from kkbox_churn_prediction_spark.operators.indexing import dense_index

    df = spark.range(1000).select((F.col("id") * 7 % 10007).alias("key"))
    a = sorted(map(tuple, dense_index(df.repartition(1), "key").collect()))
    b = sorted(map(tuple, dense_index(df.repartition(13), "key").collect()))
    assert a == b


def test_dense_index_no_global_sort(spark):
    from kkbox_churn_prediction_spark.operators.indexing import dense_index

    df = spark.range(100).select(F.col("id").alias("key"))
    plan = dense_index(df, "key")._jdf.queryExecution().executedPlan().toString()
    # the only SinglePartition exchange is the <=n_buckets offsets table
    # (window over bucket counts), never the full stream: assert the
    # big-side window partitions by bucket
    assert "partitionBy" not in plan  # sanity: string form differs; check below
    assert plan.count("SinglePartition") <= 1


def test_negative_samples_uniform_no_self(spark):
    from kkbox_churn_prediction_spark.operators.indexing import negative_samples

    n, k = 200, 5
    df = spark.range(n).select(F.col("id").alias("doc_id"))
    out = negative_samples(df, "doc_id", k).collect()
    assert len(out) == n * k
    for r in out:
        assert 0 <= r["neg_id"] < n
        assert r["neg_id"] != r["doc_id"]
    # roughly uniform coverage of the id space
    c = Counter(r["neg_id"] for r in out)
    assert len(c) > n * 0.9
    assert max(c.values()) < 10 * (n * k / n)


def test_negative_samples_deterministic(spark):
    from kkbox_churn_prediction_spark.operators.indexing import negative_samples

    df = spark.range(50).select(F.col("id").alias("doc_id"))
    a = sorted(map(tuple, negative_samples(df.repartition(1), "doc_id", 3).collect()))
    b = sorted(map(tuple, negative_samples(df.repartition(7), "doc_id", 3).collect()))
    assert a == b
