"""Sequence packing: offset-bucketing contract, determinism, stats."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, n=500, parts=1):
    return spark.range(n).repartition(parts).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 37 + 11, 90) + 10).alias("n_tokens"),  # 10..99
    )


def test_offsets_are_contiguous_per_shard(spark):
    from kkbox_churn_prediction_spark.operators.packing import pack_documents

    out = pack_documents(_docs(spark), "n_tokens", capacity=256, n_shards=4).toPandas()
    for _, g in out.groupby("shard"):
        g = g.sort_values("doc_id")
        # offset = running sum of previous docs, starting at 0
        expect = g["n_tokens"].cumsum().shift(fill_value=0)
        assert (g["offset"].to_numpy() == expect.to_numpy()).all()
        # bin index is the offset's capacity bucket
        assert (g["pack_bin"] == g["offset"] // 256).all()


def test_partition_invariant(spark):
    from kkbox_churn_prediction_spark.operators.packing import pack_documents

    a = sorted(map(tuple, pack_documents(_docs(spark, parts=1), "n_tokens", 256).collect()))
    b = sorted(map(tuple, pack_documents(_docs(spark, parts=11), "n_tokens", 256).collect()))
    assert a == b


def test_oversize_flag_and_stats(spark):
    from kkbox_churn_prediction_spark.operators.packing import (
        pack_documents,
        packing_stats,
    )

    docs = spark.createDataFrame(
        [(1, 100), (2, 700), (3, 50)], "doc_id long, n_tokens long"
    )
    packed = pack_documents(docs, "n_tokens", capacity=512, n_shards=1)
    flags = {r["doc_id"]: r["oversize"] for r in packed.collect()}
    assert flags[2] == 1 and flags[1] == 0 and flags[3] == 0
    stats = packing_stats(packed, capacity=512).collect()
    assert sum(r["n_docs"] for r in stats) == 3
    assert abs(sum(r["bin_tokens"] for r in stats) - 850) < 1e-9


def test_bins_fill_close_to_capacity(spark):
    """Non-tail, non-straddled bins waste at most one document."""
    from kkbox_churn_prediction_spark.operators.packing import (
        pack_documents,
        packing_stats,
    )

    packed = pack_documents(_docs(spark, n=2000), "n_tokens", capacity=1000, n_shards=4)
    stats = packing_stats(packed, capacity=1000).toPandas()
    for _, g in stats.groupby("shard"):
        g = g.sort_values("pack_bin")
        inner = g.iloc[:-1]  # drop the tail bin
        if len(inner):
            # every inner bin spans its full capacity window (the next
            # doc started a new bin) modulo the straddler overflow
            assert (inner["bin_tokens"] >= 1000 - 99).all()
