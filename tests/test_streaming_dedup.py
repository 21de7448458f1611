"""Streaming exact-dedup: duplicates within the watermark tolerance
are dropped; the surviving stream equals batch dropDuplicates."""

from __future__ import annotations

from datetime import datetime

import pandas as pd

from kkbox_churn_prediction_spark.sources.synth import to_spark


def _batch(spark, rows):
    pdf = pd.DataFrame(
        {
            "conv_id": [r[0] for r in rows],
            "turn_idx": [r[1] for r in rows],
            "role": ["user"] * len(rows),
            "text": [f"t{r[1]}" for r in rows],
            "tool": [None] * len(rows),
            "ts": [datetime(2024, 1, 1, r[2], r[3]) for r in rows],
        }
    )
    return to_spark(spark, pdf)


def test_streaming_dedup_matches_batch(spark, tmp_path):
    from kkbox_churn_prediction_spark.streaming.dedup import streaming_dedup_turns

    # (conv, turn, hour, minute): duplicates of (c1,0) and (c2,5)
    # re-delivered within the 1h tolerance
    rows = [
        ("c1", 0, 10, 0), ("c1", 1, 10, 5), ("c1", 0, 10, 20),
        ("c2", 5, 11, 0), ("c2", 5, 11, 30), ("c2", 6, 11, 40),
    ]
    src = f"{tmp_path}/in"
    _batch(spark, rows).write.mode("overwrite").parquet(src)
    schema = _batch(spark, rows[:1]).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        streaming_dedup_turns(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    q.processAllAvailable()
    # advance the watermark far enough to flush pending state
    _batch(spark, [("c9", 99, 23, 0)]).write.mode("append").parquet(src)
    q.processAllAvailable()
    got = {
        (r["conv_id"], r["turn_idx"])
        for r in spark.sql("SELECT conv_id, turn_idx FROM dedup_out").collect()
    }
    q.stop()
    batch_keys = {
        (r["conv_id"], r["turn_idx"])
        for r in _batch(spark, rows).dropDuplicates(["conv_id", "turn_idx"]).collect()
    }
    assert got == batch_keys | {("c9", 99)}
    # each key exactly once
    n = spark.sql("SELECT COUNT(*) AS n FROM dedup_out").first()["n"]
    assert n == len(got)


def test_streaming_cms_equals_batch_sketch(spark, tmp_path):
    """The drained complete-mode counter table must equal the batch
    cms_build sketch row-for-row (same cells, same counts)."""
    import pyspark.sql.functions as F

    from kkbox_churn_prediction_spark.operators.cms import cms_build
    from kkbox_churn_prediction_spark.streaming.sketch import (
        streaming_cms_counters,
    )

    rows = [("a",)] * 7 + [("b",)] * 3 + [("c",)] * 1
    batch = spark.createDataFrame(rows, "tool string")
    src = str(tmp_path / "toolstream")
    batch.write.parquet(src)

    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = (
        streaming_cms_counters(stream, "tool", depth=4, width=8)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("cms_stream_test")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.row_d, r.slot): r.cnt for r in spark.table("cms_stream_test").collect()
    }
    want = {
        (r.row_d, r.slot): r.cnt
        for r in cms_build(
            batch.select("tool", F.lit("all").alias("b")),
            key_col="tool",
            bucket_col="b",
            depth=4,
            width=8,
        ).collect()
    }
    assert got == want
