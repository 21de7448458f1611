"""Stream-stream FULL OUTER range join (streaming gate #11): both
null-emission paths fire only after the watermark passes, and the
drained result equals the batch full join exactly."""

from __future__ import annotations

from datetime import datetime

import pandas as pd
from pyspark.sql import functions as F

from kkbox_churn_prediction_spark.sources.synth import to_spark


def _batch(spark, rows):
    pdf = pd.DataFrame(
        {
            "conv_id": [r[0] for r in rows],
            "turn_idx": [r[1] for r in rows],
            "role": [r[2] for r in rows],
            "text": ["x"] * len(rows),
            "tool": [None] * len(rows),
            "ts": [datetime(2024, 1, 1, r[3], r[4]) for r in rows],
        }
    )
    return to_spark(spark, pdf)


# (conv, idx, role, hour, minute):
#  c1: user@10:00 answered@10:30   -> matched pair
#  c2: user@10:00, never answered  -> unanswered (left-null path)
#  c3: assistant@10:15, no user    -> orphan answer (right-null path)
ROWS = [
    ("c1", 0, "user", 10, 0),
    ("c1", 1, "assistant", 10, 30),
    ("c2", 0, "user", 10, 0),
    ("c3", 9, "assistant", 10, 15),
]
FLUSH = [
    ("zu", 90, "user", 23, 0),
    ("za", 91, "assistant", 23, 0),
]


def test_stream_full_pairs_matches_batch_after_flush(spark, tmp_path):
    from kkbox_churn_prediction_spark.streaming.joins import stream_full_pairs

    src = f"{tmp_path}/in"
    _batch(spark, ROWS).coalesce(1).write.mode("overwrite").parquet(src)
    schema = _batch(spark, ROWS[:1]).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_full_pairs(stream, horizon="1 hour", watermark="1 hour")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("full_join_test")
        .start()
    )
    try:
        q.processAllAvailable()
        # before the flush only the matched pair can have been emitted
        # (both null paths must wait for the watermark)
        early = spark.table("full_join_test").collect()
        assert all(r["answered"] == 1 for r in early)
        # march the watermark past the tail — BOTH roles, because the
        # join watermark is the MIN across the two sides
        _batch(spark, FLUSH).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["conv_id"], r["u_idx"], r["a_idx"], r["answered"], r["orphan"])
        for r in spark.table("full_join_test").collect()
        if not r["conv_id"].startswith("z")
    }
    assert got == {
        ("c1", 0, 1, 1, 0),  # answered pair
        ("c2", 0, None, 0, 0),  # unanswered user
        ("c3", None, 9, 0, 1),  # orphan assistant
    }
    # batch equivalence on the same frame (the oracle path)
    batch_got = {
        (r["conv_id"], r["u_idx"], r["a_idx"], r["answered"], r["orphan"])
        for r in stream_full_pairs(
            _batch(spark, ROWS), horizon="1 hour", watermark="1 hour"
        ).collect()
    }
    assert batch_got == got


def test_stream_full_pairs_batch_reduces_to_left_plus_orphans(spark):
    """On a bounded frame: full = left rows ∪ orphan a-rows; the left
    projection of full (orphan = 0) equals stream_left_pairs."""
    from kkbox_churn_prediction_spark.streaming.joins import (
        stream_full_pairs,
        stream_left_pairs,
    )

    df = _batch(spark, ROWS)
    full = stream_full_pairs(df, horizon="1 hour").collect()
    left = {
        (r["conv_id"], r["u_idx"], r["a_idx"], r["answered"])
        for r in stream_left_pairs(df, horizon="1 hour").collect()
    }
    assert {
        (r["conv_id"], r["u_idx"], r["a_idx"], r["answered"])
        for r in full
        if r["orphan"] == 0
    } == left
    assert [r["conv_id"] for r in full if r["orphan"] == 1] == ["c3"]


def test_full_join_gate_tallies(spark):
    """The gate's per-conversation rollup over sf0.001 agrees with a
    batch recomputation of the same tallies."""
    from kkbox_churn_prediction_spark.streaming.joins import stream_full_pairs
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = {
        r["conv_id"]: (
            r["n_rows"],
            r["n_answered_pairs"],
            r["n_unanswered"],
            r["n_orphan_answers"],
        )
        for r in entry.queries()["streaming_full_join"](spark, sf).collect()
    }
    # batch recomputation straight from the staged source mapping
    src, _ = entry._stage_stream_src(sf)
    ev = spark.read.parquet(src).where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    turns = ev.select(
        F.concat(F.lit("c"), F.col("user_id")).alias("conv_id"),
        F.col("event_id").alias("turn_idx"),
        F.when(F.col("event_type") == "signup", F.lit("system"))
        .when(F.col("event_type") == "purchase", F.lit("assistant"))
        .when(F.col("event_type") == "error", F.lit("tool"))
        .otherwise(F.lit("user"))
        .alias("role"),
        F.col("ts").cast("timestamp").alias("ts"),
    )
    want = {
        r["conv_id"]: (
            r["n_rows"],
            r["n_answered_pairs"],
            r["n_unanswered"],
            r["n_orphan_answers"],
        )
        for r in stream_full_pairs(turns, horizon="2 hours")
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("answered").cast("long").alias("n_answered_pairs"),
            F.sum(
                F.when((F.col("answered") == 0) & (F.col("orphan") == 0), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_unanswered"),
            F.sum("orphan").cast("long").alias("n_orphan_answers"),
        )
        .collect()
    }
    assert got == want
