"""Late-data semantics: a watermarked windowed agg in append mode
must drop events that arrive after the watermark has passed their
window (Structured Streaming's late-data contract — the streaming
counterpart of the batch engine's leak guard: both bound how far
backward in event time a row may still influence a result)."""

from __future__ import annotations

from datetime import datetime

import pandas as pd

from kkbox_churn_prediction_spark.sources.synth import to_spark


def _batch(spark, times):
    pdf = pd.DataFrame(
        {
            "conv_id": ["c1"] * len(times),
            "turn_idx": range(len(times)),
            "role": ["user"] * len(times),
            "text": ["x"] * len(times),
            "tool": [None] * len(times),
            "ts": [datetime(2024, 1, 1, h, m) for h, m in times],
        }
    )
    return to_spark(spark, pdf)


def test_late_rows_beyond_watermark_are_dropped(spark, tmp_path):
    from kkbox_churn_prediction_spark.streaming.sessions import streaming_turn_counts

    # batch 1: 10:00 and 12:30 → watermark advances to 12:30 - 1h =
    # 11:30, closing the [10:00, 11:00) window with count 1
    _batch(spark, [(10, 0), (12, 30)]).write.mode("overwrite").parquet(
        f"{tmp_path}/in"
    )
    schema = _batch(spark, [(0, 0)]).schema
    stream = spark.readStream.schema(schema).parquet(f"{tmp_path}/in")
    q = (
        streaming_turn_counts(stream, window="1 hour", watermark="1 hour")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_out")
        .start()
    )
    q.processAllAvailable()
    # batch 2: 10:30 is LATE (before the 11:30 watermark) and must be
    # dropped; 15:00 advances the watermark to 14:00, closing
    # [12:00, 13:00)
    _batch(spark, [(10, 30), (15, 0)]).write.mode("append").parquet(
        f"{tmp_path}/in"
    )
    q.processAllAvailable()
    rows = {
        r["window_start"]: r["n_turns"]
        for r in spark.sql("SELECT * FROM wm_out").collect()
    }
    q.stop()
    assert rows[datetime(2024, 1, 1, 10, 0)] == 1  # late 10:30 row dropped
    assert rows[datetime(2024, 1, 1, 12, 0)] == 1


def test_stateful_aggregation_recovers_from_checkpoint_restart(spark, tmp_path):
    """Kill/restart for STATEFUL streaming (the manifest-resume
    discipline applied to state stores): a watermarked windowed agg is
    stopped mid-stream and a NEW query object restarts from the same
    checkpointLocation. Rows arriving before the stop must combine
    with rows after it in ONE window count — proving the state store
    recovered rather than reset — and every closed window is emitted
    exactly once despite the restart."""
    import pandas as pd

    from kkbox_churn_prediction_spark.sources.synth import to_spark
    from kkbox_churn_prediction_spark.streaming.sessions import (
        streaming_turn_counts,
    )

    def batch(rows):
        return to_spark(spark, pd.DataFrame({
            "conv_id": [r[0] for r in rows],
            "turn_idx": [r[1] for r in rows],
            "role": ["user"] * len(rows),
            "text": ["x"] * len(rows),
            "tool": [None] * len(rows),
            "ts": [datetime(2024, 1, 1, r[2], r[3]) for r in rows],
        }))

    src = f"{tmp_path}/in"
    out = f"{tmp_path}/out"
    ckpt = f"{tmp_path}/ckpt"
    pre = [("c1", 0, 10, 0), ("c1", 1, 10, 10), ("c1", 2, 10, 20),
           ("c2", 0, 10, 5)]
    batch(pre).coalesce(1).write.mode("overwrite").parquet(src)
    schema = batch(pre[:1]).schema

    def start_query():
        stream = spark.readStream.schema(schema).parquet(src)
        return (
            streaming_turn_counts(stream, window="1 hour", watermark="30 minutes")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q1 = start_query()
    q1.processAllAvailable()
    q1.stop()  # the kill: 10:00-11:00 windows are still OPEN in state

    # post-restart rows land in the SAME window, plus a far-future
    # flush row that closes it
    post = [("c1", 3, 10, 30), ("c1", 4, 10, 40), ("zz", 9, 23, 0)]
    batch(post).coalesce(1).write.mode("append").parquet(src)
    q2 = start_query()
    q2.processAllAvailable()
    q2.stop()

    got = {
        (r["conv_id"], r["window_start"].hour): r["n_turns"]
        for r in spark.read.parquet(out).collect()
    }
    # pre-restart 3 + post-restart 2 in one count = state recovered
    assert got[("c1", 10)] == 5
    assert got[("c2", 10)] == 1
    assert ("zz", 23) not in got  # its window never closed
    # exactly-once: no duplicate (conv, window) rows across the restart
    n_rows = spark.read.parquet(out).count()
    assert n_rows == len(got)
