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
