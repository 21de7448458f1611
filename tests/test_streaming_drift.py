"""Streaming drift monitor: real streaming run of the windowed
category counts, PSI over the sink equals the batch-computed PSI on
identical data."""

from __future__ import annotations

from datetime import datetime

import pandas as pd
import pytest

from pyspark.sql import functions as F

from kkbox_churn_prediction_spark.sources.synth import to_spark


def _batch(spark, rows):
    pdf = pd.DataFrame(
        {
            "conv_id": [f"c{i}" for i, _ in enumerate(rows)],
            "turn_idx": [0] * len(rows),
            "role": [r for r, _, _ in rows],
            "text": ["x"] * len(rows),
            "tool": [None] * len(rows),
            "ts": [datetime(2024, 1, 1, h, m) for _, h, m in rows],
        }
    )
    return to_spark(spark, pdf)


def test_streaming_psi_matches_batch(spark, tmp_path):
    from kkbox_churn_prediction_spark.streaming.drift import (
        psi_over_windows,
        streaming_category_counts,
    )

    # hour 10: balanced roles (reference); hour 11: drifted to 'user'
    rows = (
        [("user", 10, m) for m in range(0, 30, 5)]
        + [("assistant", 10, m) for m in range(1, 31, 5)]
        + [("user", 11, m) for m in range(0, 50, 5)]
        + [("assistant", 11, 55)]
        + [("user", 13, 0)]  # advances the watermark, closing hour 11
    )
    src = f"{tmp_path}/in"
    _batch(spark, rows).write.mode("overwrite").parquet(src)
    schema = _batch(spark, rows[:1]).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        streaming_category_counts(stream, "role", window="1 hour", watermark="1 hour")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("drift_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    counts = spark.table("drift_out")
    # hours 10 and 11 finalized (13's window still open -> absent)
    starts = {r["window_start"] for r in counts.select("window_start").distinct().collect()}
    assert starts == {datetime(2024, 1, 1, 10, 0), datetime(2024, 1, 1, 11, 0)}

    ref = datetime(2024, 1, 1, 10, 0)
    got = {r["window_start"]: r["psi"] for r in
           psi_over_windows(counts, "role", ref).collect()}
    # batch equivalent: same counts from a plain groupBy, same PSI math
    batch_counts = (
        _batch(spark, [r for r in rows if r[1] in (10, 11)])
        .select(F.date_trunc("hour", "ts").alias("window_start"), "role")
        .groupBy("window_start", "role")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    expect = {r["window_start"]: r["psi"] for r in
              psi_over_windows(batch_counts, "role", ref).collect()}
    assert got == expect
    assert got[datetime(2024, 1, 1, 11, 0)] > 0.2  # drift is visible
