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


def test_stream_static_enrichment_matches_batch(spark, tmp_path):
    """Stream-static broadcast join: the streaming result equals the
    same composition run in batch, unmatched keys coalesce to
    'other', and the join itself adds no streaming state."""
    from kkbox_churn_prediction_spark.streaming.enrich import enriched_window_counts

    rows = (
        [("user", 10, m) for m in range(0, 30, 5)]
        + [("assistant", 10, m) for m in range(1, 31, 5)]
        + [("tool", 11, m) for m in range(0, 20, 5)]
        + [("user", 13, 0)]  # watermark push closes hours 10-11
    )
    src = f"{tmp_path}/enrich_in"
    _batch(spark, rows).write.mode("overwrite").parquet(src)
    schema = _batch(spark, rows[:1]).schema
    dim = spark.createDataFrame(
        [("user", "human"), ("assistant", "model")], "role string, family string"
    )  # 'tool' deliberately unmatched → 'other'

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        enriched_window_counts(stream, dim, "role", window="1 hour", watermark="1 hour")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("enrich_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["window_start"].hour, r["family"]): r["n"]
        for r in spark.table("enrich_out").collect()
    }
    # batch path over the same frame (bounded input → no watermark cut)
    batch = enriched_window_counts(
        spark.read.parquet(src), dim, "role", window="1 hour", watermark="1 hour"
    )
    exp_all = {
        (r["window_start"].hour, r["family"]): r["n"] for r in batch.collect()
    }
    # stream finalizes only windows the watermark passed (hours 10, 11)
    exp = {k: v for k, v in exp_all.items() if k[0] < 13}
    assert got == exp
    assert got[(10, "human")] == 6 and got[(10, "model")] == 6
    assert got[(11, "other")] == 4


def test_stream_stream_range_join_matches_batch(spark, tmp_path):
    """Inner stream-stream range self-join emits exactly the batch
    range join's pairs over a bounded replay; both watermarks are
    wired (state-eviction precondition)."""
    from kkbox_churn_prediction_spark.streaming.joins import stream_turn_pairs

    rows = (
        [("cA", 0, "user", 10, 0), ("cA", 1, "assistant", 10, 2),
         ("cA", 2, "assistant", 10, 4)]                                # both within 5m
        + [("cB", 0, "user", 11, 0), ("cB", 1, "assistant", 11, 20)]   # outside horizon
        + [("cC", 0, "assistant", 12, 0)]                              # no prior user
    )
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
    src = f"{tmp_path}/pairs_in"
    to_spark(spark, pdf).write.mode("overwrite").parquet(src)
    schema = to_spark(spark, pdf).schema

    def _prep(df):
        return df.select("conv_id", "turn_idx", "role", "ts")

    stream = _prep(spark.readStream.schema(schema).parquet(src))
    q = (
        stream_turn_pairs(stream, horizon="5 minutes", watermark="1 hour")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("pairs_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r["conv_id"], r["u_idx"], r["a_idx"]): r["reply_delay_us"]
           for r in spark.table("pairs_out").collect()}
    batch = stream_turn_pairs(
        _prep(spark.read.parquet(src)), horizon="5 minutes", watermark="1 hour"
    )
    exp = {(r["conv_id"], r["u_idx"], r["a_idx"]): r["reply_delay_us"]
           for r in batch.collect()}
    assert got == exp
    assert len(got) == 2 and all(v <= 5 * 60 * 1_000_000 for v in got.values())


def test_srm_over_windows_golden(spark):
    from kkbox_churn_prediction_spark.streaming.drift import srm_over_windows

    counts = spark.createDataFrame(
        [
            # window 0: balanced 50/51 -> not flagged
            (0, "a", 50), (0, "b", 51),
            # window 1: 90/10 -> chi2 = 2*(40^2/50) = 64 -> flagged
            (1, "a", 90), (1, "b", 10),
            # window 2: arm b absent entirely -> observed 0 row appears
            (2, "a", 40),
        ],
        "window_start_us long, arm string, n long",
    )
    out = {(r["window_start_us"], r["arm"]): r for r in srm_over_windows(counts).collect()}
    assert not out[(0, "a")]["srm"] and not out[(0, "b")]["srm"]
    assert out[(1, "a")]["chi2"] == 64.0 and out[(1, "a")]["srm"]
    assert out[(2, "b")]["observed"] == 0 and out[(2, "b")]["srm"]
    assert out[(2, "b")]["expected"] == 20.0


def test_streaming_hopping_counts_overlap_and_closure(spark, tmp_path):
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.streaming.drift import (
        streaming_hopping_counts,
    )

    base = datetime(2024, 1, 1)
    rows = [(base + timedelta(minutes=30 * i),) for i in range(24)]  # 12h span
    src = str(tmp_path / "hop_src")
    spark.createDataFrame(rows, "ts timestamp").write.parquet(src)
    stream = spark.readStream.schema("ts timestamp").parquet(src)
    q = (
        streaming_hopping_counts(
            stream, window="2 hours", slide="1 hour", watermark="1 hour"
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("hop_test")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.table("hop_test").collect()
    got = {
        (r.window_start.hour if r.window_start.day == 1 else r.window_start.hour - 24): r.n
        for r in out
    }
    # max ts = 11:30, watermark = 10:30 -> closed windows end <= 10:30
    # i.e. 2h windows starting at -1h .. 8h
    assert min(got) == -1 and max(got) == 8
    # interior 2h windows hold 4 half-hourly events; the first holds 2
    assert got[-1] == 2
    assert all(got[h] == 4 for h in range(0, 9))
    # every interior event is counted exactly twice across hops
    assert sum(got.values()) == 2 + 9 * 4
