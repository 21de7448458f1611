"""Custom stateful streaming operator + remaining relational ops."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd

from kkbox_churn_prediction_spark.sources.synth import to_spark

T0 = datetime(2024, 1, 1, 9, 0, 0)
SF = "/root/testdata/sf0.001"


def _turns(spark, offsets_by_conv):
    rows = []
    for conv, offsets in offsets_by_conv.items():
        for i, s in enumerate(offsets):
            rows.append((conv, i, "user", "ab", None, T0 + timedelta(seconds=s)))
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    return to_spark(spark, pdf)


def test_stateful_closed_sessions_match_batch(spark, tmp_path):
    """Drive applyInPandasWithState over a file stream; the CLOSED
    sessions it emits must equal the batch sessionizer's sessions
    minus each conversation's final (still-open) session."""
    from kkbox_churn_prediction_spark.operators.sessionize import session_aggregates
    from kkbox_churn_prediction_spark.streaming.stateful import stateful_closed_sessions

    turns = _turns(
        spark,
        {
            "c1": [0, 60, 7200, 7230, 20000],  # 3 sessions → 2 closed
            "c2": [0, 1800, 5400],  # boundary: exactly-1800s gap does NOT split
            "c3": [0],  # single open session → nothing emitted
        },
    )
    turns.write.mode("overwrite").parquet(f"{tmp_path}/in")
    stream = spark.readStream.schema(turns.schema).parquet(f"{tmp_path}/in")
    q = (
        # watermark_delay=None: bounded-replay mode — closed sessions
        # come ONLY from observed closing turns (no idle-timeout
        # flush), which is what the batch-equivalence compare expects
        stateful_closed_sessions(stream, watermark_delay=None)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("closed_sessions")
        .start()
    )
    q.processAllAvailable()
    got = {
        (r["conv_id"], r["session_start"], r["session_end"], r["n_turns"])
        for r in spark.sql("SELECT * FROM closed_sessions").collect()
    }
    q.stop()

    batch = session_aggregates(turns).collect()
    last_session = {}
    for r in batch:
        last_session[r["conv_id"]] = max(
            last_session.get(r["conv_id"], -1), r["session_id"]
        )
    want = {
        (r["conv_id"], r["session_start"], r["session_end"], r["n_turns"])
        for r in batch
        if r["session_id"] != last_session[r["conv_id"]]
    }
    assert got == want
    assert len(got) == 3  # c1: 2 closed, c2: 1 closed, c3: 0


def test_stateful_state_carries_across_batches(spark, tmp_path):
    """Two micro-batches: a session spanning the batch boundary must
    close ONCE with turns from both batches (state continuity)."""
    from kkbox_churn_prediction_spark.streaming.stateful import stateful_closed_sessions

    b1 = _turns(spark, {"c1": [0, 60]})
    b2 = _turns(spark, {"c1": [120, 9000]})  # 120 continues; 9000 closes it
    b1.write.mode("overwrite").parquet(f"{tmp_path}/in")
    stream = spark.readStream.schema(b1.schema).parquet(f"{tmp_path}/in")
    q = (
        stateful_closed_sessions(stream, watermark_delay=None)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("closed_2b")
        .start()
    )
    q.processAllAvailable()
    b2.write.mode("append").parquet(f"{tmp_path}/in")
    q.processAllAvailable()
    rows = spark.sql("SELECT * FROM closed_2b").collect()
    q.stop()
    assert len(rows) == 1
    assert rows[0]["n_turns"] == 3  # 0, 60 (batch 1) + 120 (batch 2)
    assert rows[0]["session_start"] == T0
    assert rows[0]["session_end"] == T0 + timedelta(seconds=120)


def test_stateful_out_of_order_cross_batch_clamps(spark, tmp_path):
    """A batch-2 turn OLDER than the carried state clock must merge
    into the open session (start widens, last never moves backward) —
    the emitted session keeps session_end >= session_start and counts
    the straggler."""
    from kkbox_churn_prediction_spark.streaming.stateful import stateful_closed_sessions

    b1 = _turns(spark, {"c1": [0, 60]})
    # 30 arrives AFTER the state clock reached 60; 9000 closes the session
    b2 = _turns(spark, {"c1": [30, 9000]})
    b1.write.mode("overwrite").parquet(f"{tmp_path}/in")
    stream = spark.readStream.schema(b1.schema).parquet(f"{tmp_path}/in")
    q = (
        stateful_closed_sessions(stream)  # default watermark wiring
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("closed_ooo")
        .start()
    )
    q.processAllAvailable()
    b2.write.mode("append").parquet(f"{tmp_path}/in")
    q.processAllAvailable()
    rows = [
        r
        for r in spark.sql("SELECT * FROM closed_ooo").collect()
        if r["session_end"] < T0 + timedelta(seconds=8999)
    ]
    q.stop()
    assert len(rows) == 1
    r = rows[0]
    assert r["session_start"] == T0
    assert r["session_end"] == T0 + timedelta(seconds=60)  # NOT dragged back to 30
    assert r["session_end"] >= r["session_start"]
    assert r["n_turns"] == 3  # straggler counted


def test_stateful_idle_timeout_flushes_and_reclaims(spark, tmp_path):
    """Default wiring: when the watermark passes an idle session's
    close boundary, EventTimeTimeout flushes it as closed — idle
    conversations don't hold state forever."""
    from kkbox_churn_prediction_spark.streaming.stateful import stateful_closed_sessions

    b1 = _turns(spark, {"c1": [0, 60]})
    b2 = _turns(spark, {"c2": [20000]})  # advances watermark far past c1
    b1.write.mode("overwrite").parquet(f"{tmp_path}/in")
    stream = spark.readStream.schema(b1.schema).parquet(f"{tmp_path}/in")
    q = (
        stateful_closed_sessions(stream, watermark_delay="10 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("closed_timeout")
        .start()
    )
    q.processAllAvailable()
    b2.write.mode("append").parquet(f"{tmp_path}/in")
    q.processAllAvailable()
    got = {
        (r["conv_id"], r["session_start"], r["session_end"], r["n_turns"])
        for r in spark.sql("SELECT * FROM closed_timeout").collect()
    }
    q.stop()
    # c1's open session flushed by timeout (watermark 20000-600s passed
    # its close boundary 60+1800s); c2's session is still live
    assert got == {("c1", T0, T0 + timedelta(seconds=60), 2)}


def test_quintile_buckets_equal_count_and_ordering(spark):
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.relational import quintile_bucket_stats

    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", F.col("value").cast("double").alias("value")
    )
    out = quintile_bucket_stats(ev, "value", "event_id").orderBy("bucket").collect()
    assert len(out) == 5
    total = ev.where(F.col("value").isNotNull()).count()
    assert sum(r["n"] for r in out) == total
    assert max(r["n"] for r in out) - min(r["n"] for r in out) <= 1  # equal-count
    # bucket value ranges are ordered and non-overlapping
    for lo, hi in zip(out, out[1:]):
        assert lo["max_value"] <= hi["min_value"]


def test_sales_by_region_broadcasts_dims(spark):
    from kkbox_churn_prediction_spark.operators.relational import sales_by_region

    df = sales_by_region(
        spark.read.parquet(f"{SF}/orders.parquet"),
        spark.read.parquet(f"{SF}/customer.parquet"),
        spark.read.parquet(f"{SF}/nation.parquet"),
        spark.read.parquet(f"{SF}/region.parquet"),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    rows = df.collect()
    assert len(rows) >= 1
    assert all(r["n_orders"] > 0 for r in rows)


def test_stateful_empty_batch_iterator_is_safe():
    """A GroupState timeout invocation delivers zero batches for the
    key; the handler must not crash on the empty iterator."""
    from kkbox_churn_prediction_spark.streaming.stateful import _close_sessions

    class FakeState:
        exists = False

        def update(self, v):
            raise AssertionError("must not update state on empty input")

    out = list(_close_sessions(("c1",), iter([]), FakeState(), 1800 * 1_000_000))
    assert len(out) == 1 and len(out[0]) == 0
