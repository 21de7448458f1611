"""Streaming point-in-time enrichment (streaming/asof.py): batch
equivalence under ties, cross-batch state, out-of-order invariants."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd

from pyspark.sql import Window
from pyspark.sql import functions as F

from kkbox_churn_prediction_spark.sources.synth import to_spark

T0 = datetime(2024, 1, 1, 9, 0, 0)


def _turns(spark, offsets_by_conv):
    rows = []
    for conv, offsets in offsets_by_conv.items():
        for i, s in enumerate(offsets):
            rows.append((conv, i, "user", "ab", None, T0 + timedelta(seconds=s)))
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    return to_spark(spark, pdf)


def _batch_expected(turns):
    """Strictly-prior depth/recency via a RANGE frame over epoch
    micros — the tie-safe batch formulation the stream must match."""
    w = (
        Window.partitionBy("conv_id")
        .orderBy("tsu")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    return (
        turns.withColumn("tsu", F.unix_micros(F.col("ts")))
        .select(
            "conv_id",
            "ts",
            F.count(F.lit(1)).over(w).alias("n_prior"),
            (F.col("tsu") - F.max("tsu").over(w)).alias("micros_since_prior"),
        )
    )


def _run_stream(spark, schema, in_dir, name):
    from kkbox_churn_prediction_spark.streaming.asof import stream_asof_depth

    stream = (
        spark.readStream.schema(schema)
        .parquet(in_dir)
        .select("conv_id", "ts")
    )
    return (
        stream_asof_depth(stream, watermark_delay=None)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )


def _rows(spark, name):
    return {
        (r["conv_id"], r["ts"], r["n_prior"], r["micros_since_prior"])
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }


def test_stream_matches_batch_with_ties(spark, tmp_path):
    turns = _turns(
        spark,
        {
            "c1": [0, 60, 60, 3600],  # tie at +60s: neither is prior to the other
            "c2": [0],
            "c3": [5, 5, 5],  # all-tie conversation: every n_prior = 0
        },
    )
    turns.write.mode("overwrite").parquet(f"{tmp_path}/in")
    q = _run_stream(spark, turns.schema, f"{tmp_path}/in", "asof_ties")
    q.processAllAvailable()
    got = _rows(spark, "asof_ties")
    q.stop()
    exp = {
        (r["conv_id"], r["ts"], r["n_prior"], r["micros_since_prior"])
        for r in _batch_expected(turns).collect()
    }
    assert got == exp


def test_state_carries_across_batches_including_tie_boundary(spark, tmp_path):
    b1 = _turns(spark, {"c1": [0, 60]})
    # batch 2 reuses ts=+60 (tie straddling the batch boundary) and adds +120
    b2 = _turns(spark, {"c1": [60, 120]})
    b1.write.mode("overwrite").parquet(f"{tmp_path}/in")
    q = _run_stream(spark, b1.schema, f"{tmp_path}/in", "asof_xbatch")
    q.processAllAvailable()
    b2.write.mode("append").parquet(f"{tmp_path}/in")
    q.processAllAvailable()
    got = _rows(spark, "asof_xbatch")
    q.stop()
    exp = {
        (r["conv_id"], r["ts"], r["n_prior"], r["micros_since_prior"])
        for r in _batch_expected(b1.unionAll(b2)).collect()
    }
    # the straddling tie must NOT count its equal-ts sibling as prior,
    # and recency must reach back to the +0s turn through state
    assert got == exp


def test_out_of_order_row_gets_processing_order_depth(spark, tmp_path):
    b1 = _turns(spark, {"c1": [0, 120]})
    b2 = _turns(spark, {"c1": [60]})  # late: between the two seen turns
    b1.write.mode("overwrite").parquet(f"{tmp_path}/in")
    q = _run_stream(spark, b1.schema, f"{tmp_path}/in", "asof_ooo")
    q.processAllAvailable()
    b2.write.mode("append").parquet(f"{tmp_path}/in")
    q.processAllAvailable()
    by_ts = {r[1]: r for r in _rows(spark, "asof_ooo")}
    q.stop()
    late = by_ts[T0 + timedelta(seconds=60)]
    # depth for a late row = seen turns strictly below the carried
    # clock, excluding those AT the clock — here that is exactly the
    # event-time-correct answer (only the +0s turn is prior; the
    # +120s turn is future and correctly not counted)
    assert late[2] == 1
    # recency from carried prev_us (the +0s turn) — event-time exact
    # under single-step disorder
    assert late[3] == 60_000_000
    # and the in-order rows are untouched
    assert by_ts[T0][2] == 0 and by_ts[T0][3] is None
    assert by_ts[T0 + timedelta(seconds=120)][2] == 1


def test_watermark_timeout_reclaims_state(spark, tmp_path):
    """Production wiring: an idle conversation's state is reclaimed
    once the watermark passes it — a turn arriving AFTER reclamation
    restarts depth at 0 (documented trade-off: depth is exact within
    the watermark horizon, not across unbounded idle gaps)."""
    from kkbox_churn_prediction_spark.streaming.asof import stream_asof_depth

    b1 = _turns(spark, {"c1": [0, 10]})
    # far-future traffic on another conversation drags the watermark
    # well past c1's last event + delay
    b2 = _turns(spark, {"c2": [100000]})
    b3 = _turns(spark, {"c1": [100060]})
    b1.write.mode("overwrite").parquet(f"{tmp_path}/in")
    stream = (
        spark.readStream.schema(b1.schema)
        .parquet(f"{tmp_path}/in")
        .select("conv_id", "ts")
    )
    q = (
        stream_asof_depth(stream, watermark_delay="1 minute")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("asof_wm")
        .start()
    )
    q.processAllAvailable()
    b2.write.mode("append").parquet(f"{tmp_path}/in")
    q.processAllAvailable()  # watermark advances; c1 state times out
    b3.write.mode("append").parquet(f"{tmp_path}/in")
    q.processAllAvailable()
    rows = {
        (r["conv_id"], r["ts"]): r
        for r in spark.sql("SELECT * FROM asof_wm").collect()
        if r["conv_id"] == "c1"
    }
    q.stop()
    late_key = ("c1", T0 + timedelta(seconds=100060))
    # pre-idle turns got exact depths; the post-reclamation turn
    # restarted at 0 with no recency (fresh state)
    assert rows[("c1", T0)][2] == 0
    assert rows[("c1", T0 + timedelta(seconds=10))][2] == 1
    assert rows[late_key][2] == 0 and rows[late_key][3] is None
