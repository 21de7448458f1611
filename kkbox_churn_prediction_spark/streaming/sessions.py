"""Structured Streaming counterparts (forward-looking; the reference
is pure batch — SURVEY §2.9 — and the north rule targets batch
backfill, so this module is a thin, tested bridge, not a core path).

Two streaming shapes the engine's batch semantics map onto:

- :func:`streaming_session_aggs` — gap-based sessionization via the
  built-in ``session_window(ts, gap)`` with a watermark: Spark's
  native analog of ``operators.sessionize`` (same 30-min gap; note
  session_window closes a session at watermark, batch closes at
  end-of-data — equivalence holds for closed sessions, checked in
  tests with a memory sink).
- :func:`streaming_turn_counts` — tumbling-window per-entity counts
  with late-data tolerance, the streaming analog of the multi-horizon
  aggregate's innermost window.

The checkpoint-manifest discipline in ``plans.manifest`` mirrors
streaming's idempotent-sink contract, so a batch backfill and a
streaming tail can share one output table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_session_aggs(
    turns_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    return (
        turns_stream.withWatermark("ts", watermark)
        .groupBy(F.session_window(F.col("ts"), gap), F.col("conv_id"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.coalesce(F.sum(F.expr("CAST(length(text) AS BIGINT)")), F.lit(0)).alias(
                "text_len_sum"
            ),
        )
        .select(
            "conv_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_turns",
            "text_len_sum",
        )
    )


def streaming_turn_counts(
    turns_stream: DataFrame,
    window: str = "1 day",
    watermark: str = "1 hour",
) -> DataFrame:
    return (
        turns_stream.withWatermark("ts", watermark)
        .groupBy(F.window(F.col("ts"), window), F.col("conv_id"))
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(
            "conv_id",
            F.col("window.start").alias("window_start"),
            "n_turns",
        )
    )
