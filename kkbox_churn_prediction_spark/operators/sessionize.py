"""Gap-based sessionization (north-star axis-A operator).

Split each conversation into sessions at inactivity gaps **strictly
greater than** ``gap`` (default 30 min; a gap of exactly 30:00 does
NOT split — boundary goldens in tests). The reference's closest
analog is day-granularity implicit sessionization via
``COUNT(DISTINCT log_date)`` (``features/features_comprehensive.sql:187``);
this is the generalized event-time version:

    lag(ts) over (conv_id order by ts, turn_idx)
      → new_session flag (gap > threshold)
      → running sum over the same window = session_id

Pure window composition — one shuffle on conv_id, no Python.
Mega-conversation skew: a window over (conv_id) cannot be salted
without breaking running order; AQE cannot split a window partition
either. The mitigation at 10^12 turns is layout (repartitionByRange
on conv_id keeps one conversation per task but balances ranges) —
see ``operators.skew`` for the agg-side salting that *does* apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_GAP_SECONDS = 30 * 60


def sessionize(turns: DataFrame, gap_seconds: int = DEFAULT_GAP_SECONDS) -> DataFrame:
    """Add ``session_id`` (0-based per conversation) to each turn."""
    w = Window.partitionBy("conv_id").orderBy("ts", "turn_idx")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_session = F.when(
        gap_us.isNull() | (gap_us > F.lit(int(gap_seconds) * 1_000_000)), 1
    ).otherwise(0)
    run = Window.partitionBy("conv_id").orderBy("ts", "turn_idx").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return turns.withColumn(
        "session_id", (F.sum(new_session).over(run) - F.lit(1)).cast("int")
    )


def session_aggregates(turns: DataFrame, gap_seconds: int = DEFAULT_GAP_SECONDS) -> DataFrame:
    """One row per (conv_id, session_id): bounds, turn count, text
    stats, duration. Per-entity multi-stat hash agg (A1) at session
    grain."""
    s = sessionize(turns, gap_seconds)
    return s.groupBy("conv_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_turns"),
        F.coalesce(
            F.sum(F.expr("CASE WHEN role = 'user' THEN 1 ELSE 0 END")), F.lit(0)
        ).cast("bigint").alias("n_user_turns"),
        F.coalesce(F.sum(F.expr("CAST(length(text) AS BIGINT)")), F.lit(0)).alias(
            "text_len_sum"
        ),
        (F.max(F.unix_micros(F.col("ts"))) - F.min(F.unix_micros(F.col("ts")))).alias(
            "duration_micros"
        ),
    )
