"""Streaming deduplication for the ingest path.

A transcript firehose re-delivers turns (at-least-once sources,
producer retries); the batch engine dedups with hash-groupBy
(``operators/dedup.py``), but on an unbounded stream exact dedup
state grows forever unless it is bounded in EVENT TIME. Spark's
``dropDuplicatesWithinWatermark`` keeps per-key state only until the
watermark passes the key's event time + delay — bounded state, exact
within the tolerance window, the standard streaming contract for
"duplicates arrive close to the original".

Scale: state is hash-partitioned by key across executors (one shuffle
on the dedup key); the watermark bounds per-executor state to
(arrival-rate × delay) keys regardless of stream age. A duplicate
arriving LATER than the delay is not caught — choose the delay from
the producer's retry horizon, and run the batch exact-dedup as the
daily compaction backstop (lambda discipline, same keys both paths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def streaming_dedup_turns(
    stream: DataFrame,
    key_cols: list[str] | None = None,
    *,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Drop re-delivered turns within the watermark tolerance.

    Keys default to the transcript primary key (conv_id, turn_idx) —
    the per-row invariant's identity. State per key is dropped once
    the watermark (event-time max - delay) passes the key's ts.
    """
    keys = key_cols or ["conv_id", "turn_idx"]
    return stream.withWatermark("ts", watermark_delay).dropDuplicatesWithinWatermark(
        keys
    )
