"""Stream-static enrichment join + watermarked windowed rollup.

Micro-batch joins of a live stream against a STATIC dimension are the
bread-and-butter of production feature streams (attach tool family /
region / plan attributes before aggregating). Structured Streaming
plans the static side as a broadcast hash join re-planned per
micro-batch: the stream side never shuffles for the join, the join
itself holds NO state (row-local enrichment — unlike stream-stream
joins there is nothing to buffer), and watermark semantics pass
through untouched. The only stateful operator is the downstream
windowed count, bounded by windows × enriched-category cardinality
and reclaimed at the watermark.

Batch/stream equivalence: running the same composition over a bounded
batch frame gives identical finalized windows — the enrichment gate
cross-checks exactly that against a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enriched_window_counts(
    stream: DataFrame,
    dim: DataFrame,
    join_key: str,
    family_col: str = "family",
    *,
    window: str = "1 hour",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    unmatched: str = "other",
) -> DataFrame:
    """LEFT-join each stream row to the static ``dim`` on
    ``join_key`` (broadcast — the dim is tiny by contract), coalesce
    unmatched rows to ``unmatched``, then count per (event-time
    window, family) in append mode. Works identically on a bounded
    batch DataFrame (the oracle path) and a streaming one."""
    enriched = stream.join(F.broadcast(dim), join_key, "left").withColumn(
        family_col, F.coalesce(F.col(family_col), F.lit(unmatched))
    )
    if enriched.isStreaming:
        enriched = enriched.withWatermark(ts_col, watermark)
    return (
        enriched.groupBy(F.window(F.col(ts_col), window), F.col(family_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            family_col,
            "n",
        )
    )
