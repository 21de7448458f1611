"""Streaming sketches: Count-Min frequency counters as a STREAMING
aggregation.

The batch CMS (``operators/cms.py``) is already relational — a sketch
is d×w counter rows produced by one groupBy. That makes the streaming
version free: the SAME cell expansion feeds a streaming groupBy in
COMPLETE output mode, and the aggregation state IS the sketch —
bounded at d×w counters no matter how many events flow through, which
is the entire point of sketching. No custom state operator, no
watermark (nothing is ever evicted: the sketch is the running answer
for the whole stream), no Python in the stream.

This is the production shape for "how often did key k occur, ever,
over an unbounded stream, in bounded memory": the memory/foreachBatch
sink holds d×w rows; estimates (``operators/cms.py::cms_estimate``)
run batch-side over that tiny table whenever asked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kkbox_churn_prediction_spark.operators.cms import cms_slot


def streaming_cms_counters(
    stream: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 32,
) -> DataFrame:
    """CMS counters over an unbounded stream → streaming aggregate
    ``(bucket='all', row_d, slot, cnt)``; run with
    ``outputMode("complete")`` (state = d×w counters, bounded by the
    sketch dimensions, NOT the stream length). Identical cell
    arithmetic to the batch ``cms_build`` — the final counter table
    from a drained stream equals the batch sketch row-for-row.
    """
    d = F.explode(F.sequence(F.lit(0), F.lit(int(depth) - 1))).alias("row_d")
    cells = stream.select(
        F.lit("all").alias("bucket"), F.col(key_col).alias("k"), d
    )
    return (
        cells.withColumn("slot", cms_slot(F.col("k"), F.col("row_d"), int(width)))
        .groupBy("bucket", "row_d", "slot")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
