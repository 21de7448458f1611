"""Ordered funnel analysis over event streams.

"Of the conversations that saw a system turn, how many later had a
user turn, and later still an assistant turn — and how long did each
hop take?" The reference's KPI SQL computes unordered per-month step
counts (``sql/04_kpi_metrics.sql``); the ordered funnel is the
general tool, and the ORDER is the hard part: step i+1 only counts if
it happens strictly AFTER step i's first occurrence.

Spark-first shape: three chained window MIN projections over the same
``partitionBy(conv_id)`` (unordered frames — no sort, one exchange
total, each step's conditional MIN referencing the previous step's
column), then one distinct per entity and a tiny final rollup. No
joins, no per-row Python; at 10^12 turns the only cost is the single
conv_id shuffle the rest of the engine already pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_steps(
    turns: DataFrame, steps: tuple[str, ...] = ("system", "user", "assistant")
) -> DataFrame:
    """Per conversation: first timestamp of each ordered funnel step
    (step i+1 = earliest turn of that role strictly after step i),
    completion flags, and hop latencies in seconds (-1.0 = hop never
    completed)."""
    w = Window.partitionBy("conv_id")
    df = turns
    prev_ts = None
    ts_cols = []
    for i, role in enumerate(steps):
        cond = F.col("role") == F.lit(role)
        if prev_ts is not None:
            cond = cond & F.col(prev_ts).isNotNull() & (F.col("ts") > F.col(prev_ts))
        name = f"step{i + 1}_ts"
        df = df.withColumn(name, F.min(F.when(cond, F.col("ts"))).over(w))
        prev_ts = name
        ts_cols.append(name)
    out = df.select("conv_id", *ts_cols).distinct()
    cols: list = ["conv_id"]
    for i, name in enumerate(ts_cols):
        cols.append(F.col(name).isNotNull().cast("int").alias(f"reached_step{i + 1}"))
    for i in range(1, len(ts_cols)):
        hop = (
            F.unix_micros(F.col(ts_cols[i])) - F.unix_micros(F.col(ts_cols[i - 1]))
        ) / F.lit(1_000_000.0)
        cols.append(F.coalesce(hop, F.lit(-1.0)).alias(f"hop{i}_seconds"))
    return out.select(*cols)


def funnel_rollup(per_entity: DataFrame, n_steps: int = 3) -> DataFrame:
    """Corpus-level funnel: entities reaching each step + conversion
    rate vs the previous step (tiny single-row rollup)."""
    aggs = [F.count(F.lit(1)).alias("n_entities")]
    for i in range(1, n_steps + 1):
        aggs.append(F.sum(f"reached_step{i}").cast("long").alias(f"n_step{i}"))
    base = per_entity.agg(*aggs)
    convs = []
    for i in range(2, n_steps + 1):
        prev = F.col(f"n_step{i - 1}")
        convs.append(
            F.coalesce(
                F.when(prev > 0, F.col(f"n_step{i}") / prev), F.lit(0.0)
            ).alias(f"conv_step{i}")
        )
    return base.select("n_entities", *[F.col(f"n_step{i}") for i in range(1, n_steps + 1)], *convs)
