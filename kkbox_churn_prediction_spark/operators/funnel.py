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


def tool_attribution(
    turns: DataFrame,
    *,
    conversion_tool: str = "purchase",
    window_turns: int = 10,
) -> DataFrame:
    """First-touch / last-touch attribution of conversions to the
    tools that preceded them: for every ``conversion_tool`` turn,
    credit (a) the FIRST and (b) the LAST other tool invoked within
    the preceding ``window_turns`` tool-turns of the same
    conversation — the marketing-attribution read applied to agent
    workflows (which tool starts journeys that end in conversion vs
    which closes them; the two disagree exactly when funnels are
    long). Output per tool: ``(tool, first_touch, last_touch,
    share_first, share_last)`` over attributed conversions.

    Shape: one conv-partitioned window pass collects the bounded
    lag-struct array (``window_turns`` lags of (tool) via
    ``collect_list`` over a bounded ROWS frame — never the whole
    conversation), then pure array exprs pick first/last non-null
    non-conversion lag; one |tools|-bounded agg. The corpus is
    windowed once.
    """
    calls = turns.where(F.col("tool").isNotNull())
    w = (
        Window.partitionBy("conv_id")
        .orderBy("ts", "turn_idx")
        .rowsBetween(-int(window_turns), -1)
    )
    with_prior = calls.select(
        "tool",
        F.collect_list("tool").over(w).alias("_prior"),
    ).where(F.col("tool") == conversion_tool)
    others = F.filter(F.col("_prior"), lambda t: t != F.lit(conversion_tool))
    # try_element_at: ANSI-safe NULL (not an error) on conversions
    # with an empty prior window; those rows drop in the filter
    attributed = with_prior.select(
        F.try_element_at(others, F.lit(1)).alias("first_touch_tool"),
        F.try_element_at(others, F.lit(-1)).alias("last_touch_tool"),
    ).where(F.col("first_touch_tool").isNotNull())
    first = attributed.groupBy(F.col("first_touch_tool").alias("tool")).agg(
        F.count(F.lit(1)).cast("long").alias("first_touch")
    )
    last = attributed.groupBy(F.col("last_touch_tool").alias("tool")).agg(
        F.count(F.lit(1)).cast("long").alias("last_touch")
    )
    tot = attributed.agg(F.count(F.lit(1)).cast("long").alias("_tot"))
    return (
        first.join(last, "tool", "full")
        .crossJoin(F.broadcast(tot))
        .select(
            "tool",
            F.coalesce(F.col("first_touch"), F.lit(0)).cast("long").alias(
                "first_touch"
            ),
            F.coalesce(F.col("last_touch"), F.lit(0)).cast("long").alias(
                "last_touch"
            ),
            F.round(
                F.coalesce(F.col("first_touch"), F.lit(0)) * 1.0 / F.col("_tot"), 6
            ).alias("share_first"),
            F.round(
                F.coalesce(F.col("last_touch"), F.lit(0)) * 1.0 / F.col("_tot"), 6
            ).alias("share_last"),
        )
        .orderBy("tool")
    )
