"""Lag-history panel features — long-format windows, no pivot.

The reference builds an entity×month pivot matrix in pandas
(``src/historical_features.py:150-163``) then does per-ROW Python
scans over it (``:181-188`` ``.apply(axis=1)`` for
``months_since_last_churn``) — the exact per-row-Python trap the
north star forbids. Re-expressed over the LONG format:

- dense entity×bucket grid (so lags mean calendar-previous, like the
  pivot's dense columns),
- ``lag(metric, k)`` over (conv_id ORDER BY bucket) for ``last_k``
  features (``src/historical_features.py:169-173``),
- ``buckets_since_last_active`` = running ``max(when(active,
  bucket_no))`` over an unbounded-preceding window (A14 rewrite) —
  rightmost-1 scan as a window aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def weekly_activity(turns: DataFrame) -> DataFrame:
    """Per (conv_id, week_start): turn count + text_len sum."""
    return (
        turns.withColumn("week_start", F.date_trunc("week", F.col("ts")))
        .groupBy("conv_id", "week_start")
        .agg(
            F.count(F.lit(1)).alias("turn_cnt"),
            F.coalesce(F.sum(F.expr("CAST(length(text) AS BIGINT)")), F.lit(0)).alias(
                "text_len_sum"
            ),
        )
    )


def history_lag_features(turns: DataFrame, n_lags: int = 2) -> DataFrame:
    """Dense weekly panel with lag features per entity.

    Grid = distinct entities × distinct weeks observed in the data
    (the pivot's dense column set); missing cells filled 0 (the
    pivot's NaN→0 analog). ``weeks_since_last_active`` counts weeks
    since the last week with any turn, as of each week (inclusive:
    an active week → 0).
    """
    act = weekly_activity(turns)
    entities = turns.select("conv_id").distinct()
    weeks = act.select("week_start").distinct()
    grid = entities.crossJoin(F.broadcast(weeks))
    dense = (
        grid.join(act, ["conv_id", "week_start"], "left")
        .fillna({"turn_cnt": 0, "text_len_sum": 0})
    )
    w = Window.partitionBy("conv_id").orderBy("week_start")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    week_no = F.floor(
        F.unix_micros(F.col("week_start")) / F.lit(7 * 86400 * 1_000_000)
    ).cast("bigint")
    out = dense.withColumn("week_no", week_no)
    for k in range(1, n_lags + 1):
        out = out.withColumn(
            f"turn_cnt_w{k}", F.coalesce(F.lag("turn_cnt", k).over(w), F.lit(-1))
        )
    last_active = F.max(F.when(F.col("turn_cnt") > 0, F.col("week_no"))).over(run)
    out = out.withColumn(
        "weeks_since_last_active",
        F.coalesce(F.col("week_no") - last_active, F.lit(-1)).cast("bigint"),
    )
    return out.drop("week_no")
