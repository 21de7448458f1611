"""Time-grid resampling with forward fill (gap filling).

Turns an irregular event stream into a *dense* per-key time series:
one row per (key, bucket) for every bucket between the key's first and
last observation, with observed buckets aggregated and empty buckets
gap-filled by carrying the last observed value forward. The reference
needs exactly this shape when it derives churn windows from
daily-resampled activity (its ``COUNT(DISTINCT log_date)`` features,
``features/features_comprehensive.sql:187``, are the sparse half;
the expiry-gap label logic in ``src/labels.py:30-55`` implicitly
forward-fills membership state across quiet days).

Distributed shape — one data shuffle, everything else rides it:

1. observed: ``groupBy (key, bucket)`` aggregates the stream (count +
   ``max_by`` last value — algebraic, map-side partials; NOT a
   row_number window over raw turns);
2. grid: per-key min/max bucket (same agg pass) → ``sequence`` +
   ``explode`` — generated from ONE row per key, span/step rows out,
   never touching the raw stream again;
3. join: grid ⟕ observed on (key, bucket) — both sides are outputs of
   aggregations hash-partitioned by key, so AQE plans a cheap join;
4. ffill: ``last_value(..., ignoreNulls)`` over (key ORDER BY bucket)
   — partitions are span/step rows, bounded by the grid, not the data.

The dense grid can be much LARGER than the input for sparse keys
(span/step rows per key regardless of activity) — that's inherent to
the semantics, and ``step_seconds`` is the dial; the operator never
materializes more than the grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    order_col: str,
    *,
    step_seconds: int = 86400,
) -> DataFrame:
    """Dense (key, bucket) series from the key's first to last bucket:
    ``n_rows`` observed in the bucket (0 for gaps) and ``<value>_ffill``
    — the last observed value at-or-before the bucket, ties within a
    bucket broken by (ts, order_col) descending.

    ``step_seconds`` must divide 86400 so buckets tile each calendar
    day. The bucket index is WALL-CLOCK component arithmetic
    (day-number since 1970-01-01 × buckets-per-day + seconds-of-day
    div step) — the same TZ-safe discipline as
    :func:`windows.tumbling_window_counts`: epoch-based bucketing
    (``unix_micros div step``) silently shifts bucket boundaries under
    any non-UTC session timezone, breaking cross-engine parity.

    Output: ``key, bucket_ts, n_rows, <value_col>_ffill``.
    """
    step = int(step_seconds)
    if 86400 % step != 0:
        raise ValueError(f"step_seconds must divide 86400, got {step}")
    per_day = 86400 // step
    day0 = F.to_date(F.lit("1970-01-01"))
    day_idx = F.datediff(F.col(ts_col).cast("date"), day0).cast("bigint")
    bucket = day_idx * F.lit(per_day) + F.expr(
        f"(cast(hour({ts_col}) as bigint) * 3600"
        f" + minute({ts_col}) * 60 + second({ts_col})) div {step}"
    )

    observed = (
        df.select(
            key,
            bucket.alias("_b"),
            F.col(ts_col).alias("_ts"),
            F.col(order_col).alias("_ord"),
            F.col(value_col).alias("_v"),
        )
        .groupBy(key, "_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.max_by("_v", F.struct("_ts", "_ord")).alias("_last_v"),
        )
    )
    spans = observed.groupBy(key).agg(
        F.min("_b").alias("_b0"), F.max("_b").alias("_b1")
    )
    grid = spans.select(
        key, F.explode(F.sequence("_b0", "_b1")).alias("_b")
    )
    joined = grid.join(observed, on=[key, "_b"], how="left")
    w = Window.partitionBy(key).orderBy("_b").rowsBetween(
        Window.unboundedPreceding, 0
    )
    b = F.col("_b")
    bucket_ts = F.date_add(day0, F.expr(f"cast(_b div {per_day} as int)")).cast(
        "timestamp"
    ) + (b % per_day) * F.lit(step) * F.expr("INTERVAL 1 SECOND")
    return joined.select(
        key,
        bucket_ts.alias("bucket_ts"),
        F.coalesce("n_rows", F.lit(0).cast("bigint")).alias("n_rows"),
        F.last("_last_v", ignorenulls=True).over(w).alias(f"{value_col}_ffill"),
    )
