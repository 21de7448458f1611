"""RFM (recency / frequency / monetary) quintile scoring.

The classic churn-segmentation feature block: per user at a cutoff,
days-since-last-event, event count, and money total over a lookback —
each cut into population quintiles, composed into the 3-digit RFM
segment code (555 = recent + frequent + big spender). The reference
computes the raw trio per cutoff window (``features/
features_comprehensive.sql:97-296`` amt/count/recency families); the
quintile scoring reuses the engine's scale-safe edge-bucketizer
(``psi.quantile_edges`` + ``bucketize_by_edges``) — NO global sort,
no ntile.

Scale shape: one hash agg reduces the raw events to one row per user;
the quantile edges are ONE tiny aggregate over that reduced table
(12 doubles to the driver — same discipline as PSI / quintile_stats);
scoring is a pure when-chain projection. Two exchanges total at any
scale, both keyed by user_id.

Money sums are DECIMAL-exact before the double cast so partial-agg
order can't wiggle the quintile edges (the events ``value`` column is
2-decimal money; same rationale as ``quintile_bucket_stats``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kkbox_churn_prediction_spark.operators.psi import bucketize_by_edges

_US_PER_DAY = 86_400_000_000.0


def rfm_table(events: DataFrame, lookback_days: int = 28) -> DataFrame:
    """Per-user raw RFM trio at the data-derived cutoff (the Monday
    after the last observed week — same rule as
    ``sources.events.cutoffs_from_events``, computed IN the plan via
    a broadcast one-row aggregate, no driver round-trip)."""
    ev = events.where(F.col("user_id").isNotNull() & F.col("ts").isNotNull()).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    cut = ev.agg(
        (F.date_trunc("week", F.max("ts")) + F.expr("INTERVAL 7 DAYS")).alias("cutoff_ts")
    )
    windowed = ev.join(F.broadcast(cut), how="cross").where(
        (F.col("ts") < F.col("cutoff_ts"))
        & (F.col("ts") >= F.col("cutoff_ts") - F.expr(f"INTERVAL {int(lookback_days)} DAYS"))
    )
    return windowed.groupBy("user_id").agg(
        (
            (F.max(F.unix_micros(F.col("cutoff_ts"))) - F.max(F.unix_micros(F.col("ts"))))
            / F.lit(_US_PER_DAY)
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.coalesce(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), F.lit(0.0)
        ).alias("monetary"),
    )


def rfm_scores(rfm: DataFrame, n_buckets: int = 5) -> DataFrame:
    """Quintile scores 1..n per metric (recency INVERTED: most recent
    = highest score) + the composed segment code. Edges come from ONE
    aggregate over the already-reduced per-user table; ties at an
    edge land in the lower bucket (pandas-qcut semantics, lock-step
    with the DuckDB oracle's strict ``e < value`` count)."""
    ps = [i / n_buckets for i in range(1, n_buckets)]
    arr = ",".join(str(p) for p in ps)
    row = rfm.select(
        F.expr(f"percentile(recency_days, array({arr}))").alias("er"),
        F.expr(f"percentile(frequency, array({arr}))").alias("ef"),
        F.expr(f"percentile(monetary, array({arr}))").alias("em"),
    ).first()
    # empty per-user table: percentile arrays are NULL -> no edges,
    # every score collapses to its floor and the projection below
    # yields zero rows anyway (r5 empty-sweep crash fix)
    def _edges(arr):
        return (
            [round(float(x), 6) for x in arr] if arr is not None else []
        )

    er = _edges(row["er"] if row is not None else None)
    ef = _edges(row["ef"] if row is not None else None)
    em = _edges(row["em"] if row is not None else None)
    r_score = (F.lit(n_buckets) - bucketize_by_edges(F.col("recency_days"), er)).cast("int")
    f_score = (bucketize_by_edges(F.col("frequency").cast("double"), ef) + F.lit(1)).cast("int")
    m_score = (bucketize_by_edges(F.col("monetary"), em) + F.lit(1)).cast("int")
    return rfm.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        r_score.alias("r_score"),
        f_score.alias("f_score"),
        m_score.alias("m_score"),
        (r_score * 100 + f_score * 10 + m_score).cast("int").alias("rfm_segment"),
    )
