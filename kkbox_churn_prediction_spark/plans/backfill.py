"""End-to-end point-in-time feature backfill — the flagship plan.

Equivalent of the reference's ``make backtest`` lifecycle
(``src/backtest.py:65-82`` build_features per fold): label_index →
as-of join → windowed aggregates → wide feature matrix with COALESCE
defaults. The reference templates SQL text per fold and materializes
a pandas frame per fold; here the cutoff grid is DATA (a broadcast
DataFrame), all folds compute in ONE plan, and nothing crosses the
driver boundary.

Plan shape (``.explain("formatted")``-verified):

  parquet scan (pruned: event cols only, null filters pushed)
    → broadcast nested-loop join on range predicate (no fact shuffle)
    → ONE partial+final hash aggregate on (conv_id, cutoff_ts)
    → AQE-sized shuffle → left join onto grid for default rows

At 10^12 turns: the scan is Iceberg partitioned by days(ts), so the
lookback predicate prunes partitions; the single shuffle is keyed by
(conv_id, cutoff_ts) — high cardinality, no hotspots except
mega-conversations, which AQE skew handling splits (the agg is
algebraic, so partial aggregation already collapses each mapper's
slice of a hot key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kkbox_churn_prediction_spark.operators.asof import asof_join_broadcast_cutoffs
from kkbox_churn_prediction_spark.operators.horizons import (
    DEFAULT_SPECS,
    FeatureSpec,
    attach_grid_defaults,
    multi_horizon_aggregate,
)
from kkbox_churn_prediction_spark.sources.events import (
    conversations_from_events,
    cutoff_grid,
    cutoffs_from_events,
)


def backfill_features(
    conversations: DataFrame,
    cutoffs: DataFrame,
    horizons_days: tuple[int, ...] = (1, 3, 7),
    specs: tuple[FeatureSpec, ...] = DEFAULT_SPECS,
    *,
    inclusive: bool = False,
    lookback_days=None,
    full_window: bool = False,
) -> DataFrame:
    """Compute the entity×cutoff feature matrix.

    Leak-safe by construction: every turn reaching an aggregate passed
    the as-of range predicate (strictly-prior by default). The
    superset window is max(horizons) unless ``lookback_days``
    overrides it — pass a Column carried on ``cutoffs`` for PER-FOLD
    lookbacks (expanding CV policy, see ``plans.folds``), with
    ``full_window=True`` to also emit whole-window aggregates.
    Sub-horizons are conditional aggregates (single pass, see
    ``operators.horizons``).
    """
    max_h = lookback_days if lookback_days is not None else max(horizons_days)
    # project-before-replicate: the as-of join multiplies every turn by
    # its qualifying cutoffs (and countDistinct adds an Expand on top),
    # so each byte carried into the join is amplified ~#cutoffs×#aggs.
    # Reduce text to its length and role to a flag BEFORE the join —
    # at bench scale this cut allocation pressure enough to restore
    # 8→32-core scaling (strings were ~10× the replicated volume).
    from pyspark.sql import functions as F

    narrow = conversations.select(
        "conv_id",
        "ts",
        F.expr("CAST(length(text) AS BIGINT)").alias("text_len"),
        F.expr("CASE WHEN role = 'user' THEN 1 END").alias("is_user"),
        "tool",
    )
    joined = asof_join_broadcast_cutoffs(
        narrow, cutoffs, lookback_days=max_h, inclusive=inclusive
    )
    feats = multi_horizon_aggregate(
        joined, horizons_days, specs, full_window=full_window
    )
    # grid wants bare cutoff timestamps; only de-dup when extra fold
    # metadata (e.g. lookback_days) rides on the cutoff frame — the
    # common path keeps the round-1 plan (no extra distinct stage)
    grid_cutoffs = cutoffs
    if set(cutoffs.columns) != {"cutoff_ts"}:
        grid_cutoffs = cutoffs.select("cutoff_ts").distinct()
    grid = cutoff_grid(conversations.select("conv_id"), grid_cutoffs)
    return attach_grid_defaults(feats, grid, specs, horizons_days)


def backfill_from_events(
    spark: SparkSession,
    sf_dir: str,
    horizons_days: tuple[int, ...] = (1, 3, 7),
) -> DataFrame:
    """Flagship query over the driver testdata: derive transcripts from
    ``events.parquet``, weekly cutoffs, full feature matrix."""
    conv = conversations_from_events(spark, sf_dir)
    cutoffs = cutoffs_from_events(spark, sf_dir)
    return backfill_features(conv, cutoffs, horizons_days)
