"""Pareto frontier (skyline) over two maximized measures.

The data-curation tradeoff readout: which documents are NOT strictly
dominated on (quality, length) — i.e. no other document is at least as
good on both axes and strictly better on one. The frontier is what a
budgeted selection policy actually chooses from; everything below it
is dominated by construction (the 2-D special case of the classic
skyline operator, Börzsönyi et al. 2001).

Distributed shape (no global sort of the data): strict 2-D dominance
collapses to a prefix-max scan over the DISTINCT x values —
``y_max(x) > max(y_max(x')) for all x' > x`` — and the engine runs
that scan with the bucketed carry device (``lags.py`` watermark
machinery): per-x maxima hash-agg, integer buckets over x, a
bucket-partitioned window for the within-bucket prefix, and a
running max over the ≤ ``n_buckets``-row bucket table broadcast back
as carry-in. The raw table is touched by exactly two hash aggs and
one join; nothing data-sized ever passes through a single partition.

Reference parity anchor: the reference has no skyline; this extends
its quality-score ranking (`src/error_analysis.py` quantile reports)
to the multi-objective selection frontier a corpus-curation pipeline
needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pareto_frontier_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    id_cols: tuple[str, ...] = ("doc_id",),
    n_buckets: int = 1000,
) -> DataFrame:
    """Rows of ``df`` on the strict-dominance Pareto frontier when
    BOTH ``x_col`` and ``y_col`` are maximized.

    A row survives iff its ``y`` equals the max ``y`` at its exact
    ``x`` AND that max strictly exceeds every max-``y`` at any
    strictly greater ``x`` (ties on both axes all survive — none
    strictly dominates another).

    ``n_buckets`` governs the carry table: x is ranged into
    ``floor((x - x_min) / span * n_buckets)`` integer buckets, so the
    only unpartitioned window in the plan runs over ≤ ``n_buckets``+1
    rows regardless of data size.

    Output: the surviving input rows (id columns + the two measures),
    one row per surviving input row.
    """
    x, y = F.col("_x"), F.col("_y")
    base = df.select(
        *[F.col(c) for c in id_cols],
        F.col(x_col).alias("_x"),
        F.col(y_col).alias("_y"),
    )
    per_x = base.groupBy("_x").agg(F.max("_y").alias("_ymax"))

    bounds = per_x.agg(
        F.min("_x").alias("_lo"), F.max("_x").alias("_hi")
    )
    span = F.when(
        F.col("_hi") > F.col("_lo"), F.col("_hi") - F.col("_lo")
    ).otherwise(F.lit(1.0))
    bucketed = per_x.crossJoin(F.broadcast(bounds)).select(
        "_x",
        "_ymax",
        F.least(
            F.floor((x - F.col("_lo")) / span * F.lit(int(n_buckets))),
            F.lit(int(n_buckets) - 1),
        )
        .cast("long")
        .alias("_bkt"),
    )
    # within-bucket prefix max over STRICTLY greater x (per-x maxima
    # are distinct on x, so "previous rows in x-desc order" = x' > x)
    w_in = (
        Window.partitionBy("_bkt")
        .orderBy(F.desc("_x"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = bucketed.withColumn("_pm_in", F.max("_ymax").over(w_in))
    # cross-bucket carry: max _ymax of every strictly HIGHER bucket —
    # a running max over the ≤ n_buckets-row bucket table
    per_bucket = bucketed.groupBy("_bkt").agg(F.max("_ymax").alias("_bmax"))
    w_carry = (
        Window.orderBy(F.desc("_bkt"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = per_bucket.select(
        "_bkt", F.max("_bmax").over(w_carry).alias("_pm_carry")
    )
    sky = (
        within.join(F.broadcast(carry), "_bkt")
        .select(
            "_x",
            "_ymax",
            F.greatest(
                F.coalesce("_pm_in", F.lit(float("-inf"))),
                F.coalesce("_pm_carry", F.lit(float("-inf"))),
            ).alias("_pm"),
        )
        .where(F.col("_ymax") > F.col("_pm"))
        # fresh aliases break the self-join lineage back to `base`
        .select(F.col("_x").alias("_sx"), F.col("_ymax").alias("_sy"))
    )
    return (
        base.join(
            F.broadcast(sky),
            (F.col("_x") == F.col("_sx")) & (F.col("_y") == F.col("_sy")),
        )
        .select(
            *[F.col(c) for c in id_cols],
            F.col("_x").alias(x_col),
            F.col("_y").alias(y_col),
        )
    )
