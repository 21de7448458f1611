"""Mergeable distinct-count sketches (HLL) for pre-aggregated rollups.

The pattern exact COUNT(DISTINCT) cannot give you at 10^12 rows: keep
ONE small sketch per (bucket, dimension) — e.g. per day — and answer
any coarser window (week, month, arbitrary range) by MERGING sketches
instead of rescanning the raw stream. Exactness is traded for a
bounded relative error (~1.6%/√(2^lgK)) and, crucially,
associativity: union(day sketches) ≡ sketch(union of days), so
incremental backfills (``plans/incremental.py``) can maintain the
daily layer and every report window derives from it.

Spark 4 ships Apache DataSketches HLL natively
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``) —
JVM aggregates with map-side partials, no UDF. The reference's
``COUNT(DISTINCT log_date)``-family features
(``features/features_comprehensive.sql:187``) are the exact
small-scale counterpart.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucket_sketches(
    df: DataFrame,
    fine_bucket: Column,
    value_col: str,
    *,
    coarse_bucket: Column | None = None,
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch (binary) + exact distinct per fine bucket — the
    stored base layer. ``coarse_bucket`` (a function of the same row,
    e.g. the week of the day) rides along as a grouping key so later
    rollups are a plain groupBy on the stored table. ``lg_k=12`` ≈
    1.6% rel. std. error at ≤4 KB per sketch."""
    keys = [fine_bucket.alias("bucket")]
    if coarse_bucket is not None:
        keys.append(coarse_bucket.alias("coarse"))
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("sketch"),
        F.countDistinct(value_col).alias("exact_distinct"),
    )


def rollup_sketches(base: DataFrame, coarse_col: str = "coarse") -> DataFrame:
    """Merge base-layer sketches up to ``coarse_col`` and estimate:
    (bucket, estimate). The raw stream is never touched — that is the
    entire point of storing sketches."""
    merged = base.groupBy(F.col(coarse_col).alias("bucket")).agg(
        F.hll_union_agg("sketch").alias("sketch")
    )
    return merged.select(
        "bucket",
        F.hll_sketch_estimate("sketch").cast("double").alias("estimate"),
    )


def distinct_rollup_check(
    df: DataFrame,
    fine_bucket: Column,
    coarse_bucket: Column,
    value_col: str,
    *,
    lg_k: int = 12,
    rel_tol: float = 0.05,
) -> DataFrame:
    """Audit row per coarse bucket: exact distinct, the fine→coarse
    sketch-MERGE estimate, and whether the estimate sits within
    ``rel_tol``. DataSketches HLL is content-deterministic, so the
    boolean is gate-able against an oracle that asserts the tolerance
    holds. Output: ``bucket, exact_distinct, within_tol``."""
    base = bucket_sketches(
        df, fine_bucket, value_col, coarse_bucket=coarse_bucket, lg_k=lg_k
    )
    est = rollup_sketches(base)
    exact = df.groupBy(coarse_bucket.alias("bucket")).agg(
        F.countDistinct(value_col).cast("bigint").alias("exact_distinct")
    )
    return exact.join(est, on="bucket", how="inner").select(
        "bucket",
        "exact_distinct",
        (
            F.abs(F.col("estimate") - F.col("exact_distinct"))
            <= F.lit(float(rel_tol)) * F.col("exact_distinct")
        ).alias("within_tol"),
    )


def binned_quantile_rollup(
    df: DataFrame,
    value: Column,
    fine_bucket: Column,
    coarse_bucket: Column,
    *,
    bin_width: int = 50,
    ps: tuple[float, ...] = (0.5, 0.9),
) -> DataFrame:
    """Mergeable QUANTILE sketch rollup — the quantile member of the
    sketch family (HLL = distinct, CMS = frequency, this = rank):
    fixed-width bin counts per fine bucket are the stored base layer;
    any coarser window's quantiles come from MERGING bin counts
    (plain sum — associative like the HLL union) and interpolating
    the binned CDF. Error is bounded by ``bin_width`` (the estimate
    is exact if values were uniform within a bin), and the base layer
    is what an incremental backfill maintains.

    Output: ``(coarse, p, est)`` — estimated p-quantile of ``value``
    per coarse bucket, linear interpolation inside the covering bin:
    ``est = bin*w + w * (p*total − cum_below) / bin_count``.

    Shape: ONE (fine, coarse, bin) count agg over the stream (the
    only data-sized exchange); the weekly merge, CDF window, and
    quantile selection all run on the bins table, which is bounded by
    buckets × (value range / bin_width). The p-grid is a broadcast
    literal frame.
    """
    from pyspark.sql import Window

    w = int(bin_width)
    base = (
        df.select(
            fine_bucket.alias("fine"),
            coarse_bucket.alias("coarse"),
            F.floor(value / w).cast("bigint").alias("bin"),
        )
        .groupBy("fine", "coarse", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    merged = base.groupBy("coarse", "bin").agg(F.sum("cnt").alias("cnt"))
    cdf = merged.withColumn(
        "cum",
        F.sum("cnt").over(
            Window.partitionBy("coarse").orderBy("bin").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    ).withColumn(
        "total", F.sum("cnt").over(Window.partitionBy("coarse"))
    )
    spark = df.sparkSession
    p_grid = spark.createDataFrame([(float(p),) for p in ps], "p double")
    eligible = cdf.crossJoin(F.broadcast(p_grid)).where(
        F.col("cum") >= F.col("p") * F.col("total")
    )
    chosen = eligible.groupBy("coarse", "p").agg(
        F.min_by(
            F.struct("bin", "cnt", "cum", "total"), F.col("bin")
        ).alias("s")
    )
    return chosen.select(
        "coarse",
        "p",
        F.round(
            F.col("s.bin") * w
            + w
            * (F.col("p") * F.col("s.total") - (F.col("s.cum") - F.col("s.cnt")))
            / F.col("s.cnt"),
            6,
        ).alias("est"),
    )
