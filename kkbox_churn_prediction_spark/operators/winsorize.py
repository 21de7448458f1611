"""Winsorization: percentile clipping for feature hygiene.

Standard preprocessing before scaling/training: clamp a numeric
feature at its [p_lo, p_hi] percentiles so tail outliers (a 10^6-token
mega-document, a runaway counter) can't dominate normalization or
gradient steps. The reference clips by FIXED bounds in its range
cleaning (P5, ``features_comprehensive.sql`` clamp CASEs); the
percentile version is the data-driven generalization.

Shape: ONE tiny percentile aggregate (two doubles to the driver —
same discipline as ``psi.quantile_edges``; swap to
``approx_percentile`` via ``exact=False`` at 10^12 rows), then a pure
``greatest/least`` projection with clip-direction flags so the audit
("how much did we clip?") is one more aggregate away. No sort, no
window, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def winsorize(
    df: DataFrame,
    value_col: str,
    lo: float = 0.01,
    hi: float = 0.99,
    *,
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Append ``<col>_w`` (the clipped value) plus ``clipped_low`` /
    ``clipped_high`` flags. Edges are rounded to 6 dp (the engine's
    cross-engine float boundary)."""
    fn = (
        f"percentile({value_col}, array({lo}, {hi}))"
        if exact
        else f"approx_percentile({value_col}, array({lo}, {hi}), {int(accuracy)})"
    )
    row = df.where(F.col(value_col).isNotNull()).select(F.expr(fn).alias("e")).first()
    if row is None or row["e"] is None:
        # empty/all-NULL input: no percentile edges exist -> NULL
        # clip bounds propagate NULL outputs (zero rows in practice;
        # r5 empty-sweep crash fix)
        lo_l = hi_l = F.lit(None).cast("double")
    else:
        e_lo, e_hi = (round(float(x), 6) for x in row["e"])
        lo_l, hi_l = F.lit(e_lo), F.lit(e_hi)
    v = F.col(value_col)
    return df.select(
        "*",
        F.greatest(F.least(v, hi_l), lo_l).alias(f"{value_col}_w"),
        (v < lo_l).alias("clipped_low"),
        (v > hi_l).alias("clipped_high"),
    )


def winsorize_audit(clipped: DataFrame, value_col: str) -> DataFrame:
    """One-row clip report: row count, clipped fractions, and the mass
    removed (mean shift) — the sanity numbers a feature pipeline logs
    next to the transform."""
    n = F.count(F.lit(1))
    return clipped.agg(
        n.cast("long").alias("n"),
        (F.sum(F.col("clipped_low").cast("long")) / n).alias("frac_clipped_low"),
        (F.sum(F.col("clipped_high").cast("long")) / n).alias("frac_clipped_high"),
        (F.avg(value_col) - F.avg(f"{value_col}_w")).alias("mean_shift"),
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    k: float = 3.0,
    consistency: float = 1.4826,
) -> DataFrame:
    """Robust per-group outlier flags via median/MAD: a row is an
    outlier when ``|x − median_g| > k · 1.4826 · MAD_g`` (the normal-
    consistent robust z-score — immune to the very outliers a
    mean/std rule absorbs; companion to the percentile winsorizer and
    ``encoders.standardize_by_group``).

    Two grouped EXACT percentile aggs (median of x, then median of
    |x − median|) — buffers bounded by group size, the gap_percentiles
    scale contract — joined back on the group key. Zero-MAD groups
    (≥half the group identical) flag only values ≠ median.
    """
    med = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("_med")
    )
    with_med = df.join(med, group_col)
    mad = (
        with_med.withColumn("_adev", F.abs(F.col(value_col) - F.col("_med")))
        .groupBy(group_col)
        .agg(F.expr("percentile(_adev, 0.5)").alias("_mad"))
    )
    out = with_med.join(mad, group_col)
    thresh = F.lit(float(k)) * F.lit(float(consistency)) * F.col("_mad")
    dev = F.abs(F.col(value_col) - F.col("_med"))
    return out.select(
        group_col,
        value_col,
        F.round("_med", 6).alias("group_median"),
        F.round("_mad", 6).alias("group_mad"),
        F.when(F.col("_mad") > 0, (dev > thresh).cast("int"))
        .otherwise((dev > 0).cast("int"))
        .alias("is_outlier"),
    )


def mad_by_group(
    df: DataFrame,
    value_col: str,
    group_col: str,
    *,
    scale: float = 1.4826,
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Median absolute deviation per group — the robust scale
    estimate outlier screens should prefer over stddev (one wild
    value moves σ, not the MAD; ``scale=1.4826`` makes it consistent
    with σ under normality). Output per group: ``(group, n, median,
    mad, mad_scaled)``. Pairs with :func:`winsorize_value` (which
    clips by quantile) and the Mahalanobis screen (which assumes
    moments): MAD is the screen to trust when the data has already
    failed those assumptions.

    Two exact-percentile passes (value median, then deviation
    median): same A10 exactness/oracle discipline — and the same
    scale caveat — as ``session_length_percentiles``; ``exact=False``
    switches both passes to ``approx_percentile`` (GK sketch,
    bounded memory, the 10^12-row default).

    Shape: group-keyed agg → join the group-sized median table back
    (same key, AQE reuses the partitioning) → second group-keyed agg.
    """
    if exact:
        med_expr = f"percentile({value_col}, 0.5)"
        dev_expr = "percentile(_adev, 0.5)"
    else:
        med_expr = f"approx_percentile({value_col}, 0.5, {int(accuracy)})"
        dev_expr = f"approx_percentile(_adev, 0.5, {int(accuracy)})"
    meds = df.groupBy(group_col).agg(
        F.expr(med_expr).alias("_med"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    dev = df.join(meds, group_col).withColumn(
        "_adev", F.abs(F.col(value_col) - F.col("_med"))
    )
    out = dev.groupBy(group_col).agg(
        F.max("n").alias("n"),
        F.round(F.max("_med"), 6).alias("median"),
        F.round(F.expr(dev_expr), 6).alias("mad"),
    )
    return out.withColumn(
        "mad_scaled", F.round(F.col("mad") * F.lit(float(scale)), 6)
    )
