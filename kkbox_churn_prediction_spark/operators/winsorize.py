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
    e_lo, e_hi = (round(float(x), 6) for x in row["e"])
    v = F.col(value_col)
    return df.select(
        "*",
        F.greatest(F.least(v, F.lit(e_hi)), F.lit(e_lo)).alias(f"{value_col}_w"),
        (v < F.lit(e_lo)).alias("clipped_low"),
        (v > F.lit(e_hi)).alias("clipped_high"),
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
