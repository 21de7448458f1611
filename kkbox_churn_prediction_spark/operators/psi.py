"""PSI drift statistics as binned groupBy-agg (A11).

The reference computes PSI driver-side in numpy per feature
(``src/psi.py:18-34``: decile edges via ``np.quantile`` on the
reference window, histogram both windows, ``Σ (a-e)·ln(a/e)`` with a
1e-6 clip; categorical variant ``:96-102`` via value_counts). That
loops features in Python and concatenates whole feature frames in
pandas — fine at 1 row/entity, fatal at 10^12 turns.

Re-expressed distributed (north-star: "PSI re-expressed as binned
groupBy-agg across backtest folds"):

1. bin each value — either fixed-width (:func:`fixed_width_bins`,
   fully deterministic, oracle-checkable) or reference-window decile
   edges (:func:`quantile_edges`, exact percentiles, matching
   ``np.quantile`` on the ref fold),
2. ``groupBy(fold, bin).count()`` — one shuffle, map-side partials,
3. normalize to frequencies per fold with a window sum, clip at
   1e-6 (``src/psi.py:22-23``), and reduce Σ(a-e)·ln(a/e) per
   feature — all column expressions, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

CLIP = 1e-6  # src/psi.py:22-23 np.clip floor


def fixed_width_bins(value: Column, width: float, n_bins: int) -> Column:
    """floor(value/width) clamped to [0, n_bins-1]."""
    b = F.floor(value / F.lit(float(width)))
    return F.least(F.greatest(b, F.lit(0)), F.lit(int(n_bins) - 1)).cast("int")


def quantile_edges(df: DataFrame, value_col: str, n_bins: int = 10) -> list[float]:
    """Exact decile edges on the reference fold (``np.quantile``
    analog — exact, not approx, because the reference is exact).
    Driver-side list of n_bins-1 interior edges."""
    ps = [i / n_bins for i in range(1, n_bins)]
    row = df.select(
        F.expr(
            f"percentile({value_col}, array({','.join(str(p) for p in ps)}))"
        ).alias("e")
    ).first()
    return [float(x) for x in row["e"]]


def bucketize_by_edges(value: Column, edges: list[float]) -> Column:
    """width_bucket-style when-chain over interior edges (bin i =
    value <= edges[i], last bin = above all edges)."""
    expr = F.lit(len(edges))
    for i in reversed(range(len(edges))):
        expr = F.when(value <= F.lit(edges[i]), F.lit(i)).otherwise(expr)
    return expr.cast("int")


def psi_from_bins(binned: DataFrame, fold_col: str, bin_col: str, ref_fold: str) -> DataFrame:
    """PSI of every fold vs ``ref_fold`` from a (fold, bin) stream.

    Input: one row per observation with fold + bin columns. Output:
    one row per non-reference fold with its PSI (round 6).
    """
    counts = binned.groupBy(fold_col, bin_col).agg(F.count(F.lit(1)).alias("n"))
    total = Window.partitionBy(fold_col)
    freqs = counts.withColumn(
        "freq", F.col("n").cast("double") / F.sum("n").over(total)
    )
    # dense fold×bin grid so a bin missing from either side still
    # contributes its clipped term (a bin absent from BOTH folds
    # contributes 0, so observed-bins == full-range grid)
    bins = counts.select(bin_col).distinct()
    cur_folds = counts.select(fold_col).where(F.col(fold_col) != ref_fold).distinct()
    grid = cur_folds.crossJoin(F.broadcast(bins))
    ref = freqs.where(F.col(fold_col) == ref_fold).select(
        bin_col, F.col("freq").alias("ref_freq")
    )
    cur = freqs.where(F.col(fold_col) != ref_fold).select(fold_col, bin_col, "freq")
    joined = (
        grid.join(cur, [fold_col, bin_col], "left")
        .join(F.broadcast(ref), [bin_col], "left")
        .select(
            F.col(fold_col),
            F.greatest(F.coalesce(F.col("freq"), F.lit(0.0)), F.lit(CLIP)).alias("a"),
            F.greatest(F.coalesce(F.col("ref_freq"), F.lit(0.0)), F.lit(CLIP)).alias("e"),
        )
    )
    return (
        joined.groupBy(fold_col)
        .agg(F.round(F.sum((F.col("a") - F.col("e")) * F.log(F.col("a") / F.col("e"))), 6).alias("psi"))
    )
