"""Welch's t-test A/B statistics as one algebraic aggregate.

The reference's error analysis compares metric means across slices
(``src/error_analysis.py``) but never tests significance; the
standard production companion is Welch's unequal-variance t —
assignment-checksum A/B comparisons, drift triage, holdout vs
treatment. Everything reduces to (n, mean, sample-variance) per
group — ONE partial+final hash aggregate at any scale — followed by
scalar algebra on the two-row result (t statistic,
Welch–Satterthwaite degrees of freedom, Cohen's d). No sort, no
window, no Python.

Group assignment for the driver gate is the engine's deterministic
hash parity (``stable_hash48`` even/odd — the same cross-engine
device the calibration fixtures use), so both engines derive
identical cohorts without RNG.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def welch_t_stats(
    df: DataFrame, metric: Column, group: Column, group_a: str = "a", group_b: str = "b"
) -> DataFrame:
    """Single-row Welch comparison of ``metric`` between the two
    values of ``group``. Emits per-group n/mean/var plus t,
    Welch–Satterthwaite df, and Cohen's d (pooled-SD flavor).
    Degenerate variance (either group constant or singleton) yields
    t = 0.0 / df = 0.0 rather than a NaN surprise."""
    per_group = df.select(metric.alias("m"), group.alias("g")).groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("m").alias("mean"),
        F.var_samp("m").alias("var"),
    )
    a = F.when(F.col("g") == group_a, F.col("n"))
    b = F.when(F.col("g") == group_b, F.col("n"))
    one = per_group.agg(
        F.sum(a).cast("long").alias("n_a"),
        F.sum(b).cast("long").alias("n_b"),
        F.sum(F.when(F.col("g") == group_a, F.col("mean"))).alias("mean_a"),
        F.sum(F.when(F.col("g") == group_b, F.col("mean"))).alias("mean_b"),
        F.sum(F.when(F.col("g") == group_a, F.col("var"))).alias("var_a"),
        F.sum(F.when(F.col("g") == group_b, F.col("var"))).alias("var_b"),
    )
    se_a = F.col("var_a") / F.col("n_a")
    se_b = F.col("var_b") / F.col("n_b")
    se2 = se_a + se_b
    t = F.when(se2 > 0, (F.col("mean_a") - F.col("mean_b")) / F.sqrt(se2))
    dfree = F.when(
        (se2 > 0) & (F.col("n_a") > 1) & (F.col("n_b") > 1),
        (se2 * se2)
        / (
            se_a * se_a / (F.col("n_a") - 1)
            + se_b * se_b / (F.col("n_b") - 1)
        ),
    )
    pooled = (
        (F.col("n_a") - 1) * F.col("var_a") + (F.col("n_b") - 1) * F.col("var_b")
    ) / (F.col("n_a") + F.col("n_b") - 2)
    d = F.when(pooled > 0, (F.col("mean_a") - F.col("mean_b")) / F.sqrt(pooled))
    return one.select(
        "n_a",
        "n_b",
        "mean_a",
        "mean_b",
        "var_a",
        "var_b",
        F.coalesce(t, F.lit(0.0)).alias("t_stat"),
        F.coalesce(dfree, F.lit(0.0)).alias("welch_df"),
        F.coalesce(d, F.lit(0.0)).alias("cohens_d"),
    )
