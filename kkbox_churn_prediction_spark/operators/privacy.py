"""k-anonymity audit for training-data release.

Before a transcript-derived dataset ships, the standard privacy gate
asks: does any quasi-identifier combination (here: role × tool ×
calendar day — the columns an adversary could cross-reference)
isolate fewer than k distinct entities? Rows in such cells are
re-identification risks and must be generalized or suppressed.

Spark-first shape: ONE two-level aggregate — (QI combo) → distinct
entities + row count (the distinct is Expand-free: pre-distinct on
(combo, entity), then count), followed by a tiny threshold
projection. The audit output is per-combo, so it stays small even at
10^12 rows (bounded by the QI domain, not the data); the summary
rollup is a second aggregate over THAT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_audit(
    turns: DataFrame,
    quasi_cols: tuple[str, ...] = ("role", "tool"),
    entity_col: str = "conv_id",
    k: int = 5,
    *,
    with_day: bool = True,
) -> DataFrame:
    """Per QI combo: distinct entities, row count, and the at-risk
    flag (fewer than k entities). NULL QI values are kept as their
    own class (a NULL tool is itself identifying)."""
    cols = [F.col(c) for c in quasi_cols]
    names = list(quasi_cols)
    if with_day:
        cols.append(F.date_trunc("day", F.col("ts")).alias("day"))
        names.append("day")
    pre = (
        turns.select(*cols, F.col(entity_col).alias("_e"))
        .groupBy(*names, "_e")
        .agg(F.count(F.lit(1)).alias("_rows"))
    )
    per_combo = pre.groupBy(*names).agg(
        F.count(F.lit(1)).cast("long").alias("n_entities"),
        F.sum("_rows").cast("long").alias("n_rows"),
    )
    return per_combo.withColumn("at_risk", F.col("n_entities") < F.lit(int(k)))


def l_diversity_audit(
    turns: DataFrame,
    quasi_cols: tuple[str, ...] = ("role",),
    sensitive_col: str = "tool",
    l: int = 2,
    *,
    with_day: bool = True,
) -> DataFrame:
    """l-diversity audit: per quasi-identifier combo, how many DISTINCT
    values of the sensitive attribute appear. k-anonymity alone is not
    enough — a cell can hold k entities who all share one sensitive
    value, so membership still discloses it (the classic homogeneity
    attack). A release gate wants every QI cell to carry at least
    ``l`` distinct sensitive values.

    NULL sensitive values are their own class (an absent tool is
    itself a disclosure), mirroring :func:`k_anonymity_audit`'s NULL
    policy for QI columns.

    Spark-first shape: the same Expand-free two-level distinct as the
    k-anonymity audit — pre-distinct on (combo, sensitive) with a row
    count, then one per-combo rollup. Output is bounded by the QI
    domain, not the data, so the audit stays tiny at 10^12 rows.
    """
    cols = [F.col(c) for c in quasi_cols]
    names = list(quasi_cols)
    if with_day:
        cols.append(F.date_trunc("day", F.col("ts")).alias("day"))
        names.append("day")
    pre = (
        turns.select(*cols, F.col(sensitive_col).alias("_s"))
        .groupBy(*names, "_s")
        .agg(F.count(F.lit(1)).alias("_rows"))
    )
    per_combo = pre.groupBy(*names).agg(
        F.count(F.lit(1)).cast("long").alias("n_sensitive"),
        F.sum("_rows").cast("long").alias("n_rows"),
    )
    return per_combo.withColumn("is_l_diverse", F.col("n_sensitive") >= F.lit(int(l)))


def k_anonymity_summary(audit: DataFrame) -> DataFrame:
    """One-row release verdict: combos / entities-at-risk-weighted row
    exposure, and the minimum cell size (the dataset's k)."""
    return audit.agg(
        F.count(F.lit(1)).cast("long").alias("n_combos"),
        F.sum(F.col("at_risk").cast("long")).cast("long").alias("n_risky_combos"),
        F.sum(F.when(F.col("at_risk"), F.col("n_rows")).otherwise(F.lit(0)))
        .cast("long")
        .alias("rows_at_risk"),
        F.min("n_entities").cast("long").alias("dataset_k"),
    )
