"""Leakage audit as a first-class operator (J7 / SURVEY §4 custom #4).

Generalizes the reference's assert-zero queries
(``src/make_dataset.py:160-194``: count rows with ``log_date >=
label_date`` joined to the cohort, hard-assert == 0) into an engine
invariant check: given the as-of-joined stream that actually fed the
aggregates, count contributions violating the leak guard, per cutoff.

A clean engine returns violation_cnt = 0 for every cutoff — the row
SET is still non-empty (one row per cutoff) so it doubles as a
smoke-visible audit artifact, like the reference's row-count
validation table (``sql/08_validation.sql:8-37``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def leakage_audit(joined: DataFrame, *, inclusive: bool = False) -> DataFrame:
    """Per-cutoff count of joined rows whose ts violates the guard."""
    viol = F.col("ts") > F.col("cutoff_ts") if inclusive else F.col("ts") >= F.col("cutoff_ts")
    return (
        joined.groupBy("cutoff_ts")
        .agg(
            F.coalesce(F.sum(F.when(viol, 1).otherwise(0)), F.lit(0)).cast("bigint").alias("violation_cnt"),
            F.count(F.lit(1)).alias("contributing_rows"),
        )
    )


def assert_no_leakage(joined: DataFrame, *, inclusive: bool = False) -> None:
    """Hard gate (reference pattern: ValueError below threshold,
    ``src/labels.py:197-198``)."""
    bad = leakage_audit(joined, inclusive=inclusive).where(F.col("violation_cnt") > 0).count()
    if bad:
        raise ValueError(f"temporal leakage: {bad} cutoffs have future contributions")
