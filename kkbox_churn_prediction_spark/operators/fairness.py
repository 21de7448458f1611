"""Group-fairness metrics over a (group, label, decision) frame.

Training-data curation at scale needs per-cohort fairness readouts
before a corpus (or a filter that gates it) ships: demographic
parity (does the filter admit each language/source at the same
rate?) and equalized odds (are its error rates balanced across
cohorts?). The reference's per-slice error analysis
(``src/error_analysis.py:116-170``) computes per-segment accuracy
gaps; these are the standard fairness formalizations of the same
readout (Hardt et al., "Equality of Opportunity in Supervised
Learning", NeurIPS'16 — public method).

Shape: ONE conditional-count hash agg per group (tp/fp/fn/tn as
exact integers), overall totals as a one-row broadcast — the
engine's tiny-aggregate pattern. Every rate is a single double
division; gaps are differences of those rates. No window, no
Python, no second scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def group_fairness(
    df: DataFrame,
    group: Column,
    label: Column,
    decision: Column,
) -> DataFrame:
    """Per-group confusion counts + fairness gaps vs the pooled rates.

    Emits per group: ``n``, ``tp fp fn tn``, ``pos_rate`` (share of
    positive decisions — demographic parity when equal), ``tpr`` /
    ``fpr`` (equalized odds when both equal), and the gaps
    ``dp_gap = pos_rate − overall_pos_rate``, ``tpr_gap``,
    ``fpr_gap``. Degenerate cohorts (no positives / no negatives)
    emit 0.0 rates rather than NULL so the gap columns stay defined.
    """
    tagged = df.select(
        group.alias("grp"),
        label.cast("int").alias("y"),
        decision.cast("int").alias("yhat"),
    ).where(F.col("grp").isNotNull() & F.col("y").isNotNull() & F.col("yhat").isNotNull())

    def cnt(y: int, yhat: int) -> Column:
        return (
            F.sum(
                F.when((F.col("y") == y) & (F.col("yhat") == yhat), 1).otherwise(0)
            )
            .cast("long")
        )

    per = tagged.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        cnt(1, 1).alias("tp"),
        cnt(0, 1).alias("fp"),
        cnt(1, 0).alias("fn"),
        cnt(0, 0).alias("tn"),
    )
    tot = tagged.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        cnt(1, 1).alias("_tp"),
        cnt(0, 1).alias("_fp"),
        cnt(1, 0).alias("_fn"),
        cnt(0, 0).alias("_tn"),
    )

    def rate(num: Column, den: Column) -> Column:
        return F.when(
            den > 0, num.cast("double") / den.cast("double")
        ).otherwise(F.lit(0.0))

    pos_rate = rate(F.col("tp") + F.col("fp"), F.col("n"))
    tpr = rate(F.col("tp"), F.col("tp") + F.col("fn"))
    fpr = rate(F.col("fp"), F.col("fp") + F.col("tn"))
    o_pos = rate(F.col("_tp") + F.col("_fp"), F.col("_n"))
    o_tpr = rate(F.col("_tp"), F.col("_tp") + F.col("_fn"))
    o_fpr = rate(F.col("_fp"), F.col("_fp") + F.col("_tn"))
    return per.crossJoin(F.broadcast(tot)).select(
        F.col("grp").alias("group"),
        "n",
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(pos_rate, 6).alias("pos_rate"),
        F.round(tpr, 6).alias("tpr"),
        F.round(fpr, 6).alias("fpr"),
        F.round(pos_rate - o_pos, 6).alias("dp_gap"),
        F.round(tpr - o_tpr, 6).alias("tpr_gap"),
        F.round(fpr - o_fpr, 6).alias("fpr_gap"),
    )
