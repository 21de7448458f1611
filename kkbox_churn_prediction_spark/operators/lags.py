"""Lag/lead turn features over stable (conv_id, turn_idx) ordering.

North-star axis-A operator. Reference analogs: stable ROW_NUMBER
ordering W1 (``src/labels.py:92-97``) and month-lag churn history
(``src/historical_features.py:169-173`` — ``last_{i}_is_churn`` ≡
``lag(outcome, i)``). All JVM-side window expressions; the only
shuffle is the hash partition on conv_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def turn_order_window():
    """THE stable ordering: (conv_id, ts, turn_idx).

    turn_idx breaks ts ties deterministically — the per-turn text
    equality invariant (input_hint) is checked under this ordering.
    """
    return Window.partitionBy("conv_id").orderBy("ts", "turn_idx")


def lag_lead_features(turns: DataFrame, ks: tuple[int, ...] = (1,)) -> DataFrame:
    """Per-turn neighbors: prev/next text length (k steps), gap to
    previous turn in micros, same-role-as-previous flag."""
    w = turn_order_window()
    tl = F.expr("CAST(length(text) AS BIGINT)")
    out = turns.withColumn("text_len", tl)
    for k in ks:
        out = out.withColumn(
            f"prev_text_len_{k}", F.coalesce(F.lag("text_len", k).over(w), F.lit(-1))
        ).withColumn(
            f"next_text_len_{k}", F.coalesce(F.lead("text_len", k).over(w), F.lit(-1))
        )
    out = out.withColumn(
        "gap_micros_prev",
        F.coalesce(
            F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts", 1).over(w)), F.lit(-1)
        ),
    ).withColumn(
        "same_role_as_prev",
        F.when(F.lag("role", 1).over(w).isNull(), F.lit(-1))
        .when(F.lag("role", 1).over(w) == F.col("role"), F.lit(1))
        .otherwise(F.lit(0)),
    )
    return out


def stable_row_number(turns: DataFrame) -> DataFrame:
    """W1: dense stable ordering check column (``rn`` should equal
    ``turn_idx`` when the producer's ordering invariant holds)."""
    return turns.withColumn(
        "rn", (F.row_number().over(turn_order_window()) - F.lit(1)).cast("int")
    )
