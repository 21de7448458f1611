"""Dense sample indexing and deterministic negative sampling.

Contrastive / ranking objectives need (anchor, negative) pairs drawn
uniformly from the corpus — at 10^12 rows that draw must be a pure
projection, not a shuffle or an RNG whose replay differs across task
retries. Both operators here are deterministic in the DATA:

- :func:`dense_index` assigns the global sort rank 0..N−1 WITHOUT a
  global sort: quantile edges bucket the order column (reusing the
  PSI edge machinery), per-bucket counts give bucket offsets (a tiny
  table), and a per-bucket row_number completes the rank. One
  balanced shuffle keyed by bucket; the classic two-phase ranking.
- :func:`negative_samples` draws k pseudo-random negatives per anchor
  over a dense id space [0, N) with the shift trick
  (``c = hash(id,i) mod (N−1); c ≥ id → c+1``), which is exactly
  uniform over all ids ≠ anchor — no rejection loop, no rand(), and
  the same md5-based hash both engines can compute.

The reference samples negatives in pandas with ``np.random`` — fine
at notebook scale, unreplayable at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kkbox_churn_prediction_spark.functions.text import stable_hash48
from kkbox_churn_prediction_spark.operators.psi import (
    bucketize_by_edges,
    quantile_edges,
)


def dense_index(
    df: DataFrame,
    order_col: str,
    *,
    n_buckets: int = 256,
    out_col: str = "idx",
) -> DataFrame:
    """Add the global ascending rank of ``order_col`` (must be unique;
    ties would make ranks ambiguous) as ``out_col`` ∈ [0, N).

    Plan: approx-quantile edges (one pass) → bucket id projection →
    per-bucket counts → cumulative offsets over the ≤n_buckets rows →
    broadcast back → per-bucket row_number. The only full-data
    exchange is the bucket shuffle, balanced by the quantile edges —
    never a single-partition Window.orderBy.
    """
    edges = quantile_edges(df, order_col, n_bins=n_buckets, exact=False)
    bucketed = df.withColumn(
        "_bkt", bucketize_by_edges(F.col(order_col).cast("double"), edges)
    )
    counts = bucketed.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_c"))
    w = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_bkt", F.coalesce(F.sum("_c").over(w), F.lit(0)).alias("_off")
    )
    wb = Window.partitionBy("_bkt").orderBy(order_col)
    return (
        bucketed.join(F.broadcast(offsets), on="_bkt")
        .withColumn(
            out_col,
            (F.col("_off") + F.row_number().over(wb) - F.lit(1)).cast("bigint"),
        )
        .drop("_bkt", "_off")
    )


def negative_samples(
    df: DataFrame, id_col: str, k: int, *, out_prefix: str = "neg"
) -> DataFrame:
    """k negatives per anchor: ``(id_col, <prefix>_idx, <prefix>_id)``
    with ``neg_id`` uniform over the OTHER ids. Requires a dense id
    space 0..N−1 (run :func:`dense_index` first if ids are sparse) —
    density is what lets the draw be arithmetic instead of a join.

    Pure projection after a broadcast 1-row count: no shuffle, no
    state, replay-identical across retries and resumes.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    tot = df.agg(F.count(F.lit(1)).alias("_n"))
    anchors = df.select(id_col).crossJoin(F.broadcast(tot))
    exploded = anchors.select(
        id_col,
        "_n",
        F.explode(F.sequence(F.lit(0), F.lit(int(k) - 1))).alias(
            f"{out_prefix}_idx"
        ),
    )
    h = stable_hash48(
        F.concat(
            F.col(id_col).cast("string"),
            F.lit(":"),
            F.col(f"{out_prefix}_idx").cast("string"),
        )
    )
    cand = F.pmod(h, F.col("_n") - 1)
    neg = F.when(cand >= F.col(id_col), cand + 1).otherwise(cand)
    return exploded.select(
        id_col,
        F.col(f"{out_prefix}_idx").cast("int").alias(f"{out_prefix}_idx"),
        neg.cast("bigint").alias(f"{out_prefix}_id"),
    )
