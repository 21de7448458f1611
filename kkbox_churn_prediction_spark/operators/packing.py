"""Deterministic sequence packing: assign documents to fixed
token-capacity context bins.

Training pipelines pack variable-length documents into fixed-size
context windows (e.g. 8k tokens) to avoid padding waste. True
first-fit bin packing is sequential; the scalable standard is
offset bucketing: fix a deterministic order, take the running token
offset, and cut a bin every ``capacity`` tokens. Bins can overflow
by at most one document (the straddler starts in the bin its offset
lands in) — the same contract as block-based packing in data loaders.

Distributed shape: documents shard by a stable hash of their id
(``n_shards`` bounds every sort), the running offset is one window
cumulative sum per shard, and the bin index is integer arithmetic —
no UDF, no global sort, no driver state. Rerunning or repartitioning
reproduces byte-identical assignments (hash shard + total order by
id), so a resumed backfill packs exactly the same bins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kkbox_churn_prediction_spark.functions.text import stable_hash48


def pack_documents(
    df: DataFrame,
    token_col: str,
    capacity: int,
    *,
    id_col: str = "doc_id",
    n_shards: int = 16,
) -> DataFrame:
    """(doc_id, shard, offset, pack_bin, n_tokens, oversize):
    ``pack_bin`` is the context-window index within the shard that
    this document STARTS in; ``offset`` is the running token offset
    before it; ``oversize`` flags documents longer than a whole bin
    (they still get a deterministic bin, flagged for splitting or
    dropping upstream).

    Bin density: expected waste per bin is ≤ the mean document
    length (one straddler), so capacity ≫ mean doc length keeps
    fill-rate high; shards pack independently (at most one
    underfilled tail bin per shard).

    Sizing ``n_shards``: each shard is one window sort, so choose
    n_shards ≈ corpus_rows / 10^7 to keep every per-task sort
    RAM-sized (shards have no semantic meaning — more shards only
    adds tail bins, one per shard). The default 16 suits test scale,
    NOT 10^12 docs.
    """
    tok = F.col(token_col).cast("bigint")
    shard = F.pmod(stable_hash48(F.col(id_col).cast("string")), F.lit(int(n_shards)))
    w = Window.partitionBy("shard").orderBy(id_col)
    with_shard = df.select(F.col(id_col), tok.alias("n_tokens"), shard.alias("shard"))
    cum = with_shard.withColumn(
        "offset", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    return cum.select(
        id_col,
        "shard",
        "offset",
        F.floor(F.col("offset") / F.lit(float(capacity))).cast("bigint").alias(
            "pack_bin"
        ),
        "n_tokens",
        (F.col("n_tokens") > F.lit(int(capacity))).cast("int").alias("oversize"),
    )


def packing_stats(packed: DataFrame, capacity: int) -> DataFrame:
    """(shard, pack_bin, n_docs, bin_tokens, fill_rate): per-bin audit
    of the packing — fill_rate relative to capacity (straddlers can
    push a bin above 1.0 by design)."""
    return (
        packed.groupBy("shard", "pack_bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
        )
        .withColumn(
            "fill_rate",
            F.round(F.col("bin_tokens") / F.lit(float(capacity)), 6),
        )
    )
