"""Deterministic output sharding for training-data writers.

A 100 TB curated corpus ships as N fixed shards (so downstream
training jobs can address, resume, and globally shuffle by shard).
Two requirements the naive ``repartition(n)`` writer violates:

- **Determinism**: the doc→shard map must be a pure function of the
  document id — re-running the writer (or writing incrementally) must
  route every doc to the SAME shard. ``repartition`` is
  round-robin/exchange-order dependent.
- **Cross-engine reproducibility**: consumers in other systems must
  be able to recompute the map, so the hash is the engine-wide
  ``stable_hash48`` (md5-prefix), not Spark-internal murmur.

Spark-first shape: ``shard_id`` is a pure projection (codegen, no
exchange); the writer then does ONE exchange — ``repartition(n,
shard_id)`` → ``partitionBy(shard_id)`` — and the profile is a plain
hash agg over the same projection. Balance is hash-uniform: expected
shard skew at 10^9 docs/shard is O(1/sqrt(n)) ≪ 1%.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kkbox_churn_prediction_spark.functions.text import stable_hash48
from kkbox_churn_prediction_spark.operators.textstats import token_count


def shard_id(id_col: Column, n_shards: int) -> Column:
    """Deterministic shard in [0, n_shards) from the stable 48-bit
    md5 prefix of the STRING form of the id (string form so int and
    string id columns map identically across engines)."""
    return F.pmod(stable_hash48(id_col.cast("string")), F.lit(n_shards)).cast("int")


def assign_shards(docs: DataFrame, n_shards: int, id_col: str = "doc_id") -> DataFrame:
    """Attach ``shard_id`` — a zero-shuffle projection."""
    return docs.withColumn("shard_id", shard_id(F.col(id_col), n_shards))


def shard_profile(
    docs: DataFrame, n_shards: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-shard manifest row: doc count, whitespace-token total,
    byte total — what the writer records next to each shard so
    training-side loaders can plan without scanning. One hash agg."""
    with_shard = assign_shards(docs, n_shards, id_col)
    return with_shard.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col(text_col))).alias("n_tokens"),
        F.sum(F.octet_length(F.coalesce(F.col(text_col), F.lit("")))).alias("n_bytes"),
    )
