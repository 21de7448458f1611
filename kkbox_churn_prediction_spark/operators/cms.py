"""Count-Min sketch: mergeable frequency sketches over time buckets.

Companion to the HLL distinct-sketch rollup (``operators/
sketches.py``): where HLL answers "how many DISTINCT keys per
window", CMS answers "how often did key k occur" with bounded memory
— the mergeability is the point at 100 TB: daily sketches are tiny
(depth×width counters), weekly/monthly views are a SUM, and no
re-scan of the raw turns is ever needed.

Representation is RELATIONAL, not a binary blob: a sketch is rows
``(bucket, row_d, slot, cnt)`` — d×w counters in long format. That
makes merge = groupBy-SUM (map-side combinable), keeps everything
inside whole-stage codegen, and lets the DuckDB oracle replay the
identical arithmetic. Hash family is the engine-wide ``stable_hash48``
salted per depth row (``key '#' d``) — cross-engine reproducible.

Estimate = MIN over depth rows of the merged counter at the key's
slot — the classic CMS guarantee (never underestimates; overshoot
bounded by ε·N with ε = e/width per the Cormode-Muthukrishnan bound).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kkbox_churn_prediction_spark.functions.text import stable_hash48


def cms_slot(key: Column, d: Column, width: int) -> Column:
    """Slot of ``key`` in depth row ``d``: salted stable hash mod w."""
    return F.pmod(
        stable_hash48(F.concat(key.cast("string"), F.lit("#"), d.cast("string"))),
        F.lit(width),
    ).cast("int")


def cms_build(
    df: DataFrame,
    key_col: str,
    bucket_col: str,
    depth: int = 4,
    width: int = 32,
) -> DataFrame:
    """Per-bucket CMS: explode each row into ``depth`` (row_d, slot)
    cells, then ONE partial+final hash agg to counters. The explode
    multiplies rows by depth (small constant) BEFORE the map-side
    combine, so shuffle volume is min(d·w per bucket, d·input)."""
    d = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row_d")
    cells = df.select(F.col(bucket_col).alias("bucket"), F.col(key_col).alias("k"), d)
    return (
        cells.withColumn("slot", cms_slot(F.col("k"), F.col("row_d"), width))
        .groupBy("bucket", "row_d", "slot")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(sketches: DataFrame, regroup: Column | None = None) -> DataFrame:
    """Merge sketches across buckets (optionally re-keyed to a coarser
    bucket via ``regroup`` over the ``bucket`` column): groupBy-SUM —
    the whole point of the long-format representation."""
    key = (regroup if regroup is not None else F.col("bucket")).alias("bucket")
    return sketches.groupBy(key, "row_d", "slot").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketches: DataFrame, probes: DataFrame, width: int, depth: int = 4
) -> DataFrame:
    """Point-frequency estimates: for each (bucket, probe key), MIN
    over depth rows of the counter at the key's slot. Probes are the
    tiny side → broadcast. A depth row whose slot holds no counter row
    is a TRUE zero (nothing ever hashed there), so a probe that misses
    any depth row estimates 0 — expressed as the n_depth_hit guard, no
    outer join needed."""
    p = probes.select(F.col("k").cast("string").alias("k")).distinct()
    depth_rows = p.sparkSession.range(depth).select(F.col("id").cast("int").alias("row_d"))
    probe_slots = p.crossJoin(F.broadcast(depth_rows)).withColumn(
        "slot", cms_slot(F.col("k"), F.col("row_d"), width)
    )
    joined = sketches.join(F.broadcast(probe_slots), ["row_d", "slot"], "inner")
    per_depth = joined.groupBy("bucket", "k", "row_d").agg(F.sum("cnt").alias("c"))
    est = per_depth.groupBy("bucket", "k").agg(
        F.min("c").alias("est_from_hits"), F.count(F.lit(1)).alias("n_depth_hit")
    )
    return est.select(
        "bucket",
        "k",
        F.when(F.col("n_depth_hit") < F.lit(depth), F.lit(0))
        .otherwise(F.col("est_from_hits"))
        .cast("long")
        .alias("cms_count"),
    )
