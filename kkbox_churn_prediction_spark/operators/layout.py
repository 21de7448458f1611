"""Z-order (Morton) data layout keys for multi-column data skipping.

At 100 TB the cheapest query is the one that never reads the file:
parquet row-group and file min/max statistics prune scans, but they
only help along the physical sort order. Sorting by a Z-value — the
bitwise interleave of two (or more) key columns — gives every
interleaved column locality at once, so a backfill that filters on
``(entity_bucket, day)`` prunes on BOTH dimensions from one layout.
This is the same technique lakehouse table formats expose as
``OPTIMIZE ... ZORDER BY``; here it is expressed as pure Spark column
arithmetic (shift/mask spread-bits), so it works on any writer path.

The reference has no layout analog (single-node DuckDB reads local
files); this operator is part of the engine's Iceberg-scale story
alongside the bucketed writers in ``sources/io.py``.

Everything is JVM bitwise arithmetic inside whole-stage codegen — no
UDF, no shuffle beyond the final ``repartitionByRange`` that the
layout itself requires.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# spread-bits constants for 16 -> 32 bit dilation (classic Morton)
_SPREAD_STEPS_16 = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def spread_bits16(col: Column) -> Column:
    """Dilate the low 16 bits of ``col`` so bit i lands at bit 2i
    (values clamped into [0, 65535] first). Pure shift/mask chain —
    four codegen'd integer ops, no branching."""
    x = F.greatest(F.lit(0), F.least(col.cast("bigint"), F.lit(65535)))
    for shift, mask in _SPREAD_STEPS_16:
        x = F.shiftleft(x, shift).bitwiseOR(x).bitwiseAND(F.lit(mask))
    return x


def zvalue16(x: Column, y: Column) -> Column:
    """64-bit Morton key of two 16-bit keys: y's bits at odd
    positions, x's at even — equal prefix ⇒ same 2-D box, so a range
    of z-values covers an axis-aligned rectangle with bounded
    overshoot."""
    return F.shiftleft(spread_bits16(y), 1).bitwiseOR(spread_bits16(x))


def zorder_layout(
    df: DataFrame, x_col: str, y_col: str, *, partitions: int | None = None
) -> DataFrame:
    """Return ``df`` with a ``zval`` column, range-partitioned and
    sorted by it — the shape to hand straight to a parquet/Iceberg
    writer so file-level min/max stats prune on both key dimensions.
    ``repartitionByRange`` samples the z distribution, so skewed keys
    still yield balanced files."""
    out = df.withColumn("zval", zvalue16(F.col(x_col), F.col(y_col)))
    parted = (
        out.repartitionByRange(partitions, "zval")
        if partitions
        else out.repartitionByRange("zval")
    )
    return parted.sortWithinPartitions("zval")


def compaction_plan(
    shards: DataFrame,
    key_cols: list[str],
    bytes_col: str = "bytes",
    target_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Small-file compaction plan: assign each shard (file/partition) to
    an output bucket so each bucket totals ≈ ``target_bytes`` — the
    maintenance pass every incrementally-written Iceberg transcript
    table needs (thousands of per-commit files → 128 MB scan-sized
    objects; this is ``rewrite_data_files`` expressed as plan-only
    Spark algebra).

    Deterministic packing rule (both engines can replay it): shards
    sort by (bytes DESC, keys ASC); bucket = floor(running-bytes-
    before-this-shard / target). Unlike greedy first-fit this is
    order-stable and a single window pass; the trade is a bucket can
    overflow by at most one shard — the standard streaming bin-pack
    bound, fine for compaction where "≈target" is the goal.

    Scale shape: the input is the per-shard PROFILE (one row per
    file — millions of rows at most, post-``shard_profile`` agg), so
    the single global-ordered window runs on the tiny frame, never on
    the data itself. Output adds ``bucket``, per-bucket ``bucket_bytes``
    and ``bucket_files`` so the rewrite job is directly schedulable.
    """
    order = [F.col(bytes_col).desc(), *[F.col(k).asc() for k in key_cols]]
    w_prev = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    b = F.col(bytes_col).cast("long")
    before = F.coalesce(F.sum(b).over(w_prev), F.lit(0).cast("long"))
    planned = shards.select(
        *key_cols,
        b.alias("bytes"),
        F.floor(before.cast("double") / F.lit(float(int(target_bytes))))
        .cast("long")
        .alias("bucket"),
    )
    per_bucket = planned.groupBy("bucket").agg(
        F.sum("bytes").cast("long").alias("bucket_bytes"),
        F.count(F.lit(1)).cast("long").alias("bucket_files"),
    )
    return planned.join(F.broadcast(per_bucket), "bucket").select(
        *key_cols, "bytes", "bucket", "bucket_bytes", "bucket_files"
    )


def partition_advisor(
    df: DataFrame,
    *,
    target_partition_mb: int = 128,
    cores: int = 32,
) -> DataFrame:
    """Shuffle/file-layout sizing advisor: from the table's row count
    and measured average serialized row width, recommend
    ``spark.sql.shuffle.partitions`` (total bytes / target partition
    size, rounded UP to a multiple of the core count so no final
    wave runs ragged) and ``spark.sql.files.maxPartitionBytes`` —
    the two dials every scale section of this repo's docs tells the
    operator to set, computed instead of guessed. The measurement
    companion to :func:`~kkbox_churn_prediction_spark.operators.skew.skew_diagnosis`
    (that sizes KEY skew; this sizes VOLUME).

    Width is the exact mean of a per-column serialized-size estimate
    over the FULL table — one map-side-combined agg (integer sums,
    order-free, reproducible cross-engine), no sampling to disagree
    on. Output: ONE row — row count, est. bytes, recommended
    partition counts and bytes-per-file, and the wave count at the
    given core budget.

    Shape: one exact COUNT+SUM agg; nothing corpus-sized shuffles.
    """
    width_cols = []
    for f_ in df.schema.fields:
        c = F.col(f_.name)
        t = f_.dataType.simpleString()
        if t in ("bigint", "double", "timestamp", "timestamp_ntz", "long"):
            width_cols.append(F.lit(8))
        elif t in ("int", "integer", "float", "date"):
            width_cols.append(F.lit(4))
        elif t.startswith("array"):
            width_cols.append(
                F.coalesce(F.size(c), F.lit(0)) * F.lit(4) + F.lit(16)
            )
        else:
            width_cols.append(
                F.coalesce(F.length(c.cast("string")), F.lit(0)) + F.lit(20)
            )
    row_w = width_cols[0]
    for wcol in width_cols[1:]:
        row_w = row_w + wcol
    probe = df.agg(
        F.count(F.lit(1)).cast("long").alias("_sn"),
        F.sum(row_w.cast("long")).cast("long").alias("_sw"),
    ).collect()[0]
    n = probe["_sn"] or 0
    # empty table: width/volume are UNDEFINED (NULL, the oracle's
    # NULL sums), while the recommendations still bottom out at the
    # core-count floor (r5 empty-sweep)
    avg_w = (probe["_sw"] // n) if n else None
    total = n * avg_w if n else None
    target = int(target_partition_mb) * 1024 * 1024
    raw_parts = max(1, -(-(total or 0) // max(target, 1)))  # ceil
    parts = max(cores, -(-raw_parts // cores) * cores)  # round up to core multiple
    waves = -(-parts // cores)
    spark = df.sparkSession
    return spark.createDataFrame(
        [
            (
                int(n),
                None if avg_w is None else int(avg_w),
                None if total is None else int(total),
                int(parts),
                int(target),
                int(waves),
            )
        ],
        "n_rows bigint, avg_row_bytes bigint, est_total_bytes bigint, "
        "recommended_shuffle_partitions bigint, "
        "recommended_max_partition_bytes bigint, waves bigint",
    )
