"""Slowly-changing-dimension (SCD2) interval compression.

Collapses a change stream — one row per observation of an attribute —
into validity intervals: one row per *run* of consecutive equal values
per key, carrying ``valid_from``/``valid_to`` (half-open, ``valid_to``
NULL for the still-open run). This is the gaps-and-islands pattern the
reference's snapshot-based churn features implicitly depend on (its
membership logs are already interval-ized upstream; e.g. the
expire-date transitions consumed by ``src/labels.py:30-55``) and the
standard way to turn a 10^12-row event log into a dimension a
point-in-time join can probe.

Distributed shape — three layers, ONE shuffle:

1. change-point detection: ``lag`` over ``(key ORDER BY order)`` with a
   null-safe comparison (a genuinely-NULL attribute value is a value,
   not a wildcard);
2. run numbering: running ``sum`` of change flags over the SAME window
   frame — Catalyst reuses the single Exchange+Sort for both;
3. run compression: ``groupBy (key, run)`` min/max/count, then ``lead``
   over the *compressed* runs for ``valid_to`` — that second window
   sorts only ~|runs| rows, typically orders of magnitude smaller than
   the input, and AQE coalesces its partitions.

No join, no UDF, no driver loop; the only full-data exchange is the
initial hash partition by key (shared with every other per-key
operator via ``repartitionByRange`` upstream when composed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(
    df: DataFrame,
    key: str,
    order_col: str,
    attr_col: str,
    *,
    ts_col: str | None = None,
) -> DataFrame:
    """One row per run of consecutive equal ``attr_col`` values per
    ``key``, ordered by ``order_col`` (must be unique per key — e.g.
    ``turn_idx``; ties would make run boundaries nondeterministic).

    Output: ``key, run_idx, attr (the run's value), from_<order>,
    to_<order> (exclusive; NULL for the last run), n_rows`` and, when
    ``ts_col`` is given, ``valid_from``/``valid_to`` timestamps with
    the same half-open convention. Runs are 0-indexed in order.
    """
    w = Window.partitionBy(key).orderBy(order_col)
    prev = F.lag(F.col(attr_col)).over(w)
    # null-safe change flag: first row of each key is always a change
    changed = F.when(
        F.row_number().over(w) == 1, F.lit(1)
    ).otherwise((~F.col(attr_col).eqNullSafe(prev)).cast("int"))
    runs = df.withColumn("_run_idx", F.sum(changed).over(w) - F.lit(1)).select(
        key,
        F.col(order_col).alias("_ord"),
        F.col(attr_col).alias("attr"),
        F.col("_run_idx").alias("run_idx"),
        *([F.col(ts_col).alias("_ts")] if ts_col else []),
    )

    aggs = [
        F.min("_ord").alias(f"from_{order_col}"),
        F.count(F.lit(1)).alias("n_rows"),
    ]
    if ts_col:
        aggs.append(F.min("_ts").alias("valid_from"))
    compressed = runs.groupBy(key, "run_idx", "attr").agg(*aggs)

    w2 = Window.partitionBy(key).orderBy("run_idx")
    out = compressed.withColumn(
        f"to_{order_col}", F.lead(f"from_{order_col}").over(w2)
    )
    if ts_col:
        out = out.withColumn("valid_to", F.lead("valid_from").over(w2))
    return out.select(
        key,
        F.col("run_idx").cast("bigint").alias("run_idx"),
        F.col("attr").alias(attr_col),
        f"from_{order_col}",
        f"to_{order_col}",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        *([ "valid_from", "valid_to" ] if ts_col else []),
    )


def snapshot_at(intervals: DataFrame, key: str, at: object, ts_from: str = "valid_from", ts_to: str = "valid_to") -> DataFrame:
    """Point-in-time probe of an SCD2 table: the one run per key whose
    half-open [valid_from, valid_to) interval contains ``at``. A pure
    filter — no window, no join — because SCD2 intervals partition time
    per key; at scale this rides partition pruning when the interval
    table is stored partitioned by a ``valid_from`` bucket."""
    lit = F.lit(at)
    return intervals.where(
        (F.col(ts_from) <= lit)
        & (F.col(ts_to).isNull() | (F.col(ts_to) > lit))
    )


def apply_cdc(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    op_col: str,
    *,
    delete_op: str = "D",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """CDC latest-state compaction: reduce an append-only change
    stream (inserts/updates/deletes per key) to the CURRENT snapshot —
    keep each key's latest row by ``(ts, tiebreak)``, then drop keys
    whose final operation is the tombstone.

    The MERGE-INTO-free lakehouse pattern: snapshot = one algebraic
    ``max_by(struct(payload), struct(ts, tiebreak))`` per key (map-side
    partials — the shuffle carries one candidate per key per task, not
    the history), then a tombstone filter. The SCD2 compressor
    (:func:`compress_scd2`) keeps the history; this keeps only now.
    """
    order = F.struct(
        F.col(ts_col), *([F.col(tiebreak_col)] if tiebreak_col else [])
    )
    payload = F.struct(*[c for c in changes.columns if c not in key_cols])
    latest = changes.groupBy(*key_cols).agg(
        F.max_by(payload, order).alias("_row")
    )
    out = latest.select(*key_cols, "_row.*")
    return out.where(F.col(op_col) != delete_op).drop(op_col)


def snapshot_diff(
    df: DataFrame,
    key_col: str,
    in_a,
    in_b,
) -> DataFrame:
    """Column-level drift between two point-in-time snapshots of a
    per-entity metric, computed in ONE pass → per-status summary
    ``(status, n_entities, total_delta, avg_abs_delta)`` with status
    ∈ {added, removed, changed, unchanged}.

    The data-regression audit between feature-table builds: "did
    this week's snapshot move?" — CDC (``apply_cdc``) answers at row
    granularity, this answers at dataset granularity (how many
    entities appeared/vanished, how far the survivors moved).

    ``in_a`` / ``in_b`` are boolean Columns selecting each snapshot's
    observation window over the SAME input stream (e.g. trailing-14d
    activity before two cutoffs) — so the diff needs NO self-join and
    NO second scan: one conditional-aggregation groupBy per entity
    (the A2 multi-horizon trick), then a ≤4-key reduction for the
    summary. Entities in neither window drop out.

    Scale: first agg shuffles on the entity key (map-side partials);
    the status rollup shuffles 4 keys. Nothing else.
    """
    per_entity = df.groupBy(key_col).agg(
        F.sum(F.when(in_a, 1).otherwise(0)).alias("_va"),
        F.sum(F.when(in_b, 1).otherwise(0)).alias("_vb"),
    )
    present_a = F.col("_va") > 0
    present_b = F.col("_vb") > 0
    status = (
        F.when(~present_a & present_b, "added")
        .when(present_a & ~present_b, "removed")
        .when(F.col("_va") != F.col("_vb"), "changed")
        .otherwise("unchanged")
    )
    return (
        per_entity.where(present_a | present_b)
        .select(
            status.alias("status"),
            (F.col("_vb") - F.col("_va")).alias("_delta"),
        )
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_entities"),
            F.sum("_delta").cast("bigint").alias("total_delta"),
            F.round(F.avg(F.abs(F.col("_delta"))), 6).alias("avg_abs_delta"),
        )
    )
