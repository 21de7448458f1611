"""Point-in-time (as-of range) join — the engine's core operator (J1).

Reference semantics (``features/features_comprehensive.sql:40-50``
``tx_with_cutoff``): every event row is replicated once per qualifying
cutoff of the same entity, with the temporal leak guard
``event_date <= cutoff AND event_date > cutoff - lookback`` applied in
the join condition so no future row ever reaches an aggregate
("CRITICAL: No future data", ``features/features.sqlx:81-82``).

This engine defaults to the STRICT variant ``ts < cutoff_ts``
("using only strictly-prior turns" per the north star; the reference
itself uses ``<`` in labels, ``src/labels.py:96,105``, and ``<=`` in
features — the boundary is a parameter because the reference mixes
both, see SURVEY §7.6).

Physical strategy at 100 TB:

- The cutoff set per run is a handful of fold boundaries → broadcast
  the *cutoff list* (not the entity grid) and replicate turns via a
  broadcast nested-loop on the pure range predicate. No shuffle to
  produce the joined stream; the single shuffle is the groupBy
  (conv_id, cutoff_ts) partial+final hash aggregate that follows.
- If cutoffs are per-entity (arbitrary grid), fall back to an equi
  join on conv_id with the range predicate in the join condition —
  Catalyst runs it as sort-merge; co-locate with
  ``repartitionByRange(conv_id)`` + ``sortWithinPartitions(conv_id,
  ts)`` (see ``plans.backfill``) so repeated operators reuse the
  layout. AQE skew-join splits mega-conversation partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def leak_guard(
    ts: Column,
    cutoff: Column,
    lookback_days: int | Column | None,
    *,
    inclusive: bool = False,
) -> Column:
    """The temporal cutoff predicate P3 (the leak guard).

    ``inclusive=False`` → strictly-prior (``ts < cutoff``);
    ``inclusive=True``  → reference feature-path ``ts <= cutoff``
    (``features/features_comprehensive.sql:48``).

    ``lookback_days`` may be a **Column** carried on the cutoff side
    (per-fold lookback — the expanding-window CV policy,
    ``src/temporal_cv.py:110-150``: each fold's train window reaches
    back a different distance). A column lower bound still rides in
    the join condition, so the broadcast-cutoff plan is unchanged —
    each turn is replicated only for folds whose (per-fold) window
    contains it.
    """
    upper = ts <= cutoff if inclusive else ts < cutoff
    if lookback_days is None:
        return upper
    if isinstance(lookback_days, Column):
        lower = ts >= cutoff - F.make_dt_interval(days=lookback_days)
    else:
        lower = ts >= cutoff - F.expr(f"INTERVAL {int(lookback_days)} DAYS")
    return upper & lower


def asof_join_broadcast_cutoffs(
    turns: DataFrame,
    cutoffs: DataFrame,
    lookback_days: int | Column | None,
    *,
    inclusive: bool = False,
) -> DataFrame:
    """Replicate each turn per qualifying GLOBAL cutoff (tiny cutoff list).

    Produces the reference's ``*_with_cutoff`` stream
    (``features/features_comprehensive.sql:40-50``) without shuffling
    the fact side: broadcast nested-loop join on the range predicate.
    """
    cond = leak_guard(turns["ts"], cutoffs["cutoff_ts"], lookback_days, inclusive=inclusive)
    return turns.join(F.broadcast(cutoffs), cond, "inner")


def asof_join_entity_cutoffs(
    turns: DataFrame,
    grid: DataFrame,
    lookback_days: int | None,
    *,
    inclusive: bool = False,
) -> DataFrame:
    """Per-entity cutoff grid variant: equi join on conv_id + range
    predicate (reference per-entity variant ``src/make_dataset.py:57-67``).

    Catalyst plans sort-merge on conv_id; the range predicate rides
    along as a join condition (filtered during merge, not post-hoc).
    """
    g = grid.select(F.col("conv_id").alias("_g_conv_id"), "cutoff_ts")
    cond = (turns["conv_id"] == g["_g_conv_id"]) & leak_guard(
        turns["ts"], g["cutoff_ts"], lookback_days, inclusive=inclusive
    )
    return turns.join(g, cond, "inner").drop("_g_conv_id")


def asof_forward_nearest(
    turns: DataFrame,
    cutoffs: DataFrame,
    horizon_days: int,
    *,
    inclusive: bool = False,
    payload_cols: tuple[str, ...] = ("role", "tool"),
) -> DataFrame:
    """FORWARD as-of join (pandas ``merge_asof(direction='forward')``
    analog): per entity×cutoff, the EARLIEST turn strictly after the
    cutoff (``inclusive=True`` → at-or-after) within ``horizon_days``,
    with its timestamp, gap, and requested payload columns — NULLs and
    ``found=false`` when the horizon is empty. The generic operator
    behind the specialized label builders (``operators/labels.py``
    hard-codes the qualifying predicate; this returns the next event
    itself, for features like "what does the user do next" or
    time-to-next-touch).

    Determinism: the argmin is ONE ``min_by``-style struct minimum
    ordered by (ts, turn_idx) — turn_idx breaks timestamp ties, and
    (conv_id, turn_idx) is unique, so the selected payload is total-
    order deterministic. Exact integer micros for the gap.

    Shape: broadcast the cutoff list onto the fact stream (no fact
    shuffle — the J1 discipline), ONE (conv_id, cutoff_ts) hash agg
    with map-side partials, then a left join back onto the entity
    grid so empty horizons surface as explicit NULL rows.
    """
    lo = (
        turns["ts"] >= cutoffs["cutoff_ts"]
        if inclusive
        else turns["ts"] > cutoffs["cutoff_ts"]
    )
    hi = turns["ts"] <= cutoffs["cutoff_ts"] + F.expr(
        f"INTERVAL {int(horizon_days)} DAYS"
    )
    joined = turns.join(F.broadcast(cutoffs), lo & hi, "inner")
    pick = F.min(
        F.struct(
            F.unix_micros(F.col("ts")).alias("_us"),
            F.col("turn_idx").alias("_idx"),
            *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
        )
    ).alias("_best")
    nearest = joined.groupBy("conv_id", "cutoff_ts").agg(pick)
    grid = turns.select("conv_id").distinct().crossJoin(F.broadcast(cutoffs))
    out = grid.join(nearest, ["conv_id", "cutoff_ts"], "left")
    cols = [
        "conv_id",
        "cutoff_ts",
        F.col("_best._us").alias("next_ts_us"),
        (F.col("_best._us") - F.unix_micros(F.col("cutoff_ts"))).alias("gap_us"),
    ]
    cols += [F.col(f"_best._p_{c}").alias(f"next_{c}") for c in payload_cols]
    cols.append(F.col("_best").isNotNull().alias("found"))
    return out.select(*cols)


def asof_backward_nearest(
    turns: DataFrame,
    cutoffs: DataFrame,
    lookback_days: int | None = None,
    *,
    inclusive: bool = False,
    payload_cols: tuple[str, ...] = ("role", "tool"),
) -> DataFrame:
    """BACKWARD as-of join (pandas ``merge_asof`` default direction):
    per entity×cutoff, the LATEST turn strictly before the cutoff
    (``inclusive=True`` → at-or-before), optionally bounded by
    ``lookback_days`` (the feature-TTL semantic: a snapshot older than
    the budget is no snapshot), with its timestamp, staleness, and
    payload columns — the generic form of
    ``relational.last_value_before_cutoff`` (one column) for whole-row
    "latest state as of t" features.

    Determinism: ONE ``max_by``-style struct maximum ordered by
    (ts, turn_idx) — at a tied timestamp the higher turn_idx is the
    later turn, and (conv_id, turn_idx) is unique, so the payload is
    total-order deterministic. Exact integer micros for staleness.

    Shape: identical to :func:`asof_forward_nearest` — broadcast
    cutoffs (no fact shuffle), ONE hash agg with map-side partials
    (no window sort of the turn stream — the same algebraic-argmax
    rewrite VERDICT r1 asked of last_value_before_cutoff), left join
    onto the entity grid for explicit NULL rows.
    """
    cond = leak_guard(
        turns["ts"], cutoffs["cutoff_ts"], lookback_days, inclusive=inclusive
    )
    joined = turns.join(F.broadcast(cutoffs), cond, "inner")
    pick = F.max(
        F.struct(
            F.unix_micros(F.col("ts")).alias("_us"),
            F.col("turn_idx").alias("_idx"),
            *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
        )
    ).alias("_best")
    latest = joined.groupBy("conv_id", "cutoff_ts").agg(pick)
    grid = turns.select("conv_id").distinct().crossJoin(F.broadcast(cutoffs))
    out = grid.join(latest, ["conv_id", "cutoff_ts"], "left")
    cols = [
        "conv_id",
        "cutoff_ts",
        F.col("_best._us").alias("last_ts_us"),
        (F.unix_micros(F.col("cutoff_ts")) - F.col("_best._us")).alias(
            "staleness_us"
        ),
    ]
    cols += [F.col(f"_best._p_{c}").alias(f"last_{c}") for c in payload_cols]
    cols.append(F.col("_best").isNotNull().alias("found"))
    return out.select(*cols)
