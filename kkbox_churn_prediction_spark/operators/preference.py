"""Bradley–Terry preference-strength fitting over pairwise outcomes.

The training-data companion the transcript engine needs for
preference/RLHF-style corpora: given (winner, loser) pair outcomes
between a SMALL fixed set of items (roles, tools, model variants,
prompt templates), fit the Bradley–Terry strengths
``P(i beats j) = p_i / (p_i + p_j)`` by minorization–maximization
(Hunter 2004, public method):

    p_i ← W_i / Σ_{j≠i} n_ij / (p_i + p_j)

Cross-engine determinism (the engine's binned-Newton discipline,
see ``operators/calibration.py`` Platt fit): the pair stream is
first reduced to EXACT integer win counts pivoted onto ONE row
(conditional-count hash agg — the only pass over data), then a
FIXED number of MM iterations is UNROLLED as chained column
expressions whose additions run in a FIXED item order — the DuckDB
oracle spells out the byte-identical arithmetic DAG, so both
engines walk the same float trajectory; no convergence break, no
summation-order wobble. The MM map is a contraction toward the
unique normalized fixed point, so the final round(6) is stable.

Scale shape: one partial+final hash agg over the pair stream; the
iteration runs on a single broadcast-sized row (t items → t² count
columns). At 10^12 pairs the shuffle carries one row per partition.
Reference analog: the reference ranks feature slices by mean gaps
(``src/error_analysis.py``); Bradley–Terry is the principled
pairwise version.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bradley_terry(
    pairs: DataFrame,
    items: Sequence[str],
    n_iter: int = 20,
    eps: float = 1e-12,
    *,
    mode: str = "driver",
) -> DataFrame:
    """Fit Bradley–Terry strengths from a (winner, loser) pair table.

    ``items`` is the closed, ORDERED item universe (ascending by
    convention); pairs mentioning other values are ignored. Returns
    one row per item: ``(item, wins, matches, bt_score, rank)`` with
    scores normalized to mean 1 and rank 1 = strongest
    (item-ascending tiebreak).

    Execution modes (bit-identical, pytest-asserted): the pairwise
    profile is ONE bounded row (t×t exact integer win counts for an
    explicitly closed item universe), so ``mode="driver"`` (default)
    collects it once and replays the MM iteration in Python doubles —
    the identical IEEE operations in the identical order, so the
    trajectory is bit-equal — then ranks/rounds in Spark.
    ``mode="distributed"`` keeps the all-symbolic column iteration;
    correct but its 20 nested projections make Catalyst compile a
    huge expression tree (measured 6.7s vs 0.6s at sf0.1 for t=4 —
    the cost is plan compilation, not data).
    """
    items = list(items)
    if mode == "driver":
        return _bradley_terry_driver(
            pairs, items, int(n_iter), float(eps)
        )
    t = len(items)
    idx = range(t)
    prof = pairs.where(
        F.col("winner").isin(*items) & F.col("loser").isin(*items)
    ).agg(
        *[
            F.sum(
                F.when(
                    (F.col("winner") == items[i]) & (F.col("loser") == items[j]),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias(f"w_{i}_{j}")
            for i in idx
            for j in idx
            if i != j
        ]
    )
    # totals + symmetric match counts as stable columns (exact ints)
    tot_cols = []
    for i in idx:
        wins_i = None
        for j in idx:
            if j == i:
                continue
            term = F.col(f"w_{i}_{j}")
            wins_i = term if wins_i is None else wins_i + term
        tot_cols.append(wins_i.cast("long").alias(f"win_{i}"))
    n_cols = [
        (F.col(f"w_{i}_{j}") + F.col(f"w_{j}_{i}")).cast("long").alias(f"n_{i}_{j}")
        for i in idx
        for j in idx
        if i < j
    ]
    cur = prof.select("*", *tot_cols, *n_cols)
    # initial strengths
    cur = cur.select("*", *[F.lit(1.0).alias(f"p_{i}") for i in idx])

    def n_ref(i: int, j: int):
        a, b = min(i, j), max(i, j)
        return F.col(f"n_{a}_{b}").cast("double")

    for _ in range(int(n_iter)):
        upd = []
        for i in idx:
            denom = None
            for j in idx:
                if j == i:
                    continue
                term = n_ref(i, j) / (F.col(f"p_{i}") + F.col(f"p_{j}"))
                denom = term if denom is None else denom + term
            raw = F.when(
                denom > eps, F.col(f"win_{i}").cast("double") / denom
            ).otherwise(F.col(f"p_{i}"))
            upd.append(raw.alias(f"q_{i}"))
        cur = cur.select(
            *[c for c in cur.columns if not c.startswith("p_")], *upd
        )
        s = None
        for i in idx:
            term = F.col(f"q_{i}")
            s = term if s is None else s + term
        norm = s / F.lit(float(t))
        cur = cur.select(
            *[c for c in cur.columns if not c.startswith("q_")],
            *[(F.col(f"q_{i}") / norm).alias(f"p_{i}") for i in idx],
        )
    match_tot = []
    for i in idx:
        m = None
        for j in idx:
            if j == i:
                continue
            a, b = min(i, j), max(i, j)
            term = F.col(f"n_{a}_{b}")
            m = term if m is None else m + term
        match_tot.append(m.cast("long").alias(f"m_{i}"))
    cur = cur.select("*", *match_tot)
    arms = [
        F.struct(
            F.lit(items[i]).alias("item"),
            F.col(f"win_{i}").alias("wins"),
            F.col(f"m_{i}").alias("matches"),
            F.col(f"p_{i}").alias("_score"),
        )
        for i in idx
    ]
    long = cur.select(F.explode(F.array(*arms)).alias("s")).select(
        "s.item", "s.wins", "s.matches", F.col("s._score").alias("_score")
    )
    w_rank = Window.orderBy(F.col("_score").desc(), F.col("item"))
    return long.select(
        "item",
        "wins",
        "matches",
        F.round("_score", 6).alias("bt_score"),
        F.row_number().over(w_rank).cast("int").alias("rank"),
    )


def _bradley_terry_driver(
    pairs: DataFrame,
    items: list,
    n_iter: int,
    eps: float,
) -> DataFrame:
    """Driver-side replay of :func:`bradley_terry`'s MM iteration over
    the collected one-row profile — identical IEEE double operations
    in identical order (term-by-term left-to-right sums, the same
    when/otherwise guards), so the score trajectory is bit-equal to
    the symbolic column iteration. Rank + 6dp rounding run in Spark."""
    spark = pairs.sparkSession
    t = len(items)
    idx = range(t)
    prof = pairs.where(
        F.col("winner").isin(*items) & F.col("loser").isin(*items)
    ).agg(
        *[
            F.sum(
                F.when(
                    (F.col("winner") == items[i])
                    & (F.col("loser") == items[j]),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias(f"w_{i}_{j}")
            for i in idx
            for j in idx
            if i != j
        ]
    )
    row = prof.collect()[0]
    if row[f"w_{0}_{1}"] is None:
        # EMPTY pair table: the aggregate emits NULL counts. The MM
        # fixed point with zero evidence keeps every strength at its
        # 1.0 init (the oracle's zero-denominator CASE guard does the
        # same), and wins/matches surface as NULL — mirror exactly
        # (r5 degenerate-fuzz crash fix: int(None))
        long = spark.createDataFrame(
            [(items[i], None, None, 1.0) for i in idx],
            "item string, wins long, matches long, _score double",
        )
        w_rank = Window.orderBy(F.col("_score").desc(), F.col("item"))
        return long.select(
            "item",
            "wins",
            "matches",
            F.round("_score", 6).alias("bt_score"),
            F.row_number().over(w_rank).cast("int").alias("rank"),
        )
    w = {(i, j): int(row[f"w_{i}_{j}"]) for i in idx for j in idx if i != j}
    wins = {i: sum(w[(i, j)] for j in idx if j != i) for i in idx}
    n = {
        (i, j): w[(i, j)] + w[(j, i)]
        for i in idx
        for j in idx
        if i < j
    }

    def n_of(i: int, j: int) -> int:
        a, b = min(i, j), max(i, j)
        return n[(a, b)]

    p = {i: 1.0 for i in idx}
    for _ in range(n_iter):
        q = {}
        for i in idx:
            denom = None
            for j in idx:
                if j == i:
                    continue
                term = float(n_of(i, j)) / (p[i] + p[j])
                denom = term if denom is None else denom + term
            q[i] = float(wins[i]) / denom if denom > eps else p[i]
        s = None
        for i in idx:
            s = q[i] if s is None else s + q[i]
        norm = s / float(t)
        p = {i: q[i] / norm for i in idx}

    matches = {i: sum(n_of(i, j) for j in idx if j != i) for i in idx}
    long = spark.createDataFrame(
        [(items[i], wins[i], matches[i], p[i]) for i in idx],
        "item string, wins long, matches long, _score double",
    )
    w_rank = Window.orderBy(F.col("_score").desc(), F.col("item"))
    return long.select(
        "item",
        "wins",
        "matches",
        F.round("_score", 6).alias("bt_score"),
        F.row_number().over(w_rank).cast("int").alias("rank"),
    )


def preference_pairs_from_turns(conv: DataFrame) -> DataFrame:
    """Derive deterministic (winner, loser) role pairs from adjacent
    transcript turns: for each consecutive pair of turns with
    DIFFERENT roles and non-null texts, the longer text wins (ties:
    lexicographically smaller role) — a stand-in outcome signal with
    the same shape as human preference labels. ONE lag window per
    conversation; no shuffle beyond it.
    """
    w = Window.partitionBy("conv_id").orderBy("ts", "turn_idx")
    step = conv.where(F.col("text").isNotNull()).select(
        "conv_id",
        "role",
        F.length("text").cast("long").alias("len"),
        F.lag("role").over(w).alias("prev_role"),
        F.lag(F.length("text").cast("long")).over(w).alias("prev_len"),
    )
    cand = step.where(
        F.col("prev_role").isNotNull() & (F.col("prev_role") != F.col("role"))
    )
    winner = (
        F.when(F.col("len") > F.col("prev_len"), F.col("role"))
        .when(F.col("prev_len") > F.col("len"), F.col("prev_role"))
        .otherwise(F.least("role", "prev_role"))
    )
    loser = (
        F.when(F.col("len") > F.col("prev_len"), F.col("prev_role"))
        .when(F.col("prev_len") > F.col("len"), F.col("role"))
        .otherwise(F.greatest("role", "prev_role"))
    )
    return cand.select(winner.alias("winner"), loser.alias("loser"))
