"""Temporal-rhythm features: inter-arrival statistics, activity-clock
entropy, daily regularity.

The reference's temporal features are all magnitude (counts, sums) or
recency (days-since) — ``features/features_comprehensive.sql:97-296``.
Rhythm features capture the SHAPE of an entity's activity in time:
how bursty the turn stream is, how concentrated on a few hours of the
day, how erratic across days. They are strong churn signals (a user
whose cadence collapses churns before their count does) and every one
reduces to one or two algebraic hash aggregates — no per-row Python,
at most one window pass for the lag.

Scale notes: all three operators shuffle once on ``conv_id`` (the
inter-arrival lag rides the same ``(conv_id, ts, turn_idx)`` sort the
rest of the engine reuses); the two-level aggregates (hour-of-day,
day) collapse to ≤24 / ≤#days rows per entity BEFORE the entity-level
reduction, so partial aggregation does almost all the work map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_US_PER_SEC = 1_000_000.0


def interarrival_stats(turns: DataFrame, *, min_gaps: int = 2) -> DataFrame:
    """Per conversation: mean / sample-std / coefficient-of-variation
    of inter-turn gaps (seconds) plus the Goh-Barabási burstiness
    coefficient ``B = (σ - μ) / (σ + μ)`` (−1 = perfectly periodic,
    0 = Poisson, →1 = extreme bursts).

    Conversations with fewer than ``min_gaps`` gaps are dropped —
    sample std needs n ≥ 2 and a one-gap cadence is noise.

    Determinism: the only order-dependent reductions are EXACT —
    Σgap as integer micros (long) and Σgap² as DECIMAL(38,0) — and
    mean/std derive from those two scalars through a fixed float
    expression tree, so both engines produce BIT-IDENTICAL doubles. A
    float ``avg``/``stddev_samp`` here is a run-to-run flake: Spark's
    partial-sum order varies with partitioning, and a value one ulp
    from a 6dp rounding boundary flips the cross-engine compare
    intermittently (observed once in ~8 full parity runs before this
    rewrite). The outputs are deliberately NOT engine-rounded:
    integer-micros means land EXACTLY on .0000005 boundaries, where
    Spark rounds the shortest-decimal repr up while DuckDB rounds the
    true binary value down — identical raw doubles sidestep both
    implementations (observed: 33374.0610425 → 043 vs 042).
    Σgap² in decimal is exact to 10^38 — ample for any conversation.
    """
    w = Window.partitionBy("conv_id").orderBy("ts", "turn_idx")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts", 1).over(w))
    per_conv = (
        turns.select("conv_id", gap_us.alias("g"))
        .where(F.col("g").isNotNull())
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum("g").alias("_s1"),
            F.sum(
                F.col("g").cast("decimal(19,0)") * F.col("g").cast("decimal(19,0)")
            ).alias("_s2"),
        )
        .where(F.col("n_gaps") >= F.lit(min_gaps))
    )
    n = F.col("n_gaps").cast("double")
    s1 = F.col("_s1").cast("double")
    s2 = F.col("_s2").cast("double")
    mean_s = s1 / n / F.lit(_US_PER_SEC)
    var_us2 = (s2 - s1 * s1 / n) / (n - 1.0)
    sd_s = F.sqrt(F.greatest(var_us2, F.lit(0.0))) / F.lit(_US_PER_SEC)
    cv = F.when(mean_s > 0, sd_s / mean_s)
    denom_b = sd_s + mean_s
    burst = F.when(denom_b > 0, (sd_s - mean_s) / denom_b)
    return per_conv.select(
        "conv_id",
        "n_gaps",
        mean_s.alias("mean_gap_s"),
        sd_s.alias("sd_gap_s"),
        F.coalesce(cv, F.lit(0.0)).alias("cv_gap"),
        F.coalesce(burst, F.lit(0.0)).alias("burstiness"),
    )


def activity_profile(turns: DataFrame) -> DataFrame:
    """Per conversation: Shannon entropy (nats) of the hour-of-day
    distribution of turns, number of distinct active hours, and the
    weekend fraction of turns.

    Two-level aggregate: (conv, hour) counts (≤24 rows per entity
    survive the first shuffle), then entropy = ``ln(N) - Σ c·ln(c)/N``
    — the algebraically-stable form that never materializes p=c/N per
    row group in a separate pass."""
    hour = F.hour(F.col("ts"))
    # Spark dayofweek: 1=Sunday … 7=Saturday.
    is_weekend = F.dayofweek(F.col("ts")).isin(1, 7).cast("long")
    by_hour = (
        turns.select("conv_id", hour.alias("hh"), is_weekend.alias("wknd"))
        .groupBy("conv_id", "hh")
        .agg(F.count(F.lit(1)).alias("c"), F.sum("wknd").alias("wc"))
    )
    n = F.sum("c")
    ent = F.log(n.cast("double")) - F.sum(F.col("c") * F.log(F.col("c").cast("double"))) / n
    return by_hour.groupBy("conv_id").agg(
        ent.alias("hour_entropy"),
        F.count(F.lit(1)).cast("int").alias("n_active_hours"),
        (F.sum("wc") / n).alias("weekend_frac"),
    )


def daily_regularity(turns: DataFrame) -> DataFrame:
    """Per conversation: active-day count, mean and population
    variance of the daily turn count over ACTIVE days, and the Fano
    factor (variance / mean; 1 = Poisson, >1 = overdispersed/bursty).

    Gap days are intentionally excluded (this measures load given
    activity); the dense-grid variant is :mod:`operators.resample`'s
    job. Same two-level collapse as :func:`activity_profile`, keyed by
    calendar day.

    Determinism: same discipline as :func:`interarrival_stats` — the
    only order-dependent reductions are EXACT integer sums (Σc, Σc²
    as longs; daily counts keep Σc² far below 2⁶³), and mean/variance
    derive from those scalars through a fixed float expression tree,
    so both engines produce bit-identical doubles. ``F.var_pop``'s
    Welford-merge state is float and its merge order varies with
    partitioning — with integer counts the variance is a rational
    number that can land exactly on a 6dp rounding boundary, the
    observed interarrival flake class."""
    by_day = (
        turns.select("conv_id", F.to_date(F.col("ts")).alias("d"))
        .groupBy("conv_id", "d")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    acc = by_day.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / nd
    var = F.greatest(
        (F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1").cast("double") / nd)
        / nd,
        F.lit(0.0),
    )
    return acc.select(
        "conv_id",
        F.col("n").cast("int").alias("n_active_days"),
        mean.alias("mean_daily_turns"),
        var.alias("var_daily_turns"),
        F.coalesce(F.when(mean > 0, var / mean), F.lit(0.0)).alias("fano_factor"),
    )


def activity_trend(
    turns: DataFrame, *, origin: str = "2024-01-01", eps: float = 1e-9
) -> DataFrame:
    """Per conversation: OLS slope + intercept of the daily turn count
    over the calendar-day index — ramping up (slope > 0) vs fading out
    (slope < 0). The regression generalizes the reference's
    recent-vs-prior window-mean trend ratios
    (``features/features_comprehensive.sql:97-296`` W3/W4 families) to
    a rate per day; fading engagement is the canonical churn signal.

    ``origin`` shifts the day axis to small integers before the
    co-moments so the cancellation in ``nΣxy − ΣxΣy`` stays far above
    double-precision noise (epoch-day x ≈ 2·10⁴ wastes 9 digits);
    slope is shift-invariant and the intercept is reported AT the
    origin date. Single-active-day conversations have zero x-variance
    → slope/intercept NULL (matches DuckDB ``regr_slope``); the
    epsilon guard (not ``> 0``) absorbs FP residue per the
    cross-engine discipline.

    Shape: per-(conv, day) count agg collapses to ≤ #days rows per
    entity BEFORE the entity-level co-moment agg — both algebraic
    hash aggs with map-side partials; zero windows, zero sorts, two
    conv-keyed exchanges that AQE coalesces on the shared layout.
    """
    by_day = (
        turns.select("conv_id", F.to_date(F.col("ts")).alias("d"))
        .groupBy("conv_id", "d")
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
        .select(
            "conv_id",
            F.datediff(F.col("d"), F.lit(origin)).cast("double").alias("x"),
            "y",
        )
    )
    n = F.count(F.lit(1)).cast("double")
    sx, sy = F.sum("x"), F.sum("y")
    sxy, sxx = F.sum(F.col("x") * F.col("y")), F.sum(F.col("x") * F.col("x"))
    var_n = n * sxx - sx * sx  # n² · var_pop(x)
    slope = (n * sxy - sx * sy) / var_n
    return by_day.groupBy("conv_id").agg(
        n.cast("int").alias("n_active_days"),
        F.round(F.when(var_n > eps, slope), 6).alias("slope"),
        F.round(
            F.when(var_n > eps, (sy - slope * sx) / n), 6
        ).alias("intercept"),
    )


def turn_taking(turns: DataFrame) -> DataFrame:
    """Per conversation: role-mix fractions and the alternation rate
    (share of turns whose role differs from the previous turn's under
    the stable (ts, turn_idx) order) — dialogue-structure signals:
    a monologuing conversation (alternation → 0) behaves differently
    from a ping-pong one (→ 1). One lag on the shared conv_id sort +
    one hash agg."""
    w = Window.partitionBy("conv_id").orderBy("ts", "turn_idx")
    prev_role = F.lag("role", 1).over(w)
    flagged = turns.select(
        "conv_id",
        "role",
        F.when(prev_role.isNull(), F.lit(None))
        .otherwise((F.col("role") != prev_role).cast("int"))
        .alias("switched"),
    )
    n = F.count(F.lit(1))
    return flagged.groupBy("conv_id").agg(
        n.cast("long").alias("n_turns"),
        (F.sum((F.col("role") == "user").cast("int")) / n).alias("user_frac"),
        (F.sum((F.col("role") == "assistant").cast("int")) / n).alias("assistant_frac"),
        F.coalesce(F.avg("switched"), F.lit(0.0)).alias("alternation_rate"),
    )


def gini_concentration(
    df: DataFrame,
    value_col: str,
    *,
    n_buckets: int = 256,
) -> DataFrame:
    """Gini coefficient of ``value_col``'s concentration across rows
    (0 = perfectly even, →1 = one entity holds everything) — the
    inequality summary for "how concentrated is activity across
    conversations / tokens across documents".

    Formula (ties-safe, 1-based average ranks r_i ascending):
    ``G = 2·Σ r_i·x_i / (n·Σ x_i) − (n+1)/n``.

    Scale shape: ranks come from the same distributed prefix-sum over
    quantile-edge buckets of the DISTINCT-value table as
    ``encoders.rank_normalize`` — never a single-partition sort. With
    ties, Σ r·x per distinct value is ``avg_rank · value · count``,
    so the final reduce is one row over the distinct table.
    """
    from kkbox_churn_prediction_spark.operators.encoders import (
        value_rank_components,
    )

    ranked = value_rank_components(df, value_col, n_buckets=n_buckets).withColumn(
        # 1-based average rank of this value's tied block
        "_avg_rank", F.col("_before") + (F.col("_cnt") + 1) / 2.0
    )
    x = F.col(value_col).cast("double")
    return ranked.agg(
        F.round(
            2.0
            * F.sum(F.col("_avg_rank") * x * F.col("_cnt"))
            / (F.sum(F.col("_cnt")) * F.sum(x * F.col("_cnt")))
            - (F.sum(F.col("_cnt")) + 1) / F.sum(F.col("_cnt")),
            6,
        ).alias("gini"),
        F.sum(F.col("_cnt")).cast("long").alias("n"),
    )


def weekly_bounce_rate(turns: DataFrame) -> DataFrame:
    """Engagement funnel health per cohort week: conversations
    STARTED each week, how many never got a second turn (bounce), and
    the bounce rate — the transcript analog of the reference's
    early-churn cohort cut (users who lapse right after signup).
    Output: ``(week, n_started, n_bounced, bounce_rate)``.

    Shape: one per-conversation aggregate (first-turn week + turn
    count — algebraic min/count with map-side partials), then one
    ≤#weeks-key rollup. No windows.
    """
    per_conv = turns.groupBy("conv_id").agg(
        F.date_trunc("week", F.min("ts")).alias("week"),
        F.count(F.lit(1)).alias("_n"),
    )
    return per_conv.groupBy("week").agg(
        F.count(F.lit(1)).cast("long").alias("n_started"),
        F.sum(F.when(F.col("_n") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_bounced"),
        F.round(
            F.sum(F.when(F.col("_n") == 1, 1).otherwise(0))
            * 1.0
            / F.count(F.lit(1)),
            6,
        ).alias("bounce_rate"),
    )


def circadian_profile(turns: DataFrame, group_col: str = "role") -> DataFrame:
    """Per-group circular statistics of the hour-of-day: resultant
    mean hour (the atan2 of summed unit phasors), resultant length R
    (concentration: 1 = all activity at one instant, 0 = uniform over
    the clock), and circular standard deviation sqrt(-2 ln R) — the
    correct average for cyclic features, where the arithmetic mean of
    {23h, 1h} would say noon instead of midnight.

    The cyclical sin/cos encoding is the standard feature-eng
    treatment of clock/calendar fields (the reference encodes raw
    month ints at features/features_comprehensive.sql:317-321; phasor
    encoding is its periodic completion). Shape: two trig columns +
    ONE hash agg by group; output is |groups| rows. Minutes/seconds
    are folded in (fractional hour) so the phase is exact wall-clock.
    """
    frac_hour = (
        F.hour("ts").cast("double")
        + F.minute("ts").cast("double") / F.lit(60.0)
        + F.second("ts").cast("double") / F.lit(3600.0)
    )
    theta = frac_hour * F.lit(2.0 * 3.141592653589793 / 24.0)
    agg = turns.where(F.col(group_col).isNotNull()).groupBy(
        F.col(group_col).alias("grp")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.sin(theta)).alias("s_sin"),
        F.sum(F.cos(theta)).alias("s_cos"),
    )
    r = F.sqrt(F.col("s_sin") * F.col("s_sin") + F.col("s_cos") * F.col("s_cos")) / F.col(
        "n"
    ).cast("double")
    mean_theta = F.atan2(F.col("s_sin"), F.col("s_cos"))
    mean_hour = F.pmod(mean_theta * F.lit(24.0 / (2.0 * 3.141592653589793)), F.lit(24.0))
    return agg.select(
        F.col("grp").alias(group_col),
        "n",
        F.round(mean_hour, 6).alias("mean_hour"),
        F.round(r, 6).alias("resultant_r"),
        F.round(F.sqrt(-2.0 * F.log(F.greatest(r, F.lit(1e-300)))), 6).alias(
            "circ_std"
        ),
    ).orderBy(group_col)


def theil_index(df: DataFrame, value_col: str) -> DataFrame:
    """Theil T inequality index of ``value_col`` across rows — the
    entropy-based member of the concentration family (Gini weights
    rank gaps; Theil is additively DECOMPOSABLE across subgroups,
    which is why source-mix audits prefer it). 0 = perfectly even;
    ln(n) = one row holds everything.

    Algebraic one-pass form (no ranks, unlike Gini):
    ``T = Σ x·ln(x) / (n·μ) − ln(μ)`` with μ = Σx/n — ONE hash agg
    over (n, Σx, Σ x·ln x); zero-valued rows contribute 0 (x·ln x → 0
    limit, guarded). Output: (n, mean, theil_t, theil_norm) where
    theil_norm = T/ln(n) ∈ [0,1].
    """
    x = F.col(value_col).cast("double")
    base = df.where(x.isNotNull() & (x >= 0))
    agg = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).alias("s1"),
        F.sum(F.when(x > 0, x * F.log(x)).otherwise(F.lit(0.0))).alias("sxlx"),
    )
    n = F.col("n").cast("double")
    mu = F.col("s1") / n
    t = F.when(
        (F.col("n") > 0) & (mu > 0),
        F.col("sxlx") / (n * mu) - F.log(mu),
    )
    return agg.select(
        "n",
        F.round(mu, 6).alias("mean"),
        F.round(t, 6).alias("theil_t"),
        F.round(
            F.when(F.col("n") > 1, t / F.log(n)).otherwise(F.lit(0.0)), 6
        ).alias("theil_norm"),
    )


def hhi_concentration(df: DataFrame, group_col: str) -> DataFrame:
    """Herfindahl–Hirschman concentration of rows across ``group_col``
    values — Σ share² over the bounded group table (1/k = perfectly
    even across k groups, 1 = single group). The market-concentration
    summary applied to corpus source mix / tool usage: the first
    number a data-mixture review asks for, with the effective number
    of groups 1/HHI as its readable inverse.

    Shape: ONE hash agg to the group table, one 1-row reduce —
    bounded by the group domain at any corpus size.
    """
    per = df.where(F.col(group_col).isNotNull()).groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    tot = per.agg(
        F.sum("_c").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.col("_c").cast("double") * F.col("_c").cast("double")).alias(
            "_ss"
        ),
    )
    hhi = F.col("_ss") / (
        F.col("n_rows").cast("double") * F.col("n_rows").cast("double")
    )
    return tot.select(
        "n_rows",
        "n_groups",
        F.round(hhi, 6).alias("hhi"),
        F.round(F.lit(1.0) / hhi, 6).alias("effective_groups"),
    )


def lorenz_deciles(
    df: DataFrame,
    group_col: str,
    *,
    n_bins: int = 10,
) -> DataFrame:
    """Lorenz concentration table behind the Gini number: rank
    entities by activity ASCENDING, split into equal-POPULATION
    deciles, and report each decile's share of total activity plus
    the cumulative Lorenz coordinates — the interpretable "bottom
    half of conversations carries 8% of turns, the top decile 40%"
    readout a single Gini coefficient compresses away (two very
    different concentration SHAPES can share one Gini). Output per
    decile: ``(decile, n_entities, n_events, share_events,
    cum_share_entities, cum_share_events)``.

    Shape: the rank-bin integer machine — per-entity counts collapse
    to a (count -> n_entities) value histogram (ONE extra hash agg,
    bounded by distinct activity levels), the cumulative window
    orders DISTINCT counts only, bins assigned by
    ``floor(cum_before*K/N)``; everything downstream is exact long
    arithmetic on <=K rows.
    """
    per = df.groupBy(group_col).agg(F.count(F.lit(1)).cast("long").alias("_c"))
    hist = per.groupBy("_c").agg(F.count(F.lit(1)).cast("long").alias("_ne"))
    w = Window.orderBy("_c").rowsBetween(Window.unboundedPreceding, -1)
    w_tot = Window.partitionBy()
    ranked = hist.select(
        "_c",
        "_ne",
        F.coalesce(F.sum("_ne").over(w), F.lit(0)).cast("long").alias("_cb"),
        F.sum("_ne").over(w_tot).cast("long").alias("_n"),
    )
    binned = ranked.select(
        F.floor(F.col("_cb") * F.lit(int(n_bins)) / F.col("_n"))
        .cast("int")
        .alias("decile"),
        "_c",
        "_ne",
    )
    per_bin = binned.groupBy("decile").agg(
        F.sum("_ne").cast("long").alias("n_entities"),
        F.sum(F.col("_c") * F.col("_ne")).cast("long").alias("n_events"),
    )
    w_cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    return per_bin.select(
        "decile",
        "n_entities",
        "n_events",
        F.round(
            F.col("n_events").cast("double")
            / F.sum("n_events").over(w_all).cast("double"),
            6,
        ).alias("share_events"),
        F.round(
            F.sum("n_entities").over(w_cum).cast("double")
            / F.sum("n_entities").over(w_all).cast("double"),
            6,
        ).alias("cum_share_entities"),
        F.round(
            F.sum("n_events").over(w_cum).cast("double")
            / F.sum("n_events").over(w_all).cast("double"),
            6,
        ).alias("cum_share_events"),
    ).orderBy("decile")
