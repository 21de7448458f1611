"""Leakage-aware feature encoders: out-of-fold target encoding,
per-group standardization, hashed feature crosses.

The reference's modeling stack consumes raw aggregates and leaves
encoding to sklearn on the driver (``src/features_processor.py``);
at 10^12 rows the encoders must run IN the engine, and the repo's
temporal-leakage discipline (strictly-prior as-of features,
``operators/asof.py``) extends to them: a target encoding computed
over ALL rows leaks each row's own label into its feature — the
out-of-fold construction here is the categorical analog of the
as-of cutoff guard.

All three encoders share one distributed shape: statistics tables are
tiny by construction (|categories|×|folds|, |groups|, or nothing at
all for the hash cross), so every encode is a broadcast join (or a
pure projection) against the full-size stream — the stream itself
NEVER shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kkbox_churn_prediction_spark.operators.replay import driver_replay_max_rows

from kkbox_churn_prediction_spark.functions.text import stable_hash48


def target_encode_oof(
    df: DataFrame,
    cat_col: str,
    label_col: str,
    fold_col: str,
    *,
    smoothing: float = 0.0,
    out_col: str | None = None,
) -> DataFrame:
    """Out-of-fold mean-target encoding: the encoding applied to rows
    of fold f is the label mean of their category computed over every
    OTHER fold — a row's own label (and its fold's labels) can never
    reach its feature. ``smoothing`` m shrinks sparse categories
    toward the out-of-fold GLOBAL mean:
    ``enc = (oof_sum + m·oof_prior) / (oof_count + m)``; a category
    absent from the other folds falls back to the prior outright.

    Shape: ONE groupBy (cat, fold) over the stream (the only
    full-data exchange); out-of-fold sums come from window totals over
    that tiny stats table (leave-one-out identity: total − own fold —
    no per-fold rescan, no fold×fold join); the finished encoder
    (cat, fold, enc) broadcasts back onto the stream.
    """
    out_col = out_col or f"{cat_col}_te"
    lab = F.col(label_col).cast("double")
    cf = df.groupBy(cat_col, fold_col).agg(
        F.sum(lab).alias("_s"), F.count(lab).alias("_c")
    )
    w_cat = Window.partitionBy(cat_col)
    # category totals replicated per row of the tiny stats table;
    # the row's own fold subtracted = leave-one-fold-out sums
    g = cf.select(
        cat_col,
        fold_col,
        "_s",
        "_c",
        (F.sum("_s").over(w_cat) - F.col("_s")).alias("_oof_s"),
        (F.sum("_c").over(w_cat) - F.col("_c")).alias("_oof_c"),
    )
    tot = cf.groupBy(fold_col).agg(
        F.sum("_s").alias("_fs"), F.sum("_c").alias("_fc")
    )
    grand = cf.agg(
        F.sum("_s").alias("_gs"), F.sum("_c").alias("_gc")
    )
    prior = (
        tot.crossJoin(F.broadcast(grand))
        .select(
            fold_col,
            ((F.col("_gs") - F.col("_fs")) / (F.col("_gc") - F.col("_fc"))).alias(
                "_prior"
            ),
        )
    )
    m = float(smoothing)
    enc = (
        g.join(F.broadcast(prior), on=fold_col)
        .select(
            cat_col,
            fold_col,
            F.when(
                F.col("_oof_c") + F.lit(m) > 0,
                (F.col("_oof_s") + F.lit(m) * F.col("_prior"))
                / (F.col("_oof_c") + F.lit(m)),
            )
            .otherwise(F.col("_prior"))
            .alias(out_col),
        )
    )
    return df.join(F.broadcast(enc), on=[cat_col, fold_col], how="left")


def standardize_by_group(
    df: DataFrame,
    value_col: str,
    group_col: str,
    *,
    out_col: str | None = None,
) -> DataFrame:
    """Per-group z-score: (x − group mean) / group sample-stddev, 0.0
    when the group is constant or a singleton (stddev 0/NULL — the
    degenerate groups a fill of 0 represents correctly: every member
    sits at the mean). Group stats are one hash agg broadcast back;
    the stream never shuffles."""
    out_col = out_col or f"{value_col}_z"
    v = F.col(value_col).cast("double")
    stats = df.groupBy(group_col).agg(
        F.avg(v).alias("_mu"), F.stddev_samp(v).alias("_sd")
    )
    joined = df.join(F.broadcast(stats), on=group_col, how="left")
    z = F.when(
        F.col("_sd").isNotNull() & (F.col("_sd") > 0),
        (v - F.col("_mu")) / F.col("_sd"),
    ).otherwise(F.lit(0.0))
    return joined.withColumn(out_col, z).drop("_mu", "_sd")


def hashed_cross(
    cols: list[str], buckets: int, *, sep: str = "\x1f"
) -> Column:
    """Hashing-trick feature cross: bucket id of the joined column
    values in [0, buckets). NULLs are encoded as a sentinel (so
    (NULL, x) ≠ ('', x)), the join uses an unprintable separator (so
    ('a','b c') ≠ ('a b','c')), and the hash is the engine's
    cross-engine ``stable_hash48`` (md5-prefix) — the SAME bucket ids
    fall out of Spark and any SQL engine with md5, which makes
    downstream embedding tables portable. Pure projection: no state,
    no shuffle, no vocabulary build."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00null\x00")) for c in cols
    ]
    joined = F.concat_ws(sep, *parts)
    return F.pmod(stable_hash48(joined), F.lit(int(buckets)))


# under this many DISTINCT values the prefix sum replays driver-side
# off one Arrow collect (exact integer counts — hash-identical); past
# it the bucketed distributed machinery below is the web-scale path.
# Same threshold discipline as the components/pagerank fixed points.
_RANK_DRIVER_MAX_VALUES = 2_000_000


def value_rank_components(
    df: DataFrame,
    value_col: str,
    *,
    n_buckets: int = 256,
    mode: str = "auto",
    weight_col: str | None = None,
) -> DataFrame:
    """The distributed prefix-sum rank machinery shared by
    :func:`rank_normalize`, ``rhythm.gini_concentration``,
    ``association.spearman_corr``, ``textstats.zipf_stats`` and
    ``robust._weighted_median``: collapse to the distinct-value table
    with counts, bucket it by approx-quantile edges, and compute each
    value's 0-based count of strictly-smaller rows →
    ``(value_col, _cnt, _before)``.

    ``weight_col`` accepts PRE-COUNTED input — ``df`` is already a
    ``(value, count)`` histogram and ``_cnt`` sums that column instead
    of counting rows, so a caller that has paid for the corpus
    hash-agg once (the Huber/quantile-trend value histograms) never
    re-expands it.

    Per-bucket cumulative sums run in parallel across buckets; the
    cross-bucket carry is a window over the ≤ ``n_buckets``-row
    offsets table (broadcast back). Never a single-partition sort of
    the data — the round-1 ntile lesson.

    Execution modes (outputs hash-identical — counts and prefix sums
    are exact integers, pytest-asserted): ``mode="driver"``
    Arrow-collects the distinct-value table in ONE scan and replays
    the prefix sum as a pandas sort + cumsum, skipping the
    quantile-edge probe action and both window passes; the result is
    a value-bounded local relation Catalyst broadcasts into the
    join-back. ``mode="auto"`` (default) bounds the collect with
    ``limit(max+1)`` and picks driver under
    ``_RANK_DRIVER_MAX_VALUES`` distinct values. ``mode="distributed"``
    keeps the bucketed machinery — the web-scale path, unchanged."""
    from kkbox_churn_prediction_spark.operators.psi import (
        bucketize_by_edges,
        quantile_edges,
    )

    if mode not in ("auto", "driver", "distributed"):  # pragma: no cover
        raise ValueError(f"unknown mode {mode!r}")
    agg = (
        F.sum(F.col(weight_col)).cast("long")
        if weight_col is not None
        else F.count(F.lit(1))
    )
    vals = df.groupBy(value_col).agg(agg.alias("_cnt"))
    if mode != "distributed":
        max_rows = driver_replay_max_rows(
            df.sparkSession, _RANK_DRIVER_MAX_VALUES
        )
        probe = vals.limit(max_rows + 1) if mode == "auto" else vals
        tbl = probe.toArrow()
        if mode == "driver" or tbl.num_rows <= max_rows:
            return _rank_components_driver(
                df.sparkSession, tbl, vals.schema, value_col
            )
    edges = quantile_edges(vals, value_col, n_bins=n_buckets, exact=False)
    # NULL values get an explicit bucket PAST every real one (they
    # sort after all values, matching the driver replay's NaN-last
    # pandas sort); bucketize_by_edges itself bins NULL as NULL
    # since r5, and a NULL bucket key would silently drop out of the
    # offsets equi-join
    bucketed = vals.withColumn(
        "_bkt",
        F.coalesce(
            bucketize_by_edges(F.col(value_col).cast("double"), edges),
            F.lit(len(edges) + 1),
        ),
    )
    per_bucket = bucketed.groupBy("_bkt").agg(F.sum("_cnt").alias("_bc"))
    w_off = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_bucket.select(
        "_bkt", F.coalesce(F.sum("_bc").over(w_off), F.lit(0)).alias("_off")
    )
    w_in = (
        Window.partitionBy("_bkt")
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        bucketed.join(F.broadcast(offsets), "_bkt")
        .withColumn("_local", F.coalesce(F.sum("_cnt").over(w_in), F.lit(0)))
        .withColumn("_before", F.col("_off") + F.col("_local"))
        .select(value_col, "_cnt", "_before")
    )


def _rank_components_driver(spark, tbl, schema_in, value_col: str) -> DataFrame:
    """Driver-side replay of :func:`value_rank_components` over the
    Arrow-collected distinct-value table: sort ascending with Spark's
    ordering (NULL first, NaN last) and take the shifted cumulative
    count. All-integer — hash-identical to the distributed windows."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            schema_in[value_col],
            T.StructField("_cnt", T.LongType(), False),
            T.StructField("_before", T.LongType(), False),
        ]
    )
    if tbl.num_rows == 0:
        return spark.createDataFrame([], schema)
    # Arrow keeps SQL NULL distinct from float NaN; to_pandas conflates
    # them, so take the validity mask first. Ordering mirrors the
    # distributed machinery: numbers ascending, then NULL, then NaN
    # (both land in the when-chain's overflow bucket — NULL comparisons
    # and NaN comparisons are never <= an edge — where the in-bucket
    # window puts NULL first)
    valid = tbl.column(value_col).is_valid().to_pandas().to_numpy()
    pdf = tbl.to_pandas()
    isna = pdf[value_col].isna().to_numpy()
    pdf["_ord"] = (~valid) * 1 + (isna & valid) * 2
    pdf = pdf.sort_values(["_ord", value_col], kind="mergesort")
    pdf["_before"] = pdf["_cnt"].cumsum() - pdf["_cnt"]
    # values come from the Arrow column (exact types, None for NULL —
    # pandas would promote int-with-null to float), reordered by the
    # sort's original-index permutation
    arrow_vals = tbl.column(value_col).to_pylist()
    out = [
        (arrow_vals[i], int(c), int(b))
        for i, c, b in zip(pdf.index, pdf["_cnt"], pdf["_before"])
    ]
    return spark.createDataFrame(out, schema)


def rank_normalize(
    df: DataFrame,
    value_col: str,
    out_col: str = "rank_norm",
    *,
    n_buckets: int = 256,
) -> DataFrame:
    """Global rank/quantile transform: replace ``value_col`` with its
    AVERAGE 0-based rank scaled to [0, 1] (scipy ``rankdata
    (method='average')`` normalized by N−1 — ties share one value, the
    monotone map every quantile-normalization recipe wants).

    Scale shape — the naive form is ``percent_rank() OVER (ORDER BY
    value)``: a single-partition sort of the corpus (the round-1 ntile
    killer). This is the distributed prefix-sum instead, applied along
    VALUE order: (1) collapse to the distinct-value table with counts
    (one shuffle, map-side combined); (2) approx-quantile edges bucket
    that table so cumulative counts stay bucket-local + a broadcast
    bucket-offset table (≤ ``n_buckets`` rows — same decomposition as
    ``windows.peak_concurrency``); (3) the per-value average rank is a
    pure expression, joined back to rows on the value (broadcast-or-
    shuffle by Catalyst's sizing). No global sort anywhere.
    """
    ranked = value_rank_components(df, value_col, n_buckets=n_buckets)
    total = ranked.agg(F.sum("_cnt").alias("_n"))
    scored = ranked.crossJoin(F.broadcast(total)).select(
        value_col,
        F.round(
            (F.col("_before") + (F.col("_cnt") - 1) / 2.0)
            / F.greatest(F.col("_n") - 1, F.lit(1)),
            6,
        ).alias(out_col),
    )
    return df.join(scored, value_col)


def fold_standardize(
    df: DataFrame,
    value_col: str,
    *,
    fold_col: str = "fold",
    split_col: str = "split",
    train_value: str = "train",
    out_col: str | None = None,
    eps: float = 1e-12,
) -> DataFrame:
    """Leakage-safe fold scaling: μ/σ are fitted on each fold's TRAIN
    rows ONLY and applied to every row of the fold — validation rows
    never contribute to the statistics that transform them, the same
    fit-on-train discipline the reference applies to its scalers and
    encoders inside each backtest fold (`src/train_temporal.py`
    fit/transform split; the engine's OOF target encoder and temporal
    CV share it). :func:`standardize_by_group` is the
    non-fold-aware sibling (stats from ALL group rows).

    Degenerate cases: constant train values → z = 0.0 (every train
    member sits at the mean); a fold with NO train rows → z = NULL
    (nothing to fit — surfaced, not fabricated). Epsilon guard on σ,
    not ``> 0``, per the cross-engine FP discipline.

    Shape: one conditional hash agg (train rows only, ≤ #folds
    output) broadcast back onto the stream — the data never shuffles
    to get scaled.
    """
    out_col = out_col or f"{value_col}_z"
    v = F.col(value_col).cast("double")
    stats = (
        df.where(F.col(split_col) == train_value)
        .groupBy(fold_col)
        .agg(F.avg(v).alias("_mu"), F.stddev_samp(v).alias("_sd"))
    )
    joined = df.join(F.broadcast(stats), fold_col, "left")
    z = F.when(
        F.col("_sd").isNotNull() & (F.col("_sd") > eps),
        (v - F.col("_mu")) / F.col("_sd"),
    ).otherwise(F.when(F.col("_mu").isNotNull(), F.lit(0.0)))
    return joined.withColumn(out_col, F.round(z, 6)).drop("_mu", "_sd")


def woe_iv(
    df: DataFrame,
    value_col: str,
    label_col: str,
    *,
    n_bins: int = 10,
    smoothing: float = 0.5,
    exact_edges: bool = False,
) -> DataFrame:
    """Weight-of-evidence binning + information value — the classic
    churn/credit-scoring feature audit (the reference's modeling
    domain): decile-bin a numeric feature, then per bin
    ``WoE = ln(p̂_pos / p̂_neg)`` with add-``smoothing`` frequencies
    and ``iv_term = (p̂_pos − p̂_neg)·WoE``; ``Σ iv_term`` ranks the
    feature's separating power (rule of thumb: IV < 0.02 useless,
    > 0.5 suspicious/leaky). Output per bin:
    ``(bin, n, n_pos, n_neg, woe, iv_term)``.

    Bins ride :func:`~kkbox_churn_prediction_spark.operators.psi.quantile_edges`
    + ``bucketize_by_edges``. ``exact_edges=False`` (DEFAULT — the
    scale path) uses the GK-sketch ``approx_percentile`` edges, safe
    at 10^12 rows; the gate/oracle requests ``exact_edges=True``
    (np.quantile-analog, 6dp, the PSI-family cross-engine
    discipline) explicitly. Smoothing denominators use the REQUESTED
    ``n_bins`` as a fixed literal so both engines agree even when
    duplicate edges collapse realized bins.

    Shape: one driver-side edge list (≤ n_bins−1 doubles, the PSI
    exemption) → scan-stage when-chain bin → one (bin) hash agg →
    one-row totals broadcast; pure column algebra after.
    """
    from kkbox_churn_prediction_spark.operators.psi import (
        bucketize_by_edges,
        quantile_edges,
    )

    s = float(smoothing)
    edges = quantile_edges(df, value_col, n_bins, exact=exact_edges)
    binned = df.select(
        bucketize_by_edges(F.col(value_col), edges).alias("bin"),
        F.col(label_col).cast("long").alias("_y"),
    )
    counts = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_y").cast("long").alias("n_pos"),
    )
    counts = counts.withColumn("n_neg", (F.col("n") - F.col("n_pos")).cast("long"))
    tot = counts.agg(
        F.sum("n_pos").alias("_pt"), F.sum("n_neg").alias("_nt")
    )
    ps = (F.col("n_pos") + s) / (F.col("_pt") + s * n_bins)
    ns = (F.col("n_neg") + s) / (F.col("_nt") + s * n_bins)
    woe = F.log(ps / ns)
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n",
            "n_pos",
            "n_neg",
            F.round(woe, 6).alias("woe"),
            F.round((ps - ns) * woe, 6).alias("iv_term"),
        )
    )


def full_quantile_edges(
    df: DataFrame,
    value_col: str,
    n_bins: int = 10,
    *,
    exact: bool = True,
    accuracy: int = 10000,
) -> list[float]:
    """Edges INCLUDING min and max (n_bins+1 values at 0, 1/n, …, 1)
    rounded to 6dp — the grid :func:`quantile_match` interpolates on.
    Same exact/approx dual and scale caveat as
    ``psi.quantile_edges`` (which returns interior edges only)."""
    ps = [i / n_bins for i in range(0, n_bins + 1)]
    arr = ",".join(str(p) for p in ps)
    fn = (
        f"percentile({value_col}, array({arr}))"
        if exact
        else f"approx_percentile({value_col}, array({arr}), {int(accuracy)})"
    )
    row = df.select(F.expr(fn).alias("e")).first()
    # empty/all-null frame: the percentile array is NULL -> no edges
    # (callers decide the degenerate policy; r5 fuzz crash fix)
    return (
        [round(float(x), 6) for x in row["e"]]
        if row is not None and row["e"] is not None
        else []
    )


def quantile_match(
    df: DataFrame,
    value_col: str,
    ref: DataFrame,
    ref_value_col: str | None = None,
    *,
    n_bins: int = 10,
    out_col: str | None = None,
) -> DataFrame:
    """Quantile normalization / CDF matching: transform ``value_col``
    so its distribution matches a REFERENCE frame's — each value maps
    through its source quantile position onto the reference quantile
    function (piecewise-linear between the ``n_bins+1`` edges). The
    "apply" counterpart of the drift audits: PSI/JSD say the fold's
    length distribution moved; this op moves it back before the
    model sees it. Values outside the source range clamp to the
    reference min/max.

    Both edge grids are 6dp-rounded driver-side lists (the PSI
    exemption — ≤ 11 doubles each), so the per-row mapping is a pure
    scan-stage when-chain with literals: zero shuffles on the data
    path, and bit-identical arithmetic shapes for the cross-engine
    compare. Equal source edges (duplicate-heavy data) interpolate at
    t = 0 (the bin's left reference edge).
    """
    ref_value_col = ref_value_col or value_col
    out_col = out_col or f"{value_col}_qm"
    se = full_quantile_edges(df, value_col, n_bins)
    re_ = full_quantile_edges(ref, ref_value_col, n_bins)
    if not se or not re_:
        # an empty source or reference fold has no quantile function:
        # every mapped value is NULL (the oracle's NULL edge-array
        # flow; previously crashed iterating the missing edges)
        return df.withColumn(out_col, F.lit(None).cast("double"))
    v = F.col(value_col).cast("double")
    expr = F.lit(float(re_[-1]))  # above the last source edge → ref max
    for i in reversed(range(n_bins)):
        lo, hi = se[i], se[i + 1]
        rlo, rhi = re_[i], re_[i + 1]
        t = (
            F.lit(0.0)
            if hi == lo
            else (v - F.lit(lo)) / F.lit(hi - lo)
        )
        mapped = F.lit(rlo) + t * F.lit(rhi - rlo)
        expr = F.when(v <= F.lit(hi), mapped).otherwise(expr)
    expr = F.when(v < F.lit(se[0]), F.lit(float(re_[0]))).otherwise(expr)
    expr = F.when(v.isNull(), F.lit(None).cast("double")).otherwise(expr)
    return df.withColumn(out_col, F.round(expr, 6))


def feature_label_corr(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    *,
    eps: float = 1e-12,
) -> DataFrame:
    """Feature-screening pass: Pearson / point-biserial correlation of
    every feature against a (binary or numeric) label in ONE scan —
    ``(feature, n, corr, abs_corr)`` ranked input for "which features
    deserve a model's attention" next to :func:`woe_iv` (which sees
    nonlinear separation this misses) and the MI audit (categorical).
    The full feature×feature grid is
    ``association.correlation_matrix``; this is the one-vs-label cut
    with NULL-pair filtering and |r| ranking.

    Shape: features melt to (feature, x, y) via an in-row explode
    (×|features| rows, the profile-melt discipline — never one job
    per feature), then one co-moment hash agg per feature key with
    map-side partials. Constant features or labels yield NULL
    (epsilon-guarded variance product).
    """
    y = F.col(label_col).cast("double")
    arms = [
        F.struct(
            F.lit(c).alias("feature"),
            F.col(c).cast("double").alias("x"),
            y.alias("y"),
        )
        for c in feature_cols
    ]
    melted = (
        df.select(F.explode(F.array(*arms)).alias("s"))
        .select("s.feature", "s.x", "s.y")
        .where(F.col("x").isNotNull() & F.col("y").isNotNull())
    )
    n = F.count(F.lit(1)).cast("double")
    sx, sy = F.sum("x"), F.sum("y")
    sxy = F.sum(F.col("x") * F.col("y"))
    sxx = F.sum(F.col("x") * F.col("x"))
    syy = F.sum(F.col("y") * F.col("y"))
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    r = (n * sxy - sx * sy) / F.sqrt(vx * vy)
    out = melted.groupBy("feature").agg(
        n.cast("long").alias("n"),
        F.round(F.when(vx * vy > eps, r), 6).alias("corr"),
    )
    return out.withColumn("abs_corr", F.abs(F.col("corr")))


def collapse_rare_categories(
    df: DataFrame,
    cat_col: str,
    *,
    min_count: int,
    other_token: str = "__other__",
    out_col: str | None = None,
) -> DataFrame:
    """Rare-label collapse: categories seen fewer than ``min_count``
    times map to ``other_token`` — the standard cardinality guard
    before one-hot/target encoding (a million-category tool column is
    a leakage-and-variance trap; the reference caps categoricals the
    same way before LabelEncoder). NULL stays NULL (missing ≠ rare).

    Shape: one count agg reduced to the FREQUENT-category list (tiny
    by construction — at most total/min_count entries) broadcast back
    as a semi-join membership; the stream never shuffles. Keeping the
    frequent side (not the rare side) bounds the broadcast: rare
    categories can be unbounded, frequent ones cannot.
    """
    out_col = out_col or f"{cat_col}_collapsed"
    frequent = (
        df.where(F.col(cat_col).isNotNull())
        .groupBy(cat_col)
        .agg(F.count(F.lit(1)).alias("_c"))
        .where(F.col("_c") >= int(min_count))
        .select(F.col(cat_col).alias("_freq_val"))
    )
    joined = df.join(
        F.broadcast(frequent),
        F.col(cat_col) == F.col("_freq_val"),
        "left",
    )
    return joined.withColumn(
        out_col,
        F.when(F.col(cat_col).isNull(), F.lit(None).cast("string"))
        .when(F.col("_freq_val").isNotNull(), F.col(cat_col).cast("string"))
        .otherwise(F.lit(other_token)),
    ).drop("_freq_val")


def eb_shrunk_rates(
    df: DataFrame,
    group_col: str,
    hit_col: str,
    *,
    eps: float = 1e-12,
) -> DataFrame:
    """Empirical-Bayes (beta-binomial, method-of-moments) shrinkage of
    per-entity event rates: a conversation with 1 tool call in 2
    turns should NOT carry rate 0.5 into a model next to one with 500
    in 1000 — small samples shrink toward the population prior with a
    data-estimated strength. Output per group:
    ``(group, n, k, raw_rate, shrunk_rate)`` where
    ``shrunk = (k + α)/(n + α + β)`` and (α, β) moment-match the
    spread of the raw per-group rates
    (``s = μ(1−μ)/Var(p) − 1``, ``α = μ·s``, ``β = (1−μ)·s``).
    Degenerate spreads (Var ≈ 0, or Var ≥ μ(1−μ) — more dispersed
    than binomial sampling alone allows s ≤ 0) fall back to the raw
    rate: shrinking toward a prior the data can't estimate fabricates
    confidence.

    Shape: one (group) conditional agg; the two-row moment pass runs
    on the group table; (α, β) ride a one-row broadcast; the shrunk
    rate is pure column algebra. Same explicit expression shapes as
    the oracle.
    """
    per = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(hit_col).cast("long")).cast("long").alias("k"),
    )
    per = per.withColumn("raw_rate", F.col("k") * 1.0 / F.col("n"))
    mom = per.agg(
        F.avg("raw_rate").alias("_mu"), F.var_samp("raw_rate").alias("_var")
    )
    mu = F.col("_mu")
    var = F.col("_var")
    s = mu * (1.0 - mu) / var - 1.0
    prior = mom.select(
        mu.alias("_mu"),
        var.alias("_var"),
        F.when(
            var.isNotNull() & (var > eps) & (mu * (1.0 - mu) / var - 1.0 > eps),
            s,
        ).alias("_s"),
    )
    j = per.crossJoin(F.broadcast(prior))
    alpha = F.col("_mu") * F.col("_s")
    beta = (1.0 - F.col("_mu")) * F.col("_s")
    return j.select(
        group_col,
        "n",
        "k",
        F.round(F.col("raw_rate"), 6).alias("raw_rate"),
        F.round(
            F.when(
                F.col("_s").isNotNull(),
                (F.col("k") + alpha) / (F.col("n") + alpha + beta),
            ).otherwise(F.col("raw_rate")),
            6,
        ).alias("shrunk_rate"),
    )
