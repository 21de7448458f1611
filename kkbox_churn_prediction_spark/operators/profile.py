"""One-pass table profiling: per-column null/distinct/min/max stats.

The data-quality sweep a 100 TB ingest runs before anything else —
the engine-side generalization of the reference's defensive
`validate_features` null/dtype report (``src/features_processor.py:71-95``),
applied to RAW tables instead of the finished feature matrix.

Distributed shape (two passes, NO Expand):

- scalar stats: ONE wide hash aggregate computes row count and every
  column's non-null count + min + max simultaneously — a single scan,
  map-side partials, results rendered to strings AFTER aggregation so
  numeric ordering is preserved.
- distinct counts: Spark plans multiple ``COUNT(DISTINCT col)`` in one
  aggregate via Expand — an (n_cols+1)× row multiplication BEFORE the
  shuffle (the same trap the as-of feature family rewrites away,
  ``operators/horizons.py:123-144``). Instead the table is melted to
  (column, value-as-string) pairs — injective casts keep distinct
  counts exact — and counted with a plain two-level aggregation: one
  shuffle keyed by (column, value), no row explosion beyond ×n_cols
  on the slim projection. ``approx=True`` swaps in
  ``approx_count_distinct`` inside the SAME wide agg (one pass total)
  for the 10^12-row profile where exactness is not worth the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame, cols: list[str], *, approx: bool = False, rsd: float = 0.02
) -> DataFrame:
    """Long-format profile: one row per column with ``n_rows``,
    ``n_null``, ``n_distinct`` (nulls excluded, SQL convention),
    ``min_str``/``max_str`` (post-aggregation string rendering)."""
    wide_aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        wide_aggs += [
            F.count(c).alias(f"_nn_{c}"),
            F.min(c).cast("string").alias(f"_min_{c}"),
            F.max(c).cast("string").alias(f"_max_{c}"),
        ]
        if approx:
            wide_aggs.append(
                F.approx_count_distinct(c, rsd).alias(f"_nd_{c}")
            )
    wide = df.agg(*wide_aggs)

    rows = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("_n").alias("n_rows"),
            (F.col("_n") - F.col(f"_nn_{c}")).cast("bigint").alias("n_null"),
            *(
                [F.col(f"_nd_{c}").cast("bigint").alias("n_distinct")]
                if approx
                else []
            ),
            F.col(f"_min_{c}").alias("min_str"),
            F.col(f"_max_{c}").alias("max_str"),
        )
        for c in cols
    ]
    melted = wide.select(F.explode(F.array(*rows)).alias("s")).select("s.*")
    if approx:
        return melted

    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select("p.*")
    nd = (
        pairs.where(F.col("value").isNotNull())
        .groupBy("column", "value")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("column")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_distinct"))
    )
    return melted.join(nd, on="column", how="left").select(
        "column",
        "n_rows",
        "n_null",
        F.coalesce("n_distinct", F.lit(0)).cast("bigint").alias("n_distinct"),
        "min_str",
        "max_str",
    )


def table_checksum(df: DataFrame, cols: list[str]) -> DataFrame:
    """Order-insensitive cross-engine table fingerprint → one row
    ``(n_rows, checksum_sum, checksum_xor)``.

    The replication/migration validator: after copying a table
    between engines or regions, compare fingerprints instead of rows.
    Built on ``stable_hash48`` (md5-derived, reproducible in DuckDB —
    Spark's ``hash``/``xxhash64`` are not), so the SAME fingerprint
    is computable on both sides of a migration.

    Row canonicalization: each column is cast to string and
    NULL-coalesced to a ``\\x01`` sentinel, joined with ``\\x1f`` —
    unambiguous (the sentinel/separator can't collide with cast
    output for the supported column types: strings without control
    chars, integers, dates). Float columns are the caller's problem —
    engine-specific decimal rendering breaks cross-engine equality;
    cast to DECIMAL first.

    Two independent reductions over the same hash (both commutative,
    so the result is partition-order-invariant):

    - ``checksum_sum``: Σ h mod M61, summed in DECIMAL(38,0) so the
      48-bit per-row hashes never overflow (BIGINT Σ wraps past ~32k
      max-valued rows; decimal keeps the mod exact at any count).
    - ``checksum_xor``: bitwise XOR — overflow-free, but blind to
      duplicate-pair edits (two identical rows cancel); the sum
      catches those, the xor catches reorder-resistant transpositions
      the sum's modular wrap could mask. Together with ``n_rows``
      a collision requires simultaneous md5-prefix coincidences.

    Distributed shape: ONE wide aggregation, map-side partials, no
    shuffle beyond the single-row final combine.
    """
    from kkbox_churn_prediction_spark.functions.text import (
        MERSENNE_61,
        stable_hash48,
    )

    canon = F.concat_ws(
        "\x1f",
        *[F.coalesce(F.col(c).cast("string"), F.lit("\x01")) for c in cols],
    )
    h = stable_hash48(canon)
    return df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.pmod(F.sum(h.cast("decimal(38,0)")), F.lit(MERSENNE_61))
        .cast("bigint")
        .alias("checksum_sum"),
        F.bit_xor(h).cast("bigint").alias("checksum_xor"),
    )


def prefix_sharing(
    turns: DataFrame, depths: tuple[int, ...] = (1, 2, 3), id_col: str = "conv_id"
) -> DataFrame:
    """Conversation prefix-sharing profile: for each depth ``d``, how
    many conversations share an identical first-``d``-turn prefix —
    the statistic that sizes prefix/KV-cache reuse and flags
    boilerplate system-prompt duplication in agent-transcript corpora.
    Output per depth: ``(depth, n_convs, n_distinct_prefixes,
    max_group, sharing_factor)`` where sharing_factor =
    n_convs / n_distinct_prefixes (1.0 = all unique) and only
    conversations with >= d turns count at depth d.

    Shape: turns are filtered to ``turn_idx < max(depths)`` BEFORE
    the per-conversation collect, so the aggregation buffer holds at
    most ``max(depths)`` texts per conversation regardless of
    conversation length (no mega-conversation risk); prefixes reduce
    to 48-bit hashes before the (depth, prefix) count, so the shuffle
    carries hashes, not text (joined with the \\x1f unit separator —
    unambiguous under concatenation). Two-level agg, map-side
    partials.
    """
    from kkbox_churn_prediction_spark.functions.text import stable_hash48

    mx = max(depths)
    pre = turns.where(F.col("turn_idx") < mx).select(
        id_col, "ts", "turn_idx", F.coalesce(F.col("text"), F.lit("")).alias("_tx")
    )
    lists = pre.groupBy(id_col).agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("ts", "turn_idx", "_tx"))),
            lambda s: s["_tx"],
        ).alias("_texts")
    )
    branches = [
        F.struct(
            F.lit(d).alias("depth"),
            F.when(
                F.size("_texts") >= d,
                stable_hash48(
                    F.concat_ws("\u001f", F.slice(F.col("_texts"), 1, d))
                ),
            ).alias("ph"),
        )
        for d in depths
    ]
    stacked = (
        lists.select(id_col, F.explode(F.array(*branches)).alias("s"))
        .select(F.col("s.depth").alias("depth"), F.col("s.ph").alias("ph"))
        .where(F.col("ph").isNotNull())
    )
    groups = stacked.groupBy("depth", "ph").agg(F.count(F.lit(1)).alias("cnt"))
    return groups.groupBy("depth").agg(
        F.sum("cnt").cast("long").alias("n_convs"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_prefixes"),
        F.max("cnt").cast("long").alias("max_group"),
        F.round(F.sum("cnt") * 1.0 / F.count(F.lit(1)), 6).alias("sharing_factor"),
    )


_BENFORD_EXPECTED = {
    1: 0.30103, 2: 0.176091, 3: 0.124939, 4: 0.09691, 5: 0.079181,
    6: 0.066947, 7: 0.057992, 8: 0.051153, 9: 0.045757,
}  # round(log10(1 + 1/d), 6) — literals so both engines agree exactly


def benford_profile(df: DataFrame, value_col: str) -> DataFrame:
    """First-significant-digit distribution of a positive numeric
    column against Benford's law — the classic fabricated-data /
    synthetic-artifact screen for financial-style measures (organic
    multiplicative data follows log10(1 + 1/d); uniform generators
    and copy-paste rows do not). Output per digit: ``(digit, n,
    freq, expected, dev)``.

    Contract: rows with value < 1 are excluded (the digit comes from
    the integer part — ``FLOOR`` then string, because a direct
    double→int cast ROUNDS in some engines and log10-based digit
    extraction hits libm ulp disagreements at exact powers of ten).
    Expected frequencies are shared 6dp literals, not engine-side
    logarithms, for the same reason.

    Shape: scan-stage digit projection → 9-key hash agg (map-side
    partials) → one-row total broadcast. Trivially scale-safe.
    """
    v = F.col(value_col)
    digit = (
        F.substring(F.floor(v).cast("long").cast("string"), 1, 1).cast("int")
    )
    counts = (
        df.where(v >= 1)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    total = counts.agg(F.sum("n").alias("_t"))
    expected = F.lit(None).cast("double")
    for d, e in _BENFORD_EXPECTED.items():
        expected = F.when(F.col("digit") == d, F.lit(e)).otherwise(expected)
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            F.round(F.col("n") * 1.0 / F.col("_t"), 6).alias("freq"),
            expected.alias("expected"),
        )
        .withColumn("dev", F.round(F.col("freq") - F.col("expected"), 6))
    )


def schema_drift_report(
    df: DataFrame, cols: list[str], early: "F.Column"
) -> DataFrame:
    """Per-column data-quality drift between two halves of a table
    (``early`` = boolean split indicator, typically a time midpoint):
    row counts, null rates, and EXACT distinct-value counts per half,
    plus the null-rate delta — the schema-health companion to the
    distributional PSI family (a column whose null rate doubles or
    whose cardinality collapses between halves breaks downstream
    feature encoders long before PSI fires).

    Shape: columns are STACKED into long format in one projection
    (no per-column scans), then ONE (col, half, value) pre-aggregate
    feeds the Expand-free exact-NDV count (the engine's two-phase
    COUNT DISTINCT discipline) while a sibling (col, half) agg
    carries counts/nulls; both pivot over the ≤2·|cols| row result.
    Values are compared as strings — cast formatting differs across
    engines but is injective, so cardinalities (all the report
    needs) agree.
    """
    arms = [
        F.struct(
            F.lit(c).alias("col_name"), F.col(c).cast("string").alias("v")
        )
        for c in cols
    ]
    long = df.select(
        early.cast("int").alias("early"), F.explode(F.array(*arms)).alias("s")
    ).select("early", F.col("s.col_name").alias("col_name"), F.col("s.v").alias("v"))
    stats = long.groupBy("col_name", "early").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)).cast("long").alias("n_null"),
    )
    ndv = (
        long.where(F.col("v").isNotNull())
        .groupBy("col_name", "early", "v")
        .agg(F.lit(1).alias("_one"))
        .groupBy("col_name", "early")
        .agg(F.count(F.lit(1)).cast("long").alias("ndv"))
    )
    j = stats.join(ndv, ["col_name", "early"], "left").select(
        "col_name",
        "early",
        "n",
        "n_null",
        F.coalesce("ndv", F.lit(0)).cast("long").alias("ndv"),
    )

    def half(c: str, e: int):
        return F.max(F.when(F.col("early") == e, F.col(c)))

    piv = j.groupBy("col_name").agg(
        F.coalesce(half("n", 1), F.lit(0)).cast("long").alias("n_early"),
        F.coalesce(half("n", 0), F.lit(0)).cast("long").alias("n_late"),
        F.coalesce(half("n_null", 1), F.lit(0)).cast("long").alias("null_early"),
        F.coalesce(half("n_null", 0), F.lit(0)).cast("long").alias("null_late"),
        F.coalesce(half("ndv", 1), F.lit(0)).cast("long").alias("ndv_early"),
        F.coalesce(half("ndv", 0), F.lit(0)).cast("long").alias("ndv_late"),
    )

    def rate(num: str, den: str):
        return F.when(
            F.col(den) > 0,
            F.col(num).cast("double") / F.col(den).cast("double"),
        ).otherwise(F.lit(0.0))

    r_e = rate("null_early", "n_early")
    r_l = rate("null_late", "n_late")
    return piv.select(
        F.col("col_name").alias("column"),
        "n_early",
        "n_late",
        F.round(r_e, 6).alias("null_rate_early"),
        F.round(r_l, 6).alias("null_rate_late"),
        F.round(r_e - r_l, 6).alias("null_rate_delta"),
        "ndv_early",
        "ndv_late",
    )


def freshness_audit(
    rows: DataFrame,
    group_col: str,
    ts_col: str = "ts",
    recent_days: int = 7,
    stale_hours: int = 24,
) -> DataFrame:
    """Per-group data-freshness audit: how far each group's newest
    row lags the table's global high-water mark, plus trailing-window
    volume — the first operational check on an incrementally-loaded
    transcript/feature table (a stale source silently truncates every
    as-of feature built on it, the failure mode the reference's
    cutoff logic assumes away; cf. ``src/etl.py`` load ordering).

    Output per group: ``n_rows``, ``max_ts``, ``lag_hours`` behind
    the global max (exact integer-microsecond arithmetic, hours at
    6dp), ``rows_recent`` = rows on the trailing ``recent_days``
    CALENDAR days ending at the global max's day (day-bucketed so the
    count rides the same single scan), and ``is_stale`` = lag_hours
    > ``stale_hours``.

    Scale shape: ONE scan — a hash aggregate to per-(group, day)
    counts + max-micros (tiny post-agg frame: groups × active days),
    then per-group rollup and the global high-water mark via windows
    over that frame. No per-row second pass, no join.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    day = F.date_trunc("day", F.col(ts_col).cast("timestamp"))
    per_day = rows.groupBy(F.col(group_col), day.alias("_day")).agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.max(us).alias("_mx"),
    )
    per = per_day.groupBy(group_col).agg(
        F.sum("_n").cast("long").alias("n_rows"),
        F.max("_mx").alias("_max_us"),
        F.max(F.col("_day")).alias("_max_day"),
        F.map_from_entries(
            F.collect_list(F.struct(F.col("_day"), F.col("_n")))
        ).alias("_by_day"),
    )
    total = Window.partitionBy()
    gmax_us = F.max("_max_us").over(total)
    gmax_day = F.max("_max_day").over(total)
    staged = per.select(
        group_col,
        "n_rows",
        "_max_us",
        "_by_day",
        gmax_us.alias("_gmax_us"),
        gmax_day.alias("_gmax_day"),
    )
    lo = F.col("_gmax_day") - F.expr(f"INTERVAL {int(recent_days) - 1} DAYS")
    recent = F.aggregate(
        F.filter(
            F.map_entries(F.col("_by_day")),
            lambda e: (e["key"] >= lo) & (e["key"] <= F.col("_gmax_day")),
        ),
        F.lit(0).cast("long"),
        lambda acc, e: acc + e["value"],
    )
    lag_hours = (
        (F.col("_gmax_us") - F.col("_max_us")).cast("double")
        / F.lit(3_600_000_000.0)
    )
    return staged.select(
        group_col,
        "n_rows",
        F.timestamp_micros(F.col("_max_us")).alias("max_ts"),
        F.round(lag_hours, 6).alias("lag_hours"),
        recent.alias("rows_recent"),
        F.when(
            lag_hours > F.lit(float(stale_hours)), F.lit(1)
        ).otherwise(F.lit(0)).cast("int").alias("is_stale"),
    )


def join_size_estimate(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Pre-flight equi-join cardinality estimate — the planner-style
    check a pipeline runs BEFORE committing to an expensive join:
    |A ⋈ B| = Σ_k c_A(k)·c_B(k) computed exactly from the two
    per-key count tables (bounded by the key domains, never the row
    counts), plus the max per-key fan-out product — the skew red
    flag (one hot key × hot key pair can dominate the output).

    Output one row: per-side rows/keys, exact join_rows, the
    independence-assumption estimate rows_l·rows_r/max(keys), and
    max_key_product. At 100 TB the count tables are what you'd
    sketch with CMS; here they are exact and the estimate is an
    identity — the gate's value is the FAN-OUT diagnostics.
    """
    lc = left.groupBy(F.col(left_key).alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("cl")
    )
    rc = right.groupBy(F.col(right_key).alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("cr")
    )
    joined = lc.join(rc, "k")
    stats = joined.agg(
        F.sum(F.col("cl") * F.col("cr")).cast("long").alias("join_rows"),
        F.max(F.col("cl") * F.col("cr")).cast("long").alias("max_key_product"),
        F.count(F.lit(1)).cast("long").alias("matched_keys"),
    )
    ls = lc.agg(
        F.sum("cl").cast("long").alias("rows_left"),
        F.count(F.lit(1)).cast("long").alias("keys_left"),
    )
    rs = rc.agg(
        F.sum("cr").cast("long").alias("rows_right"),
        F.count(F.lit(1)).cast("long").alias("keys_right"),
    )
    out = ls.crossJoin(F.broadcast(rs)).crossJoin(F.broadcast(stats))
    naive = (
        F.col("rows_left").cast("double")
        * F.col("rows_right").cast("double")
        / F.greatest(
            F.greatest(F.col("keys_left"), F.col("keys_right")).cast("double"),
            F.lit(1.0),
        )
    )
    return out.select(
        "rows_left", "keys_left", "rows_right", "keys_right",
        "matched_keys", "join_rows", "max_key_product",
        F.round(naive, 6).alias("independence_estimate"),
        F.round(
            F.col("join_rows").cast("double") / F.greatest(naive, F.lit(1e-300)),
            6,
        ).alias("estimate_ratio"),
    )


def fk_orphan_audit(
    tables: dict[str, tuple[DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity audit: for each named FK relationship
    (child_df, fk_col) → (parent_df, pk_col), count child rows whose
    key has NO parent (orphans) — the load-order / partial-ingest
    data-quality gate every warehouse runs after a backfill.

    One LEFT ANTI join per relationship (semi-join family, J7
    discipline); output one row per relationship with child rows,
    orphan rows, and the orphan share.
    """
    frames = []
    for name, (child, fk, parent, pk) in tables.items():
        total = child.agg(F.count(F.lit(1)).cast("long").alias("child_rows"))
        orphans = (
            child.select(F.col(fk).alias("_k"))
            .where(F.col("_k").isNotNull())
            .join(
                parent.select(F.col(pk).alias("_k")).distinct(),
                "_k",
                "left_anti",
            )
            .agg(F.count(F.lit(1)).cast("long").alias("orphan_rows"))
        )
        row = total.crossJoin(F.broadcast(orphans)).select(
            F.lit(name).alias("relationship"),
            "child_rows",
            "orphan_rows",
            F.round(
                F.col("orphan_rows").cast("double")
                / F.greatest(F.col("child_rows").cast("double"), F.lit(1.0)),
                6,
            ).alias("orphan_share"),
        )
        frames.append(row)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.orderBy("relationship")


def turn_contiguity_audit(turns: DataFrame) -> DataFrame:
    """Transcript integrity audit over the engine's OWN input
    contract: ``turn_idx`` must be a dense 0..n-1 sequence per
    conversation whose order agrees with event time. Upstream loaders
    violate this in four distinct ways — duplicated indices (double
    ingest), gaps (dropped turns), non-zero start (truncated head),
    and ts/idx order disagreement (clock skew or out-of-order
    ingest) — and every window operator in this engine (sessionize,
    lag/lead, as-of) silently degrades under them, so this is the
    pre-flight the backfill job should gate on (the transcript twin
    of :func:`fk_orphan_audit`).

    Output: ONE summary row — ``n_convs``, per-defect conversation
    counts (``n_dup_idx``, ``n_gapped``, ``n_nonzero_start``,
    ``n_order_violation``), ``n_clean``, plus total excess duplicate
    rows and total missing indices (magnitude, not just incidence).

    Shape: the lag for the order check is computed BEFORE the
    groupBy, so all four defect signals fold into a SINGLE per-conv
    hash agg riding the window's conv_id partitioning — one corpus
    shuffle total — followed by a 1-row reduce.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("ts", "turn_idx")
    lagged = turns.select(
        "conv_id",
        "turn_idx",
        F.lag("turn_idx").over(w).alias("_prev_idx"),
    )
    per_conv = lagged.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.count_distinct(F.col("turn_idx")).cast("long").alias("_nd"),
        F.min("turn_idx").cast("long").alias("_mn"),
        F.max("turn_idx").cast("long").alias("_mx"),
        F.sum(
            F.when(F.col("_prev_idx").isNotNull() & (F.col("turn_idx") < F.col("_prev_idx")), 1).otherwise(0)
        )
        .cast("long")
        .alias("_oov"),
    )
    dup = (F.col("_n") > F.col("_nd")).cast("int")
    gap = ((F.col("_mx") - F.col("_mn") + 1) > F.col("_nd")).cast("int")
    nz = (F.col("_mn") != 0).cast("int")
    oov = (F.col("_oov") > 0).cast("int")
    return per_conv.agg(
        F.count(F.lit(1)).cast("long").alias("n_convs"),
        F.sum(dup).cast("long").alias("n_dup_idx"),
        F.sum(gap).cast("long").alias("n_gapped"),
        F.sum(nz).cast("long").alias("n_nonzero_start"),
        F.sum(oov).cast("long").alias("n_order_violation"),
        F.sum(
            F.when((dup + gap + nz + oov) == 0, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_clean"),
        F.sum(F.col("_n") - F.col("_nd")).cast("long").alias("excess_dup_rows"),
        F.sum(F.col("_mx") - F.col("_mn") + 1 - F.col("_nd"))
        .cast("long")
        .alias("missing_indices"),
    )


def null_pattern_profile(
    df: DataFrame, cols: list[str], *, k: int = 50
) -> DataFrame:
    """Missing-data PATTERN profile: which COMBINATIONS of the given
    columns go null together, with counts and shares — the joint view
    :func:`profile_table`'s per-column null rates can't give
    (100 "text null" + 100 "tool null" is two different datasets
    depending on whether they're the same 100 rows). The standard
    missingness-mechanism triage (MCAR vs systematic loader bugs:
    a dominant joint pattern is a pipeline defect signature, not
    random noise).

    Output: one row per observed pattern — ``pattern`` is the
    column:0/1 signature string (1 = null), ``n_rows``, ``share`` —
    top-``k`` by count with a deterministic pattern tiebreak.

    Shape: ONE hash agg over the pattern signature (map-side
    combined; ≤ 2^len(cols) distinct groups regardless of row count)
    + a broadcast 1-row total. The signature is a pure string expr —
    no UDF, no explode.
    """
    sig = F.concat_ws(
        ",",
        *[
            F.concat(F.lit(c + ":"), F.col(c).isNull().cast("int").cast("string"))
            for c in cols
        ],
    )
    counts = (
        df.select(sig.alias("pattern"))
        .groupBy("pattern")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )
    total = counts.agg(F.sum("n_rows").alias("_tot"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "pattern",
            "n_rows",
            F.round(F.col("n_rows") * 1.0 / F.col("_tot"), 6).alias("share"),
        )
        .orderBy(F.desc("n_rows"), "pattern")
        .limit(int(k))
    )
