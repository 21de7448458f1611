"""Mergeable distinct-count sketches (HLL) for pre-aggregated rollups.

The pattern exact COUNT(DISTINCT) cannot give you at 10^12 rows: keep
ONE small sketch per (bucket, dimension) — e.g. per day — and answer
any coarser window (week, month, arbitrary range) by MERGING sketches
instead of rescanning the raw stream. Exactness is traded for a
bounded relative error (~1.6%/√(2^lgK)) and, crucially,
associativity: union(day sketches) ≡ sketch(union of days), so
incremental backfills (``plans/incremental.py``) can maintain the
daily layer and every report window derives from it.

Spark 4 ships Apache DataSketches HLL natively
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``) —
JVM aggregates with map-side partials, no UDF. The reference's
``COUNT(DISTINCT log_date)``-family features
(``features/features_comprehensive.sql:187``) are the exact
small-scale counterpart.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucket_sketches(
    df: DataFrame,
    fine_bucket: Column,
    value_col: str,
    *,
    coarse_bucket: Column | None = None,
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch (binary) + exact distinct per fine bucket — the
    stored base layer. ``coarse_bucket`` (a function of the same row,
    e.g. the week of the day) rides along as a grouping key so later
    rollups are a plain groupBy on the stored table. ``lg_k=12`` ≈
    1.6% rel. std. error at ≤4 KB per sketch."""
    keys = [fine_bucket.alias("bucket")]
    if coarse_bucket is not None:
        keys.append(coarse_bucket.alias("coarse"))
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("sketch"),
        F.countDistinct(value_col).alias("exact_distinct"),
    )


def rollup_sketches(base: DataFrame, coarse_col: str = "coarse") -> DataFrame:
    """Merge base-layer sketches up to ``coarse_col`` and estimate:
    (bucket, estimate). The raw stream is never touched — that is the
    entire point of storing sketches."""
    merged = base.groupBy(F.col(coarse_col).alias("bucket")).agg(
        F.hll_union_agg("sketch").alias("sketch")
    )
    return merged.select(
        "bucket",
        F.hll_sketch_estimate("sketch").cast("double").alias("estimate"),
    )


def distinct_rollup_check(
    df: DataFrame,
    fine_bucket: Column,
    coarse_bucket: Column,
    value_col: str,
    *,
    lg_k: int = 12,
    rel_tol: float = 0.05,
) -> DataFrame:
    """Audit row per coarse bucket: exact distinct, the fine→coarse
    sketch-MERGE estimate, and whether the estimate sits within
    ``rel_tol``. DataSketches HLL is content-deterministic, so the
    boolean is gate-able against an oracle that asserts the tolerance
    holds. Output: ``bucket, exact_distinct, within_tol``."""
    base = bucket_sketches(
        df, fine_bucket, value_col, coarse_bucket=coarse_bucket, lg_k=lg_k
    )
    est = rollup_sketches(base)
    exact = df.groupBy(coarse_bucket.alias("bucket")).agg(
        F.countDistinct(value_col).cast("bigint").alias("exact_distinct")
    )
    return exact.join(est, on="bucket", how="inner").select(
        "bucket",
        "exact_distinct",
        (
            F.abs(F.col("estimate") - F.col("exact_distinct"))
            <= F.lit(float(rel_tol)) * F.col("exact_distinct")
        ).alias("within_tol"),
    )


def binned_quantile_rollup(
    df: DataFrame,
    value: Column,
    fine_bucket: Column,
    coarse_bucket: Column,
    *,
    bin_width: int = 50,
    ps: tuple[float, ...] = (0.5, 0.9),
) -> DataFrame:
    """Mergeable QUANTILE sketch rollup — the quantile member of the
    sketch family (HLL = distinct, CMS = frequency, this = rank):
    fixed-width bin counts per fine bucket are the stored base layer;
    any coarser window's quantiles come from MERGING bin counts
    (plain sum — associative like the HLL union) and interpolating
    the binned CDF. Error is bounded by ``bin_width`` (the estimate
    is exact if values were uniform within a bin), and the base layer
    is what an incremental backfill maintains.

    Output: ``(coarse, p, est)`` — estimated p-quantile of ``value``
    per coarse bucket, linear interpolation inside the covering bin:
    ``est = bin*w + w * (p*total − cum_below) / bin_count``.

    Shape: ONE (fine, coarse, bin) count agg over the stream (the
    only data-sized exchange); the weekly merge, CDF window, and
    quantile selection all run on the bins table, which is bounded by
    buckets × (value range / bin_width). The p-grid is a broadcast
    literal frame.
    """
    from pyspark.sql import Window

    w = int(bin_width)
    base = (
        df.select(
            fine_bucket.alias("fine"),
            coarse_bucket.alias("coarse"),
            F.floor(value / w).cast("bigint").alias("bin"),
        )
        .groupBy("fine", "coarse", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    merged = base.groupBy("coarse", "bin").agg(F.sum("cnt").alias("cnt"))
    cdf = merged.withColumn(
        "cum",
        F.sum("cnt").over(
            Window.partitionBy("coarse").orderBy("bin").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    ).withColumn(
        "total", F.sum("cnt").over(Window.partitionBy("coarse"))
    )
    spark = df.sparkSession
    p_grid = spark.createDataFrame([(float(p),) for p in ps], "p double")
    eligible = cdf.crossJoin(F.broadcast(p_grid)).where(
        F.col("cum") >= F.col("p") * F.col("total")
    )
    chosen = eligible.groupBy("coarse", "p").agg(
        F.min_by(
            F.struct("bin", "cnt", "cum", "total"), F.col("bin")
        ).alias("s")
    )
    return chosen.select(
        "coarse",
        "p",
        F.round(
            F.col("s.bin") * w
            + w
            * (F.col("p") * F.col("s.total") - (F.col("s.cum") - F.col("s.cnt")))
            / F.col("s.cnt"),
            6,
        ).alias("est"),
    )


def bloom_filter_audit(
    keys: DataFrame,
    key_col: str,
    probes: DataFrame,
    probe_col: str,
    *,
    m_bits: int = 4096,
    k_hashes: int = 3,
) -> DataFrame:
    """Build a Bloom filter over a key set as a DISTRIBUTED bitmap and
    measure its false-positive rate against a disjoint probe set —
    the sizing audit run before shipping the filter into a join
    pruning / decontamination / blocklist path (the engine's
    shingle-hash anti-joins are exact; a Bloom pre-filter is what
    you'd push to the scan at 100 TB).

    Bitmap = ``m_bits`` bits packed 32-per-word: each key sets
    ``k_hashes`` positions via ``stable_hash48(key || '#' || i) mod
    m`` — k INDEPENDENT md5 draws per key, engine-portable. (NOT the
    affine MinHash family ``a_i·h+b_i``: affine maps of one base hash
    collide on ALL k slots whenever the base hashes collide mod m,
    which degrades the filter to a single-hash FPP — measured 0.0037
    vs the predicted 1e-6 before this was caught.) The build is ONE
    groupBy(word).bit_or(mask) over exploded positions — mergeable
    map-side like any agg; the probe side joins the (m/32)-row word
    table (broadcast) and ANDs its k bits. Output is ONE summary row:
    fill ratio, predicted FPP = fill^k, and the measured probe FPP
    (probes are constructed disjoint from keys, so every pass is a
    false positive).
    """
    from ..functions.text import stable_hash48

    def positions(col: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(0), F.lit(k_hashes - 1)),
            lambda i: F.pmod(
                stable_hash48(F.concat(col, F.lit("#"), i.cast("string"))),
                F.lit(m_bits),
            ).cast("int"),
        )

    kd = keys.select(F.col(key_col).cast("string").alias("_k")).distinct()
    built = (
        kd.select(F.explode(positions(F.col("_k"))).alias("_idx"))
        .select(
            (F.col("_idx") / 32).cast("int").alias("_word"),
            F.expr("shiftleft(1L, _idx % 32)").alias("_mask"),
        )
        .groupBy("_word")
        .agg(F.bit_or("_mask").alias("_bits"))
    )
    key_stats = kd.agg(F.count(F.lit(1)).cast("long").alias("n_keys")).crossJoin(
        F.broadcast(
            built.agg(F.sum(F.bit_count("_bits")).cast("long").alias("bits_set"))
        )
    )
    pd_ = probes.select(F.col(probe_col).cast("string").alias("_p")).distinct()
    probed = (
        pd_.select("_p", F.explode(positions(F.col("_p"))).alias("_idx"))
        .select(
            "_p",
            (F.col("_idx") / 32).cast("int").alias("_word"),
            (F.col("_idx") % 32).cast("int").alias("_bit"),
        )
        .join(
            F.broadcast(built.withColumnRenamed("_word", "_bw")),
            F.col("_word") == F.col("_bw"),
            "left",
        )
        .select(
            "_p",
            F.expr(
                "CAST(shiftright(coalesce(_bits, 0L), _bit) & 1L AS INT)"
            ).alias("_hit"),
        )
        .groupBy("_p")
        .agg(F.min("_hit").alias("_pass"))
    )
    probe_stats = probed.agg(
        F.count(F.lit(1)).cast("long").alias("n_probes"),
        F.sum("_pass").cast("long").alias("n_false_pos"),
    )
    fill = F.col("bits_set").cast("double") / F.lit(float(m_bits))
    return (
        key_stats.crossJoin(F.broadcast(probe_stats))
        .select(
            "n_keys",
            F.lit(m_bits).cast("long").alias("m_bits"),
            F.lit(k_hashes).cast("long").alias("k_hashes"),
            "bits_set",
            F.round(fill, 6).alias("fill_ratio"),
            F.round(F.pow(fill, F.lit(float(k_hashes))), 6).alias("predicted_fpp"),
            "n_probes",
            "n_false_pos",
            F.round(
                F.col("n_false_pos").cast("double")
                / F.col("n_probes").cast("double"),
                6,
            ).alias("measured_fpp"),
        )
    )
