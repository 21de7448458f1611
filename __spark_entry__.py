"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship point-in-time backfill at sf0.001.
``queries()`` maps operator names → (spark, sf_dir) → DataFrame.
``oracle_sql()`` gives DuckDB-equivalent SQL per query.

The transcript table (conv_id, turn_idx, role, text, tool, ts) is
derived deterministically from ``events.parquet`` by the SAME mapping
in both engines — see ``sources/events.py`` and ``_CONV_CTE`` below.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"

# ---------------------------------------------------------------------------
# Shared DuckDB CTEs: transcript derivation + cutoff grid.
# MUST stay in lock-step with sources/events.py (Spark side).
# ---------------------------------------------------------------------------
_CONV_CTE = """
conversations AS (
    SELECT concat('c', user_id) AS conv_id,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INTEGER) AS turn_idx,
           CASE event_type WHEN 'signup' THEN 'system'
                           WHEN 'purchase' THEN 'assistant'
                           WHEN 'error' THEN 'tool'
                           ELSE 'user' END AS role,
           concat(event_type, ' ', props) AS text,
           CASE WHEN event_type IN ('purchase', 'error') THEN event_type END AS tool,
           ts
    FROM events
    WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
cutoffs AS (
    SELECT DISTINCT CAST(date_trunc('week', ts) AS TIMESTAMP) + INTERVAL 7 DAY AS cutoff_ts
    FROM events WHERE ts IS NOT NULL
)
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from kkbox_churn_prediction_spark.plans.backfill import backfill_from_events

    return backfill_from_events(spark, SF0001)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_asof_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kkbox_churn_prediction_spark.plans.backfill import backfill_from_events

    return backfill_from_events(spark, sf_dir)


def _q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kkbox_churn_prediction_spark.operators.sessionize import session_aggregates
    from kkbox_churn_prediction_spark.sources.events import conversations_from_events

    return session_aggregates(conversations_from_events(spark, sf_dir))


def _q_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kkbox_churn_prediction_spark.operators.lags import lag_lead_features
    from kkbox_churn_prediction_spark.sources.events import conversations_from_events

    return lag_lead_features(conversations_from_events(spark, sf_dir)).select(
        "conv_id",
        "turn_idx",
        "text_len",
        "prev_text_len_1",
        "next_text_len_1",
        "gap_micros_prev",
        "same_role_as_prev",
    )


def _q_turn_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kkbox_churn_prediction_spark.operators.labels import time_to_next_qualifying_turn
    from kkbox_churn_prediction_spark.sources.events import conversations_from_events

    return time_to_next_qualifying_turn(conversations_from_events(spark, sf_dir)).select(
        "conv_id", "turn_idx", "micros_to_next_qualifying"
    )


def _q_entity_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kkbox_churn_prediction_spark.operators.labels import entity_labels
    from kkbox_churn_prediction_spark.sources.events import (
        conversations_from_events,
        cutoffs_from_events,
    )

    return entity_labels(
        conversations_from_events(spark, sf_dir),
        cutoffs_from_events(spark, sf_dir),
        horizon_days=3,
    )


def _q_history_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kkbox_churn_prediction_spark.operators.history import history_lag_features
    from kkbox_churn_prediction_spark.sources.events import conversations_from_events

    return history_lag_features(conversations_from_events(spark, sf_dir), n_lags=2)


def _q_psi_text_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.psi import fixed_width_bins, psi_from_bins
    from kkbox_churn_prediction_spark.sources.events import conversations_from_events

    conv = conversations_from_events(spark, sf_dir)
    week_no = F.floor(F.unix_micros(F.date_trunc("week", F.col("ts"))) / F.lit(7 * 86400 * 1_000_000))
    binned = conv.select(
        F.when(week_no % 2 == 0, F.lit("even")).otherwise(F.lit("odd")).alias("fold"),
        fixed_width_bins(F.expr("CAST(length(text) AS BIGINT)"), 5.0, 10).alias("bin"),
    )
    return psi_from_bins(binned, "fold", "bin", ref_fold="even")


def _q_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kkbox_churn_prediction_spark.operators.asof import asof_join_broadcast_cutoffs
    from kkbox_churn_prediction_spark.operators.leakage import leakage_audit
    from kkbox_churn_prediction_spark.sources.events import (
        conversations_from_events,
        cutoffs_from_events,
    )

    joined = asof_join_broadcast_cutoffs(
        conversations_from_events(spark, sf_dir),
        cutoffs_from_events(spark, sf_dir),
        lookback_days=7,
    )
    return leakage_audit(joined)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.functions.text import normalize_text, tokens
    from kkbox_churn_prediction_spark.operators.dedup import exact_dedup

    # key = first-5-word prefix of the normalized text (prefix
    # fingerprint — groups docs sharing an opening)
    key = F.array_join(F.slice(tokens(normalize_text(F.col("text"))), 1, 5), " ")
    return exact_dedup(_docs(spark, sf_dir), key)


def _q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kkbox_churn_prediction_spark.operators.dedup import ngram_jaccard_pairs

    # max_shingle_freq caps hot shingles: a stop-shingle shared by m
    # docs contributes O(m²) rows to the pair join, so an uncapped run
    # at 10^6+ docs is quadratic in the head of the shingle frequency
    # distribution. The cap drops shingles appearing in >100 docs
    # (mirrored in the DuckDB oracle); skew fixture in
    # tests/test_dedup_similarity.py bounds the candidate row count.
    return ngram_jaccard_pairs(
        _docs(spark, sf_dir), n=3, threshold=0.3, max_shingle_freq=100
    )


def _q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kkbox_churn_prediction_spark.operators.dedup import containment_pairs

    # asymmetric doc-in-doc screen: same capped shingle-hash join as
    # the Jaccard gate (max_shingle_freq=100, mirrored in the oracle),
    # but scored by containment so a short doc quoted inside a long
    # one still ships a pair (Jaccard's union washes it out)
    return containment_pairs(
        _docs(spark, sf_dir), n=3, threshold=0.5, max_shingle_freq=100
    )


def _q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kkbox_churn_prediction_spark.operators.dedup import minhash_signatures

    return minhash_signatures(_docs(spark, sf_dir), n=3, k=8)


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kkbox_churn_prediction_spark.operators.dedup import simhash

    return simhash(_docs(spark, sf_dir), bits=16)


def _q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.similarity import brute_force_topk

    embs = _embs(spark, sf_dir)
    return brute_force_topk(embs, embs.where(F.col("vec_id") < 10), k=5)


def _q_embedding_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.similarity import lsh_bucketed_topk

    embs = _embs(spark, sf_dir)
    return lsh_bucketed_topk(embs, embs.where(F.col("vec_id") < 10), k=5, bits=4)


def _q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality gate: per-query recall@5 of the sign-LSH ANN
    against exact brute force. Both sides prune to top-k first, so
    the compare runs on result-sized data."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.similarity import (
        brute_force_topk,
        lsh_bucketed_topk,
        recall_at_k,
    )

    embs = _embs(spark, sf_dir)
    queries = embs.where(F.col("vec_id") < 10)
    return recall_at_k(
        lsh_bucketed_topk(embs, queries, k=5, bits=4),
        brute_force_topk(embs, queries, k=5),
        k=5,
    )


def _q_embedding_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding dispersion (variance trace + RMS radius):
    the mode-collapse/duplicate-heaviness audit complementing
    centroid drift. ||x||² folds per row (no dims explosion); μ from
    the Summarizer centroid pass."""
    from kkbox_churn_prediction_spark.operators.similarity import (
        embedding_diversity,
    )

    return embedding_diversity(_embs(spark, sf_dir), "label")


def _q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kkbox_churn_prediction_spark.operators.textstats import lang_id

    return lang_id(_docs(spark, sf_dir))


def _q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kkbox_churn_prediction_spark.operators.textstats import quality_features

    return quality_features(_docs(spark, sf_dir))


def _q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.textstats import (
        bpe_ish_token_count,
        token_count,
    )

    return _docs(spark, sf_dir).select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        bpe_ish_token_count(F.col("text")).alias("n_bpe_ish_tokens"),
    )


def _q_fingerprint_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kkbox_churn_prediction_spark.operators.textstats import fingerprint

    return fingerprint(_docs(spark, sf_dir), n=5)


def _conv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kkbox_churn_prediction_spark.sources.events import conversations_from_events

    return conversations_from_events(spark, sf_dir)


def _q_mode_tool(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kkbox_churn_prediction_spark.operators.relational import mode_per_group

    return mode_per_group(_conv(spark, sf_dir), "conv_id", "tool")


def _q_last_role(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kkbox_churn_prediction_spark.operators.relational import last_value_before_cutoff
    from kkbox_churn_prediction_spark.sources.events import cutoffs_from_events

    return last_value_before_cutoff(
        _conv(spark, sf_dir), cutoffs_from_events(spark, sf_dir), "role"
    )


def _q_daily_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kkbox_churn_prediction_spark.operators.relational import daily_engagement

    return daily_engagement(_conv(spark, sf_dir))


def _q_session_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kkbox_churn_prediction_spark.operators.relational import (
        session_length_percentiles,
    )
    from kkbox_churn_prediction_spark.operators.sessionize import session_aggregates

    # exact=True requested EXPLICITLY to hash-match the DuckDB oracle;
    # the operator default is the scale-safe approx_percentile path
    return session_length_percentiles(
        session_aggregates(_conv(spark, sf_dir)), exact=True
    )


def _q_topk_busiest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kkbox_churn_prediction_spark.operators.relational import topk_busiest

    return topk_busiest(_conv(spark, sf_dir), k=10)


def _q_semi_join_tool_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kkbox_churn_prediction_spark.operators.relational import semi_join_tool_users

    return semi_join_tool_users(_conv(spark, sf_dir))


def _q_pivot_role_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kkbox_churn_prediction_spark.operators.relational import pivot_role_counts

    return pivot_role_counts(_conv(spark, sf_dir))


def _q_unpivot_role_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pivot → unpivot round trip back to (conv_id, role, n) long
    form — zero-count cells survive, proving this is a true melt
    (Expand node), not a groupBy restatement."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.relational import (
        pivot_role_counts,
        unpivot_counts,
    )

    roles = ["user", "assistant", "system", "tool"]
    wide = pivot_role_counts(_conv(spark, sf_dir)).select(
        "conv_id", *[F.col(f"n_{r}").alias(r) for r in roles]
    )
    return unpivot_counts(wide, "conv_id", roles)


def _q_union_dedup_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kkbox_churn_prediction_spark.operators.relational import union_dedup_activity

    return union_dedup_activity(_conv(spark, sf_dir))


def _q_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped multi-stat agg (A1/A6) over lineitem.

    Money sums are DECIMAL-exact before the final double cast so the
    result is identical under any row order / partitioning (double
    summation order would differ between engines)."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    qty = F.col("l_quantity").cast("decimal(12,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(5,2)")
    tax = F.col("l_tax").cast("decimal(5,2)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (F.lit(1).cast("decimal(5,2)") - disc)).cast("double").alias("sum_disc_price"),
            F.sum(
                price
                * (F.lit(1).cast("decimal(5,2)") - disc)
                * (F.lit(1).cast("decimal(5,2)") + tax)
            ).cast("double").alias("sum_charge"),
            F.round(F.sum(qty).cast("double") / F.count(F.lit(1)), 6).alias("avg_qty"),
            F.round(F.sum(price).cast("double") / F.count(F.lit(1)), 6).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def _q_session_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kkbox_churn_prediction_spark.operators.sessionize import sessionize

    return sessionize(_conv(spark, sf_dir)).select("conv_id", "turn_idx", "session_id")


def _q_rolling_turn_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kkbox_churn_prediction_spark.operators.windows import rolling_interval_stats

    return rolling_interval_stats(_conv(spark, sf_dir), window_seconds=1800)


def _q_tumbling_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kkbox_churn_prediction_spark.operators.windows import tumbling_window_counts

    return tumbling_window_counts(_conv(spark, sf_dir), width_seconds=21600)


def _q_trend_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kkbox_churn_prediction_spark.operators.horizons import trend_features
    from kkbox_churn_prediction_spark.plans.backfill import backfill_from_events

    return trend_features(backfill_from_events(spark, sf_dir))


def _q_backtest_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.plans.folds import backtest
    from kkbox_churn_prediction_spark.sources.events import (
        conversations_from_events,
        cutoffs_from_events,
    )

    conv = conversations_from_events(spark, sf_dir)
    cutoffs = cutoffs_from_events(spark, sf_dir)
    folds = cutoffs.select(
        F.concat(F.lit("fold_"), F.date_format("cutoff_ts", "yyyyMMdd")).alias("fold"),
        "cutoff_ts",
    )
    return backtest(conv, folds, (1, 3, 7), label_horizon_days=3)


def _q_backtest_folds_expanding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expanding-lookback fold family (reference
    ``src/temporal_cv.py:110-150`` ``TemporalSplit(expanding=True)``):
    each fold's feature window reaches back to the first fold's window
    start, and whole-window ``*_full`` aggregates ride along."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.plans.folds import backtest
    from kkbox_churn_prediction_spark.sources.events import (
        conversations_from_events,
        cutoffs_from_events,
    )

    conv = conversations_from_events(spark, sf_dir)
    cutoffs = cutoffs_from_events(spark, sf_dir)
    folds = cutoffs.select(
        F.concat(F.lit("fold_"), F.date_format("cutoff_ts", "yyyyMMdd")).alias("fold"),
        "cutoff_ts",
    )
    return backtest(
        conv, folds, (1, 3, 7), label_horizon_days=3, lookback_policy="expanding"
    )


def _q_cv_fold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TemporalSplit train/val row assignment, BOTH policies in one
    pass (policy column): fold i validates on boundary i, trains on
    all earlier boundaries (expanding) or boundary i-1 (sliding)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.plans.folds import assign_cv_folds
    from kkbox_churn_prediction_spark.sources.events import (
        conversations_from_events,
        cutoff_grid,
        cutoffs_from_events,
    )

    conv = conversations_from_events(spark, sf_dir)
    cutoffs = cutoffs_from_events(spark, sf_dir)
    grid = cutoff_grid(conv, cutoffs)
    folds = cutoffs.select(
        F.concat(F.lit("fold_"), F.date_format("cutoff_ts", "yyyyMMdd")).alias("fold"),
        "cutoff_ts",
    )
    exp = assign_cv_folds(grid, folds, "expanding").withColumn(
        "policy", F.lit("expanding")
    )
    sli = assign_cv_folds(grid, folds, "sliding").withColumn(
        "policy", F.lit("sliding")
    )
    return exp.unionByName(sli)


def _q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kkbox_churn_prediction_spark.operators.dedup import minhash_lsh_candidates

    return minhash_lsh_candidates(_docs(spark, sf_dir), n=3, bands=4, rows_per_band=2)


def _q_neardup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kkbox_churn_prediction_spark.operators.dedup import embedding_cosine_pairs

    return embedding_cosine_pairs(
        _embs(spark, sf_dir), threshold=0.35, bucket_bits=4
    )


def _q_embedding_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.similarity import ivf_topk

    embs = _embs(spark, sf_dir)
    return ivf_topk(embs, embs.where(F.col("vec_id") < 10), k=5, nprobe=2)


def _q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kkbox_churn_prediction_spark.operators.multimodal import (
        attach_media,
        extract_media_features,
    )

    return extract_media_features(attach_media(_docs(spark, sf_dir)))


def _q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Letterbox resize geometry for every media payload (non-square
    256x144 target so BOTH branches of the aspect comparison fire)."""
    from kkbox_churn_prediction_spark.operators.multimodal import (
        attach_media,
        resize_plan,
    )

    return resize_plan(attach_media(_docs(spark, sf_dir)), target_w=256, target_h=144)


def _q_media_token_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-media token-cost estimation: 14px ViT-style tiles over the
    256x144 letterbox geometry + a row-break token per tile row —
    integer algebra after the (stubbed) decode, one Arrow pass."""
    from kkbox_churn_prediction_spark.operators.multimodal import (
        attach_media,
        media_token_cost,
    )

    return media_token_cost(
        attach_media(_docs(spark, sf_dir)), patch=14, target_w=256, target_h=144
    )


def _q_multimodal_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleaved text+media assembly budgeting: per document, text
    tokens + attached-media tokens and the number of 2048-token
    context chunks the assembled document spans."""
    from kkbox_churn_prediction_spark.operators.multimodal import (
        attach_media,
        media_token_cost,
        multimodal_token_budget,
    )

    docs = _docs(spark, sf_dir)
    costs = media_token_cost(attach_media(docs), patch=14, target_w=256, target_h=144)
    return multimodal_token_budget(docs, costs, chunk_budget=2048)


def _q_asof_entity_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-entity-cutoff as-of variant (sort-merge path): each
    conversation's personal cutoff is the week boundary after its own
    last turn, so the cutoff grid is entity-specific and CANNOT ride
    the broadcast-cutoff plan — this exercises
    ``asof_join_entity_cutoffs`` (equi join on conv_id + range
    predicate in the join condition)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.asof import asof_join_entity_cutoffs
    from kkbox_churn_prediction_spark.operators.horizons import multi_horizon_aggregate

    conv = _conv(spark, sf_dir)
    grid = conv.groupBy("conv_id").agg(
        (F.date_trunc("week", F.max("ts")) + F.expr("INTERVAL 7 DAYS")).alias(
            "cutoff_ts"
        )
    )
    narrow = conv.select(
        "conv_id",
        "ts",
        F.expr("CAST(length(text) AS BIGINT)").alias("text_len"),
        F.expr("CASE WHEN role = 'user' THEN 1 END").alias("is_user"),
        "tool",
    )
    joined = asof_join_entity_cutoffs(narrow, grid, lookback_days=7)
    return multi_horizon_aggregate(joined, (1, 3, 7))


def _q_psi_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI with decile edges taken from the reference fold's own
    distribution — the reference's actual method (``np.quantile`` on
    the reference window, ``src/psi.py:27-34``), vs the fixed-width
    variant in ``psi_text_len``. Edges are exact percentiles rounded
    to 6 (both engines interpolate identically at that precision)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.psi import (
        bucketize_by_edges,
        psi_from_bins,
        quantile_edges,
    )

    conv = _conv(spark, sf_dir)
    week_no = F.floor(
        F.unix_micros(F.date_trunc("week", F.col("ts"))) / F.lit(7 * 86400 * 1_000_000)
    )
    folded = conv.select(
        F.when(week_no % 2 == 0, F.lit("even")).otherwise(F.lit("odd")).alias("fold"),
        F.expr("CAST(length(text) AS BIGINT)").alias("v"),
    )
    edges = [
        round(e, 6)
        # exact=True requested EXPLICITLY to hash-match the oracle;
        # the operator default is the scale-safe approx path
        for e in quantile_edges(
            folded.where(F.col("fold") == "even"), "v", 10, exact=True
        )
    ]
    binned = folded.select("fold", bucketize_by_edges(F.col("v"), edges).alias("bin"))
    return psi_from_bins(binned, "fold", "bin", ref_fold="even")



def _stage_stream_src(sf_dir: str, table: str = "events") -> tuple[str, str]:
    """The file stream source requires a DIRECTORY; the driver
    testdata ships single parquet files, so stage a link/copy of
    ``{table}.parquet`` under a content-addressed /tmp dir once and
    return ``(src_file, stage_dir)`` — shared by every streaming
    gate."""
    import hashlib
    import os
    import shutil

    src = f"{sf_dir}/{table}.parquet"
    stage = f"/tmp/eng_stream_src_{hashlib.md5(src.encode()).hexdigest()[:10]}"
    os.makedirs(stage, exist_ok=True)
    dst = os.path.join(stage, f"{table}.parquet")
    if not os.path.exists(dst):
        try:
            os.link(src, dst)
        except OSError:
            shutil.copyfile(src, dst)
    return src, stage


def _q_streaming_closed_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming gate: drives the custom stateful
    sessionizer (``applyInPandasWithState``) over a file-source stream
    of the events table and returns the closed sessions it emitted —
    hash-compared against a batch SQL oracle. Replay mode
    (``watermark_delay=None``): the stream ends, so closed sessions =
    every session except each conversation's final (still-open) one.

    The transcript here is derived WITHOUT the row_number turn index
    (window functions aren't stream-capable); the sessionizer needs
    only (conv_id, ts), and session bounds are tie-order-invariant.
    """
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.streaming.stateful import (
        stateful_closed_sessions,
    )

    src, stage = _stage_stream_src(sf_dir)

    batch = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(batch.schema)
        .parquet(stage)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(F.concat(F.lit("c"), F.col("user_id")).alias("conv_id"), "ts")
    )
    name = "eng_streaming_closed_sessions"
    q = (
        stateful_closed_sessions(stream, watermark_delay=None)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def _q_streaming_asof_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming gate #7: the flagship strictly-prior (as-of)
    semantic in streaming form — every arriving turn emitted with its
    tie-safe prior-turn count and recency gap, state carried across
    micro-batches (applyInPandasWithState). Replay mode vs the batch
    RANGE-frame oracle."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.streaming.asof import stream_asof_depth

    src, stage = _stage_stream_src(sf_dir)

    batch = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(batch.schema)
        .parquet(stage)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(F.concat(F.lit("c"), F.col("user_id")).alias("conv_id"), "ts")
    )
    name = "eng_streaming_asof_depth"
    q = (
        stream_asof_depth(stream, watermark_delay=None)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def _q_streaming_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming gate #3: at-least-once ingest dedup.
    The staged stream re-delivers every 10th event (a second parquet
    file holding the duplicate subset — deterministic, same rows
    byte-for-byte); ``dropDuplicatesWithinWatermark`` on the
    transcript identity (conv_id, event_id) must collapse them, so
    the per-conversation counts equal the duplicate-free batch
    oracle's. Watermark delay 1h ≫ 0 (duplicates carry identical
    event time), state bounded by the retry horizon.
    """
    import hashlib
    import os
    import shutil

    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.streaming.dedup import streaming_dedup_turns

    src = f"{sf_dir}/events.parquet"
    stage = f"/tmp/eng_stream_dup_{hashlib.md5(src.encode()).hexdigest()[:10]}"
    os.makedirs(stage, exist_ok=True)
    dst = os.path.join(stage, "events.parquet")
    if not os.path.exists(dst):
        try:
            os.link(src, dst)
        except OSError:
            shutil.copyfile(src, dst)
    dup = os.path.join(stage, "dups.parquet")
    if not os.path.exists(dup):
        # write via Spark so the parquet physical types (NTZ ts) match
        # the primary file byte-for-byte, then flatten the part file
        # into the staging dir (file stream sources don't recurse)
        tmp_dir = stage + "_build"
        spark.read.parquet(src).where(F.col("event_id") % 10 == 0).coalesce(
            1
        ).write.mode("overwrite").parquet(tmp_dir)
        part = next(
            p for p in os.listdir(tmp_dir) if p.endswith(".parquet") and not p.startswith(".")
        )
        shutil.move(os.path.join(tmp_dir, part), dup)
        shutil.rmtree(tmp_dir, ignore_errors=True)

    batch = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(batch.schema)
        .parquet(stage)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            F.concat(F.lit("c"), F.col("user_id")).alias("conv_id"), "event_id", "ts"
        )
    )
    deduped = streaming_dedup_turns(stream, key_cols=["conv_id", "event_id"])
    name = "eng_streaming_dedup"
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(name)
        .groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n_turns"))
    )


def _q_streaming_drift_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming gate #2: watermarked hourly role
    distributions in append mode — the finalized (window, role)
    counts the drift monitor consumes. Windows are keyed by epoch
    MICROS (bigint) so the compare is session-TZ-free (the A9
    lesson); closure under replay = window_end ≤ max(ts) − delay,
    which the batch oracle reproduces exactly."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.streaming.drift import (
        streaming_category_counts,
    )

    src, stage = _stage_stream_src(sf_dir)

    batch = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(batch.schema)
        .parquet(stage)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            F.when(F.col("event_type") == "signup", F.lit("system"))
            .when(F.col("event_type") == "purchase", F.lit("assistant"))
            .when(F.col("event_type") == "error", F.lit("tool"))
            .otherwise(F.lit("user"))
            .alias("role"),
            "ts",
        )
    )
    name = "eng_streaming_drift"
    q = (
        streaming_category_counts(stream, "role", window="1 hour", watermark="1 hour")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select(
        F.unix_micros(F.col("window_start")).alias("window_start_us"),
        "role",
        F.col("n").cast("long").alias("n"),
    )


def _q_streaming_hopping_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming gate #9: watermarked HOPPING-window
    (2h window / 1h slide) activity counts in append mode — each
    event lands in two overlapping epoch-aligned windows, finalized
    independently at the watermark. Epoch-micros keys (A9 lesson);
    closure = window_end ≤ max(ts) − delay, replayed by the oracle."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.streaming.drift import (
        streaming_hopping_counts,
    )

    src, stage = _stage_stream_src(sf_dir)
    batch = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(batch.schema)
        .parquet(stage)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select("ts")
    )
    name = "eng_streaming_hopping"
    q = (
        streaming_hopping_counts(
            stream, window="2 hours", slide="1 hour", watermark="1 hour"
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select(
        F.unix_micros(F.col("window_start")).alias("window_start_us"),
        F.col("n").cast("long").alias("n"),
    )


def _q_deletion_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten impact audit: deletion list =
    customers with custkey ≡ 0 (mod 97); the cascade walks
    customer→orders→lineitem by foreign key (one semi-join per hop)
    and reports per-table affected rows/share — the erasure-job
    sizing pass."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.privacy import (
        deletion_cascade_audit,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    dele = cust.where(F.col("c_custkey") % 97 == 0).select(
        F.col("c_custkey").alias("key")
    )
    return deletion_cascade_audit(
        {"customer": cust, "orders": orders, "lineitem": li},
        dele,
        [
            ("orders", "o_custkey", "customer", "c_custkey"),
            ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ],
        root_table="customer",
        root_key="c_custkey",
    )


def _q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversity re-ranking of query-0's top-10 cosine
    candidates (λ=0.7): greedy relevance-vs-redundancy tradeoff over
    the result-sized candidate set — the context-selection step pure
    top-k can't do."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.similarity import (
        brute_force_topk,
        cosine_expr,
        mmr_rerank,
    )

    embs = _embs(spark, sf_dir)
    qvec = embs.where(F.col("vec_id") == 0)
    cands = (
        brute_force_topk(embs, qvec, k=10)
        .select(
            F.col("neighbor_id").alias("cand_id"), F.col("cosine").alias("rel")
        )
        # a zero-norm query has NULL cosine to everything (no
        # direction) -> no candidates, not a NULL-rel greedy loop
        # (r5 fuzz: float(None) crash); oracle mirrors the filter
        .where(F.col("rel").isNotNull())
        .persist()
    )
    cv = embs.join(
        cands.select(F.col("cand_id").alias("vec_id")), "vec_id"
    ).select("vec_id", "embedding")
    a = cv.select(F.col("vec_id").alias("a"), F.col("embedding").alias("_va"))
    b = cv.select(F.col("vec_id").alias("b"), F.col("embedding").alias("_vb"))
    sims = (
        a.join(F.broadcast(b), F.col("a") != F.col("b"))
        .select("a", "b", F.round(cosine_expr("_va", "_vb"), 6).alias("sim"))
    )
    return mmr_rerank(cands, sims, k=10, lam=0.7)


def _q_streaming_cms_tools(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming gate #6: Count-Min frequency sketch
    as a streaming aggregation in COMPLETE mode — the agg state IS
    the sketch (d×w counters, bounded regardless of stream length).
    Estimates run batch-side over the drained counter table; the
    oracle replays the identical cell arithmetic over the full
    events table."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.cms import cms_estimate
    from kkbox_churn_prediction_spark.streaming.sketch import (
        streaming_cms_counters,
    )

    src, stage = _stage_stream_src(sf_dir)
    batch = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(batch.schema)
        .parquet(stage)
        .where(
            F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("event_type").isin("purchase", "error")
        )
        .select(F.col("event_type").alias("tool"))
    )
    name = "eng_streaming_cms"
    q = (
        streaming_cms_counters(stream, "tool", depth=4, width=32)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    probes = spark.createDataFrame([("purchase",), ("error",)], ["k"])
    return cms_estimate(spark.table(name), probes, width=32, depth=4).select(
        F.col("k").alias("tool"), "cms_count"
    )


def _q_streaming_enriched_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming gate #4: stream-static broadcast
    enrichment (event_type → family dim) feeding a watermarked hourly
    windowed count. The join is stateless per micro-batch; only the
    window agg holds state. Same epoch-us keying + closure rule as
    the drift gate."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.streaming.enrich import enriched_window_counts

    src, stage = _stage_stream_src(sf_dir)

    batch = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(batch.schema)
        .parquet(stage)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select("event_type", "ts")
    )
    dim = spark.createDataFrame(
        [("signup", "onboarding"), ("purchase", "commerce"), ("error", "ops")],
        "event_type string, family string",
    )
    name = "eng_streaming_enriched"
    q = (
        enriched_window_counts(stream, dim, "event_type", window="1 hour", watermark="1 hour")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select(
        F.unix_micros(F.col("window_start")).alias("window_start_us"),
        "family",
        F.col("n").cast("long").alias("n"),
    )


def _q_streaming_turn_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming gate #5: stream-stream event-time
    range self-join (user turn ⋈ assistant turns within 2 h, state
    bounded by watermark + horizon). Inner-join append mode emits all
    matches over a bounded replay, so the batch range-join oracle is
    exact."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.streaming.joins import stream_turn_pairs

    src, stage = _stage_stream_src(sf_dir)

    batch = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(batch.schema)
        .parquet(stage)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
    )
    # a streaming frame can't compute the batch row_number turn_idx;
    # event_id is already a unique per-turn identity and the oracle
    # mirrors it
    turns = stream.select(
        F.concat(F.lit("c"), F.col("user_id")).alias("conv_id"),
        F.col("event_id").alias("turn_idx"),
        F.when(F.col("event_type") == "signup", F.lit("system"))
        .when(F.col("event_type") == "purchase", F.lit("assistant"))
        .when(F.col("event_type") == "error", F.lit("tool"))
        .otherwise(F.lit("user"))
        .alias("role"),
        "ts",
    )
    name = "eng_streaming_pairs"
    q = (
        stream_turn_pairs(turns, horizon="2 hours", watermark="4 hours")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select(
        "conv_id",
        F.col("u_idx").cast("long").alias("u_idx"),
        F.col("a_idx").cast("long").alias("a_idx"),
        F.col("reply_delay_us").cast("long").alias("reply_delay_us"),
    )


def _q_feature_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry validation report over the flagship feature matrix
    (reference ``src/features_processor.py:71-95`` validate_features:
    per-feature null counts + null-policy verdicts; dtype facts are
    Spark-side metadata, excluded from the cross-engine compare)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.horizons import validate_features
    from kkbox_churn_prediction_spark.plans.backfill import backfill_from_events

    v = validate_features(backfill_from_events(spark, sf_dir))
    return v.select(
        "feature",
        "n_rows",
        "n_null",
        F.col("null_policy_ok").cast("int").alias("null_policy_ok"),
    )


def _q_psi_categorical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical drift PSI over role/tool distributions across the
    even/odd-week folds (reference ``src/psi.py:96-102`` value_counts
    reindexed to the category union)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.psi import psi_categorical

    conv = _conv(spark, sf_dir)
    week_no = F.floor(
        F.unix_micros(F.date_trunc("week", F.col("ts"))) / F.lit(7 * 86400 * 1_000_000)
    )
    folded = conv.select(
        F.when(week_no % 2 == 0, F.lit("even")).otherwise(F.lit("odd")).alias("fold"),
        "role",
        "tool",
    )
    return psi_categorical(folded, "fold", ["role", "tool"], ref_fold="even")


def _preds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic prediction table (event_id, p, y, fold)
    derived from events via ``stable_hash48`` — identical in both
    engines (see ``_PRED_CTE``). p is a dyadic rational strictly
    inside (0,1) and never on a bin edge for n_bins ∈ {10, 20}
    ((10k+5)/2^21 is never a multiple of 2^-something·bin width), so
    binning is float-exact cross-engine; y ~ Bernoulli(p) via an
    integer hash compare (no float at all)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.functions.text import stable_hash48

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where(F.col("event_id").isNotNull())
        .select(F.col("event_id").cast("string").alias("event_id"))
    )

    def h(tag: str) -> "F.Column":
        return stable_hash48(F.concat(F.lit(tag), F.col("event_id")))

    hp = F.pmod(h("p"), F.lit(2**20))
    hy = F.pmod(h("y"), F.lit(2**20))
    hf = F.pmod(h("f"), F.lit(2))
    return ev.select(
        "event_id",
        ((hp.cast("double") + F.lit(0.5)) / F.lit(float(2**20))).alias("p"),
        (hy < hp).cast("int").alias("y"),
        F.when(hf == 0, F.lit("a")).otherwise(F.lit("b")).alias("fold"),
    )


def _q_reliability_diagram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bin reliability profile (reference
    ``src/calibration.py:130-156`` reliability_diagram_data) as a
    binned groupBy-agg."""
    from kkbox_churn_prediction_spark.operators.calibration import reliability_table

    return reliability_table(_preds(spark, sf_dir), "y", "p", n_bins=10)


def _q_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected Calibration Error (``src/calibration.py:101-128``)
    as a two-level distributed agg — one row."""
    from kkbox_churn_prediction_spark.operators.calibration import ece

    return ece(_preds(spark, sf_dir), "y", "p", n_bins=10)


def _q_weekly_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per cohort week: conversations started, single-turn bounces,
    bounce rate — the transcript analog of early-churn cohort cuts.
    Two algebraic aggs, no windows."""
    from kkbox_churn_prediction_spark.operators.rhythm import weekly_bounce_rate

    return weekly_bounce_rate(_conv(spark, sf_dir))


def _q_weekly_latency_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly first-response SLA rollup: exchange counts, exact
    p50/p90 latency, and the within-5-minutes fraction — the fleet
    ops view of response_latency."""
    from kkbox_churn_prediction_spark.operators.lags import weekly_latency_sla

    return weekly_latency_sla(_conv(spark, sf_dir), sla_seconds=300)


def _q_eb_tool_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage of per-conversation tool-use rates
    (beta-binomial moment matching): small samples shrink toward the
    population prior; degenerate spreads fall back to raw."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.encoders import eb_shrunk_rates

    conv = _conv(spark, sf_dir).select(
        "conv_id", F.col("tool").isNotNull().cast("int").alias("is_tool")
    )
    return eb_shrunk_rates(conv, "conv_id", "is_tool")


def _q_collapse_rare_tools(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rare-label collapse on the tool column (cardinality guard
    before encoding): frequent-list broadcast membership; NULL stays
    NULL. Output is the per-collapsed-value row count."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.encoders import (
        collapse_rare_categories,
    )

    collapsed = collapse_rare_categories(
        _conv(spark, sf_dir), "tool", min_count=2000
    )
    return collapsed.groupBy("tool_collapsed").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


def _q_feature_label_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan feature screening: point-biserial correlation of
    doc-quality signals against the src0 domain label (melt ×3 + one
    co-moment agg — never one job per feature)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.encoders import feature_label_corr
    from kkbox_churn_prediction_spark.operators.textstats import (
        doc_signal_stage1,
        doc_signal_stage2,
    )

    docs = _docs(spark, sf_dir)
    scored = docs.select(
        "doc_id", "source", *doc_signal_stage1(F.col("text"))
    ).select("doc_id", "source", "n_chars_calc", "n_tokens", *doc_signal_stage2())
    feats = scored.select(
        F.col("n_tokens").cast("double").alias("n_tokens"),
        F.col("n_chars_calc").cast("double").alias("n_chars"),
        F.col("punct_ratio"),
        (F.col("source") == "src0").cast("int").alias("label"),
    )
    return feature_label_corr(
        feats, ["n_tokens", "n_chars", "punct_ratio"], "label"
    )


def _q_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confident-learning label-noise screen: high-confidence
    disagreement counts + flip-rate estimates. One conditional-agg
    pass, one output row."""
    from kkbox_churn_prediction_spark.operators.calibration import (
        label_noise_screen,
    )

    return label_noise_screen(_preds(spark, sf_dir), "y", "p")


def _q_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition (reliability − resolution + uncertainty)
    of the binned Brier score — the diagnosis ECE can't give. Same
    two-level binned-agg shape as the ECE gate."""
    from kkbox_churn_prediction_spark.operators.calibration import (
        brier_decomposition,
    )

    return brier_decomposition(_preds(spark, sf_dir), "y", "p", n_bins=10)


def _q_isotonic_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the fitted per-fold isotonic map back to every
    prediction (fit→apply loop): broadcast the folds×bins fit table;
    the stream never shuffles. Unbinned rows keep NULL."""
    from kkbox_churn_prediction_spark.operators.calibration import (
        isotonic_apply,
        isotonic_calibration,
    )

    preds = _preds(spark, sf_dir)
    fit = isotonic_calibration(preds, "fold", "y", "p", n_bins=20)
    return isotonic_apply(preds, fit, n_bins=20)


def _q_gains_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / lift per probability band (top-down) —
    fixed-width score bands, NOT ntile: the classic decile sort is
    the single-partition scale-killer; band math runs on ≤10 rows."""
    from kkbox_churn_prediction_spark.operators.calibration import gains_table

    return gains_table(_preds(spark, sf_dir), "p", "y", n_bins=10)


def _q_calibration_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-fold Brier + log-loss (sklearn-clip semantics,
    ``src/models.py`` metric block) as algebraic aggregates."""
    from kkbox_churn_prediction_spark.operators.calibration import (
        brier_logloss_by_fold,
    )

    return brier_logloss_by_fold(_preds(spark, sf_dir), "fold", "y", "p")


def _q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap CI for Brier/log-loss
    (``src/models.py:435-460`` BootstrapMetrics) — deterministic
    hash-seeded replication weights, cross-engine identical."""
    from kkbox_churn_prediction_spark.operators.calibration import bootstrap_metric_ci

    return bootstrap_metric_ci(
        _preds(spark, sf_dir), "event_id", "y", "p", n_replicates=64
    )


def _q_auc_by_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-aware ROC-AUC + KS per fold (sklearn
    ``roc_auc_score`` semantics, ``src/models.py:118-158``) as a
    distinct-score groupBy + per-fold cumulative window."""
    from kkbox_churn_prediction_spark.operators.calibration import auc_ks_by_fold

    return auc_ks_by_fold(_preds(spark, sf_dir), "fold", "y", "p")


def _q_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-fold isotonic calibration map fitted on binned aggregates
    (PAV over the tiny per-fold profile via applyInPandas — the
    distributed form of ``src/calibration.py`` method='isotonic')."""
    from kkbox_churn_prediction_spark.operators.calibration import (
        isotonic_calibration,
    )

    return isotonic_calibration(_preds(spark, sf_dir), "fold", "y", "p", n_bins=20)


def _q_platt_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-fold sigmoid (Platt) calibration map fitted on binned
    aggregates (weighted Newton per fold via applyInPandas — the
    distributed form of ``src/calibration.py`` method='sigmoid',
    next to isotonic_calibration's method='isotonic')."""
    from kkbox_churn_prediction_spark.operators.calibration import (
        platt_calibration,
    )

    return platt_calibration(_preds(spark, sf_dir), "fold", "y", "p", n_bins=20)


def _q_platt_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the fitted per-fold sigmoid map back to every prediction
    (fit→apply loop, the Platt twin of isotonic_apply): broadcast the
    folds×(a,b) fit; the stream never shuffles."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.calibration import (
        platt_apply,
        platt_calibration,
    )

    preds = _preds(spark, sf_dir)
    fit = platt_calibration(preds, "fold", "y", "p", n_bins=20)
    return platt_apply(preds, fit, "fold", "p").select(
        "event_id", "fold", F.round("p", 6).alias("p"), "p_platt"
    )


def _q_error_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment error profile (reference ``src/error_analysis.py``
    segment analysis): accuracy / mean prediction / actual rate per
    score band — one hash agg on the band key."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.calibration import (
        error_by_segment,
    )

    preds = _preds(spark, sf_dir)
    band = F.least(F.floor(F.col("p") * 10), F.lit(9)).cast("int")
    return error_by_segment(preds, band, "y", "p", segment_name="band")


def _q_hardest_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k misclassified exemplars per category (reference
    ``src/error_analysis.py:245-280`` _find_hardest_examples) — three
    TakeOrderedAndProject branches over the misclassified subset,
    never a global sort."""
    from kkbox_churn_prediction_spark.operators.error_analysis import (
        hardest_examples,
    )

    return hardest_examples(_preds(spark, sf_dir), "event_id", "y", "p", k=20)


def _q_confusion_costs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FP/FN business-cost rollup vs the naive all-positive /
    all-negative baselines (reference ``src/error_analysis.py:282-308``
    _compute_business_impact) — one conditional-count aggregate."""
    from kkbox_churn_prediction_spark.operators.error_analysis import (
        confusion_costs,
    )

    return confusion_costs(_preds(spark, sf_dir), "y", "p")


def _q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clusters: connected components over the
    MinHash-LSH pair graph (min-label propagation, one join + one
    min-agg per round)."""
    from kkbox_churn_prediction_spark.operators.components import (
        connected_components,
    )
    from kkbox_churn_prediction_spark.operators.dedup import minhash_lsh_candidates

    pairs = minhash_lsh_candidates(_docs(spark, sf_dir), n=3, bands=4, rows_per_band=2)
    return connected_components(pairs, "doc_a", "doc_b")


def _q_dedup_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The adversarial-graph components path (r4): the SAME
    LSH-pair-graph clustering as dedup_components, resolved with the
    Kiveris large-star/small-star edge rewiring instead of hash-min —
    provably O(log² n) rounds on EVERY graph (the round-4 stress run
    measured the pointer-jump variant degrading on permutation
    graphs). Identical output by definition of connected components,
    so the gate shares dedup_components' oracle SQL — a cross-
    ALGORITHM parity check, not just cross-engine."""
    from kkbox_churn_prediction_spark.operators.components import (
        connected_components,
    )
    from kkbox_churn_prediction_spark.operators.dedup import (
        minhash_lsh_candidates,
    )

    pairs = minhash_lsh_candidates(
        _docs(spark, sf_dir), n=3, bands=4, rows_per_band=2
    )
    return connected_components(
        pairs, "doc_a", "doc_b", algorithm="star", mode="distributed"
    )


def _q_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End of the dedup pipeline: LSH pairs → transitive clusters →
    KEEP-BEST collapse (longest text wins, larger id breaks ties) —
    one max_by aggregate per cluster, no window sort."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.components import (
        connected_components,
        select_canonical,
    )
    from kkbox_churn_prediction_spark.operators.dedup import minhash_lsh_candidates

    docs = _docs(spark, sf_dir)
    pairs = minhash_lsh_candidates(docs, n=3, bands=4, rows_per_band=2)
    comps = connected_components(pairs, "doc_a", "doc_b")
    scores = docs.select("doc_id", F.length("text").alias("score"))
    return select_canonical(comps, scores)


def _q_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-aware sampling weights: the SOFT end of the dedup
    pipeline — every corpus doc gets weight 1/cluster_size from the
    transitive LSH clusters (singletons weight 1), so repeated
    content contributes one doc's worth of mixture mass instead of
    being hard-dropped."""
    from kkbox_churn_prediction_spark.operators.components import (
        connected_components,
        duplication_weights,
    )
    from kkbox_churn_prediction_spark.operators.dedup import minhash_lsh_candidates

    docs = _docs(spark, sf_dir)
    pairs = minhash_lsh_candidates(docs, n=3, bands=4, rows_per_band=2)
    comps = connected_components(pairs, "doc_a", "doc_b")
    return duplication_weights(docs, comps)


def _q_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed corpus-curation pipeline: quality → language →
    exact-dedup verdicts in one scan + one shuffle."""
    from kkbox_churn_prediction_spark.plans.curation import curate_corpus

    return curate_corpus(_docs(spark, sf_dir))


def _q_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-build audit summary: docs + tokens per verdict."""
    from kkbox_churn_prediction_spark.plans.curation import (
        curate_corpus,
        curation_report,
    )

    return curation_report(curate_corpus(_docs(spark, sf_dir)))


def _q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source Bernoulli sampling (hash-membership,
    stable under partitioning/reruns — Spark's seeded sample() is
    not). Pure scan-stage filter, zero shuffles."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.sampling import stratified_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    rates = {"src0": 1.0, "src1": 0.5, "src2": 0.1, "src3": 0.0}
    return stratified_sample(docs, "source", rates, "doc_id", default_rate=0.25)


def _q_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy quality-first selection to a per-source TOKEN budget:
    score docs (same composite as text_quality), then within each
    source keep the best docs until the running token count crosses
    the budget. One shuffle on source; running sum is a within-source
    window (exact/oracle path — token_budget_threshold is the
    sort-free scale path)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.sampling import token_budget_select
    from kkbox_churn_prediction_spark.operators.textstats import (
        doc_signal_stage1,
        doc_signal_stage2,
        quality_output_cols,
    )

    docs = _docs(spark, sf_dir)
    scored = (
        docs.select("doc_id", "source", *doc_signal_stage1(F.col("text")))
        .select("doc_id", "source", "n_chars_calc", "n_tokens", *doc_signal_stage2())
        .select("doc_id", "source", *quality_output_cols())
        .select("doc_id", "source", "n_tokens", "quality_score")
    )
    return token_budget_select(scored, budget_tokens=600)


def _q_cluster_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-aware train/val split: hash coin on the exact-dedup
    CLUSTER id, so duplicate groups never straddle the boundary —
    contamination-proof by construction. Pure projection on top of
    the dedup assignment."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.functions.text import normalize_text, tokens
    from kkbox_churn_prediction_spark.operators.dedup import exact_dedup
    from kkbox_churn_prediction_spark.operators.sampling import cluster_safe_split

    key = F.array_join(F.slice(tokens(normalize_text(F.col("text"))), 1, 5), " ")
    assigned = exact_dedup(_docs(spark, sf_dir), key).select(
        "doc_id", "canonical_id"
    )
    return cluster_safe_split(assigned, val_rate=0.2)


def _q_match_token_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution matching: importance-resample docs so the token-
    count histogram is uniform over 8 fixed-width bins (the DoReMi-
    style shape-matching step before corpus mixing). One tiny count
    agg fixes rates; the shipped pass is a scan-stage hash filter."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.sampling import (
        distribution_match_sample,
    )
    from kkbox_churn_prediction_spark.operators.textstats import token_count

    docs = _docs(spark, sf_dir).select(
        "doc_id", "source", token_count(F.col("text")).alias("n_tokens")
    )
    return distribution_match_sample(
        docs, "n_tokens", [1.0] * 8, width=16, id_col="doc_id"
    )


def _q_fold_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe fold scaling: z-score of per-conversation turn
    counts where μ/σ come from each month-fold's TRAIN rows only
    (deterministic 25% val coin) and apply to the whole fold. One
    tiny conditional agg broadcast back — the stream never shuffles."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.encoders import fold_standardize
    from kkbox_churn_prediction_spark.operators.sampling import sample_hash_bucket

    per = (
        _conv(spark, sf_dir)
        .groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n_turns"), F.min("ts").alias("_first"))
    )
    feat = per.select(
        "conv_id",
        F.date_format("_first", "yyyy-MM").alias("fold"),
        F.col("n_turns").cast("long").alias("n_turns"),
        F.when(
            sample_hash_bucket(F.col("conv_id"), "cv") < 262144, "val"
        ).otherwise("train").alias("split"),
    )
    return fold_standardize(feat, "n_turns")


def _q_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fightin'-words log-odds (Dirichlet prior, SE-scaled): the
    top-k terms separating src0 from the rest of the pool. One token
    pass; z-algebra on the vocab table."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.textstats import distinctive_terms

    return distinctive_terms(
        _docs(spark, sf_dir), F.col("source") == "src0", k=25, min_count=5
    )


def _q_dsir_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR domain-relevance weights: mean hashed-unigram log-ratio
    of the src0 target domain vs the rest of the pool, add-0.5
    smoothing over 4096 buckets. One persisted explode; bucket table
    broadcasts back onto the stream."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.textstats import dsir_scores

    return dsir_scores(_docs(spark, sf_dir), F.col("source") == "src0")


def _q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM quality proxy: per-doc mean unigram log-probability
    against the corpus's own token distribution."""
    from kkbox_churn_prediction_spark.operators.textstats import (
        unigram_logprob_score,
    )

    return unigram_logprob_score(_docs(spark, sf_dir))


def _q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-token-window chunking with overlap: one 256-token chunk
    every 64 tokens per doc (narrow sequence+explode, zero shuffle)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.chunking import chunk_documents
    from kkbox_churn_prediction_spark.operators.textstats import token_count

    docs = _docs(spark, sf_dir).select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    return chunk_documents(docs, "n_tokens", chunk_size=256, stride=64)


def _q_rollup_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(role, tool) turn counts + text volume in one Expand+agg
    pass; grouping_id separates subtotals from genuine NULL tools."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.relational import rollup_counts

    conv = _conv(spark, sf_dir).select(
        "role", "tool", F.length("text").cast("bigint").alias("text_chars")
    )
    return rollup_counts(conv, ["role", "tool"], "text_chars")


def _q_cube_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(role, tool): all four grouping sets in one Expand+agg
    pass (adds the role-rolled-away-but-tool-kept set ROLLUP can't
    express)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.relational import cube_counts

    conv = _conv(spark, sf_dir).select(
        "role", "tool", F.length("text").cast("bigint").alias("text_chars")
    )
    return cube_counts(conv, ["role", "tool"], "text_chars")


def _q_set_ops_convs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT / INTERSECT over conversation sets: conversations with
    user turns vs conversations with tool calls, tagged left_only /
    both / right_only."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.relational import set_op_entities

    conv = _conv(spark, sf_dir)
    return set_op_entities(
        conv.where(F.col("role") == "user"),
        conv.where(F.col("tool").isNotNull()),
        "conv_id",
    )


def _q_scd2_role_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 run compression: consecutive equal-role runs per
    conversation become [valid_from, valid_to) intervals (gaps-and-
    islands; one conv_id shuffle, second window over compressed runs)."""
    from kkbox_churn_prediction_spark.operators.scd import scd2_intervals

    return scd2_intervals(
        _conv(spark, sf_dir), "conv_id", "turn_idx", "role", ts_col="ts"
    )


def _q_interval_session_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval containment join, bucketized scale path: turns ⋈ their
    own session spans on (conv_id, day-bucket) equi-keys + containment
    filter — the standard range-join rewrite (no theta join)."""
    from kkbox_churn_prediction_spark.operators.intervals import (
        interval_join,
        session_intervals,
    )
    from kkbox_churn_prediction_spark.operators.sessionize import sessionize

    turns = _conv(spark, sf_dir).select("conv_id", "turn_idx", "ts")
    sess = sessionize(turns)
    spans = session_intervals(sess)
    return interval_join(
        turns, spans, key="conv_id", ts_col="ts",
        start_col="s_start", end_col="s_end",
        strategy="bucket", bucket_seconds=86400, closed=True,
    ).select("conv_id", "turn_idx", "session_id", "s_start", "s_end", "s_turns")


def _q_resample_daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily series per conversation: gap days appear with
    n_rows=0 and the last observed role carried forward (one stream
    shuffle; the grid is generated, never scanned)."""
    from kkbox_churn_prediction_spark.operators.resample import resample_ffill

    return resample_ffill(
        _conv(spark, sf_dir).select("conv_id", "turn_idx", "role", "ts"),
        "conv_id", "ts", "role", "turn_idx", step_seconds=86400,
    )


def _q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style repetition filters: dup-word/bigram fractions,
    top-word dominance, unigram entropy (algebraic two-level aggs)."""
    from kkbox_churn_prediction_spark.operators.textstats import repetition_stats

    return repetition_stats(_docs(spark, sf_dir))


def _q_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: PMI for every bigram with corpus count ≥ 20
    (integer-threshold selection — deterministic cross-engine; PMI is
    an annotation, never the selection key)."""
    from kkbox_churn_prediction_spark.operators.textstats import bigram_pmi

    return bigram_pmi(_docs(spark, sf_dir), min_count=20)


def _q_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) layout keys over (entity bucket, day): the
    interleaved sort key whose file min/max stats prune scans on BOTH
    dimensions (pure shift/mask codegen arithmetic)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.layout import zvalue16
    from kkbox_churn_prediction_spark.sources.events import read_table

    ev = read_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    day0 = F.to_date(F.lit("1970-01-01"))
    x = F.pmod(F.col("user_id"), F.lit(65536)).cast("bigint")
    y = F.pmod(
        F.datediff(F.col("ts").cast("date"), day0).cast("bigint"), F.lit(65536)
    )
    return ev.select(
        "event_id",
        x.alias("x"),
        y.alias("y"),
        zvalue16(x, y).alias("zval"),
    )


def _q_kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd k-means (IVF quantizer trainer): broadcast-
    literal assignment + Summarizer mean per iteration. Iterative
    fixpoint — not SQL-expressible, so no DuckDB oracle (rows-only
    gate); exact numpy lock-step equality lives in tests/test_kmeans.py."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.similarity import kmeans_fit

    emb = _embs(spark, sf_dir)
    if emb.limit(1).count() == 0:
        # EMPTY corpus: no residue classes to seed from — zero rows
        # (the operator's loud too-few-classes ValueError stays for
        # genuinely underpopulated NON-empty inputs; r5 empty-sweep)
        return emb.select("vec_id", F.lit(0).cast("int").alias("cell"))
    assigned, _ = kmeans_fit(emb, k=8, iters=3)
    return assigned.select("vec_id", "cell")


def _q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass data-quality profile of the orders table: per-column
    null/distinct/min/max with NO Expand (melt + two-level agg for
    exact distincts; wide agg for everything else)."""
    from kkbox_churn_prediction_spark.operators.profile import profile_table
    from kkbox_churn_prediction_spark.sources.events import read_table

    return profile_table(
        read_table(spark, sf_dir, "orders"),
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"],
    )


def _q_target_encode_role(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-fold target encoding of role against tool-use labels:
    fold f's encoding never sees fold f's labels (leave-one-fold-out
    identity on a tiny stats table; stream never reshuffles)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.functions.text import stable_hash48
    from kkbox_churn_prediction_spark.operators.encoders import target_encode_oof

    base = _conv(spark, sf_dir).select(
        "conv_id",
        "turn_idx",
        "role",
        F.col("tool").isNotNull().cast("int").alias("label"),
        F.pmod(stable_hash48(F.col("conv_id")), F.lit(3)).alias("fold"),
    )
    return target_encode_oof(base, "role", "label", "fold").select(
        "conv_id", "turn_idx", "role", "fold", "role_te"
    )


def _q_standardize_text_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-role z-score of turn text length (broadcast group stats;
    degenerate groups fill 0.0)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.encoders import standardize_by_group

    base = _conv(spark, sf_dir).select(
        "conv_id", "turn_idx", "role",
        F.length("text").cast("bigint").alias("text_len"),
    )
    return standardize_by_group(base, "text_len", "role", out_col="text_len_z")


def _q_hashed_cross_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick (role × tool) cross: md5-prefix buckets identical
    across engines; NULL tool gets a sentinel, not dropped."""
    from kkbox_churn_prediction_spark.operators.encoders import hashed_cross

    return _conv(spark, sf_dir).select(
        "conv_id", "turn_idx",
        hashed_cross(["role", "tool"], 1024).alias("bucket"),
    )


def _q_mi_role_tooluse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between role and tool-use (exact, computed
    on the contingency table — only |X|×|Y| rows leave the agg)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.association import (
        mutual_information,
    )

    base = _conv(spark, sf_dir).select(
        F.col("role").alias("x"),
        F.col("tool").isNotNull().cast("int").cast("string").alias("y"),
    )
    return mutual_information(base, "x", "y")


def _q_chi2_role_tool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square + Cramér's V for role × tool (NULL tool folded to a
    'none' category; sparse cells handled algebraically — no dense
    |X|×|Y| grid)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.association import chi_square

    base = _conv(spark, sf_dir).select(
        F.col("role").alias("x"),
        F.coalesce(F.col("tool"), F.lit("none")).alias("y"),
    )
    return chi_square(base, "x", "y")


def _q_role_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov role-transition matrix with conditional
    probabilities (one lag on the shared conv_id window + tiny agg)."""
    from kkbox_churn_prediction_spark.operators.lags import role_transitions

    return role_transitions(_conv(spark, sf_dir))


def _q_hll_weekly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch rollup: daily HLL sketches of active users MERGED to
    weekly estimates, audited against exact distincts — the
    pre-aggregation pattern exact COUNT(DISTINCT) can't scale to.
    The within_tol boolean is deterministic (DataSketches is
    content-deterministic), so the oracle asserts it's always true."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.sketches import (
        distinct_rollup_check,
    )

    conv = _conv(spark, sf_dir)
    return distinct_rollup_check(
        conv,
        F.date_trunc("day", F.col("ts")),
        F.date_trunc("week", F.col("ts")),
        "conv_id",
    )


def _q_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic contrastive negatives: 3 per anchor, exactly
    uniform over the other ids via the mod-(N−1) shift trick; pure
    projection after a broadcast 1-row count."""
    from kkbox_churn_prediction_spark.operators.indexing import negative_samples

    return negative_samples(_docs(spark, sf_dir).select("doc_id"), "doc_id", 3)


def _q_json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read JSON: typed field projected out of the props
    payload (NULL-tolerant, codegen get_json_object — no UDF, no
    validate pass), aggregated per event type."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.functions.jsoncols import json_field
    from kkbox_churn_prediction_spark.sources.events import read_table

    ev = read_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    k = json_field(F.col("props"), "k", "int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(k).alias("n_valid_k"),
        F.avg(k).alias("avg_k"),
        F.max(k).cast("int").alias("max_k"),
    )


def _q_decayed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-decayed activity features (half-lives 1d and 7d)
    per entity×cutoff — the soft-window companion to asof_features."""
    from kkbox_churn_prediction_spark.operators.decay import decayed_counts
    from kkbox_churn_prediction_spark.sources.events import cutoffs_from_events

    return decayed_counts(
        _conv(spark, sf_dir),
        cutoffs_from_events(spark, sf_dir),
        half_lives_days=(1.0, 7.0),
        lookback_days=28,
    )


def _q_survival_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(duration, censored) survival pairs per entity×cutoff — the
    time-to-event generalization of the binary churn label."""
    from kkbox_churn_prediction_spark.operators.survival import survival_labels
    from kkbox_churn_prediction_spark.sources.events import cutoffs_from_events

    return survival_labels(
        _conv(spark, sf_dir), cutoffs_from_events(spark, sf_dir), horizon_days=14
    )


def _q_km_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier retention curve over the survival labels (two-level
    agg; the product-limit window runs on a ≤horizon-row frame)."""
    from kkbox_churn_prediction_spark.operators.survival import km_curve, survival_labels
    from kkbox_churn_prediction_spark.sources.events import cutoffs_from_events

    return km_curve(
        survival_labels(
            _conv(spark, sf_dir), cutoffs_from_events(spark, sf_dir), horizon_days=14
        )
    )


def _q_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-turn gap statistics + Goh-Barabási burstiness per
    conversation (one lag window on the shared conv_id sort)."""
    from kkbox_churn_prediction_spark.operators.rhythm import interarrival_stats

    return interarrival_stats(_conv(spark, sf_dir))


def _q_activity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day entropy + weekend fraction per conversation
    (two-level agg, ≤24 intermediate rows per entity)."""
    from kkbox_churn_prediction_spark.operators.rhythm import activity_profile

    return activity_profile(_conv(spark, sf_dir))


def _q_activity_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation OLS slope/intercept of daily turn counts over
    the day index (origin-shifted for FP headroom) — ramp-up vs
    fade-out rate, the regression form of the churn trend signal.
    Two algebraic hash aggs, zero windows."""
    from kkbox_churn_prediction_spark.operators.rhythm import activity_trend

    return activity_trend(_conv(spark, sf_dir))


def _q_daily_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-count Fano factor per conversation (overdispersion of the
    active-day load)."""
    from kkbox_churn_prediction_spark.operators.rhythm import daily_regularity

    return daily_regularity(_conv(spark, sf_dir))


def _q_shard_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 8-way output sharding of the document corpus:
    per-shard doc/token/byte manifest (stable md5-prefix hash)."""
    from kkbox_churn_prediction_spark.operators.sharding import shard_profile

    return shard_profile(_docs(spark, sf_dir), n_shards=8)


def _q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over transcript text: emails/IPs/digit runs →
    typed placeholders + per-pattern counts (pure JVM regex)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.redact import redact_pii

    keyed = _conv(spark, sf_dir).select(
        F.concat_ws("#", F.col("conv_id"), F.col("turn_idx")).alias("turn_key"),
        "text",
    )
    return redact_pii(keyed, id_col="turn_key", text_col="text")


def _q_cms_weekly_tools(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency sketch family: daily tool-usage sketches
    merged to weekly, point estimates audited against exact counts
    (the oracle asserts the never-underestimates invariant)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.cms import (
        cms_build,
        cms_estimate,
        cms_merge,
    )

    tools = (
        _conv(spark, sf_dir)
        .where(F.col("tool").isNotNull())
        .select("tool", F.to_date(F.col("ts")).alias("day"))
    )
    daily = cms_build(tools, key_col="tool", bucket_col="day", depth=4, width=32)
    weekly = cms_merge(daily, regroup=F.date_trunc("week", F.col("bucket")).cast("date"))
    probes = tools.select(F.col("tool").alias("k")).distinct()
    est = cms_estimate(weekly, probes, width=32, depth=4)
    exact = (
        tools.groupBy(
            F.date_trunc("week", F.col("day")).cast("date").alias("week"),
            F.col("tool").alias("k"),
        )
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    return exact.join(
        est.withColumnRenamed("bucket", "week"), ["week", "k"], "inner"
    ).select(
        F.col("week").cast("timestamp").alias("week_start"),
        F.col("k").alias("tool"),
        F.col("exact_cnt"),
        F.col("cms_count"),
        (F.col("cms_count") >= F.col("exact_cnt")).alias("never_underestimates"),
    )


def _q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered system→user→assistant funnel per conversation: reach
    flags + hop latencies (chained unordered-frame window MINs)."""
    from kkbox_churn_prediction_spark.operators.funnel import funnel_steps

    return funnel_steps(_conv(spark, sf_dir))


def _q_funnel_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level funnel conversion rates (tiny single-row rollup
    over the per-entity flags)."""
    from kkbox_churn_prediction_spark.operators.funnel import funnel_rollup, funnel_steps

    return funnel_rollup(funnel_steps(_conv(spark, sf_dir)))


def _q_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quintile scoring per user at the data-derived cutoff
    (edge-bucketized, no global sort; decimal-exact money sums)."""
    from kkbox_churn_prediction_spark.operators.rfm import rfm_scores, rfm_table
    from kkbox_churn_prediction_spark.sources.events import read_table

    return rfm_scores(rfm_table(read_table(spark, sf_dir, "events"), lookback_days=28))


def _q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup-week cohort × age-week retention matrix (window MIN
    cohort assignment, one distinct + one agg, broadcast size join)."""
    from kkbox_churn_prediction_spark.operators.cohort import cohort_retention

    return cohort_retention(_conv(spark, sf_dir))


def _q_hopping_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 2h/1h hopping windows (sequence-explode replication,
    Expand-free distinct; epoch-us BIGINT keys — TZ-free)."""
    from kkbox_churn_prediction_spark.operators.windows import hopping_window_counts

    return hopping_window_counts(_conv(spark, sf_dir), width_seconds=7200, slide_seconds=3600)


def _q_ab_test_text_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's t between two deterministic hash-parity cohorts on
    text length (one algebraic agg + scalar algebra)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.functions.text import stable_hash48
    from kkbox_churn_prediction_spark.operators.abtest import welch_t_stats

    conv = _conv(spark, sf_dir)
    grp = F.when(
        F.pmod(stable_hash48(F.concat(F.lit("ab"), F.col("conv_id"))), F.lit(2)) == 0,
        F.lit("a"),
    ).otherwise(F.lit("b"))
    return welch_t_stats(conv, F.length("text").cast("double"), grp)


def _q_daily_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window z-score anomaly flags on the daily turn count
    (tiny post-agg window; no unbounded sort)."""
    from kkbox_churn_prediction_spark.operators.windows import daily_anomalies

    return daily_anomalies(_conv(spark, sf_dir))


def _q_engagement_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI stat-aggregate family: per-conversation engagement pairs
    (n_turns, mean text length) reduced to Pearson r, sample
    covariance, and the OLS slope/intercept — all algebraic aggregates
    (one partial+final reduce at any scale; two-level: conv rollup
    first, then the 4-stat global reduce)."""
    from pyspark.sql import functions as F

    per_conv = (
        _conv(spark, sf_dir)
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("double").alias("x"),
            F.avg(F.length("text").cast("double")).alias("y"),
        )
    )
    return per_conv.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.corr("x", "y").alias("pearson_r"),
        F.covar_samp("x", "y").alias("covar"),
        F.expr("regr_slope(y, x)").alias("slope"),
        F.expr("regr_intercept(y, x)").alias("intercept"),
    )


def _q_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped 3-way join (J3/J5/O2 composition): BUILDING
    customers' orders placed before the date line with line items
    shipped after it, top-10 by DECIMAL-exact revenue. Catalyst
    broadcasts the filtered customer dim; both date filters reach the
    parquet scans (pushdown-audited in PLANS.md)."""
    from pyspark.sql import functions as F

    cutoff = F.lit("1997-01-01").cast("timestamp")
    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .where(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(5,2)")
    return (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(price * (F.lit(1).cast("decimal(5,2)") - disc))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def _q_daily_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series diagnostics on the daily turn-count series:
    lag-1 (momentum) and lag-7 (weekly seasonality) Pearson
    autocorrelation. The heavy reduction is the daily rollup; the
    ACF itself runs on the calendar-bounded series (same exemption
    as daily_anomalies)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    conv = _conv(spark, sf_dir)
    daily = (
        conv.groupBy(
            F.floor(F.unix_micros("ts") / F.lit(86_400_000_000))
            .cast("bigint")
            .alias("day_idx")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    w = Window.orderBy("day_idx")
    out = None
    for k in (1, 7):
        lagged = daily.withColumn("prev", F.lag("n", k).over(w)).where(
            F.col("prev").isNotNull()
        )
        row = lagged.agg(
            F.lit(k).alias("lag"),
            F.round(F.corr("n", "prev"), 6).alias("pearson_r"),
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
        )
        out = row if out is None else out.unionAll(row)
    return out


def _q_label_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two independent turn-labeling heuristics
    (metadata rater: role ∈ {system, tool} → machine; text rater:
    length ≥ 15 → machine). Annotation-QA: agreement beyond chance
    before trusting a labeled corpus. One contingency shuffle; κ is
    closed-form over the tiny cell table."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.association import cohens_kappa

    rated = _conv(spark, sf_dir).select(
        F.when(F.col("role").isin("system", "tool"), "machine")
        .otherwise("human")
        .alias("rater_a"),
        F.when(F.length("text") >= 15, "machine")
        .otherwise("human")
        .alias("rater_b"),
    )
    return cohens_kappa(rated, "rater_a", "rater_b")


def _q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance-to-centroid z-score screen over the embedding corpus
    (|z| flags eccentric vectors; curation companion to the near-dup
    family). Centroid = one 64-avg aggregation pass, scoring pass is
    shuffle-free; both stats ride 1-row broadcasts."""
    from kkbox_churn_prediction_spark.operators.similarity import (
        centroid_distance_outliers,
    )

    return centroid_distance_outliers(
        _embs(spark, sf_dir), dim=64, z_threshold=2.0
    )


def _q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive cross-engine fingerprint of the transcript
    table (replication/migration validator): Σ stable_hash48 mod M61
    + bit-XOR + row count in ONE wide aggregation. The oracle
    computing the SAME fingerprint in DuckDB is the point — the
    md5-derived hash is engine-portable where xxhash64 is not."""
    from kkbox_churn_prediction_spark.operators.profile import table_checksum

    return table_checksum(
        _conv(spark, sf_dir), ["conv_id", "turn_idx", "role", "tool", "text"]
    )


def _q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-level drift between two adjacent trailing-14d activity
    snapshots (cutoffs: last week-trunc and 14 days earlier):
    added/removed/changed/unchanged entity counts + value deltas in
    ONE conditional-agg pass — no self-join, no second scan."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.scd import snapshot_diff

    conv = _conv(spark, sf_dir)
    bounds = conv.agg(
        F.date_trunc("week", F.max("ts")).alias("_cut_b")
    )
    t = conv.crossJoin(F.broadcast(bounds))
    cut_b = F.col("_cut_b")
    cut_a = F.expr("_cut_b - INTERVAL 14 DAY")
    in_b = (F.col("ts") >= cut_a) & (F.col("ts") < cut_b)
    in_a = (F.col("ts") >= F.expr("_cut_b - INTERVAL 28 DAY")) & (
        F.col("ts") < cut_a
    )
    return snapshot_diff(t, "conv_id", in_a, in_b)


def _q_supplier_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative graph centrality: 3-round PageRank over the
    customer↔supplier bipartite graph (distinct trade edges from
    orders⋈lineitem, symmetrized), reporting supplier-node ranks.
    Each round: co-partitioned rank⋈degree join + edge join + dst-sum
    — the node-sized degree table is joined, never broadcast."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.components import pagerank

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    pr = pagerank(edges, "src", "dst", damping=0.85, iters=3)
    return pr.where(F.col("node").startswith("s")).select(
        "node", F.round("rank", 9).alias("rank")
    )


def _q_role_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-state conditional entropy of the next role (dialogue
    predictability; rides the transition table)."""
    from kkbox_churn_prediction_spark.operators.lags import conditional_entropy

    return conditional_entropy(_conv(spark, sf_dir))


def _q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-conversation text-length outliers via median/MAD
    (normal-consistent robust z > 3; exact grouped percentiles,
    buffers bounded by one conversation)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.winsorize import mad_outliers

    t = _conv(spark, sf_dir).select(
        "conv_id", F.expr("CAST(length(text) AS BIGINT)").alias("text_len")
    )
    return mad_outliers(t, "conv_id", "text_len")


def _q_gini_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of turn-count concentration across
    conversations (ties-safe average-rank formula over the
    distributed prefix-sum ranks — no global sort)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.rhythm import gini_concentration

    per_conv = (
        _conv(spark, sf_dir).groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_turns"))
    )
    return gini_concentration(per_conv, "n_turns")


def _q_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman optimal sampling allocation across text-length strata:
    budget 100 samples ∝ N_h·σ_h, capped at stratum population."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.sampling import neyman_allocation

    strata = _docs(spark, sf_dir).select(
        F.floor(F.length("text") / F.lit(50.0)).cast("bigint").alias("len_band"),
        F.length("text").alias("text_len"),
    )
    return neyman_allocation(strata, "len_band", "text_len", total_budget=100)


def _q_cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC latest-state compaction over the event stream: signup=I,
    purchase=U, error=D(tombstone); one max_by per user + tombstone
    filter — the MERGE-INTO-free snapshot."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.scd import apply_cdc

    ch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            "user_id",
            F.when(F.col("event_type") == "signup", F.lit("I"))
            .when(F.col("event_type") == "error", F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
            "value",
            "ts",
            "event_id",
        )
    )
    return apply_cdc(ch, ["user_id"], "ts", "op", tiebreak_col="event_id")


def _q_episode_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-based episode segmentation: a new episode at every
    system turn (content splits, vs sessionize's time splits) →
    per-episode aggregates."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.sessionize import segment_by_marker

    seg = segment_by_marker(_conv(spark, sf_dir), F.col("role") == "system")
    return seg.groupBy("conv_id", "episode_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.min("ts").alias("ep_start"),
        F.max("ts").alias("ep_end"),
    )


def _q_wasserstein_text_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned 1-Wasserstein drift of text length between the even/odd
    week folds — the earth-mover companion to psi_text_len (same
    binning, answer in characters instead of a divergence)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.psi import (
        fixed_width_bins,
        wasserstein_from_bins,
    )
    from kkbox_churn_prediction_spark.sources.events import conversations_from_events

    conv = conversations_from_events(spark, sf_dir)
    week_no = F.floor(
        F.unix_micros(F.date_trunc("week", F.col("ts"))) / F.lit(7 * 86400 * 1_000_000)
    )
    binned = conv.select(
        F.when(week_no % 2 == 0, F.lit("even")).otherwise(F.lit("odd")).alias("fold"),
        fixed_width_bins(F.expr("CAST(length(text) AS BIGINT)"), 5.0, 10).alias("bin"),
    )
    return wasserstein_from_bins(binned, "fold", "bin", ref_fold="even", bin_width=5.0)


def _q_jsd_text_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence of text length between the even/odd
    week folds — the bounded, clip-free member of the drift family
    (same binning as psi_text_len / wasserstein_text_len; answer in
    [0,1] bits)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.psi import (
        fixed_width_bins,
        jsd_from_bins,
    )
    from kkbox_churn_prediction_spark.sources.events import conversations_from_events

    conv = conversations_from_events(spark, sf_dir)
    week_no = F.floor(
        F.unix_micros(F.date_trunc("week", F.col("ts"))) / F.lit(7 * 86400 * 1_000_000)
    )
    binned = conv.select(
        F.when(week_no % 2 == 0, F.lit("even")).otherwise(F.lit("odd")).alias("fold"),
        fixed_width_bins(F.expr("CAST(length(text) AS BIGINT)"), 5.0, 10).alias("bin"),
    )
    return jsd_from_bins(binned, "fold", "bin", ref_fold="even")


def _q_activity_clock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-dow × hour activity heatmap with share-of-total — the
    reporting matrix behind the rhythm features. Wall-clock fields
    (weekday/hour) are TZ-consistent across engines the same way the
    A9 tumbling bucket is; ISO dow = Spark weekday(ts)+1 = DuckDB
    isodow(ts)."""
    from pyspark.sql import functions as F

    conv = _conv(spark, sf_dir)
    cells = conv.groupBy(
        (F.expr("weekday(ts)") + F.lit(1)).cast("int").alias("iso_dow"),
        F.hour("ts").cast("int").alias("hour"),
    ).agg(F.count(F.lit(1)).alias("n_turns"))
    total = cells.agg(F.sum("n_turns").alias("_t"))
    return cells.crossJoin(F.broadcast(total)).select(
        "iso_dow",
        "hour",
        "n_turns",
        F.round(F.col("n_turns") / F.col("_t"), 6).alias("pct"),
    )


def _q_term_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence with lift over document terms
    (which words co-occur in the same doc more than independence
    predicts); pair join bounded by per-doc vocabulary, min_support
    prunes the tail."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.functions.text import normalize_text, tokens
    from kkbox_churn_prediction_spark.operators.association import cooccurrence_lift

    toks = _docs(spark, sf_dir).select(
        "doc_id", F.explode(tokens(normalize_text(F.col("text")))).alias("term")
    )
    return cooccurrence_lift(toks, "doc_id", "term", min_support=300)


def _q_rank_normalize_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global rank/quantile transform of per-conversation turn counts
    (average-rank tie handling, scaled to [0,1]) — computed with the
    distributed prefix-sum along value order, never a
    single-partition percent_rank sort."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.encoders import rank_normalize

    per_conv = (
        _conv(spark, sf_dir).groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_turns"))
    )
    return rank_normalize(per_conv, "n_turns")


def _q_top_suppliers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 suppliers per nation by account balance — J8 broadcast
    dim join composed with the grouped top-k (covers the supplier
    table, the last catalog table without a gate)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.relational import topk_per_group

    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    joined = sup.join(
        F.broadcast(nation), sup["s_nationkey"] == nation["n_nationkey"]
    ).select("n_name", "s_name", F.round("s_acctbal", 6).alias("s_acctbal"))
    return topk_per_group(
        joined, ["n_name"], "s_acctbal", k=2, tiebreak_cols=["s_name"]
    )


def _q_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-shaped selective filter-sum: every predicate (date
    range, discount band, quantity cap) must reach the parquet scan —
    the canonical predicate-pushdown showcase. One partial+final agg,
    zero joins."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(5,2)")
    return li.agg(
        F.sum(price * disc).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def _q_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-shaped promo share: broadcast part join, conditional
    DECIMAL sums, one ratio row — exercises the part table (the last
    catalog table without a dedicated gate)."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(
        (F.col("l_shipdate") >= F.lit("1996-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select("p_partkey", "p_type")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(5,2)")
    rev = price * (F.lit(1).cast("decimal(5,2)") - disc)
    joined = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    return joined.agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(20,4)"))).cast("double")
            / F.sum(rev).cast("double"),
            6,
        ).alias("promo_revenue_pct"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def _q_topk_days_per_conv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k (W2/O2 per-group form): each conversation's two
    busiest days by turn count (tiebreak earliest day)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.relational import topk_per_group

    daily = (
        _conv(spark, sf_dir)
        .groupBy("conv_id", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).alias("n_turns"))
    )
    return topk_per_group(daily, ["conv_id"], "n_turns", k=2, tiebreak_cols=["day"])


def _q_debounce_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-time debounce: collapse same-(user, event_type) bursts
    closer than 5 min into one row with burst size/span (batch
    counterpart of the streaming ingest-dedup guard)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.dedup import collapse_bursts

    events = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select("user_id", "event_type", "ts", "event_id")
    )
    # event_id tiebreak: with EXACT ts duplicates and no tiebreaker,
    # the oracle's two window clauses may order the tied peers
    # differently and split one burst in two (r5 fuzz catch); a
    # total order makes both engines' gaps-and-islands identical
    return collapse_bursts(
        events,
        ["user_id", "event_type"],
        "ts",
        gap_us=300_000_000,
        tiebreak_col="event_id",
    )


def _q_weekly_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch rollup: daily text-length bin counts
    merged to weekly p50/p90 estimates (the rank member of the
    HLL/CMS sketch family; error bounded by the bin width)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.sketches import binned_quantile_rollup

    conv = _conv(spark, sf_dir)
    day = F.floor(F.unix_micros(F.col("ts")) / F.lit(86_400_000_000)).cast("bigint")
    week = F.floor(
        F.unix_micros(F.date_trunc("week", F.col("ts")))
        / F.lit(7 * 86_400 * 1_000_000)
    ).cast("bigint")
    return binned_quantile_rollup(
        conv, F.length("text").cast("bigint"), day, week, bin_width=50
    )


def _q_risk_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-match rule router over per-conversation engagement
    features (reference ``sql/07_churn_risk_scoring.sql:9-16`` CASE
    chain; rules as data per ``rules.yaml``)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.rules import apply_rules

    per_conv = (
        _conv(spark, sf_dir)
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.when(F.col("tool").isNotNull(), 1).otherwise(0)).alias("n_tool"),
            (
                (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts")))
                / F.lit(86_400_000_000.0)
            ).alias("tenure_days"),
        )
        .withColumn("tool_rate", F.col("n_tool") / F.col("n_turns"))
    )
    rules = [
        ("n_turns >= 100", "Power"),
        ("tenure_days < 1.0 OR n_turns < 5", "High"),
        ("tenure_days BETWEEN 1.0 AND 7.0 OR tool_rate > 0.3", "Medium"),
    ]
    return apply_rules(per_conv, rules, default="Low", out_col="risk_bucket").select(
        "conv_id", "n_turns", "risk_bucket"
    )


def _q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line peak concurrent sessions per day via the
    DISTRIBUTED two-phase prefix sum (within-day running sums +
    calendar-bounded cross-day carry — no global single-partition
    sort)."""
    from kkbox_churn_prediction_spark.operators.sessionize import session_aggregates
    from kkbox_churn_prediction_spark.operators.windows import peak_concurrency

    return peak_concurrency(session_aggregates(_conv(spark, sf_dir)))


def _q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-redundancy screen: all-pairs Pearson correlations over
    four per-conversation engagement metrics in ONE single-row
    aggregation pass, melted long by a zero-exchange Expand."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.association import correlation_matrix

    per_conv = (
        _conv(spark, sf_dir)
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("double").alias("nturns"),
            F.sum(F.when(F.col("tool").isNotNull(), 1).otherwise(0))
            .cast("double")
            .alias("ntool"),
            F.avg(F.length("text").cast("double")).alias("avglen"),
            F.sum(F.when(F.col("role") == "user", 1).otherwise(0))
            .cast("double")
            .alias("nuser"),
        )
    )
    return correlation_matrix(per_conv, ["nturns", "ntool", "avglen", "nuser"])


def _q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy release audit: per (role, tool, day) quasi-identifier
    combo, distinct entities + at-risk flag under k=5 (Expand-free
    two-level distinct)."""
    from kkbox_churn_prediction_spark.operators.privacy import k_anonymity_audit

    return k_anonymity_audit(_conv(spark, sf_dir), ("role", "tool"), "conv_id", k=5)


def _q_k_anonymity_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row k-anonymity verdict (dataset k, rows at risk)."""
    from kkbox_churn_prediction_spark.operators.privacy import (
        k_anonymity_audit,
        k_anonymity_summary,
    )

    return k_anonymity_summary(
        k_anonymity_audit(_conv(spark, sf_dir), ("role", "tool"), "conv_id", k=5)
    )


def _q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity release audit: per (role, day) quasi-identifier
    cell, distinct sensitive (tool) values incl. the NULL class;
    homogeneity-attack guard that k-anonymity alone misses."""
    from kkbox_churn_prediction_spark.operators.privacy import l_diversity_audit

    return l_diversity_audit(_conv(spark, sf_dir), ("role",), "tool", l=2)


def _q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness release audit: per (role, day) QI cell, the total-
    variation distance of the tool distribution from the global one —
    the skewness-attack guard k-anonymity and l-diversity both miss.
    Exact-integer numerator (decimal), one final double division."""
    from kkbox_churn_prediction_spark.operators.privacy import t_closeness_audit

    return t_closeness_audit(_conv(spark, sf_dir), ("role",), "tool", t=0.2)


def _q_distinct_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-n corpus diversity per source slice (n=1,2,3):
    distinct/total n-gram ratios — the cross-document boilerplate
    signal per-doc repetition_stats can't see. Exact long counts,
    one long/long division per ratio."""
    from kkbox_churn_prediction_spark.operators.textstats import (
        distinct_ngram_diversity,
    )

    return distinct_ngram_diversity(_docs(spark, sf_dir))


def _q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per source slice from exact long sums of
    words / sentence-runs / vowel-group syllables — the classic
    readability quality gate, no per-doc float averaging."""
    from kkbox_churn_prediction_spark.operators.textstats import readability_stats

    return readability_stats(_docs(spark, sf_dir))


def _q_covariate_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariate-balance audit of the hash-parity assignment:
    standardized mean difference of per-conversation n_turns /
    total text length / tool-turn count between arms (the profile
    check between srm_arms and cuped_turns)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.functions.text import stable_hash48
    from kkbox_churn_prediction_spark.operators.abtest import covariate_balance

    conv = _conv(spark, sf_dir)
    units = conv.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum(F.length("text")).cast("long").alias("text_len"),
        F.sum(F.col("tool").isNotNull().cast("int")).cast("long").alias("n_tool_turns"),
    ).select(
        F.when(
            F.pmod(
                stable_hash48(F.concat(F.lit("ab"), F.col("conv_id"))), F.lit(2)
            )
            == 0,
            F.lit("a"),
        )
        .otherwise(F.lit("b"))
        .alias("arm"),
        "n_turns",
        "text_len",
        "n_tool_turns",
    )
    return covariate_balance(units, ("n_turns", "text_len", "n_tool_turns"))


def _q_mde_text_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum detectable effect of the hash-parity text-length test
    at current sample sizes (two-sided α=0.05, power 0.8) — the
    design-side companion to ab_test_text_len. Exact decimal moment
    sums, fixed-shape double algebra."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.functions.text import stable_hash48
    from kkbox_churn_prediction_spark.operators.abtest import power_mde

    conv = _conv(spark, sf_dir)
    units = conv.select(
        F.when(
            F.pmod(
                stable_hash48(F.concat(F.lit("ab"), F.col("conv_id"))), F.lit(2)
            )
            == 0,
            F.lit("a"),
        )
        .otherwise(F.lit("b"))
        .alias("arm"),
        F.length("text").cast("long").alias("y"),
    )
    return power_mde(units)


def _q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per predicted language: bytes/chars per
    BPE-ish token and tokens per word, exact long sums per slice —
    the tokenizer-equity audit for multilingual corpora."""
    from kkbox_churn_prediction_spark.operators.textstats import tokenizer_fertility

    return tokenizer_fertility(_docs(spark, sf_dir))


def _q_refusal_rate_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly assistant refusal-rate trend (same literal lexicon as
    the SFT pair filter) — the deploy-regression safety metric."""
    from kkbox_churn_prediction_spark.operators.assemble import refusal_rate_weekly

    return refusal_rate_weekly(_conv(spark, sf_dir))


def _q_daily_anomalies_adj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday-adjusted anomaly flags: trailing-z on dow-demeaned
    residuals — the deseasonalize-first alarm daily_acf and
    dow_seasonality exist to justify."""
    from kkbox_churn_prediction_spark.operators.windows import (
        daily_anomalies_deseasonalized,
    )

    return daily_anomalies_deseasonalized(_conv(spark, sf_dir))


def _q_daily_anomalies_online(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONLINE weekday-adjusted anomalies: expanding prior-only
    weekday means (no lookahead anywhere) — the deployable-alarm
    sibling of daily_anomalies_adj's retrospective audit."""
    from kkbox_churn_prediction_spark.operators.windows import (
        daily_anomalies_online,
    )

    return daily_anomalies_online(_conv(spark, sf_dir))


def _q_did_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences on per-conversation pre/post turn
    counts between hash-parity cohorts (a placebo design: DiD ≈ 0 is
    the expected, testable answer) — paired-delta inference."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.functions.text import stable_hash48
    from kkbox_churn_prediction_spark.operators.abtest import diff_in_diff

    conv = _conv(spark, sf_dir)
    mid = conv.agg(
        F.floor(
            (F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts"))) / F.lit(2)
        ).alias("_mid")
    )
    units = (
        conv.crossJoin(F.broadcast(mid))
        .groupBy("conv_id")
        .agg(
            F.sum(
                F.when(F.unix_micros("ts") < F.col("_mid"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("x"),
            F.sum(
                F.when(F.unix_micros("ts") >= F.col("_mid"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("y"),
        )
        .select(
            F.when(
                F.pmod(
                    stable_hash48(F.concat(F.lit("did"), F.col("conv_id"))),
                    F.lit(2),
                )
                == 0,
                F.lit("a"),
            )
            .otherwise(F.lit("b"))
            .alias("arm"),
            "x",
            "y",
        )
    )
    return diff_in_diff(units)


def _q_asof_last_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BACKWARD as-of join: latest pre-cutoff turn within a 14-day
    lookback per entity×cutoff, with payload and staleness — the
    feature-store 'latest snapshot as of t' with a TTL budget."""
    from kkbox_churn_prediction_spark.operators.asof import asof_backward_nearest
    from kkbox_churn_prediction_spark.sources.events import cutoffs_from_events

    return asof_backward_nearest(
        _conv(spark, sf_dir),
        cutoffs_from_events(spark, sf_dir),
        lookback_days=14,
    )


def _q_asof_next_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: per entity×cutoff, the earliest turn after
    the cutoff within 14 days with its role/tool payload and gap —
    the direction='forward' counterpart of the flagship backfill."""
    from kkbox_churn_prediction_spark.operators.asof import asof_forward_nearest
    from kkbox_churn_prediction_spark.sources.events import cutoffs_from_events

    return asof_forward_nearest(
        _conv(spark, sf_dir),
        cutoffs_from_events(spark, sf_dir),
        horizon_days=14,
    )


def _q_session_gap_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization-threshold audit: session count + mean length at
    15/30/60-minute inactivity gaps from ONE lag pass — the axis-A
    constant's sensitivity curve."""
    from kkbox_churn_prediction_spark.operators.sessionize import (
        session_gap_sensitivity,
    )

    return session_gap_sensitivity(_conv(spark, sf_dir))


def _q_streaming_srm_arms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming gate #7: continuous sample-ratio-
    mismatch monitor — watermarked hourly arm counts in append mode,
    chi-square verdict batch-side per finalized window (the lambda
    shape the PSI monitor uses)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.functions.text import stable_hash48
    from kkbox_churn_prediction_spark.streaming.drift import (
        srm_over_windows,
        streaming_category_counts,
    )

    src, stage = _stage_stream_src(sf_dir)
    batch = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(batch.schema)
        .parquet(stage)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            F.when(
                F.pmod(
                    stable_hash48(
                        F.concat(F.lit("ab"), F.col("user_id").cast("string"))
                    ),
                    F.lit(2),
                )
                == 0,
                F.lit("a"),
            )
            .otherwise(F.lit("b"))
            .alias("arm"),
            "ts",
        )
    )
    name = "eng_streaming_srm"
    q = (
        streaming_category_counts(stream, "arm", window="1 hour", watermark="1 hour")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    counts = spark.table(name).select(
        F.unix_micros(F.col("window_start")).alias("window_start_us"),
        "arm",
        F.col("n").cast("long").alias("n"),
    )
    return srm_over_windows(counts)


def _q_dedup_effective_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective sample size of the duplication-weighted corpus — what
    soft dedup bought: ESS, ESS ratio, and the redundant mass hard
    dedup would have deleted."""
    from kkbox_churn_prediction_spark.operators.components import (
        connected_components,
        duplication_weights,
        effective_sample_size,
    )
    from kkbox_churn_prediction_spark.operators.dedup import minhash_lsh_candidates

    docs = _docs(spark, sf_dir)
    pairs = minhash_lsh_candidates(docs, n=3, bands=4, rows_per_band=2)
    comps = connected_components(pairs, "doc_a", "doc_b")
    return effective_sample_size(duplication_weights(docs, comps))


def _q_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-weekday decomposition of the daily series + Hyndman
    seasonal strength — quantifies the deseasonalize-first decision
    daily_acf flags. Exact integer sufficient statistics."""
    from kkbox_churn_prediction_spark.operators.windows import dow_seasonality

    return dow_seasonality(_conv(spark, sf_dir))


def _q_label_rate_by_horizon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn-label sensitivity: positive rate of re-engagement within
    h days for h in 1/3/7/14 over the entity×cutoff grid — the audit
    behind choosing a label horizon."""
    from kkbox_churn_prediction_spark.operators.survival import (
        label_rate_by_horizon,
        survival_labels,
    )
    from kkbox_churn_prediction_spark.sources.events import cutoffs_from_events

    labels = survival_labels(
        _conv(spark, sf_dir), cutoffs_from_events(spark, sf_dir), horizon_days=14
    )
    return label_rate_by_horizon(labels, horizons=(1, 3, 7, 14))


def _q_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA level + one-step forecast error of the daily turn count
    (staircase half-life weights — exact IEEE on both engines); the
    forecasting baseline beside daily_anomalies and cusum_drift."""
    from kkbox_churn_prediction_spark.operators.windows import ewma_daily

    return ewma_daily(_conv(spark, sf_dir), halving_days=3)


def _q_qq_shift_text_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QQ drift table: per-decile text-length quantiles of the odd
    weeks vs the even reference, with the per-quantile shift in
    characters — WHERE the drift scores' movement happened."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.psi import qq_shift
    from kkbox_churn_prediction_spark.sources.events import conversations_from_events

    conv = conversations_from_events(spark, sf_dir)
    week_no = F.floor(
        F.unix_micros(F.date_trunc("week", F.col("ts"))) / F.lit(7 * 86400 * 1_000_000)
    )
    tagged = conv.select(
        F.when(week_no % 2 == 0, F.lit("even")).otherwise(F.lit("odd")).alias("fold"),
        F.length("text").cast("long").alias("text_len"),
    )
    return qq_shift(tagged, "text_len", "fold", ref_fold="even")


def _q_spearman_turns_textlen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between per-conversation turn count
    and total text length — the monotone, tail-robust companion to
    corr_matrix; exact doubled-rank integer sums."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.association import spearman_corr

    conv = _conv(spark, sf_dir)
    units = conv.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum(F.length("text")).cast("long").alias("text_len"),
    )
    return spearman_corr(units, "n_turns", "text_len")


def _q_transition_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov next-tool backtest: transition argmax fitted on the
    even-week fold, top-1 accuracy scored on the odd weeks — a full
    train/apply split inside the engine (the floor any sequence model
    must beat)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.lags import transition_backtest

    conv = _conv(spark, sf_dir)
    week_no = F.floor(
        F.unix_micros(F.date_trunc("week", F.col("ts"))) / F.lit(7 * 86400 * 1_000_000)
    )
    fold = F.when(week_no % 2 == 0, F.lit("even")).otherwise(F.lit("odd"))
    return transition_backtest(conv, fold, train_fold="even")


def _q_source_tf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-vector cosine between source pairs — the frequency-weighted
    companion to source_overlap's distinct-gram Jaccard. Exact decimal
    dot/norms, one explode, hash-keyed pair join."""
    from kkbox_churn_prediction_spark.operators.textstats import source_tf_cosine

    return source_tf_cosine(_docs(spark, sf_dir))


def _q_ndcg_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded retrieval quality: per-query nDCG@5 of the sign-LSH ANN
    vs exact brute force (relevance from the exact ranking itself) —
    the order-weighted companion to ann_recall."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.similarity import (
        brute_force_topk,
        lsh_bucketed_topk,
        ndcg_at_k,
    )

    embs = _embs(spark, sf_dir)
    queries = embs.where(F.col("vec_id") < 10)
    return ndcg_at_k(
        lsh_bucketed_topk(embs, queries, k=5, bits=4),
        brute_force_topk(embs, queries, k=5),
        k=5,
    )


def _q_logrank_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test of re-engagement survival between hash-parity
    cohorts — the significance companion to km_curve (same labels,
    same horizon)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.functions.text import stable_hash48
    from kkbox_churn_prediction_spark.operators.survival import (
        logrank_test,
        survival_labels,
    )
    from kkbox_churn_prediction_spark.sources.events import cutoffs_from_events

    labels = survival_labels(
        _conv(spark, sf_dir), cutoffs_from_events(spark, sf_dir), horizon_days=14
    ).withColumn(
        "cohort",
        F.when(
            F.pmod(
                stable_hash48(F.concat(F.lit("km"), F.col("conv_id"))), F.lit(2)
            )
            == 0,
            F.lit("a"),
        ).otherwise(F.lit("b")),
    )
    return logrank_test(labels)


def _q_cuped_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction on per-conversation post-period turn
    counts, with the pre-period turn count as covariate (pre/post
    split at the global time-range midpoint; arms by hash parity).
    Exact integer sufficient statistics, one hash agg per stage."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.functions.text import stable_hash48
    from kkbox_churn_prediction_spark.operators.abtest import cuped_adjusted

    conv = _conv(spark, sf_dir)
    mid = conv.agg(
        F.floor(
            (F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts"))) / F.lit(2)
        ).alias("_mid")
    )
    units = (
        conv.crossJoin(F.broadcast(mid))
        .groupBy("conv_id")
        .agg(
            F.sum(
                F.when(F.unix_micros("ts") < F.col("_mid"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("x"),
            F.sum(
                F.when(F.unix_micros("ts") >= F.col("_mid"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("y"),
        )
        .select(
            F.when(
                F.pmod(
                    stable_hash48(F.concat(F.lit("cuped"), F.col("conv_id"))),
                    F.lit(2),
                )
                == 0,
                F.lit("a"),
            )
            .otherwise(F.lit("b"))
            .alias("arm"),
            "x",
            "y",
        )
    )
    return cuped_adjusted(units)


def _q_proportion_tool_use(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test of 'conversation used ≥1 tool' between
    hash-parity arms — the conversion-rate companion to the Welch
    gate. Exact conditional counts, one row out."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.functions.text import stable_hash48
    from kkbox_churn_prediction_spark.operators.abtest import two_proportion_z

    conv = _conv(spark, sf_dir)
    units = conv.groupBy("conv_id").agg(
        F.max(F.col("tool").isNotNull().cast("int")).alias("success")
    ).select(
        F.when(
            F.pmod(
                stable_hash48(F.concat(F.lit("prop"), F.col("conv_id"))), F.lit(2)
            )
            == 0,
            F.lit("a"),
        )
        .otherwise(F.lit("b"))
        .alias("arm"),
        "success",
    )
    return two_proportion_z(units)


def _q_srm_arms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch gate on the hash-parity assignment vs the
    designed 50/50 split: per-arm observed/expected/share plus the
    chi-square verdict every experiment platform runs first."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.functions.text import stable_hash48
    from kkbox_churn_prediction_spark.operators.abtest import srm_check

    conv = _conv(spark, sf_dir)
    units = conv.select("conv_id").distinct().select(
        F.when(
            F.pmod(
                stable_hash48(F.concat(F.lit("ab"), F.col("conv_id"))), F.lit(2)
            )
            == 0,
            F.lit("a"),
        )
        .otherwise(F.lit("b"))
        .alias("arm")
    )
    return srm_check(units)


def _q_ks_text_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS statistic of text length between the even/odd
    week folds — the sup-norm member of the drift family (same
    binning as psi/jsd/wasserstein_text_len; exact-integer numerator,
    answer in [0,1])."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.psi import (
        fixed_width_bins,
        ks_from_bins,
    )
    from kkbox_churn_prediction_spark.sources.events import conversations_from_events

    conv = conversations_from_events(spark, sf_dir)
    week_no = F.floor(
        F.unix_micros(F.date_trunc("week", F.col("ts"))) / F.lit(7 * 86400 * 1_000_000)
    )
    binned = conv.select(
        F.when(week_no % 2 == 0, F.lit("even")).otherwise(F.lit("odd")).alias("fold"),
        fixed_width_bins(F.expr("CAST(length(text) AS BIGINT)"), 5.0, 10).alias("bin"),
    )
    return ks_from_bins(binned, "fold", "bin", ref_fold="even")


def _q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss sign projection 64->8: data-independent
    dimensionality reduction (no fit pass — the scale story vs PCA);
    deterministic md5 matrix so the oracle re-derives it bit-for-bit."""
    from kkbox_churn_prediction_spark.operators.similarity import random_projection

    return random_projection(_embs(spark, sf_dir), d_in=64, d_out=8, seed="jl")


def _q_winsorize_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile clipping (p01/p99) of the events value column +
    clip flags (one tiny percentile agg, then pure projection)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.winsorize import winsorize
    from kkbox_churn_prediction_spark.sources.events import read_table

    ev = read_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & F.col("event_id").isNotNull()
    ).select("event_id", F.col("value").cast("double").alias("value"))
    return winsorize(ev, "value", 0.01, 0.99)


def _q_winsorize_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row clip report for the winsorization (fractions + mean
    shift)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.winsorize import winsorize, winsorize_audit
    from kkbox_churn_prediction_spark.sources.events import read_table

    ev = read_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & F.col("event_id").isNotNull()
    ).select("event_id", F.col("value").cast("double").alias("value"))
    return winsorize_audit(winsorize(ev, "value", 0.01, 0.99), "value")


def _q_turn_taking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dialogue-structure stats: role-mix fractions + alternation rate
    per conversation (one lag window + one agg)."""
    from kkbox_churn_prediction_spark.operators.rhythm import turn_taking

    return turn_taking(_conv(spark, sf_dir))


def _q_assemble_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcripts → role-tagged training documents (sorted-aggregate
    assembly, the axis-A→axis-B bridge)."""
    from kkbox_churn_prediction_spark.operators.assemble import assemble_documents

    return assemble_documents(_conv(spark, sf_dir))


def _q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone composition across both engine halves: transcripts
    assemble into role-tagged documents, then the full curation
    pipeline (quality → language → exact-dedup verdicts) runs on the
    assembled corpus — one lineage from raw turns to training-data
    verdicts, cross-engine verified end-to-end."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.assemble import assemble_documents
    from kkbox_churn_prediction_spark.plans.curation import curate_corpus

    docs = assemble_documents(_conv(spark, sf_dir)).select(
        F.col("conv_id").alias("doc_id"), F.col("doc").alias("text")
    )
    # synthetic transcripts carry no natural-language stopwords, so
    # 'und' is the expected language — accepting it exercises the
    # quality/duplicate/kept branches rather than a wrong_lang
    # monoculture
    return curate_corpus(docs, keep_lang="und")


def _q_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 scalar quantization, exploded to scalar rows
    for the cross-engine compare."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.similarity import (
        quantize_embeddings,
    )

    q = quantize_embeddings(_embs(spark, sf_dir))
    return q.select(
        "vec_id", "scale", "offset", F.posexplode("qvec").alias("dim", "q")
    ).select("vec_id", F.col("dim").cast("int").alias("dim"), "q", "scale", "offset")


def _q_response_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation assistant response latency (join-free forward
    window over the shared conv_id partitioning)."""
    from kkbox_churn_prediction_spark.operators.lags import response_latency

    return response_latency(_conv(spark, sf_dir))


def _q_cluster_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean embedding per sign-LSH bucket via the one-pass JVM vector
    aggregate (Summarizer) — exploded to scalar rows for the gate."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.similarity import (
        cluster_centroids,
        sign_bucket,
    )

    embs = _embs(spark, sf_dir).withColumn(
        "bucket", sign_bucket("embedding", 4).cast("int")
    )
    return cluster_centroids(embs, "bucket", "embedding")


def _q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: every 50th doc plays the eval set;
    corpus docs sharing ≥2 tri-gram shingles with an eval doc are
    flagged (eval shingles broadcast — the corpus never shuffles)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.dedup import decontaminate

    docs = _docs(spark, sf_dir)
    eval_set = docs.where(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("eval_id"), "text"
    )
    corpus = docs.where(F.col("doc_id") % 50 != 0)
    return decontaminate(corpus, eval_set, n=3, min_common=2)


def _q_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked levenshtein near-dup pairs (precision path; block-size
    cap ON by default per the round-1 hot-shingle lesson)."""
    from kkbox_churn_prediction_spark.operators.dedup import fuzzy_pairs

    return fuzzy_pairs(_docs(spark, sf_dir), max_distance=6)


def _q_gap_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation EXACT gap percentiles — the scale-safe home
    for exact A10 (buffer bounded by one conversation, not the
    corpus)."""
    from kkbox_churn_prediction_spark.operators.lags import gap_percentiles_per_conv

    return gap_percentiles_per_conv(_conv(spark, sf_dir))


def _q_vocab_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-32 corpus vocabulary coverage per document (tokenizer-prep
    OOV audit; vocab is top-k of the term counts, broadcast back)."""
    from kkbox_churn_prediction_spark.operators.textstats import vocab_coverage

    return vocab_coverage(_docs(spark, sf_dir), vocab_size=32)


_BM25_TERMS = ("hash", "join", "vector")


def _q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-20 documents for a 3-term query (join-free
    conditional-agg retrieval — see textstats.bm25_scores)."""
    from kkbox_churn_prediction_spark.operators.textstats import bm25_scores

    return bm25_scores(_docs(spark, sf_dir), _BM25_TERMS, k=20)


def _q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of a dense ranker
    (cosine top-20 neighbors of vec 0) and a lexical ranker (BM25
    top-20 for the standing 3-term query) — ranks only, so the
    incomparable score scales never mix."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.similarity import (
        brute_force_topk,
        rrf_fuse,
    )
    from kkbox_churn_prediction_spark.operators.textstats import bm25_scores

    embs = _embs(spark, sf_dir)
    dense = brute_force_topk(
        embs, embs.where(F.col("vec_id") == 0), k=20
    ).select(F.col("neighbor_id").alias("doc_id"), "rank")
    lexical = bm25_scores(_docs(spark, sf_dir), _BM25_TERMS, k=20).select(
        "doc_id", "rank"
    )
    return rrf_fuse([dense, lexical], top_n=10)


def _q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram-LM scoring (λ=0.7 bigram + 0.3 unigram
    backoff) — the sharper perplexity-filter proxy; smoothing joins
    run table-side, the corpus stream probes ONE finished log-prob
    table."""
    from kkbox_churn_prediction_spark.operators.textstats import (
        bigram_logprob_score,
    )

    return bigram_logprob_score(_docs(spark, sf_dir))


def _q_source_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source data card: doc/token counts, mean quality, curation
    kept-rate and dup-rate — the mixture-weighting input; composes
    curate_corpus with one broadcast join + one per-source agg."""
    from kkbox_churn_prediction_spark.plans.curation import source_datacard

    return source_datacard(_docs(spark, sf_dir))


def _q_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist curation stage: per-doc blocked-token share + a
    keep/drop verdict at 5% — pure HOF expressions, no join/UDF."""
    from kkbox_churn_prediction_spark.operators.textstats import blocklist_filter

    return blocklist_filter(
        _docs(spark, sf_dir), ("hash", "vector"), max_fraction=0.05
    )


def _q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representation drift: per-label centroid L2/cosine distance to
    the reference (minimum) label's centroid — the embedding-space
    sibling of categorical PSI. One Summarizer pass for centroids;
    distance algebra on the tiny (groups × dims) table."""
    from kkbox_churn_prediction_spark.operators.similarity import embedding_drift

    return embedding_drift(_embs(spark, sf_dir), "label")


def _q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per doc by smooth TF-IDF —
    corpus-level df statistics broadcast back onto the tf stream."""
    from kkbox_churn_prediction_spark.operators.textstats import tfidf_top_terms

    return tfidf_top_terms(_docs(spark, sf_dir), k=3)


def _q_capped_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At most 10 docs per source, drawn uniformly via the hash
    bucket (deterministic, not head-of-scan)."""
    from kkbox_churn_prediction_spark.operators.sampling import capped_per_group

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    return capped_per_group(docs, "source", 10, "doc_id")


def _q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional 5-sample per source (exponential race,
    hash-deterministic, weight = document length)."""
    from kkbox_churn_prediction_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "n_chars"
    )
    return weighted_sample_per_group(docs, "source", 5, "doc_id", "n_chars")


def _q_pack_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sequence packing: docs → fixed-capacity context
    bins via hash-shard + per-shard running token offset."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.packing import pack_documents
    from kkbox_churn_prediction_spark.operators.textstats import token_count

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    return pack_documents(docs, "n_tokens", capacity=512, n_shards=8)


def _q_quintile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.relational import quintile_bucket_stats

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", F.col("value").cast("double").alias("value")
    )
    return quintile_bucket_stats(ev, "value", "event_id", n_buckets=5)


def _q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-iteration BPE merge-pair frequencies over the corpus —
    the distributed inner loop of BPE-vocab training (tokenizer
    prep, next to vocab_oov). Pair stats run on the vocab-sized
    distinct-word table weighted by word frequency, never on the
    corpus (see operators/textstats.py::bpe_pair_counts)."""
    from kkbox_churn_prediction_spark.operators.textstats import bpe_pair_counts

    return bpe_pair_counts(_docs(spark, sf_dir), top_n=50)


def _q_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized CUSUM level-shift detection on the daily series —
    the structural-drift companion to daily_anomalies (persistent
    small deviations accumulate past the threshold even when no
    single day trips a z-score)."""
    from kkbox_churn_prediction_spark.operators.windows import cusum_changepoints

    return cusum_changepoints(_conv(spark, sf_dir), threshold=5.0)


def _q_cooccurrence_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census / transitivity of the term co-occurrence graph
    (same ≥300-doc edges as term_cooccurrence). Spark counts via
    degree-ordered wedges (√m fan-out bound); the oracle counts via
    plain id-ordering — same census, two algorithms cross-checked."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.functions.text import normalize_text, tokens
    from kkbox_churn_prediction_spark.operators.association import cooccurrence_pairs
    from kkbox_churn_prediction_spark.operators.components import triangle_stats

    toks = _docs(spark, sf_dir).select(
        "doc_id", F.explode(tokens(normalize_text(F.col("text")))).alias("term")
    )
    # pair CORE only — the lift's marginal/total aggs would re-derive
    # the corpus-sized distinct three more times for columns the
    # census throws away
    edges = cooccurrence_pairs(toks, "doc_id", "term", min_support=300)
    return triangle_stats(edges, "item_a", "item_b")


def _q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication report (Lee et al. 2022): maximal
    duplicated n-gram spans per doc + covered-token fraction — finds
    shared boilerplate that doc-level Jaccard/MinHash misses. One
    corpus explode to a slim (id, pos, hash48) stream; hot-gram join
    bounded by min_docs/max_gram_docs; island merge per doc."""
    from kkbox_churn_prediction_spark.operators.dedup import duplicate_spans

    return duplicate_spans(
        _docs(spark, sf_dir), n=5, min_docs=2, max_gram_docs=10_000
    )


def _q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle sample covariance of the embedding space — the
    PCA/whitening/Mahalanobis sufficient statistic. One Arrow-batched
    mapInPandas pass of BLAS Gram partials; only ~33 KB per partition
    reaches the driver."""
    from kkbox_churn_prediction_spark.operators.similarity import (
        embedding_covariance,
    )

    return embedding_covariance(_embs(spark, sf_dir))


def _q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source n-gram contamination matrix (shared trigram
    vocabulary + Jaccard per source pair) — dedup-across-crawls
    screen before mixture weighting. Pair-join fan-out bounded by
    #sources per gram, never doc count."""
    from kkbox_churn_prediction_spark.operators.textstats import source_overlap

    return source_overlap(_docs(spark, sf_dir), n=3)


def _q_zipf_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law OLS fit of the word-frequency distribution (slope
    ≈ −1 for natural text; drift flags synthetic/boilerplate corpora).
    Ranks via the distributed value-order prefix sum — no
    single-partition vocab sort."""
    from kkbox_churn_prediction_spark.operators.textstats import zipf_stats

    return zipf_stats(_docs(spark, sf_dir))


def _q_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-batch negative pairs for contrastive training: deterministic
    hash batches, all within-batch pairs minus same-dedup-key false
    negatives. Slim (batch, id, key-hash) projection before the
    self-join; pair fan-out bounded by batch size²."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.functions.text import normalize_text, tokens
    from kkbox_churn_prediction_spark.operators.assemble import contrastive_pairs

    key = F.array_join(F.slice(tokens(normalize_text(F.col("text"))), 1, 5), " ")
    return contrastive_pairs(_docs(spark, sf_dir), 50, dup_key=key)


def _q_quantile_match_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDF matching: map the odd fold's text-length distribution onto
    the even (reference) fold via piecewise-linear decile
    interpolation — the 'apply' counterpart of the PSI drift audit.
    Pure scan-stage when-chain with 6dp edge literals."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.encoders import quantile_match

    conv = _conv(spark, sf_dir)
    week_no = F.floor(
        F.unix_micros(F.date_trunc("week", F.col("ts"))) / F.lit(7 * 86400 * 1_000_000)
    )
    folded = conv.select(
        "conv_id",
        "turn_idx",
        F.when(week_no % 2 == 0, F.lit("even")).otherwise(F.lit("odd")).alias("fold"),
        F.expr("CAST(length(text) AS BIGINT)").alias("v"),
    )
    src = folded.where(F.col("fold") == "odd").select("conv_id", "turn_idx", "v")
    ref = folded.where(F.col("fold") == "even")
    return quantile_match(src, "v", ref)


def _q_woe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WoE/IV feature audit: decile-binned token counts predicting
    the src0 domain label — the churn-modeling separating-power
    ranking applied to a corpus feature. PSI-family edge discipline;
    smoothing denominators are fixed literals."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.encoders import woe_iv
    from kkbox_churn_prediction_spark.operators.textstats import token_count

    docs = _docs(spark, sf_dir).select(
        # NULL text = empty doc = 0 tokens (the token_stats
        # convention) — explicit NULL policy BEFORE binning, since
        # bucketize_by_edges now bins NULL as NULL (r5 fuzz catch:
        # the engine filed NULL counts in the last bin, the oracle
        # in bin 0)
        F.coalesce(token_count(F.col("text")), F.lit(0)).alias("n_tokens"),
        (F.col("source") == "src0").cast("int").alias("label"),
    )
    # exact_edges=True requested EXPLICITLY to hash-match the oracle;
    # the operator default is the scale-safe approx-edge path
    return woe_iv(docs, "n_tokens", "label", exact_edges=True)


def _q_tool_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top tool→tool chains across conversations (workflow mining):
    lead over tool turns on the shared conv window, |tools|²-bounded
    counts, deterministic top-k."""
    from kkbox_churn_prediction_spark.operators.lags import tool_bigrams

    return tool_bigrams(_conv(spark, sf_dir), k=20)


def _q_daily_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily turn-count series at lags 1..7 —
    the weekly-seasonality detector for the drift monitors. All
    series math on the tiny daily table."""
    from kkbox_churn_prediction_spark.operators.windows import daily_acf

    return daily_acf(_conv(spark, sf_dir))


def _q_benford_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of lineitem extended prices — the
    fabricated-data screen. Scan-stage digit projection, 9-key agg."""
    from kkbox_churn_prediction_spark.operators.profile import benford_profile

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return benford_profile(li, "l_extendedprice")


def _q_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-budget curve over the document corpus: surviving
    types + token-mass share per min-frequency floor. One token pass;
    the curve is one pass over the vocab table."""
    from kkbox_churn_prediction_spark.operators.textstats import (
        vocab_threshold_coverage,
    )

    return vocab_threshold_coverage(_docs(spark, sf_dir))


def _q_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-scaling fit over the weekly transcript
    stream (V = K·N^β): the one-row scaling summary of vocab_growth,
    temporal companion to zipf_stats."""
    from kkbox_churn_prediction_spark.operators.textstats import heaps_law_fit

    return heaps_law_fit(_conv(spark, sf_dir))


def _q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly vocabulary growth over the transcript stream: distinct
    types, first-seen (new) types, cumulative types — the corpus
    freshness curve. Hash-slim shuffles; cumsum on the tiny week
    table."""
    from kkbox_churn_prediction_spark.operators.textstats import vocab_growth

    return vocab_growth(_conv(spark, sf_dir))


def _q_tool_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tool turnaround stats (gap to the next turn after a tool
    call): one lead on the shared conv window + Expand-free two-level
    agg; integer-division averages for cross-engine exactness."""
    from kkbox_churn_prediction_spark.operators.lags import tool_latency_stats

    return tool_latency_stats(_conv(spark, sf_dir))


def _q_mad_text_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-role text-length scale: median + MAD (+ the
    1.4826-scaled normal-consistent version). Two exact-percentile
    passes sharing the role partitioning; approx_percentile switch
    documented for 10^12-row groups."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.winsorize import mad_by_group

    vals = _conv(spark, sf_dir).select(
        "role", F.length(F.coalesce(F.col("text"), F.lit(""))).cast("double").alias("text_len")
    )
    return mad_by_group(vals, "text_len", "role")


def _q_conversation_outcomes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How conversations END: last role, abandonment (final turn is
    an unanswered user turn), refusal-styled final assistant turn,
    volume context. ONE algebraic max_by aggregate — no window sort."""
    from kkbox_churn_prediction_spark.operators.labels import conversation_outcomes

    return conversation_outcomes(_conv(spark, sf_dir))


def _q_prefix_sharing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix/KV-cache sharing profile: per depth d ∈ {1,2,3}, how
    many conversations share an identical first-d-turn prefix.
    Depth-capped collect (≤3 texts per conv buffer), hash-only
    shuffle."""
    from kkbox_churn_prediction_spark.operators.profile import prefix_sharing

    return prefix_sharing(_conv(spark, sf_dir))


def _q_dialogue_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT (prompt, response) pair mining: adjacent user→assistant
    turn pairs under the shared conversation ordering — one lag
    window, no join. Strict adjacency: intervening system/tool turns
    disqualify the pair."""
    from kkbox_churn_prediction_spark.operators.assemble import dialogue_pairs

    return dialogue_pairs(_conv(spark, sf_dir))


def _q_sft_pair_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT-pair filter verdicts on top of dialogue_pairs: refusal
    phrase flag (literal substring, engine-portable), degenerate
    short-response flag, response/prompt length ratio, keep verdict.
    Pure per-row expressions — zero added shuffles."""
    from kkbox_churn_prediction_spark.operators.assemble import (
        dialogue_pairs,
        sft_pair_quality,
    )

    return sft_pair_quality(
        dialogue_pairs(_conv(spark, sf_dir)), min_response_len=5
    )


def _q_sales_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kkbox_churn_prediction_spark.operators.relational import sales_by_region

    return sales_by_region(
        spark.read.parquet(f"{sf_dir}/orders.parquet"),
        spark.read.parquet(f"{sf_dir}/customer.parquet"),
        spark.read.parquet(f"{sf_dir}/nation.parquet"),
        spark.read.parquet(f"{sf_dir}/region.parquet"),
    )


def _q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney rank-sum z between two hash-parity cohorts on
    text length: value-histogram midranks (one hash agg + a bounded
    global window), exact integer rank sums."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.functions.text import stable_hash48
    from kkbox_churn_prediction_spark.operators.abtest import mann_whitney_u

    conv = _conv(spark, sf_dir)
    grp = F.when(
        F.pmod(stable_hash48(F.concat(F.lit("mw"), F.col("conv_id"))), F.lit(2)) == 0,
        F.lit("a"),
    ).otherwise(F.lit("b"))
    return mann_whitney_u(conv, F.length("text").cast("long"), grp)


def _q_qte_text_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects (p25/p50/p75) on text length
    between hash-parity arms; gate requests the exact percentile
    path for DuckDB quantile_cont parity (operator default is the
    approx_percentile scale path)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.functions.text import stable_hash48
    from kkbox_churn_prediction_spark.operators.abtest import quantile_treatment_effect

    conv = _conv(spark, sf_dir)
    units = conv.select(
        F.length("text").cast("long").alias("y"),
        F.when(
            F.pmod(stable_hash48(F.concat(F.lit("qte"), F.col("conv_id"))), F.lit(2))
            == 0,
            F.lit("a"),
        )
        .otherwise(F.lit("b"))
        .alias("arm"),
    )
    return quantile_treatment_effect(units, "arm", "y", (0.25, 0.5, 0.75), exact=True)


def _q_ipw_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPW average treatment effect under CONFOUNDED assignment:
    treatment probability rises with the per-conversation user-turn
    count (the covariate), so the naive arm difference is biased and
    the logistic-propensity reweighting corrects it. Binned-Newton
    propensity fit on a <=21-row profile (the platt recipe)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.functions.text import stable_hash48
    from kkbox_churn_prediction_spark.operators.abtest import ipw_ate

    conv = _conv(spark, sf_dir)
    per = conv.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum(F.when(F.col("role") == "user", 1).otherwise(0))
        .cast("long")
        .alias("n_user"),
    )
    x = F.least(F.col("n_user"), F.lit(20))
    t = (
        F.pmod(stable_hash48(F.concat(F.lit("ipw"), F.col("conv_id"))), F.lit(100))
        < F.lit(20) + F.lit(3) * x
    ).cast("long")
    units = per.select(t.alias("t"), F.col("n_turns").alias("y"), x.alias("x"))
    return ipw_ate(units, "t", "y", "x", max_bin=20)


def _q_seasonal_naive_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive (lag-7) forecast baseline scored with
    MAE/RMSE/sMAPE/MASE over the daily activity series (date-key
    self-joins on the bounded daily table; exact integer error
    sums)."""
    from kkbox_churn_prediction_spark.operators.windows import seasonal_naive_eval

    return seasonal_naive_eval(_conv(spark, sf_dir), season_days=7)


def _q_binseg_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single least-squares changepoint on the daily series (binary
    segmentation first split): prefix sums over the bounded daily
    table score every candidate in one pass."""
    from kkbox_churn_prediction_spark.operators.windows import binseg_changepoint

    return binseg_changepoint(_conv(spark, sf_dir))


def _q_pot_tail_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peaks-over-threshold GPD tail fit (method of moments) on the
    pooled inter-turn gaps; gate requests the exact p90 threshold
    (operator default is the approx_percentile scale path)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from kkbox_churn_prediction_spark.operators.windows import pot_tail_fit

    conv = _conv(spark, sf_dir)
    w = Window.partitionBy("conv_id").orderBy("ts", "turn_idx")
    gaps = conv.select(
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias("gap")
    )
    return pot_tail_fit(gaps, "gap", threshold_q=0.9, exact=True)


def _q_temperature_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-fold single-parameter temperature scaling on the binned
    prediction profile (1-D fixed-iteration Newton, platt recipe)."""
    from kkbox_churn_prediction_spark.operators.calibration import (
        temperature_scaling,
    )

    return temperature_scaling(_preds(spark, sf_dir), "fold", "y", "p", n_bins=20)


def _q_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split conformal interval around the per-role mean text-length
    predictor: hash-parity cal/test split, order statistic from the
    score value-histogram, achieved test coverage."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.functions.text import stable_hash48
    from kkbox_churn_prediction_spark.operators.calibration import conformal_interval

    conv = _conv(spark, sf_dir)
    labeled = conv.select(
        "role",
        F.length("text").cast("long").alias("y"),
        F.when(
            F.pmod(stable_hash48(F.concat(F.lit("conf"), F.col("conv_id"))), F.lit(2))
            == 0,
            F.lit("cal"),
        )
        .otherwise(F.lit("test"))
        .alias("sp"),
    )
    return conformal_interval(labeled, "role", "y", "sp", alpha=0.1)


def _q_pinball_text_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinball-loss evaluation of per-role quantile predictors
    (tau = 0.1/0.5/0.9) fitted on the cal split, scored on test;
    gate requests the exact-percentile fit path."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.functions.text import stable_hash48
    from kkbox_churn_prediction_spark.operators.calibration import pinball_loss

    conv = _conv(spark, sf_dir)
    labeled = conv.select(
        "role",
        F.length("text").cast("long").alias("y"),
        F.when(
            F.pmod(stable_hash48(F.concat(F.lit("pin"), F.col("conv_id"))), F.lit(2))
            == 0,
            F.lit("cal"),
        )
        .otherwise(F.lit("test"))
        .alias("sp"),
    )
    return pinball_loss(labeled, "role", "y", "sp", (0.1, 0.5, 0.9), exact=True)


def _q_effect_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d / Hedges' g / Cliff's delta between hash-parity
    cohorts on text length — moments AND the dominance statistic
    from ONE value-histogram pass (the Mann-Whitney rank machine)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.functions.text import stable_hash48
    from kkbox_churn_prediction_spark.operators.abtest import effect_sizes

    conv = _conv(spark, sf_dir)
    grp = F.when(
        F.pmod(stable_hash48(F.concat(F.lit("es"), F.col("conv_id"))), F.lit(2)) == 0,
        F.lit("a"),
    ).otherwise(F.lit("b"))
    return effect_sizes(conv, F.length("text").cast("long"), grp)


def _q_bh_fdr_event_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR over per-event-type early-vs-late
    share-drift z-tests (two-proportion, pooled SE; p via the shared
    erf-polynomial normal tail) — the multiple-comparison layer the
    per-slice drift readouts need."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.abtest import (
        benjamini_hochberg,
        normal_p_two_sided,
    )

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
        .select(
            "event_type", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
        )
    )
    bounds = ev.agg(
        F.min("us").cast("long").alias("mn"), F.max("us").cast("long").alias("mx")
    )
    tagged = ev.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.when(
            F.col("us")
            <= F.floor((F.col("mn") + F.col("mx")) / F.lit(2)).cast("long"),
            1,
        )
        .otherwise(0)
        .alias("early"),
    )
    agg = tagged.groupBy("event_type").agg(
        F.sum("early").cast("long").alias("x1"),
        F.sum(F.lit(1) - F.col("early")).cast("long").alias("x2"),
    )
    tot = agg.agg(
        F.sum("x1").cast("long").alias("n1"), F.sum("x2").cast("long").alias("n2")
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    r1 = F.col("x1").cast("double") / n1
    r2 = F.col("x2").cast("double") / n2
    phat = (F.col("x1") + F.col("x2")).cast("double") / (F.col("n1") + F.col("n2")).cast("double")
    se = F.sqrt(phat * (F.lit(1.0) - phat) * (F.lit(1.0) / n1 + F.lit(1.0) / n2))
    z = F.when(se > 0, (r1 - r2) / se).otherwise(F.lit(0.0))
    p_table = agg.crossJoin(F.broadcast(tot)).select(
        "event_type", normal_p_two_sided(z).alias("p_raw")
    )
    return benjamini_hochberg(p_table, "event_type", "p_raw", alpha=0.05)


def _q_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 200-permutation test of the conv-level total
    text length between hash-assigned arms (pseudo-permutation k =
    hash(salt‖unit‖'#'‖k) parity; add-one p-value)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.abtest import permutation_test

    conv = _conv(spark, sf_dir)
    return permutation_test(
        conv,
        F.col("conv_id"),
        F.length("text").cast("long"),
        n_perms=200,
        salt="perm",
    )


def _q_msprt_daily_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Always-valid mixture-SPRT p-value monitoring the daily
    mean-text-length gap between hash-parity arms (σ²=τ²=25, log
    space) — sequential testing beside the one-shot z/t gates."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.functions.text import stable_hash48
    from kkbox_churn_prediction_spark.operators.abtest import msprt_always_valid

    conv = _conv(spark, sf_dir)
    arm = F.pmod(
        stable_hash48(F.concat(F.lit("msprt"), F.col("conv_id"))), F.lit(2)
    )
    daily = (
        conv.where(F.col("text").isNotNull())
        .select(
            F.date_trunc("day", F.col("ts")).alias("d"),
            F.length("text").cast("long").alias("yl"),
            arm.alias("arm"),
        )
        .groupBy("d")
        .agg(
            F.sum(F.when(F.col("arm") == 1, F.col("yl")).otherwise(0))
            .cast("long")
            .alias("s1"),
            F.sum(F.when(F.col("arm") == 0, F.col("yl")).otherwise(0))
            .cast("long")
            .alias("s0"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("n1"),
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("n0"),
        )
    )
    series = daily.select(
        "d",
        F.when(
            (F.col("n1") > 0) & (F.col("n0") > 0),
            F.col("s1").cast("double") / F.col("n1").cast("double")
            - F.col("s0").cast("double") / F.col("n0").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("x"),
    )
    return msprt_always_valid(series, "d", "x", sigma2=25.0)


def _q_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of the daily turn-count series: median
    pairwise slope + median-residual intercept; the O(n²) self-join
    runs only on the calendar-bounded daily table."""
    from kkbox_churn_prediction_spark.operators.windows import theil_sen_daily

    return theil_sen_daily(_conv(spark, sf_dir), exact=True)


def _q_pacf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Levinson PACF (lags 1-4) of the daily series, unrolled
    as fixed-shape expressions over the 6dp-rounded ACF profile —
    the AR-order diagnostic beside daily_acf."""
    from kkbox_churn_prediction_spark.operators.windows import pacf_daily

    return pacf_daily(_conv(spark, sf_dir))


def _q_tool_retry_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tool retry-chain stats (consecutive same-tool calls in a
    conversation): calls, retries, maximal chains, longest chain,
    retry rate — the agent-loop flakiness readout."""
    from kkbox_churn_prediction_spark.operators.lags import tool_retry_chains

    return tool_retry_chains(_conv(spark, sf_dir))


def _q_bradley_terry_roles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry preference strengths over roles from adjacent
    turn pairs (longer text wins, deterministic ties), fitted with
    20 unrolled MM iterations on the exact win-count profile —
    byte-identical arithmetic DAG in the DuckDB oracle."""
    from kkbox_churn_prediction_spark.operators.preference import (
        bradley_terry,
        preference_pairs_from_turns,
    )

    pairs = preference_pairs_from_turns(_conv(spark, sf_dir))
    return bradley_terry(pairs, ["assistant", "system", "tool", "user"], n_iter=20)


def _q_fairness_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-fairness readout of a deterministic proxy classifier
    ('long doc' by char count) against a token-count ground truth,
    per language: confusion counts, demographic-parity and
    equalized-odds gaps vs the pooled rates."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.fairness import group_fairness

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("lang").isNotNull()
        & F.col("text").isNotNull()
        & F.col("n_chars").isNotNull()
    )
    label = (F.size(F.split(F.trim(F.col("text")), r"[ \t\n\x0B\f\r]+")) >= 55).cast("int")
    decision = (F.col("n_chars") >= 300).cast("int")
    return group_fairness(docs, F.col("lang"), label, decision)


def _q_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column early-vs-late drift report over the raw events
    table: row counts, null rates (+delta), exact distinct counts —
    the schema-health audit beside the PSI family."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.profile import schema_drift_report

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where(F.col("ts").isNotNull())
        .withColumn("us", F.unix_micros(F.col("ts").cast("timestamp")))
    )
    bounds = ev.agg(
        F.min("us").cast("long").alias("mn"), F.max("us").cast("long").alias("mx")
    )
    tagged = ev.crossJoin(F.broadcast(bounds)).withColumn(
        "early",
        F.col("us") <= F.floor((F.col("mn") + F.col("mx")) / F.lit(2)).cast("long"),
    )
    return schema_drift_report(
        tagged, ["event_type", "value", "props", "user_id"], F.col("early")
    )


def _q_periodogram_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete periodogram of the daily series at candidate periods
    2-14 days (exact calendar-day phases; ordered-window float sums)
    — the frequency-domain sibling of daily_acf, ranked by power."""
    from kkbox_churn_prediction_spark.operators.windows import periodogram_daily

    return periodogram_daily(_conv(spark, sf_dir))


def _q_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall/precision of the MinHash-LSH banding vs the exact
    trigram-Jaccard≥0.3 ground truth (same shingle order, same
    hot-shingle cap) — measured banding quality, the dedup twin of
    ann_recall."""
    from kkbox_churn_prediction_spark.operators.dedup import lsh_recall_eval

    return lsh_recall_eval(
        _docs(spark, sf_dir),
        n=3,
        threshold=0.3,
        bands=4,
        rows_per_band=2,
        max_shingle_freq=100,
    )


def _q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum assembly order: difficulty stages by exact n_chars
    quartiles + a per-doc hash sort key (stage·2^48 + hash48) — the
    windowless easy→hard schedule writers sort by."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.sampling import curriculum_order

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return curriculum_order(docs, F.col("n_chars"), n_stages=4, exact=True)


def _q_kn_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney-smoothed bigram LM score + perplexity per document
    (CCNet-style perplexity filtering statistic); continuation-type
    counts come from the distinct-bigram table itself."""
    from kkbox_churn_prediction_spark.operators.textstats import (
        kneser_ney_logprob_score,
    )

    return kneser_ney_logprob_score(_docs(spark, sf_dir))


def _q_watermark_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-tuning audit under simulated ingest jitter (hash-
    deterministic 0-1h delay per event): late-record rate + depth
    quantiles via the bucketed prefix-max machine — p99_late_us is
    the withWatermark delay you'd configure."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.functions.text import stable_hash48
    from kkbox_churn_prediction_spark.operators.lags import out_of_order_depth

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where(F.col("ts").isNotNull() & F.col("event_id").isNotNull())
        .select(
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        )
        .withColumn(
            "arr",
            F.col("us")
            + F.pmod(
                stable_hash48(
                    F.concat(F.lit("wm"), F.col("event_id").cast("string"))
                ),
                F.lit(3600),
            )
            * F.lit(1_000_000),
        )
    )
    return out_of_order_depth(
        ev,
        arrival=F.col("arr"),
        event_ts_us=F.col("us"),
        tiebreak=F.col("event_id"),
        exact=True,
    )


def _q_brown_double(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown double exponential smoothing of the daily series (both
    passes are the exact staircase-EWMA device): trend-aware level
    s1/s2 + one-step forecast 2·s1−s2 and its relative error."""
    from kkbox_churn_prediction_spark.operators.windows import brown_double_daily

    return brown_double_daily(_conv(spark, sf_dir), halving_days=3)


def _q_sql_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw-SQL surface (SURVEY S3): register the transcript view
    and answer with ``spark.sql`` directly — weekly role mix. Proves
    a reference user can keep writing plain SQL against the engine."""
    _conv(spark, sf_dir).createOrReplaceTempView("conversations_v")
    return spark.sql(
        """
        SELECT role,
               CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk,
               COUNT(*) AS n_turns,
               CAST(SUM(length(text)) AS BIGINT) AS text_len_sum
        FROM conversations_v
        GROUP BY role, wk
        """
    )


def _q_lsh_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed DBSCAN over embeddings: cores at ≥3 neighbors
    with cosine ≥ 0.35, clusters = components of the core graph,
    deterministic min-component border assignment, noise = −1."""
    from kkbox_churn_prediction_spark.operators.components import lsh_dbscan

    return lsh_dbscan(
        _embs(spark, sf_dir), threshold=0.35, min_pts=3, bucket_bits=4
    )


def _q_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard + Fleming-Harrington survival
    over the 14-day survival labels (km_curve's additive sibling)."""
    from kkbox_churn_prediction_spark.operators.survival import (
        nelson_aalen,
        survival_labels,
    )
    from kkbox_churn_prediction_spark.sources.events import cutoffs_from_events

    return nelson_aalen(
        survival_labels(
            _conv(spark, sf_dir), cutoffs_from_events(spark, sf_dir), horizon_days=14
        )
    )


def _q_rdd_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharp regression discontinuity at turn_idx = 30 (bandwidth 20):
    local linear fit of text length on each side, jump at the cutoff.
    One conditional hash agg; exact integer sufficient statistics."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.abtest import (
        regression_discontinuity,
    )

    return regression_discontinuity(
        _conv(spark, sf_dir).withColumn(
            "_y", F.expr("CAST(length(text) AS BIGINT)")
        ),
        running_col="turn_idx",
        outcome_col="_y",
        cutoff=30.0,
        bandwidth=20.0,
    )


def _q_freshness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-role freshness audit of the transcript stream: lag behind
    the global high-water mark, trailing-7-day volume, stale flag.
    Single scan (day-bucketed), windows on the post-agg frame."""
    from kkbox_churn_prediction_spark.operators.profile import freshness_audit

    return freshness_audit(
        _conv(spark, sf_dir), group_col="role", recent_days=7, stale_hours=24
    )


def _q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction plan over (day, role) transcript shards: bytes-desc
    running-sum bin packing into ~1 KiB buckets (plan-only analog of
    Iceberg rewrite_data_files), window on the shard profile only."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.layout import compaction_plan

    shards = (
        _conv(spark, sf_dir)
        .groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.col("role"),
        )
        .agg(F.sum(F.expr("CAST(length(text) AS BIGINT)")).alias("bytes"))
    )
    return compaction_plan(
        shards, key_cols=["day", "role"], bytes_col="bytes", target_bytes=1024
    )


def _q_pca_power_eigen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top eigenpair of the embedding covariance by DISTRIBUTED
    fixed-point power iteration (24 exact integer mat-vec steps on
    the (i,j,cov) frame) — the scale path pca_project's driver-side
    eigh can't take."""
    from kkbox_churn_prediction_spark.operators.similarity import (
        embedding_covariance,
    )
    from kkbox_churn_prediction_spark.operators.spectral import (
        power_iteration_top_eigen,
    )

    return power_iteration_top_eigen(
        embedding_covariance(_embs(spark, sf_dir)), n_iter=24
    )


def _q_lof_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local Outlier Factor (k=5) on the cosine kNN graph — density-
    relative outliers, LOF ≈ 1 in-cluster, ≫ 1 for sparse points."""
    from kkbox_churn_prediction_spark.operators.similarity import lof_scores

    return lof_scores(_embs(spark, sf_dir), k=5)


def _q_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling schedule rollup per media: every-30th-frame
    plan over the fake-decode n_frames (explode + hash agg; the
    decode is the documented stub)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.multimodal import (
        attach_media,
        extract_media_features,
        frame_sample_plan,
    )

    media = attach_media(_docs(spark, sf_dir))
    feats = extract_media_features(media).select("media_id", "n_frames")
    plan = (
        frame_sample_plan(media, every_n=30)
        .groupBy("media_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sampled"),
            F.max("frame_no").cast("int").alias("last_frame"),
        )
    )
    return feats.join(plan, "media_id").select(
        "media_id", "n_frames", "n_sampled", "last_frame"
    )


def _q_editdist_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein near-dup pairs under (length-bucket, first-token)
    blocking; banded thresholded DP JVM-side, dist ≤ 20."""
    from kkbox_churn_prediction_spark.operators.dedup import edit_distance_pairs

    return edit_distance_pairs(
        _docs(spark, sf_dir), max_dist=20, length_bucket=16
    )


def _q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking + block-level dedup rollup: rolling-
    hash boundaries (window 16, mask 63) from one partition-preserving
    vectorized mapInPandas pass (zero shuffles); per-doc shared-block
    stats from one chunk-frequency hash agg + one join."""
    from kkbox_churn_prediction_spark.operators.chunking import (
        cdc_chunk_docs,
        cdc_dedup_stats,
    )

    return cdc_dedup_stats(cdc_chunk_docs(_docs(spark, sf_dir)))


def _q_pareto_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-dominance Pareto frontier over (lexical quality =
    distinct-word ratio, text length), both maximized — the corpus-
    curation selection frontier, computed with the bucketed
    prefix-max machine (no global sort of the data)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.skyline import (
        pareto_frontier_2d,
    )

    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.round(
            F.size(F.array_distinct(F.split(F.col("text"), " "))).cast(
                "double"
            )
            / F.greatest(F.size(F.split(F.col("text"), " ")), F.lit(1)).cast(
                "double"
            ),
            6,
        ).alias("quality"),
        F.length("text").cast("long").alias("text_len"),
    )
    return pareto_frontier_2d(d, "quality", "text_len")


def _q_huber_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Huber M-estimator of the text-length center (k = 1.345·MAD,
    15 IRLS steps on the exact integer value histogram — the robust
    mean the winsorize/MAD family lacked)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.robust import huber_location

    return huber_location(
        _docs(spark, sf_dir).select(F.length("text").alias("text_len")),
        "text_len",
    )


def _q_hits_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs over the supplier→part bipartite supply graph
    (edge weight = lineitem count): which suppliers stock the parts
    that well-stocked suppliers stock — the bipartite-SVD sibling of
    supplier_pagerank, run in exact integer fixed-point."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.spectral import hits_scores

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_suppkey").alias("src"), F.col("l_partkey").alias("dst")
    )
    edges = li.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("w"))
    return hits_scores(edges, n_iter=12).select(
        F.col("src").alias("supp_key"), "hub", "n_dst", "total_w"
    )


def _q_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (k=5 char k-grams, window 8 — every
    shared run ≥ 12 chars guaranteed caught) + per-doc cross-corpus
    overlap rollup; selection is one partition-preserving vectorized
    mapInPandas pass (zero shuffles)."""
    from kkbox_churn_prediction_spark.operators.textstats import (
        winnow_fingerprints,
        winnow_overlap_stats,
    )

    return winnow_overlap_stats(
        winnow_fingerprints(_docs(spark, sf_dir), k=5, window=8)
    )


def _q_esd_daily_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalized-ESD top-5 iterative outliers of the daily turn
    count: remove-and-restudentize so one gross spike can't mask the
    next (the masking fix the one-shot daily z screens lack)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.robust import esd_topk_outliers

    daily = (
        _conv(spark, sf_dir)
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_turns"))
    )
    return esd_topk_outliers(daily, "day", "n_turns", n_rounds=5).select(
        "round", F.col("key").alias("day"), "value", "zscore"
    )


def _q_knn_label_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-neighborhood label agreement (cleanlab-style
    mislabel screen): proxy label = sign of the first embedding
    coordinate; k=5 cosine neighbors vote within the sign-LSH bucket
    (every point is a query — all-pairs brute was the measured sf0.1
    bottleneck; LSH is the scale path)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.similarity import (
        knn_label_consistency,
    )

    labeled = _embs(spark, sf_dir).select(
        "vec_id",
        "embedding",
        (F.element_at("embedding", 1) >= 0).cast("int").alias("label"),
    )
    return knn_label_consistency(labeled, k=5)


def _q_perm_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation feature importance of a fixed linear-sigmoid
    proxy scorer over per-conversation features (log turn count, log
    text volume, tool share) against the has-error-turn label: break
    one feature's row alignment (deterministic bucket-cyclic
    permutation), rescore, report the AUC drop."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.error_analysis import (
        permutation_importance,
    )

    per = (
        _conv(spark, sf_dir)
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.length("text")).alias("_len"),
            F.sum((F.col("tool").isNotNull()).cast("int")).alias("_tool"),
            # label: error-heavy conversation (error share > 25%) —
            # exact integer comparison; "any error" is near-constant.
            # eqNullSafe: NULL tool counts 0 like the oracle's
            # CASE ... ELSE 0 (plain == made _err NULL on all-NULL-
            # tool conversations; r5 degenerate-fuzz catch)
            F.sum(F.col("tool").eqNullSafe("error").cast("int")).alias("_err"),
        )
        .withColumn(
            "y", (F.col("_err") * 4 > F.col("_n")).cast("int")
        )
    )
    feats = per.select(
        "conv_id",
        "y",
        F.round(F.log(F.lit(1.0) + F.col("_n")), 6).alias("f_turns"),
        F.round(F.log(F.lit(1.0) + F.col("_len")), 6).alias("f_len"),
        F.round(
            F.col("_tool").cast("double") / F.col("_n").cast("double"), 6
        ).alias("f_tool"),
    )
    return permutation_importance(
        feats,
        "conv_id",
        "y",
        {"f_turns": 0.5, "f_len": 0.15, "f_tool": 4.0},
        intercept=-3.0,
        n_buckets=64,
    )


def _q_epoch_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-constrained training-budget plan: a 4×-corpus token
    budget split evenly across sources — per-source epochs (capped
    16) and the diminishing-returns effective-token value (geometric
    decay 0.71/epoch, the Muennighoff-style repeat-value curve)."""
    from kkbox_churn_prediction_spark.operators.sampling import (
        epoch_budget_plan,
    )

    return epoch_budget_plan(_docs(spark, sf_dir))


def _q_quantile_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """τ=0.9 pinball-regression trend of the daily turn count (how
    the BUSY days grow — the capacity question OLS and Theil-Sen
    can't answer), 12 unrolled IRLS steps on the bounded daily
    table."""
    from kkbox_churn_prediction_spark.operators.windows import (
        quantile_trend_daily,
    )

    return quantile_trend_daily(_conv(spark, sf_dir), tau=0.9)


def _q_pmi_top_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top spectral factor of the PPMI term-term matrix over the 40
    highest-df terms (the PMI-SVD word-embedding classic, Levy &
    Goldberg 2014) — proves the distributed power iteration composes
    beyond covariance: same exact-integer fixed point, new matrix."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.functions.text import (
        normalize_text,
        tokens,
    )
    from kkbox_churn_prediction_spark.operators.spectral import (
        power_iteration_top_eigen,
    )

    toks = _docs(spark, sf_dir).select(
        "doc_id",
        F.explode(
            F.array_distinct(tokens(normalize_text(F.col("text"))))
        ).alias("term"),
    )
    df_t = toks.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # top-40 terms, deterministic (df desc, term asc); the global
    # window runs on the post-limit 40-row table
    top = (
        df_t.orderBy(F.desc("df"), "term")
        .limit(40)
        .select(
            "term",
            "df",
            (
                F.row_number().over(W.orderBy(F.desc("df"), "term")) - 1
            ).alias("idx"),
        )
    )
    filtered = toks.join(F.broadcast(top), "term").select(
        "doc_id", "idx", "df"
    )
    n_docs = _docs(spark, sf_dir).agg(
        F.count(F.lit(1)).cast("long").alias("_d")
    )
    a = filtered.select(
        "doc_id", F.col("idx").alias("i"), F.col("df").alias("df_i")
    )
    b = filtered.select(
        "doc_id", F.col("idx").alias("j"), F.col("df").alias("df_j")
    )
    pairs = (
        a.join(b, "doc_id")
        .where(F.col("i") < F.col("j"))
        .groupBy("i", "j", "df_i", "df_j")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    ppmi = pairs.crossJoin(F.broadcast(n_docs)).select(
        F.col("i").alias("dim_i"),
        F.col("j").alias("dim_j"),
        F.greatest(
            F.lit(0.0),
            F.round(
                F.log(
                    F.col("c").cast("double")
                    * F.col("_d").cast("double")
                    / (F.col("df_i").cast("double") * F.col("df_j").cast("double"))
                ),
                6,
            ),
        ).alias("cov"),
    )
    eig = power_iteration_top_eigen(ppmi, n_iter=24)
    return eig.join(
        F.broadcast(top.select(F.col("idx").alias("dim"), "term")), "dim"
    ).select("term", F.col("dim").cast("int").alias("dim"), "loading", "eigenvalue")


def _q_lsh_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the transitive near-dup partition on its
    own MinHash-LSH pair graph — the "is this clustering better than
    chance" audit for the dedup pipeline; exact-integer numerator,
    one division."""
    from kkbox_churn_prediction_spark.operators.components import (
        connected_components,
        modularity,
    )
    from kkbox_churn_prediction_spark.operators.dedup import (
        minhash_lsh_candidates,
    )

    pairs = minhash_lsh_candidates(
        _docs(spark, sf_dir), n=3, bands=4, rows_per_band=2
    ).persist()
    comps = connected_components(pairs, "doc_a", "doc_b")
    return modularity(pairs, comps, community_col="component")


def _q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out trigram novelty per doc: share of its distinct
    shingles appearing in no other document — the boilerplate signal
    below any pairwise-similarity threshold."""
    from kkbox_churn_prediction_spark.operators.textstats import ngram_novelty

    return ngram_novelty(_docs(spark, sf_dir), n=3)


def _q_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped 6-table join: revenue by nation within ASIA
    for 1996 orders where the supplier and customer share a nation
    (the "local supplier" predicate). The deepest relational
    composition on the surface — region→nation broadcast down the dim
    chain, the two fact tables join on orderkey, the locality
    predicate closes the snowflake. DECIMAL-exact revenue."""
    from pyspark.sql import functions as F

    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1997-01-01").cast("timestamp")
    region = (
        spark.read.parquet(f"{sf_dir}/region.parquet")
        .where(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    asia_nations = nation.join(
        F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"]
    ).select("n_nationkey", "n_name")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_nationkey"
    )
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .select("o_orderkey", "o_custkey")
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(5,2)")
    return (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .join(F.broadcast(supp), F.col("l_suppkey") == supp["s_suppkey"])
        .join(F.broadcast(cust), F.col("o_custkey") == cust["c_custkey"])
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(
            F.broadcast(asia_nations),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.sum(price * (F.lit(1).cast("decimal(5,2)") - disc))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
        )
    )


def _q_rolling_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct-active conversations per day (WAU-style)
    + same-day actives + stickiness, via the interval-cover rewrite —
    two hash aggs on entity-day keys, no range join, no Expand."""
    from kkbox_churn_prediction_spark.operators.windows import (
        rolling_active_entities,
    )

    return rolling_active_entities(_conv(spark, sf_dir), window_days=7)


def _q_ccf_roles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation of user vs assistant daily volume at lags
    −7..+7 (lead/lag diagnostic; daily_acf's two-series sibling).
    One conditional-agg day collapse, then bounded-series algebra."""
    from kkbox_churn_prediction_spark.operators.windows import ccf_daily

    return ccf_daily(_conv(spark, sf_dir), "user", "assistant", max_lag=7)


def _q_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall monotone-trend significance on the daily series
    (tie-corrected variance, continuity-corrected z, tau-b) — the
    p-value companion to theil_sen_trend's slope."""
    from kkbox_churn_prediction_spark.operators.windows import (
        mann_kendall_daily,
    )

    return mann_kendall_daily(_conv(spark, sf_dir))


def _q_vocab_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 vocabulary-richness lower bound + Good–Turing sample
    coverage from singleton/doubleton counts (capture–recapture
    complement to heaps_law's growth-curve extrapolation)."""
    from kkbox_churn_prediction_spark.operators.textstats import (
        vocab_richness,
    )

    return vocab_richness(_docs(spark, sf_dir))


def _q_stl_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite daily decomposition: rolling-median trend + weekday
    seasonal + remainder (what anomaly alarms should fire on) — all
    windows on the calendar-bounded daily series."""
    from kkbox_churn_prediction_spark.operators.windows import stl_daily

    return stl_daily(_conv(spark, sf_dir))


def _q_weight_ess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kish effective-sample-size health check of source-balancing
    weights over documents (ESS, ESS fraction, max-weight share, CV)
    — the weights audit every weighted estimator needs."""
    from kkbox_churn_prediction_spark.operators.sampling import (
        balance_weights,
        weight_diagnostics,
    )

    return weight_diagnostics(
        balance_weights(_docs(spark, sf_dir), "source"), "weight"
    )


def _q_skew_diagnosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew report for conv_id: hot-key ceiling vs mean,
    exact p99 key size off the counts-of-counts table, and the
    salt-bucket recommendation."""
    from kkbox_churn_prediction_spark.operators.skew import skew_diagnosis

    return skew_diagnosis(_conv(spark, sf_dir), "conv_id")


def _q_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib compression-ratio quality screen over documents (the
    MassiveText/Gopher repetitiveness signal) — genuinely Python-only
    compute shipped as partition-preserving mapInPandas over Arrow
    batches; DEFLATE has no DuckDB analog, so this gate is rows-only
    (the kmeans_cells class) with hand goldens pinning exactness."""
    from kkbox_churn_prediction_spark.operators.textstats import (
        compression_ratio,
    )

    return compression_ratio(_docs(spark, sf_dir))


def _q_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear exponential smoothing of the daily turn count
    (α=1/4, β=1/8): a genuine two-state RECURSION on the 1e-9 long
    grid — level and slope adapt at independent rates, unlike Brown's
    single-constant closed form. Sequential by nature, so the fit
    runs as one applyInPandas group over the calendar-bounded daily
    table (the per-fold PAV exemption)."""
    from kkbox_churn_prediction_spark.operators.windows import (
        holt_linear_daily,
    )

    return holt_linear_daily(_conv(spark, sf_dir))


def _q_kruskal_roles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis H across the four roles on text length — the
    k-sample nonparametric ANOVA completing the Mann–Whitney family.
    Ranks never materialize per row: one (value, group) histogram
    agg, midranks from the bounded distinct-value table, exact
    integer 2·R_g sums."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.abtest import kruskal_wallis

    return kruskal_wallis(
        _conv(spark, sf_dir), F.length("text"), F.col("role")
    )


def _q_granger_roles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger-style lag-1 lead/lag F-test between user and assistant
    daily volumes, both directions — exact-integer sufficient
    statistics, closed-form 2×2 normal equations, no iterative fit."""
    from kkbox_churn_prediction_spark.operators.windows import granger_daily

    return granger_daily(_conv(spark, sf_dir), "user", "assistant")


def _q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText-style rule screen per source: pass counts
    for word-count / mean-word-length / punctuation / alpha-word /
    duplicate-word rules plus the all-rules pass share — pure JVM
    column exprs (array_distinct on the bounded token array, no
    explode), one hash agg."""
    from kkbox_churn_prediction_spark.operators.textstats import (
        gopher_quality_flags,
    )

    return gopher_quality_flags(_docs(spark, sf_dir))


def _q_circadian_roles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Circular hour-of-day statistics per role (resultant mean hour,
    concentration R, circular std) — the cyclic-feature encoding the
    arithmetic mean gets wrong; two trig columns + one hash agg."""
    from kkbox_churn_prediction_spark.operators.rhythm import circadian_profile

    return circadian_profile(_conv(spark, sf_dir))


def _q_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the role-transition chain: one lag +
    a |roles|² count agg, then an exact INTEGER-grid power iteration
    over that bounded profile table (driver replay, bit-identical
    cross-engine — the Holt/EWMA quantization discipline applied to
    the chain fixpoint)."""
    from kkbox_churn_prediction_spark.operators.lags import markov_stationary

    return markov_stationary(_conv(spark, sf_dir))


def _q_bayes_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bayesian two-arm binary test on the hash-parity cohorts
    (success = conversation ever hit an error tool event): exact
    P(p_B > p_A) under Beta(1,1) priors via the Cook finite sum over
    the 4-count profile row — the decision quantity next to the
    frequentist two-proportion z."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.functions.text import stable_hash48
    from kkbox_churn_prediction_spark.operators.abtest import bayes_ab_binary

    conv = _conv(spark, sf_dir)
    units = conv.groupBy("conv_id").agg(
        F.max(F.when(F.col("tool") == "error", 1).otherwise(0)).alias("succ")
    )
    arm = F.when(
        F.pmod(stable_hash48(F.concat(F.lit("ab"), F.col("conv_id"))), F.lit(2))
        == 0,
        F.lit("a"),
    ).otherwise(F.lit("b"))
    return bayes_ab_binary(units.select(arm.alias("arm"), "succ"), "arm", "succ")


def _q_dp_role_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-DP noisy role counts via the Laplace mechanism with
    hash-seeded (deterministic, idempotent re-release) noise — one
    hash agg + |roles| scalar exprs; true counts never leave the
    plan."""
    from kkbox_churn_prediction_spark.operators.privacy import dp_noisy_counts

    return dp_noisy_counts(_conv(spark, sf_dir), "role", epsilon=1.0)


def _q_kcore_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core backbone (k=3) of the customer↔supplier trade graph:
    iterative degree peel to a fixpoint (driver bincount replay under
    2M edges, join+semi-join rounds with localCheckpoint past it) —
    the dense-subgraph sibling of the PageRank/components family."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.components import k_core

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    return k_core(edges, "src", "dst", k=3)


def _q_levene_roles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe (median-centered Levene) homogeneity-of-variance
    test on text length across roles — the spread-equality assumption
    check next to Welch/Kruskal: per-group exact median agg, join
    back, one algebraic moment agg, scalar F on the k-row table."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.abtest import brown_forsythe

    return brown_forsythe(
        _conv(spark, sf_dir), F.length("text").cast("double"), F.col("role")
    )


def _q_trend_error_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran–Armitage trend test: is the error-tool rate drifting
    monotonically across calendar weeks? One conditional agg to the
    per-week (n, successes) table, scalar algebra on that bounded
    table — the inferential companion to the weekly-rate chart."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.abtest import cochran_armitage

    conv = _conv(spark, sf_dir)
    week = F.floor(
        F.datediff(F.col("ts"), F.lit("2024-01-01")) / 7
    ).cast("double")
    succ = F.when(F.col("tool") == "error", 1).otherwise(0)
    return cochran_armitage(conv, week, succ)


def _q_page_hinkley_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page–Hinkley sequential mean-shift alarm on the daily volume
    share — the running-minimum drift detector completing the
    CUSUM/EWMA family; pure window algebra on the exact integer grid
    over the bounded daily table (no recursion, no applyInPandas)."""
    from kkbox_churn_prediction_spark.operators.windows import page_hinkley_daily

    return page_hinkley_daily(_conv(spark, sf_dir))


def _q_bloom_filter_fpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter sizing audit: build the distributed 4096-bit/3-hash
    bitmap over the conv_id key set (groupBy-word bit_or), probe with
    5000 disjoint keys, report fill ratio + predicted vs measured
    false-positive rate — the pre-flight for pushing a Bloom
    pre-filter into a 100 TB join/decontamination scan."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.sketches import bloom_filter_audit

    conv = _conv(spark, sf_dir)
    probes = spark.range(5000).select(
        F.concat(F.lit("probe:"), F.col("id")).alias("p")
    )
    return bloom_filter_audit(conv.select("conv_id"), "conv_id", probes, "p")


def _q_dispersion_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overdispersion screen on per-conversation daily turn counts by
    ISO weekday: variance-to-mean ratio per weekday — the Poisson-
    assumption QA every rate/anomaly threshold over these counts
    silently depends on. One count agg + one moment agg."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.association import dispersion_test

    conv = _conv(spark, sf_dir)
    counts = conv.groupBy(
        "conv_id", F.date_trunc("day", "ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    return dispersion_test(
        counts, "c", (F.expr("weekday(d)") + F.lit(1)).cast("int")
    )


def _q_simpsons_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox screen on the hash-parity cohorts: pooled
    error-rate difference vs per-role stratum differences, with the
    opposing-strata count and the reversal flag — the aggregation-
    trap audit for any observational A/B readout. One conditional
    agg to the (role × 4-count) table + two tiny rollups."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.functions.text import stable_hash48
    from kkbox_churn_prediction_spark.operators.association import (
        simpsons_paradox_screen,
    )

    conv = _conv(spark, sf_dir)
    arm = F.when(
        F.pmod(stable_hash48(F.concat(F.lit("ab"), F.col("conv_id"))), F.lit(2))
        == 0,
        F.lit("a"),
    ).otherwise(F.lit("b"))
    out = F.when(F.col("tool") == "error", 1).otherwise(0)
    return simpsons_paradox_screen(conv, arm, out, F.col("role"))


def _q_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt–Winters additive-seasonal smoothing of the daily series
    (period 7, α=1/4 β=1/8 γ=1/4): the level+trend+seasonal recursion
    completing the Brown/Holt family — per-step 1e-9 integer-grid
    states (seasonal m-vector carried as a LIST through the oracle's
    recursive CTE), one applyInPandas group over the bounded daily
    table."""
    from kkbox_churn_prediction_spark.operators.windows import holt_winters_daily

    # on_short="empty": under 2 seasonal periods of history the gate
    # yields an empty frame (the oracle's day-count guard) instead of
    # the operator's default loud ValueError (r5 degenerate fuzz)
    return holt_winters_daily(_conv(spark, sf_dir), on_short="empty")


def _q_theil_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality of per-conversation turn counts — the
    additively-decomposable sibling of gini_activity, as ONE
    algebraic agg over (n, Σx, Σ x·ln x); no ranks, no windows."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.rhythm import theil_index

    counts = _conv(spark, sf_dir).groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns")
    )
    return theil_index(counts, "n_turns")


def _q_hhi_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration of the document corpus
    across sources (+ effective source count 1/HHI) — the one-number
    data-mixture diagnostic; one bounded group agg + a 1-row reduce."""
    from kkbox_churn_prediction_spark.operators.rhythm import hhi_concentration

    return hhi_concentration(_docs(spark, sf_dir), "source")


def _q_ab_pvalue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test WITH its two-sided normal p-value via the
    engine-portable A&S 26.2.17 CDF polynomial (functions/stats.py) —
    closing the z-but-no-p gap across the test-statistic families;
    same fixed double expression shape in both engines."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.functions.stats import two_sided_p

    base = _q_proportion_tool_use(spark, sf_dir)
    return base.withColumn(
        "p_two", F.round(two_sided_p(F.col("z_stat")), 6)
    )


def _q_yuen_text_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yuen's 20%-trimmed-mean robust two-sample test on text length
    between the hash-parity cohorts (quantile-winsorized variant) —
    the outlier-proof replacement for the Welch gate; per-arm exact
    percentile agg → broadcast 2-row quantile table → one conditional
    moment agg → scalar algebra, p via the portable normal CDF."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.functions.text import stable_hash48
    from kkbox_churn_prediction_spark.operators.abtest import yuen_trimmed_test

    conv = _conv(spark, sf_dir)
    arm = F.when(
        F.pmod(stable_hash48(F.concat(F.lit("ab"), F.col("conv_id"))), F.lit(2))
        == 0,
        F.lit("a"),
    ).otherwise(F.lit("b"))
    return yuen_trimmed_test(
        conv, F.length("text").cast("double"), arm
    )


def _q_spiegelhalter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spiegelhalter's calibration Z test over the deterministic
    prediction table — the significance companion to calibration_ece:
    ONE algebraic agg (no bins), p via the portable normal CDF."""
    from kkbox_churn_prediction_spark.operators.calibration import spiegelhalter_z

    return spiegelhalter_z(_preds(spark, sf_dir), "y", "p")


def _q_standardized_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Direct standardization: arm B's error rate re-weighted to arm
    A's role mix — the FIX for the Simpson trap `simpsons_check`
    detects (raw vs adjusted differences side by side); one bounded
    conditional agg + a 1-row reduce."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.functions.text import stable_hash48
    from kkbox_churn_prediction_spark.operators.abtest import standardized_rates

    conv = _conv(spark, sf_dir)
    arm = F.when(
        F.pmod(stable_hash48(F.concat(F.lit("ab"), F.col("conv_id"))), F.lit(2))
        == 0,
        F.lit("a"),
    ).otherwise(F.lit("b"))
    out = F.when(F.col("tool") == "error", 1).otherwise(0)
    return standardized_rates(conv, arm, out, F.col("role"))


def _q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-flight orders⋈lineitem cardinality estimate from the two
    per-key count tables: exact Σ c_l·c_r, the independence estimate,
    and the max per-key fan-out product (the skew red flag) — the
    planner-style check before committing to an expensive join."""
    from kkbox_churn_prediction_spark.operators.profile import join_size_estimate

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey")
    return join_size_estimate(orders, li, "o_orderkey", "l_orderkey")


def _q_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the TPC-H FK chain
    (lineitem→orders, orders→customer, customer→nation, plus the
    events→customer cross-table probe): orphan counts and shares per
    relationship — one LEFT ANTI join each."""
    from kkbox_churn_prediction_spark.operators.profile import fk_orphan_audit

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return fk_orphan_audit(
        {
            "lineitem_orders": (li, "l_orderkey", orders, "o_orderkey"),
            "orders_customer": (orders, "o_custkey", cust, "c_custkey"),
            "customer_nation": (cust, "c_nationkey", nation, "n_nationkey"),
            "events_customer": (ev, "user_id", cust, "c_custkey"),
        }
    )


def _q_rmst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restricted mean survival time (τ = the 14-day horizon) over the
    KM curve — the single-number retention effect size completing the
    KM/Nelson–Aalen/log-rank family; one lead() window over the
    bounded curve + a 1-row reduce."""
    from kkbox_churn_prediction_spark.operators.survival import (
        rmst,
        survival_labels,
    )
    from kkbox_churn_prediction_spark.sources.events import cutoffs_from_events

    return rmst(
        survival_labels(
            _conv(spark, sf_dir), cutoffs_from_events(spark, sf_dir), horizon_days=14
        ),
        tau=14,
    )


def _q_welch_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's heteroscedastic one-way ANOVA on text length across the
    four roles — the parametric k-sample member completing
    Kruskal–Wallis + Brown–Forsythe; one moment agg per group, all
    algebra on the k-row table."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.abtest import welch_anova

    return welch_anova(
        _conv(spark, sf_dir), F.length("text").cast("double"), F.col("role")
    )


def _q_cvm_text_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned Cramér–von Mises drift of text length between the
    even/odd week folds — the integrated-squared-gap FIFTH lens of the
    drift family (same binning as psi/jsd/wasserstein/ks_text_len;
    exact decimal numerator, one division)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.psi import (
        cvm_from_bins,
        fixed_width_bins,
    )

    conv = _conv(spark, sf_dir)
    week_no = F.floor(
        F.unix_micros(F.date_trunc("week", F.col("ts"))) / F.lit(7 * 86400 * 1_000_000)
    )
    binned = conv.select(
        F.when(week_no % 2 == 0, F.lit("even")).otherwise(F.lit("odd")).alias("fold"),
        fixed_width_bins(F.expr("CAST(length(text) AS BIGINT)"), 5.0, 10).alias("bin"),
    )
    return cvm_from_bins(binned, "fold", "bin", "even")


def _q_ap_by_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (PR-AUC, sklearn step semantics) per fold on
    the deterministic prediction fixture — the class-imbalance
    companion to auc_by_fold, same distinct-score machine, 1e-9-grid
    exact-decimal term sum."""
    from kkbox_churn_prediction_spark.operators.calibration import (
        average_precision_by_fold,
    )

    return average_precision_by_fold(_preds(spark, sf_dir), "fold", "y", "p")


def _q_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar paired test: did per-conversation error-tool incidence
    change between the first and second half of each conversation
    (split at the midpoint turn index)? One conditional agg to the
    4-count concordance row."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.abtest import mcnemar_paired

    conv = _conv(spark, sf_dir)
    mx = conv.groupBy("conv_id").agg(F.max("turn_idx").alias("_mx"))
    err = F.when(F.col("tool") == "error", 1).otherwise(0)
    units = (
        conv.join(mx, "conv_id")
        .groupBy("conv_id")
        .agg(
            F.max(F.when(F.col("turn_idx") * 2 <= F.col("_mx"), err).otherwise(0))
            .alias("pre"),
            F.max(F.when(F.col("turn_idx") * 2 > F.col("_mx"), err).otherwise(0))
            .alias("post"),
        )
    )
    return mcnemar_paired(units, "pre", "post")


def _q_fisher_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher's exact test (one-sided greater) on hash-parity cohorts
    × early-error incidence (error tool within the first five turns —
    the small-cell regime where the two-proportion z is invalid);
    driver lgamma sum over the bounded 4-count profile."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.functions.text import stable_hash48
    from kkbox_churn_prediction_spark.operators.abtest import fisher_exact_greater

    conv = _conv(spark, sf_dir)
    units = conv.groupBy("conv_id").agg(
        F.max(
            F.when((F.col("tool") == "error") & (F.col("turn_idx") < 5), 1).otherwise(0)
        ).alias("succ")
    )
    arm = F.when(
        F.pmod(stable_hash48(F.concat(F.lit("fx"), F.col("conv_id"))), F.lit(2)) == 0,
        F.lit("a"),
    ).otherwise(F.lit("b"))
    return fisher_exact_greater(units.select(arm.alias("arm"), "succ"), "arm", "succ")



def _q_turn_contiguity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcript integrity pre-flight on the engine's own input
    contract: dense 0-based turn_idx per conversation, agreeing with
    event-time order — per-defect conversation counts + magnitudes in
    one summary row (one conv-partitioned window + one chained agg)."""
    from kkbox_churn_prediction_spark.operators.profile import turn_contiguity_audit

    return turn_contiguity_audit(_conv(spark, sf_dir))


def _q_null_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Joint missingness-pattern profile over (role, text, tool): which
    column combinations go null TOGETHER (loader-defect signatures the
    per-column null rates can't show); one bounded-signature hash agg."""
    from kkbox_churn_prediction_spark.operators.profile import null_pattern_profile

    return null_pattern_profile(_conv(spark, sf_dir), ["role", "text", "tool"])


def _q_icc_text_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ICC(1) of text length within conversations — the
    variance-decomposition justification for conversation-level fold
    assignment (cluster_safe_split): two chained hash aggs, exact
    integer moments, 1e-6-grid deterministic cross-group terms."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.association import icc_oneway

    return icc_oneway(_conv(spark, sf_dir), "conv_id", F.length("text"))


def _q_tool_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top consecutive tool TRIPLES with conditional probability and
    lift vs the order-1 Markov chain — the memory check on
    transition_backtest's first-order assumption; two leads on ONE
    shared conv window, |tools|^3-bounded tables."""
    from kkbox_churn_prediction_spark.operators.lags import tool_trigrams

    return tool_trigrams(_conv(spark, sf_dir), k=20)



def _q_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic–Adar link prediction over the customer↔supplier trade
    graph (same distinct-edge build as supplier_pagerank): top-50
    unconnected pairs by inverse-log common-neighbor weight — the
    edge-nomination complement to the descriptive graph family;
    hub-capped wedge join, exact integer term sums."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.components import adamic_adar

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    return adamic_adar(edges, "src", "dst", k=50, max_degree=50)


def _q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full BPE merge-table training (8 greedy rounds) over the
    document corpus vocabulary — the tokenizer-trainer artifact
    completing bpe_pair_counts' single round; vocab-weighted pair
    stats, delimiter-encoded left-to-right merges identical across
    engines, driver replay under the vocab threshold."""
    from kkbox_churn_prediction_spark.operators.textstats import bpe_train_merges

    return bpe_train_merges(_docs(spark, sf_dir), n_merges=8)



def _q_ece_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-mass-bin (adaptive) ECE on the deterministic prediction
    fixture — the noise-robust companion to the fixed-width
    calibration_ece (every bin carries equal statistical weight);
    rank-based integer bin assignment on the distinct-score
    histogram, no percentile interpolation."""
    from kkbox_churn_prediction_spark.operators.calibration import ece_adaptive

    return ece_adaptive(_preds(spark, sf_dir), "y", "p", n_bins=10)


def _q_qini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini uplift curve: treated-vs-control incremental response per
    cumulative score decile (hash-parity arm over the prediction
    fixture) — the targeting-policy read completing gains_table;
    distinct-score histogram + two bounded cumulative windows, exact
    long counts throughout."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.functions.text import stable_hash48
    from kkbox_churn_prediction_spark.operators.calibration import qini_curve

    preds = _preds(spark, sf_dir)
    arm = F.when(
        F.pmod(
            stable_hash48(F.concat(F.lit("up"), F.col("event_id"))), F.lit(2)
        )
        == 0,
        F.lit("t"),
    ).otherwise(F.lit("c"))
    return qini_curve(
        preds.select(arm.alias("arm"), "y", "p"), "arm", "y", "p", n_bins=10
    )


def _q_mrr_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR@5 of the sign-LSH ANN against exact brute force — the
    time-to-first-hit retrieval metric beside recall@k and nDCG;
    result-sized intersection join only."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.similarity import (
        brute_force_topk,
        lsh_bucketed_topk,
        mrr_at_k,
    )

    embs = _embs(spark, sf_dir)
    queries = embs.where(F.col("vec_id") < 10)
    return mrr_at_k(
        lsh_bucketed_topk(embs, queries, k=5, bits=4),
        brute_force_topk(embs, queries, k=5),
        k=5,
    )


def _q_cumulative_incidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aalen–Johansen cumulative incidence over competing events
    (re-engagement vs error-tool failure, 14-day horizon): the
    accounting one-KM-per-event double-counts; CIF_a + CIF_b +
    overall survival = 1 at every t."""
    from kkbox_churn_prediction_spark.operators.survival import (
        competing_risks_labels,
        cumulative_incidence,
    )
    from kkbox_churn_prediction_spark.sources.events import cutoffs_from_events

    labels = competing_risks_labels(
        _conv(spark, sf_dir),
        cutoffs_from_events(spark, sf_dir),
        horizon_days=14,
    )
    return cumulative_incidence(labels)



def _q_hosmer_lemeshow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hosmer–Lemeshow goodness-of-fit chi-square on equal-mass score
    deciles (the significance companion to ece_adaptive, same
    rank-bin machine); Wilson–Hilferty p through the portable CDF."""
    from kkbox_churn_prediction_spark.operators.calibration import hosmer_lemeshow

    return hosmer_lemeshow(_preds(spark, sf_dir), "y", "p", n_bins=10)


def _q_univariate_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-free feature screen: per candidate conversation feature,
    the exact tie-aware AUC/KS of the raw value against the
    early-error label — stack() melt + ONE auc_ks_by_fold call keyed by
    feature name (distinct-value histogram machine)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.calibration import (
        univariate_auc_screen,
    )

    conv = _conv(spark, sf_dir)
    units = conv.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum(F.when(F.col("role") == "user", 1).otherwise(0))
        .cast("long")
        .alias("n_user_turns"),
        (
            F.sum(F.length("text")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_text_len"),
        (
            (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))).cast("double")
            / F.lit(3.6e9)
        ).alias("span_hours"),
        F.max(
            F.when(
                (F.col("tool") == "error") & (F.col("turn_idx") < 10), 1
            ).otherwise(0)
        ).alias("_y"),
    )
    return univariate_auc_screen(
        units, "_y", ["avg_text_len", "n_turns", "n_user_turns", "span_hours"]
    )


def _q_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid) silhouette per embedding label: cohesion
    vs separation + misassignment counts — the cluster-quality read
    beside diversity/drift; one Summarizer centroid pass + one
    exploded dim join, per-point scores on the integer micro-grid."""
    from kkbox_churn_prediction_spark.operators.similarity import (
        silhouette_by_label,
    )

    return silhouette_by_label(_embs(spark, sf_dir), "label", "embedding")


def _q_hurst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent (rescaled-range) of the daily series — the
    long-memory diagnostic beside daily_acf/pacf; exact prefix-sum
    cumulative deviations, micro-grid segment means, fixed-shape
    log-log slope."""
    from kkbox_churn_prediction_spark.operators.windows import hurst_daily

    return hurst_daily(_conv(spark, sf_dir))



def _q_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→apply round trip of the BPE artifact: encode the corpus
    vocabulary with the 8 learned merges and report the compression
    they buy (tokens/word vs the character baseline) — the
    acceptance test of a tokenizer-vocab candidate; k merges = k JVM
    replace ops over the distinct-word table."""
    from kkbox_churn_prediction_spark.operators.textstats import (
        bpe_apply_stats,
        bpe_train_merges,
    )

    docs = _docs(spark, sf_dir)
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in bpe_train_merges(docs, n_merges=8).orderBy("merge_rank").collect()
    ]
    return bpe_apply_stats(docs, merges)


def _q_nb_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative-binomial moments fit + zero-inflation screen of
    per-(conversation, active day) ERROR-tool counts by ISO weekday —
    the model step after dispersion_daily flags VMR > 1; zeros are
    real (active days without errors), so the structural-zero check
    has mass to weigh."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.association import nb_fit_daily

    conv = _conv(spark, sf_dir)
    counts = conv.groupBy("conv_id", F.date_trunc("day", "ts").alias("d")).agg(
        F.sum(F.when(F.col("tool") == "error", 1).otherwise(0))
        .cast("long")
        .alias("c")
    )
    return nb_fit_daily(
        counts.select(
            (F.expr("weekday(d)") + F.lit(1)).cast("int").alias("dow"), "c"
        ),
        "dow",
        "c",
    )


def _q_partition_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle/file sizing advisor over the widest table (lineitem):
    exact row count + exact mean serialized-width estimate → the
    spark.sql.shuffle.partitions / maxPartitionBytes dials computed
    instead of guessed (volume sibling of skew_diagnosis); one
    map-side agg, all-integer recommendation math."""
    from kkbox_churn_prediction_spark.operators.layout import partition_advisor

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return partition_advisor(li, target_partition_mb=128, cores=32)


def _q_tool_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch vs last-touch attribution of purchase conversions
    to the tools preceding them (10 tool-turn window): which tool
    STARTS converting journeys vs which CLOSES them; one bounded
    window-frame list collect + array exprs, |tools|-bounded aggs."""
    from kkbox_churn_prediction_spark.operators.funnel import tool_attribution

    return tool_attribution(
        _conv(spark, sf_dir), conversion_tool="purchase", window_turns=10
    )



def _q_stratified_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified (subclassification) ATE on the SAME confounded
    assignment ipw_ate corrects by modeling: conditioning exactly on
    the discrete confounder, with honest reporting of the
    single-arm-stratum mass dropped — the two estimators should
    agree, and disagreement localizes model misspecification."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.functions.text import stable_hash48
    from kkbox_churn_prediction_spark.operators.abtest import stratified_ate

    conv = _conv(spark, sf_dir)
    per = conv.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum(F.when(F.col("role") == "user", 1).otherwise(0))
        .cast("long")
        .alias("n_user"),
    )
    x = F.least(F.col("n_user"), F.lit(20))
    t = (
        F.pmod(stable_hash48(F.concat(F.lit("ipw"), F.col("conv_id"))), F.lit(100))
        < F.lit(20) + F.lit(3) * x
    ).cast("long")
    units = per.select(t.alias("t"), F.col("n_turns").alias("y"), x.alias("x"))
    return stratified_ate(units, "t", "y", "x")


def _q_km_greenwood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KM curve with Greenwood standard errors and the log-log 95%
    band — the uncertainty km_curve omits; same bounded event-time
    machine, defined-NULL bands at S in {0, 1}."""
    from kkbox_churn_prediction_spark.operators.survival import (
        km_greenwood,
        survival_labels,
    )
    from kkbox_churn_prediction_spark.sources.events import cutoffs_from_events

    return km_greenwood(
        survival_labels(
            _conv(spark, sf_dir), cutoffs_from_events(spark, sf_dir), horizon_days=14
        )
    )


def _q_encoding_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level encoding-health screen per source: U+FFFD
    decode failures, C0 control spillover, UTF-8-as-Latin-1 mojibake
    signature, non-ASCII share — the corpus defects word-level
    quality scores can't see; pure JVM exprs + one hash agg."""
    from kkbox_churn_prediction_spark.operators.textstats import encoding_quality

    return encoding_quality(_docs(spark, sf_dir), "text", "source")


def _q_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz concentration table behind gini_activity: per
    equal-population activity decile, the share of total turns and
    the cumulative Lorenz coordinates; rank-bin integer machine on
    the activity value histogram."""
    from kkbox_churn_prediction_spark.operators.rhythm import lorenz_deciles

    return lorenz_deciles(_conv(spark, sf_dir), "conv_id")



def _q_risk_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Risk ratio / odds ratio with CIs + Cohen's h for the
    hash-parity cohorts × early-error outcome — the effect-size
    reporting layer over the same 4-count profile the z/Fisher/Bayes
    tests read; defined-NULL intervals at zero cells."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.functions.text import stable_hash48
    from kkbox_churn_prediction_spark.operators.abtest import risk_ratio_ci

    conv = _conv(spark, sf_dir)
    units = conv.groupBy("conv_id").agg(
        F.max(
            F.when((F.col("tool") == "error") & (F.col("turn_idx") < 5), 1).otherwise(0)
        ).alias("succ")
    )
    arm = F.when(
        F.pmod(stable_hash48(F.concat(F.lit("fx"), F.col("conv_id"))), F.lit(2)) == 0,
        F.lit("a"),
    ).otherwise(F.lit("b"))
    return risk_ratio_ci(units.select(arm.alias("arm"), "succ"), "arm", "succ")


def _q_mantel_haenszel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel–Haenszel pooled odds ratio across user-turn-count
    strata (hash-parity arms × early-error outcome) — the
    binary-outcome sibling of stratified_ate_conf; per-stratum
    hypergeometric E/V terms on the 1e-9 grid, portable-CDF p."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.functions.text import stable_hash48
    from kkbox_churn_prediction_spark.operators.abtest import mantel_haenszel

    conv = _conv(spark, sf_dir)
    per = conv.groupBy("conv_id").agg(
        F.sum(F.when(F.col("role") == "user", 1).otherwise(0))
        .cast("long")
        .alias("n_user"),
        F.max(
            F.when((F.col("tool") == "error") & (F.col("turn_idx") < 5), 1).otherwise(0)
        ).alias("succ"),
    )
    arm = F.when(
        F.pmod(stable_hash48(F.concat(F.lit("mh"), F.col("conv_id"))), F.lit(2)) == 0,
        F.lit("a"),
    ).otherwise(F.lit("b"))
    units = per.select(
        F.least(F.col("n_user"), F.lit(5)).alias("stratum"),
        arm.alias("arm"),
        "succ",
    )
    return mantel_haenszel(units, "stratum", "arm", "succ")


def _q_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (alpha=0.3) source-mixture sampling weights
    over the document corpus — the mT5/XLM-R up-sampling scheme with
    the epoch-multiplier over-epoching flag and effective source
    count; one bounded source agg."""
    from kkbox_churn_prediction_spark.operators.sampling import (
        mixture_temperature_weights,
    )

    return mixture_temperature_weights(_docs(spark, sf_dir), "source", alpha=0.3)


def _q_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survey raking (3-round IPF) of turn weights to UNIFORM role ×
    ISO-weekday margins — two-margin corpus rebalancing that
    preserves the joint structure; bounded cell-table algebra with
    reported post-fit margins."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.sampling import rake_weights

    conv = _conv(spark, sf_dir)
    units = conv.select(
        "role",
        (F.expr("weekday(date_trunc('day', ts))") + F.lit(1)).cast("int").alias("dow"),
    )
    return rake_weights(units, "role", "dow", n_iter=3)



def _q_ad_text_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned Anderson–Darling drift of text length (even/odd week
    folds) — the SIXTH, tail-sensitive drift lens: the H(1−H)
    denominator amplifies extreme-quantile movement that KS/CvM
    under-weight; 1e-9-grid order-free term sums."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.psi import (
        anderson_darling_from_bins,
        fixed_width_bins,
    )

    conv = _conv(spark, sf_dir)
    week_no = F.floor(
        F.unix_micros(F.date_trunc("week", F.col("ts"))) / F.lit(7 * 86400 * 1_000_000)
    )
    binned = conv.select(
        F.when(week_no % 2 == 0, F.lit("even")).otherwise(F.lit("odd")).alias("fold"),
        fixed_width_bins(F.expr("CAST(length(text) AS BIGINT)"), 5.0, 10).alias("bin"),
    )
    return anderson_darling_from_bins(binned, "fold", "bin", "even")


def _q_label_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BBSE label-shift estimation: the target fold's class prior
    recovered WITHOUT target labels from source confusion rates +
    target prediction rates (C·q = μ̂, closed-form 2×2) — the
    label-mix drift triage beside the feature-drift lenses; one
    8-count agg."""
    from kkbox_churn_prediction_spark.operators.calibration import (
        label_shift_estimate,
    )

    return label_shift_estimate(_preds(spark, sf_dir), "fold", "y", "p")


def _q_c_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harrell's C-index of an activity risk score against the
    14-day re-engagement labels — the survival family's rank metric
    (censored AUC); pair sums via the bounded (duration × score)
    grid with suffix/prefix cumulative windows, never materialized
    pairs."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.survival import (
        survival_c_index,
        survival_labels,
    )
    from kkbox_churn_prediction_spark.sources.events import cutoffs_from_events

    conv = _conv(spark, sf_dir)
    labels = survival_labels(
        conv, cutoffs_from_events(spark, sf_dir), horizon_days=14
    )
    score = conv.groupBy("conv_id").agg(
        F.least(F.count(F.lit(1)), F.lit(1000)).cast("long").alias("score")
    )
    return survival_c_index(labels.join(score, "conv_id"), "score")



def _q_by_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Yekutieli FDR over the SAME per-event-type drift
    z-tests as bh_fdr_event_mix — valid under arbitrary dependence
    (the per-slice tests share the denominator totals, violating
    BH's PRDS assumption); step-up scaled by c(m)=Σ1/i."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.abtest import (
        benjamini_hochberg,
        normal_p_two_sided,
    )

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
        .select(
            "event_type", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
        )
    )
    bounds = ev.agg(
        F.min("us").cast("long").alias("mn"), F.max("us").cast("long").alias("mx")
    )
    tagged = ev.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.when(
            F.col("us")
            <= F.floor((F.col("mn") + F.col("mx")) / F.lit(2)).cast("long"),
            1,
        )
        .otherwise(0)
        .alias("early"),
    )
    agg = tagged.groupBy("event_type").agg(
        F.sum("early").cast("long").alias("x1"),
        F.sum(F.lit(1) - F.col("early")).cast("long").alias("x2"),
    )
    tot = agg.agg(
        F.sum("x1").cast("long").alias("n1"), F.sum("x2").cast("long").alias("n2")
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    r1 = F.col("x1").cast("double") / n1
    r2 = F.col("x2").cast("double") / n2
    phat = (F.col("x1") + F.col("x2")).cast("double") / (
        F.col("n1") + F.col("n2")
    ).cast("double")
    se = F.sqrt(phat * (F.lit(1.0) - phat) * (F.lit(1.0) / n1 + F.lit(1.0) / n2))
    z = F.when(se > 0, (r1 - r2) / se).otherwise(F.lit(0.0))
    p_table = agg.crossJoin(F.broadcast(tot)).select(
        "event_type", normal_p_two_sided(z).alias("p_raw")
    )
    return benjamini_hochberg(
        p_table, "event_type", "p_raw", alpha=0.05, method="by"
    )


def _q_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operating-point table at nine candidate thresholds over the
    prediction fixture: exact confusion counts + precision / recall /
    F1 / accuracy per row — the deployment artifact between AUC/AP
    and a shipped cutoff; one |thresholds|-wide conditional agg, no
    per-threshold scan."""
    from kkbox_churn_prediction_spark.operators.calibration import threshold_sweep

    return threshold_sweep(_preds(spark, sf_dir), "y", "p")


def _q_lsh_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH (bands × rows) sizing sheet at target Jaccard 0.8
    within a 256-hash budget: S-curve collision probabilities at
    below/target/above plus the threshold location — computed, not
    guessed, before any banding ships (partition_advisor pattern)."""
    from kkbox_churn_prediction_spark.operators.dedup import lsh_parameter_plan

    return lsh_parameter_plan(spark, target_jaccard=0.8, n_hashes_max=256)




def _staged_outer_join_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared replay harness for the OUTER stream-stream join gates
    (left #10, full #11): stages the corpus as batch 1 plus two
    far-future flush batches (``maxFilesPerTrigger=1``) so the join
    watermark marches past the data's tail and the delayed
    null-emission paths actually fire. Each flush batch carries BOTH
    a user-role and an assistant-role sentinel — the join watermark
    is the MIN across the two withWatermark operators, and a
    single-role flush leaves the other side's watermark behind,
    stranding exactly the tail-window unmatched rows in state
    (observed round 3, unit-tested). Sentinel rows carry negative
    user_ids ('c-1'/'c-2' conversations) so gates filter them with
    ``~conv_id.startswith('c-')``; distinct ids keep the sentinels
    from matching each other."""
    import hashlib
    import os
    import shutil
    import time as _time

    from pyspark.sql import functions as F

    src, _ = _stage_stream_src(sf_dir)
    stage = f"/tmp/eng_stream_lj_{hashlib.md5(src.encode()).hexdigest()[:10]}"
    batch = spark.read.parquet(src)
    if not os.path.exists(os.path.join(stage, "_STAGED")):
        shutil.rmtree(stage, ignore_errors=True)
        os.makedirs(stage, exist_ok=True)
        os.link(src, os.path.join(stage, "00_events.parquet"))
        # derive the flush sentinels FROM the batch row shape (schema
        # surgery is brittle across timestamp flavors)
        mx_row = batch.orderBy(F.desc("ts")).limit(1)
        uid_t = dict(batch.dtypes)["user_id"]
        for i, days in ((1, 30), (2, 60)):
            base_cols = [
                (F.col("ts") + F.expr(f"INTERVAL {days} DAYS")).alias("ts"),
                F.lit(0.0).alias("value"),
                F.lit("{}").alias("props"),
            ]
            flush = mx_row.select(
                F.lit(-10_000_000 - i).cast("long").alias("event_id"),
                F.lit(-1).cast(uid_t).alias("user_id"),
                F.lit("page").alias("event_type"),
                *base_cols,
            ).unionByName(
                mx_row.select(
                    F.lit(-20_000_000 - i).cast("long").alias("event_id"),
                    F.lit(-2).cast(uid_t).alias("user_id"),
                    F.lit("purchase").alias("event_type"),
                    *base_cols,
                )
            ).select("event_id", "ts", "user_id", "event_type", "value", "props")
            fdir = f"{stage}/_flush{i}"
            flush.coalesce(1).write.mode("overwrite").parquet(fdir)
            part = [f for f in os.listdir(fdir) if f.endswith(".parquet")][0]
            dst = os.path.join(stage, f"0{i}_flush.parquet")
            shutil.copyfile(os.path.join(fdir, part), dst)
            os.utime(dst, (_time.time() + i, _time.time() + i))
            shutil.rmtree(fdir, ignore_errors=True)
        open(os.path.join(stage, "_STAGED"), "w").write("ok")
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
    )
    return stream.select(
        F.concat(F.lit("c"), F.col("user_id")).alias("conv_id"),
        F.col("event_id").alias("turn_idx"),
        F.when(F.col("event_type") == "signup", F.lit("system"))
        .when(F.col("event_type") == "purchase", F.lit("assistant"))
        .when(F.col("event_type") == "error", F.lit("tool"))
        .otherwise(F.lit("user"))
        .alias("role"),
        "ts",
    )


def _q_streaming_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming gate #10: stream-stream LEFT OUTER
    event-time range join — unanswered user turns emit NULL rows only
    after the watermark proves no answer can arrive. Replay contract:
    outer null-emission is watermark-DRIVEN, so the harness stages
    the corpus as batch 1 and two far-future flush sentinels as
    batches 2-3 (``maxFilesPerTrigger=1``) to march the watermark
    past the data's tail; sentinel rows are filtered from the result
    and the batch LEFT JOIN oracle sees only real rows. Output: the
    per-conversation answered/unanswered tallies."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.streaming.joins import stream_left_pairs

    turns = _staged_outer_join_turns(spark, sf_dir)
    name = "eng_streaming_left_join"
    q = (
        stream_left_pairs(turns, horizon="2 hours", watermark="4 hours")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table(name).where(~F.col("conv_id").startswith("c-"))
    return (
        rows.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("answered").cast("long").alias("n_answered_pairs"),
            F.sum(F.lit(1) - F.col("answered")).cast("long").alias("n_unanswered"),
        )
        .orderBy("conv_id")
    )



def _q_streaming_full_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming gate #11: stream-stream FULL OUTER
    event-time range join — unanswered user turns AND orphan
    assistant turns (no prompting user turn in the preceding window)
    both emit NULL rows only after the watermark proves no partner
    can arrive. Same dual-role-sentinel two-flush replay contract as
    streaming_left_join (shared harness); batch FULL JOIN oracle.
    Output: per-conversation answered/unanswered/orphan tallies."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.streaming.joins import stream_full_pairs

    turns = _staged_outer_join_turns(spark, sf_dir)
    name = "eng_streaming_full_join"
    q = (
        stream_full_pairs(turns, horizon="2 hours", watermark="4 hours")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table(name).where(~F.col("conv_id").startswith("c-"))
    return (
        rows.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("answered").cast("long").alias("n_answered_pairs"),
            F.sum(
                F.when(
                    (F.col("answered") == 0) & (F.col("orphan") == 0), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_unanswered"),
            F.sum("orphan").cast("long").alias("n_orphan_answers"),
        )
        .orderBy("conv_id")
    )


def _q_event_study(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-study leads/lags around the corpus midpoint week for the
    hash-parity cohorts (weekly activity outcome, anchored at r=−1):
    the multi-period DiD picture whose pre-period coefficients ARE
    the parallel-trends check; one bounded-period conditional agg."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.functions.text import stable_hash48
    from kkbox_churn_prediction_spark.operators.abtest import event_study

    conv = _conv(spark, sf_dir)
    wk = F.floor(
        F.unix_micros(F.date_trunc("week", F.col("ts"))) / F.lit(7 * 86400 * 1_000_000)
    )
    per = conv.groupBy("conv_id", wk.alias("w")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    bounds = per.agg(
        F.min("w").cast("long").alias("mn"), F.max("w").cast("long").alias("mx")
    )
    arm = F.when(
        F.pmod(stable_hash48(F.concat(F.lit("es"), F.col("conv_id"))), F.lit(2)) == 0,
        F.lit("t"),
    ).otherwise(F.lit("c"))
    units = per.crossJoin(F.broadcast(bounds)).select(
        arm.alias("arm"),
        (F.col("w") - F.floor((F.col("mn") + F.col("mx")) / F.lit(2)))
        .cast("int")
        .alias("r"),
        "n",
    )
    return event_study(units, "arm", "r", "n", anchor_period=-1, max_abs_period=4)


def _q_ks_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise KS matrix of document length across ALL source pairs
    — the full-mesh drift view the each-vs-reference lens hides
    (two contaminated sources can agree with the pool while
    disagreeing with each other); k²·bins bounded pair join, exact
    decimal numerators."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.psi import (
        fixed_width_bins,
        ks_pair_matrix,
    )

    docs = _docs(spark, sf_dir)
    binned = docs.select(
        "source",
        fixed_width_bins(F.expr("CAST(length(text) AS BIGINT)"), 100.0, 20).alias(
            "bin"
        ),
    )
    return ks_pair_matrix(binned, "source", "bin")



# The driver's CORRECTNESS harness hashes the FIRST 50 entries of
# ``queries()`` (positional sample). Round 2 shipped them in build
# order, so the sample covered only the round-1 prefix; since r2 the
# prefix spans the operator surface (flagship 8 + one-or-two gates
# per family). ROTATED each round (VERDICT r4 task #2) so the hard
# external signal lands on never-before-sampled surface: r5 swaps in
# the four r4-new gates (quality classifier fit/apply, streaming
# FULL-outer join, Kiveris star components) plus ten gates the driver
# has never hash-checked, drawn from the families with the nastiest
# degeneracies (survival ties/censoring, zero-cell strata, robust
# location, k-core, BPE, SCD2/interval joins). The fourteen rotated
# OUT remain in the registry tail — still swept by tools/parity.py
# and most sit in the fuzz-parity net.
_DRIVER_CORE: tuple[str, ...] = (
    # flagship point-in-time transcript engine
    "asof_features",
    "sessionize",
    "lag_lead",
    "turn_labels",
    "entity_labels",
    "history_lags",
    "psi_text_len",
    "leakage_audit",
    # generic as-of (merge_asof analogs)
    "asof_next_event",
    # r4-new surface, never driver-sampled (VERDICT r4 "missing" #3)
    "quality_classifier_fit",
    "quality_classifier_apply",
    "streaming_full_join",
    "dedup_components_star",
    # never-sampled: survival with ties/censoring degeneracies
    "km_greenwood",
    "survival_c_index",
    # never-sampled: causal / A-B zero-cell + rank-tie paths
    "mann_whitney",
    "mantel_haenszel_strata",
    "stratified_ate_conf",
    # never-sampled: robust location / graph / text-LM iteration
    "huber_location",
    "kcore_suppliers",
    "bpe_train_merges",
    # never-sampled: interval algebra
    "scd2_role_intervals",
    "interval_session_join",
    # calibration / evaluation numerics
    "calibration_ece",
    "auc_by_fold",
    "brier_decomposition",
    # graph / components
    "dedup_components",
    "supplier_pagerank",
    # corpus curation
    "curate_corpus",
    # deterministic sampling
    "stratified_sample",
    # text-LM statistics
    "bm25_search",
    "dsir_scores",
    "zipf_stats",
    # rank machinery / distribution numerics
    "spearman_turns_textlen",
    "gini_activity",
    # experiments
    "did_turns",
    "srm_arms",
    # survival / time-series
    "km_curve",
    "daily_anomalies_adj",
    # privacy
    "k_anonymity",
    "redact_pii",
    # error-analysis tail reports
    "hardest_examples",
    # drift
    "embedding_drift",
    "cusum_drift",
    # multimodal budgeting
    "multimodal_token_budget",
    # ANN + embeddings
    "ann_recall",
    # folds + near-dup + streaming
    "backtest_folds_expanding",
    "dedup_ngram_jaccard",
    "tfidf_top_terms",
    "streaming_closed_sessions",
)



def _q_quality_classifier_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine trained text-quality classifier (VERDICT r3 task #5):
    L2-damped diagonal-Newton logistic regression over hashed
    token-count features, distilling the Gopher rule screen into a
    smooth fasttext-style quality score. Weights live on the exact
    1e-9 integer grid; gradients/Hessians are order-free
    decimal(38,0) sums; the oracle unrolls the identical 24 steps as
    materialized CTEs. Reference anchor: the sigmoid
    calibrate-then-threshold shape of src/calibration.py:101-128."""
    from kkbox_churn_prediction_spark.operators.quality_model import (
        hashed_doc_features,
        quality_classifier_fit,
    )
    from kkbox_churn_prediction_spark.operators.textstats import (
        gopher_rule_flags,
    )

    feats = hashed_doc_features(
        _docs(spark, sf_dir), gopher_rule_flags("text")["all"]
    )
    return quality_classifier_fit(feats)


def _q_quality_classifier_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every document with the in-engine-trained quality
    classifier: (doc_id, y, quality_prob, pred_pass) — pred_pass is
    the exact integer-grid score sign (zq >= 0), so the decision is
    cross-engine exact even where the 6dp probability rounds. The
    (n_features+1)-row weight table broadcasts onto the compact
    doc-bucket stream; the corpus never shuffles to get scored."""
    from kkbox_churn_prediction_spark.operators.quality_model import (
        hashed_doc_features,
        quality_classifier_fit,
        quality_classifier_score,
    )
    from kkbox_churn_prediction_spark.operators.textstats import (
        gopher_rule_flags,
    )

    feats = hashed_doc_features(
        _docs(spark, sf_dir), gopher_rule_flags("text")["all"]
    )
    return quality_classifier_score(feats, quality_classifier_fit(feats))


def _q_streaming_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming gate #12: the production corpus-ingest
    shape — TRAIN the quality classifier in batch, SCORE the arriving
    document stream. The fitted 17-row weight table (materialized once
    via localCheckpoint so micro-batch re-plans don't re-fit) is
    collapsed to a single feature→weight map row and stream-static
    broadcast-joined onto a file-source stream of the documents table;
    each doc emits (quality_prob, pred_pass, keep/drop route) computed
    row-locally in JVM array expressions — stateless append mode, no
    watermark, no stream-side shuffle. Oracle: the batch apply SQL
    (identical 24-step unrolled fit) + the route CASE; per-doc results
    are byte-identical to ``quality_classifier_apply`` by the shared
    exact-integer-grid contract."""
    from kkbox_churn_prediction_spark.operators.quality_model import (
        hashed_doc_features,
        quality_classifier_fit,
    )
    from kkbox_churn_prediction_spark.operators.textstats import (
        gopher_rule_flags,
    )
    from kkbox_churn_prediction_spark.streaming.score import (
        stream_quality_scores,
    )

    src, stage = _stage_stream_src(sf_dir, table="documents")
    label = gopher_rule_flags("text")["all"]
    weights = quality_classifier_fit(
        hashed_doc_features(_docs(spark, sf_dir), label)
    ).localCheckpoint(eager=True)
    batch = spark.read.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(stage)
    name = "eng_streaming_quality_scores"
    q = (
        stream_quality_scores(stream, weights, label)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).orderBy("doc_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q = _all_queries()
    core = {k: q.pop(k) for k in _DRIVER_CORE}
    core.update(q)
    return core


def _all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # point-in-time transcript engine
        "asof_features": _q_asof_features,
        "sessionize": _q_sessionize,
        "lag_lead": _q_lag_lead,
        "turn_labels": _q_turn_labels,
        "entity_labels": _q_entity_labels,
        "history_lags": _q_history_lags,
        "psi_text_len": _q_psi_text_len,
        "leakage_audit": _q_leakage_audit,
        # training-data pipeline: dedup / similarity / text analysis
        "dedup_exact": _q_dedup_exact,
        "dedup_ngram_jaccard": _q_dedup_ngram_jaccard,
        "dedup_containment": _q_dedup_containment,
        "minhash_signatures": _q_minhash_signatures,
        "simhash": _q_simhash,
        "embedding_topk": _q_embedding_topk,
        "embedding_topk_lsh": _q_embedding_topk_lsh,
        "ann_recall": _q_ann_recall,
        "embedding_diversity": _q_embedding_diversity,
        "lang_id": _q_lang_id,
        "text_quality": _q_text_quality,
        "token_stats": _q_token_stats,
        "fingerprint_docs": _q_fingerprint_docs,
        # relational operator inventory (SURVEY §2.4-2.7)
        "mode_tool": _q_mode_tool,
        "last_role": _q_last_role,
        "daily_engagement": _q_daily_engagement,
        "session_percentiles": _q_session_percentiles,
        "topk_busiest": _q_topk_busiest,
        "semi_join_tool_users": _q_semi_join_tool_users,
        "pivot_role_counts": _q_pivot_role_counts,
        "unpivot_role_counts": _q_unpivot_role_counts,
        "union_dedup_activity": _q_union_dedup_activity,
        "q1_pricing_summary": _q_q1_pricing_summary,
        # event-time windows + trend algebra + fold driver
        "session_assignment": _q_session_assignment,
        "rolling_turn_stats": _q_rolling_turn_stats,
        "tumbling_activity": _q_tumbling_activity,
        "trend_features": _q_trend_features,
        "backtest_folds": _q_backtest_folds,
        "backtest_folds_expanding": _q_backtest_folds_expanding,
        "cv_fold_assignment": _q_cv_fold_assignment,
        # near-dup / ANN / multimodal extensions
        "dedup_minhash_lsh": _q_dedup_minhash_lsh,
        "neardup_embedding": _q_neardup_embedding,
        "embedding_topk_ivf": _q_embedding_topk_ivf,
        "multimodal_features": _q_multimodal_features,
        "media_resize": _q_media_resize,
        "media_token_cost": _q_media_token_cost,
        "multimodal_token_budget": _q_multimodal_token_budget,
        # remaining relational inventory
        "quintile_stats": _q_quintile_stats,
        "sales_by_region": _q_sales_by_region,
        # second as-of strategy + reference-faithful PSI
        "asof_entity_grid": _q_asof_entity_grid,
        "psi_quantile": _q_psi_quantile,
        "psi_categorical": _q_psi_categorical,
        "feature_validation": _q_feature_validation,
        "streaming_closed_sessions": _q_streaming_closed_sessions,
        "streaming_asof_depth": _q_streaming_asof_depth,
        # calibration / evaluation math in-engine (SURVEY §2.10 F3)
        "reliability_diagram": _q_reliability_diagram,
        "calibration_ece": _q_calibration_ece,
        "gains_table": _q_gains_table,
        "brier_decomposition": _q_brier_decomposition,
        "label_noise": _q_label_noise,
        "feature_label_corr": _q_feature_label_corr,
        "collapse_rare_tools": _q_collapse_rare_tools,
        "eb_tool_rates": _q_eb_tool_rates,
        "weekly_latency_sla": _q_weekly_latency_sla,
        "isotonic_apply": _q_isotonic_apply,
        "weekly_bounce_rate": _q_weekly_bounce_rate,
        "calibration_metrics": _q_calibration_metrics,
        "bootstrap_ci": _q_bootstrap_ci,
        "auc_by_fold": _q_auc_by_fold,
        "isotonic_calibration": _q_isotonic_calibration,
        "platt_calibration": _q_platt_calibration,
        "platt_apply": _q_platt_apply,
        "error_by_segment": _q_error_by_segment,
        "hardest_examples": _q_hardest_examples,
        "confusion_costs": _q_confusion_costs,
        # transitive near-dup clustering
        "dedup_components": _q_dedup_components,
        "dedup_canonical": _q_dedup_canonical,
        "dedup_weights": _q_dedup_weights,
        "rrf_fusion": _q_rrf_fusion,
        "bigram_logprob": _q_bigram_logprob,
        "streaming_cms_tools": _q_streaming_cms_tools,
        "blocklist_filter": _q_blocklist_filter,
        "embedding_drift": _q_embedding_drift,
        "source_datacard": _q_source_datacard,
        # composed corpus-curation pipeline
        "curate_corpus": _q_curate_corpus,
        "curation_report": _q_curation_report,
        # deterministic training-data sampling + packing
        "stratified_sample": _q_stratified_sample,
        "token_budget_select": _q_token_budget_select,
        "match_token_distribution": _q_match_token_distribution,
        "cluster_safe_split": _q_cluster_safe_split,
        "capped_per_source": _q_capped_per_source,
        "weighted_sample": _q_weighted_sample,
        "pack_documents": _q_pack_documents,
        "tfidf_top_terms": _q_tfidf_top_terms,
        "bm25_search": _q_bm25_search,
        "vocab_oov": _q_vocab_oov,
        "gap_percentiles": _q_gap_percentiles,
        "fuzzy_pairs": _q_fuzzy_pairs,
        "decontaminate": _q_decontaminate,
        "cluster_centroids": _q_cluster_centroids,
        "response_latency": _q_response_latency,
        "streaming_drift_counts": _q_streaming_drift_counts,
        "streaming_enriched_counts": _q_streaming_enriched_counts,
        "streaming_turn_pairs": _q_streaming_turn_pairs,
        "quantize_embeddings": _q_quantize_embeddings,
        "assemble_documents": _q_assemble_documents,
        "corpus_pipeline": _q_corpus_pipeline,
        "unigram_logprob": _q_unigram_logprob,
        "dsir_scores": _q_dsir_scores,
        "distinctive_terms": _q_distinctive_terms,
        "fold_standardize": _q_fold_standardize,
        "chunk_documents": _q_chunk_documents,
        "rollup_activity": _q_rollup_activity,
        "cube_activity": _q_cube_activity,
        "set_ops_convs": _q_set_ops_convs,
        "scd2_role_intervals": _q_scd2_role_intervals,
        "interval_session_join": _q_interval_session_join,
        "resample_daily_activity": _q_resample_daily_activity,
        "repetition_stats": _q_repetition_stats,
        "bigram_pmi": _q_bigram_pmi,
        "zorder_keys": _q_zorder_keys,
        "kmeans_cells": _q_kmeans_cells,
        "profile_orders": _q_profile_orders,
        "target_encode_role": _q_target_encode_role,
        "standardize_text_len": _q_standardize_text_len,
        "hashed_cross_features": _q_hashed_cross_features,
        "mi_role_tooluse": _q_mi_role_tooluse,
        "chi2_role_tool": _q_chi2_role_tool,
        "role_transitions": _q_role_transitions,
        "hll_weekly_rollup": _q_hll_weekly_rollup,
        "negative_samples": _q_negative_samples,
        "json_props_stats": _q_json_props_stats,
        "decayed_features": _q_decayed_features,
        "survival_labels": _q_survival_labels,
        "km_curve": _q_km_curve,
        "interarrival_stats": _q_interarrival_stats,
        "activity_profile": _q_activity_profile,
        "activity_trend": _q_activity_trend,
        "daily_regularity": _q_daily_regularity,
        "shard_profile": _q_shard_profile,
        "redact_pii": _q_redact_pii,
        "cms_weekly_tools": _q_cms_weekly_tools,
        "funnel_steps": _q_funnel_steps,
        "funnel_rollup": _q_funnel_rollup,
        "rfm_scores": _q_rfm_scores,
        "cohort_retention": _q_cohort_retention,
        "hopping_activity": _q_hopping_activity,
        "ab_test_text_len": _q_ab_test_text_len,
        "turn_taking": _q_turn_taking,
        "streaming_dedup_counts": _q_streaming_dedup_counts,
        "daily_anomalies": _q_daily_anomalies,
        "engagement_regression": _q_engagement_regression,
        "corr_matrix": _q_corr_matrix,
        "peak_concurrency": _q_peak_concurrency,
        "risk_buckets": _q_risk_buckets,
        "weekly_quantile_sketch": _q_weekly_quantile_sketch,
        "debounce_events": _q_debounce_events,
        "topk_days_per_conv": _q_topk_days_per_conv,
        "q3_shipping_priority": _q_q3_shipping_priority,
        "q6_forecast_revenue": _q_q6_forecast_revenue,
        "q14_promo_share": _q_q14_promo_share,
        "top_suppliers_per_nation": _q_top_suppliers_per_nation,
        "rank_normalize_turns": _q_rank_normalize_turns,
        "term_cooccurrence": _q_term_cooccurrence,
        "activity_clock": _q_activity_clock,
        "wasserstein_text_len": _q_wasserstein_text_len,
        "jsd_text_len": _q_jsd_text_len,
        "episode_segments": _q_episode_segments,
        "cdc_latest_state": _q_cdc_latest_state,
        "gini_activity": _q_gini_activity,
        "mad_outliers": _q_mad_outliers,
        "role_entropy": _q_role_entropy,
        "daily_autocorr": _q_daily_autocorr,
        "neyman_allocation": _q_neyman_allocation,
        "k_anonymity": _q_k_anonymity,
        "k_anonymity_summary": _q_k_anonymity_summary,
        "l_diversity": _q_l_diversity,
        "t_closeness": _q_t_closeness,
        "ks_text_len": _q_ks_text_len,
        "tokenizer_fertility": _q_tokenizer_fertility,
        "mde_text_len": _q_mde_text_len,
        "covariate_balance": _q_covariate_balance,
        "refusal_rate_weekly": _q_refusal_rate_weekly,
        "daily_anomalies_adj": _q_daily_anomalies_adj,
        "daily_anomalies_online": _q_daily_anomalies_online,
        "did_turns": _q_did_turns,
        "asof_last_event": _q_asof_last_event,
        "asof_next_event": _q_asof_next_event,
        "session_gap_sensitivity": _q_session_gap_sensitivity,
        "streaming_srm_arms": _q_streaming_srm_arms,
        "dedup_effective_size": _q_dedup_effective_size,
        "dow_seasonality": _q_dow_seasonality,
        "label_rate_by_horizon": _q_label_rate_by_horizon,
        "ewma_daily": _q_ewma_daily,
        "qq_shift_text_len": _q_qq_shift_text_len,
        "spearman_turns_textlen": _q_spearman_turns_textlen,
        "transition_backtest": _q_transition_backtest,
        "source_tf_cosine": _q_source_tf_cosine,
        "ndcg_lsh": _q_ndcg_lsh,
        "logrank_cohorts": _q_logrank_cohorts,
        "cuped_turns": _q_cuped_turns,
        "proportion_tool_use": _q_proportion_tool_use,
        "srm_arms": _q_srm_arms,
        "distinct_ngrams": _q_distinct_ngrams,
        "readability": _q_readability,
        "random_projection": _q_random_projection,
        "winsorize_value": _q_winsorize_value,
        "winsorize_audit": _q_winsorize_audit,
        "label_agreement_kappa": _q_label_agreement_kappa,
        "embedding_outliers": _q_embedding_outliers,
        "table_checksum": _q_table_checksum,
        "snapshot_diff": _q_snapshot_diff,
        "supplier_pagerank": _q_supplier_pagerank,
        "bpe_pair_counts": _q_bpe_pair_counts,
        "cusum_drift": _q_cusum_drift,
        "cooccurrence_triangles": _q_cooccurrence_triangles,
        "duplicate_spans": _q_duplicate_spans,
        "embedding_covariance": _q_embedding_covariance,
        "source_overlap": _q_source_overlap,
        "zipf_stats": _q_zipf_stats,
        "contrastive_pairs": _q_contrastive_pairs,
        "sft_pair_quality": _q_sft_pair_quality,
        "prefix_sharing": _q_prefix_sharing,
        "conversation_outcomes": _q_conversation_outcomes,
        "mad_text_len": _q_mad_text_len,
        "tool_latency": _q_tool_latency,
        "vocab_growth": _q_vocab_growth,
        "heaps_law": _q_heaps_law,
        "vocab_coverage_curve": _q_vocab_coverage_curve,
        "benford_prices": _q_benford_prices,
        "daily_acf": _q_daily_acf,
        "tool_bigrams": _q_tool_bigrams,
        "woe_tokens": _q_woe_tokens,
        "quantile_match_lengths": _q_quantile_match_lengths,
        "dialogue_pairs": _q_dialogue_pairs,
        # round-3 continuation: causal / rank statistics
        "mann_whitney": _q_mann_whitney,
        "qte_text_len": _q_qte_text_len,
        "ipw_ate": _q_ipw_ate,
        # round-3 continuation: forecast-eval / changepoint / tail-fit series
        "seasonal_naive_eval": _q_seasonal_naive_eval,
        "binseg_changepoint": _q_binseg_changepoint,
        "pot_tail_gaps": _q_pot_tail_gaps,
        # round-3 continuation: calibration / uncertainty evaluation
        "temperature_scaling": _q_temperature_scaling,
        "conformal_interval": _q_conformal_interval,
        "pinball_text_len": _q_pinball_text_len,
        # round-3 continuation: sequential / multiple-comparison inference
        "effect_sizes_text_len": _q_effect_sizes,
        "bh_fdr_event_mix": _q_bh_fdr_event_mix,
        "permutation_test_convs": _q_permutation_test,
        "msprt_daily_gap": _q_msprt_daily_gap,
        # round-3 continuation: robust trend / AR diagnostics / agent loops
        "theil_sen_trend": _q_theil_sen_trend,
        "pacf_daily": _q_pacf_daily,
        "tool_retry_chains": _q_tool_retry_chains,
        "bradley_terry_roles": _q_bradley_terry_roles,
        # round-3 continuation: fairness / schema health
        "fairness_by_lang": _q_fairness_by_lang,
        "schema_drift": _q_schema_drift,
        # round-3 continuation: spectral / dedup-eval / curriculum
        "periodogram_daily": _q_periodogram_daily,
        "lsh_recall": _q_lsh_recall,
        "curriculum_order": _q_curriculum_order,
        # round-3 continuation: LM smoothing / event-time ops
        "kn_bigram_logprob": _q_kn_bigram_logprob,
        "watermark_depth": _q_watermark_depth,
        # round-3 continuation: trend forecasting / raw-SQL surface
        "brown_double_daily": _q_brown_double,
        "sql_weekly_role_mix": _q_sql_interface,
        # round-3 continuation: density clustering
        "lsh_dbscan": _q_lsh_dbscan,
        # round-3 continuation: hazard curve, RDD, ops audits
        "nelson_aalen": _q_nelson_aalen,
        "rdd_turns": _q_rdd_turns,
        "freshness_audit": _q_freshness_audit,
        "compaction_plan": _q_compaction_plan,
        # round-3 continuation: spectral / density / media / chars
        "pca_power_eigen": _q_pca_power_eigen,
        "lof_outliers": _q_lof_outliers,
        "video_frame_sample": _q_video_frame_sample,
        "editdist_pairs": _q_editdist_pairs,
        "cdc_chunks": _q_cdc_chunks,
        "pareto_docs": _q_pareto_docs,
        "huber_location": _q_huber_location,
        "hits_suppliers": _q_hits_suppliers,
        "winnow_overlap": _q_winnow_overlap,
        "esd_daily_outliers": _q_esd_daily_outliers,
        "knn_label_agreement": _q_knn_label_agreement,
        "perm_importance": _q_perm_importance,
        "epoch_budget": _q_epoch_budget,
        "quantile_trend": _q_quantile_trend,
        "pmi_top_factor": _q_pmi_top_factor,
        "lsh_modularity": _q_lsh_modularity,
        "ngram_novelty": _q_ngram_novelty,
        "q5_local_supplier_volume": _q_q5_local_supplier_volume,
        "streaming_hopping_rate": _q_streaming_hopping_rate,
        "mmr_rerank": _q_mmr_rerank,
        "deletion_cascade": _q_deletion_cascade,
        "rolling_active_7d": _q_rolling_active,
        "ccf_user_assistant": _q_ccf_roles,
        "mann_kendall_daily": _q_mann_kendall,
        "vocab_richness": _q_vocab_richness,
        "stl_daily": _q_stl_daily,
        "weight_ess": _q_weight_ess,
        "skew_diagnosis": _q_skew_diagnosis,
        "compression_ratio": _q_compression_ratio,
        "granger_roles": _q_granger_roles,
        "holt_linear": _q_holt_linear,
        "kruskal_roles": _q_kruskal_roles,
        "gopher_quality": _q_gopher_quality,
        "circadian_roles": _q_circadian_roles,
        "markov_stationary": _q_markov_stationary,
        "bayes_ab": _q_bayes_ab,
        "dp_role_counts": _q_dp_role_counts,
        "kcore_suppliers": _q_kcore_suppliers,
        "levene_roles": _q_levene_roles,
        "trend_error_rate": _q_trend_error_rate,
        "page_hinkley_daily": _q_page_hinkley_daily,
        "bloom_filter_fpp": _q_bloom_filter_fpp,
        "dispersion_daily": _q_dispersion_daily,
        "simpsons_check": _q_simpsons_check,
        "holt_winters": _q_holt_winters,
        "theil_activity": _q_theil_activity,
        "hhi_sources": _q_hhi_sources,
        "ab_pvalue": _q_ab_pvalue,
        "yuen_text_len": _q_yuen_text_len,
        "spiegelhalter_cal": _q_spiegelhalter,
        "standardized_rates": _q_standardized_rates,
        "join_size_estimate": _q_join_size_estimate,
        "fk_orphans": _q_fk_orphans,
        "rmst_14d": _q_rmst,
        "welch_anova_roles": _q_welch_anova,
        "cvm_text_len": _q_cvm_text_len,
        "ap_by_fold": _q_ap_by_fold,
        "mcnemar_error_shift": _q_mcnemar,
        "fisher_exact_early_error": _q_fisher_exact,
        "turn_contiguity": _q_turn_contiguity,
        "null_patterns": _q_null_patterns,
        "icc_text_len": _q_icc_text_len,
        "tool_trigrams": _q_tool_trigrams,
        "adamic_adar_trades": _q_adamic_adar,
        "bpe_train_merges": _q_bpe_train,
        "ece_adaptive": _q_ece_adaptive,
        "qini_uplift": _q_qini,
        "mrr_lsh": _q_mrr_lsh,
        "cumulative_incidence": _q_cumulative_incidence,
        "hosmer_lemeshow": _q_hosmer_lemeshow,
        "univariate_auc": _q_univariate_auc,
        "silhouette_labels": _q_silhouette,
        "hurst_daily": _q_hurst,
        "bpe_apply_stats": _q_bpe_apply,
        "nb_fit_dow": _q_nb_fit,
        "partition_advisor": _q_partition_advisor,
        "tool_attribution": _q_tool_attribution,
        "stratified_ate_conf": _q_stratified_ate,
        "km_greenwood": _q_km_greenwood,
        "encoding_quality": _q_encoding_quality,
        "lorenz_deciles": _q_lorenz,
        "risk_ratio_tools": _q_risk_ratio,
        "mantel_haenszel_strata": _q_mantel_haenszel,
        "mixture_temperature": _q_mixture_temperature,
        "rake_role_dow": _q_rake,
        "ad_text_len": _q_ad_text_len,
        "label_shift_bbse": _q_label_shift,
        "survival_c_index": _q_c_index,
        "by_fdr_event_mix": _q_by_fdr,
        "threshold_sweep": _q_threshold_sweep,
        "lsh_parameter_plan": _q_lsh_plan,
        "streaming_left_join": _q_streaming_left_join,
        "event_study_weekly": _q_event_study,
        "ks_source_matrix": _q_ks_source_matrix,
        "quality_classifier_fit": _q_quality_classifier_fit,
        "quality_classifier_apply": _q_quality_classifier_apply,
        "streaming_quality_scores": _q_streaming_quality_scores,
        "streaming_full_join": _q_streaming_full_join,
        "dedup_components_star": _q_dedup_components_star,
    }


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

_ASOF_FEATURES_SQL = f"""
WITH {_CONV_CTE},
joined AS (
    SELECT c.conv_id, c.role, c.text, c.tool, c.ts, k.cutoff_ts
    FROM conversations c
    JOIN cutoffs k
      ON c.ts < k.cutoff_ts AND c.ts >= k.cutoff_ts - INTERVAL 7 DAY
),
feats AS (
    SELECT conv_id, cutoff_ts,
        {{conditional_aggs}},
        epoch_us(cutoff_ts) - MAX(epoch_us(ts)) AS micros_since_last_turn
    FROM joined
    GROUP BY conv_id, cutoff_ts
),
grid AS (
    SELECT e.conv_id, k.cutoff_ts
    FROM (SELECT DISTINCT conv_id FROM conversations) e
    CROSS JOIN cutoffs k
)
SELECT g.conv_id, g.cutoff_ts,
    {{final_coalesce}},
    COALESCE(f.micros_since_last_turn, -1) AS micros_since_last_turn
FROM grid g
LEFT JOIN feats f ON g.conv_id = f.conv_id AND g.cutoff_ts = f.cutoff_ts
"""


def _asof_oracle() -> str:
    horizons = (1, 3, 7)
    inside = "ts >= cutoff_ts - INTERVAL {k} DAY"
    families = [
        ("turn_cnt", "COUNT(CASE WHEN {inside} THEN 1 END)", "0"),
        ("user_turn_cnt", "COUNT(CASE WHEN ({inside}) AND role = 'user' THEN 1 END)", "0"),
        ("tool_call_cnt", "COUNT(CASE WHEN {inside} THEN tool END)", "0"),
        ("distinct_tool_cnt", "COUNT(DISTINCT CASE WHEN {inside} THEN tool END)", "0"),
        ("text_len_sum", "CAST(SUM(CASE WHEN {inside} THEN length(text) END) AS BIGINT)", "0"),
        ("text_len_max", "CAST(MAX(CASE WHEN {inside} THEN length(text) END) AS BIGINT)", "0"),
        ("text_len_avg", "ROUND(AVG(CASE WHEN {inside} THEN length(text) END), 4)", "0.0"),
    ]
    aggs, finals = [], []
    for name, tmpl, fill in families:
        for k in horizons:
            col = f"{name}_{k}d"
            aggs.append(tmpl.format(inside=inside.format(k=k)) + f" AS {col}")
            finals.append(f"COALESCE(f.{col}, {fill}) AS {col}")
    return _ASOF_FEATURES_SQL.format(
        conditional_aggs=",\n        ".join(aggs),
        final_coalesce=",\n    ".join(finals),
    )


_SESSIONIZE_SQL = f"""
WITH {_CONV_CTE},
flagged AS (
    SELECT conv_id, role, text, ts, turn_idx,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                THEN 1 ELSE 0 END AS ns
    FROM conversations
    WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx)
),
sess AS (
    SELECT *, CAST(SUM(ns) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx
                                 ROWS UNBOUNDED PRECEDING) - 1 AS INTEGER) AS session_id
    FROM flagged
)
SELECT conv_id, session_id,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       COUNT(*) AS n_turns,
       CAST(SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT) AS n_user_turns,
       CAST(SUM(length(text)) AS BIGINT) AS text_len_sum,
       MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS duration_micros
FROM sess GROUP BY conv_id, session_id
"""

_LAG_LEAD_SQL = f"""
WITH {_CONV_CTE}
SELECT conv_id, turn_idx,
       CAST(length(text) AS BIGINT) AS text_len,
       COALESCE(lag(CAST(length(text) AS BIGINT), 1) OVER w, -1) AS prev_text_len_1,
       COALESCE(lead(CAST(length(text) AS BIGINT), 1) OVER w, -1) AS next_text_len_1,
       COALESCE(epoch_us(ts) - epoch_us(lag(ts, 1) OVER w), -1) AS gap_micros_prev,
       CASE WHEN lag(role, 1) OVER w IS NULL THEN -1
            WHEN lag(role, 1) OVER w = role THEN 1 ELSE 0 END AS same_role_as_prev
FROM conversations
WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx)
"""

_TURN_LABELS_SQL = f"""
WITH {_CONV_CTE}
SELECT conv_id, turn_idx,
       COALESCE(
         MIN(CASE WHEN role = 'user' THEN epoch_us(ts) END) OVER
           (PARTITION BY conv_id ORDER BY ts, turn_idx
            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
         - epoch_us(ts), -1) AS micros_to_next_qualifying
FROM conversations
"""

_ENTITY_LABELS_SQL = f"""
WITH {_CONV_CTE},
future AS (
    SELECT c.conv_id, k.cutoff_ts, MIN(epoch_us(c.ts)) AS next_us
    FROM conversations c
    JOIN cutoffs k
      ON c.ts > k.cutoff_ts AND c.ts <= k.cutoff_ts + INTERVAL 3 DAY
    WHERE c.role = 'user'
    GROUP BY c.conv_id, k.cutoff_ts
),
grid AS (
    SELECT e.conv_id, k.cutoff_ts
    FROM (SELECT DISTINCT conv_id FROM conversations) e CROSS JOIN cutoffs k
)
SELECT g.conv_id, g.cutoff_ts,
       CASE WHEN f.next_us IS NULL THEN 1 ELSE 0 END AS is_churn,
       COALESCE(f.next_us - epoch_us(g.cutoff_ts), -1) AS micros_to_next_qualifying
FROM grid g LEFT JOIN future f
  ON g.conv_id = f.conv_id AND g.cutoff_ts = f.cutoff_ts
"""

_HISTORY_LAGS_SQL = f"""
WITH {_CONV_CTE},
act AS (
    SELECT conv_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS week_start,
           COUNT(*) AS turn_cnt,
           CAST(SUM(length(text)) AS BIGINT) AS text_len_sum
    FROM conversations GROUP BY 1, 2
),
grid AS (
    SELECT e.conv_id, w.week_start
    FROM (SELECT DISTINCT conv_id FROM conversations) e
    CROSS JOIN (SELECT DISTINCT week_start FROM act) w
),
dense AS (
    SELECT g.conv_id, g.week_start,
           COALESCE(a.turn_cnt, 0) AS turn_cnt,
           COALESCE(a.text_len_sum, 0) AS text_len_sum,
           CAST(floor(epoch_us(g.week_start) / {7 * 86400 * 1_000_000}) AS BIGINT) AS week_no
    FROM grid g LEFT JOIN act a
      ON g.conv_id = a.conv_id AND g.week_start = a.week_start
)
SELECT conv_id, week_start, turn_cnt, text_len_sum,
       COALESCE(lag(turn_cnt, 1) OVER w, -1) AS turn_cnt_w1,
       COALESCE(lag(turn_cnt, 2) OVER w, -1) AS turn_cnt_w2,
       COALESCE(week_no - MAX(CASE WHEN turn_cnt > 0 THEN week_no END) OVER
                   (PARTITION BY conv_id ORDER BY week_start ROWS UNBOUNDED PRECEDING),
                 -1) AS weeks_since_last_active
FROM dense
WINDOW w AS (PARTITION BY conv_id ORDER BY week_start)
"""

_PSI_TEXT_LEN_SQL = f"""
WITH {_CONV_CTE},
binned AS (
    SELECT CASE WHEN CAST(floor(epoch_us(CAST(date_trunc('week', ts) AS TIMESTAMP))
                            / {7 * 86400 * 1_000_000}) AS BIGINT) % 2 = 0
                THEN 'even' ELSE 'odd' END AS fold,
           CAST(LEAST(GREATEST(floor(CAST(length(text) AS BIGINT) / 5.0), 0), 9) AS INTEGER) AS bin
    FROM conversations
),
counts AS (SELECT fold, bin, COUNT(*) AS n FROM binned GROUP BY 1, 2),
freqs AS (
    SELECT fold, bin, CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY fold) AS freq
    FROM counts
),
grid AS (
    SELECT f.fold, b.bin
    FROM (SELECT DISTINCT fold FROM counts WHERE fold <> 'even') f
    CROSS JOIN (SELECT DISTINCT bin FROM counts) b
),
terms AS (
    SELECT g.fold,
           GREATEST(COALESCE(c.freq, 0.0), 1e-6) AS a,
           GREATEST(COALESCE(r.freq, 0.0), 1e-6) AS e
    FROM grid g
    LEFT JOIN (SELECT * FROM freqs WHERE fold <> 'even') c
      ON g.fold = c.fold AND g.bin = c.bin
    LEFT JOIN (SELECT bin, freq FROM freqs WHERE fold = 'even') r
      ON g.bin = r.bin
)
SELECT fold, ROUND(SUM((a - e) * ln(a / e)), 6) AS psi
FROM terms GROUP BY fold
"""

# daily-series autocorrelation (lock-step with _q_daily_autocorr:
# UTC day index, lag-1 and lag-7 Pearson r over the daily counts)
_DAILY_AUTOCORR_SQL = f"""
WITH {_CONV_CTE},
daily AS (
    SELECT CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day_idx,
           CAST(COUNT(*) AS DOUBLE) AS n
    FROM conversations GROUP BY 1
),
l1 AS (
    SELECT n, lag(n, 1) OVER (ORDER BY day_idx) AS prev FROM daily
),
l7 AS (
    SELECT n, lag(n, 7) OVER (ORDER BY day_idx) AS prev FROM daily
)
SELECT 1 AS lag, ROUND(corr(n, prev), 6) AS pearson_r,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM l1 WHERE prev IS NOT NULL
UNION ALL
SELECT 7, ROUND(corr(n, prev), 6), CAST(COUNT(*) AS BIGINT)
FROM l7 WHERE prev IS NOT NULL
"""

# conditional entropy over the transition table (lock-step with
# lags.conditional_entropy: p(to|from) then −Σ p·ln p per from-state)
_ROLE_ENTROPY_SQL = f"""
WITH {_CONV_CTE},
pairs AS (
    SELECT lag(role) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx)
               AS from_state,
           role AS to_state
    FROM conversations
),
counts AS (
    SELECT from_state, to_state, COUNT(*) AS n
    FROM pairs WHERE from_state IS NOT NULL
    GROUP BY from_state, to_state
),
probs AS (
    SELECT from_state, n,
           CAST(n / SUM(n) OVER (PARTITION BY from_state) AS DOUBLE) AS p_cond
    FROM counts
)
SELECT from_state, CAST(SUM(n) AS BIGINT) AS n_from,
       ROUND(-SUM(p_cond * ln(p_cond)), 6) AS h_cond_nats
FROM probs GROUP BY from_state
"""

# robust median/MAD outliers (lock-step with winsorize.mad_outliers:
# quantile_cont == Spark percentile; threshold 3·1.4826·MAD; zero-MAD
# groups flag any deviation from the median)
_MAD_SQL = f"""
WITH {_CONV_CTE},
t AS (
    SELECT conv_id, CAST(length(text) AS BIGINT) AS text_len FROM conversations
),
med AS (
    SELECT conv_id, quantile_cont(text_len, 0.5) AS med FROM t GROUP BY conv_id
),
wm AS (SELECT t.conv_id, text_len, med FROM t JOIN med USING (conv_id)),
mad AS (
    SELECT conv_id, quantile_cont(abs(text_len - med), 0.5) AS mad
    FROM wm GROUP BY conv_id
)
SELECT wm.conv_id, text_len,
       ROUND(med, 6) AS group_median,
       ROUND(mad, 6) AS group_mad,
       CAST(CASE WHEN mad > 0
                 THEN abs(text_len - med) > 3.0e0 * 1.4826e0 * mad
                 ELSE abs(text_len - med) > 0 END AS INTEGER) AS is_outlier
FROM wm JOIN mad USING (conv_id)
"""

# Gini concentration (lock-step with rhythm.gini_concentration: the
# oracle groups to the same distinct-value table so the double sums
# see the same ~|distinct| addends)
_GINI_SQL = f"""
WITH {_CONV_CTE},
per_conv AS (
    SELECT conv_id, COUNT(*) AS n_turns FROM conversations GROUP BY conv_id
),
vals AS (SELECT n_turns, COUNT(*) AS cnt FROM per_conv GROUP BY n_turns),
ranked AS (
    SELECT n_turns, cnt,
           SUM(cnt) OVER (ORDER BY n_turns ROWS UNBOUNDED PRECEDING) - cnt
               AS before
    FROM vals
)
SELECT ROUND(
         2.0e0 * SUM((before + (cnt + 1) / 2.0e0)
                     * CAST(n_turns AS DOUBLE) * cnt)
         / (SUM(cnt) * SUM(CAST(n_turns AS DOUBLE) * cnt))
         - (SUM(cnt) + 1) / CAST(SUM(cnt) AS DOUBLE),
         6) AS gini,
       CAST(SUM(cnt) AS BIGINT) AS n
FROM ranked
"""

# Neyman allocation (lock-step with sampling.neyman_allocation:
# weight N_h·σ_h with σ=1 fallback, floor allocation capped at N_h)
_NEYMAN_SQL = """
WITH strata AS (
    SELECT CAST(floor(CAST(length(text) AS BIGINT) / 50.0) AS BIGINT) AS len_band,
           CAST(length(text) AS DOUBLE) AS v
    FROM documents
),
stats AS (
    SELECT len_band, COUNT(*) AS n_rows,
           COALESCE(stddev_samp(v), 0.0e0) AS sd
    FROM strata GROUP BY len_band
),
w AS (
    SELECT len_band, n_rows, sd,
           n_rows * (CASE WHEN sd > 0 THEN sd ELSE 1.0e0 END) AS wt
    FROM stats
),
tw AS (SELECT SUM(wt) AS t FROM w)
SELECT len_band, n_rows, ROUND(sd, 6) AS stddev,
       CAST(LEAST(CAST(floor(100 * wt / t) AS BIGINT), n_rows) AS BIGINT) AS alloc
FROM w CROSS JOIN tw
"""

# CDC latest-state (lock-step with scd.apply_cdc: latest row per key
# by (ts, event_id), keys whose final op is the tombstone drop)
_CDC_SQL = """
WITH ch AS (
    SELECT user_id,
           CASE event_type WHEN 'signup' THEN 'I'
                           WHEN 'error' THEN 'D'
                           ELSE 'U' END AS op,
           value, ts, event_id
    FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts DESC, event_id DESC) AS rn
    FROM ch
)
SELECT user_id, value, ts, event_id
FROM ranked WHERE rn = 1 AND op <> 'D'
"""

# marker segmentation (lock-step with sessionize.segment_by_marker:
# running sum of system-turn flags minus the first row's flag)
_EPISODE_SQL = f"""
WITH {_CONV_CTE},
flagged AS (
    SELECT conv_id, turn_idx, ts,
           CASE WHEN role = 'system' THEN 1 ELSE 0 END AS f
    FROM conversations
),
marked AS (
    SELECT conv_id, ts,
           CAST(SUM(f) OVER w - FIRST_VALUE(f) OVER w AS INTEGER) AS episode_id
    FROM flagged
    WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx
                 ROWS UNBOUNDED PRECEDING)
)
SELECT conv_id, episode_id, COUNT(*) AS n_turns,
       MIN(ts) AS ep_start, MAX(ts) AS ep_end
FROM marked GROUP BY conv_id, episode_id
"""

# binned 1-Wasserstein drift (lock-step with psi.wasserstein_from_bins:
# same even/odd folds + width-5 bins as psi_text_len; W1 = sum|ΔCDF|·5)
_WASSERSTEIN_SQL = f"""
WITH {_CONV_CTE},
binned AS (
    SELECT CASE WHEN CAST(floor(epoch_us(CAST(date_trunc('week', ts) AS TIMESTAMP))
                            / {7 * 86400 * 1_000_000}) AS BIGINT) % 2 = 0
                THEN 'even' ELSE 'odd' END AS fold,
           CAST(LEAST(GREATEST(floor(CAST(length(text) AS BIGINT) / 5.0), 0), 9) AS INTEGER) AS bin
    FROM conversations
),
counts AS (SELECT fold, bin, COUNT(*) AS n FROM binned GROUP BY 1, 2),
grid AS (
    SELECT f.fold, CAST(b.bin AS INTEGER) AS bin
    FROM (SELECT DISTINCT fold FROM counts) f
    CROSS JOIN (SELECT unnest(generate_series(
                    (SELECT MIN(bin) FROM counts),
                    (SELECT MAX(bin) FROM counts))) AS bin) b
),
full_g AS (
    SELECT g.fold, g.bin, COALESCE(c.n, 0) AS n
    FROM grid g LEFT JOIN counts c ON g.fold = c.fold AND g.bin = c.bin
),
cdf AS (
    SELECT fold, bin,
           SUM(n) OVER (PARTITION BY fold ORDER BY bin
                        ROWS UNBOUNDED PRECEDING)
           / SUM(n) OVER (PARTITION BY fold) AS cdf
    FROM full_g
)
SELECT c.fold, ROUND(SUM(ABS(c.cdf - r.cdf)) * 5.0e0, 6) AS wasserstein
FROM cdf c JOIN (SELECT bin, cdf FROM cdf WHERE fold = 'even') r USING (bin)
WHERE c.fold <> 'even'
GROUP BY c.fold
"""

# JSD drift (lock-step with operators/psi.py jsd_from_bins: same
# fold/bin stream as the PSI/Wasserstein gates, observed-bins grid,
# 0·log2(0/m)=0 convention, log base 2, round 6).
_JSD_SQL = f"""
WITH {_CONV_CTE},
binned AS (
    SELECT CASE WHEN CAST(floor(epoch_us(CAST(date_trunc('week', ts) AS TIMESTAMP))
                            / {7 * 86400 * 1_000_000}) AS BIGINT) % 2 = 0
                THEN 'even' ELSE 'odd' END AS fold,
           CAST(LEAST(GREATEST(floor(CAST(length(text) AS BIGINT) / 5.0), 0), 9) AS INTEGER) AS bin
    FROM conversations
),
counts AS (SELECT fold, bin, COUNT(*) AS n FROM binned GROUP BY 1, 2),
freqs AS (
    SELECT fold, bin, n * 1.0 / SUM(n) OVER (PARTITION BY fold) AS freq
    FROM counts
),
grid AS (
    SELECT f.fold, b.bin
    FROM (SELECT DISTINCT fold FROM counts WHERE fold <> 'even') f
    CROSS JOIN (SELECT DISTINCT bin FROM counts) b
),
j AS (
    SELECT g.fold,
           COALESCE(c.freq, 0.0) AS p,
           COALESCE(r.freq, 0.0) AS q
    FROM grid g
    LEFT JOIN (SELECT fold, bin, freq FROM freqs WHERE fold <> 'even') c
      ON g.fold = c.fold AND g.bin = c.bin
    LEFT JOIN (SELECT bin, freq FROM freqs WHERE fold = 'even') r
      ON g.bin = r.bin
)
SELECT fold,
       ROUND(SUM(
           CASE WHEN p > 0 THEN p * log2(p / ((p + q) / 2.0)) ELSE 0.0 END
         + CASE WHEN q > 0 THEN q * log2(q / ((p + q) / 2.0)) ELSE 0.0 END
       ) / 2.0, 6) AS jsd
FROM j GROUP BY fold
"""

_LEAKAGE_AUDIT_SQL = f"""
WITH {_CONV_CTE},
joined AS (
    SELECT c.ts, k.cutoff_ts
    FROM conversations c
    JOIN cutoffs k
      ON c.ts < k.cutoff_ts AND c.ts >= k.cutoff_ts - INTERVAL 7 DAY
)
SELECT cutoff_ts,
       CAST(SUM(CASE WHEN ts >= cutoff_ts THEN 1 ELSE 0 END) AS BIGINT) AS violation_cnt,
       COUNT(*) AS contributing_rows
FROM joined GROUP BY cutoff_ts
"""


# --- documents/embeddings oracles ------------------------------------------
# normalized text + whitespace tokens (lock-step with functions/text.py)
_NORM = "lower(trim(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')))"
# empty-text guard: Spark's tokens('') is [] while DuckDB's
# string_split('', ' ') is [''] — the CASE keeps the two engines
# lock-step on blank/whitespace-only documents (fuzz-parity finding;
# identical on every non-blank doc)
_TOKS = f"(CASE WHEN {_NORM} = '' THEN [] ELSE string_split({_NORM}, ' ') END)"
# TRY_CAST: md5(NULL) is NULL and DuckDB's concat treats NULL as ''
# -> '0x' which a plain CAST refuses; TRY_CAST yields NULL, matching
# Spark's stable_hash48(NULL) = NULL (fuzz finding on NULL text)
_H48 = "TRY_CAST(concat('0x', substr(md5({x}),1,12)) AS BIGINT)"
_SHINGLES = (
    "list_distinct(list_transform("
    "generate_series(1, greatest(len({toks}) - {nm1}, 0)), "
    "i -> array_to_string(({toks})[i:i+{nm1}], ' ')))"
)


def _shingle_cte(n: int) -> str:
    sh = _SHINGLES.format(toks=_TOKS, nm1=n - 1)
    return f"""
sh AS (
    SELECT doc_id, unnest({sh}) AS shingle FROM documents
)"""


_DEDUP_EXACT_SQL = f"""
WITH keyed AS (
    SELECT doc_id, CASE WHEN text IS NULL THEN NULL
                ELSE COALESCE(array_to_string(({_TOKS})[1:5], ' '), '') END AS k FROM documents
),
groups AS (
    SELECT k, MIN(doc_id) AS canonical_id, COUNT(*) AS group_size
    FROM keyed GROUP BY k
)
SELECT d.doc_id, g.canonical_id, g.group_size,
       CAST(d.doc_id = g.canonical_id AS INTEGER) AS is_canonical
FROM keyed d JOIN groups g USING (k)
"""

_DEDUP_NGRAM_JACCARD_SQL = f"""
WITH {_shingle_cte(3)},
shh0 AS (
    SELECT doc_id, {_H48.format(x='shingle')} AS shingle FROM sh
),
-- hot-shingle cap (lock-step with ngram_jaccard_pairs
-- max_shingle_freq=100): sizes AND intersections both computed on the
-- capped stream, so Jaccard stays a true ratio of the capped sets
shh AS (
    SELECT doc_id, shingle FROM shh0
    WHERE shingle IN (SELECT shingle FROM shh0 GROUP BY shingle HAVING COUNT(*) <= 100)
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shh GROUP BY doc_id),
common AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
    FROM shh a JOIN shh b USING (shingle)
    WHERE a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ROUND(n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
FROM common
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE ROUND(n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common), 6) >= 0.3
"""

# containment: same capped shingle-hash join as Jaccard, asymmetric
# |A∩B|/|A| scoring (lock-step with containment_pairs threshold=0.5,
# max_shingle_freq=100)
_DEDUP_CONTAINMENT_SQL = f"""
WITH {_shingle_cte(3)},
shh0 AS (
    SELECT doc_id, {_H48.format(x='shingle')} AS shingle FROM sh
),
shh AS (
    SELECT doc_id, shingle FROM shh0
    WHERE shingle IN (SELECT shingle FROM shh0 GROUP BY shingle HAVING COUNT(*) <= 100)
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shh GROUP BY doc_id),
common AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
    FROM shh a JOIN shh b USING (shingle)
    WHERE a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b, CAST(n_common AS BIGINT) AS n_common,
       ROUND(n_common * 1.0 / sa.n_sh, 6) AS containment_a_in_b,
       ROUND(n_common * 1.0 / sb.n_sh, 6) AS containment_b_in_a
FROM common
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE greatest(ROUND(n_common * 1.0 / sa.n_sh, 6),
               ROUND(n_common * 1.0 / sb.n_sh, 6)) >= 0.5
"""

_MINHASH_SQL = f"""
WITH {_shingle_cte(3)},
h AS (
    SELECT doc_id, CAST(i.i AS INTEGER) AS i, {_H48.format(x='shingle')} AS h48
    FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS i) i
)
SELECT doc_id, i,
       MIN((CAST(2*i+3 AS BIGINT) * h48 + CAST(5*i+7 AS BIGINT)) % 2305843009213693951) AS mh
FROM h GROUP BY doc_id, i
"""

_SIMHASH_SQL = f"""
WITH tok AS (
    SELECT doc_id, unnest(list_distinct({_TOKS})) AS tok FROM documents
),
votes AS (
    SELECT doc_id, CAST(b.b AS INTEGER) AS b,
           (({_H48.format(x='tok')} >> CAST(b.b AS INTEGER)) & 1) * 2 - 1 AS vote
    FROM tok CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS b) b
    WHERE tok <> ''
),
bits AS (SELECT doc_id, b, SUM(vote) AS s FROM votes GROUP BY doc_id, b)
SELECT doc_id,
       CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
FROM bits GROUP BY doc_id
"""

_COS = (
    "list_dot_product(CAST(qe AS DOUBLE[]), CAST(ne AS DOUBLE[])) / "
    "(sqrt(list_dot_product(CAST(qe AS DOUBLE[]), CAST(qe AS DOUBLE[]))) * "
    "sqrt(list_dot_product(CAST(ne AS DOUBLE[]), CAST(ne AS DOUBLE[]))))"
)

_EMB_TOPK_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
v AS (SELECT vec_id AS neighbor_id, embedding AS ne FROM embeddings),
scored AS (
    SELECT query_id, neighbor_id, ROUND({_COS}, 6) AS cosine
    FROM q, v WHERE neighbor_id <> query_id
),
ranked AS (
    SELECT *, CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5
"""

_BUCKET = (
    "(CASE WHEN {e}[1] > 0 THEN 1 ELSE 0 END + CASE WHEN {e}[2] > 0 THEN 2 ELSE 0 END"
    " + CASE WHEN {e}[3] > 0 THEN 4 ELSE 0 END + CASE WHEN {e}[4] > 0 THEN 8 ELSE 0 END)"
)

_EMB_TOPK_LSH_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe,
                  {_BUCKET.format(e='embedding')} AS bucket
           FROM embeddings WHERE vec_id < 10),
v AS (SELECT vec_id AS neighbor_id, embedding AS ne,
             {_BUCKET.format(e='embedding')} AS bucket
      FROM embeddings),
scored AS (
    SELECT query_id, neighbor_id, ROUND({_COS}, 6) AS cosine
    FROM q JOIN v USING (bucket) WHERE neighbor_id <> query_id
),
ranked AS (
    SELECT *, CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5
"""

# ANN recall@5 (lock-step with similarity.recall_at_k over the same
# LSH-vs-brute pair the two topk gates verify individually)
_ANN_RECALL_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
v AS (SELECT vec_id AS neighbor_id, embedding AS ne FROM embeddings),
ex_scored AS (
    SELECT query_id, neighbor_id, ROUND({_COS}, 6) AS cosine
    FROM q, v WHERE neighbor_id <> query_id
),
ex_ranked AS (
    SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id ASC) AS rank
    FROM ex_scored
),
exact AS (SELECT query_id, neighbor_id FROM ex_ranked WHERE rank <= 5),
qb AS (SELECT vec_id AS query_id, embedding AS qe,
              {_BUCKET.format(e='embedding')} AS bucket
       FROM embeddings WHERE vec_id < 10),
vb AS (SELECT vec_id AS neighbor_id, embedding AS ne,
              {_BUCKET.format(e='embedding')} AS bucket
       FROM embeddings),
ap_scored AS (
    SELECT query_id, neighbor_id, ROUND({_COS}, 6) AS cosine
    FROM qb JOIN vb USING (bucket) WHERE neighbor_id <> query_id
),
ap_ranked AS (
    SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id ASC) AS rank
    FROM ap_scored
),
approx AS (SELECT query_id, neighbor_id FROM ap_ranked WHERE rank <= 5),
hits AS (
    SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_hit
    FROM approx JOIN exact USING (query_id, neighbor_id) GROUP BY query_id
),
denom AS (
    SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact
    FROM exact GROUP BY query_id
)
SELECT d.query_id, d.n_exact, CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
       ROUND(COALESCE(h.n_hit, 0) * 1.0 / d.n_exact, 6) AS recall
FROM denom d LEFT JOIN hits h USING (query_id)
"""

_PROFILES = {
    "en": "['the','a','of','and','to','in','is']",
    "de": "['der','die','das','und','ist','ein']",
    "es": "['el','la','de','que','y','es','un']",
    "fr": "['le','la','de','et','est','un','une']",
}
# token count of RAW text, lock-step with functions.text.tokens():
# collapse-then-trim canonicalization (the round-4 fuzz finding —
# space-only trim leaves tab/newline edges, producing phantom ''
# tokens and count 2 for whitespace-only text on BOTH engines until
# the engine's tokens() was fixed), then a blank guard (DuckDB splits
# '' into [''] where tokens('') is [])
_CANON_WS = "trim(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))"
_NTOK_RAW = (
    f"(CASE WHEN {_CANON_WS} = '' THEN 0 "
    f"ELSE len(string_split({_CANON_WS}, ' ')) END)"
)


def _lang_id_oracle() -> str:
    scores = ",\n       ".join(
        f"ROUND(len(list_filter({_TOKS}, t -> list_contains({lst}, t))) * 1.0 / "
        f"greatest({_NTOK_RAW}, 1), 6) AS score_{lang}"
        for lang, lst in _PROFILES.items()
    )
    # argmax with sorted-name tiebreak (lock-step with textstats.lang_id)
    langs = sorted(_PROFILES)
    best = f"'{langs[0]}'"
    seen = [f"score_{langs[0]}"]
    for lang in langs[1:]:
        prev_max = "greatest(" + ", ".join(seen) + ")" if len(seen) > 1 else seen[0]
        best = f"CASE WHEN score_{lang} > {prev_max} THEN '{lang}' ELSE {best} END"
        seen.append(f"score_{lang}")
    all_max = "greatest(" + ", ".join(seen) + ")"
    cols = ", ".join(f"score_{lang}" for lang in _PROFILES)
    return f"""
WITH scored AS (
    SELECT doc_id,
       {scores}
    FROM documents
)
SELECT doc_id, {cols},
       CASE WHEN {all_max} > 0 THEN {best} ELSE 'und' END AS pred_lang
FROM scored
"""


def _fertility_oracle() -> str:
    """Tokenizer-fertility SQL (lock-step with textstats.
    tokenizer_fertility: the SAME per-language scores + argmax
    tiebreak as the lang_id oracle, strlen() UTF-8 bytes, exact
    BIGINT sums per slice, one double division per ratio)."""
    scores = ",\n       ".join(
        f"ROUND(len(list_filter({_TOKS}, t -> list_contains({lst}, t))) * 1.0 / "
        f"greatest({_NTOK_RAW}, 1), 6) AS score_{lang}"
        for lang, lst in _PROFILES.items()
    )
    langs = sorted(_PROFILES)
    best = f"'{langs[0]}'"
    seen = [f"score_{langs[0]}"]
    for lang in langs[1:]:
        prev_max = "greatest(" + ", ".join(seen) + ")" if len(seen) > 1 else seen[0]
        best = f"CASE WHEN score_{lang} > {prev_max} THEN '{lang}' ELSE {best} END"
        seen.append(f"score_{lang}")
    all_max = "greatest(" + ", ".join(seen) + ")"
    return f"""
WITH scored AS (
    SELECT strlen(text) AS _bytes,
           length(text) AS _chars,
           len(regexp_extract_all({_NORM}, '[a-z]{{1,4}}|[0-9]+|[^a-z0-9 \\t\\n\\x0B\\f\\r]')) AS _bpe,
           {_NTOK_RAW} AS _words,
       {scores}
    FROM documents
),
tagged AS (
    SELECT CASE WHEN {all_max} > 0 THEN {best} ELSE 'und' END AS lang,
           _bytes, _chars, _bpe, _words
    FROM scored
),
per AS (
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(_bytes) AS BIGINT) AS n_bytes,
           CAST(SUM(_chars) AS BIGINT) AS n_chars,
           CAST(SUM(_bpe) AS BIGINT) AS n_tokens,
           CAST(SUM(_words) AS BIGINT) AS n_words
    FROM tagged GROUP BY lang
)
SELECT lang, n_docs, n_bytes, n_chars, n_tokens, n_words,
       ROUND(CASE WHEN n_tokens > 0
                  THEN CAST(n_bytes AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                  ELSE 0.0 END, 6) AS bytes_per_token,
       ROUND(CASE WHEN n_tokens > 0
                  THEN CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                  ELSE 0.0 END, 6) AS chars_per_token,
       ROUND(CASE WHEN n_words > 0
                  THEN CAST(n_tokens AS DOUBLE) / CAST(n_words AS DOUBLE)
                  ELSE 0.0 END, 6) AS tokens_per_word
FROM per
"""


_TEXT_QUALITY_SQL = f"""
WITH base AS (
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_calc,
           CAST({_NTOK_RAW} AS BIGINT) AS n_tokens,
           ROUND(length(replace({_NORM}, ' ', '')) * 1.0
                 / greatest({_NTOK_RAW}, 1), 6) AS mean_word_len,
           ROUND(length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) * 1.0
                 / greatest(length(text), 1), 6) AS punct_ratio,
           ROUND(len(list_filter({_TOKS}, t -> list_contains({_PROFILES['en']}, t))) * 1.0
                 / greatest({_NTOK_RAW}, 1), 6) AS stopword_ratio
    FROM documents
)
SELECT doc_id, n_chars_calc, n_tokens, mean_word_len, punct_ratio, stopword_ratio,
       ROUND(((CASE WHEN n_tokens BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END)
            + (CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.0 END)
            + (CASE WHEN mean_word_len BETWEEN 2 AND 12 THEN 1.0 ELSE 0.0 END)) / 3.0,
             6) AS quality_score
FROM base
"""

_TOKEN_BUDGET_SQL = f"""
WITH base AS (
    SELECT doc_id, source,
           CAST({_NTOK_RAW} AS BIGINT) AS n_tokens,
           ROUND(length(replace({_NORM}, ' ', '')) * 1.0
                 / greatest({_NTOK_RAW}, 1), 6) AS mean_word_len,
           ROUND(length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) * 1.0
                 / greatest(length(text), 1), 6) AS punct_ratio
    FROM documents
),
scored AS (
    SELECT doc_id, source, n_tokens,
           ROUND(((CASE WHEN n_tokens BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END)
                + (CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.0 END)
                + (CASE WHEN mean_word_len BETWEEN 2 AND 12 THEN 1.0 ELSE 0.0 END)) / 3.0,
                 6) AS quality_score
    FROM base
),
cum AS (
    SELECT source, doc_id, quality_score, n_tokens,
           CAST(SUM(n_tokens) OVER (PARTITION BY source
                ORDER BY quality_score DESC, doc_id ASC
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
    FROM scored
)
SELECT doc_id, source, n_tokens, quality_score, cum_tokens
FROM cum WHERE cum_tokens - n_tokens < 600
"""

# duplicate-aware split (lock-step with sampling.cluster_safe_split over
# exact_dedup's canonical ids: same 'split:' coin, thr=round(0.2·2^20))
_CLUSTER_SPLIT_SQL = f"""
WITH keyed AS (
    SELECT doc_id, CASE WHEN text IS NULL THEN NULL
                ELSE COALESCE(array_to_string(({_TOKS})[1:5], ' '), '') END AS k FROM documents
),
groups AS (
    SELECT k, MIN(doc_id) AS canonical_id FROM keyed GROUP BY k
),
assigned AS (
    SELECT d.doc_id, g.canonical_id FROM keyed d JOIN groups g USING (k)
)
SELECT doc_id, canonical_id,
       CASE WHEN ({_H48.format(x="concat('split:', CAST(canonical_id AS VARCHAR))")}) % 1048576
                 < 209715
            THEN 'val' ELSE 'train' END AS split
FROM assigned
"""

# distribution matching (lock-step with sampling.distribution_match_sample:
# same bin clamp, same rate expression SHAPES — (n·1.0/total), c=MIN(src/t),
# rate=(c·t)/src, FLOOR(rate·2^20) — so thresholds agree bit-for-bit; same
# 'match:' hash coin as the stratified sampler)
_MATCH_TOKEN_DIST_SQL = f"""
WITH toks AS (
    SELECT doc_id, source, CAST({_NTOK_RAW} AS BIGINT) AS n_tokens
    FROM documents
),
binned AS (
    SELECT *, CAST(GREATEST(LEAST(FLOOR(n_tokens / 16.0), 7), 0) AS INTEGER) AS bin
    FROM toks
),
counts AS (
    SELECT bin, COUNT(*) AS n FROM binned GROUP BY bin
),
tot AS (SELECT SUM(n) * 1.0 AS total FROM counts),
rates AS (
    SELECT bin, (n * 1.0 / total) AS src FROM counts, tot
),
cmin AS (SELECT MIN(src / 0.125) AS c FROM rates),
thr AS (
    SELECT bin, CAST(FLOOR((c * 0.125 / src) * 1048576) AS BIGINT) AS threshold
    FROM rates, cmin
)
SELECT b.doc_id, b.source, b.n_tokens, b.bin
FROM binned b JOIN thr USING (bin)
WHERE ({_H48.format(x="concat('match:', CAST(doc_id AS VARCHAR))")}) % 1048576
      < threshold
"""

_TOKEN_STATS_SQL = f"""
SELECT doc_id,
       CAST({_NTOK_RAW} AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all({_NORM}, '[a-z]{{1,4}}|[0-9]+|[^a-z0-9 \\t\\n\\x0B\\f\\r]')) AS BIGINT)
           AS n_bpe_ish_tokens
FROM documents
"""

_FINGERPRINT_SQL = f"""
SELECT doc_id,
       {_H48.format(x=_NORM)} AS doc_hash48,
       COALESCE(list_min(list_transform(
           {_SHINGLES.format(toks=_TOKS, nm1=4)},
           s -> {_H48.format(x='s')})), -1) AS min_shingle_hash48
FROM documents
"""


_MODE_TOOL_SQL = f"""
WITH {_CONV_CTE},
counts AS (
    SELECT conv_id, tool, COUNT(*) AS cnt
    FROM conversations WHERE tool IS NOT NULL
    GROUP BY conv_id, tool
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY conv_id
              ORDER BY cnt DESC, tool ASC) AS rn
    FROM counts
)
SELECT conv_id, tool AS mode_tool, cnt AS mode_tool_cnt
FROM ranked WHERE rn = 1
"""

_LAST_ROLE_SQL = f"""
WITH {_CONV_CTE},
joined AS (
    SELECT c.conv_id, c.role, c.ts, c.turn_idx, k.cutoff_ts
    FROM conversations c JOIN cutoffs k ON c.ts < k.cutoff_ts
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY conv_id, cutoff_ts
              ORDER BY ts DESC, turn_idx DESC) AS rn
    FROM joined
)
SELECT conv_id, cutoff_ts, role AS last_role FROM ranked WHERE rn = 1
"""

_DAILY_ENGAGEMENT_SQL = f"""
WITH {_CONV_CTE}
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       COUNT(*) AS n_turns,
       COUNT(DISTINCT conv_id) AS n_active_convs,
       CAST(SUM(length(text)) AS BIGINT) AS text_len_sum
FROM conversations GROUP BY 1
"""

_SESSION_PERCENTILES_SQL = f"""
WITH {_CONV_CTE},
flagged AS (
    SELECT conv_id, ts, turn_idx,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                THEN 1 ELSE 0 END AS ns
    FROM conversations
    WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx)
),
sess AS (
    SELECT conv_id, SUM(ns) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx
                                  ROWS UNBOUNDED PRECEDING) AS session_id
    FROM flagged
),
aggs AS (SELECT conv_id, session_id, COUNT(*) AS n_turns FROM sess GROUP BY 1, 2)
SELECT ROUND(quantile_cont(n_turns, 0.5), 6) AS median_session_turns,
       ROUND(quantile_cont(n_turns, 0.9), 6) AS p90_session_turns,
       COUNT(*) AS n_sessions
FROM aggs
"""

_TOPK_BUSIEST_SQL = f"""
WITH {_CONV_CTE}
SELECT conv_id, COUNT(*) AS n_turns
FROM conversations GROUP BY conv_id
ORDER BY n_turns DESC, conv_id ASC LIMIT 10
"""

_SEMI_JOIN_SQL = f"""
WITH {_CONV_CTE}
SELECT DISTINCT conv_id FROM conversations
WHERE conv_id IN (SELECT conv_id FROM conversations WHERE tool IS NOT NULL)
"""

_PIVOT_ROLE_SQL = f"""
WITH {_CONV_CTE}
SELECT conv_id,
       CAST(COUNT(CASE WHEN role = 'user' THEN 1 END) AS BIGINT) AS n_user,
       CAST(COUNT(CASE WHEN role = 'assistant' THEN 1 END) AS BIGINT) AS n_assistant,
       CAST(COUNT(CASE WHEN role = 'system' THEN 1 END) AS BIGINT) AS n_system,
       CAST(COUNT(CASE WHEN role = 'tool' THEN 1 END) AS BIGINT) AS n_tool
FROM conversations GROUP BY conv_id
"""

_UNPIVOT_ROLE_SQL = f"""
WITH {_CONV_CTE},
wide AS (
    SELECT conv_id,
           CAST(COUNT(CASE WHEN role = 'user' THEN 1 END) AS BIGINT) AS n_user,
           CAST(COUNT(CASE WHEN role = 'assistant' THEN 1 END) AS BIGINT) AS n_assistant,
           CAST(COUNT(CASE WHEN role = 'system' THEN 1 END) AS BIGINT) AS n_system,
           CAST(COUNT(CASE WHEN role = 'tool' THEN 1 END) AS BIGINT) AS n_tool
    FROM conversations GROUP BY conv_id
)
SELECT conv_id, 'user' AS role, n_user AS n FROM wide
UNION ALL SELECT conv_id, 'assistant', n_assistant FROM wide
UNION ALL SELECT conv_id, 'system', n_system FROM wide
UNION ALL SELECT conv_id, 'tool', n_tool FROM wide
"""

_UNION_DEDUP_SQL = f"""
WITH {_CONV_CTE},
u AS (
    SELECT conv_id, turn_idx FROM conversations WHERE role = 'user'
    UNION ALL
    SELECT conv_id, turn_idx FROM conversations WHERE tool IS NOT NULL
),
d AS (SELECT DISTINCT conv_id, turn_idx FROM u)
SELECT conv_id, COUNT(*) AS n_activity FROM d GROUP BY conv_id
"""

_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))) AS DOUBLE)
           AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))
                * (CAST(1 AS DECIMAL(5,2)) + CAST(l_tax AS DECIMAL(5,2)))) AS DOUBLE)
           AS sum_charge,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def _asof_entity_grid_oracle() -> str:
    """Per-entity cutoff grid variant: same agg families as
    ``_asof_oracle`` but the cutoff comes from each conversation's own
    last-turn week, and COALESCE fills apply inline (no outer grid —
    every entity matches its own cutoff by construction)."""
    horizons = (1, 3, 7)
    inside = "ts >= cutoff_ts - INTERVAL {k} DAY"
    families = [
        ("turn_cnt", "COUNT(CASE WHEN {inside} THEN 1 END)", None),
        ("user_turn_cnt", "COUNT(CASE WHEN ({inside}) AND role = 'user' THEN 1 END)", None),
        ("tool_call_cnt", "COUNT(CASE WHEN {inside} THEN tool END)", None),
        ("distinct_tool_cnt", "COUNT(DISTINCT CASE WHEN {inside} THEN tool END)", None),
        ("text_len_sum", "CAST(SUM(CASE WHEN {inside} THEN length(text) END) AS BIGINT)", "0"),
        ("text_len_max", "CAST(MAX(CASE WHEN {inside} THEN length(text) END) AS BIGINT)", "0"),
        ("text_len_avg", "ROUND(AVG(CASE WHEN {inside} THEN length(text) END), 4)", "0.0"),
    ]
    aggs = []
    for name, tmpl, fill in families:
        for k in horizons:
            agg = tmpl.format(inside=inside.format(k=k))
            if fill is not None:
                agg = f"COALESCE({agg}, {fill})"
            aggs.append(f"{agg} AS {name}_{k}d")
    agg_sql = ",\n        ".join(aggs)
    return f"""
WITH {_CONV_CTE},
grid AS (
    SELECT conv_id,
           CAST(date_trunc('week', MAX(ts)) AS TIMESTAMP) + INTERVAL 7 DAY AS cutoff_ts
    FROM conversations GROUP BY conv_id
),
joined AS (
    SELECT c.conv_id, c.role, c.text, c.tool, c.ts, g.cutoff_ts
    FROM conversations c
    JOIN grid g ON c.conv_id = g.conv_id
     AND c.ts < g.cutoff_ts AND c.ts >= g.cutoff_ts - INTERVAL 7 DAY
)
SELECT conv_id, cutoff_ts,
        {agg_sql},
        epoch_us(cutoff_ts) - MAX(epoch_us(ts)) AS micros_since_last_turn
FROM joined
GROUP BY conv_id, cutoff_ts
"""


_PSI_DECILES = "[0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]"

_PSI_QUANTILE_SQL = f"""
WITH {_CONV_CTE},
folded AS (
    SELECT CASE WHEN CAST(floor(epoch_us(CAST(date_trunc('week', ts) AS TIMESTAMP))
                            / {7 * 86400 * 1_000_000}) AS BIGINT) % 2 = 0
                THEN 'even' ELSE 'odd' END AS fold,
           CAST(length(text) AS BIGINT) AS v
    FROM conversations
),
edges AS (
    SELECT ROUND(unnest(quantile_cont(v, {_PSI_DECILES})), 6) AS e
    FROM folded WHERE fold = 'even'
),
binned AS (
    SELECT fold, CAST((SELECT COUNT(*) FROM edges WHERE e < v) AS INTEGER) AS bin
    FROM folded
),
counts AS (SELECT fold, bin, COUNT(*) AS n FROM binned GROUP BY 1, 2),
freqs AS (
    SELECT fold, bin, CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY fold) AS freq
    FROM counts
),
grid AS (
    SELECT f.fold, b.bin
    FROM (SELECT DISTINCT fold FROM counts WHERE fold <> 'even') f
    CROSS JOIN (SELECT DISTINCT bin FROM counts) b
),
terms AS (
    SELECT g.fold,
           GREATEST(COALESCE(c.freq, 0.0), 1e-6) AS a,
           GREATEST(COALESCE(r.freq, 0.0), 1e-6) AS e
    FROM grid g
    LEFT JOIN (SELECT * FROM freqs WHERE fold <> 'even') c
      ON g.fold = c.fold AND g.bin = c.bin
    LEFT JOIN (SELECT bin, freq FROM freqs WHERE fold = 'even') r
      ON g.bin = r.bin
)
SELECT fold, ROUND(SUM((a - e) * ln(a / e)), 6) AS psi
FROM terms GROUP BY fold
"""


# --- windows / trend / folds oracles ---------------------------------------

_SESSION_ASSIGN_SQL = f"""
WITH {_CONV_CTE},
flagged AS (
    SELECT conv_id, turn_idx, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                THEN 1 ELSE 0 END AS ns
    FROM conversations
    WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx)
)
SELECT conv_id, turn_idx,
       CAST(SUM(ns) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx
                          ROWS UNBOUNDED PRECEDING) - 1 AS INTEGER) AS session_id
FROM flagged
"""

_ROLLING_SQL = f"""
WITH {_CONV_CTE}
SELECT conv_id, turn_idx,
       COUNT(*) OVER w AS n_turns_trailing,
       CAST(SUM(length(text)) OVER w AS BIGINT) AS text_len_trailing,
       COUNT(CASE WHEN role = 'user' THEN 1 END) OVER w AS n_user_turns_trailing
FROM conversations
WINDOW w AS (PARTITION BY conv_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW)
"""

_TUMBLING_SQL = f"""
WITH {_CONV_CTE}
SELECT date_trunc('second', ts)
         - CAST((CAST(hour(ts) AS BIGINT) * 3600 + minute(ts) * 60
                 + CAST(floor(second(ts)) AS BIGINT)) % 21600 AS INTEGER)
           * INTERVAL 1 SECOND AS window_start,
       role,
       COUNT(*) AS n_turns,
       CAST(SUM(length(text)) AS BIGINT) AS text_len_sum
FROM conversations
GROUP BY 1, 2
"""

_TREND_SQL = f"""
SELECT conv_id, cutoff_ts,
       ROUND(turn_cnt_1d - turn_cnt_3d / 3.0, 6) AS turn_rate_accel,
       ROUND(COALESCE((turn_cnt_1d * 3.0) / NULLIF(turn_cnt_3d, 0), 0.0) - 1.0, 6)
           AS turn_trend_1v3,
       ROUND(COALESCE((text_len_sum_3d * (7.0 / 3.0)) / NULLIF(text_len_sum_7d, 0), 0.0) - 1.0, 6)
           AS text_trend_3v7,
       ROUND(COALESCE((user_turn_cnt_7d * 1.0) / NULLIF(turn_cnt_7d, 0), 0.0), 6)
           AS user_turn_share_7d,
       ROUND(COALESCE((tool_call_cnt_7d * 1.0) / NULLIF(turn_cnt_7d, 0), 0.0), 6)
           AS tool_call_share_7d
FROM ({{asof}}) f
"""

_BACKTEST_FOLDS_SQL = """
SELECT f.*, l.is_churn, l.micros_to_next_qualifying,
       concat('fold_', strftime(f.cutoff_ts, '%Y%m%d')) AS fold
FROM ({asof}) f
JOIN ({labels}) l
  ON f.conv_id = l.conv_id AND f.cutoff_ts = l.cutoff_ts
"""


def _asof_expanding_oracle() -> str:
    """Expanding-lookback as-of features (lock-step with
    ``plans.folds.backtest(lookback_policy='expanding')``): each
    cutoff's lower bound is its own ``lookback_days`` (reaching the
    earliest cutoff − 7d), and whole-window ``turn_cnt_full`` /
    ``text_len_sum_full`` aggregates ride along."""
    horizons = (1, 3, 7)
    inside = "ts >= cutoff_ts - INTERVAL {k} DAY"
    families = [
        ("turn_cnt", "COUNT(CASE WHEN {inside} THEN 1 END)", "0"),
        ("user_turn_cnt", "COUNT(CASE WHEN ({inside}) AND role = 'user' THEN 1 END)", "0"),
        ("tool_call_cnt", "COUNT(CASE WHEN {inside} THEN tool END)", "0"),
        ("distinct_tool_cnt", "COUNT(DISTINCT CASE WHEN {inside} THEN tool END)", "0"),
        ("text_len_sum", "CAST(SUM(CASE WHEN {inside} THEN length(text) END) AS BIGINT)", "0"),
        ("text_len_max", "CAST(MAX(CASE WHEN {inside} THEN length(text) END) AS BIGINT)", "0"),
        ("text_len_avg", "ROUND(AVG(CASE WHEN {inside} THEN length(text) END), 4)", "0.0"),
    ]
    aggs, finals = [], []
    for name, tmpl, fill in families:
        for k in horizons:
            col = f"{name}_{k}d"
            aggs.append(tmpl.format(inside=inside.format(k=k)) + f" AS {col}")
            finals.append(f"COALESCE(f.{col}, {fill}) AS {col}")
    aggs.append("COUNT(*) AS turn_cnt_full")
    finals.append("COALESCE(f.turn_cnt_full, 0) AS turn_cnt_full")
    aggs.append("CAST(SUM(length(text)) AS BIGINT) AS text_len_sum_full")
    finals.append("COALESCE(f.text_len_sum_full, 0) AS text_len_sum_full")
    agg_sql = ",\n        ".join(aggs)
    final_sql = ",\n    ".join(finals)
    return f"""
WITH {_CONV_CTE},
cutlb AS (
    SELECT cutoff_ts,
           CAST(date_diff('day', MIN(cutoff_ts) OVER (), cutoff_ts) + 7 AS INTEGER)
               AS lookback_days
    FROM cutoffs
),
joined AS (
    SELECT c.conv_id, c.role, c.text, c.tool, c.ts, k.cutoff_ts
    FROM conversations c
    JOIN cutlb k
      ON c.ts < k.cutoff_ts AND c.ts >= k.cutoff_ts - to_days(k.lookback_days)
),
feats AS (
    SELECT conv_id, cutoff_ts,
        {agg_sql},
        epoch_us(cutoff_ts) - MAX(epoch_us(ts)) AS micros_since_last_turn
    FROM joined
    GROUP BY conv_id, cutoff_ts
),
grid AS (
    SELECT e.conv_id, k.cutoff_ts
    FROM (SELECT DISTINCT conv_id FROM conversations) e
    CROSS JOIN cutoffs k
)
SELECT g.conv_id, g.cutoff_ts,
    {final_sql},
    COALESCE(f.micros_since_last_turn, -1) AS micros_since_last_turn
FROM grid g
LEFT JOIN feats f ON g.conv_id = f.conv_id AND g.cutoff_ts = f.cutoff_ts
"""


_CV_FOLD_ASSIGNMENT_SQL = f"""
WITH {_CONV_CTE},
grid AS (
    SELECT e.conv_id, k.cutoff_ts
    FROM (SELECT DISTINCT conv_id FROM conversations) e CROSS JOIN cutoffs k
),
f AS (
    SELECT * FROM (
        SELECT concat('fold_', strftime(cutoff_ts, '%Y%m%d')) AS fold,
               cutoff_ts,
               lag(cutoff_ts) OVER (ORDER BY cutoff_ts) AS prev
        FROM cutoffs
    ) WHERE prev IS NOT NULL
),
val AS (
    SELECT g.conv_id, g.cutoff_ts, f.fold, 'val' AS split
    FROM grid g JOIN f ON g.cutoff_ts = f.cutoff_ts
),
exp_train AS (
    SELECT g.conv_id, g.cutoff_ts, f.fold, 'train' AS split
    FROM grid g JOIN f ON g.cutoff_ts < f.cutoff_ts
),
sli_train AS (
    SELECT g.conv_id, g.cutoff_ts, f.fold, 'train' AS split
    FROM grid g JOIN f ON g.cutoff_ts = f.prev
)
SELECT *, 'expanding' AS policy FROM val
UNION ALL SELECT *, 'expanding' AS policy FROM exp_train
UNION ALL SELECT *, 'sliding' AS policy FROM val
UNION ALL SELECT *, 'sliding' AS policy FROM sli_train
"""

# --- near-dup / ANN / multimodal oracles -----------------------------------

_MINHASH_LSH_SQL = f"""
WITH {_shingle_cte(3)},
h AS (
    SELECT doc_id, CAST(i.i AS INTEGER) AS i, {_H48.format(x='shingle')} AS h48
    FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS i) i
),
sig AS (
    SELECT doc_id, i,
           MIN((CAST(2*i+3 AS BIGINT) * h48 + CAST(5*i+7 AS BIGINT)) % 2305843009213693951) AS mh
    FROM h GROUP BY doc_id, i
),
keys AS (
    SELECT doc_id, CAST(i // 2 AS INTEGER) AS band,
           array_to_string(list_sort(list(concat(i, ':', mh))), ',') AS band_key
    FROM sig GROUP BY doc_id, CAST(i // 2 AS INTEGER)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM keys a JOIN keys b ON a.band = b.band AND a.band_key = b.band_key
WHERE a.doc_id < b.doc_id
"""

# unit vector per row (lock-step with similarity.unit_vector_expr:
# normalize once, pairwise cosine = bare dot of unit vectors). Zero
# vectors -> NULL list, NOT a list of x/0 NULL elements: DuckDB's
# list_dot_product ERRORS on NULL elements but propagates a NULL
# list, and the engine's try_divide unit vectors make every cosine
# against them NULL -> threshold-dropped on both sides (r5 fuzz)
_UNIT = (
    "CASE WHEN list_dot_product(CAST({e} AS DOUBLE[]), CAST({e} AS DOUBLE[])) > 0 "
    "THEN list_transform(CAST({e} AS DOUBLE[]), "
    "x -> x / sqrt(list_dot_product(CAST({e} AS DOUBLE[]), CAST({e} AS DOUBLE[])))) "
    "ELSE NULL END"
)

_NEARDUP_EMB_SQL = f"""
WITH q AS (SELECT vec_id AS doc_a, {_UNIT.format(e='embedding')} AS qe,
                  {_BUCKET.format(e='embedding')} AS bucket FROM embeddings),
v AS (SELECT vec_id AS doc_b, {_UNIT.format(e='embedding')} AS ne,
             {_BUCKET.format(e='embedding')} AS bucket FROM embeddings),
scored AS (
    SELECT doc_a, doc_b, ROUND(list_dot_product(qe, ne), 6) AS cosine
    FROM q JOIN v USING (bucket) WHERE doc_a < doc_b
)
SELECT doc_a, doc_b, cosine FROM scored WHERE cosine >= 0.35
"""

# cosine over arbitrary operand aliases (the qe/ne-specific _COS above
# predates this; kept for the existing oracles' stability)
_COS2 = (
    "list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[])) / "
    "(sqrt(list_dot_product(CAST({a} AS DOUBLE[]), CAST({a} AS DOUBLE[]))) * "
    "sqrt(list_dot_product(CAST({b} AS DOUBLE[]), CAST({b} AS DOUBLE[]))))"
)

_IVF_SQL = f"""
WITH seeds AS (
    SELECT e.vec_id AS cell, e.embedding AS cv
    FROM (SELECT MIN(vec_id) AS vec_id FROM embeddings GROUP BY label) m
    JOIN embeddings e USING (vec_id)
),
massign AS (
    SELECT v.vec_id AS neighbor_id, v.embedding AS ne, s.cell,
           ROUND({_COS2.format(a='v.embedding', b='s.cv')}, 6) AS c
    FROM embeddings v CROSS JOIN seeds s
),
members AS (
    SELECT neighbor_id, ne, cell FROM (
        SELECT *, row_number() OVER (PARTITION BY neighbor_id
                                     ORDER BY c DESC, cell ASC) AS r
        FROM massign
    ) WHERE r = 1
),
qassign AS (
    SELECT q.vec_id AS query_id, q.embedding AS qe, s.cell,
           ROUND({_COS2.format(a='q.embedding', b='s.cv')}, 6) AS c
    FROM embeddings q CROSS JOIN seeds s WHERE q.vec_id < 10
),
probes AS (
    SELECT query_id, qe, cell FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY c DESC, cell ASC) AS r
        FROM qassign
    ) WHERE r <= 2
),
scored AS (
    SELECT query_id, neighbor_id, ROUND({_COS}, 6) AS cosine
    FROM members JOIN probes USING (cell)
    WHERE neighbor_id <> query_id
),
ranked AS (
    SELECT *, CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5
"""


def _byte_int_expr(n_bytes: int) -> str:
    """Big-endian integer of the first ``n_bytes`` UTF-8 bytes of
    COALESCE(text, ''), zero-padded on the right (lock-step with
    ``operators.multimodal._fake_decode``'s ``payload[:n].ljust``).
    Valid because the documents text is pure printable ASCII (byte ==
    codepoint, first byte < 0x80 keeps the value inside BIGINT)."""
    t = "COALESCE(text, '')"
    expr = "CAST(0 AS BIGINT)"
    for i in range(1, n_bytes + 1):
        b = f"CASE WHEN length({t}) >= {i} THEN ascii(substr({t}, {i}, 1)) ELSE 0 END"
        expr = f"(({expr}) * 256 + ({b}))"
    return expr


_MULTIMODAL_SQL = f"""
WITH b AS (
    SELECT doc_id,
           CAST(length(COALESCE(text, '')) AS BIGINT) AS n_bytes,
           {_byte_int_expr(8)} AS h,
           {_byte_int_expr(6)} AS fp
    FROM documents
)
SELECT doc_id AS media_id,
       'image' AS kind,
       n_bytes,
       CAST(64 + h % 1024 AS INTEGER) AS width,
       CAST(64 + (h // 1024) % 1024 AS INTEGER) AS height,
       CAST(1 + (h // 1048576) % 300 AS INTEGER) AS n_frames,
       fp AS fingerprint
FROM b
"""

# resize oracle: same fake-decode dims, then integer-exact letterbox
# into 256x144 (width binds when width*144 >= height*256). Integer //
# in DuckDB == Spark's `div` on BIGINT for the non-negative values here.
_MEDIA_RESIZE_SQL = f"""
WITH b AS (
    SELECT doc_id,
           {_byte_int_expr(8)} AS h
    FROM documents
),
dims AS (
    SELECT doc_id AS media_id, 'image' AS kind,
           CAST(64 + h % 1024 AS INTEGER) AS src_w,
           CAST(64 + (h // 1024) % 1024 AS INTEGER) AS src_h
    FROM b
),
geo AS (
    SELECT media_id, kind, src_w, src_h,
           CASE WHEN src_w <= 0 OR src_h <= 0 THEN 0
                WHEN src_w * 144 >= src_h * 256 THEN 256
                ELSE GREATEST(1, (CAST(src_w AS BIGINT) * 144) // src_h)
           END AS out_w,
           CASE WHEN src_w <= 0 OR src_h <= 0 THEN 0
                WHEN src_w * 144 >= src_h * 256
                THEN GREATEST(1, (CAST(src_h AS BIGINT) * 256) // src_w)
                ELSE 144
           END AS out_h
    FROM dims
)
SELECT media_id, kind, src_w, src_h,
       CAST(out_w AS INTEGER) AS out_w,
       CAST(out_h AS INTEGER) AS out_h,
       CAST(CASE WHEN out_w <= 0 THEN 0 ELSE (256 - out_w) // 2 END AS INTEGER) AS pad_x,
       CAST(CASE WHEN out_h <= 0 THEN 0 ELSE (144 - out_h) // 2 END AS INTEGER) AS pad_y
FROM geo
"""


# per-media token cost (lock-step with multimodal.media_token_cost:
# the media_resize letterbox geometry, then 14px tiles + one
# row-break token per tile row; image kind charges one frame — all
# integer algebra over the hash-derived fake-decode dims)
_MEDIA_TOKEN_COST_SQL = f"""
WITH b AS (
    SELECT doc_id,
           {_byte_int_expr(8)} AS h
    FROM documents
),
dims AS (
    SELECT doc_id AS media_id, 'image' AS kind,
           CAST(64 + h % 1024 AS INTEGER) AS src_w,
           CAST(64 + (h // 1024) % 1024 AS INTEGER) AS src_h,
           CAST(1 + (h // 1048576) % 300 AS INTEGER) AS n_frames
    FROM b
),
geo AS (
    SELECT media_id, kind, n_frames,
           CASE WHEN src_w <= 0 OR src_h <= 0 THEN 0
                WHEN src_w * 144 >= src_h * 256 THEN 256
                ELSE GREATEST(1, (CAST(src_w AS BIGINT) * 144) // src_h)
           END AS out_w,
           CASE WHEN src_w <= 0 OR src_h <= 0 THEN 0
                WHEN src_w * 144 >= src_h * 256
                THEN GREATEST(1, (CAST(src_h AS BIGINT) * 256) // src_w)
                ELSE 144
           END AS out_h
    FROM dims
),
tiles AS (
    SELECT media_id, kind, out_w, out_h, n_frames,
           (out_w + 13) // 14 AS tiles_x,
           (out_h + 13) // 14 AS tiles_y,
           CASE WHEN kind = 'image' THEN 1
                WHEN kind = 'video' THEN CAST((GREATEST(n_frames - 1, 0) // 30) + 1 AS INTEGER)
                ELSE 0 END AS n_sampled
    FROM geo
)
SELECT media_id, kind,
       CAST(out_w AS INTEGER) AS out_w, CAST(out_h AS INTEGER) AS out_h,
       n_frames, CAST(n_sampled AS INTEGER) AS n_sampled,
       CAST(tiles_x AS INTEGER) AS tiles_x, CAST(tiles_y AS INTEGER) AS tiles_y,
       CAST(tiles_x * tiles_y + tiles_y AS BIGINT) AS tokens_per_frame,
       CAST((tiles_x * tiles_y + tiles_y) * n_sampled AS BIGINT) AS media_tokens
FROM tiles
"""

# interleaved text+media budgeting (lock-step with
# multimodal.multimodal_token_budget over the media_token_cost CTE:
# whitespace text tokens + summed media tokens, ceil-div chunks)
_MULTIMODAL_BUDGET_SQL = f"""
WITH costs AS ({_MEDIA_TOKEN_COST_SQL}),
per_doc AS (
    SELECT media_id AS doc_id, CAST(SUM(media_tokens) AS BIGINT) AS media_tokens
    FROM costs GROUP BY media_id
),
txt AS (
    SELECT doc_id,
           CAST(CASE WHEN trim(regexp_replace(COALESCE(text, ''), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) = '' THEN 0
                ELSE len(string_split(trim(regexp_replace(COALESCE(text, ''), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' '))
                END AS BIGINT) AS text_tokens
    FROM documents
)
SELECT t.doc_id, t.text_tokens,
       CAST(COALESCE(p.media_tokens, 0) AS BIGINT) AS media_tokens,
       CAST(t.text_tokens + COALESCE(p.media_tokens, 0) AS BIGINT) AS total_tokens,
       CAST((t.text_tokens + COALESCE(p.media_tokens, 0) + 2047) // 2048 AS INTEGER)
           AS n_chunks
FROM txt t LEFT JOIN per_doc p ON t.doc_id = p.doc_id
"""

# streaming closed-sessions oracle: batch sessions over (conv_id, ts)
# minus each conversation's final (still-open-at-end-of-stream) session
# streaming as-of depth (lock-step with streaming/asof.py: strictly-
# prior = RANGE frame ending 1 micro before the current event time —
# tie rows are peers, never prior)
_STREAMING_ASOF_SQL = """
WITH base AS (
    SELECT concat('c', CAST(user_id AS VARCHAR)) AS conv_id,
           ts,
           epoch_us(ts) AS tsu
    FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
)
SELECT conv_id, ts,
       CAST(COUNT(*) OVER (PARTITION BY conv_id ORDER BY tsu
            RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT)
           AS n_prior,
       CAST(tsu - MAX(tsu) OVER (PARTITION BY conv_id ORDER BY tsu
            RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT)
           AS micros_since_prior
FROM base
"""

_STREAMING_SESSIONS_SQL = """
WITH base AS (
    SELECT concat('c', user_id) AS conv_id, ts, event_id
    FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
flagged AS (
    -- event_id tiebreak in BOTH windows: session bounds are
    -- tie-order-INVARIANT only if the gap-flag and running-sum
    -- windows see tied peers in the SAME order; without a total
    -- order DuckDB may order them differently per window and a
    -- session splits across an exact-ts duplicate (r5 fuzz catch,
    -- the debounce_events bug class)
    SELECT conv_id, ts, event_id,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                THEN 1 ELSE 0 END AS ns
    FROM base
    WINDOW w AS (PARTITION BY conv_id ORDER BY ts, event_id)
),
sess AS (
    SELECT conv_id, ts,
           SUM(ns) OVER (PARTITION BY conv_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS sid
    FROM flagged
),
aggs AS (
    SELECT conv_id, sid,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           COUNT(*) AS n_turns
    FROM sess GROUP BY 1, 2
)
SELECT conv_id, session_start, session_end, n_turns
FROM aggs a
WHERE sid < (SELECT MAX(sid) FROM aggs b WHERE b.conv_id = a.conv_id)
"""


def _feature_validation_oracle() -> str:
    """Per-feature null-count report over the asof feature matrix
    (every DEFAULT_SPECS fill is non-None, so null_policy_ok reduces
    to n_null == 0 — lock-step with horizons.validate_features)."""
    horizons = (1, 3, 7)
    names = [
        "turn_cnt", "user_turn_cnt", "tool_call_cnt", "distinct_tool_cnt",
        "text_len_sum", "text_len_max", "text_len_avg",
    ]
    selects = []
    for name in names:
        for k in horizons:
            c = f"{name}_{k}d"
            selects.append(
                f"SELECT '{c}' AS feature, COUNT(*) AS n_rows, "
                f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, "
                f"CAST(CASE WHEN SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) = 0 "
                f"THEN 1 ELSE 0 END AS INTEGER) AS null_policy_ok FROM featm"
            )
    body = "\nUNION ALL ".join(selects)
    # "asof" is a DuckDB keyword (ASOF JOIN) — CTE named featm
    return f"WITH featm AS ({_asof_oracle()})\n{body}"


# categorical PSI (lock-step with psi.psi_categorical: frequency
# denominator = TOTAL fold rows incl. null-valued, categories = union
# of observed non-null values, clip 1e-6 — src/psi.py:96-102 analog)
_PSI_CATEGORICAL_SQL = f"""
WITH {_CONV_CTE},
folded AS (
    SELECT CASE WHEN CAST(floor(epoch_us(CAST(date_trunc('week', ts) AS TIMESTAMP))
                            / {7 * 86400 * 1_000_000}) AS BIGINT) % 2 = 0
                THEN 'even' ELSE 'odd' END AS fold,
           role, tool
    FROM conversations
),
melted AS (
    SELECT fold, 'role' AS feature, role AS val FROM folded
    UNION ALL
    SELECT fold, 'tool' AS feature, tool AS val FROM folded
),
totals AS (SELECT fold, COUNT(*) AS tot FROM folded GROUP BY fold),
counts AS (
    SELECT fold, feature, val, COUNT(*) AS n
    FROM melted WHERE val IS NOT NULL GROUP BY 1, 2, 3
),
freqs AS (
    SELECT c.fold, c.feature, c.val, CAST(c.n AS DOUBLE) / t.tot AS freq
    FROM counts c JOIN totals t USING (fold)
),
grid AS (
    SELECT f.fold, c.feature, c.val
    FROM (SELECT DISTINCT fold FROM counts WHERE fold <> 'even') f
    CROSS JOIN (SELECT DISTINCT feature, val FROM counts) c
),
terms AS (
    SELECT g.fold, g.feature,
           GREATEST(COALESCE(c.freq, 0.0), 1e-6) AS a,
           GREATEST(COALESCE(r.freq, 0.0), 1e-6) AS e
    FROM grid g
    LEFT JOIN (SELECT * FROM freqs WHERE fold <> 'even') c
      ON g.fold = c.fold AND g.feature = c.feature AND g.val = c.val
    LEFT JOIN (SELECT feature, val, freq FROM freqs WHERE fold = 'even') r
      ON g.feature = r.feature AND g.val = r.val
)
SELECT feature, fold, ROUND(SUM((a - e) * ln(a / e)), 6) AS psi
FROM terms GROUP BY feature, fold
"""

# edge-bucketed quintiles (lock-step with relational.quintile_bucket_stats
# method="edges": quantile edges rounded 6, bucket = 1 + #edges < value)
_QUINTILE_SQL = """
WITH v AS (
    SELECT event_id, CAST(value AS DOUBLE) AS value
    FROM events WHERE value IS NOT NULL
),
e AS (
    SELECT ROUND(unnest(quantile_cont(value, [0.2, 0.4, 0.6, 0.8])), 6) AS e
    FROM v
),
b AS (
    SELECT event_id, value,
           CAST(1 + (SELECT COUNT(*) FROM e WHERE e.e < v.value) AS INTEGER) AS bucket
    FROM v
)
SELECT bucket, COUNT(*) AS n,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM b GROUP BY bucket
"""

_SALES_BY_REGION_SQL = """
SELECT r.r_name AS region_name,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
"""

# --- calibration / evaluation oracles --------------------------------------
# deterministic synthetic predictions (lock-step with _preds): p is a
# dyadic rational strictly inside (0,1), y an integer hash compare,
# fold a hash parity — zero RNG, identical in both engines
_PRED_CTE = f"""
preds AS (
    SELECT CAST(event_id AS VARCHAR) AS event_id,
           (({_H48.format(x="concat('p', CAST(event_id AS VARCHAR))")}) % 1048576 + 0.5) / 1048576.0 AS p,
           CAST((({_H48.format(x="concat('y', CAST(event_id AS VARCHAR))")}) % 1048576)
                < (({_H48.format(x="concat('p', CAST(event_id AS VARCHAR))")}) % 1048576) AS INTEGER) AS y,
           CASE WHEN ({_H48.format(x="concat('f', CAST(event_id AS VARCHAR))")}) % 2 = 0
                THEN 'a' ELSE 'b' END AS fold
    FROM events WHERE event_id IS NOT NULL
)
"""

# weekly bounce (lock-step with rhythm.weekly_bounce_rate: cohort week
# = week of the conversation's FIRST turn; bounce = exactly one turn)
_WEEKLY_BOUNCE_SQL = f"""
WITH {_CONV_CTE},
per_conv AS (
    SELECT conv_id,
           CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS week,
           COUNT(*) AS n
    FROM conversations GROUP BY conv_id
)
SELECT week,
       CAST(COUNT(*) AS BIGINT) AS n_started,
       CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounced,
       ROUND(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
           AS bounce_rate
FROM per_conv GROUP BY week
"""

# weekly SLA (lock-step with lags.weekly_latency_sla: same forward-min
# latency as response_latency; FLOOR before the BIGINT cast — bare
# CAST rounds here but truncates in Spark)
_WEEKLY_SLA_SQL = f"""
WITH {_CONV_CTE},
lat AS (
    SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
           MIN(CASE WHEN role = 'assistant' THEN epoch_us(ts) END)
               OVER (PARTITION BY conv_id ORDER BY ts, turn_idx
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
             - epoch_us(ts) AS l,
           role
    FROM conversations
)
SELECT week,
       CAST(COUNT(*) AS BIGINT) AS n_exchanges,
       CAST(FLOOR(quantile_cont(l, 0.5)) AS BIGINT) AS p50_latency_us,
       CAST(FLOOR(quantile_cont(l, 0.9)) AS BIGINT) AS p90_latency_us,
       ROUND(SUM(CASE WHEN l <= {300 * 1_000_000} THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS sla_fraction
FROM lat WHERE role = 'user' AND l IS NOT NULL
GROUP BY week
"""

# gains/lift table (lock-step with calibration.gains_table: fixed-width
# floor(p·10) bands — not ntile; cumulative windows on the band table)
_GAINS_SQL = f"""
WITH {_PRED_CTE},
counts AS (
    SELECT CAST(LEAST(FLOOR(p * 10), 9) AS INTEGER) AS band,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(y) AS BIGINT) AS n_pos
    FROM preds GROUP BY 1
)
SELECT band, n, n_pos,
       ROUND(CASE WHEN SUM(n_pos) OVER () > 0
                  THEN SUM(n_pos) OVER (ORDER BY band DESC
                                        ROWS UNBOUNDED PRECEDING) * 1.0
                       / SUM(n_pos) OVER () END, 6) AS cum_capture,
       ROUND(CASE WHEN SUM(n_pos) OVER () > 0
                   AND SUM(n) OVER (ORDER BY band DESC
                                    ROWS UNBOUNDED PRECEDING) > 0
                  THEN (SUM(n_pos) OVER (ORDER BY band DESC
                                         ROWS UNBOUNDED PRECEDING) * 1.0
                        / SUM(n) OVER (ORDER BY band DESC
                                       ROWS UNBOUNDED PRECEDING))
                       / (SUM(n_pos) OVER () * 1.0 / SUM(n) OVER ())
             END, 6) AS lift
FROM counts
"""

# right-closed prob bins (src/calibration.py:115-117 semantics):
# bin = ceil(p*n)-1; rows outside [0, n) are unbinned but stay in the
# ECE denominator
_BINNED_CTE = """
binned AS (
    SELECT CASE WHEN CEIL(p * {n}) - 1 >= 0 AND CEIL(p * {n}) - 1 < {n}
                THEN CAST(CEIL(p * {n}) - 1 AS INTEGER) END AS bin,
           CAST(y AS DOUBLE) AS y, p, fold
    FROM preds
)
"""

_RELIABILITY_SQL = f"""
WITH {_PRED_CTE}, {_BINNED_CTE.format(n=10)},
per_bin AS (
    SELECT bin, COUNT(*) AS n, ROUND(AVG(p), 6) AS avg_conf,
           ROUND(AVG(y), 6) AS frac_pos
    FROM binned WHERE bin IS NOT NULL GROUP BY bin
),
total AS (SELECT COUNT(*) AS n_total FROM preds)
SELECT bin, n, avg_conf, frac_pos,
       ROUND(CAST(n AS DOUBLE) / n_total, 6) AS weight
FROM per_bin CROSS JOIN total
"""

_ECE_SQL = f"""
WITH {_PRED_CTE}, {_BINNED_CTE.format(n=10)},
per_bin AS (
    SELECT bin, COUNT(*) AS n, AVG(p) AS conf, AVG(y) AS acc
    FROM binned WHERE bin IS NOT NULL GROUP BY bin
),
total AS (SELECT COUNT(*) AS n_total FROM preds)
SELECT ROUND(SUM(CAST(n AS DOUBLE) / n_total * ABS(acc - conf)), 6) AS ece
FROM per_bin CROSS JOIN total
"""

_CALIBRATION_METRICS_SQL = f"""
WITH {_PRED_CTE},
clipped AS (
    SELECT fold, CAST(y AS DOUBLE) AS y, p,
           LEAST(GREATEST(p, 1e-15), 1.0 - 1e-15) AS pc
    FROM preds
)
SELECT fold, COUNT(*) AS n,
       ROUND(AVG((p - y) * (p - y)), 6) AS brier,
       ROUND(AVG(-(y * LN(pc) + (1.0 - y) * LN(1.0 - pc))), 6) AS log_loss
FROM clipped GROUP BY fold
"""

# Poisson(1) inverse-CDF thresholds — MUST stay lock-step with
# operators/calibration.py _POISSON1_CDF (same literals → same doubles)
_POISSON_CASE = """CASE
    WHEN u < 0.36787944117144233 THEN 0
    WHEN u < 0.7357588823428847 THEN 1
    WHEN u < 0.9196986029286058 THEN 2
    WHEN u < 0.9810118431238462 THEN 3
    WHEN u < 0.9963401531726563 THEN 4
    WHEN u < 0.9994058151824183 THEN 5
    WHEN u < 0.9999167588507119 THEN 6
    WHEN u < 0.9999897508033253 THEN 7
    ELSE 8 END"""

_BOOTSTRAP_CI_SQL = f"""
WITH {_PRED_CTE},
reps AS (SELECT unnest(generate_series(0, 63)) AS b),
hashed AS (
    SELECT {_H48.format(x='event_id')} AS h, y, p FROM preds
),
expl AS (
    -- modulus = largest prime < 2^48 (lock-step with
    -- calibration.UNIFORM_PRIME_48): the ≤2^56 product wraps it, so
    -- u is uniform on [0,1) — a 2^61-scale modulus would never wrap
    SELECT b, CAST(y AS DOUBLE) AS y, p,
           LEAST(GREATEST(p, 1e-15), 1.0 - 1e-15) AS pc,
           CAST(((2 * b + 3) * h + (5 * b + 7)) % 281474976710597 AS DOUBLE)
               / 281474976710597.0 AS u
    FROM hashed CROSS JOIN reps
),
weighted AS (SELECT b, y, p, pc, {_POISSON_CASE} AS w FROM expl),
per_rep AS (
    SELECT b,
           SUM(w * (p - y) * (p - y)) / NULLIF(SUM(w), 0) AS brier,
           SUM(w * -(y * LN(pc) + (1.0 - y) * LN(1.0 - pc))) / NULLIF(SUM(w), 0) AS log_loss
    FROM weighted GROUP BY b
),
melted AS (
    SELECT 'brier' AS metric, brier AS v FROM per_rep
    UNION ALL
    SELECT 'log_loss' AS metric, log_loss AS v FROM per_rep
)
SELECT metric, ROUND(AVG(v), 6) AS mean,
       ROUND(quantile_cont(v, 0.025), 6) AS ci_lower,
       ROUND(quantile_cont(v, 0.975), 6) AS ci_upper
FROM melted WHERE v IS NOT NULL GROUP BY metric
"""

# exact tie-aware Mann-Whitney AUC + KS over per-distinct-score
# cumulative counts (lock-step with calibration.auc_ks_by_fold)
_AUC_SQL = f"""
WITH {_PRED_CTE},
per_score AS (
    SELECT fold, p AS score,
           CAST(SUM(y) AS BIGINT) AS pos,
           CAST(SUM(1 - y) AS BIGINT) AS neg
    FROM preds GROUP BY fold, p
),
cum AS (
    SELECT fold, pos, neg,
           SUM(neg) OVER (PARTITION BY fold ORDER BY score) - neg AS cumneg_below,
           SUM(pos) OVER (PARTITION BY fold ORDER BY score) AS cumpos,
           SUM(neg) OVER (PARTITION BY fold ORDER BY score) AS cumneg,
           SUM(pos) OVER (PARTITION BY fold) AS tp,
           SUM(neg) OVER (PARTITION BY fold) AS tn
    FROM per_score
)
SELECT fold,
       CAST(MAX(tp) AS BIGINT) AS n_pos,
       CAST(MAX(tn) AS BIGINT) AS n_neg,
       ROUND(SUM(pos * (CAST(cumneg_below AS DOUBLE) + neg / 2.0))
             / (CAST(MAX(tp) AS DOUBLE) * CAST(MAX(tn) AS DOUBLE)), 6) AS auc,
       ROUND(MAX(ABS(CAST(cumpos AS DOUBLE) / tp - CAST(cumneg AS DOUBLE) / tn)), 6) AS ks
FROM cum GROUP BY fold
"""

# isotonic fit via the minimax identity iso(i) = max_{j<=i} min_{k>=i}
# wavg(y, bins j..k) — exactly the PAV pool value (ratio of the same
# integers), O(n_bins^3) on a 20-row profile
_ISOTONIC_SQL = f"""
WITH {_PRED_CTE}, {_BINNED_CTE.format(n=20)},
prof AS (
    SELECT fold, bin, COUNT(*) AS n, ROUND(AVG(p), 6) AS avg_conf,
           CAST(SUM(y) AS BIGINT) AS sum_y
    FROM binned WHERE bin IS NOT NULL GROUP BY fold, bin
),
cum AS (
    SELECT fold, bin, n, sum_y,
           SUM(sum_y) OVER (PARTITION BY fold ORDER BY bin) AS cy,
           SUM(n) OVER (PARTITION BY fold ORDER BY bin) AS cn
    FROM prof
),
pairs AS (
    SELECT j.fold, j.bin AS jb, k.bin AS kb,
           CAST(k.cy - j.cy + j.sum_y AS DOUBLE) / (k.cn - j.cn + j.n) AS avg_jk
    FROM cum j JOIN cum k ON j.fold = k.fold AND j.bin <= k.bin
),
mins AS (
    SELECT i.fold, i.bin, p.jb, MIN(p.avg_jk) AS m
    FROM prof i JOIN pairs p ON p.fold = i.fold AND p.jb <= i.bin AND p.kb >= i.bin
    GROUP BY i.fold, i.bin, p.jb
),
iso AS (SELECT fold, bin, ROUND(MAX(m), 6) AS iso_prob FROM mins GROUP BY fold, bin)
SELECT p.fold, p.bin, p.n, p.avg_conf,
       ROUND(CAST(p.sum_y AS DOUBLE) / p.n, 6) AS frac_pos, i.iso_prob
FROM prof p JOIN iso i ON p.fold = i.fold AND p.bin = i.bin
"""

# per-segment error profile (lock-step with
# calibration.error_by_segment over the gains band key: exact counts,
# exact-dyadic SUM(p), one double division per rate)
_ERROR_BY_SEGMENT_SQL = f"""
WITH {_PRED_CTE},
seg AS (
    SELECT CAST(LEAST(FLOOR(p * 10), 9) AS INTEGER) AS band, y, p,
           CASE WHEN (CASE WHEN p >= 0.5 THEN 1 ELSE 0 END) = y
                THEN 1 ELSE 0 END AS c
    FROM preds
)
SELECT band, CAST(COUNT(*) AS BIGINT) AS n_samples,
       ROUND(CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS accuracy,
       ROUND(SUM(p) / CAST(COUNT(*) AS DOUBLE), 6) AS mean_pred,
       ROUND(CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS actual_rate,
       ROUND(1.0 - CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
           AS error_rate
FROM seg GROUP BY band
"""

# hardest misclassified exemplars (lock-step with
# error_analysis.hardest_examples: wrongness/category filters on the
# exact dyadic p, three ORDER BY/LIMIT branches with the event_id
# tiebreak, rounding only on output)
_HARDEST_EXAMPLES_SQL = f"""
WITH {_PRED_CTE},
base AS (
    SELECT event_id, y, p,
           CASE WHEN p >= 0.5 THEN 1 ELSE 0 END AS pred_binary,
           abs(CAST(y AS DOUBLE) - p) AS error,
           GREATEST(p, 1.0 - p) AS confidence
    FROM preds
),
wrong AS (SELECT * FROM base WHERE pred_binary <> y),
fneg AS (SELECT 'false_negative' AS category, * FROM wrong WHERE y = 1
         ORDER BY p DESC, event_id ASC LIMIT 20),
fpos AS (SELECT 'false_positive' AS category, * FROM wrong WHERE y = 0
         ORDER BY p DESC, event_id ASC LIMIT 20),
hconf AS (SELECT 'high_confidence_error' AS category, * FROM wrong
          ORDER BY confidence DESC, event_id ASC LIMIT 20)
SELECT category, event_id, y, ROUND(p, 6) AS p, pred_binary,
       ROUND(error, 6) AS error, ROUND(confidence, 6) AS confidence
FROM (SELECT * FROM fneg UNION ALL SELECT * FROM fpos
      UNION ALL SELECT * FROM hconf)
"""

# FP/FN business-cost rollup (lock-step with
# error_analysis.confusion_costs: four exact conditional counts,
# fixed-shape double algebra, reference costs fp=10 / fn=50)
_CONFUSION_COSTS_SQL = f"""
WITH {_PRED_CTE},
c AS (
    SELECT
      CAST(SUM(CASE WHEN p >= 0.5 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
      CAST(SUM(CASE WHEN p < 0.5 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
      CAST(SUM(CASE WHEN p >= 0.5 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
      CAST(SUM(CASE WHEN p < 0.5 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn
    FROM preds
)
SELECT tp, tn, fp, fn,
       ROUND(CAST(fp AS DOUBLE) * 10.0, 6) AS total_fp_cost,
       ROUND(CAST(fn AS DOUBLE) * 50.0, 6) AS total_fn_cost,
       ROUND(CAST(fp AS DOUBLE) * 10.0 + CAST(fn AS DOUBLE) * 50.0, 6)
           AS total_cost,
       ROUND(CASE WHEN CAST(tn + fp AS DOUBLE) * 10.0 > 0
                  THEN (CAST(fp AS DOUBLE) * 10.0 + CAST(fn AS DOUBLE) * 50.0)
                       / (CAST(tn + fp AS DOUBLE) * 10.0)
                  ELSE 0.0 END, 6) AS cost_vs_all_positive,
       ROUND(CASE WHEN CAST(tp + fn AS DOUBLE) * 50.0 > 0
                  THEN (CAST(fp AS DOUBLE) * 10.0 + CAST(fn AS DOUBLE) * 50.0)
                       / (CAST(tp + fn AS DOUBLE) * 50.0)
                  ELSE 0.0 END, 6) AS cost_vs_all_negative,
       ROUND(LEAST(CAST(tn + fp AS DOUBLE) * 10.0,
                   CAST(tp + fn AS DOUBLE) * 50.0)
             - (CAST(fp AS DOUBLE) * 10.0 + CAST(fn AS DOUBLE) * 50.0), 6)
           AS savings_vs_baseline
FROM c
"""


def _platt_oracle(n_bins: int = 20, n_iter: int = 12, apply: bool = False) -> str:
    """Sigmoid-calibration oracle (lock-step with
    calibration.platt_calibration): the same binned profile as the
    isotonic oracle, then ``n_iter`` FIXED Newton iterations unrolled
    as chained CTEs — per iteration one per-bin q pass and one
    per-fold 5-sum aggregate, the det-guarded 2×2 solve as CASE
    expressions. Every per-bin term uses the identical expression
    shape the engine's driver-side Python evaluates (glibc exp/ln on
    both sides); the fixed iteration count converges quadratically,
    damping summation-order wobble far below the 6dp rounding."""
    clip = "LEAST(GREATEST(avg_conf, 1e-6), 1.0 - 1e-6)"
    parts = [
        f"WITH {_PRED_CTE}, {_BINNED_CTE.format(n=n_bins)},",
        f"""
prof AS (
    SELECT fold, bin, COUNT(*) AS n, ROUND(AVG(p), 6) AS avg_conf,
           CAST(SUM(y) AS BIGINT) AS sum_y
    FROM binned WHERE bin IS NOT NULL GROUP BY fold, bin
),
px AS (
    SELECT fold, bin, n, avg_conf,
           CAST(n AS DOUBLE) AS nd, CAST(sum_y AS DOUBLE) AS syd,
           ln(acc / (1.0 - acc)) AS x
    FROM (SELECT *, {clip} AS acc FROM prof)
),
consts AS (
    SELECT fold,
           (CAST(SUM(sum_y) AS DOUBLE) + 1.0)
               / (CAST(SUM(sum_y) AS DOUBLE) + 2.0) AS t_pos,
           1.0 / ((CAST(SUM(n) AS DOUBLE) - CAST(SUM(sum_y) AS DOUBLE)) + 2.0)
               AS t_neg
    FROM prof GROUP BY fold
),
it0 AS (SELECT fold, 1.0 AS a, 0.0 AS b FROM consts)""",
    ]
    for k in range(1, int(n_iter) + 1):
        prev = f"it{k - 1}"
        parts.append(f""",
q{k} AS (
    SELECT px.fold, px.x, px.nd, px.syd, c.t_pos, c.t_neg, i.a, i.b,
           1.0 / (1.0 + exp(-(i.a * px.x + i.b))) AS q
    FROM px JOIN {prev} i ON px.fold = i.fold
            JOIN consts c ON px.fold = c.fold
),
s{k} AS (
    SELECT fold, MAX(a) AS a, MAX(b) AS b,
           SUM((nd * q - (syd * t_pos + (nd - syd) * t_neg)) * x) AS g_a,
           SUM(nd * q - (syd * t_pos + (nd - syd) * t_neg)) AS g_b,
           SUM(nd * q * (1.0 - q) * x * x) AS h_aa,
           SUM(nd * q * (1.0 - q) * x) AS h_ab,
           SUM(nd * q * (1.0 - q)) AS h_bb
    FROM q{k} GROUP BY fold
),
it{k} AS (
    SELECT fold,
           CASE WHEN abs(h_aa * h_bb - h_ab * h_ab) >= 1e-12
                THEN a - (h_bb * g_a - h_ab * g_b)
                         / (h_aa * h_bb - h_ab * h_ab)
                ELSE a END AS a,
           CASE WHEN abs(h_aa * h_bb - h_ab * h_ab) >= 1e-12
                THEN b - (h_aa * g_b - h_ab * g_a)
                         / (h_aa * h_bb - h_ab * h_ab)
                ELSE b END AS b
    FROM s{k}
)""")
    if apply:
        # apply mode (lock-step with calibration.platt_apply): the
        # 6dp-ROUNDED per-fold (a, b) — exactly the fit table the
        # engine broadcasts — applied to every prediction as the same
        # clip→logit→sigmoid expression shape
        clip_p = "LEAST(GREATEST(p.p, 1e-15), 1.0 - 1e-15)"
        parts.append(f"""
SELECT p.event_id, p.fold, ROUND(p.p, 6) AS p,
       ROUND(1.0 / (1.0 + exp(-(ROUND(i.a, 6)
             * ln({clip_p} / (1.0 - {clip_p})) + ROUND(i.b, 6)))), 6)
           AS p_platt
FROM preds p JOIN it{int(n_iter)} i ON p.fold = i.fold
""")
    else:
        parts.append(f"""
SELECT px.fold, px.bin, px.n, px.avg_conf,
       ROUND(1.0 / (1.0 + exp(-(i.a * px.x + i.b))), 6) AS platt_prob,
       ROUND(i.a, 6) AS a, ROUND(i.b, 6) AS b
FROM px JOIN it{int(n_iter)} i ON px.fold = i.fold
""")
    return "".join(parts)


# EB shrinkage (lock-step with encoders.eb_shrunk_rates: same moment
# shapes — s = μ(1−μ)/Var − 1 over raw rates; VAR_SAMP both engines;
# fallback to raw when the spread is degenerate)
_EB_TOOL_RATES_SQL = f"""
WITH {_CONV_CTE},
per AS (
    SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS k
    FROM conversations GROUP BY conv_id
),
rated AS (SELECT *, k * 1.0 / n AS raw FROM per),
mom AS (
    SELECT AVG(raw) AS mu, VAR_SAMP(raw) AS var FROM rated
),
prior AS (
    SELECT mu, var,
           CASE WHEN var IS NOT NULL AND var > 1e-12
                 AND mu * (1.0 - mu) / var - 1.0 > 1e-12
                THEN mu * (1.0 - mu) / var - 1.0 END AS s
    FROM mom
)
SELECT r.conv_id, r.n, r.k,
       ROUND(r.raw, 6) AS raw_rate,
       ROUND(CASE WHEN p.s IS NOT NULL
                  THEN (r.k + p.mu * p.s)
                       / (r.n + p.mu * p.s + (1.0 - p.mu) * p.s)
                  ELSE r.raw END, 6) AS shrunk_rate
FROM rated r CROSS JOIN prior p
"""

# rare-category collapse (lock-step with encoders.collapse_rare_categories:
# frequent = count >= 2000 (bites at sf0.01: purchase collapses, error survives); NULL stays NULL; rollup by collapsed value)
_COLLAPSE_RARE_SQL = f"""
WITH {_CONV_CTE},
freq AS (
    SELECT tool FROM conversations WHERE tool IS NOT NULL
    GROUP BY tool HAVING COUNT(*) >= 2000
),
collapsed AS (
    SELECT CASE WHEN c.tool IS NULL THEN NULL
                WHEN f.tool IS NOT NULL THEN c.tool
                ELSE '__other__' END AS tool_collapsed
    FROM conversations c LEFT JOIN freq f ON c.tool = f.tool
)
SELECT tool_collapsed, CAST(COUNT(*) AS BIGINT) AS n
FROM collapsed GROUP BY tool_collapsed
"""

# feature-label correlation (lock-step with encoders.feature_label_corr:
# UNION-ALL melt = the engine's explode; same co-moment shapes; abs on
# the ROUNDED corr)
_FEATURE_CORR_SQL = f"""
WITH base AS (
    SELECT CAST({_NTOK_RAW} AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars,
           ROUND(length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) * 1.0
                 / greatest(length(text), 1), 6) AS punct_ratio,
           CAST(source = 'src0' AS INTEGER) AS label
    FROM documents
),
melted AS (
    SELECT 'n_tokens' AS feature, CAST(n_tokens AS DOUBLE) AS x,
           CAST(label AS DOUBLE) AS y FROM base
    UNION ALL
    SELECT 'n_chars', CAST(n_chars AS DOUBLE), CAST(label AS DOUBLE) FROM base
    UNION ALL
    SELECT 'punct_ratio', punct_ratio, CAST(label AS DOUBLE) FROM base
),
acc AS (
    SELECT feature, COUNT(*) * 1.0 AS n, SUM(x) AS sx, SUM(y) AS sy,
           SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
    FROM melted WHERE x IS NOT NULL AND y IS NOT NULL GROUP BY feature
)
SELECT feature, CAST(n AS BIGINT) AS n,
       ROUND(CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) > 1e-12
                  THEN (n * sxy - sx * sy)
                       / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy))
             END, 6) AS corr,
       ABS(ROUND(CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) > 1e-12
                      THEN (n * sxy - sx * sy)
                           / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy))
                 END, 6)) AS abs_corr
FROM acc
"""

# label-noise screen (lock-step with calibration.label_noise_screen:
# hi=0.9 / lo=0.1 confident regions, integer disagreement counters)
_LABEL_NOISE_SQL = f"""
WITH {_PRED_CTE}
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN p >= 0.9 THEN 1 ELSE 0 END) AS BIGINT) AS n_conf_pos,
       CAST(SUM(CASE WHEN p <= 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS n_conf_neg,
       CAST(SUM(CASE WHEN p >= 0.9 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pos_disagree,
       CAST(SUM(CASE WHEN p <= 0.1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_neg_disagree,
       ROUND(CASE WHEN SUM(CASE WHEN p >= 0.9 THEN 1 ELSE 0 END) > 0
                  THEN SUM(CASE WHEN p >= 0.9 AND y = 0 THEN 1 ELSE 0 END) * 1.0
                       / SUM(CASE WHEN p >= 0.9 THEN 1 ELSE 0 END) END, 6)
           AS flip_rate_pos,
       ROUND(CASE WHEN SUM(CASE WHEN p <= 0.1 THEN 1 ELSE 0 END) > 0
                  THEN SUM(CASE WHEN p <= 0.1 AND y = 1 THEN 1 ELSE 0 END) * 1.0
                       / SUM(CASE WHEN p <= 0.1 THEN 1 ELSE 0 END) END, 6)
           AS flip_rate_neg
FROM preds
"""

# Murphy decomposition (lock-step with calibration.brier_decomposition:
# same right-closed bins as ECE; unbinned rows stay in ȳ and the
# weight denominator)
_BRIER_DECOMP_SQL = f"""
WITH {_PRED_CTE}, {_BINNED_CTE.format(n=10)},
per_bin AS (
    SELECT bin, COUNT(*) AS n, AVG(p) AS conf, AVG(y) AS acc
    FROM binned WHERE bin IS NOT NULL GROUP BY bin
),
totals AS (SELECT COUNT(*) AS nn, AVG(y) AS ybar FROM binned),
terms AS (
    SELECT ROUND(SUM(CAST(n AS DOUBLE) / nn * POW(conf - acc, 2)), 6)
               AS reliability,
           ROUND(SUM(CAST(n AS DOUBLE) / nn * POW(acc - ybar, 2)), 6)
               AS resolution,
           ROUND(MAX(ybar * (1.0 - ybar)), 6) AS uncertainty
    FROM per_bin CROSS JOIN totals
)
SELECT reliability, resolution, uncertainty,
       ROUND(reliability - resolution + uncertainty, 6) AS brier_binned
FROM terms
"""

# isotonic apply (lock-step with calibration.isotonic_apply: the full
# fit chain from _ISOTONIC_SQL + a (fold, bin) left join back onto the
# event-keyed binned stream)
_ISOTONIC_APPLY_SQL = f"""
WITH {_PRED_CTE}, {_BINNED_CTE.format(n=20)},
prof AS (
    SELECT fold, bin, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS sum_y
    FROM binned WHERE bin IS NOT NULL GROUP BY fold, bin
),
cum AS (
    SELECT fold, bin, n, sum_y,
           SUM(sum_y) OVER (PARTITION BY fold ORDER BY bin) AS cy,
           SUM(n) OVER (PARTITION BY fold ORDER BY bin) AS cn
    FROM prof
),
pairs AS (
    SELECT j.fold, j.bin AS jb, k.bin AS kb,
           CAST(k.cy - j.cy + j.sum_y AS DOUBLE) / (k.cn - j.cn + j.n) AS avg_jk
    FROM cum j JOIN cum k ON j.fold = k.fold AND j.bin <= k.bin
),
mins AS (
    SELECT i.fold, i.bin, p.jb, MIN(p.avg_jk) AS m
    FROM prof i JOIN pairs p
      ON p.fold = i.fold AND p.jb <= i.bin AND p.kb >= i.bin
    GROUP BY i.fold, i.bin, p.jb
),
iso AS (SELECT fold, bin, ROUND(MAX(m), 6) AS iso_prob
        FROM mins GROUP BY fold, bin),
rebinned AS (
    SELECT p.event_id, p.fold, p.p, p.y,
           CASE WHEN CEIL(p.p * 20) - 1 >= 0 AND CEIL(p.p * 20) - 1 < 20
                THEN CAST(CEIL(p.p * 20) - 1 AS INTEGER) END AS bin
    FROM preds p
)
SELECT r.event_id, r.fold, r.p, r.y, i.iso_prob AS p_cal
FROM rebinned r LEFT JOIN iso i ON r.fold = i.fold AND r.bin = i.bin
"""

# composed curation verdicts (lock-step with plans/curation.py:
# quality → lang → duplicate precedence; dedup key = h48 of the
# normalized full text; canonical = min doc_id per group)
def _curation_oracle(keep_lang: str = 'en') -> str:
    return f"""
WITH base AS (
    SELECT doc_id,
           CAST({_NTOK_RAW} AS BIGINT) AS n_tokens,
           ROUND(length(replace({_NORM}, ' ', '')) * 1.0
                 / greatest({_NTOK_RAW}, 1), 6) AS mean_word_len,
           ROUND(length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) * 1.0
                 / greatest(length(text), 1), 6) AS punct_ratio,
           {_H48.format(x=_NORM)} AS k
    FROM documents
),
quality AS (
    SELECT doc_id, n_tokens, k,
           ROUND(((CASE WHEN n_tokens BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END)
                + (CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.0 END)
                + (CASE WHEN mean_word_len BETWEEN 2 AND 12 THEN 1.0 ELSE 0.0 END)) / 3.0,
                 6) AS quality_score
    FROM base
),
lang AS ({_lang_id_oracle()}),
groups AS (
    SELECT k, MIN(doc_id) AS canonical_id, COUNT(*) AS dup_group_size
    FROM base GROUP BY k
)
SELECT q.doc_id, q.n_tokens, q.quality_score, l.pred_lang, g.dup_group_size,
       CASE WHEN q.quality_score < 0.666667 THEN 'low_quality'
            WHEN l.pred_lang <> '{keep_lang}' THEN 'wrong_lang'
            WHEN q.doc_id <> g.canonical_id THEN 'duplicate'
            ELSE 'kept' END AS verdict
FROM quality q
JOIN lang l USING (doc_id)
JOIN groups g ON q.k = g.k
"""


def _curation_report_oracle() -> str:
    return f"""
WITH curated AS ({_curation_oracle()})
SELECT verdict, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM curated GROUP BY verdict
"""


# deterministic stratified sampling (lock-step with
# operators/sampling.py: bucket = h48('sample:'||id) % 2^20,
# keep iff bucket < round(rate·2^20) per stratum)
_STRATIFIED_SAMPLE_SQL = f"""
WITH h AS (
    SELECT doc_id, source,
           ({_H48.format(x="concat('sample:', CAST(doc_id AS VARCHAR))")}) % 1048576 AS bucket
    FROM documents
)
SELECT doc_id, source FROM h
WHERE bucket < CASE source
    WHEN 'src0' THEN 1048576
    WHEN 'src1' THEN 524288
    WHEN 'src2' THEN 104858
    WHEN 'src3' THEN 0
    ELSE 262144 END
"""

# streaming drift counts (lock-step with _q_streaming_drift_counts:
# epoch-aligned hourly buckets keyed by epoch micros; append-mode
# closure = window_end <= max(ts) - 1h watermark delay)
_STREAMING_DRIFT_SQL = """
WITH base AS (
    SELECT CASE event_type WHEN 'signup' THEN 'system'
                           WHEN 'purchase' THEN 'assistant'
                           WHEN 'error' THEN 'tool'
                           ELSE 'user' END AS role,
           ts
    FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
maxts AS (SELECT MAX(epoch_us(ts)) AS m FROM base),
counts AS (
    SELECT CAST(floor(epoch_us(ts) / 3600000000) * 3600000000 AS BIGINT)
               AS window_start_us,
           role, COUNT(*) AS n
    FROM base GROUP BY 1, 2
)
SELECT window_start_us, role, n
FROM counts CROSS JOIN maxts
WHERE window_start_us + 3600000000 <= m - 3600000000
"""

_STREAMING_HOPPING_SQL = """
WITH base AS (
    SELECT ts FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
maxts AS (SELECT MAX(epoch_us(ts)) AS m FROM base),
assigned AS (
    -- hopping 2h/1h: each event belongs to 2 overlapping windows,
    -- starts floor(us/S)*S and floor(us/S)*S - S (S = 1h)
    SELECT CAST(floor(epoch_us(ts) / 3600000000) * 3600000000
                - k * 3600000000 AS BIGINT) AS window_start_us
    FROM base, (SELECT unnest([0, 1]) AS k)
),
counts AS (
    SELECT window_start_us, CAST(COUNT(*) AS BIGINT) AS n
    FROM assigned GROUP BY 1
)
SELECT window_start_us, n
FROM counts CROSS JOIN maxts
WHERE window_start_us + 7200000000 <= m - 3600000000
"""

_STREAMING_ENRICHED_SQL = """
WITH base AS (
    SELECT CASE event_type WHEN 'signup' THEN 'onboarding'
                           WHEN 'purchase' THEN 'commerce'
                           WHEN 'error' THEN 'ops'
                           ELSE 'other' END AS family,
           ts
    FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
maxts AS (SELECT MAX(epoch_us(ts)) AS m FROM base),
counts AS (
    SELECT CAST(floor(epoch_us(ts) / 3600000000) * 3600000000 AS BIGINT)
               AS window_start_us,
           family, COUNT(*) AS n
    FROM base GROUP BY 1, 2
)
SELECT window_start_us, family, n
FROM counts CROSS JOIN maxts
WHERE window_start_us + 3600000000 <= m - 3600000000
"""

# stream-stream range-join oracle: plain batch range join (inner
# append-mode stream joins emit every match over a bounded replay)
_STREAMING_PAIRS_SQL = """
WITH t AS (
    SELECT concat('c', user_id) AS conv_id,
           event_id AS turn_idx,
           CASE event_type WHEN 'signup' THEN 'system'
                           WHEN 'purchase' THEN 'assistant'
                           WHEN 'error' THEN 'tool'
                           ELSE 'user' END AS role,
           ts
    FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
)
SELECT u.conv_id,
       u.turn_idx AS u_idx,
       a.turn_idx AS a_idx,
       epoch_us(a.ts) - epoch_us(u.ts) AS reply_delay_us
FROM t u JOIN t a
  ON u.conv_id = a.conv_id
 AND a.ts > u.ts AND a.ts <= u.ts + INTERVAL 2 HOUR
WHERE u.role = 'user' AND a.role = 'assistant'
"""

# per-doc mean unigram log-probability (lock-step with
# textstats.unigram_logprob_score: self-corpus distribution,
# lp = ln(c_term / T))
# leakage-safe fold scaling (lock-step with encoders.fold_standardize:
# stats from train rows ONLY; constant-train → 0.0; no-train fold →
# NULL; same 'cv:' hash coin, thr=262144 = 0.25·2^20)
_FOLD_STANDARDIZE_SQL = f"""
WITH {_CONV_CTE},
per AS (
    SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_turns, MIN(ts) AS first_ts
    FROM conversations GROUP BY conv_id
),
feat AS (
    SELECT conv_id, strftime(first_ts, '%Y-%m') AS fold, n_turns,
           CASE WHEN ({_H48.format(x="concat('cv:', conv_id)")}) % 1048576 < 262144
                THEN 'val' ELSE 'train' END AS split
    FROM per
),
stats AS (
    SELECT fold, AVG(n_turns) AS mu, STDDEV_SAMP(n_turns) AS sd
    FROM feat WHERE split = 'train' GROUP BY fold
)
SELECT f.conv_id, f.fold, f.n_turns, f.split,
       ROUND(CASE WHEN sd IS NOT NULL AND sd > 1e-12
                  THEN (n_turns - mu) / sd
                  WHEN mu IS NOT NULL THEN 0.0 END, 6) AS n_turns_z
FROM feat f LEFT JOIN stats USING (fold)
"""

# fightin'-words distinctive terms (lock-step with
# textstats.distinctive_terms: α=0.5 Dirichlet prior, SE-scaled
# log-odds, min_count pruning BEFORE the prior, top/bottom-25 on the
# ROUNDED z with term tiebreak)
_DISTINCTIVE_TERMS_SQL = f"""
WITH toks AS (
    SELECT (source = 'src0') AS t, unnest({_TOKS}) AS term FROM documents
),
counts AS (
    SELECT term,
           SUM(CASE WHEN t THEN 1 ELSE 0 END) AS yt,
           SUM(CASE WHEN t THEN 0 ELSE 1 END) AS yr
    FROM toks GROUP BY term
    HAVING SUM(CASE WHEN t THEN 1 ELSE 0 END)
           + SUM(CASE WHEN t THEN 0 ELSE 1 END) >= 5
),
tot AS (SELECT SUM(yt) AS nt, SUM(yr) AS nr,
               CAST(COUNT(*) AS BIGINT) AS v FROM counts),
scored AS (
    SELECT term, CAST(yt AS BIGINT) AS yt, CAST(yr AS BIGINT) AS yr,
           ROUND((LN((yt + 0.5) / (nt + 0.5 * v - yt - 0.5))
                  - LN((yr + 0.5) / (nr + 0.5 * v - yr - 0.5)))
                 / SQRT(1.0 / (yt + 0.5) + 1.0 / (yr + 0.5)), 6) AS z
    FROM counts CROSS JOIN tot
),
top AS (SELECT *, 'target' AS side FROM scored ORDER BY z DESC, term LIMIT 25),
bottom AS (SELECT *, 'rest' AS side FROM scored ORDER BY z ASC, term LIMIT 25)
SELECT * FROM top UNION ALL SELECT * FROM bottom
"""

# DSIR importance weights (lock-step with textstats.dsir_scores: same
# 48-bit-hash buckets % 4096, add-0.5 smoothing, same operand shapes —
# (c + 0.5)/(T + 0.5·4096) with T summed as DOUBLE)
_DSIR_SQL = f"""
WITH toks AS (
    SELECT doc_id, t, ({_H48.format(x="w")}) % 4096 AS b
    FROM (SELECT doc_id, (source = 'src0') AS t, unnest({_TOKS}) AS w
          FROM documents)
),
buckets AS (
    SELECT b, SUM(CASE WHEN t THEN 1 ELSE 0 END) AS tc,
           SUM(CASE WHEN t THEN 0 ELSE 1 END) AS rc
    FROM toks GROUP BY b
),
tot AS (SELECT SUM(tc) * 1.0 AS tt, SUM(rc) * 1.0 AS tr FROM buckets),
logw AS (
    SELECT b, LN((tc + 0.5) / (tt + 0.5 * 4096))
              - LN((rc + 0.5) / (tr + 0.5 * 4096)) AS lw
    FROM buckets, tot
)
SELECT k.doc_id, CAST(COUNT(*) AS BIGINT) AS n_scored_tokens,
       ROUND(AVG(lw), 6) AS dsir_logratio
FROM toks k JOIN logw USING (b)
GROUP BY k.doc_id
"""

_UNIGRAM_LOGPROB_SQL = f"""
WITH toks AS (
    SELECT doc_id, unnest({_TOKS}) AS term FROM documents
),
vocab AS (SELECT term, COUNT(*) AS c FROM toks GROUP BY term),
total AS (SELECT SUM(c) AS t FROM vocab),
scored AS (
    SELECT doc_id, LN(CAST(c AS DOUBLE) / t) AS lp
    FROM toks JOIN vocab USING (term) CROSS JOIN total
)
SELECT doc_id, COUNT(*) AS n_scored_tokens,
       ROUND(AVG(lp), 6) AS avg_token_logprob
FROM scored GROUP BY doc_id
"""

# interpolated bigram LM (lock-step with textstats.bigram_logprob_score:
# normalized tokens, context counts from the bigram table, λ=0.7 with
# the exact float64 literals Spark computes — 1.0-0.7 is
# 0.30000000000000004 — and the same operator association)
_BIGRAM_LOGPROB_SQL = f"""
WITH tok AS (
    SELECT doc_id, {_TOKS} AS ws FROM documents
),
bg AS (
    SELECT doc_id, unnest(list_transform(range(1, len(ws)),
                                         i -> ws[i] || ' ' || ws[i + 1])) AS bigram
    FROM tok WHERE len(ws) >= 2
),
words AS (SELECT unnest(ws) AS w FROM tok),
wc AS (SELECT w, COUNT(*) AS c FROM words GROUP BY w),
bcnt AS (SELECT bigram, COUNT(*) AS c12 FROM bg GROUP BY bigram),
ctx AS (
    SELECT string_split(bigram, ' ')[1] AS w1, SUM(c12) AS c1
    FROM bcnt GROUP BY 1
),
tot AS (SELECT SUM(c) AS t FROM wc),
probs AS (
    SELECT b.bigram,
           LN((0.69999999999999996e0 * b.c12) / c1
              + (0.30000000000000004e0 * w2c.c) / t) AS lp
    FROM bcnt b
    JOIN ctx ON ctx.w1 = string_split(b.bigram, ' ')[1]
    JOIN wc w2c ON w2c.w = string_split(b.bigram, ' ')[2]
    CROSS JOIN tot
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(AVG(lp), 6) AS avg_bigram_logprob
FROM bg JOIN probs USING (bigram)
GROUP BY doc_id
"""

# transcript → document assembly (lock-step with
# assemble.assemble_documents: role-tagged lines joined by \n in
# (ts, turn_idx) order; t0/t1 as epoch micros — TZ-free)
_ASSEMBLE_SQL = f"""
WITH {_CONV_CTE}
SELECT conv_id,
       string_agg(concat(role, ': ', text), chr(10) ORDER BY ts, turn_idx) AS doc,
       COUNT(*) AS n_turns,
       MIN(epoch_us(ts)) AS t0_us,
       MAX(epoch_us(ts)) AS t1_us
FROM conversations
GROUP BY conv_id
"""

# transcripts → assembly → curation, end to end: the inner curation
# SQL references a table named `documents`; the CTE of that name here
# SHADOWS the registered view, so the identical curation oracle runs
# over the assembled corpus instead (DuckDB resolves CTEs first)
def _corpus_pipeline_oracle() -> str:
    return f"""
WITH {_CONV_CTE},
documents AS (
    SELECT conv_id AS doc_id,
           string_agg(concat(role, ': ', text), chr(10)
                      ORDER BY ts, turn_idx) AS text
    FROM conversations GROUP BY conv_id
),
curated AS ({_curation_oracle(keep_lang='und')})
SELECT * FROM curated
"""


# int8 embedding quantization (lock-step with
# similarity.quantize_embeddings: scale=(hi-lo)/255, q=round((x-lo)/scale))
_QUANTIZE_SQL = """
WITH dims AS (SELECT unnest(generate_series(1, 64)) AS dim),
v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
mm AS (SELECT vec_id, e, list_min(e) AS lo, list_max(e) AS hi FROM v)
SELECT vec_id, CAST(dim - 1 AS INTEGER) AS dim,
       CASE WHEN hi > lo
            THEN CAST(ROUND((e[dim] - lo) / ((hi - lo) / 255.0)) AS INTEGER)
            ELSE 0 END AS q,
       ROUND((hi - lo) / 255.0, 9) AS scale,
       ROUND(lo, 9) AS "offset"
FROM mm CROSS JOIN dims
"""

# per-conv assistant response latency (lock-step with
# lags.response_latency: earliest later assistant turn per user turn)
_RESPONSE_LATENCY_SQL = f"""
WITH {_CONV_CTE},
lat AS (
    SELECT conv_id,
           MIN(CASE WHEN role = 'assistant' THEN epoch_us(ts) END)
               OVER (PARTITION BY conv_id ORDER BY ts, turn_idx
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
             - epoch_us(ts) AS l,
           role
    FROM conversations
)
SELECT conv_id,
       COUNT(*) AS n_exchanges,
       CAST(SUM(l) // COUNT(*) AS BIGINT) AS avg_latency_us,
       CAST(MAX(l) AS BIGINT) AS max_latency_us
FROM lat WHERE role = 'user' AND l IS NOT NULL
GROUP BY conv_id
"""

# per-cluster mean embeddings (lock-step with
# similarity.cluster_centroids; dims fixed at 64 by the testdata
# schema — the engine side reads the width from the vector itself)
_CLUSTER_CENTROIDS_SQL = f"""
WITH dims AS (SELECT unnest(generate_series(1, 64)) AS dim),
c AS (SELECT CAST({_BUCKET.format(e='embedding')} AS INTEGER) AS bucket, embedding
      FROM embeddings),
sizes AS (SELECT bucket, COUNT(*) AS n_members FROM c GROUP BY bucket),
expl AS (
    SELECT bucket, dim, CAST(embedding[dim] AS DOUBLE) AS v
    FROM c CROSS JOIN dims
)
SELECT e.bucket, CAST(e.dim - 1 AS INTEGER) AS dim,
       ROUND(AVG(v), 6) AS centroid, s.n_members
FROM expl e JOIN sizes s USING (bucket)
GROUP BY e.bucket, e.dim, s.n_members
"""

# embedding diversity (lock-step with similarity.embedding_diversity:
# mean||x||² and ||μ||² EACH rounded 6dp before subtraction; centroid
# from 6-rounded per-dim means; trace clamped ≥0 before sqrt)
_EMB_DIVERSITY_SQL = f"""
WITH dims AS (SELECT unnest(generate_series(1, 64)) AS dim),
base AS (SELECT label, embedding FROM embeddings),
per AS (
    -- order-free integer-grid sums, lock-step with the engine's r5
    -- rewrite (raw AVG/SUM doubles were partition-order-dependent
    -- and hit a 6dp rounding boundary at fuzz seed 1234)
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vectors,
           ROUND(CAST(SUM(CAST(ROUND(list_dot_product(CAST(embedding AS DOUBLE[]),
                                                      CAST(embedding AS DOUBLE[]))
                                     * 1000000.0) AS BIGINT)) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) / 1000000.0, 6) AS msq
    FROM base GROUP BY label
),
expl AS (
    SELECT label, dim, CAST(embedding[dim] AS DOUBLE) AS v
    FROM base CROSS JOIN dims
),
cent AS (SELECT label, dim, ROUND(AVG(v), 6) AS c FROM expl GROUP BY label, dim),
musq AS (SELECT label,
                ROUND(CAST(SUM(CAST(ROUND(c * c * 1000000000.0) AS BIGINT)) AS DOUBLE)
                      / 1000000000.0, 6) AS ms
         FROM cent GROUP BY label)
SELECT p.label, p.n_vectors,
       ROUND(p.msq - m.ms, 6) AS trace_variance,
       ROUND(SQRT(GREATEST(ROUND(p.msq - m.ms, 6), 0.0)), 6) AS rms_radius
FROM per p JOIN musq m USING (label)
"""

# benchmark decontamination (lock-step with dedup.decontaminate:
# every 50th doc = eval set, flag corpus docs sharing >= 2 tri-gram
# shingle hashes, eval_frac = n_common / |eval shingles|)
_DECONTAMINATE_SQL = f"""
WITH {_shingle_cte(3)},
shh AS (SELECT doc_id, {_H48.format(x='shingle')} AS shingle FROM sh),
c AS (SELECT doc_id, shingle FROM shh WHERE doc_id % 50 <> 0),
e AS (SELECT doc_id AS eval_id, shingle FROM shh WHERE doc_id % 50 = 0),
es AS (SELECT eval_id, COUNT(*) AS n_eval_sh FROM e GROUP BY eval_id),
hits AS (
    SELECT c.doc_id, e.eval_id, COUNT(*) AS n_common
    FROM c JOIN e USING (shingle)
    GROUP BY c.doc_id, e.eval_id
    HAVING COUNT(*) >= 2
)
SELECT doc_id, eval_id, n_common,
       ROUND(n_common * 1.0 / n_eval_sh, 6) AS eval_frac
FROM hits JOIN es USING (eval_id)
"""

# smooth TF-IDF top terms (lock-step with textstats.tfidf_top_terms:
# idf = ln((1+N)/(1+df)) + 1, tiebreak score desc then term asc)
_TFIDF_SQL = f"""
WITH toks AS (
    SELECT doc_id, unnest({_TOKS}) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
    SELECT t.doc_id, t.term, t.tf, d.df,
           ROUND(t.tf * (LN((1.0 + n_docs) / (1.0 + d.df)) + 1.0), 6) AS tfidf
    FROM tf t JOIN dfreq d USING (term) CROSS JOIN n
),
ranked AS (
    SELECT *, CAST(row_number() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS INTEGER) AS rank
    FROM scored
)
SELECT doc_id, term, tf, df, tfidf, rank FROM ranked WHERE rank <= 3
"""

# blocked fuzzy near-dup (lock-step with dedup.fuzzy_pairs:
# prefix-16 + len-band-8 blocking, block cap 1000, levenshtein <= 6;
# DuckDB levenshtein == Spark levenshtein == unit-cost edit distance)
_FUZZY_PAIRS_SQL = f"""
WITH n AS (SELECT doc_id, {_NORM} AS norm FROM documents),
k AS (
    SELECT doc_id, norm, substr(norm, 1, 16) AS pfx,
           CAST(floor(length(norm) / 8) AS BIGINT) AS band
    FROM n
),
sz AS (SELECT pfx, band, COUNT(*) AS c FROM k GROUP BY 1, 2),
kk AS (SELECT k.* FROM k JOIN sz USING (pfx, band) WHERE c <= 1000)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.norm, b.norm) AS BIGINT) AS lev_dist
FROM kk a JOIN kk b ON a.pfx = b.pfx AND a.band = b.band
                    AND a.doc_id < b.doc_id
WHERE levenshtein(a.norm, b.norm) <= 6
"""


# per-conversation exact gap percentiles (lock-step with
# lags.gap_percentiles_per_conv: Spark `percentile` and DuckDB
# `quantile_cont` both use linear interpolation on the sorted values)
_GAP_PCTL_SQL = f"""
WITH {_CONV_CTE},
g AS (
    SELECT conv_id,
           epoch_us(ts) - epoch_us(lag(ts) OVER (
               PARTITION BY conv_id ORDER BY ts, turn_idx)) AS gap
    FROM conversations
)
SELECT conv_id, COUNT(*) AS n_gaps,
       ROUND(quantile_cont(gap, 0.5), 6) AS gap_p50_us,
       ROUND(quantile_cont(gap, 0.9), 6) AS gap_p90_us
FROM g WHERE gap IS NOT NULL GROUP BY conv_id
"""


_VOCAB_OOV_SQL = f"""
WITH toks AS (
    SELECT doc_id, unnest({_TOKS}) AS term FROM documents
),
counts AS (SELECT term, COUNT(*) AS cnt FROM toks GROUP BY term),
vocab AS (
    SELECT term FROM (
        SELECT term, row_number() OVER (ORDER BY cnt DESC, term ASC) AS r
        FROM counts
    ) WHERE r <= 32
)
SELECT t.doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN v.term IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_in_vocab,
       ROUND((COUNT(*) - SUM(CASE WHEN v.term IS NOT NULL THEN 1 ELSE 0 END))
             / COUNT(*), 6) AS oov_rate
FROM toks t LEFT JOIN vocab v ON t.term = v.term
GROUP BY t.doc_id
"""


def _bm25_oracle(
    terms: tuple[str, ...], k: int = 20, k1: float = 1.2, b: float = 0.75
) -> str:
    """Okapi BM25 oracle, lock-step with ``textstats.bm25_scores``:
    same conditional-agg shape, same expression order, and every float
    literal emitted as a 17-significant-digit DOUBLE (``...e0``) so
    DuckDB cannot parse it as DECIMAL and change the arithmetic."""

    def d(v: float) -> str:
        return f"{v:.17g}e0"

    tf_cols = ",\n           ".join(
        f"SUM(CASE WHEN term = '{t}' THEN 1 ELSE 0 END) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ",\n           ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(terms))
    )
    hit = " + ".join(
        f"(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)" for i in range(len(terms))
    )
    contribs = " + ".join(
        f"(CASE WHEN tf{i} > 0 THEN "
        f"LN((n_docs - df{i} + {d(0.5)}) / (df{i} + {d(0.5)}) + {d(1.0)}) * "
        f"((tf{i} * {d(k1 + 1.0)}) / "
        f"(tf{i} + {d(k1)} * ({d(1.0 - b)} + {d(b)} * (dl / avgdl)))) "
        f"ELSE {d(0.0)} END)"
        for i in range(len(terms))
    )
    return f"""
WITH toks AS (
    SELECT doc_id, unnest({_TOKS}) AS term FROM documents
),
per_doc AS (
    SELECT doc_id, COUNT(*) AS dl,
           {tf_cols}
    FROM toks GROUP BY doc_id
),
stats AS (
    SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl,
           {df_cols}
    FROM per_doc
),
scored AS (
    SELECT doc_id,
           CAST({hit} AS INTEGER) AS n_terms_hit,
           dl,
           ROUND({contribs}, 6) AS bm25
    FROM per_doc CROSS JOIN stats
),
ranked AS (
    SELECT doc_id, n_terms_hit, dl, bm25,
           CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS INTEGER) AS rank
    FROM scored WHERE n_terms_hit > 0
)
SELECT doc_id, n_terms_hit, dl, bm25, rank FROM ranked WHERE rank <= {int(k)}
"""


# per-group cap (lock-step with sampling.capped_per_group: rank by
# hash bucket with id tiebreak, keep rank <= k)
_CAPPED_PER_SOURCE_SQL = f"""
WITH ranked AS (
    SELECT doc_id, source,
           row_number() OVER (
               PARTITION BY source
               ORDER BY ({_H48.format(x="concat('cap:', CAST(doc_id AS VARCHAR))")}) % 1048576,
                        doc_id) AS rk
    FROM documents
)
SELECT doc_id, source FROM ranked WHERE rk <= 10
"""

# weighted k-sample per group (lock-step with
# sampling.weighted_sample_per_group: u = (bucket+0.5)/2^20,
# key = round(ln(u)/w, 9), top-k by key desc with id tiebreak)
_WEIGHTED_SAMPLE_SQL = f"""
WITH keyed AS (
    SELECT doc_id, source, n_chars,
           CASE WHEN n_chars > 0 THEN
             ROUND(LN(((({_H48.format(x="concat('wsample:', CAST(doc_id AS VARCHAR))")}) % 1048576)
                       + 0.5) / 1048576.0) / n_chars, 9)
           ELSE CAST('-inf' AS DOUBLE) END AS wkey
    FROM documents
),
ranked AS (
    SELECT doc_id, source, n_chars,
           row_number() OVER (PARTITION BY source
                              ORDER BY wkey DESC, doc_id) AS rk
    FROM keyed
)
SELECT doc_id, source, n_chars FROM ranked WHERE rk <= 5
"""

# deterministic sequence packing (lock-step with operators/packing.py:
# shard = h48(id) % 8, offset = running token sum before the doc in
# doc_id order within shard, bin = floor(offset / 512))
_PACK_DOCUMENTS_SQL = f"""
WITH toks AS (
    SELECT doc_id, CAST({_NTOK_RAW} AS BIGINT) AS n_tokens,
           ({_H48.format(x="CAST(doc_id AS VARCHAR)")}) % 8 AS shard
    FROM documents
),
cum AS (
    SELECT doc_id, shard, n_tokens,
           CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
                - n_tokens AS BIGINT) AS "offset"
    FROM toks
)
SELECT doc_id, shard, "offset",
       CAST(FLOOR("offset" / 512.0) AS BIGINT) AS pack_bin,
       n_tokens,
       CAST(n_tokens > 512 AS INTEGER) AS oversize
FROM cum
"""

# fixed-token-window chunking (lock-step with operators/chunking.py:
# integer ceil-div chunk count, chunk every 64 tokens, 256-token
# windows, tail truncated at n_tokens; generate_series is inclusive
# on both ends, matching Spark F.sequence)
_CHUNK_DOCUMENTS_SQL = f"""
WITH toks AS (
    SELECT doc_id, CAST({_NTOK_RAW} AS BIGINT) AS n_tokens FROM documents
),
base AS (
    SELECT doc_id, n_tokens,
           1 + (greatest(n_tokens - 256, 0) + 63) // 64 AS n_chunks
    FROM toks
),
exploded AS (
    SELECT doc_id, n_tokens,
           unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
    FROM base
)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(chunk_idx * 64 AS BIGINT) AS chunk_start,
       CAST(least(chunk_idx * 64 + 256, n_tokens) AS BIGINT) AS chunk_end,
       CAST(least(chunk_idx * 64 + 256, n_tokens) - chunk_idx * 64 AS BIGINT)
           AS chunk_tokens
FROM exploded
"""

# ROLLUP(role, tool) hierarchy in one pass; GROUPING() bit order
# (first key = most significant) matches Spark grouping_id()
_ROLLUP_ACTIVITY_SQL = f"""
WITH {_CONV_CTE}
SELECT role, tool,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(length(text) AS BIGINT)) AS BIGINT) AS measure_sum,
       CAST(GROUPING(role, tool) AS BIGINT) AS gid
FROM conversations
GROUP BY ROLLUP(role, tool)
"""

_CUBE_ACTIVITY_SQL = f"""
WITH {_CONV_CTE}
SELECT role, tool,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(length(text) AS BIGINT)) AS BIGINT) AS measure_sum,
       CAST(GROUPING(role, tool) AS BIGINT) AS gid
FROM conversations
GROUP BY CUBE(role, tool)
"""

_SET_OPS_SQL = f"""
WITH {_CONV_CTE},
l AS (SELECT DISTINCT conv_id FROM conversations WHERE role = 'user'),
r AS (SELECT DISTINCT conv_id FROM conversations WHERE tool IS NOT NULL)
SELECT 'left_only' AS set_op, conv_id FROM (SELECT conv_id FROM l EXCEPT SELECT conv_id FROM r)
UNION ALL
SELECT 'both', conv_id FROM (SELECT conv_id FROM l INTERSECT SELECT conv_id FROM r)
UNION ALL
SELECT 'right_only', conv_id FROM (SELECT conv_id FROM r EXCEPT SELECT conv_id FROM l)
"""

# SCD2 gaps-and-islands: run_idx = running sum of null-safe change
# flags (first row always flags); lead() over the COMPRESSED runs for
# the half-open interval ends (lock-step with operators/scd.py)
_SCD2_ROLE_INTERVALS_SQL = f"""
WITH {_CONV_CTE},
flagged AS (
    SELECT conv_id, turn_idx, role, ts,
           CASE WHEN row_number() OVER w = 1 THEN 1
                WHEN role IS DISTINCT FROM lag(role) OVER w THEN 1
                ELSE 0 END AS chg
    FROM conversations
    WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
runs AS (
    SELECT *, SUM(chg) OVER (PARTITION BY conv_id ORDER BY turn_idx
                             ROWS UNBOUNDED PRECEDING) - 1 AS run_idx
    FROM flagged
),
compressed AS (
    SELECT conv_id, CAST(run_idx AS BIGINT) AS run_idx, role,
           MIN(turn_idx) AS from_turn_idx,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(ts) AS valid_from
    FROM runs GROUP BY conv_id, run_idx, role
)
SELECT conv_id, run_idx, role, from_turn_idx,
       lead(from_turn_idx) OVER w2 AS to_turn_idx,
       n_rows, valid_from,
       lead(valid_from) OVER w2 AS valid_to
FROM compressed
WINDOW w2 AS (PARTITION BY conv_id ORDER BY run_idx)
"""

# turns ⋈ their own closed session spans (containment join); the
# Spark side goes through the (conv_id, day-bucket) equi-join rewrite,
# the oracle states the containment predicate directly — identical
# results because sessions are disjoint per conversation
_INTERVAL_SESSION_JOIN_SQL = f"""
WITH {_CONV_CTE},
flagged AS (
    SELECT conv_id, turn_idx, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                THEN 1 ELSE 0 END AS ns
    FROM conversations
    WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx)
),
sess AS (
    SELECT *, CAST(SUM(ns) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx
                                 ROWS UNBOUNDED PRECEDING) - 1 AS INTEGER) AS session_id
    FROM flagged
),
spans AS (
    SELECT conv_id, session_id, MIN(ts) AS s_start, MAX(ts) AS s_end,
           CAST(COUNT(*) AS BIGINT) AS s_turns
    FROM sess GROUP BY conv_id, session_id
)
SELECT t.conv_id, t.turn_idx, s.session_id, s.s_start, s.s_end, s.s_turns
FROM conversations t
JOIN spans s ON t.conv_id = s.conv_id
            AND t.ts >= s.s_start AND t.ts <= s.s_end
"""

# dense daily resample with forward fill (lock-step with
# operators/resample.py: wall-clock day buckets, last-of-day by
# (ts, turn_idx), gap days n_rows=0, IGNORE NULLS carry)
_RESAMPLE_DAILY_SQL = f"""
WITH {_CONV_CTE},
ranked AS (
    SELECT conv_id, CAST(ts AS DATE) AS d, role,
           row_number() OVER (PARTITION BY conv_id, CAST(ts AS DATE)
                              ORDER BY ts DESC, turn_idx DESC) AS rn
    FROM conversations
),
counts AS (
    SELECT conv_id, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM conversations GROUP BY conv_id, CAST(ts AS DATE)
),
lastv AS (SELECT conv_id, d, role AS last_role FROM ranked WHERE rn = 1),
spans AS (SELECT conv_id, MIN(d) AS d0, MAX(d) AS d1 FROM counts GROUP BY conv_id),
grid AS (
    SELECT conv_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
    FROM spans
)
SELECT g.conv_id, CAST(g.d AS TIMESTAMP) AS bucket_ts,
       CAST(COALESCE(c.n_rows, 0) AS BIGINT) AS n_rows,
       last_value(l.last_role IGNORE NULLS)
           OVER (PARTITION BY g.conv_id ORDER BY g.d
                 ROWS UNBOUNDED PRECEDING) AS role_ffill
FROM grid g
LEFT JOIN counts c ON g.conv_id = c.conv_id AND g.d = c.d
LEFT JOIN lastv  l ON g.conv_id = l.conv_id AND g.d = l.d
"""

# repetition/boilerplate stats (lock-step with
# operators/textstats.py::repetition_stats: whitespace words, ordered
# bigrams with duplicates kept, entropy via log2 n − Σc·log2 c / n)
_REPETITION_STATS_SQL = r"""
WITH words AS (
    SELECT doc_id, unnest(string_split(trim(regexp_replace(text, '[ \t\n\x0B\f\r]+', ' ', 'g')), ' ')) AS w
    FROM documents WHERE trim(regexp_replace(text, '[ \t\n\x0B\f\r]+', ' ', 'g')) <> ''
),
wc AS (SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY doc_id, w),
wstats AS (
    SELECT doc_id, SUM(c) AS n, COUNT(*) AS nd, MAX(c) AS topc,
           SUM(c * log2(c)) AS clog
    FROM wc GROUP BY doc_id
),
tok AS (
    SELECT doc_id, string_split(trim(regexp_replace(text, '[ \t\n\x0B\f\r]+', ' ', 'g')), ' ') AS ws
    FROM documents WHERE trim(regexp_replace(text, '[ \t\n\x0B\f\r]+', ' ', 'g')) <> ''
),
bigrams AS (
    SELECT doc_id,
           unnest(list_transform(range(1, len(ws)),
                                 i -> ws[i] || ' ' || ws[i + 1])) AS g
    FROM tok WHERE len(ws) >= 2
),
bc AS (SELECT doc_id, g, COUNT(*) AS c FROM bigrams GROUP BY doc_id, g),
bstats AS (SELECT doc_id, SUM(c) AS bn, COUNT(*) AS bnd FROM bc GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(w.n, 0) AS BIGINT) AS n_words,
       CAST(COALESCE(CASE WHEN w.n > 0 THEN 1.0 - w.nd / w.n END, 0.0)
            AS DOUBLE) AS dup_word_frac,
       CAST(COALESCE(CASE WHEN w.n > 0 THEN topc / w.n END, 0.0)
            AS DOUBLE) AS top_word_frac,
       CAST(COALESCE(CASE WHEN w.n > 0 THEN log2(w.n) - clog / w.n END, 0.0)
            AS DOUBLE) AS word_entropy,
       CAST(COALESCE(b.bn, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(CASE WHEN b.bn > 0 THEN 1.0 - b.bnd / b.bn END, 0.0)
            AS DOUBLE) AS dup_bigram_frac
FROM documents d
LEFT JOIN wstats w ON d.doc_id = w.doc_id
LEFT JOIN bstats b ON d.doc_id = b.doc_id
"""

# bigram PMI collocations (lock-step with
# operators/textstats.py::bigram_pmi: occurrence-count probabilities,
# integer min_count threshold, PMI annotation in log2)
_BIGRAM_PMI_SQL = r"""
WITH words AS (
    SELECT unnest(string_split(trim(regexp_replace(text, '[ \t\n\x0B\f\r]+', ' ', 'g')), ' ')) AS w
    FROM documents WHERE trim(regexp_replace(text, '[ \t\n\x0B\f\r]+', ' ', 'g')) <> ''
),
tok AS (
    SELECT string_split(trim(regexp_replace(text, '[ \t\n\x0B\f\r]+', ' ', 'g')), ' ') AS ws
    FROM documents WHERE trim(regexp_replace(text, '[ \t\n\x0B\f\r]+', ' ', 'g')) <> ''
),
bigrams AS (
    SELECT unnest(list_transform(range(1, len(ws)),
                                 i -> ws[i] || ' ' || ws[i + 1])) AS g
    FROM tok WHERE len(ws) >= 2
),
wc AS (SELECT w, COUNT(*) AS c FROM words GROUP BY w),
bcnt AS (
    SELECT g, COUNT(*) AS c12 FROM bigrams GROUP BY g
    HAVING COUNT(*) >= 20
),
tots AS (
    SELECT (SELECT COUNT(*) FROM words) AS nw,
           (SELECT COUNT(*) FROM bigrams) AS nb
)
SELECT string_split(g, ' ')[1] AS w1,
       string_split(g, ' ')[2] AS w2,
       CAST(c12 AS BIGINT) AS c12,
       CAST(log2((c12 / CAST(nb AS DOUBLE))
                 / ((c1.c / CAST(nw AS DOUBLE)) * (c2.c / CAST(nw AS DOUBLE))))
            AS DOUBLE) AS pmi
FROM bcnt, tots
JOIN wc c1 ON c1.w = string_split(g, ' ')[1]
JOIN wc c2 ON c2.w = string_split(g, ' ')[2]
"""

# Morton keys via the same spread-bits shift/mask chain as
# operators/layout.py (staged CTEs instead of nested expressions)
_ZORDER_KEYS_SQL = """
WITH pts AS (
    SELECT event_id,
           CAST(user_id % 65536 AS BIGINT) AS x,
           CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 65536
                AS BIGINT) AS y
    FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
s1 AS (SELECT event_id, x, y,
              ((x << 8) | x) & 16711935 AS sx, ((y << 8) | y) & 16711935 AS sy
       FROM pts),
s2 AS (SELECT event_id, x, y,
              ((sx << 4) | sx) & 252645135 AS sx, ((sy << 4) | sy) & 252645135 AS sy
       FROM s1),
s3 AS (SELECT event_id, x, y,
              ((sx << 2) | sx) & 858993459 AS sx, ((sy << 2) | sy) & 858993459 AS sy
       FROM s2),
s4 AS (SELECT event_id, x, y,
              ((sx << 1) | sx) & 1431655765 AS sx, ((sy << 1) | sy) & 1431655765 AS sy
       FROM s3)
SELECT event_id, x, y, CAST((sy << 1) | sx AS BIGINT) AS zval FROM s4
"""

# per-column profile; one small SELECT per column unioned (the oracle
# states semantics — the Spark side is the one-pass/no-Expand plan)
_PROFILE_ORDERS_SQL = """
SELECT 'o_orderkey' AS "column", COUNT(*) AS n_rows,
       COUNT(*) - COUNT(o_orderkey) AS n_null,
       COUNT(DISTINCT o_orderkey) AS n_distinct,
       CAST(MIN(o_orderkey) AS VARCHAR) AS min_str,
       CAST(MAX(o_orderkey) AS VARCHAR) AS max_str
FROM orders
UNION ALL
SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
       COUNT(DISTINCT o_custkey),
       CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
       COUNT(DISTINCT o_orderstatus),
       CAST(MIN(o_orderstatus) AS VARCHAR), CAST(MAX(o_orderstatus) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
       COUNT(DISTINCT o_totalprice),
       CAST(MIN(o_totalprice) AS VARCHAR), CAST(MAX(o_totalprice) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
       COUNT(DISTINCT o_orderpriority),
       CAST(MIN(o_orderpriority) AS VARCHAR), CAST(MAX(o_orderpriority) AS VARCHAR)
FROM orders
"""

# out-of-fold target encoding (lock-step with
# operators/encoders.py::target_encode_oof at smoothing=0: leave-one-
# fold-out sums from category-window totals; absent-category fallback
# to the out-of-fold global prior)
_TARGET_ENCODE_ROLE_SQL = f"""
WITH {_CONV_CTE},
base AS (
    SELECT conv_id, turn_idx, role,
           CAST(tool IS NOT NULL AS INT) AS label,
           CAST({_H48.format(x='conv_id')} % 3 AS BIGINT) AS fold
    FROM conversations
),
cf AS (
    SELECT role, fold, SUM(CAST(label AS DOUBLE)) AS s, COUNT(*) AS c
    FROM base GROUP BY role, fold
),
g AS (
    SELECT role, fold, s, c,
           SUM(s) OVER (PARTITION BY role) - s AS oof_s,
           SUM(c) OVER (PARTITION BY role) - c AS oof_c
    FROM cf
),
tot AS (SELECT fold, SUM(s) AS fs, SUM(c) AS fc FROM cf GROUP BY fold),
grand AS (SELECT SUM(s) AS gs, SUM(c) AS gc FROM cf),
prior AS (SELECT fold, (gs - fs) / (gc - fc) AS p FROM tot, grand),
enc AS (
    SELECT g.role, g.fold,
           CASE WHEN oof_c > 0 THEN oof_s / oof_c ELSE p END AS role_te
    FROM g JOIN prior ON g.fold = prior.fold
)
SELECT b.conv_id, b.turn_idx, b.role, b.fold,
       CAST(e.role_te AS DOUBLE) AS role_te
FROM base b LEFT JOIN enc e ON b.role = e.role AND b.fold = e.fold
"""

# per-role z-score (join form; stddev_samp matches Spark, constant /
# singleton groups fill 0.0)
_STANDARDIZE_TEXT_LEN_SQL = f"""
WITH {_CONV_CTE},
base AS (
    SELECT conv_id, turn_idx, role, CAST(length(text) AS BIGINT) AS text_len
    FROM conversations
),
stats AS (
    SELECT role, AVG(CAST(text_len AS DOUBLE)) AS mu,
           STDDEV_SAMP(CAST(text_len AS DOUBLE)) AS sd
    FROM base GROUP BY role
)
SELECT b.conv_id, b.turn_idx, b.role, b.text_len,
       CAST(CASE WHEN s.sd IS NOT NULL AND s.sd > 0
                 THEN (b.text_len - s.mu) / s.sd ELSE 0.0 END AS DOUBLE)
           AS text_len_z
FROM base b JOIN stats s ON b.role = s.role
"""

# hashing-trick cross: identical md5-prefix buckets (chr(31)
# separator, chr(0)-framed NULL sentinel — lock-step with
# operators/encoders.py::hashed_cross)
_HASHED_CROSS_SQL = f"""
WITH {_CONV_CTE}
SELECT conv_id, turn_idx,
       CAST({_H48.format(x=
           "concat(role, chr(31), coalesce(tool, concat(chr(0), 'null', chr(0))))"
       )} % 1024 AS BIGINT) AS bucket
FROM conversations
"""

# exact mutual information on the contingency table (lock-step with
# operators/association.py::mutual_information)
_MI_ROLE_TOOLUSE_SQL = f"""
WITH {_CONV_CTE},
base AS (
    SELECT role AS x, CAST(CAST(tool IS NOT NULL AS INT) AS VARCHAR) AS y
    FROM conversations
),
joint AS (SELECT x, y, COUNT(*) AS nxy FROM base GROUP BY x, y),
c AS (
    SELECT x, y, nxy,
           SUM(nxy) OVER (PARTITION BY x) AS nx,
           SUM(nxy) OVER (PARTITION BY y) AS ny,
           SUM(nxy) OVER () AS n
    FROM joint
),
mi AS (
    SELECT SUM((nxy / CAST(n AS DOUBLE))
               * log2(nxy * CAST(n AS DOUBLE) / (nx * ny))) AS mi,
           MAX(n) AS n
    FROM c
),
hx AS (
    SELECT SUM(-(nx / CAST(n AS DOUBLE)) * log2(nx / CAST(n AS DOUBLE))) AS h_x
    FROM (SELECT DISTINCT x, nx, n FROM c)
),
hy AS (
    SELECT SUM(-(ny / CAST(n AS DOUBLE)) * log2(ny / CAST(n AS DOUBLE))) AS h_y
    FROM (SELECT DISTINCT y, ny, n FROM c)
)
SELECT CAST(mi AS DOUBLE) AS mi, CAST(h_x AS DOUBLE) AS h_x,
       CAST(h_y AS DOUBLE) AS h_y,
       CAST(CASE WHEN least(h_x, h_y) > 0 THEN mi / least(h_x, h_y)
                 ELSE 0.0 END AS DOUBLE) AS nmi,
       CAST(n AS BIGINT) AS n
FROM mi, hx, hy
"""

# chi-square closed form n·(Σ n_xy²/(n_x·n_y) − 1): observed-zero
# cells contribute algebraically, no dense grid (lock-step with
# operators/association.py::chi_square)
_CHI2_ROLE_TOOL_SQL = f"""
WITH {_CONV_CTE},
base AS (
    SELECT role AS x, COALESCE(tool, 'none') AS y FROM conversations
),
joint AS (SELECT x, y, COUNT(*) AS nxy FROM base GROUP BY x, y),
c AS (
    SELECT x, y, nxy,
           SUM(nxy) OVER (PARTITION BY x) AS nx,
           SUM(nxy) OVER (PARTITION BY y) AS ny,
           SUM(nxy) OVER () AS n
    FROM joint
),
stat AS (
    SELECT MAX(CAST(n AS DOUBLE))
               * (SUM(CAST(nxy AS DOUBLE) * nxy / (CAST(nx AS DOUBLE) * ny)) - 1)
               AS chi2,
           COUNT(DISTINCT x) AS kx, COUNT(DISTINCT y) AS ky,
           MAX(n) AS n
    FROM c
)
SELECT CAST(chi2 AS DOUBLE) AS chi2,
       CAST((kx - 1) * (ky - 1) AS BIGINT) AS dof,
       CAST(CASE WHEN least(kx, ky) > 1 AND n > 0
                 THEN sqrt(chi2 / (n * (least(kx, ky) - 1)))
                 ELSE 0.0 END AS DOUBLE) AS cramers_v,
       CAST(n AS BIGINT) AS n
FROM stat
"""

# Markov role transitions (lock-step with
# operators/lags.py::role_transitions: lag over (conv_id, ts,
# turn_idx), conversation boundaries emit nothing)
_ROLE_TRANSITIONS_SQL = f"""
WITH {_CONV_CTE},
pairs AS (
    SELECT lag(role) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx)
               AS from_state,
           role AS to_state
    FROM conversations
),
counts AS (
    SELECT from_state, to_state, COUNT(*) AS n
    FROM pairs WHERE from_state IS NOT NULL
    GROUP BY from_state, to_state
)
SELECT from_state, to_state, CAST(n AS BIGINT) AS n,
       CAST(n / SUM(n) OVER (PARTITION BY from_state) AS DOUBLE) AS p_cond
FROM counts
"""

# the HLL weekly rollup: DuckDB computes the EXACT side; the sketch
# estimate lives only in the within_tol boolean, which the oracle
# asserts TRUE (DataSketches HLL is content-deterministic — a
# tolerance breach fails the gate loudly, by design)
_HLL_WEEKLY_ROLLUP_SQL = f"""
WITH {_CONV_CTE}
SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS bucket,
       CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS exact_distinct,
       TRUE AS within_tol
FROM conversations
GROUP BY date_trunc('week', ts)
"""

# deterministic negative sampling (lock-step with
# operators/indexing.py::negative_samples: md5-prefix hash mod (N−1)
# with the ≥-anchor shift — uniform over ids ≠ anchor)
_NEGATIVE_SAMPLES_SQL = f"""
WITH n AS (SELECT COUNT(*) AS cnt FROM documents),
exploded AS (
    SELECT doc_id, unnest(generate_series(0, 2)) AS neg_idx
    FROM documents
),
hashed AS (
    SELECT doc_id, neg_idx,
           {_H48.format(x="concat(CAST(doc_id AS VARCHAR), ':', CAST(neg_idx AS VARCHAR))")}
               % (cnt - 1) AS c
    FROM exploded, n
)
SELECT doc_id, CAST(neg_idx AS INT) AS neg_idx,
       CAST(CASE WHEN c >= doc_id THEN c + 1 ELSE c END AS BIGINT) AS neg_id
FROM hashed
"""

# schema-on-read JSON extraction (json_valid guard mirrors Spark's
# NULL-on-malformed get_json_object; try_cast mirrors the TRY cast)
_JSON_PROPS_STATS_SQL = """
WITH ev AS (
    SELECT event_type,
           CASE WHEN json_valid(props)
                THEN try_cast(json_extract_string(props, '$.k') AS INT)
           END AS k
    FROM events WHERE ts IS NOT NULL
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(k) AS BIGINT) AS n_valid_k,
       CAST(AVG(k) AS DOUBLE) AS avg_k,
       CAST(MAX(k) AS INT) AS max_k
FROM ev GROUP BY event_type
"""

# exponential time-decay features (lock-step with operators/decay.py:
# SUM(0.5 ^ (age_us/86400e6/half_life)) on the 28-day as-of stream,
# grid left-join fills 0.0 — a decayed count of nothing IS zero)
_DECAYED_FEATURES_SQL = f"""
WITH {_CONV_CTE},
joined AS (
    SELECT c.conv_id, c.tool, c.ts, k.cutoff_ts
    FROM conversations c
    JOIN cutoffs k
      ON c.ts < k.cutoff_ts AND c.ts >= k.cutoff_ts - INTERVAL 28 DAY
),
feats AS (
    SELECT conv_id, cutoff_ts,
        SUM(pow(0.5, (epoch_us(cutoff_ts) - epoch_us(ts)) / 86400000000.0 / 1.0)) AS decayed_turns_hl1d,
        SUM(CASE WHEN tool IS NOT NULL
                 THEN pow(0.5, (epoch_us(cutoff_ts) - epoch_us(ts)) / 86400000000.0 / 1.0)
                 ELSE 0.0 END) AS decayed_tool_hl1d,
        SUM(pow(0.5, (epoch_us(cutoff_ts) - epoch_us(ts)) / 86400000000.0 / 7.0)) AS decayed_turns_hl7d,
        SUM(CASE WHEN tool IS NOT NULL
                 THEN pow(0.5, (epoch_us(cutoff_ts) - epoch_us(ts)) / 86400000000.0 / 7.0)
                 ELSE 0.0 END) AS decayed_tool_hl7d
    FROM joined GROUP BY conv_id, cutoff_ts
),
grid AS (
    SELECT e.conv_id, k.cutoff_ts
    FROM (SELECT DISTINCT conv_id FROM conversations) e CROSS JOIN cutoffs k
)
SELECT g.conv_id, g.cutoff_ts,
       COALESCE(f.decayed_turns_hl1d, 0.0) AS decayed_turns_hl1d,
       COALESCE(f.decayed_tool_hl1d, 0.0) AS decayed_tool_hl1d,
       COALESCE(f.decayed_turns_hl7d, 0.0) AS decayed_turns_hl7d,
       COALESCE(f.decayed_tool_hl7d, 0.0) AS decayed_tool_hl7d
FROM grid g
LEFT JOIN feats f ON g.conv_id = f.conv_id AND g.cutoff_ts = f.cutoff_ts
"""

# survival labels shared core: first qualifying (role='user') turn
# strictly after the cutoff within a 14-day horizon; ceiling-days
# duration capped at the horizon, censored flag when absent
# (lock-step with operators/survival.py::survival_labels)
_SURVIVAL_CORE = f"""
{_CONV_CTE},
future AS (
    SELECT c.conv_id, k.cutoff_ts, MIN(epoch_us(c.ts)) AS next_us
    FROM conversations c
    JOIN cutoffs k
      ON c.ts > k.cutoff_ts AND c.ts <= k.cutoff_ts + INTERVAL 14 DAY
    WHERE c.role = 'user'
    GROUP BY c.conv_id, k.cutoff_ts
),
grid AS (
    SELECT e.conv_id, k.cutoff_ts
    FROM (SELECT DISTINCT conv_id FROM conversations) e CROSS JOIN cutoffs k
),
labels AS (
    SELECT g.conv_id, g.cutoff_ts,
           CAST(COALESCE(ceil((f.next_us - epoch_us(g.cutoff_ts)) / 86400000000.0), 14)
                AS INTEGER) AS duration_days,
           CAST(CASE WHEN f.next_us IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) AS observed
    FROM grid g
    LEFT JOIN future f ON g.conv_id = f.conv_id AND g.cutoff_ts = f.cutoff_ts
)
"""

_SURVIVAL_LABELS_SQL = f"""
WITH {_SURVIVAL_CORE}
SELECT conv_id, cutoff_ts, duration_days, observed FROM labels
"""

# Kaplan-Meier product-limit over the survival labels; the product is
# EXP(SUM(LN(factor))) with a MIN-guard for zero factors (lock-step
# with operators/survival.py::km_curve, including the LN(1) shield)
_KM_CURVE_SQL = f"""
WITH {_SURVIVAL_CORE},
per_t AS (
    SELECT duration_days AS t, COUNT(*) AS n_leaving, SUM(observed) AS n_event
    FROM labels GROUP BY duration_days
),
curve AS (
    SELECT t, n_event,
           SUM(n_leaving) OVER ()
             - COALESCE(SUM(n_leaving) OVER
                 (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS n_risk
    FROM per_t
)
SELECT CAST(t AS INTEGER) AS t,
       CAST(n_risk AS BIGINT) AS n_risk,
       CAST(n_event AS BIGINT) AS n_event,
       CASE WHEN MIN(1.0 - n_event / n_risk) OVER
                 (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) <= 0.0
            THEN 0.0
            ELSE EXP(SUM(LN(CASE WHEN 1.0 - n_event / n_risk > 0.0
                                 THEN 1.0 - n_event / n_risk ELSE 1.0 END)) OVER
                     (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       END AS survival
FROM curve
"""

# inter-arrival gap stats + burstiness (lock-step with
# operators/rhythm.py::interarrival_stats: ORDER-DEPENDENT reductions
# are exact integer sums (Σg BIGINT→HUGEINT, Σg² HUGEINT); mean/std
# derive through the same fixed float tree — a float AVG/STDDEV here
# flakes at 6dp rounding boundaries as partial-sum order varies)
_INTERARRIVAL_STATS_SQL = f"""
WITH {_CONV_CTE},
gaps AS (
    SELECT conv_id,
           epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) AS g
    FROM conversations
    WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx)
),
per_conv AS (
    SELECT conv_id,
           COUNT(*) AS n_gaps,
           SUM(g) AS s1,
           SUM(CAST(g AS HUGEINT) * g) AS s2
    FROM gaps WHERE g IS NOT NULL
    GROUP BY conv_id
    HAVING COUNT(*) >= 2
),
derived AS (
    SELECT conv_id, CAST(n_gaps AS BIGINT) AS n_gaps,
           CAST(s1 AS DOUBLE) / CAST(n_gaps AS DOUBLE) / 1000000.0 AS mean_s,
           SQRT(GREATEST(
               (CAST(s2 AS DOUBLE)
                - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                  / CAST(n_gaps AS DOUBLE))
               / (CAST(n_gaps AS DOUBLE) - 1.0), 0.0)) / 1000000.0 AS sd_s
    FROM per_conv
)
SELECT conv_id, n_gaps,
       mean_s AS mean_gap_s,
       sd_s AS sd_gap_s,
       COALESCE(CASE WHEN mean_s > 0 THEN sd_s / mean_s END, 0.0) AS cv_gap,
       COALESCE(CASE WHEN sd_s + mean_s > 0
                     THEN (sd_s - mean_s) / (sd_s + mean_s) END, 0.0)
           AS burstiness
FROM derived
"""

# hour-of-day entropy + weekend fraction (lock-step with
# operators/rhythm.py::activity_profile: entropy in the stable
# ln(N) - sum(c*ln(c))/N form; DuckDB dayofweek is 0=Sunday..6=Saturday
# where Spark's is 1=Sunday..7=Saturday — both select Sat+Sun)
_ACTIVITY_PROFILE_SQL = f"""
WITH {_CONV_CTE},
by_hour AS (
    SELECT conv_id, hour(ts) AS hh, COUNT(*) AS c,
           SUM(CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END) AS wc
    FROM conversations GROUP BY conv_id, hour(ts)
)
SELECT conv_id,
       LN(CAST(SUM(c) AS DOUBLE))
         - SUM(c * LN(CAST(c AS DOUBLE))) / SUM(c) AS hour_entropy,
       CAST(COUNT(*) AS INTEGER) AS n_active_hours,
       CAST(SUM(wc) AS DOUBLE) / SUM(c) AS weekend_frac
FROM by_hour GROUP BY conv_id
"""

# per-conversation daily-count OLS trend (lock-step with
# rhythm.activity_trend: same origin shift, same explicit co-moment
# sums — NOT regr_slope, whose accumulation order could differ in the
# last ulp — same 1e-9 variance guard, 6dp rounding)
_ACTIVITY_TREND_SQL = f"""
WITH {_CONV_CTE},
by_day AS (
    SELECT conv_id, CAST(ts AS DATE) AS d, COUNT(*) * 1.0 AS y
    FROM conversations GROUP BY conv_id, CAST(ts AS DATE)
),
xy AS (
    SELECT conv_id,
           CAST(date_diff('day', DATE '2024-01-01', d) AS DOUBLE) AS x, y
    FROM by_day
),
acc AS (
    SELECT conv_id,
           COUNT(*) * 1.0 AS n,
           SUM(x) AS sx, SUM(y) AS sy,
           SUM(x * y) AS sxy, SUM(x * x) AS sxx
    FROM xy GROUP BY conv_id
)
SELECT conv_id,
       CAST(n AS INTEGER) AS n_active_days,
       ROUND(CASE WHEN n * sxx - sx * sx > 1e-9
                  THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END,
             6) AS slope,
       ROUND(CASE WHEN n * sxx - sx * sx > 1e-9
                  THEN (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n END,
             6) AS intercept
FROM acc
"""

# daily-count Fano factor over ACTIVE days (lock-step with
# operators/rhythm.py::daily_regularity: ORDER-DEPENDENT reductions
# are exact integer sums — Σc, Σc² — and mean/var_pop derive through
# the same fixed float tree; a float AVG/VAR_POP here is the
# interarrival flake class, rational values on 6dp boundaries)
_DAILY_REGULARITY_SQL = f"""
WITH {_CONV_CTE},
by_day AS (
    SELECT conv_id, CAST(ts AS DATE) AS d, COUNT(*) AS c
    FROM conversations GROUP BY conv_id, CAST(ts AS DATE)
),
acc AS (
    SELECT conv_id, COUNT(*) AS n, SUM(c) AS s1, SUM(c * c) AS s2
    FROM by_day GROUP BY conv_id
),
derived AS (
    SELECT conv_id, n,
           CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean_d,
           GREATEST((CAST(s2 AS DOUBLE)
                     - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    / CAST(n AS DOUBLE), 0.0) AS var_d
    FROM acc
)
SELECT conv_id,
       CAST(n AS INTEGER) AS n_active_days,
       mean_d AS mean_daily_turns,
       var_d AS var_daily_turns,
       COALESCE(CASE WHEN mean_d > 0 THEN var_d / mean_d END, 0.0) AS fano_factor
FROM derived
"""

# deterministic 8-way sharding manifest (lock-step with
# operators/sharding.py: stable md5-prefix hash of the STRING id)
_SHARD_PROFILE_SQL = f"""
WITH sharded AS (
    SELECT CAST({_H48.format(x="CAST(doc_id AS VARCHAR)")} % 8 AS INTEGER) AS shard_id,
           {_NTOK_RAW} AS n_tokens,
           strlen(COALESCE(text, '')) AS n_bytes
    FROM documents
)
SELECT shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(n_bytes) AS BIGINT) AS n_bytes
FROM sharded GROUP BY shard_id
"""

# PII scrubbing (lock-step with operators/redact.py: counts on the
# ORIGINAL text, replacement order email → IP → digit-run; DuckDB
# regexp_replace needs the explicit 'g' flag to match Spark's global)
_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}"
_PII_IPV4 = "[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}"
_PII_NUM = "[0-9]{{2,}}"
_REDACT_PII_SQL = f"""
WITH {{conv}},
keyed AS (
    SELECT concat(conv_id, '#', turn_idx) AS turn_key,
           COALESCE(text, '') AS t
    FROM conversations
)
SELECT turn_key,
       regexp_replace(
         regexp_replace(
           regexp_replace(t, '{_PII_EMAIL}', '<EMAIL>', 'g'),
           '{_PII_IPV4}', '<IP>', 'g'),
         '{_PII_NUM}', '<NUM>', 'g') AS redacted_text,
       CAST(len(regexp_extract_all(t, '{_PII_EMAIL}')) AS INTEGER) AS n_email,
       CAST(len(regexp_extract_all(t, '{_PII_IPV4}')) AS INTEGER) AS n_ip,
       CAST(len(regexp_extract_all(t, '{_PII_NUM}')) AS INTEGER) AS n_digit_run,
       CAST(len(regexp_extract_all(t, '{_PII_EMAIL}'))
            + len(regexp_extract_all(t, '{_PII_IPV4}'))
            + len(regexp_extract_all(t, '{_PII_NUM}')) AS INTEGER) AS n_pii_total
FROM keyed
""".format(conv=_CONV_CTE)

# Count-Min sketch weekly rollup (lock-step with operators/cms.py:
# depth=4 width=32, salted stable-hash slots, MIN-over-depth estimate
# with the n_depth_hit zero guard; building weekly counters directly
# equals merging daily ones because merge is SUM)
_CMS_WEEKLY_TOOLS_SQL = f"""
WITH {_CONV_CTE},
tools AS (
    SELECT tool, CAST(ts AS DATE) AS day
    FROM conversations WHERE tool IS NOT NULL
),
depths AS (SELECT unnest([0, 1, 2, 3]) AS row_d),
cells AS (
    SELECT CAST(date_trunc('week', day) AS DATE) AS week, d.row_d,
           CAST({_H48.format(x="concat(tool, '#', row_d)")} % 32 AS INTEGER) AS slot
    FROM tools CROSS JOIN depths d
),
weekly AS (
    SELECT week, row_d, slot, COUNT(*) AS cnt
    FROM cells GROUP BY week, row_d, slot
),
probes AS (SELECT DISTINCT tool AS k FROM tools),
probe_slots AS (
    SELECT k, d.row_d,
           CAST({_H48.format(x="concat(k, '#', row_d)")} % 32 AS INTEGER) AS slot
    FROM probes CROSS JOIN depths d
),
est AS (
    SELECT w.week, p.k, MIN(w.cnt) AS est_from_hits, COUNT(*) AS n_depth_hit
    FROM weekly w JOIN probe_slots p ON w.row_d = p.row_d AND w.slot = p.slot
    GROUP BY w.week, p.k
),
exact AS (
    SELECT CAST(date_trunc('week', day) AS DATE) AS week, tool AS k,
           COUNT(*) AS exact_cnt
    FROM tools GROUP BY 1, 2
)
SELECT CAST(e.week AS TIMESTAMP) AS week_start, e.k AS tool,
       CAST(e.exact_cnt AS BIGINT) AS exact_cnt,
       CAST(CASE WHEN s.n_depth_hit < 4 THEN 0 ELSE s.est_from_hits END AS BIGINT) AS cms_count,
       CASE WHEN s.n_depth_hit < 4 THEN 0 ELSE s.est_from_hits END >= e.exact_cnt
         AS never_underestimates
FROM exact e JOIN est s ON e.week = s.week AND e.k = s.k
"""

# blocklist curation (lock-step with textstats.blocklist_filter:
# normalized tokens, 5% threshold on the rounded fraction)
_BLOCKLIST_SQL = f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS ws FROM documents),
per AS (
    SELECT doc_id, len(ws) AS n_tokens,
           len(list_filter(ws, t -> t IN ('hash', 'vector'))) AS n_blocked
    FROM tok
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_blocked AS BIGINT) AS n_blocked,
       ROUND(CAST(n_blocked AS DOUBLE) / GREATEST(n_tokens, 1), 6)
         AS blocked_fraction,
       ROUND(CAST(n_blocked AS DOUBLE) / GREATEST(n_tokens, 1), 6) <= 0.05
         AS keep
FROM per
"""

# embedding drift (lock-step with similarity.embedding_drift:
# 6-rounded per-dim centroids — identical to the cluster_centroids
# convention — then L2/cosine to the min-label reference centroid)
_EMB_DRIFT_SQL = """
WITH ev AS (
    SELECT label, CAST(i AS INTEGER) - 1 AS dim,
           CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) AS v
    FROM (
        SELECT label, embedding, unnest(range(1, len(embedding) + 1)) AS i
        FROM embeddings
    )
),
cents AS (
    SELECT label, dim, ROUND(AVG(v), 6) AS c FROM ev GROUP BY 1, 2
),
members AS (SELECT label, COUNT(*) AS n_members FROM embeddings GROUP BY 1),
refg AS (SELECT MIN(label) AS rl FROM embeddings),
ref AS (SELECT dim, c AS r FROM cents, refg WHERE label = rl),
j AS (SELECT c.label, c.c, ref.r FROM cents c JOIN ref USING (dim)),
agg AS (
    SELECT label,
           SQRT(SUM(POW(c - r, 2))) AS l2,
           SUM(c * r) AS dot,
           SQRT(SUM(c * c)) AS na,
           SQRT(SUM(r * r)) AS nb
    FROM j GROUP BY label
)
SELECT a.label, CAST(m.n_members AS BIGINT) AS n_members,
       ROUND(l2, 6) AS l2_to_ref,
       ROUND(CASE WHEN na > 0 AND nb > 0 THEN dot / (na * nb) END, 6)
         AS cosine_to_ref
FROM agg a JOIN members m USING (label)
"""

# streaming CMS (lock-step with streaming/sketch.py: the drained
# complete-mode counter table equals the batch sketch row-for-row, so
# the oracle replays the batch cell arithmetic over the full table)
_STREAMING_CMS_SQL = f"""
WITH {_CONV_CTE},
tools AS (SELECT tool FROM conversations WHERE tool IS NOT NULL),
depths AS (SELECT unnest([0, 1, 2, 3]) AS row_d),
cells AS (
    SELECT d.row_d,
           CAST({_H48.format(x="concat(tool, '#', row_d)")} % 32 AS INTEGER) AS slot
    FROM tools CROSS JOIN depths d
),
counters AS (SELECT row_d, slot, COUNT(*) AS cnt FROM cells GROUP BY 1, 2),
probes AS (SELECT unnest(['purchase', 'error']) AS k),
probe_slots AS (
    SELECT k, d.row_d,
           CAST({_H48.format(x="concat(k, '#', row_d)")} % 32 AS INTEGER) AS slot
    FROM probes CROSS JOIN depths d
),
est AS (
    SELECT p.k, MIN(c.cnt) AS est_from_hits, COUNT(*) AS n_depth_hit
    FROM counters c JOIN probe_slots p ON c.row_d = p.row_d AND c.slot = p.slot
    GROUP BY p.k
)
SELECT k AS tool,
       CAST(CASE WHEN n_depth_hit < 4 THEN 0 ELSE est_from_hits END AS BIGINT)
         AS cms_count
FROM est
"""

# ordered funnel (lock-step with operators/funnel.py: step i+1 only
# counts strictly AFTER step i's first occurrence; unordered window
# frames, no sort)
_FUNNEL_PER_ENTITY = """
s1 AS (
    SELECT conv_id, role, ts,
           MIN(CASE WHEN role = 'system' THEN ts END)
             OVER (PARTITION BY conv_id) AS step1_ts
    FROM conversations
),
s2 AS (
    SELECT *, MIN(CASE WHEN role = 'user' AND step1_ts IS NOT NULL
                        AND ts > step1_ts THEN ts END)
                OVER (PARTITION BY conv_id) AS step2_ts
    FROM s1
),
s3 AS (
    SELECT *, MIN(CASE WHEN role = 'assistant' AND step2_ts IS NOT NULL
                        AND ts > step2_ts THEN ts END)
                OVER (PARTITION BY conv_id) AS step3_ts
    FROM s2
),
per_entity AS (
    SELECT DISTINCT conv_id,
           CAST(step1_ts IS NOT NULL AS INTEGER) AS reached_step1,
           CAST(step2_ts IS NOT NULL AS INTEGER) AS reached_step2,
           CAST(step3_ts IS NOT NULL AS INTEGER) AS reached_step3,
           COALESCE((epoch_us(step2_ts) - epoch_us(step1_ts)) / 1000000.0, -1.0)
             AS hop1_seconds,
           COALESCE((epoch_us(step3_ts) - epoch_us(step2_ts)) / 1000000.0, -1.0)
             AS hop2_seconds
    FROM s3
)
"""

_FUNNEL_STEPS_SQL = f"""
WITH {_CONV_CTE},
{_FUNNEL_PER_ENTITY}
SELECT conv_id, reached_step1, reached_step2, reached_step3,
       hop1_seconds, hop2_seconds
FROM per_entity
"""

_FUNNEL_ROLLUP_SQL = f"""
WITH {_CONV_CTE},
{_FUNNEL_PER_ENTITY}
SELECT CAST(COUNT(*) AS BIGINT) AS n_entities,
       CAST(SUM(reached_step1) AS BIGINT) AS n_step1,
       CAST(SUM(reached_step2) AS BIGINT) AS n_step2,
       CAST(SUM(reached_step3) AS BIGINT) AS n_step3,
       COALESCE(CASE WHEN SUM(reached_step1) > 0
                     THEN SUM(reached_step2) * 1.0 / SUM(reached_step1) END, 0.0)
         AS conv_step2,
       COALESCE(CASE WHEN SUM(reached_step2) > 0
                     THEN SUM(reached_step3) * 1.0 / SUM(reached_step2) END, 0.0)
         AS conv_step3
FROM per_entity
"""

# RFM quintile scoring (lock-step with operators/rfm.py: strict
# e < value edge bucketing on ROUND(quantile_cont, 6) edges, recency
# inverted, DECIMAL-exact money sums, data-derived Monday cutoff)
_RFM_SCORES_SQL = """
WITH ev AS (
    SELECT user_id, ts, value FROM events
    WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
cut AS (
    SELECT CAST(date_trunc('week', MAX(ts)) AS TIMESTAMP) + INTERVAL 7 DAY AS cutoff_ts
    FROM ev
),
rfm AS (
    SELECT user_id,
           (MAX(epoch_us(cutoff_ts)) - MAX(epoch_us(ts))) / 86400000000.0 AS recency_days,
           COUNT(*) AS frequency,
           COALESCE(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS monetary
    FROM ev CROSS JOIN cut
    WHERE ts < cutoff_ts AND ts >= cutoff_ts - INTERVAL 28 DAY
    GROUP BY user_id
),
er AS (SELECT ROUND(unnest(quantile_cont(recency_days, [0.2, 0.4, 0.6, 0.8])), 6) AS e FROM rfm),
ef AS (SELECT ROUND(unnest(quantile_cont(CAST(frequency AS DOUBLE), [0.2, 0.4, 0.6, 0.8])), 6) AS e FROM rfm),
em AS (SELECT ROUND(unnest(quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8])), 6) AS e FROM rfm),
scored AS (
    SELECT user_id, recency_days, frequency, monetary,
           CAST(5 - (SELECT COUNT(*) FROM er WHERE er.e < rfm.recency_days) AS INTEGER) AS r_score,
           CAST(1 + (SELECT COUNT(*) FROM ef WHERE ef.e < rfm.frequency) AS INTEGER) AS f_score,
           CAST(1 + (SELECT COUNT(*) FROM em WHERE em.e < rfm.monetary) AS INTEGER) AS m_score
    FROM rfm
)
SELECT user_id, recency_days, CAST(frequency AS BIGINT) AS frequency, monetary,
       r_score, f_score, m_score,
       CAST(r_score * 100 + f_score * 10 + m_score AS INTEGER) AS rfm_segment
FROM scored
"""

# cohort retention matrix (lock-step with operators/cohort.py:
# integer epoch-week keys, cohort = MIN week per entity)
_COHORT_RETENTION_SQL = f"""
WITH {_CONV_CTE},
weeks AS (
    SELECT conv_id,
           CAST(floor(epoch_us(CAST(date_trunc('week', ts) AS TIMESTAMP))
                / {7 * 86400 * 1_000_000}) AS BIGINT) AS week_no
    FROM conversations
),
tagged AS (
    SELECT conv_id, week_no,
           MIN(week_no) OVER (PARTITION BY conv_id) AS cohort_week
    FROM weeks
),
active AS (
    SELECT cohort_week, CAST(week_no - cohort_week AS INTEGER) AS age_weeks,
           COUNT(DISTINCT conv_id) AS n_active
    FROM tagged GROUP BY 1, 2
),
sizes AS (
    SELECT cohort_week, n_active AS cohort_size FROM active WHERE age_weeks = 0
)
SELECT a.cohort_week, a.age_weeks,
       CAST(a.n_active AS BIGINT) AS n_active,
       CAST(s.cohort_size AS BIGINT) AS cohort_size,
       a.n_active * 1.0 / s.cohort_size AS retention
FROM active a JOIN sizes s ON a.cohort_week = s.cohort_week
"""

# hopping windows (lock-step with windows.hopping_window_counts:
# epoch-us bucket arithmetic, ratio=2 replication, Expand-free
# two-level distinct)
_HOPPING_ACTIVITY_SQL = f"""
WITH {_CONV_CTE},
expl AS (
    SELECT conv_id,
           unnest(generate_series(
               CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) - 1,
               CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT))) AS win_bucket
    FROM conversations
),
per_conv AS (
    SELECT win_bucket, conv_id, COUNT(*) AS c FROM expl GROUP BY 1, 2
)
SELECT CAST(win_bucket * 3600000000 AS BIGINT) AS window_start_us,
       CAST(SUM(c) AS BIGINT) AS n_turns,
       CAST(COUNT(*) AS BIGINT) AS n_convs
FROM per_conv GROUP BY win_bucket
"""

# Welch's t on hash-parity cohorts (lock-step with operators/abtest.py;
# cohort = stable_hash48('ab' || conv_id) parity, sample variance)
_AB_TEST_TEXT_LEN_SQL = f"""
WITH {_CONV_CTE},
tagged AS (
    SELECT CAST(length(text) AS DOUBLE) AS m,
           CASE WHEN ({_H48.format(x="concat('ab', conv_id)")}) % 2 = 0
                THEN 'a' ELSE 'b' END AS g
    FROM conversations
),
per_group AS (
    SELECT g, COUNT(*) AS n, AVG(m) AS mean, VAR_SAMP(m) AS var
    FROM tagged GROUP BY g
),
one AS (
    SELECT CAST(SUM(CASE WHEN g = 'a' THEN n END) AS BIGINT) AS n_a,
           CAST(SUM(CASE WHEN g = 'b' THEN n END) AS BIGINT) AS n_b,
           SUM(CASE WHEN g = 'a' THEN mean END) AS mean_a,
           SUM(CASE WHEN g = 'b' THEN mean END) AS mean_b,
           SUM(CASE WHEN g = 'a' THEN var END) AS var_a,
           SUM(CASE WHEN g = 'b' THEN var END) AS var_b
    FROM per_group
)
SELECT n_a, n_b, mean_a, mean_b, var_a, var_b,
       COALESCE(CASE WHEN var_a / n_a + var_b / n_b > 0
                     THEN (mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b) END,
                0.0) AS t_stat,
       COALESCE(CASE WHEN var_a / n_a + var_b / n_b > 0 AND n_a > 1 AND n_b > 1
                     THEN pow(var_a / n_a + var_b / n_b, 2)
                          / ((var_a / n_a) * (var_a / n_a) / (n_a - 1)
                             + (var_b / n_b) * (var_b / n_b) / (n_b - 1)) END,
                0.0) AS welch_df,
       COALESCE(CASE WHEN ((n_a - 1) * var_a + (n_b - 1) * var_b) / (n_a + n_b - 2) > 0
                     THEN (mean_a - mean_b)
                          / sqrt(((n_a - 1) * var_a + (n_b - 1) * var_b) / (n_a + n_b - 2)) END,
                0.0) AS cohens_d
FROM one
"""

# dialogue turn-taking (lock-step with rhythm.turn_taking: lag over
# the stable (ts, turn_idx) order, first turn excluded from the rate)
_TURN_TAKING_SQL = f"""
WITH {_CONV_CTE},
flagged AS (
    SELECT conv_id, role,
           CASE WHEN lag(role) OVER w IS NULL THEN NULL
                WHEN role <> lag(role) OVER w THEN 1 ELSE 0 END AS switched
    FROM conversations
    WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx)
)
SELECT conv_id,
       CAST(COUNT(*) AS BIGINT) AS n_turns,
       SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END) * 1.0 / COUNT(*) AS user_frac,
       SUM(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) * 1.0 / COUNT(*) AS assistant_frac,
       COALESCE(AVG(switched), 0.0) AS alternation_rate
FROM flagged GROUP BY conv_id
"""

# trailing z-score anomalies (lock-step with windows.daily_anomalies:
# 7-day ROWS frame excluding the current day, sample std, <2 prior
# days → z=0)
_DAILY_ANOMALIES_SQL = f"""
WITH {_CONV_CTE},
daily AS (
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d, COUNT(*) AS n_turns
    FROM conversations GROUP BY 1
),
scored AS (
    SELECT d, n_turns,
           AVG(n_turns) OVER w AS mu,
           STDDEV_SAMP(n_turns) OVER w AS sd,
           COUNT(n_turns) OVER w AS n_prior
    FROM daily
    WINDOW w AS (ORDER BY d ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT d, CAST(n_turns AS BIGINT) AS n_turns,
       COALESCE(ROUND(mu, 6), -1.0) AS trailing_mean,
       COALESCE(CASE WHEN n_prior >= 2 AND sd > 0
                     THEN (n_turns - mu) / sd END, 0.0) AS z_score,
       ABS(COALESCE(CASE WHEN n_prior >= 2 AND sd > 0
                         THEN (n_turns - mu) / sd END, 0.0)) > 3.0 AS is_anomaly
FROM scored
"""

# ANSI stat aggregates (lock-step with _q_engagement_regression;
# DuckDB regr_slope/regr_intercept take (y, x) like Spark's)
# TPC-H-Q3-shaped 3-way join; revenue DECIMAL-exact before the double
# cast (Q1 discipline) so partition order can't change the sum
_Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2))))
            AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""

# ISO-dow × hour heatmap (Spark weekday(ts)+1 == DuckDB isodow(ts))
_ACTIVITY_CLOCK_SQL = f"""
WITH {_CONV_CTE},
cells AS (
    SELECT CAST(isodow(ts) AS INTEGER) AS iso_dow,
           CAST(hour(ts) AS INTEGER) AS hour,
           COUNT(*) AS n_turns
    FROM conversations GROUP BY 1, 2
),
tot AS (SELECT SUM(n_turns) AS t FROM cells)
SELECT iso_dow, hour, n_turns, ROUND(n_turns / t, 6) AS pct
FROM cells CROSS JOIN tot
"""

# market-basket co-occurrence with lift (lock-step with
# association.cooccurrence_lift: distinct (doc, term), unordered
# pairs, min_support 300, lift = n_both*N / (n_a*n_b))
_COOCCURRENCE_SQL = f"""
WITH gi AS (
    SELECT DISTINCT doc_id, t.term
    FROM (SELECT doc_id, unnest({_TOKS}) AS term FROM documents) t
    WHERE term IS NOT NULL
),
pairs AS (
    SELECT a.term AS item_a, b.term AS item_b, COUNT(*) AS n_both
    FROM gi a JOIN gi b ON a.doc_id = b.doc_id AND a.term < b.term
    GROUP BY 1, 2
    HAVING COUNT(*) >= 300
),
singles AS (SELECT term, COUNT(*) AS n_items FROM gi GROUP BY term),
tot AS (SELECT COUNT(DISTINCT doc_id) AS n_total FROM gi)
SELECT p.item_a, p.item_b, p.n_both, sa.n_items AS n_a, sb.n_items AS n_b,
       ROUND((CAST(p.n_both AS DOUBLE) * n_total)
             / (CAST(sa.n_items AS DOUBLE) * sb.n_items), 6) AS lift
FROM pairs p
JOIN singles sa ON sa.term = p.item_a
JOIN singles sb ON sb.term = p.item_b
CROSS JOIN tot
"""

# first-iteration BPE merge-pair frequencies (lock-step with
# textstats.bpe_pair_counts: whitespace tokens on normalized text,
# word-frequency-weighted adjacent char pairs on the DISTINCT-word
# table, deterministic tie-break, top 50). unnest(range(1, len)) is
# the 1..len-1 position list (range is half-open) — DuckDB's
# generate_series can't laterally correlate here.
_BPE_PAIRS_SQL = f"""
WITH words AS (
    SELECT word, COUNT(*) AS wf
    FROM (SELECT unnest({_TOKS}) AS word FROM documents) t
    WHERE word IS NOT NULL AND word <> ''
    GROUP BY 1
),
positions AS (
    SELECT word, wf, unnest(range(1, len(word))) AS i
    FROM words WHERE len(word) >= 2
),
pairs AS (
    SELECT substr(word, CAST(i AS INTEGER), 1) AS left_sym,
           substr(word, CAST(i AS INTEGER) + 1, 1) AS right_sym,
           SUM(wf) AS pair_count
    FROM positions GROUP BY 1, 2
)
SELECT left_sym, right_sym, CAST(pair_count AS BIGINT) AS pair_count
FROM pairs ORDER BY pair_count DESC, left_sym, right_sym LIMIT 50
"""

# standardized CUSUM over the daily series (lock-step with
# windows.cusum_changepoints: global mean/sample-std, ordered prefix
# sum, flag on the ROUNDED value so float drift can't flip it)
_CUSUM_SQL = f"""
WITH {_CONV_CTE},
daily AS (
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d, COUNT(*) AS n_turns
    FROM conversations GROUP BY 1
),
stats AS (SELECT AVG(n_turns) AS mu, STDDEV_SAMP(n_turns) AS sd FROM daily),
scored AS (
    SELECT d, n_turns,
           SUM(CASE WHEN sd > 0 THEN (n_turns - mu) / sd ELSE 0.0 END)
             OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS cusum
    FROM daily CROSS JOIN stats
)
SELECT d, CAST(n_turns AS BIGINT) AS n_turns,
       ROUND(cusum, 6) AS cusum,
       ABS(ROUND(cusum, 6)) > 5.0 AS is_shift
FROM scored
"""

# triangle census of the ≥300-doc term co-occurrence graph (edges as
# in _COOCCURRENCE_SQL). The oracle counts each triangle once via
# plain id-ordering a<b<c; the engine uses degree-ordered wedges —
# identical census, cross-validating the two algorithms.
_TRIANGLES_SQL = f"""
WITH gi AS (
    SELECT DISTINCT doc_id, t.term
    FROM (SELECT doc_id, unnest({_TOKS}) AS term FROM documents) t
    WHERE term IS NOT NULL
),
edges AS (
    SELECT a.term AS a, b.term AS b
    FROM gi a JOIN gi b ON a.doc_id = b.doc_id AND a.term < b.term
    GROUP BY 1, 2 HAVING COUNT(*) >= 300
),
deg AS (
    SELECT node, COUNT(*) AS deg
    FROM (SELECT a AS node FROM edges UNION ALL SELECT b FROM edges)
    GROUP BY 1
),
tri AS (
    SELECT COUNT(*) AS n_triangles
    FROM edges e1
    JOIN edges e2 ON e2.a = e1.b
    JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
),
summary AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(COALESCE(SUM(deg * (deg - 1)), 0) / 2 AS BIGINT) AS n_wedges
    FROM deg
),
ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM edges)
SELECT n_nodes, n_edges, CAST(n_triangles AS BIGINT) AS n_triangles, n_wedges,
       ROUND(CASE WHEN n_wedges > 0
                  THEN 3.0 * n_triangles / n_wedges ELSE 0.0 END, 6)
         AS global_clustering
FROM summary CROSS JOIN ne CROSS JOIN tri
"""

# substring-level duplicated spans (lock-step with
# dedup.duplicate_spans: 5-gram hash48 positions, hot grams in
# [2, 10000] docs, interval islands merging on pos ≤ prev + 5).
# DuckDB list slice [i:i+4] is INCLUSIVE (5 elements); pos is 0-based
# (i − 1) to match Spark's posexplode.
_DUP_SPANS_SQL = f"""
WITH toks AS (
    SELECT doc_id, string_split({_NORM}, ' ') AS ws
    FROM documents WHERE text IS NOT NULL
),
grams AS (
    SELECT doc_id, len(ws) AS n_tokens, CAST(i AS INTEGER) - 1 AS pos,
           {_H48.format(x="array_to_string(ws[CAST(i AS INTEGER):CAST(i AS INTEGER)+4], ' ')")} AS gh
    FROM (
        SELECT doc_id, ws, unnest(range(1, len(ws) - 3)) AS i
        FROM toks WHERE len(ws) >= 5
    )
),
hot AS (
    SELECT gh FROM grams GROUP BY gh
    HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND 10000
),
dup AS (SELECT g.doc_id, g.n_tokens, g.pos FROM grams g JOIN hot USING (gh)),
flagged AS (
    SELECT doc_id, n_tokens, pos,
           CASE WHEN pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 5
                THEN 1 ELSE 0 END AS brk
    FROM dup
),
islands AS (
    SELECT doc_id, n_tokens, pos,
           SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
    FROM flagged
),
spans AS (
    SELECT doc_id, island, MIN(pos) AS s, MAX(pos) AS e,
           MAX(n_tokens) AS n_tokens
    FROM islands GROUP BY 1, 2
)
SELECT doc_id, CAST(MAX(n_tokens) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
       CAST(SUM(e - s + 5) AS BIGINT) AS dup_tokens,
       ROUND(CAST(SUM(e - s + 5) AS DOUBLE) / MAX(n_tokens), 6) AS dup_fraction
FROM spans GROUP BY doc_id
"""

# embedding covariance (lock-step with similarity.embedding_covariance:
# sample covariance, upper triangle dim_i ≤ dim_j, 0-based dims,
# round 6; engine sums BLAS Gram partials, oracle streams covar_samp —
# same statistic by two algorithms)
_EMB_COV_SQL = """
WITH ev AS (
    SELECT vec_id, CAST(i AS INTEGER) - 1 AS dim,
           CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) AS v
    FROM (
        SELECT vec_id, embedding, unnest(range(1, len(embedding) + 1)) AS i
        FROM embeddings
    )
)
SELECT a.dim AS dim_i, b.dim AS dim_j, ROUND(covar_samp(a.v, b.v), 6) AS cov
FROM ev a JOIN ev b ON a.vec_id = b.vec_id AND a.dim <= b.dim
GROUP BY 1, 2
"""

# cross-source shingle overlap (lock-step with textstats.source_overlap:
# distinct (source, trigram-hash48), ordered pair join, Jaccard round 6)
_SOURCE_OVERLAP_SQL = f"""
WITH sg AS (
    SELECT DISTINCT source AS src, {_H48.format(x="sh")} AS gh
    FROM (
        SELECT source, unnest({_SHINGLES.format(toks=_TOKS, nm1=2)}) AS sh
        FROM documents
    )
),
shared AS (
    SELECT a.src AS source_a, b.src AS source_b, COUNT(*) AS n_shared
    FROM sg a JOIN sg b ON a.gh = b.gh AND a.src < b.src
    GROUP BY 1, 2
),
totals AS (SELECT src, COUNT(*) AS n_grams FROM sg GROUP BY 1)
SELECT source_a, source_b, CAST(n_shared AS BIGINT) AS n_shared,
       CAST(ta.n_grams AS BIGINT) AS n_a, CAST(tb.n_grams AS BIGINT) AS n_b,
       ROUND(CAST(n_shared AS DOUBLE)
             / (ta.n_grams + tb.n_grams - n_shared), 6) AS jaccard
FROM shared
JOIN totals ta ON ta.src = source_a
JOIN totals tb ON tb.src = source_b
"""

# Zipf fit (lock-step with textstats.zipf_stats: average-tie DESC
# ranks — rank() min-rank + (ties-1)/2 — OLS of ln(freq) on ln(rank);
# the engine computes the identical regression as count-weighted sums
# over the distinct-count table)
_ZIPF_SQL = f"""
WITH words AS (
    SELECT word, COUNT(*) AS c
    FROM (SELECT unnest({_TOKS}) AS word FROM documents) t
    WHERE word IS NOT NULL AND word <> ''
    GROUP BY 1
),
ranked AS (
    SELECT c,
           CAST(rank() OVER (ORDER BY c DESC) AS DOUBLE)
             + (COUNT(*) OVER (PARTITION BY c) - 1) / 2.0e0 AS r
    FROM words
)
SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size,
       CAST(SUM(c) AS BIGINT) AS total_tokens,
       ROUND(regr_slope(LN(c), LN(r)), 6) AS zipf_slope,
       ROUND(POW(corr(LN(c), LN(r)), 2), 6) AS zipf_r2
FROM ranked
"""

# SFT dialogue pairs (lock-step with assemble.dialogue_pairs: strict
# adjacency user→assistant under the shared (ts, turn_idx) ordering,
# length floors ≥ 1)
# in-batch contrastive negatives (lock-step with assemble.contrastive_pairs:
# same 'batch:' hash coin % 50, same prefix dup-key hash exclusion)
_CONTRASTIVE_PAIRS_SQL = f"""
WITH slim AS (
    SELECT CAST(({_H48.format(x="concat('batch:', CAST(doc_id AS VARCHAR))")}) % 50
                AS BIGINT) AS batch,
           doc_id,
           {_H48.format(x=f"CASE WHEN text IS NULL THEN NULL ELSE COALESCE(array_to_string(({_TOKS})[1:5], ' '), '') END")} AS k
    FROM documents
)
SELECT a.batch, a.doc_id AS a_id, b.doc_id AS b_id
FROM slim a JOIN slim b USING (batch)
WHERE a.doc_id < b.doc_id AND a.k <> b.k
"""

_DIALOGUE_PAIRS_SQL = f"""
WITH {_CONV_CTE},
lagged AS (
    SELECT conv_id, turn_idx, role, text,
           lag(role) OVER w AS pr, lag(text) OVER w AS pt
    FROM conversations
    WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx)
)
SELECT conv_id, CAST(turn_idx AS INTEGER) AS turn_idx,
       pt AS prompt, text AS response,
       CAST(length(pt) AS BIGINT) AS prompt_len,
       CAST(length(text) AS BIGINT) AS response_len
FROM lagged
WHERE role = 'assistant' AND pr = 'user'
  AND length(pt) >= 1 AND length(text) >= 1
"""

# quantile matching (lock-step with encoders.quantile_match: 6dp full
# edge grids incl. min/max; bin = smallest i with v <= hi; same
# rlo + t·(rhi−rlo) shape; clamp below/above; NULL passes through)
_QM_GRID = "[0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0]"
_QUANTILE_MATCH_SQL = f"""
WITH {_CONV_CTE},
folded AS (
    SELECT conv_id, turn_idx,
           CASE WHEN CAST(floor(epoch_us(CAST(date_trunc('week', ts) AS TIMESTAMP))
                           / {7 * 86400 * 1_000_000}) AS BIGINT) % 2 = 0
                THEN 'even' ELSE 'odd' END AS fold,
           CAST(length(text) AS BIGINT) AS v
    FROM conversations
),
src AS (SELECT conv_id, turn_idx, v FROM folded WHERE fold = 'odd'),
sa AS (SELECT quantile_cont(v, {_QM_GRID}) AS arr FROM src),
ra AS (SELECT quantile_cont(v, {_QM_GRID}) AS arr
       FROM folded WHERE fold = 'even'),
se AS (
    SELECT i, ROUND(sa.arr[i], 6) AS lo, ROUND(sa.arr[i + 1], 6) AS hi,
           ROUND(ra.arr[i], 6) AS rlo, ROUND(ra.arr[i + 1], 6) AS rhi
    FROM (SELECT unnest(generate_series(1, 10)) AS i), sa, ra
),
binned AS (
    SELECT s.conv_id, s.turn_idx, s.v,
           (SELECT MIN(i) FROM se WHERE s.v <= se.hi) AS i
    FROM src s
)
SELECT b.conv_id, b.turn_idx, b.v,
       ROUND(CASE
           WHEN b.v IS NULL THEN NULL
           WHEN b.v < (SELECT lo FROM se WHERE i = 1)
               THEN (SELECT rlo FROM se WHERE i = 1)
           WHEN b.i IS NULL THEN (SELECT rhi FROM se WHERE i = 10)
           ELSE e.rlo + (CASE WHEN e.hi = e.lo THEN 0.0
                              ELSE (b.v - e.lo) / (e.hi - e.lo) END)
                        * (e.rhi - e.rlo)
       END, 6) AS v_qm
FROM binned b LEFT JOIN se e ON b.i = e.i
"""

# WoE/IV (lock-step with encoders.woe_iv: PSI-family decile edges,
# strictly-less edge count = the when-chain bin, add-0.5 smoothing with
# the REQUESTED n_bins=10 literal in the denominators)
_WOE_TOKENS_SQL = f"""
WITH scored AS (
    SELECT CAST(COALESCE({_NTOK_RAW}, 0) AS BIGINT) AS v,
           CAST(source = 'src0' AS INTEGER) AS y
    FROM documents
),
edges AS (
    SELECT ROUND(unnest(quantile_cont(v, {_PSI_DECILES})), 6) AS e FROM scored
),
binned AS (
    SELECT CAST((SELECT COUNT(*) FROM edges WHERE e < v) AS INTEGER) AS bin, y
    FROM scored
),
counts AS (
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(y) AS BIGINT) AS n_pos,
           CAST(COUNT(*) - SUM(y) AS BIGINT) AS n_neg
    FROM binned GROUP BY bin
),
tot AS (SELECT SUM(n_pos) AS pt, SUM(n_neg) AS nt FROM counts)
SELECT bin, n, n_pos, n_neg,
       ROUND(LN(((n_pos + 0.5) / (pt + 0.5 * 10))
                / ((n_neg + 0.5) / (nt + 0.5 * 10))), 6) AS woe,
       ROUND((((n_pos + 0.5) / (pt + 0.5 * 10))
              - ((n_neg + 0.5) / (nt + 0.5 * 10)))
             * LN(((n_pos + 0.5) / (pt + 0.5 * 10))
                  / ((n_neg + 0.5) / (nt + 0.5 * 10))), 6) AS iv_term
FROM counts CROSS JOIN tot
"""

# tool bigrams (lock-step with lags.tool_bigrams: lead over tool turns
# only; top-20 by count with (from, to) tiebreak — compare on the
# SELECTED set, which the deterministic tiebreak makes unique)
_TOOL_BIGRAMS_SQL = f"""
WITH {_CONV_CTE},
calls AS (
    SELECT conv_id, tool, ts, turn_idx FROM conversations
    WHERE tool IS NOT NULL
),
led AS (
    SELECT tool AS from_tool, lead(tool) OVER w AS to_tool
    FROM calls
    WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx)
),
counts AS (
    SELECT from_tool, to_tool, CAST(COUNT(*) AS BIGINT) AS n
    FROM led WHERE to_tool IS NOT NULL
    GROUP BY from_tool, to_tool
),
froms AS (SELECT from_tool, SUM(n) AS fn FROM counts GROUP BY from_tool)
SELECT c.from_tool, c.to_tool, c.n,
       ROUND(c.n * 1.0 / f.fn, 6) AS p_cond
FROM counts c JOIN froms f USING (from_tool)
ORDER BY c.n DESC, c.from_tool, c.to_tool
LIMIT 20
"""

# daily ACF (lock-step with windows.daily_acf: observation lags over
# the ordered day series — the rn self-join replicates lag(dv, k))
_DAILY_ACF_SQL = f"""
WITH {_CONV_CTE},
daily AS (
    SELECT date_trunc('day', ts) AS d, COUNT(*) * 1.0 AS x
    FROM conversations GROUP BY 1
),
mu AS (SELECT AVG(x) AS m FROM daily),
dev AS (
    SELECT d, x - m AS dv, row_number() OVER (ORDER BY d) AS rn
    FROM daily CROSS JOIN mu
),
den AS (SELECT SUM(dv * dv) AS dn FROM dev),
ks AS (SELECT unnest(generate_series(1, 7)) AS lag),
pairs AS (
    SELECT CAST(k.lag AS INTEGER) AS lag, a.dv * b.dv AS prod
    FROM dev a JOIN ks k ON TRUE JOIN dev b ON a.rn = b.rn + k.lag
)
SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(CASE WHEN dn > 1e-12 THEN SUM(prod) / dn END, 6) AS acf
FROM pairs CROSS JOIN den GROUP BY lag, dn
"""

# Benford audit (lock-step with profile.benford_profile: FLOOR→string
# digit — double→int CAST rounds in DuckDB, log10 digits hit libm ulps;
# shared 6dp expected literals)
_BENFORD_CASE = (
    "CASE digit WHEN 1 THEN 0.30103 WHEN 2 THEN 0.176091 WHEN 3 THEN 0.124939"
    " WHEN 4 THEN 0.09691 WHEN 5 THEN 0.079181 WHEN 6 THEN 0.066947"
    " WHEN 7 THEN 0.057992 WHEN 8 THEN 0.051153 WHEN 9 THEN 0.045757 END"
)
_BENFORD_SQL = f"""
WITH counts AS (
    SELECT CAST(substr(CAST(CAST(FLOOR(l_extendedprice) AS BIGINT) AS VARCHAR),
                       1, 1) AS INTEGER) AS digit,
           COUNT(*) AS n
    FROM lineitem WHERE l_extendedprice >= 1
    GROUP BY 1
),
tot AS (SELECT SUM(n) AS t FROM counts)
SELECT digit, CAST(n AS BIGINT) AS n,
       ROUND(n * 1.0 / t, 6) AS freq,
       {_BENFORD_CASE} AS expected,
       ROUND(ROUND(n * 1.0 / t, 6) - {_BENFORD_CASE}, 6) AS dev
FROM counts CROSS JOIN tot
"""

# vocab coverage curve (lock-step with textstats.vocab_threshold_coverage:
# same hashed type-count table; per-threshold conditional sums)
_VOCAB_COVERAGE_CURVE_SQL = f"""
WITH vocab AS (
    SELECT {_H48.format(x="w")} AS tk, COUNT(*) AS c
    FROM (SELECT unnest({_TOKS}) AS w FROM documents)
    GROUP BY 1
),
tot AS (SELECT SUM(c) AS t FROM vocab),
grid AS (SELECT unnest([1, 2, 5, 10, 20, 50, 100]) AS threshold)
SELECT CAST(g.threshold AS INTEGER) AS threshold,
       CAST(SUM(CASE WHEN v.c >= g.threshold THEN 1 ELSE 0 END) AS BIGINT)
           AS n_types,
       ROUND(SUM(CASE WHEN v.c >= g.threshold THEN v.c ELSE 0 END) * 1.0
             / MAX(t.t), 6) AS token_share
FROM vocab v CROSS JOIN grid g CROSS JOIN tot t
GROUP BY g.threshold
"""

# Heaps'-law fit (lock-step with textstats.heaps_law_fit: same weekly
# vocab machinery; explicit co-moment OLS on the ln-ln series)
_HEAPS_LAW_SQL = f"""
WITH {_CONV_CTE},
toks AS (
    SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS bucket,
           {_H48.format(x="w")} AS tk
    FROM (SELECT ts, unnest({_TOKS}) AS w FROM conversations)
),
tok_counts AS (SELECT bucket, COUNT(*) AS ntok FROM toks GROUP BY bucket),
firsts AS (
    SELECT bucket, COUNT(*) AS nnew
    FROM (SELECT tk, MIN(bucket) AS bucket
          FROM (SELECT DISTINCT bucket, tk FROM toks) GROUP BY tk)
    GROUP BY bucket
),
series AS (
    SELECT LN(CAST(SUM(t.ntok) OVER (ORDER BY t.bucket
                   ROWS UNBOUNDED PRECEDING) AS DOUBLE)) AS x,
           LN(CAST(SUM(COALESCE(f.nnew, 0)) OVER (ORDER BY t.bucket
                   ROWS UNBOUNDED PRECEDING) AS DOUBLE)) AS y
    FROM tok_counts t LEFT JOIN firsts f USING (bucket)
),
acc AS (
    SELECT COUNT(*) * 1.0 AS n, SUM(x) AS sx, SUM(y) AS sy,
           SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
    FROM series
)
SELECT CAST(n AS BIGINT) AS n_points,
       ROUND(CASE WHEN n * sxx - sx * sx > 1e-12
                  THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END, 6)
           AS beta,
       ROUND(CASE WHEN n * sxx - sx * sx > 1e-12
                  THEN (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                       / n END, 6) AS ln_k,
       ROUND(CASE WHEN n * sxx - sx * sx > 1e-12
                   AND n * syy - sy * sy > 1e-12
                  THEN (n * sxy - sx * sy) * (n * sxy - sx * sy)
                       / ((n * sxx - sx * sx) * (n * syy - sy * sy)) END, 6)
           AS r2
FROM acc
"""

# vocabulary growth (lock-step with textstats.vocab_growth: Monday-
# aligned date_trunc week both engines; 48-bit token hashes; first-seen
# = min bucket per type; cumsum over the tiny week series)
_VOCAB_GROWTH_SQL = f"""
WITH {_CONV_CTE},
toks AS (
    SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS bucket,
           {_H48.format(x="w")} AS tk
    FROM (SELECT ts, unnest({_TOKS}) AS w FROM conversations)
),
pairs AS (SELECT DISTINCT bucket, tk FROM toks),
first AS (SELECT tk, MIN(bucket) AS bucket FROM pairs GROUP BY tk),
news AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_new_types
         FROM first GROUP BY bucket),
tot AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_types
        FROM pairs GROUP BY bucket)
SELECT t.bucket, t.n_types,
       CAST(COALESCE(n.n_new_types, 0) AS BIGINT) AS n_new_types,
       CAST(SUM(COALESCE(n.n_new_types, 0))
            OVER (ORDER BY t.bucket ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_types
FROM tot t LEFT JOIN news n USING (bucket)
"""

# per-tool latency (lock-step with lags.tool_latency_stats: lead over
# the conv order, Expand-free (tool, conv) rollup, integer-div avg)
_TOOL_LATENCY_SQL = f"""
WITH {_CONV_CTE},
led AS (
    SELECT tool, conv_id,
           epoch_us(lead(ts) OVER w) - epoch_us(ts) AS gap
    FROM conversations
    WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx)
),
calls AS (SELECT * FROM led WHERE tool IS NOT NULL AND gap IS NOT NULL),
per_tc AS (
    SELECT tool, conv_id, COUNT(*) AS n_i, SUM(gap) AS s_i, MAX(gap) AS m_i
    FROM calls GROUP BY tool, conv_id
)
SELECT tool, CAST(SUM(n_i) AS BIGINT) AS n_calls,
       CAST(COUNT(*) AS BIGINT) AS n_convs,
       CAST(SUM(s_i) // SUM(n_i) AS BIGINT) AS avg_gap_us,
       CAST(MAX(m_i) AS BIGINT) AS max_gap_us
FROM per_tc GROUP BY tool
"""

# per-role MAD (lock-step with winsorize.mad_by_group: quantile_cont =
# Spark exact percentile; mad_scaled = round6(round6(mad)·1.4826))
_MAD_TEXT_LEN_SQL = f"""
WITH {_CONV_CTE},
vals AS (
    SELECT role, CAST(length(COALESCE(text, '')) AS DOUBLE) AS v
    FROM conversations
),
meds AS (
    SELECT role, quantile_cont(v, 0.5) AS med, CAST(COUNT(*) AS BIGINT) AS n
    FROM vals GROUP BY role
),
dev AS (
    SELECT v.role, ABS(v.v - m.med) AS adev, m.med, m.n
    FROM vals v JOIN meds m USING (role)
),
agg AS (
    SELECT role, MAX(n) AS n, ROUND(MAX(med), 6) AS median,
           ROUND(quantile_cont(adev, 0.5), 6) AS mad
    FROM dev GROUP BY role
)
SELECT role, n, median, mad, ROUND(mad * 1.4826, 6) AS mad_scaled
FROM agg
"""

# conversation outcomes (lock-step with labels.conversation_outcomes:
# argmax by (ts, turn_idx), same literal refusal phrases as
# sft_pair_quality)
_CONV_OUTCOMES_SQL = f"""
WITH {_CONV_CTE},
ranked AS (
    SELECT conv_id, role, text, ts, turn_idx,
           row_number() OVER (PARTITION BY conv_id
                              ORDER BY ts DESC, turn_idx DESC) AS rn
    FROM conversations
),
last AS (
    SELECT conv_id, role AS last_role, lower(COALESCE(text, '')) AS lt
    FROM ranked WHERE rn = 1
),
vol AS (
    SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_turns,
           CAST(SUM(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_tool_calls
    FROM conversations GROUP BY conv_id
)
SELECT v.conv_id, l.last_role, v.n_turns, v.n_tool_calls,
       CAST(l.last_role = 'user' AS INTEGER) AS abandoned,
       CAST(l.last_role = 'assistant'
            AND (lt LIKE '%i can''t%' OR lt LIKE '%i cannot%'
                 OR lt LIKE '%i''m sorry%' OR lt LIKE '%as an ai%')
            AS INTEGER) AS refusal_final
FROM vol v JOIN last l USING (conv_id)
"""

# prefix-sharing profile (lock-step with profile.prefix_sharing: same
# depth cap, \\x1f-joined prefix → 48-bit hash, ≥d-turn membership)
_PREFIX_SHARING_SQL = f"""
WITH {_CONV_CTE},
pre AS (
    SELECT conv_id, ts, turn_idx, COALESCE(text, '') AS tx
    FROM conversations WHERE turn_idx < 3
),
lists AS (
    SELECT conv_id, list(tx ORDER BY ts, turn_idx) AS texts
    FROM pre GROUP BY conv_id
),
stacked AS (
    SELECT d.depth,
           {_H48.format(x="array_to_string(texts[1:d.depth], chr(31))")} AS ph
    FROM lists, (SELECT unnest([1, 2, 3]) AS depth) d
    WHERE len(texts) >= d.depth
),
groups AS (SELECT depth, ph, COUNT(*) AS cnt FROM stacked GROUP BY depth, ph)
SELECT depth, CAST(SUM(cnt) AS BIGINT) AS n_convs,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_prefixes,
       CAST(MAX(cnt) AS BIGINT) AS max_group,
       ROUND(SUM(cnt) * 1.0 / COUNT(*), 6) AS sharing_factor
FROM groups GROUP BY depth
"""

# SFT pair quality (lock-step with assemble.sft_pair_quality: literal
# lowercase substring refusal phrases, min_response_len=5, ratio vs
# greatest(prompt_len, 1) rounded 6)
_SFT_PAIR_QUALITY_SQL = f"""
WITH {_CONV_CTE},
lagged AS (
    SELECT conv_id, turn_idx, role, text,
           lag(role) OVER w AS pr, lag(text) OVER w AS pt
    FROM conversations
    WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx)
),
pairs AS (
    SELECT conv_id, CAST(turn_idx AS INTEGER) AS turn_idx,
           text AS response,
           CAST(length(pt) AS BIGINT) AS prompt_len,
           CAST(length(text) AS BIGINT) AS response_len
    FROM lagged
    WHERE role = 'assistant' AND pr = 'user'
      AND length(pt) >= 1 AND length(text) >= 1
),
flagged AS (
    SELECT *,
           CASE WHEN lower(response) LIKE '%i can''t%'
                  OR lower(response) LIKE '%i cannot%'
                  OR lower(response) LIKE '%i''m sorry%'
                  OR lower(response) LIKE '%as an ai%'
                THEN 1 ELSE 0 END AS is_refusal,
           CASE WHEN response_len < 5 THEN 1 ELSE 0 END AS is_short
    FROM pairs
)
SELECT conv_id, turn_idx, prompt_len, response_len,
       ROUND(response_len * 1.0 / greatest(prompt_len, 1), 6) AS len_ratio,
       is_refusal, is_short,
       CASE WHEN is_refusal = 0 AND is_short = 0 THEN 1 ELSE 0 END AS keep
FROM flagged
"""

# global average-rank normalize (lock-step with encoders.rank_normalize:
# 0-based min-rank + (ties-1)/2, over N-1, round 6; literals as e0
# doubles so DuckDB can't drift into DECIMAL arithmetic)
_RANK_NORM_SQL = f"""
WITH {_CONV_CTE},
per_conv AS (
    SELECT conv_id, COUNT(*) AS n_turns FROM conversations GROUP BY conv_id
)
SELECT conv_id, n_turns,
       ROUND(
         (CAST(rank() OVER (ORDER BY n_turns) - 1 AS DOUBLE)
          + (COUNT(*) OVER (PARTITION BY n_turns) - 1) / 2.0e0)
         / GREATEST(COUNT(*) OVER () - 1, 1),
         6) AS rank_norm
FROM per_conv
"""

# top-k suppliers per nation (grouped top-k over the broadcast dim)
_TOP_SUPPLIERS_SQL = """
WITH joined AS (
    SELECT n_name, s_name, ROUND(s_acctbal, 6) AS s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
),
ranked AS (
    SELECT n_name, s_name, s_acctbal,
           CAST(row_number() OVER (PARTITION BY n_name
                ORDER BY s_acctbal DESC, s_name ASC) AS INTEGER) AS rank
    FROM joined
)
SELECT n_name, s_name, s_acctbal, rank FROM ranked WHERE rank <= 2
"""

# TPC-H-Q6-shaped selective filter-sum (DECIMAL-exact, Q1 discipline)
_Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_discount AS DECIMAL(5,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""

# TPC-H-Q14-shaped promo share (DECIMAL sums, double ratio, same
# association order as the Spark expression: (100 * promo) / total)
_Q14_SQL = """
SELECT ROUND(
         100.0e0
         * CAST(SUM(CASE WHEN p_type = 'PROMO'
                         THEN CAST(l_extendedprice AS DECIMAL(18,2))
                              * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))
                         ELSE CAST(0 AS DECIMAL(20,4)) END) AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))) AS DOUBLE),
         6) AS promo_revenue_pct,
       COUNT(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-06-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
"""

# grouped top-k (lock-step with relational.topk_per_group: n desc,
# day asc tiebreak, dense rank from 1)
_TOPK_DAYS_SQL = f"""
WITH {_CONV_CTE},
daily AS (
    SELECT conv_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           COUNT(*) AS n_turns
    FROM conversations GROUP BY 1, 2
),
ranked AS (
    SELECT conv_id, day, n_turns,
           CAST(row_number() OVER (PARTITION BY conv_id
                ORDER BY n_turns DESC, day ASC) AS INTEGER) AS rank
    FROM daily
)
SELECT conv_id, day, n_turns, rank FROM ranked WHERE rank <= 2
"""

# near-time debounce (lock-step with dedup.collapse_bursts: islands
# by >5min gap; equal-ts ordering is burst-invariant, so no tiebreak)
_DEBOUNCE_SQL = """
WITH base AS (
    SELECT user_id, event_type, ts, event_id FROM events
    WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
flagged AS (
    -- event_id tiebreak in BOTH windows: without it, exact-ts peers
    -- may be ordered differently by the two window evaluations and
    -- one burst splits in two (r5 fuzz catch)
    SELECT user_id, event_type, ts, event_id,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 300000000
                THEN 1 ELSE 0 END AS nb
    FROM base
    WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
),
islands AS (
    SELECT user_id, event_type, ts,
           SUM(nb) OVER (PARTITION BY user_id, event_type
                         ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS burst
    FROM flagged
)
SELECT user_id, event_type,
       COUNT(*) AS burst_size,
       MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS burst_span_us,
       MIN(ts) AS ts
FROM islands GROUP BY user_id, event_type, burst
"""

# mergeable binned-quantile rollup (lock-step with
# sketches.binned_quantile_rollup: floor(len/50) bins, weekly merge,
# linear interpolation est = bin*50 + 50*(p*total - cum_below)/cnt)
_WEEKLY_QSKETCH_SQL = f"""
WITH {_CONV_CTE},
base AS (
    SELECT CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS fine,
           CAST(floor(epoch_us(CAST(date_trunc('week', ts) AS TIMESTAMP))
                      / 604800000000) AS BIGINT) AS coarse,
           CAST(floor(CAST(length(text) AS BIGINT) / 50) AS BIGINT) AS bin
    FROM conversations
),
daily AS (SELECT fine, coarse, bin, COUNT(*) AS cnt FROM base GROUP BY 1, 2, 3),
merged AS (SELECT coarse, bin, CAST(SUM(cnt) AS BIGINT) AS cnt
           FROM daily GROUP BY 1, 2),
cdf AS (
    SELECT coarse, bin, cnt,
           SUM(cnt) OVER (PARTITION BY coarse ORDER BY bin
                          ROWS UNBOUNDED PRECEDING) AS cum,
           SUM(cnt) OVER (PARTITION BY coarse) AS total
    FROM merged
),
pg AS (SELECT 0.5e0 AS p UNION ALL SELECT 0.9e0),
eligible AS (
    SELECT * FROM cdf CROSS JOIN pg WHERE cum >= p * total
),
chosen AS (SELECT coarse, p, MIN(bin) AS bin FROM eligible GROUP BY 1, 2)
SELECT c.coarse, c.p,
       ROUND(c.bin * 50 + 50 * (c.p * e.total - (e.cum - e.cnt)) / e.cnt, 6) AS est
FROM chosen c JOIN cdf e ON e.coarse = c.coarse AND e.bin = c.bin
"""

# first-match rule router (lock-step with operators/rules.py and the
# gate's rule table; mirrors sql/07_churn_risk_scoring.sql's CASE)
_RISK_BUCKETS_SQL = f"""
WITH {_CONV_CTE},
per_conv AS (
    SELECT conv_id,
           COUNT(*) AS n_turns,
           SUM(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END) AS n_tool,
           (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) / 86400000000.0 AS tenure_days
    FROM conversations GROUP BY conv_id
),
feats AS (
    SELECT conv_id, n_turns, tenure_days,
           n_tool / n_turns AS tool_rate
    FROM per_conv
)
SELECT conv_id, n_turns,
       CASE
         WHEN n_turns >= 100                                    THEN 'Power'
         WHEN tenure_days < 1.0 OR n_turns < 5                  THEN 'High'
         WHEN tenure_days BETWEEN 1.0 AND 7.0 OR tool_rate > 0.3 THEN 'Medium'
         ELSE 'Low'
       END AS risk_bucket
FROM feats
"""

# sweep-line peak concurrency (lock-step with windows.peak_concurrency:
# closed intervals — +1 sorts before -1 at equal ts via delta DESC; the
# oracle's single global running sum equals the engine's two-phase
# within-day + carry decomposition under the same total order)
_PEAK_CONCURRENCY_SQL = f"""
WITH {_CONV_CTE},
flagged AS (
    SELECT conv_id, ts, turn_idx,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                THEN 1 ELSE 0 END AS ns
    FROM conversations
    WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx)
),
sess AS (
    SELECT conv_id, ts,
           CAST(SUM(ns) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx
                              ROWS UNBOUNDED PRECEDING) - 1 AS INTEGER) AS session_id
    FROM flagged
),
spans AS (
    SELECT conv_id, session_id,
           MIN(epoch_us(ts)) AS start_us, MAX(epoch_us(ts)) AS end_us
    FROM sess GROUP BY 1, 2
),
pts AS (
    SELECT start_us AS ts_us, 1 AS delta, conv_id, session_id FROM spans
    UNION ALL
    SELECT end_us, -1, conv_id, session_id FROM spans
),
run AS (
    SELECT CAST(floor(ts_us / 86400000000) * 86400000000 AS BIGINT) AS day_us,
           SUM(delta) OVER (ORDER BY ts_us ASC, delta DESC, conv_id ASC,
                            session_id ASC ROWS UNBOUNDED PRECEDING) AS cum
    FROM pts
)
SELECT day_us, CAST(MAX(cum) AS BIGINT) AS peak_concurrency
FROM run GROUP BY day_us
"""

_CORR_MATRIX_SQL = f"""
WITH {_CONV_CTE},
per_conv AS (
    SELECT conv_id,
           CAST(COUNT(*) AS DOUBLE) AS nturns,
           CAST(SUM(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) AS ntool,
           AVG(CAST(length(text) AS DOUBLE)) AS avglen,
           CAST(SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS DOUBLE) AS nuser
    FROM conversations GROUP BY conv_id
),
moments AS (
    -- raw co-moments, the engine's exact expression shape (corr()
    -- was replaced on both sides: Spark 4 ANSI corr ERRORS on
    -- zero-variance columns; the r formula with NULL-on-zero-divide
    -- is the shared semantic)
    SELECT CAST(COUNT(*) AS DOUBLE) AS n,
           SUM(nturns) AS s_a, SUM(nturns * nturns) AS ss_a,
           SUM(ntool) AS s_b, SUM(ntool * ntool) AS ss_b,
           SUM(avglen) AS s_c, SUM(avglen * avglen) AS ss_c,
           SUM(nuser) AS s_d, SUM(nuser * nuser) AS ss_d,
           SUM(nturns * ntool) AS sp_ab, SUM(nturns * avglen) AS sp_ac,
           SUM(nturns * nuser) AS sp_ad, SUM(ntool * avglen) AS sp_bc,
           SUM(ntool * nuser) AS sp_bd, SUM(avglen * nuser) AS sp_cd
    FROM per_conv
)
SELECT 'nturns' AS feature_a, 'ntool' AS feature_b,
       ROUND((n * sp_ab - s_a * s_b) / NULLIF(sqrt(n * ss_a - s_a * s_a) * sqrt(n * ss_b - s_b * s_b), 0), 6) AS pearson_r FROM moments
UNION ALL SELECT 'nturns', 'avglen', ROUND((n * sp_ac - s_a * s_c) / NULLIF(sqrt(n * ss_a - s_a * s_a) * sqrt(n * ss_c - s_c * s_c), 0), 6) FROM moments
UNION ALL SELECT 'nturns', 'nuser', ROUND((n * sp_ad - s_a * s_d) / NULLIF(sqrt(n * ss_a - s_a * s_a) * sqrt(n * ss_d - s_d * s_d), 0), 6) FROM moments
UNION ALL SELECT 'ntool', 'avglen', ROUND((n * sp_bc - s_b * s_c) / NULLIF(sqrt(n * ss_b - s_b * s_b) * sqrt(n * ss_c - s_c * s_c), 0), 6) FROM moments
UNION ALL SELECT 'ntool', 'nuser', ROUND((n * sp_bd - s_b * s_d) / NULLIF(sqrt(n * ss_b - s_b * s_b) * sqrt(n * ss_d - s_d * s_d), 0), 6) FROM moments
UNION ALL SELECT 'avglen', 'nuser', ROUND((n * sp_cd - s_c * s_d) / NULLIF(sqrt(n * ss_c - s_c * s_c) * sqrt(n * ss_d - s_d * s_d), 0), 6) FROM moments
"""

_ENGAGEMENT_REGRESSION_SQL = f"""
WITH {_CONV_CTE},
per_conv AS (
    SELECT conv_id,
           CAST(COUNT(*) AS DOUBLE) AS x,
           AVG(CAST(length(text) AS DOUBLE)) AS y
    FROM conversations GROUP BY conv_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       corr(x, y) AS pearson_r,
       covar_samp(x, y) AS covar,
       regr_slope(y, x) AS slope,
       regr_intercept(y, x) AS intercept
FROM per_conv
"""

# k-anonymity audit (lock-step with operators/privacy.py: NULL QI
# values are their own class; day kept as midnight TIMESTAMP)
_K_ANON_CORE = f"""
{_CONV_CTE},
pre AS (
    SELECT role, tool, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           conv_id, COUNT(*) AS _rows
    FROM conversations GROUP BY 1, 2, 3, 4
),
per_combo AS (
    SELECT role, tool, day,
           CAST(COUNT(*) AS BIGINT) AS n_entities,
           CAST(SUM(_rows) AS BIGINT) AS n_rows
    FROM pre GROUP BY 1, 2, 3
)
"""

_K_ANONYMITY_SQL = f"""
WITH {_K_ANON_CORE}
SELECT role, tool, day, n_entities, n_rows, n_entities < 5 AS at_risk
FROM per_combo
"""

_K_ANONYMITY_SUMMARY_SQL = f"""
WITH {_K_ANON_CORE}
SELECT CAST(COUNT(*) AS BIGINT) AS n_combos,
       CAST(SUM(CASE WHEN n_entities < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_risky_combos,
       CAST(SUM(CASE WHEN n_entities < 5 THEN n_rows ELSE 0 END) AS BIGINT) AS rows_at_risk,
       CAST(MIN(n_entities) AS BIGINT) AS dataset_k
FROM per_combo
"""

# l-diversity (lock-step with privacy.l_diversity_audit: NULL
# sensitive values form their own class, same two-level distinct)
_L_DIVERSITY_SQL = f"""
WITH {_CONV_CTE},
pre AS (
    SELECT role, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           tool, COUNT(*) AS _rows
    FROM conversations GROUP BY 1, 2, 3
),
per_combo AS (
    SELECT role, day,
           CAST(COUNT(*) AS BIGINT) AS n_sensitive,
           CAST(SUM(_rows) AS BIGINT) AS n_rows
    FROM pre GROUP BY 1, 2
)
SELECT role, day, n_sensitive, n_rows, n_sensitive >= 2 AS is_l_diverse
FROM per_combo
"""

# t-closeness (lock-step with privacy.t_closeness_audit: NULL
# sensitive → sentinel class; EXACT hugeint numerator |c·G − g·C| +
# missing-mass term, one final double division in the same
# left-associated shape as the Spark expression)
_T_CLOSENESS_SQL = f"""
WITH {_CONV_CTE},
base AS (
    SELECT role, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           COALESCE(tool, '__NULL__') AS _s
    FROM conversations
),
gdist AS (SELECT _s, CAST(COUNT(*) AS BIGINT) AS _g FROM base GROUP BY 1),
gtot AS (SELECT CAST(COUNT(*) AS BIGINT) AS _gt FROM base),
cell AS (
    SELECT role, day, _s, CAST(COUNT(*) AS BIGINT) AS _c
    FROM base GROUP BY 1, 2, 3
),
ctot AS (SELECT role, day, CAST(SUM(_c) AS BIGINT) AS _ct FROM cell GROUP BY 1, 2),
j AS (
    SELECT c.role, c.day, c._c, g._g, ct._ct, gt._gt
    FROM cell c
    JOIN gdist g ON c._s = g._s
    JOIN ctot ct ON c.role = ct.role AND c.day = ct.day
    CROSS JOIN gtot gt
),
per AS (
    SELECT role, day,
           MAX(_ct) AS _C, MAX(_gt) AS _G,
           SUM(ABS(CAST(_c AS HUGEINT) * CAST(_gt AS HUGEINT)
                   - CAST(_g AS HUGEINT) * CAST(_ct AS HUGEINT))) AS _num1,
           SUM(_g) AS _sumg
    FROM j GROUP BY 1, 2
)
SELECT role, day,
       CAST(_C AS BIGINT) AS n_rows,
       CAST(_num1 + (CAST(_G AS HUGEINT) - CAST(_sumg AS HUGEINT))
                    * CAST(_C AS HUGEINT) AS DOUBLE)
       / (2.0 * CAST(_C AS DOUBLE) * CAST(_G AS DOUBLE)) AS tvd,
       CAST(_num1 + (CAST(_G AS HUGEINT) - CAST(_sumg AS HUGEINT))
                    * CAST(_C AS HUGEINT) AS DOUBLE)
       / (2.0 * CAST(_C AS DOUBLE) * CAST(_G AS DOUBLE)) > 0.2 AS at_risk
FROM per
"""

# distinct-n diversity (lock-step with textstats.distinct_ngram_
# diversity: whitespace tokens, ordered n-grams with duplicates kept,
# exact long counts, one long/long double division per ratio)
_DISTINCT_NGRAMS_SQL = r"""
WITH tok AS (
    SELECT source, string_split(trim(regexp_replace(text, '[ \t\n\x0B\f\r]+', ' ', 'g')), ' ') AS ws
    FROM documents WHERE trim(regexp_replace(text, '[ \t\n\x0B\f\r]+', ' ', 'g')) <> ''
),
uni AS (
    SELECT source, unnest(ws) AS g FROM tok
),
bi AS (
    SELECT source, unnest(list_transform(range(1, len(ws)),
                                         i -> ws[i] || ' ' || ws[i + 1])) AS g
    FROM tok WHERE len(ws) >= 2
),
tri AS (
    SELECT source,
           unnest(list_transform(range(1, len(ws) - 1),
                                 i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2])) AS g
    FROM tok WHERE len(ws) >= 3
),
u AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n, CAST(COUNT(DISTINCT g) AS BIGINT) AS d FROM uni GROUP BY 1),
b AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n, CAST(COUNT(DISTINCT g) AS BIGINT) AS d FROM bi GROUP BY 1),
t AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n, CAST(COUNT(DISTINCT g) AS BIGINT) AS d FROM tri GROUP BY 1)
SELECT u.source,
       u.n AS n_unigrams, u.d AS distinct_unigrams,
       CASE WHEN u.n > 0 THEN CAST(u.d AS DOUBLE) / CAST(u.n AS DOUBLE) ELSE 0.0 END AS distinct_1,
       CAST(COALESCE(b.n, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(b.d, 0) AS BIGINT) AS distinct_bigrams,
       CASE WHEN COALESCE(b.n, 0) > 0 THEN CAST(b.d AS DOUBLE) / CAST(b.n AS DOUBLE) ELSE 0.0 END AS distinct_2,
       CAST(COALESCE(t.n, 0) AS BIGINT) AS n_trigrams,
       CAST(COALESCE(t.d, 0) AS BIGINT) AS distinct_trigrams,
       CASE WHEN COALESCE(t.n, 0) > 0 THEN CAST(t.d AS DOUBLE) / CAST(t.n AS DOUBLE) ELSE 0.0 END AS distinct_3
FROM u LEFT JOIN b ON u.source = b.source LEFT JOIN t ON u.source = t.source
"""

# readability (lock-step with textstats.readability_stats: sentence
# runs of [.!?], vowel-group syllables with per-word min 1, exact
# long sums, FRE as the same left-associated double expression)
_READABILITY_SQL = r"""
WITH per_doc AS (
    -- blank check on the CANONICAL collapse-then-trim form with NULL
    -- coalesced to '': the raw trim(text) = '' check missed
    -- tab/newline/vertical-tab-only docs (counted as 1 phantom word)
    -- and NULL docs scored greatest(NULL, 1) = 1 sentence — the r4
    -- blank-text oracle bug class, caught here by the r5
    -- full-registry fuzz sweep
    SELECT source,
           CASE WHEN canon = '' THEN 0
                ELSE len(string_split(canon, ' ')) END AS _w,
           CASE WHEN canon = '' THEN 0
                ELSE greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
           END AS _s,
           CASE WHEN canon = '' THEN 0
                ELSE list_sum(list_transform(
                    string_split(canon, ' '),
                    w -> greatest(len(regexp_extract_all(lower(w), '[aeiouy]+')), 1)))
           END AS _y
    FROM (
        SELECT source, text,
               COALESCE(trim(regexp_replace(text, '[ \t\n\x0B\f\r]+', ' ', 'g')), '') AS canon
        FROM documents
    )
),
per AS (
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(_w) AS BIGINT) AS n_words,
           CAST(SUM(_s) AS BIGINT) AS n_sentences,
           CAST(SUM(_y) AS BIGINT) AS n_syllables
    FROM per_doc GROUP BY 1
)
SELECT source, n_docs, n_words, n_sentences, n_syllables,
       CASE WHEN n_sentences > 0
            THEN CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE)
            ELSE 0.0 END AS words_per_sentence,
       CASE WHEN n_words > 0
            THEN CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)
            ELSE 0.0 END AS syllables_per_word,
       206.835
       - 1.015 * (CASE WHEN n_sentences > 0
                       THEN CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE)
                       ELSE 0.0 END)
       - 84.6 * (CASE WHEN n_words > 0
                      THEN CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)
                      ELSE 0.0 END) AS flesch_reading_ease
FROM per
"""


# dow seasonality (lock-step with windows.dow_seasonality: Spark
# weekday()+1 == DuckDB isodow; exact hugeint Σx/Σx² per dow; the
# Σ(x−m_d)² = Σx² − Σ n_d·m_d² identity; 7-term ordered window sums)
_DOW_SEASONALITY_SQL = f"""
WITH {_CONV_CTE},
daily AS (
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM conversations GROUP BY 1
),
per_dow AS (
    SELECT CAST(isodow(d) AS INTEGER) AS iso_dow,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           SUM(CAST(n AS HUGEINT)) AS s,
           SUM(CAST(n AS HUGEINT) * CAST(n AS HUGEINT)) AS ss
    FROM daily GROUP BY 1
),
win AS (
    SELECT iso_dow, n_days,
           CAST(n_days AS DOUBLE) AS nd,
           CAST(s AS DOUBLE) AS sd,
           CAST(SUM(n_days) OVER w AS DOUBLE) AS n_tot,
           CAST(SUM(s) OVER w AS DOUBLE) AS s_tot,
           CAST(SUM(ss) OVER w AS DOUBLE) AS ss_tot,
           SUM(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE)) OVER w AS seas
    FROM per_dow
    WINDOW w AS (ORDER BY iso_dow ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND UNBOUNDED FOLLOWING)
)
SELECT iso_dow, n_days,
       ROUND(sd / nd, 6) AS mean_daily_turns,
       ROUND(sd / s_tot, 6) AS share,
       ROUND(CASE WHEN n_tot > 1
                   AND (ss_tot - s_tot * s_tot / n_tot) / (n_tot - 1.0) > 0
                  THEN greatest(0.0, 1.0 - ((ss_tot - seas) / (n_tot - 1.0))
                                           / ((ss_tot - s_tot * s_tot / n_tot) / (n_tot - 1.0)))
                  ELSE 0.0 END, 6) AS seasonal_strength
FROM win
"""

# label-horizon sensitivity (lock-step with survival.
# label_rate_by_horizon over the SAME survival-label CTE as km_curve)
_LABEL_RATE_BY_HORIZON_SQL = f"""
WITH {_SURVIVAL_CORE},
one AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN observed = 1 AND duration_days <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS p1,
           CAST(SUM(CASE WHEN observed = 1 AND duration_days <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS p3,
           CAST(SUM(CASE WHEN observed = 1 AND duration_days <= 7 THEN 1 ELSE 0 END) AS BIGINT) AS p7,
           CAST(SUM(CASE WHEN observed = 1 AND duration_days <= 14 THEN 1 ELSE 0 END) AS BIGINT) AS p14
    FROM labels
),
long_h AS (
    SELECT CAST(1 AS INTEGER) AS horizon_days, n, p1 AS n_positive FROM one
    UNION ALL SELECT 3, n, p3 FROM one
    UNION ALL SELECT 7, n, p7 FROM one
    UNION ALL SELECT 14, n, p14 FROM one
)
SELECT horizon_days, n, n_positive,
       ROUND(CAST(n_positive AS DOUBLE) / CAST(n AS DOUBLE), 6) AS positive_rate
FROM long_h
"""

# EWMA daily level (lock-step with windows.ewma_daily: staircase
# half-life weights 1/(1<<k) — exact IEEE both engines; weighted sums
# over the day-ordered window frame of the bounded pair table)
_EWMA_DAILY_SQL = f"""
WITH {_CONV_CTE},
daily AS (
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
           CAST(COUNT(*) AS BIGINT) AS n_turns
    FROM conversations GROUP BY 1
),
days AS (
    SELECT d, CAST(floor(epoch_us(d) / {86400 * 1_000_000}) AS BIGINT) AS dn, n_turns
    FROM daily
),
pairs AS (
    SELECT a.d, a.dn, a.n_turns, b.dn AS dni, b.n_turns AS xi,
           CASE WHEN CAST(floor((a.dn - b.dn) / 3) AS INTEGER) <= 62
                THEN 1.0 / CAST(CAST(1 AS BIGINT)
                                << CAST(floor((a.dn - b.dn) / 3) AS INTEGER) AS DOUBLE)
                ELSE 0.0 END AS w
    FROM days a JOIN days b ON b.dn <= a.dn
),
summed AS (
    SELECT d, dn, n_turns, MAX(num) AS num, MAX(den) AS den FROM (
        SELECT d, dn, n_turns,
               SUM(w * CAST(xi AS DOUBLE)) OVER (PARTITION BY dn ORDER BY dni
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS num,
               SUM(w) OVER (PARTITION BY dn ORDER BY dni
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS den
        FROM pairs
    ) GROUP BY d, dn, n_turns
),
lev AS (
    SELECT d, dn, n_turns, num / den AS ewma,
           lag(num / den) OVER (ORDER BY dn) AS prev
    FROM summed
)
SELECT d, n_turns,
       ROUND(ewma, 6) AS ewma,
       ROUND(COALESCE(prev, -1.0), 6) AS forecast,
       ROUND(COALESCE(CASE WHEN prev IS NOT NULL AND prev <> 0
                           THEN (CAST(n_turns AS DOUBLE) - prev) / prev END, 0.0), 6)
           AS forecast_err,
       ABS(COALESCE(CASE WHEN prev IS NOT NULL AND prev <> 0
                         THEN (CAST(n_turns AS DOUBLE) - prev) / prev END, 0.0)) > 0.5
           AS is_surprise
FROM lev
"""

# QQ drift table (lock-step with psi.qq_shift: quantile_cont ==
# Spark exact percentile; same even/odd week folds as the drift gates)
_QQ_SHIFT_SQL = f"""
WITH {_CONV_CTE},
tagged AS (
    SELECT CASE WHEN CAST(floor(epoch_us(CAST(date_trunc('week', ts) AS TIMESTAMP))
                            / {7 * 86400 * 1_000_000}) AS BIGINT) % 2 = 0
                THEN 'even' ELSE 'odd' END AS fold,
           CAST(length(text) AS BIGINT) AS text_len
    FROM conversations
),
per AS (
    SELECT fold,
           quantile_cont(text_len, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qs
    FROM tagged GROUP BY fold
),
long_q AS (
    SELECT fold,
           unnest([0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS prob,
           CAST(unnest(qs) AS DOUBLE) AS q
    FROM per
),
ref AS (SELECT prob, q AS q_ref FROM long_q WHERE fold = 'even')
SELECT c.fold, c.prob,
       ROUND(c.q, 6) AS q_cur,
       ROUND(r.q_ref, 6) AS q_ref,
       ROUND(c.q - r.q_ref, 6) AS shift
FROM long_q c JOIN ref r ON c.prob = r.prob
WHERE c.fold <> 'even'
"""

# Spearman rank correlation (lock-step with association.spearman_corr:
# doubled average ranks 2r = 2·before + cnt + 1 are exact integers,
# five HUGEINT sufficient sums, one fixed-shape double expression)
_SPEARMAN_SQL = f"""
WITH {_CONV_CTE},
base AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS _x,
           CAST(SUM(length(text)) AS BIGINT) AS _y
    FROM conversations GROUP BY conv_id
),
vx AS (SELECT _x, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY _x),
rx AS (
    SELECT _x,
           CAST(2 * COALESCE(SUM(c) OVER (ORDER BY _x ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING), 0)
                + c + 1 AS HUGEINT) AS _rx
    FROM vx
),
vy AS (SELECT _y, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY _y),
ry AS (
    SELECT _y,
           CAST(2 * COALESCE(SUM(c) OVER (ORDER BY _y ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING), 0)
                + c + 1 AS HUGEINT) AS _ry
    FROM vy
),
j AS (
    SELECT b._x, b._y, rx._rx, ry._ry
    FROM base b JOIN rx ON b._x = rx._x JOIN ry ON b._y = ry._y
),
one AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           SUM(_rx) AS sx, SUM(_ry) AS sy,
           SUM(_rx * _rx) AS sxx, SUM(_ry * _ry) AS syy,
           SUM(_rx * _ry) AS sxy
    FROM j
)
SELECT n,
       ROUND(CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
                   AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
                  THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                          * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                  ELSE 0.0 END, 6) AS spearman
FROM one
"""

# Markov next-tool backtest (lock-step with lags.transition_backtest:
# fold tagged BEFORE the lead; a pair counts only when BOTH turns
# share the fold — straddling pairs dropped, temporally disjoint on
# the predicted event; train argmax row_number(count DESC, to_tool
# ASC); unseen from-tools predict NULL and score 0)
_TRANSITION_BACKTEST_SQL = f"""
WITH {_CONV_CTE},
tagged AS (
    SELECT CASE WHEN CAST(floor(epoch_us(CAST(date_trunc('week', ts) AS TIMESTAMP))
                            / {7 * 86400 * 1_000_000}) AS BIGINT) % 2 = 0
                THEN 'even' ELSE 'odd' END AS _fold,
           conv_id, ts, turn_idx, tool
    FROM conversations WHERE tool IS NOT NULL
),
pairs AS (
    SELECT _fold,
           tool AS from_tool,
           lead(tool) OVER w AS to_tool,
           lead(_fold) OVER w AS _fold_to
    FROM tagged
    WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx)
),
good AS (SELECT _fold, from_tool, to_tool FROM pairs
         WHERE to_tool IS NOT NULL AND _fold = _fold_to),
tr_counts AS (
    SELECT from_tool, to_tool, CAST(COUNT(*) AS BIGINT) AS _n
    FROM good WHERE _fold = 'even' GROUP BY from_tool, to_tool
),
train AS (
    SELECT from_tool, to_tool AS predicted FROM (
        SELECT from_tool, to_tool,
               row_number() OVER (PARTITION BY from_tool
                                  ORDER BY _n DESC, to_tool ASC) AS _rn
        FROM tr_counts
    ) WHERE _rn = 1
)
SELECT g._fold AS fold, g.from_tool,
       MAX(t.predicted) AS predicted,
       CAST(COUNT(*) AS BIGINT) AS n_eval,
       CAST(SUM(CASE WHEN g.to_tool = t.predicted THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       ROUND(CAST(SUM(CASE WHEN g.to_tool = t.predicted THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS accuracy
FROM good g LEFT JOIN train t ON g.from_tool = t.from_tool
WHERE g._fold <> 'even'
GROUP BY g._fold, g.from_tool
"""

# TF cosine between sources (lock-step with textstats.
# source_tf_cosine: same normalize/tokenize/hash48 stream, EXACT
# hugeint dot products and norms, one double division per pair)
_SOURCE_TF_COSINE_SQL = f"""
WITH tok AS (
    SELECT source AS src, unnest({_TOKS}) AS t FROM documents
),
tc AS (
    SELECT src, {_H48.format(x='t')} AS gh, CAST(COUNT(*) AS BIGINT) AS c
    FROM tok WHERE t <> ''
    GROUP BY src, gh
),
dots AS (
    SELECT a.src AS source_a, b.src AS source_b,
           SUM(CAST(a.c AS HUGEINT) * CAST(b.c AS HUGEINT)) AS dot
    FROM tc a JOIN tc b ON a.gh = b.gh AND a.src < b.src
    GROUP BY a.src, b.src
),
norms AS (
    SELECT src, SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS n2
    FROM tc GROUP BY src
)
SELECT d.source_a, d.source_b,
       CAST(d.dot AS DOUBLE) AS dot,
       CAST(na.n2 AS DOUBLE) AS n2_a,
       CAST(nb.n2 AS DOUBLE) AS n2_b,
       ROUND(CAST(d.dot AS DOUBLE)
             / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))), 6) AS cosine
FROM dots d
JOIN norms na ON d.source_a = na.src
JOIN norms nb ON d.source_b = nb.src
"""

# nDCG@5 (lock-step with similarity.ndcg_at_k over the same LSH-vs-
# brute pair as ann_recall: relevance k+1−exact_rank, rel/log2(rank+1)
# terms summed over the rank-ordered window frame)
_NDCG_LSH_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
v AS (SELECT vec_id AS neighbor_id, embedding AS ne FROM embeddings),
ex_scored AS (
    SELECT query_id, neighbor_id, ROUND({_COS}, 6) AS cosine
    FROM q, v WHERE neighbor_id <> query_id
),
ex_ranked AS (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id ASC) AS rank
    FROM ex_scored
),
exact AS (
    SELECT query_id, neighbor_id,
           CAST(6 - rank AS DOUBLE) AS rel, rank AS erank
    FROM ex_ranked WHERE rank <= 5
),
qb AS (SELECT vec_id AS query_id, embedding AS qe,
              {_BUCKET.format(e='embedding')} AS bucket
       FROM embeddings WHERE vec_id < 10),
vb AS (SELECT vec_id AS neighbor_id, embedding AS ne,
              {_BUCKET.format(e='embedding')} AS bucket
       FROM embeddings),
ap_scored AS (
    SELECT query_id, neighbor_id, ROUND({_COS}, 6) AS cosine
    FROM qb JOIN vb USING (bucket) WHERE neighbor_id <> query_id
),
ap_ranked AS (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id ASC) AS rank
    FROM ap_scored
),
approx AS (SELECT query_id, neighbor_id, rank AS arank FROM ap_ranked WHERE rank <= 5),
dcg_terms AS (
    SELECT a.query_id, a.arank,
           COALESCE(e.rel, 0.0) / log2(CAST(a.arank AS DOUBLE) + 1.0) AS term
    FROM approx a
    LEFT JOIN exact e ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
),
dcg AS (
    SELECT query_id, MAX(w) AS dcg FROM (
        SELECT query_id,
               SUM(term) OVER (PARTITION BY query_id ORDER BY arank
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND UNBOUNDED FOLLOWING) AS w
        FROM dcg_terms
    ) GROUP BY query_id
),
idcg AS (
    SELECT query_id, MAX(w) AS idcg FROM (
        SELECT query_id,
               SUM(rel / log2(CAST(erank AS DOUBLE) + 1.0))
                   OVER (PARTITION BY query_id ORDER BY erank
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND UNBOUNDED FOLLOWING) AS w
        FROM exact
    ) GROUP BY query_id
)
SELECT i.query_id,
       ROUND(COALESCE(d.dcg, 0.0), 6) AS dcg,
       ROUND(i.idcg, 6) AS idcg,
       ROUND(CASE WHEN i.idcg > 0 THEN COALESCE(d.dcg, 0.0) / i.idcg ELSE 0.0 END, 6) AS ndcg
FROM idcg i LEFT JOIN dcg d ON i.query_id = d.query_id
"""

# log-rank test (lock-step with survival.logrank_test: hash-parity
# cohorts over the SAME survival-label CTE as km_curve; exact counts,
# E/V terms summed over the t-ordered window frame)
_LOGRANK_SQL = f"""
WITH {_SURVIVAL_CORE},
tagged AS (
    SELECT duration_days, observed,
           CASE WHEN ({_H48.format(x="concat('km', conv_id)")}) % 2 = 0
                THEN 'a' ELSE 'b' END AS cohort
    FROM labels
),
per_t AS (
    SELECT duration_days AS t,
           CAST(SUM(CASE WHEN cohort = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS l_a,
           CAST(SUM(CASE WHEN cohort = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS l_b,
           CAST(SUM(CASE WHEN cohort = 'a' THEN observed ELSE 0 END) AS BIGINT) AS d_a,
           CAST(SUM(CASE WHEN cohort = 'b' THEN observed ELSE 0 END) AS BIGINT) AS d_b
    FROM tagged GROUP BY duration_days
),
at_risk AS (
    SELECT t, d_a, d_b,
           CAST(SUM(l_a) OVER ()
                - COALESCE(SUM(l_a) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING), 0) AS BIGINT) AS n_a,
           CAST(SUM(l_b) OVER ()
                - COALESCE(SUM(l_b) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING), 0) AS BIGINT) AS n_b
    FROM per_t
),
terms AS (
    SELECT t, d_a, d_b, n_a, n_b,
           CAST(d_a + d_b AS DOUBLE) * CAST(n_a AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) AS e_term,
           CASE WHEN n_a + n_b > 1
                THEN CAST(d_a + d_b AS DOUBLE)
                     * (CAST(n_a AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                     * (1.0 - CAST(n_a AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                     * ((CAST(n_a + n_b AS DOUBLE) - CAST(d_a + d_b AS DOUBLE))
                        / (CAST(n_a + n_b AS DOUBLE) - 1.0))
                ELSE 0.0 END AS v_term
    FROM at_risk
),
sums AS (
    SELECT MAX(o_a) AS o_a, MAX(o_b) AS o_b, MAX(e_a) AS e_a, MAX(v) AS v FROM (
        SELECT CAST(SUM(d_a) OVER w AS BIGINT) AS o_a,
               CAST(SUM(d_b) OVER w AS BIGINT) AS o_b,
               SUM(e_term) OVER w AS e_a,
               SUM(v_term) OVER w AS v
        FROM terms
        WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND UNBOUNDED FOLLOWING)
    )
)
SELECT o_a, o_b,
       ROUND(e_a, 6) AS e_a,
       ROUND(CAST(o_a + o_b AS DOUBLE) - e_a, 6) AS e_b,
       ROUND(v, 6) AS variance,
       ROUND(CASE WHEN v > 0 THEN (CAST(o_a AS DOUBLE) - e_a) / sqrt(v) ELSE 0.0 END, 6) AS z_stat,
       ROUND((CASE WHEN v > 0 THEN (CAST(o_a AS DOUBLE) - e_a) / sqrt(v) ELSE 0.0 END)
             * (CASE WHEN v > 0 THEN (CAST(o_a AS DOUBLE) - e_a) / sqrt(v) ELSE 0.0 END), 6) AS chi2
FROM sums
"""

# CUPED (lock-step with abtest.cuped_adjusted: hash-parity arms,
# pre/post split at the global epoch-us midpoint, EXACT hugeint
# sufficient statistics per arm, identical fixed-shape double algebra)
_CUPED_TURNS_SQL = f"""
WITH {_CONV_CTE},
mid AS (
    SELECT CAST(floor((MIN(epoch_us(ts)) + MAX(epoch_us(ts))) / 2) AS BIGINT) AS _mid
    FROM conversations
),
per_conv AS (
    SELECT conv_id,
           CAST(SUM(CASE WHEN epoch_us(ts) < _mid THEN 1 ELSE 0 END) AS BIGINT) AS x,
           CAST(SUM(CASE WHEN epoch_us(ts) >= _mid THEN 1 ELSE 0 END) AS BIGINT) AS y
    FROM conversations CROSS JOIN mid
    GROUP BY conv_id
),
units AS (
    SELECT CASE WHEN ({_H48.format(x="concat('cuped', conv_id)")}) % 2 = 0
                THEN 'a' ELSE 'b' END AS arm, x, y
    FROM per_conv
),
per_arm AS (
    SELECT arm,
           CAST(COUNT(*) AS BIGINT) AS n,
           SUM(CAST(x AS HUGEINT)) AS sx,
           SUM(CAST(y AS HUGEINT)) AS sy,
           SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
           SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
           SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy
    FROM units GROUP BY arm
),
pooled AS (
    SELECT CAST(SUM(n) AS DOUBLE) AS _N,
           CAST(SUM(sx) AS DOUBLE) AS _SX,
           CAST(SUM(sy) AS DOUBLE) AS _SY,
           CAST(SUM(sxy) AS DOUBLE) AS _SXY,
           CAST(SUM(sxx) AS DOUBLE) AS _SXX
    FROM per_arm
),
calc AS (
    SELECT arm, n,
           CASE WHEN _N * _SXX - _SX * _SX > 0
                THEN (_N * _SXY - _SX * _SY) / (_N * _SXX - _SX * _SX)
                ELSE 0.0 END AS theta,
           _SX / _N AS xbar_pool,
           CAST(n AS DOUBLE) AS nd,
           CAST(sx AS DOUBLE) AS sxd,
           CAST(sy AS DOUBLE) AS syd,
           CAST(sxy AS DOUBLE) AS sxyd,
           CAST(sxx AS DOUBLE) AS sxxd,
           CAST(syy AS DOUBLE) AS syyd
    FROM per_arm CROSS JOIN pooled
),
calc2 AS (
    SELECT arm, n, theta,
           syd / nd AS mean_y,
           syd / nd - theta * (sxd / nd - xbar_pool) AS mean_y_adj,
           CASE WHEN n > 1 THEN (syyd - syd * syd / nd) / (nd - 1.0) ELSE 0.0 END AS var_y,
           CASE WHEN n > 1 THEN (sxxd - sxd * sxd / nd) / (nd - 1.0) ELSE 0.0 END AS var_x,
           CASE WHEN n > 1 THEN (sxyd - sxd * syd / nd) / (nd - 1.0) ELSE 0.0 END AS cov
    FROM calc
)
SELECT arm, n,
       ROUND(mean_y, 6) AS mean_y,
       ROUND(mean_y_adj, 6) AS mean_y_adj,
       ROUND(var_y, 6) AS var_y,
       ROUND(var_y - 2.0 * theta * cov + theta * theta * var_x, 6) AS var_y_adj,
       ROUND(CASE WHEN var_y > 0
                  THEN 1.0 - (var_y - 2.0 * theta * cov + theta * theta * var_x) / var_y
                  ELSE 0.0 END, 6) AS var_reduction,
       ROUND(theta, 6) AS theta
FROM calc2
"""

# covariate balance (lock-step with abtest.covariate_balance: melt of
# the three per-conversation covariates, exact hugeint sums per
# (covariate, arm), SMD as one fixed-shape double expression)
_COVARIATE_BALANCE_SQL = f"""
WITH {_CONV_CTE},
per_conv AS (
    SELECT conv_id,
           CAST(COUNT(*) AS BIGINT) AS n_turns,
           CAST(SUM(length(text)) AS BIGINT) AS text_len,
           CAST(SUM(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_tool_turns
    FROM conversations GROUP BY conv_id
),
units AS (
    SELECT CASE WHEN ({_H48.format(x="concat('ab', conv_id)")}) % 2 = 0
                THEN 'a' ELSE 'b' END AS arm,
           n_turns, text_len, n_tool_turns
    FROM per_conv
),
long_u AS (
    SELECT arm, 'n_turns' AS covariate, n_turns AS v FROM units
    UNION ALL
    SELECT arm, 'text_len' AS covariate, text_len AS v FROM units
    UNION ALL
    SELECT arm, 'n_tool_turns' AS covariate, n_tool_turns AS v FROM units
),
per AS (
    SELECT covariate,
           CAST(SUM(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(SUM(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
           SUM(CASE WHEN arm = 'a' THEN CAST(v AS HUGEINT) ELSE 0 END) AS s_a,
           SUM(CASE WHEN arm = 'b' THEN CAST(v AS HUGEINT) ELSE 0 END) AS s_b,
           SUM(CASE WHEN arm = 'a' THEN CAST(v AS HUGEINT) * CAST(v AS HUGEINT) ELSE 0 END) AS ss_a,
           SUM(CASE WHEN arm = 'b' THEN CAST(v AS HUGEINT) * CAST(v AS HUGEINT) ELSE 0 END) AS ss_b
    FROM long_u GROUP BY covariate
),
calc AS (
    SELECT covariate, n_a, n_b,
           CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS mean_a,
           CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mean_b,
           (CASE WHEN n_a > 1
                 THEN (CAST(ss_a AS DOUBLE)
                       - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE))
                      / (CAST(n_a AS DOUBLE) - 1.0)
                 ELSE 0.0 END
            + CASE WHEN n_b > 1
                 THEN (CAST(ss_b AS DOUBLE)
                       - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                      / (CAST(n_b AS DOUBLE) - 1.0)
                 ELSE 0.0 END) / 2.0 AS pooled
    FROM per
),
calc2 AS (
    SELECT covariate, n_a, n_b, mean_a, mean_b,
           CASE WHEN pooled > 0 THEN (mean_a - mean_b) / sqrt(pooled) ELSE 0.0 END AS smd
    FROM calc
)
SELECT covariate, n_a, n_b,
       ROUND(mean_a, 6) AS mean_a,
       ROUND(mean_b, 6) AS mean_b,
       ROUND(smd, 6) AS smd,
       ABS(smd) > 0.1 AS imbalanced
FROM calc2
"""

# MDE power analysis (lock-step with abtest.power_mde: exact hugeint
# moment sums per arm, (1.959964 + 0.841621)·SE as one fixed-shape
# double expression)
_MDE_TEXT_LEN_SQL = f"""
WITH {_CONV_CTE},
units AS (
    SELECT CASE WHEN ({_H48.format(x="concat('ab', conv_id)")}) % 2 = 0
                THEN 'a' ELSE 'b' END AS arm,
           CAST(length(text) AS BIGINT) AS y
    FROM conversations
),
one AS (
    SELECT CAST(SUM(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(SUM(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
           SUM(CASE WHEN arm = 'a' THEN CAST(y AS HUGEINT) ELSE 0 END) AS sy_a,
           SUM(CASE WHEN arm = 'b' THEN CAST(y AS HUGEINT) ELSE 0 END) AS sy_b,
           SUM(CASE WHEN arm = 'a' THEN CAST(y AS HUGEINT) * CAST(y AS HUGEINT) ELSE 0 END) AS syy_a,
           SUM(CASE WHEN arm = 'b' THEN CAST(y AS HUGEINT) * CAST(y AS HUGEINT) ELSE 0 END) AS syy_b
    FROM units
),
calc AS (
    SELECT n_a, n_b,
           CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS mean_a,
           CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mean_b,
           CASE WHEN n_a > 1
                THEN (CAST(syy_a AS DOUBLE)
                      - CAST(sy_a AS DOUBLE) * CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE))
                     / (CAST(n_a AS DOUBLE) - 1.0)
                ELSE 0.0 END AS var_a,
           CASE WHEN n_b > 1
                THEN (CAST(syy_b AS DOUBLE)
                      - CAST(sy_b AS DOUBLE) * CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                     / (CAST(n_b AS DOUBLE) - 1.0)
                ELSE 0.0 END AS var_b
    FROM one
),
calc2 AS (
    SELECT n_a, n_b, mean_a, mean_b, var_a, var_b,
           (CAST(1.959964 AS DOUBLE) + CAST(0.841621 AS DOUBLE))
           * sqrt(var_a / CAST(n_a AS DOUBLE) + var_b / CAST(n_b AS DOUBLE)) AS mde
    FROM calc
)
SELECT n_a, n_b,
       ROUND(mean_a, 6) AS mean_a,
       ROUND(mean_b, 6) AS mean_b,
       ROUND(var_a, 6) AS var_a,
       ROUND(var_b, 6) AS var_b,
       ROUND(mde, 6) AS mde_abs,
       ROUND(CASE WHEN mean_a <> 0 THEN mde / mean_a ELSE 0.0 END, 6) AS mde_rel
FROM calc2
"""

# two-proportion z (lock-step with abtest.two_proportion_z: exact
# conditional counts, pooled-SE z as one fixed double expression)
_PROPORTION_TOOL_USE_SQL = f"""
WITH {_CONV_CTE},
per_conv AS (
    SELECT conv_id, MAX(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END) AS success
    FROM conversations GROUP BY conv_id
),
units AS (
    SELECT CASE WHEN ({_H48.format(x="concat('prop', conv_id)")}) % 2 = 0
                THEN 'a' ELSE 'b' END AS arm, success
    FROM per_conv
),
one AS (
    SELECT CAST(SUM(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(SUM(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
           CAST(SUM(CASE WHEN arm = 'a' THEN success ELSE 0 END) AS BIGINT) AS s_a,
           CAST(SUM(CASE WHEN arm = 'b' THEN success ELSE 0 END) AS BIGINT) AS s_b
    FROM units
)
SELECT n_a, n_b, s_a, s_b,
       ROUND(CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS rate_a,
       ROUND(CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS rate_b,
       ROUND(CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
             - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS rate_diff,
       ROUND(CASE WHEN CAST(s_a + s_b AS DOUBLE) / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                       * (1.0 - CAST(s_a + s_b AS DOUBLE) / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
                       * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)) > 0
                  THEN (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                        - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                       / sqrt(CAST(s_a + s_b AS DOUBLE) / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                              * (1.0 - CAST(s_a + s_b AS DOUBLE) / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
                              * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
                  ELSE 0.0 END, 6) AS z_stat
FROM one
"""

# SRM check (lock-step with abtest.srm_check: exact observed counts,
# 50/50 design, chi² summed over the arm-ordered window frame)
_SRM_ARMS_SQL = f"""
WITH {_CONV_CTE},
armed AS (
    SELECT CASE WHEN ({_H48.format(x="concat('ab', conv_id)")}) % 2 = 0
                THEN 'a' ELSE 'b' END AS arm
    FROM (SELECT DISTINCT conv_id FROM conversations)
),
obs AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS observed FROM armed GROUP BY arm),
expected(arm, ratio) AS (VALUES ('a', 0.5), ('b', 0.5)),
j AS (
    SELECT e.arm, e.ratio, CAST(COALESCE(o.observed, 0) AS BIGINT) AS observed
    FROM expected e LEFT JOIN obs o ON e.arm = o.arm
),
win AS (
    SELECT arm, observed, ratio,
           CAST(SUM(observed) OVER () AS DOUBLE) AS total
    FROM j
),
terms AS (
    SELECT arm, observed, ratio, total,
           total * ratio AS e,
           CASE WHEN total * ratio > 0
                THEN (CAST(observed AS DOUBLE) - total * ratio)
                     * (CAST(observed AS DOUBLE) - total * ratio) / (total * ratio)
                ELSE 0.0 END AS term
    FROM win
)
SELECT arm, observed,
       ROUND(e, 6) AS expected,
       ROUND(CAST(observed AS DOUBLE) / total, 6) AS share,
       ROUND(SUM(term) OVER (ORDER BY arm
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND UNBOUNDED FOLLOWING), 6) AS chi2,
       SUM(term) OVER (ORDER BY arm
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND UNBOUNDED FOLLOWING) > 3.841 AS srm
FROM terms
"""

# two-sample KS drift (lock-step with psi.ks_from_bins: same fold/bin
# stream as the PSI/JSD/W1 gates; sup over the union of observed bins,
# EXACT hugeint cross-products |C_cur·N_ref − C_ref·N_cur|, MAX
# (order-free), one final double division, round 6)
_KS_SQL = f"""
WITH {_CONV_CTE},
binned AS (
    SELECT CASE WHEN CAST(floor(epoch_us(CAST(date_trunc('week', ts) AS TIMESTAMP))
                            / {7 * 86400 * 1_000_000}) AS BIGINT) % 2 = 0
                THEN 'even' ELSE 'odd' END AS fold,
           CAST(LEAST(GREATEST(floor(CAST(length(text) AS BIGINT) / 5.0), 0), 9) AS INTEGER) AS bin
    FROM conversations
),
counts AS (SELECT fold, bin, CAST(COUNT(*) AS BIGINT) AS n FROM binned GROUP BY 1, 2),
bins AS (SELECT DISTINCT bin FROM counts),
cur_grid AS (
    SELECT f.fold, b.bin
    FROM (SELECT DISTINCT fold FROM counts WHERE fold <> 'even') f
    CROSS JOIN bins b
),
cur_full AS (
    SELECT g.fold, g.bin, COALESCE(c.n, 0) AS n
    FROM cur_grid g
    LEFT JOIN counts c ON g.fold = c.fold AND g.bin = c.bin
),
ref_full AS (
    SELECT b.bin, COALESCE(c.n, 0) AS n
    FROM bins b
    LEFT JOIN (SELECT bin, n FROM counts WHERE fold = 'even') c ON b.bin = c.bin
),
cur AS (
    SELECT fold, bin,
           CAST(SUM(n) OVER (PARTITION BY fold ORDER BY bin
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS _cum,
           CAST(SUM(n) OVER (PARTITION BY fold) AS BIGINT) AS _tot
    FROM cur_full
),
ref AS (
    SELECT bin,
           CAST(SUM(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS _rcum,
           CAST(SUM(n) OVER () AS BIGINT) AS _rtot
    FROM ref_full
)
SELECT c.fold,
       ROUND(CAST(MAX(ABS(CAST(c._cum AS HUGEINT) * CAST(r._rtot AS HUGEINT)
                          - CAST(r._rcum AS HUGEINT) * CAST(c._tot AS HUGEINT)))
                  AS DOUBLE)
             / (CAST(MAX(c._tot) AS DOUBLE) * CAST(MAX(r._rtot) AS DOUBLE)), 6) AS ks,
       CAST(MAX(c._tot) AS BIGINT) AS n_cur,
       CAST(MAX(r._rtot) AS BIGINT) AS n_ref
FROM cur c JOIN ref r ON c.bin = r.bin
GROUP BY c.fold
"""


def _random_projection_oracle(d_in: int = 64, d_out: int = 8, seed: str = "jl") -> str:
    """Unrolled JL-projection SQL: the SAME md5-derived ±1 matrix as
    similarity._jl_signs, with each output dim one explicit
    left-associated sum (0.0 + x1*s1 + x2*s2 + ...) * scale — the
    identical double expression tree Spark's zip_with+aggregate fold
    builds, so the raw (unrounded) doubles match bit-for-bit."""
    from kkbox_churn_prediction_spark.operators.similarity import _jl_signs

    signs = _jl_signs(d_in, d_out, seed)
    scale = repr(1.0 / float(d_out) ** 0.5)
    dims = []
    for j in range(d_out):
        terms = " + ".join(
            f"CAST(embedding[{i + 1}] AS DOUBLE) * {signs[j][i]!r}"
            for i in range(d_in)
        )
        dims.append(f"(0.0 + {terms}) * {scale} AS proj_{j}")
    cols = ",\n       ".join(dims)
    return f"""
SELECT vec_id,
       {cols}
FROM embeddings
WHERE embedding IS NOT NULL AND len(embedding) >= {d_in}
"""

# winsorization (lock-step with operators/winsorize.py: exact
# interpolated percentiles rounded to 6 dp, greatest/least clip,
# strict-inequality clip flags)
_WINSORIZE_CORE = """
ev AS (
    SELECT event_id, CAST(value AS DOUBLE) AS value
    FROM events WHERE value IS NOT NULL AND event_id IS NOT NULL
),
edges AS (
    SELECT ROUND(quantile_cont(value, 0.01), 6) AS lo,
           ROUND(quantile_cont(value, 0.99), 6) AS hi
    FROM ev
),
clipped AS (
    SELECT event_id, value,
           greatest(least(value, hi), lo) AS value_w,
           value < lo AS clipped_low,
           value > hi AS clipped_high
    FROM ev CROSS JOIN edges
)
"""

_WINSORIZE_VALUE_SQL = f"""
WITH {_WINSORIZE_CORE}
SELECT event_id, value, value_w, clipped_low, clipped_high FROM clipped
"""

_WINSORIZE_AUDIT_SQL = f"""
WITH {_WINSORIZE_CORE}
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       SUM(CASE WHEN clipped_low THEN 1 ELSE 0 END) * 1.0 / COUNT(*) AS frac_clipped_low,
       SUM(CASE WHEN clipped_high THEN 1 ELSE 0 END) * 1.0 / COUNT(*) AS frac_clipped_high,
       AVG(value) - AVG(value_w) AS mean_shift
FROM clipped
"""

# streaming dedup oracle: duplicate-free per-conv counts — the stream
# saw every 10th event twice; dropDuplicatesWithinWatermark must make
# the counts equal to the clean batch's
_STREAMING_DEDUP_SQL = f"""
WITH {_CONV_CTE}
SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_turns
FROM conversations GROUP BY conv_id
"""

# transitive closure of the LSH pair graph via recursive CTE
# (lock-step with operators/components.py min-label fixpoint)
# keep-best cluster collapse (lock-step with components.select_canonical:
# score = length(text), ties toward the LARGER doc id)
_DEDUP_CANONICAL_SQL = f"""
WITH RECURSIVE pairs AS ({_MINHASH_LSH_SQL}),
edges AS (
    SELECT doc_a AS u, doc_b AS v FROM pairs
    UNION
    SELECT doc_b AS u, doc_a AS v FROM pairs
),
reach(node, label) AS (
    SELECT u, u FROM (SELECT DISTINCT u FROM edges) n
    UNION
    SELECT e.v, r.label FROM reach r JOIN edges e ON e.u = r.node
),
comp AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node),
scored AS (
    SELECT c.node, c.component, length(d.text) AS score
    FROM comp c JOIN documents d ON d.doc_id = c.node
),
ranked AS (
    SELECT component, node,
           ROW_NUMBER() OVER (PARTITION BY component
                              ORDER BY score DESC, node DESC) AS rn,
           COUNT(*) OVER (PARTITION BY component) AS n_members
    FROM scored
)
SELECT component, node AS canonical_id,
       CAST(n_members AS BIGINT) AS n_members,
       CAST(n_members - 1 AS BIGINT) AS n_removed
FROM ranked WHERE rn = 1
"""

_DEDUP_COMPONENTS_SQL = f"""
WITH RECURSIVE pairs AS ({_MINHASH_LSH_SQL}),
edges AS (
    SELECT doc_a AS u, doc_b AS v FROM pairs
    UNION
    SELECT doc_b AS u, doc_a AS v FROM pairs
),
reach(node, label) AS (
    SELECT u, u FROM (SELECT DISTINCT u FROM edges) n
    UNION
    SELECT e.v, r.label FROM reach r JOIN edges e ON e.u = r.node
),
comp AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node),
sizes AS (SELECT component, COUNT(*) AS component_size FROM comp GROUP BY component)
SELECT c.node, c.component, s.component_size
FROM comp c JOIN sizes s USING (component)
"""


# Duplicate-aware sampling weights (lock-step with
# components.duplication_weights: same recursive-CTE transitive
# closure as the components gate, then a LEFT join from the full
# corpus — singletons get component = own id, size 1, weight 1).
_DEDUP_WEIGHTS_SQL = f"""
WITH RECURSIVE pairs AS ({_MINHASH_LSH_SQL}),
edges AS (
    SELECT doc_a AS u, doc_b AS v FROM pairs
    UNION
    SELECT doc_b AS u, doc_a AS v FROM pairs
),
reach(node, label) AS (
    SELECT u, u FROM (SELECT DISTINCT u FROM edges) n
    UNION
    SELECT e.v, r.label FROM reach r JOIN edges e ON e.u = r.node
),
comp AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node),
sizes AS (SELECT component, COUNT(*) AS n FROM comp GROUP BY component)
SELECT d.doc_id,
       COALESCE(c.component, d.doc_id) AS component,
       CAST(COALESCE(s.n, 1) AS BIGINT) AS cluster_size,
       ROUND(1.0 / COALESCE(s.n, 1), 6) AS weight
FROM documents d
LEFT JOIN comp c ON c.node = d.doc_id
LEFT JOIN sizes s ON s.component = c.component
"""


# weekly refusal rate (lock-step with assemble.refusal_rate_weekly:
# same literal-substring lexicon as sft_pair_quality, exact counts)
_REFUSAL_RATE_WEEKLY_SQL = f"""
WITH {_CONV_CTE},
base AS (
    SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
           CASE WHEN contains(lower(text), 'i can''t')
                  OR contains(lower(text), 'i cannot')
                  OR contains(lower(text), 'i''m sorry')
                  OR contains(lower(text), 'as an ai')
                THEN 1 ELSE 0 END AS r
    FROM conversations WHERE role = 'assistant'
)
SELECT week,
       CAST(COUNT(*) AS BIGINT) AS n_turns,
       CAST(SUM(r) AS BIGINT) AS n_refusals,
       ROUND(CAST(SUM(r) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS refusal_rate
FROM base GROUP BY week
"""

# weekday-adjusted anomalies (lock-step with windows.
# daily_anomalies_deseasonalized: isodow means as exact-integer
# ratios, trailing z over the day-ordered bounded frame)
_DAILY_ANOMALIES_ADJ_SQL = f"""
WITH {_CONV_CTE},
daily AS (
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
           CAST(COUNT(*) AS BIGINT) AS n_turns
    FROM conversations GROUP BY 1
),
dowed AS (SELECT d, n_turns, CAST(isodow(d) AS INTEGER) AS dow FROM daily),
dmeans AS (
    SELECT dow, CAST(SUM(n_turns) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS nd
    FROM dowed GROUP BY dow
),
base AS (
    SELECT w.d, w.n_turns,
           CAST(w.n_turns AS DOUBLE) - CAST(m.s AS DOUBLE) / CAST(m.nd AS DOUBLE) AS resid
    FROM dowed w JOIN dmeans m ON w.dow = m.dow
),
scored AS (
    SELECT d, n_turns, resid,
           AVG(resid) OVER w AS mu,
           STDDEV_SAMP(resid) OVER w AS sd,
           COUNT(resid) OVER w AS n_prior
    FROM base
    WINDOW w AS (ORDER BY d ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT d, n_turns,
       ROUND(resid, 6) AS residual,
       ROUND(COALESCE(CASE WHEN n_prior >= 2 AND sd > 0
                           THEN (resid - mu) / sd END, 0.0), 6) AS z_resid,
       ABS(COALESCE(CASE WHEN n_prior >= 2 AND sd > 0
                         THEN (resid - mu) / sd END, 0.0)) > 3.0 AS is_anomaly
FROM scored
"""

# online weekday-adjusted anomalies (lock-step with
# windows.daily_anomalies_online: expanding PRIOR-only per-dow means
# — ROWS ... 1 PRECEDING — exact-integer ratios; cold-start weekdays
# emit residual 0; same trailing-z device)
_DAILY_ANOMALIES_ONLINE_SQL = f"""
WITH {_CONV_CTE},
daily AS (
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
           CAST(COUNT(*) AS BIGINT) AS n_turns
    FROM conversations GROUP BY 1
),
dowed AS (SELECT d, n_turns, CAST(isodow(d) AS INTEGER) AS dow FROM daily),
base AS (
    SELECT d, n_turns,
           CASE WHEN COUNT(n_turns) OVER wd > 0
                THEN CAST(n_turns AS DOUBLE)
                     - CAST(SUM(n_turns) OVER wd AS DOUBLE)
                       / CAST(COUNT(n_turns) OVER wd AS DOUBLE)
                ELSE 0.0 END AS resid
    FROM dowed
    WINDOW wd AS (PARTITION BY dow ORDER BY d
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
scored AS (
    SELECT d, n_turns, resid,
           AVG(resid) OVER w AS mu,
           STDDEV_SAMP(resid) OVER w AS sd,
           COUNT(resid) OVER w AS n_prior
    FROM base
    WINDOW w AS (ORDER BY d ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT d, n_turns,
       ROUND(resid, 6) AS residual,
       ROUND(COALESCE(CASE WHEN n_prior >= 2 AND sd > 0
                           THEN (resid - mu) / sd END, 0.0), 6) AS z_resid,
       ABS(COALESCE(CASE WHEN n_prior >= 2 AND sd > 0
                         THEN (resid - mu) / sd END, 0.0)) > 3.0 AS is_anomaly
FROM scored
"""

# difference-in-differences (lock-step with abtest.diff_in_diff:
# same pre/post midpoint split as cuped_turns, 'did'-salted arms,
# EXACT hugeint sums, paired-delta Welch inference)
_DID_TURNS_SQL = f"""
WITH {_CONV_CTE},
mid AS (
    SELECT CAST(floor((MIN(epoch_us(ts)) + MAX(epoch_us(ts))) / 2) AS BIGINT) AS _mid
    FROM conversations
),
per_conv AS (
    SELECT conv_id,
           CAST(SUM(CASE WHEN epoch_us(ts) < _mid THEN 1 ELSE 0 END) AS BIGINT) AS x,
           CAST(SUM(CASE WHEN epoch_us(ts) >= _mid THEN 1 ELSE 0 END) AS BIGINT) AS y
    FROM conversations CROSS JOIN mid
    GROUP BY conv_id
),
units AS (
    SELECT CASE WHEN ({_H48.format(x="concat('did', conv_id)")}) % 2 = 0
                THEN 'a' ELSE 'b' END AS arm, x, y
    FROM per_conv
),
one AS (
    SELECT CAST(SUM(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(SUM(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
           SUM(CASE WHEN arm = 'a' THEN CAST(x AS HUGEINT) ELSE 0 END) AS sx_a,
           SUM(CASE WHEN arm = 'b' THEN CAST(x AS HUGEINT) ELSE 0 END) AS sx_b,
           SUM(CASE WHEN arm = 'a' THEN CAST(y AS HUGEINT) ELSE 0 END) AS sy_a,
           SUM(CASE WHEN arm = 'b' THEN CAST(y AS HUGEINT) ELSE 0 END) AS sy_b,
           SUM(CASE WHEN arm = 'a'
                    THEN (CAST(y AS HUGEINT) - CAST(x AS HUGEINT))
                         * (CAST(y AS HUGEINT) - CAST(x AS HUGEINT)) ELSE 0 END) AS sdd_a,
           SUM(CASE WHEN arm = 'b'
                    THEN (CAST(y AS HUGEINT) - CAST(x AS HUGEINT))
                         * (CAST(y AS HUGEINT) - CAST(x AS HUGEINT)) ELSE 0 END) AS sdd_b
    FROM units
),
calc AS (
    SELECT n_a, n_b,
           CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS pre_a,
           CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS post_a,
           CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS pre_b,
           CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS post_b,
           CAST(sy_a - sx_a AS DOUBLE) AS sd_a,
           CAST(sy_b - sx_b AS DOUBLE) AS sd_b,
           CAST(sdd_a AS DOUBLE) AS sdd_a,
           CAST(sdd_b AS DOUBLE) AS sdd_b
    FROM one
),
calc2 AS (
    SELECT n_a, n_b, pre_a, post_a, pre_b, post_b,
           sd_b / CAST(n_b AS DOUBLE) - sd_a / CAST(n_a AS DOUBLE) AS did,
           (CASE WHEN n_a > 1
                 THEN (sdd_a - sd_a * sd_a / CAST(n_a AS DOUBLE))
                      / (CAST(n_a AS DOUBLE) - 1.0)
                 ELSE 0.0 END) / CAST(n_a AS DOUBLE)
           + (CASE WHEN n_b > 1
                   THEN (sdd_b - sd_b * sd_b / CAST(n_b AS DOUBLE))
                        / (CAST(n_b AS DOUBLE) - 1.0)
                   ELSE 0.0 END) / CAST(n_b AS DOUBLE) AS se2
    FROM calc
)
SELECT n_a, n_b,
       ROUND(pre_a, 6) AS pre_a,
       ROUND(post_a, 6) AS post_a,
       ROUND(pre_b, 6) AS pre_b,
       ROUND(post_b, 6) AS post_b,
       ROUND(did, 6) AS did,
       ROUND(CASE WHEN se2 > 0 THEN did / sqrt(se2) ELSE 0.0 END, 6) AS t_stat
FROM calc2
"""

# backward as-of join (lock-step with asof.asof_backward_nearest:
# max over (ts_us, turn_idx, payload) structs == ORDER BY ts DESC,
# turn_idx DESC LIMIT 1; strict ts < cutoff with a 14-day lookback)
_ASOF_LAST_EVENT_SQL = f"""
WITH {_CONV_CTE},
cand AS (
    SELECT c.conv_id, k.cutoff_ts, epoch_us(c.ts) AS us, c.turn_idx, c.role, c.tool,
           row_number() OVER (PARTITION BY c.conv_id, k.cutoff_ts
                              ORDER BY c.ts DESC, c.turn_idx DESC) AS rn
    FROM conversations c
    JOIN cutoffs k
      ON c.ts < k.cutoff_ts AND c.ts >= k.cutoff_ts - INTERVAL 14 DAY
),
latest AS (SELECT * FROM cand WHERE rn = 1),
grid AS (
    SELECT e.conv_id, k.cutoff_ts
    FROM (SELECT DISTINCT conv_id FROM conversations) e CROSS JOIN cutoffs k
)
SELECT g.conv_id, g.cutoff_ts,
       CAST(l.us AS BIGINT) AS last_ts_us,
       CAST(epoch_us(g.cutoff_ts) - l.us AS BIGINT) AS staleness_us,
       l.role AS last_role,
       l.tool AS last_tool,
       l.us IS NOT NULL AS found
FROM grid g
LEFT JOIN latest l ON g.conv_id = l.conv_id AND g.cutoff_ts = l.cutoff_ts
"""

# forward as-of join (lock-step with asof.asof_forward_nearest:
# min over (ts_us, turn_idx, payload) structs == ORDER BY ts, turn_idx
# LIMIT 1 per (conv, cutoff); NULL row when the horizon is empty)
_ASOF_NEXT_EVENT_SQL = f"""
WITH {_CONV_CTE},
cand AS (
    SELECT c.conv_id, k.cutoff_ts, epoch_us(c.ts) AS us, c.turn_idx, c.role, c.tool,
           row_number() OVER (PARTITION BY c.conv_id, k.cutoff_ts
                              ORDER BY c.ts, c.turn_idx) AS rn
    FROM conversations c
    JOIN cutoffs k
      ON c.ts > k.cutoff_ts AND c.ts <= k.cutoff_ts + INTERVAL 14 DAY
),
nearest AS (SELECT * FROM cand WHERE rn = 1),
grid AS (
    SELECT e.conv_id, k.cutoff_ts
    FROM (SELECT DISTINCT conv_id FROM conversations) e CROSS JOIN cutoffs k
)
SELECT g.conv_id, g.cutoff_ts,
       CAST(n.us AS BIGINT) AS next_ts_us,
       CAST(n.us - epoch_us(g.cutoff_ts) AS BIGINT) AS gap_us,
       n.role AS next_role,
       n.tool AS next_tool,
       n.us IS NOT NULL AS found
FROM grid g
LEFT JOIN nearest n ON g.conv_id = n.conv_id AND g.cutoff_ts = n.cutoff_ts
"""

# session-gap sensitivity (lock-step with sessionize.
# session_gap_sensitivity: n_sessions(g) = n_convs + |gaps > g| from
# one lag pass; exact counts, one division per mean)
_SESSION_GAP_SENSITIVITY_SQL = f"""
WITH {_CONV_CTE},
gaps AS (
    SELECT conv_id,
           epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY conv_id
                                                 ORDER BY ts, turn_idx)) AS g
    FROM conversations
),
one AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_turns,
           CAST(SUM(CASE WHEN g IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_convs,
           CAST(SUM(CASE WHEN g > 900000000 THEN 1 ELSE 0 END) AS BIGINT) AS s900,
           CAST(SUM(CASE WHEN g > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS s1800,
           CAST(SUM(CASE WHEN g > 3600000000 THEN 1 ELSE 0 END) AS BIGINT) AS s3600
    FROM gaps
),
long_g AS (
    SELECT CAST(900 AS INTEGER) AS gap_seconds, n_turns, n_convs + s900 AS n_sessions FROM one
    UNION ALL SELECT 1800, n_turns, n_convs + s1800 FROM one
    UNION ALL SELECT 3600, n_turns, n_convs + s3600 FROM one
)
SELECT gap_seconds, n_turns,
       CAST(n_sessions AS BIGINT) AS n_sessions,
       ROUND(CAST(n_turns AS DOUBLE) / CAST(n_sessions AS DOUBLE), 6)
           AS mean_turns_per_session
FROM long_g
"""

# streaming SRM monitor (lock-step with streaming/drift.py
# srm_over_windows over the same closed-window counts as the drift
# gate; hash-parity arms on user_id; chi² over the arm-ordered frame)
_STREAMING_SRM_SQL = f"""
WITH base AS (
    SELECT CASE WHEN ({_H48.format(x="concat('ab', CAST(user_id AS VARCHAR))")}) % 2 = 0
                THEN 'a' ELSE 'b' END AS arm,
           ts
    FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
maxts AS (SELECT MAX(epoch_us(ts)) AS m FROM base),
counts AS (
    SELECT CAST(floor(epoch_us(ts) / 3600000000) * 3600000000 AS BIGINT)
               AS window_start_us,
           arm, CAST(COUNT(*) AS BIGINT) AS n
    FROM base GROUP BY 1, 2
),
closed AS (
    SELECT window_start_us, arm, n
    FROM counts CROSS JOIN maxts
    WHERE window_start_us + 3600000000 <= m - 3600000000
),
expected(arm, ratio) AS (VALUES ('a', 0.5), ('b', 0.5)),
grid AS (
    SELECT w.window_start_us, e.arm, e.ratio
    FROM (SELECT DISTINCT window_start_us FROM closed) w CROSS JOIN expected e
),
j AS (
    SELECT g.window_start_us, g.arm, g.ratio,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS observed
    FROM grid g LEFT JOIN closed c
      ON g.window_start_us = c.window_start_us AND g.arm = c.arm
),
win AS (
    SELECT window_start_us, arm, ratio, observed,
           CAST(SUM(observed) OVER (PARTITION BY window_start_us) AS DOUBLE) AS total
    FROM j
),
terms AS (
    SELECT window_start_us, arm, observed, total * ratio AS e,
           CASE WHEN total * ratio > 0
                THEN (CAST(observed AS DOUBLE) - total * ratio)
                     * (CAST(observed AS DOUBLE) - total * ratio) / (total * ratio)
                ELSE 0.0 END AS term
    FROM win
)
SELECT window_start_us, arm, observed,
       ROUND(e, 6) AS expected,
       ROUND(SUM(term) OVER w, 6) AS chi2,
       SUM(term) OVER w > 3.841 AS srm
FROM terms
WINDOW w AS (PARTITION BY window_start_us ORDER BY arm
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""

# effective sample size of the weighted corpus (lock-step with
# components.effective_sample_size over the SAME recursive-CTE
# weight table as dedup_weights; m_k/k summed over the size-ordered
# histogram window)
_DEDUP_EFFECTIVE_SIZE_SQL = f"""
WITH RECURSIVE weighted AS ({_DEDUP_WEIGHTS_SQL.strip()}),
hist AS (
    SELECT cluster_size AS k, CAST(COUNT(*) AS BIGINT) AS n_docs_k
    FROM weighted GROUP BY cluster_size
),
rows_t AS (
    SELECT k, n_docs_k,
           CAST(n_docs_k // k AS BIGINT) AS m,
           CAST(CAST(n_docs_k // k AS BIGINT) AS DOUBLE) / CAST(k AS DOUBLE) AS inv
    FROM hist
),
agg AS (
    SELECT MAX(n_docs) AS n_docs, MAX(n_clusters) AS n_clusters,
           MAX(inv_sum) AS inv_sum FROM (
        SELECT CAST(SUM(n_docs_k) OVER w AS BIGINT) AS n_docs,
               CAST(SUM(m) OVER w AS BIGINT) AS n_clusters,
               SUM(inv) OVER w AS inv_sum
        FROM rows_t
        WINDOW w AS (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND UNBOUNDED FOLLOWING)
    )
)
SELECT n_docs, n_clusters,
       ROUND(CAST(n_clusters AS DOUBLE) * CAST(n_clusters AS DOUBLE) / inv_sum, 6) AS ess,
       ROUND(CAST(n_clusters AS DOUBLE) * CAST(n_clusters AS DOUBLE) / inv_sum
             / CAST(n_docs AS DOUBLE), 6) AS ess_ratio,
       ROUND(CAST(n_docs AS DOUBLE)
             - CAST(n_clusters AS DOUBLE) * CAST(n_clusters AS DOUBLE) / inv_sum, 6)
           AS redundant_mass
FROM agg
"""


# Cohen's kappa (lock-step with operators/association.py cohens_kappa:
# same contingency → marginal-product chance agreement → κ, same
# p_e = 1 degenerate-to-0 convention and 6-digit rounding).
_KAPPA_SQL = f"""
WITH {_CONV_CTE},
rated AS (
    SELECT CASE WHEN role IN ('system', 'tool') THEN 'machine'
                ELSE 'human' END AS rater_a,
           CASE WHEN length(text) >= 15 THEN 'machine'
                ELSE 'human' END AS rater_b
    FROM conversations
),
cells AS (
    SELECT rater_a, rater_b, COUNT(*) AS n_xy FROM rated GROUP BY 1, 2
),
tot AS (
    SELECT SUM(n_xy) AS n,
           SUM(CASE WHEN rater_a = rater_b THEN n_xy END) AS agree
    FROM cells
),
ma AS (SELECT rater_a AS label, SUM(n_xy) AS n_a FROM cells GROUP BY 1),
mb AS (SELECT rater_b AS label, SUM(n_xy) AS n_b FROM cells GROUP BY 1),
ch AS (
    SELECT SUM(CAST(n_a AS DOUBLE) * n_b) AS ab
    FROM ma JOIN mb USING (label)
)
SELECT CAST(n AS BIGINT) AS n,
       ROUND(COALESCE(agree, 0) * 1.0 / n, 6) AS po,
       ROUND(COALESCE(ab, 0.0) / (1.0 * n * n), 6) AS pe,
       ROUND(CASE WHEN COALESCE(ab, 0.0) / (1.0 * n * n) < 1.0
                  THEN (COALESCE(agree, 0) * 1.0 / n
                        - ab / (1.0 * n * n))
                       / (1.0 - ab / (1.0 * n * n))
                  ELSE 0.0 END, 6) AS kappa
FROM tot CROSS JOIN ch
"""

# Embedding outliers (lock-step with operators/similarity.py
# centroid_distance_outliers: per-position avg centroid, distance via
# the clamped ‖x‖² − 2·x·c + ‖c‖² identity, population-std z-score,
# sd = 0 → z = 0 / no outliers).
_EMB_OUTLIERS_SQL = """
WITH v AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
),
pos AS (
    SELECT unnest(e) AS x, unnest(range(1, len(e) + 1)) AS p FROM v
),
cent AS (
    SELECT list(avg_x ORDER BY p) AS c
    FROM (SELECT p, AVG(x) AS avg_x FROM pos GROUP BY p)
),
d AS (
    SELECT vec_id,
           sqrt(greatest(
               list_dot_product(e, e)
               - 2.0 * list_dot_product(e, c)
               + list_dot_product(c, c), 0.0)) AS dist
    FROM v CROSS JOIN cent
),
s AS (SELECT AVG(dist) AS mu, stddev_pop(dist) AS sd FROM d)
SELECT vec_id,
       ROUND(dist, 6) AS dist,
       ROUND(CASE WHEN sd > 0 THEN (dist - mu) / sd ELSE 0.0 END, 6) AS z,
       (CASE WHEN sd > 0 THEN (dist - mu) / sd ELSE 0.0 END) > 2.0
           AS is_outlier
FROM d CROSS JOIN s
"""


# Table checksum (lock-step with operators/profile.py table_checksum:
# same \x01 null sentinel, \x1f separator, stable_hash48, decimal-
# exact Σ mod M61 and bit-XOR — the cross-engine fingerprint IS the
# test).
_TABLE_CHECKSUM_SQL = f"""
WITH {_CONV_CTE},
h AS (
    SELECT CAST(concat('0x', substr(md5(
               concat_ws(chr(31),
                         COALESCE(CAST(conv_id AS VARCHAR), chr(1)),
                         COALESCE(CAST(turn_idx AS VARCHAR), chr(1)),
                         COALESCE(CAST(role AS VARCHAR), chr(1)),
                         COALESCE(CAST(tool AS VARCHAR), chr(1)),
                         COALESCE(CAST(text AS VARCHAR), chr(1)))
           ), 1, 12)) AS BIGINT) AS hv
    FROM conversations
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(hv) % 2305843009213693951 AS BIGINT) AS checksum_sum,
       CAST(bit_xor(hv) AS BIGINT) AS checksum_xor
FROM h
"""

# Snapshot diff (lock-step with operators/scd.py snapshot_diff over
# the gate's two trailing-14d windows before the last week-trunc).
_SNAPSHOT_DIFF_SQL = f"""
WITH {_CONV_CTE},
b AS (SELECT CAST(date_trunc('week', MAX(ts)) AS TIMESTAMP) AS cut_b
      FROM conversations),
pe AS (
    SELECT conv_id,
           SUM(CASE WHEN ts >= cut_b - INTERVAL 28 DAY
                     AND ts <  cut_b - INTERVAL 14 DAY THEN 1 ELSE 0 END)
               AS va,
           SUM(CASE WHEN ts >= cut_b - INTERVAL 14 DAY
                     AND ts <  cut_b THEN 1 ELSE 0 END) AS vb
    FROM conversations CROSS JOIN b
    GROUP BY conv_id
)
SELECT CASE WHEN va = 0 AND vb > 0 THEN 'added'
            WHEN va > 0 AND vb = 0 THEN 'removed'
            WHEN va <> vb THEN 'changed'
            ELSE 'unchanged' END AS status,
       CAST(COUNT(*) AS BIGINT) AS n_entities,
       CAST(SUM(vb - va) AS BIGINT) AS total_delta,
       ROUND(AVG(ABS(vb - va)), 6) AS avg_abs_delta
FROM pe
WHERE va > 0 OR vb > 0
GROUP BY 1
"""


# PageRank (lock-step with operators/components.py pagerank: same
# symmetrized edge set, uniform init over out-degree nodes, 3 unrolled
# power-iteration rounds with damping 0.85, supplier nodes reported).
_PAGERANK_SQL = """
WITH e0 AS (
    SELECT DISTINCT concat('c', o_custkey) AS s,
                    concat('s', l_suppkey) AS d
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
e AS (SELECT s, d FROM e0 UNION SELECT d AS s, s AS d FROM e0),
deg AS (SELECT s AS node, COUNT(*) AS deg FROM e GROUP BY s),
nn AS (SELECT COUNT(*) AS n FROM deg),
r0 AS (SELECT node, 1.0 / n AS rank FROM deg CROSS JOIN nn),
i1 AS (SELECT e.d AS node, SUM(r0.rank / deg.deg) AS infl
       FROM e JOIN r0 ON e.s = r0.node JOIN deg ON e.s = deg.node
       GROUP BY e.d),
r1 AS (SELECT node, 0.15 / n + 0.85 * infl AS rank FROM i1 CROSS JOIN nn),
i2 AS (SELECT e.d AS node, SUM(r1.rank / deg.deg) AS infl
       FROM e JOIN r1 ON e.s = r1.node JOIN deg ON e.s = deg.node
       GROUP BY e.d),
r2 AS (SELECT node, 0.15 / n + 0.85 * infl AS rank FROM i2 CROSS JOIN nn),
i3 AS (SELECT e.d AS node, SUM(r2.rank / deg.deg) AS infl
       FROM e JOIN r2 ON e.s = r2.node JOIN deg ON e.s = deg.node
       GROUP BY e.d),
r3 AS (SELECT node, 0.15 / n + 0.85 * infl AS rank FROM i3 CROSS JOIN nn)
SELECT node, ROUND(rank, 9) AS rank FROM r3 WHERE node LIKE 's%'
"""


# reciprocal-rank fusion (lock-step with similarity.rrf_fuse: k=60,
# rounded score ordering with doc-id tie-break, top 10). The two
# ranker subqueries are the SAME oracle bodies as embedding_topk
# (query pinned to vec 0, k=20) and bm25_search (k=20).
_RRF_DENSE_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id = 0),
v AS (SELECT vec_id AS neighbor_id, embedding AS ne FROM embeddings),
scored AS (
    SELECT query_id, neighbor_id, ROUND({_COS}, 6) AS cosine
    FROM q, v WHERE neighbor_id <> query_id
),
ranked AS (
    SELECT *, CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
    FROM scored
)
SELECT neighbor_id AS doc_id, rank FROM ranked WHERE rank <= 20
"""

_RRF_SQL = f"""
WITH dense AS (SELECT * FROM ({_RRF_DENSE_SQL}) d),
lexical AS (SELECT doc_id, rank FROM ({_bm25_oracle(_BM25_TERMS, k=20)}) b),
u AS (
    SELECT doc_id, rank FROM dense
    UNION ALL
    SELECT doc_id, rank FROM lexical
),
fused AS (
    SELECT doc_id,
           ROUND(SUM(1.0e0 / (60 + rank)), 6) AS rrf_score,
           CAST(COUNT(*) AS BIGINT) AS n_lists,
           CAST(MIN(rank) AS INTEGER) AS best_rank
    FROM u GROUP BY doc_id
),
final AS (
    SELECT *, CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id ASC)
                   AS INTEGER) AS fused_rank
    FROM fused
)
SELECT doc_id, rrf_score, n_lists, best_rank, fused_rank
FROM final WHERE fused_rank <= 10
"""


def _source_datacard_oracle() -> str:
    return f"""
WITH curated AS ({_curation_oracle()})
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(c.n_tokens) AS BIGINT) AS total_tokens,
       ROUND(AVG(c.quality_score), 6) AS mean_quality,
       ROUND(AVG(CASE WHEN c.verdict = 'kept' THEN 1.0e0 ELSE 0.0e0 END), 6)
         AS kept_rate,
       ROUND(AVG(CASE WHEN c.verdict = 'duplicate' THEN 1.0e0 ELSE 0.0e0 END), 6)
         AS dup_rate
FROM curated c JOIN documents d USING (doc_id)
GROUP BY d.source
"""


# Mann-Whitney (lock-step with abtest.mann_whitney_u: value-histogram
# midranks — 2*midrank = 2*cum_before + t + 1 stays integer; exact
# HUGEINT rank and tie sums, one fixed-shape double expression at
# the end)
_MANN_WHITNEY_SQL = f"""
WITH {_CONV_CTE},
vals AS (
    SELECT length(text) AS v,
           CASE WHEN ({_H48.format(x="concat('mw', conv_id)")}) % 2 = 0
                THEN 'a' ELSE 'b' END AS g
    FROM conversations WHERE text IS NOT NULL
),
hist AS (
    SELECT v,
           CAST(SUM(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS t_a,
           CAST(SUM(CASE WHEN g = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS t_b
    FROM vals GROUP BY v
),
ranked AS (
    SELECT t_a, t_b, t_a + t_b AS t,
           CAST(COALESCE(SUM(t_a + t_b) OVER (
               ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS cum_before
    FROM hist
),
sums AS (
    SELECT CAST(SUM(t_a) AS BIGINT) AS n_a,
           CAST(SUM(t_b) AS BIGINT) AS n_b,
           SUM(CAST(t_a AS HUGEINT)
               * (2 * CAST(cum_before AS HUGEINT) + t + 1)) AS two_r_a,
           SUM(CAST(t AS HUGEINT) * t * t - t) AS tie_term
    FROM ranked
),
calc AS (
    SELECT n_a, n_b,
           CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb,
           CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) AS nn,
           CAST(two_r_a AS DOUBLE) / 2.0
             - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1.0) / 2.0 AS u_a,
           CAST(tie_term AS DOUBLE) AS tie
    FROM sums
),
calc2 AS (
    SELECT n_a, n_b, na, nb, u_a,
           na * nb / 2.0 AS mean_u,
           na * nb / 12.0 * ((nn + 1.0) - tie / (nn * (nn - 1.0))) AS var_u
    FROM calc
)
SELECT n_a, n_b,
       ROUND(u_a, 6) AS u_a,
       ROUND(CASE WHEN na > 0 AND nb > 0 THEN u_a / (na * nb) ELSE 0.0 END, 6)
           AS auc,
       ROUND(CASE WHEN var_u > 0 THEN (u_a - mean_u) / sqrt(var_u)
                  ELSE 0.0 END, 6) AS z_stat
FROM calc2
"""

# QTE (lock-step with abtest.quantile_treatment_effect exact path:
# quantile_cont both engines, per-arm single pass, 3-row melt)
_QTE_SQL = f"""
WITH {_CONV_CTE},
units AS (
    SELECT length(text) AS y,
           CASE WHEN ({_H48.format(x="concat('qte', conv_id)")}) % 2 = 0
                THEN 'a' ELSE 'b' END AS arm
    FROM conversations WHERE text IS NOT NULL
),
per_arm AS (
    SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
           quantile_cont(CAST(y AS DOUBLE), 0.25) AS q25,
           quantile_cont(CAST(y AS DOUBLE), 0.5) AS q50,
           quantile_cont(CAST(y AS DOUBLE), 0.75) AS q75
    FROM units GROUP BY arm
),
melted AS (
    SELECT CAST(0.25 AS DOUBLE) AS q, arm, n, q25 AS qv FROM per_arm
    UNION ALL SELECT CAST(0.5 AS DOUBLE), arm, n, q50 FROM per_arm
    UNION ALL SELECT CAST(0.75 AS DOUBLE), arm, n, q75 FROM per_arm
),
one AS (
    SELECT q,
           CAST(SUM(CASE WHEN arm = 'a' THEN n END) AS BIGINT) AS n_a,
           CAST(SUM(CASE WHEN arm = 'b' THEN n END) AS BIGINT) AS n_b,
           SUM(CASE WHEN arm = 'a' THEN qv END) AS q_a,
           SUM(CASE WHEN arm = 'b' THEN qv END) AS q_b
    FROM melted GROUP BY q
)
SELECT ROUND(q, 6) AS q, n_a, n_b,
       ROUND(q_a, 6) AS q_a, ROUND(q_b, 6) AS q_b,
       ROUND(q_b - q_a, 6) AS qte
FROM one
"""


def _ipw_oracle(max_bin: int = 20, n_iter: int = 12) -> str:
    """IPW-ATE oracle (lock-step with abtest.ipw_ate): the binned
    propensity profile as exact integer stats, the 2-parameter Newton
    logistic unrolled as chained CTEs from (a=0, b=0) with the same
    det-guard, then the Hajek-weighted means as one pass over the
    <=21-row profile with the identical clip expression shape."""
    parts = [
        f"WITH {_CONV_CTE},",
        f"""
per_conv AS (
    SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_turns,
           CAST(SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_user
    FROM conversations GROUP BY conv_id
),
units AS (
    SELECT LEAST(n_user, {max_bin}) AS x, n_turns AS y,
           CASE WHEN ({_H48.format(x="concat('ipw', conv_id)")}) % 100
                     < 20 + 3 * LEAST(n_user, {max_bin})
                THEN 1 ELSE 0 END AS t
    FROM per_conv
),
prof AS (
    SELECT LEAST(GREATEST(x, 0), {max_bin}) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(t) AS BIGINT) AS n_t,
           CAST(SUM(y * t) AS BIGINT) AS sy_t,
           CAST(SUM(y * (1 - t)) AS BIGINT) AS sy_c
    FROM units GROUP BY 1
),
px AS (
    SELECT CAST(bin AS DOUBLE) AS x, CAST(n AS DOUBLE) AS nd,
           CAST(n_t AS DOUBLE) AS ntd, CAST(sy_t AS DOUBLE) AS sytd,
           CAST(sy_c AS DOUBLE) AS sycd
    FROM prof
),
it0 AS (SELECT 0.0 AS a, 0.0 AS b)""",
    ]
    for k in range(1, int(n_iter) + 1):
        parts.append(f""",
q{k} AS (
    SELECT px.x, px.nd, px.ntd, i.a, i.b,
           1.0 / (1.0 + exp(-(i.a * px.x + i.b))) AS q
    FROM px CROSS JOIN it{k - 1} i
),
s{k} AS (
    SELECT MAX(a) AS a, MAX(b) AS b,
           SUM((nd * q - ntd) * x) AS g_a,
           SUM(nd * q - ntd) AS g_b,
           SUM(nd * q * (1.0 - q) * x * x) AS h_aa,
           SUM(nd * q * (1.0 - q) * x) AS h_ab,
           SUM(nd * q * (1.0 - q)) AS h_bb
    FROM q{k}
),
it{k} AS (
    SELECT CASE WHEN abs(h_aa * h_bb - h_ab * h_ab) >= 1e-12
                THEN a - (h_bb * g_a - h_ab * g_b)
                         / (h_aa * h_bb - h_ab * h_ab)
                ELSE a END AS a,
           CASE WHEN abs(h_aa * h_bb - h_ab * h_ab) >= 1e-12
                THEN b - (h_aa * g_b - h_ab * g_a)
                         / (h_aa * h_bb - h_ab * h_ab)
                ELSE b END AS b
    FROM s{k}
)""")
    parts.append(f""",
wt AS (
    SELECT px.*, i.a, i.b,
           LEAST(GREATEST(1.0 / (1.0 + exp(-(i.a * px.x + i.b))), 0.01),
                 1.0 - 0.01) AS e
    FROM px CROSS JOIN it{int(n_iter)} i
),
fin AS (
    SELECT MAX(a) AS a, MAX(b) AS b,
           SUM(sytd / e) AS s1n, SUM(ntd / e) AS s1d,
           SUM(sycd / (1.0 - e)) AS s0n, SUM((nd - ntd) / (1.0 - e)) AS s0d,
           SUM(sytd) AS nv1n, SUM(ntd) AS nv1d,
           SUM(sycd) AS nv0n, SUM(nd - ntd) AS nv0d
    FROM wt
),
mus AS (
    SELECT CAST(nv1d AS BIGINT) AS n_treat, CAST(nv0d AS BIGINT) AS n_ctrl,
           a, b,
           CASE WHEN s1d > 0 THEN s1n / s1d ELSE 0.0 END AS mu1,
           CASE WHEN s0d > 0 THEN s0n / s0d ELSE 0.0 END AS mu0,
           CASE WHEN nv1d > 0 THEN nv1n / nv1d ELSE 0.0 END AS m1n,
           CASE WHEN nv0d > 0 THEN nv0n / nv0d ELSE 0.0 END AS m0n
    FROM fin
)
SELECT n_treat, n_ctrl, ROUND(a, 6) AS a, ROUND(b, 6) AS b,
       ROUND(mu1, 6) AS mu_treat, ROUND(mu0, 6) AS mu_ctrl,
       ROUND(mu1 - mu0, 6) AS ate_ipw, ROUND(m1n - m0n, 6) AS ate_naive
FROM mus
""")
    return "".join(parts)


# seasonal-naive forecast eval (lock-step with
# windows.seasonal_naive_eval: date-key self-joins on the bounded
# daily table, exact HUGEINT error sums, fixed-shape metric algebra)
_SEASONAL_NAIVE_SQL = f"""
WITH {_CONV_CTE},
daily AS (
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
           CAST(COUNT(*) AS BIGINT) AS y
    FROM conversations GROUP BY 1
),
joined AS (
    SELECT a.d, a.y, s.y AS y_hat, p.y AS y_prev
    FROM daily a
    LEFT JOIN daily s ON a.d = s.d + INTERVAL 7 DAY
    LEFT JOIN daily p ON a.d = p.d + INTERVAL 1 DAY
),
stats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(COUNT(y_hat) AS BIGINT) AS n_eval,
           SUM(ABS(CAST(y AS HUGEINT) - y_hat)) AS sae,
           SUM((CAST(y AS HUGEINT) - y_hat) * (CAST(y AS HUGEINT) - y_hat))
               AS sse,
           AVG(CASE WHEN y_hat IS NOT NULL AND y + y_hat > 0
                    THEN 2.0 * ABS(CAST(y - y_hat AS DOUBLE))
                         / CAST(y + y_hat AS DOUBLE) END) AS smape,
           CAST(COUNT(y_prev) AS BIGINT) AS n1,
           SUM(ABS(CAST(y AS HUGEINT) - y_prev)) AS sae1
    FROM joined
),
calc AS (
    SELECT n_days, n_eval, smape,
           CASE WHEN n_eval > 0
                THEN CAST(sae AS DOUBLE) / CAST(n_eval AS DOUBLE)
                ELSE 0.0 END AS mae,
           CASE WHEN n_eval > 0
                THEN sqrt(CAST(sse AS DOUBLE) / CAST(n_eval AS DOUBLE))
                ELSE 0.0 END AS rmse,
           CASE WHEN n1 > 0
                THEN CAST(sae1 AS DOUBLE) / CAST(n1 AS DOUBLE) END AS mae1
    FROM stats
)
SELECT n_days, n_eval,
       ROUND(mae, 6) AS mae,
       ROUND(rmse, 6) AS rmse,
       ROUND(COALESCE(smape, 0.0), 6) AS smape,
       ROUND(CASE WHEN mae1 > 0 THEN mae / mae1 ELSE 0.0 END, 6) AS mase
FROM calc
"""

# binary-segmentation first split (lock-step with
# windows.binseg_changepoint: exact HUGEINT prefix sums over the daily
# series, one fixed-shape cost expression per candidate, earliest-date
# tiebreak)
_BINSEG_SQL = f"""
WITH {_CONV_CTE},
daily AS (
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
           CAST(COUNT(*) AS BIGINT) AS y
    FROM conversations GROUP BY 1
),
pre AS (
    SELECT d,
           row_number() OVER (ORDER BY d) AS k,
           SUM(CAST(y AS HUGEINT)) OVER (
               ORDER BY d ROWS UNBOUNDED PRECEDING) AS s1,
           SUM(CAST(y AS HUGEINT) * y) OVER (
               ORDER BY d ROWS UNBOUNDED PRECEDING) AS s2,
           CAST(COUNT(*) OVER () AS BIGINT) AS n,
           SUM(CAST(y AS HUGEINT)) OVER () AS t1,
           SUM(CAST(y AS HUGEINT) * y) OVER () AS t2
    FROM daily
),
scored AS (
    SELECT d AS split_d, n AS n_days,
           CAST(k AS BIGINT) AS n_left,
           CAST(n - k AS BIGINT) AS n_right,
           CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE) AS _mean_l,
           (CAST(t1 AS DOUBLE) - CAST(s1 AS DOUBLE))
               / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)) AS _mean_r,
           (CAST(s2 AS DOUBLE)
              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE))
           + ((CAST(t2 AS DOUBLE) - CAST(s2 AS DOUBLE))
              - (CAST(t1 AS DOUBLE) - CAST(s1 AS DOUBLE))
                * (CAST(t1 AS DOUBLE) - CAST(s1 AS DOUBLE))
                / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))) AS _cost,
           CAST(t2 AS DOUBLE)
             - CAST(t1 AS DOUBLE) * CAST(t1 AS DOUBLE) / CAST(n AS DOUBLE)
               AS _sse_tot
    FROM pre WHERE k < n
)
SELECT n_days, split_d, n_left, n_right,
       ROUND(_mean_l, 6) AS mean_left,
       ROUND(_mean_r, 6) AS mean_right,
       ROUND(_sse_tot, 6) AS sse_total,
       ROUND(_cost, 6) AS sse_split,
       ROUND(_sse_tot - _cost, 6) AS sse_reduction
FROM scored ORDER BY _cost, split_d LIMIT 1
"""

# POT/GPD moment tail fit (lock-step with windows.pot_tail_fit exact
# path: quantile_cont threshold, exact HUGEINT excess moments via
# the shifted-sum identities, fixed-shape moment-estimator algebra)
_POT_TAIL_SQL = f"""
WITH {_CONV_CTE},
g AS (
    SELECT epoch_us(ts) - epoch_us(lag(ts) OVER (
               PARTITION BY conv_id ORDER BY ts, turn_idx)) AS x
    FROM conversations
),
vals AS (SELECT x FROM g WHERE x IS NOT NULL),
thr AS (SELECT quantile_cont(x, 0.9) AS u FROM vals),
stats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
           MAX(u) AS u,
           CAST(SUM(CASE WHEN x > u THEN 1 ELSE 0 END) AS BIGINT) AS n_exceed,
           SUM(CASE WHEN x > u THEN CAST(x AS HUGEINT) END) AS sx,
           SUM(CASE WHEN x > u THEN CAST(x AS HUGEINT) * x END) AS sxx
    FROM vals CROSS JOIN thr
),
calc AS (
    SELECT n_total, n_exceed, u,
           CAST(sx AS DOUBLE) / CAST(n_exceed AS DOUBLE) - u AS m,
           CAST(sxx AS DOUBLE)
             - 2.0 * u * CAST(sx AS DOUBLE)
             + CAST(n_exceed AS DOUBLE) * u * u AS sxx_c
    FROM stats
),
calc2 AS (
    SELECT n_total, n_exceed, u, m,
           CASE WHEN n_exceed > 1
                THEN (sxx_c - CAST(n_exceed AS DOUBLE) * m * m)
                     / (CAST(n_exceed AS DOUBLE) - 1.0) END AS var
    FROM calc
)
SELECT ROUND(u, 6) AS threshold,
       n_total, n_exceed,
       ROUND(COALESCE(m, 0.0), 6) AS mean_excess,
       ROUND(COALESCE(var, 0.0), 6) AS var_excess,
       ROUND(CASE WHEN var > 0 THEN 0.5 * (1.0 - m * m / var)
                  ELSE 0.0 END, 6) AS xi,
       ROUND(CASE WHEN var > 0 THEN 0.5 * m * (m * m / var + 1.0)
                  ELSE COALESCE(m, 0.0) END, 6) AS sigma
FROM calc2
"""


def _temp_oracle(n_bins: int = 20, n_iter: int = 12) -> str:
    """Temperature-scaling oracle (lock-step with
    calibration.temperature_scaling): the platt oracle's binned
    profile, then the 1-D Newton unrolled as chained CTEs from a=1
    with the same |h| det-guard."""
    clip = "LEAST(GREATEST(avg_conf, 1e-6), 1.0 - 1e-6)"
    parts = [
        f"WITH {_PRED_CTE}, {_BINNED_CTE.format(n=n_bins)},",
        f"""
prof AS (
    SELECT fold, bin, COUNT(*) AS n, ROUND(AVG(p), 6) AS avg_conf,
           CAST(SUM(y) AS BIGINT) AS sum_y
    FROM binned WHERE bin IS NOT NULL GROUP BY fold, bin
),
px AS (
    SELECT fold, bin, n, avg_conf,
           CAST(n AS DOUBLE) AS nd, CAST(sum_y AS DOUBLE) AS syd,
           ln(acc / (1.0 - acc)) AS x
    FROM (SELECT *, {clip} AS acc FROM prof)
),
it0 AS (SELECT fold, 1.0 AS a FROM px GROUP BY fold)""",
    ]
    for k in range(1, int(n_iter) + 1):
        parts.append(f""",
q{k} AS (
    SELECT px.fold, px.x, px.nd, px.syd, i.a,
           1.0 / (1.0 + exp(-(i.a * px.x))) AS q
    FROM px JOIN it{k - 1} i ON px.fold = i.fold
),
s{k} AS (
    SELECT fold, MAX(a) AS a,
           SUM((nd * q - syd) * x) AS g,
           SUM(nd * q * (1.0 - q) * x * x) AS h
    FROM q{k} GROUP BY fold
),
it{k} AS (
    SELECT fold,
           CASE WHEN abs(h) >= 1e-12 THEN a - g / h ELSE a END AS a
    FROM s{k}
)""")
    parts.append(f"""
SELECT px.fold, px.bin, px.n, px.avg_conf,
       ROUND(1.0 / (1.0 + exp(-(i.a * px.x))), 6) AS temp_prob,
       ROUND(i.a, 6) AS a,
       ROUND(CASE WHEN abs(i.a) >= 1e-12 THEN 1.0 / i.a ELSE 0.0 END, 6)
           AS temperature
FROM px JOIN it{int(n_iter)} i ON px.fold = i.fold
""")
    return "".join(parts)


# split conformal (lock-step with calibration.conformal_interval:
# per-role 6dp mean predictor on cal, score value-histogram, cum-rank
# order statistic, coverage from the SAME histogram)
_CONFORMAL_SQL = f"""
WITH {_CONV_CTE},
labeled AS (
    SELECT role, length(text) AS y,
           CASE WHEN ({_H48.format(x="concat('conf', conv_id)")}) % 2 = 0
                THEN 'cal' ELSE 'test' END AS sp
    FROM conversations
),
means AS (
    SELECT role, ROUND(AVG(CAST(y AS DOUBLE)), 6) AS yhat
    FROM labeled WHERE sp = 'cal' GROUP BY role
),
scored AS (
    SELECT ABS(CAST(l.y AS DOUBLE) - m.yhat) AS s, l.sp
    FROM labeled l JOIN means m ON l.role = m.role
),
hist AS (
    SELECT s,
           CAST(SUM(CASE WHEN sp = 'cal' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_cal,
           CAST(SUM(CASE WHEN sp = 'test' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_test
    FROM scored GROUP BY s
),
cum AS (
    SELECT s, CAST(SUM(n_cal) OVER (
        ORDER BY s ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cal
    FROM hist
),
tots AS (
    SELECT CAST(SUM(n_cal) AS BIGINT) AS tot_cal,
           CAST(SUM(n_test) AS BIGINT) AS tot_test,
           MAX(s) AS max_s
    FROM hist
),
kk AS (
    SELECT tot_cal, tot_test, max_s,
           CAST(CEIL((CAST(tot_cal AS DOUBLE) + 1) * CAST(0.9 AS DOUBLE))
                AS BIGINT) AS k
    FROM tots
),
qh AS (
    SELECT MIN(s) AS _qhat FROM cum CROSS JOIN kk WHERE cum_cal >= k
),
j AS (
    SELECT tot_cal AS n_cal, tot_test AS n_test, k,
           COALESCE(_qhat, max_s) AS qhat
    FROM kk CROSS JOIN qh
),
cov AS (
    SELECT CAST(SUM(CASE WHEN h.s <= j.qhat THEN h.n_test ELSE 0 END)
                AS BIGINT) AS n_cov
    FROM hist h CROSS JOIN j
)
SELECT n_cal, n_test, k,
       ROUND(qhat, 6) AS qhat,
       ROUND(CASE WHEN n_test > 0 THEN CAST(n_cov AS DOUBLE)
                       / CAST(n_test AS DOUBLE)
                  ELSE 0.0 END, 6) AS coverage,
       ROUND(2.0 * qhat, 6) AS mean_width
FROM j CROSS JOIN cov
"""


def _pinball_oracle(taus: tuple = (0.1, 0.5, 0.9)) -> str:
    """Pinball-loss oracle (lock-step with calibration.pinball_loss
    exact path): per-role quantile_cont fit on cal, the exact
    conditional integer sums on test, and the decomposed loss
    expression with (1.0 - tau) formed in DOUBLE exactly as the
    engine's Python computes it."""
    qcols = ", ".join(
        f"ROUND(quantile_cont(CAST(y AS DOUBLE), CAST({t!r} AS DOUBLE)), 6) AS q{i}"
        for i, t in enumerate(taus)
    )
    sums = []
    for i in range(len(taus)):
        sums.append(f"""
           CAST(SUM(CASE WHEN CAST(y AS DOUBLE) > q{i} THEN 1 ELSE 0 END)
                AS BIGINT) AS no{i},
           SUM(CASE WHEN CAST(y AS DOUBLE) > q{i}
                    THEN CAST(y AS HUGEINT) END) AS so{i},
           SUM(CASE WHEN NOT (CAST(y AS DOUBLE) > q{i})
                    THEN CAST(y AS HUGEINT) END) AS su{i},
           MAX(q{i}) AS q{i}""")
    branches = []
    for i, t in enumerate(taus):
        branches.append(f"""
SELECT role, CAST({t!r} AS DOUBLE) AS tau, ROUND(q{i}, 6) AS q_pred, n_eval,
       ROUND(CASE WHEN n_eval > 0 THEN
           (CAST({t!r} AS DOUBLE)
              * (COALESCE(CAST(so{i} AS DOUBLE), 0.0)
                 - CAST(no{i} AS DOUBLE) * q{i})
            + (CAST(1.0 AS DOUBLE) - CAST({t!r} AS DOUBLE))
              * ((CAST(n_eval AS DOUBLE) - CAST(no{i} AS DOUBLE)) * q{i}
                 - COALESCE(CAST(su{i} AS DOUBLE), 0.0)))
           / CAST(n_eval AS DOUBLE)
           ELSE 0.0 END, 6) AS pinball
FROM per""")
    return f"""
WITH {_CONV_CTE},
labeled AS (
    SELECT role, length(text) AS y,
           CASE WHEN ({_H48.format(x="concat('pin', conv_id)")}) % 2 = 0
                THEN 'cal' ELSE 'test' END AS sp
    FROM conversations
),
fit AS (
    SELECT role, {qcols}
    FROM labeled WHERE sp = 'cal' GROUP BY role
),
test AS (
    SELECT l.role, l.y, {", ".join(f"f.q{i}" for i in range(len(taus)))}
    FROM labeled l JOIN fit f ON l.role = f.role WHERE l.sp = 'test'
),
per AS (
    SELECT role, CAST(COUNT(*) AS BIGINT) AS n_eval,{",".join(sums)}
    FROM test GROUP BY role
)
{" UNION ALL ".join(branches)}
"""


# Effect sizes (lock-step with abtest.effect_sizes: ONE value
# histogram feeds both the exact moment sums (HUGEINT Σv·t, Σv²·t ↔
# Spark decimal(38,0)) and the Mann-Whitney midrank U; d/g/delta are
# single fixed-shape double expressions at the end)
_EFFECT_SIZES_SQL = f"""
WITH {_CONV_CTE},
vals AS (
    SELECT length(text) AS v,
           CASE WHEN ({_H48.format(x="concat('es', conv_id)")}) % 2 = 0
                THEN 'a' ELSE 'b' END AS g
    FROM conversations WHERE text IS NOT NULL
),
hist AS (
    SELECT v,
           CAST(SUM(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS t_a,
           CAST(SUM(CASE WHEN g = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS t_b
    FROM vals GROUP BY v
),
ranked AS (
    SELECT v, t_a, t_b, t_a + t_b AS t,
           CAST(COALESCE(SUM(t_a + t_b) OVER (
               ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS cum_before
    FROM hist
),
sums AS (
    SELECT CAST(SUM(t_a) AS BIGINT) AS n_a,
           CAST(SUM(t_b) AS BIGINT) AS n_b,
           SUM(CAST(v AS HUGEINT) * t_a) AS s_a,
           SUM(CAST(v AS HUGEINT) * t_b) AS s_b,
           SUM(CAST(v AS HUGEINT) * v * t_a) AS ss_a,
           SUM(CAST(v AS HUGEINT) * v * t_b) AS ss_b,
           SUM(CAST(t_a AS HUGEINT)
               * (2 * CAST(cum_before AS HUGEINT) + t + 1)) AS two_r_a
    FROM ranked
),
calc AS (
    SELECT n_a, n_b,
           CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb,
           CAST(s_a AS DOUBLE) AS sa, CAST(s_b AS DOUBLE) AS sb,
           CAST(ss_a AS DOUBLE) AS ssa, CAST(ss_b AS DOUBLE) AS ssb,
           CAST(two_r_a AS DOUBLE) / 2.0
             - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1.0) / 2.0 AS u_a
    FROM sums
),
calc2 AS (
    SELECT n_a, n_b, na, nb, u_a,
           sa / na AS mean_a, sb / nb AS mean_b,
           (ssa - sa * sa / na) / (na - 1.0) AS var_a,
           (ssb - sb * sb / nb) / (nb - 1.0) AS var_b
    FROM calc
),
calc3 AS (
    SELECT *, ((na - 1.0) * var_a + (nb - 1.0) * var_b) / (na + nb - 2.0) AS sp2
    FROM calc2
),
calc4 AS (
    SELECT n_a, n_b, na, nb, u_a, mean_a, mean_b,
           CASE WHEN sp2 > 0 THEN (mean_a - mean_b) / sqrt(sp2)
                ELSE 0.0 END AS d
    FROM calc3
)
SELECT n_a, n_b,
       ROUND(mean_a, 6) AS mean_a,
       ROUND(mean_b, 6) AS mean_b,
       ROUND(mean_a - mean_b, 6) AS mean_diff,
       ROUND(d, 6) AS cohens_d,
       ROUND(d * (1.0 - 3.0 / (4.0 * (na + nb) - 9.0)), 6) AS hedges_g,
       ROUND(CASE WHEN na > 0 AND nb > 0 THEN 2.0 * u_a / (na * nb) - 1.0
                  ELSE 0.0 END, 6) AS cliffs_delta
FROM calc4
"""


def _p2_sql(x: str, t: str) -> str:
    """The two-sided normal tail P(t)·e^(−x²) — the IDENTICAL
    Horner-form A&S 7.1.26 polynomial the engine's
    ``normal_p_two_sided`` evaluates (same parsed constants)."""
    return (
        f"{t} * (0.254829592 + {t} * (-0.284496736 + {t} * (1.421413741"
        f" + {t} * (-1.453152027 + {t} * 1.061405429)))) * exp(-({x} * {x}))"
    )


# BH-FDR over per-event-type early/late share-drift z-tests
# (lock-step with abtest.benjamini_hochberg + normal_p_two_sided:
# exact integer counts, pooled-SE z, erf-polynomial p, suffix-min
# step-up over the bounded hypothesis table)
_BH_FDR_SQL = f"""
WITH ev AS (
    SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us
    FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
),
b AS (SELECT CAST(MIN(us) AS BIGINT) AS mn, CAST(MAX(us) AS BIGINT) AS mx FROM ev),
tagged AS (
    SELECT event_type,
           CASE WHEN us <= CAST(floor((mn + mx) / 2) AS BIGINT)
                THEN 1 ELSE 0 END AS early
    FROM ev, b
),
agg AS (
    SELECT event_type,
           CAST(SUM(early) AS BIGINT) AS x1,
           CAST(SUM(1 - early) AS BIGINT) AS x2
    FROM tagged GROUP BY event_type
),
tot AS (SELECT CAST(SUM(x1) AS BIGINT) AS n1, CAST(SUM(x2) AS BIGINT) AS n2 FROM agg),
zt AS (
    SELECT event_type,
           CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS r1,
           CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS r2,
           CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE) AS phat,
           CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d
    FROM agg, tot
),
zs AS (
    SELECT event_type,
           CASE WHEN sqrt(phat * (1.0 - phat) * (1.0 / n1d + 1.0 / n2d)) > 0
                THEN (r1 - r2)
                     / sqrt(phat * (1.0 - phat) * (1.0 / n1d + 1.0 / n2d))
                ELSE 0.0 END AS z
    FROM zt
),
px AS (
    SELECT event_type, abs(z) / 1.4142135623730951 AS x FROM zs
),
pt AS (
    SELECT event_type, x, 1.0 / (1.0 + 0.3275911 * x) AS t FROM px
),
pv AS (
    SELECT event_type, {_p2_sql("x", "t")} AS p_raw FROM pt
),
m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM pv),
ranked AS (
    SELECT event_type, p_raw,
           row_number() OVER (ORDER BY p_raw, event_type) AS rank
    FROM pv
),
adj AS (
    SELECT event_type, rank, p_raw,
           LEAST(1.0, MIN(p_raw * m / CAST(rank AS DOUBLE)) OVER (
               ORDER BY rank ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
           )) AS p_adj
    FROM ranked, m
)
SELECT event_type,
       CAST(rank AS INTEGER) AS rank,
       ROUND(p_raw, 6) AS p_value,
       ROUND(p_adj, 6) AS p_adj,
       CAST(CASE WHEN p_adj <= 0.05 THEN 1 ELSE 0 END AS INTEGER) AS reject
FROM adj
"""

# Deterministic permutation test (lock-step with
# abtest.permutation_test: pseudo-permutation k reassigns by
# hash(salt‖unit‖'#'‖k) parity; exact integer sums per (k, arm);
# each Δ_k is one fixed-shape double so |Δ_k| ≥ |Δ_obs| agrees
# bit-for-bit; add-one p-value)
_PERMUTATION_SQL = f"""
WITH {_CONV_CTE},
units AS (
    SELECT conv_id AS u, CAST(SUM(length(text)) AS BIGINT) AS y
    FROM conversations WHERE conv_id IS NOT NULL AND text IS NOT NULL
    GROUP BY conv_id
),
obs0 AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_units,
           CAST(SUM(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT) AS s1,
           CAST(SUM(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT) AS s0,
           CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0
    FROM (SELECT y, ({_H48.format(x="concat('permobs', u)")}) % 2 AS arm FROM units)
),
obs AS (
    SELECT n_units,
           CASE WHEN n1 > 0 AND n0 > 0
                THEN CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                     - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                ELSE 0.0 END AS obs_diff
    FROM obs0
),
parm AS (
    SELECT r.k, units.y,
           ({_H48.format(x="concat('perm', u, '#', CAST(r.k AS VARCHAR))")}) % 2 AS arm
    FROM units CROSS JOIN range(0, 200) r(k)
),
dk0 AS (
    SELECT k,
           CAST(SUM(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT) AS s1,
           CAST(SUM(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT) AS s0,
           CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0
    FROM parm GROUP BY k
),
dk AS (
    SELECT k,
           CASE WHEN n1 > 0 AND n0 > 0
                THEN CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                     - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                ELSE 0.0 END AS d_k
    FROM dk0
)
SELECT obs.n_units,
       CAST(200 AS INTEGER) AS n_perms,
       ROUND(obs.obs_diff, 6) AS obs_diff,
       CAST(SUM(CASE WHEN abs(d_k) >= abs(obs.obs_diff) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_ge,
       ROUND((1.0 + CAST(SUM(CASE WHEN abs(d_k) >= abs(obs.obs_diff)
                                  THEN 1 ELSE 0 END) AS DOUBLE)) / 201.0, 6)
           AS p_value
FROM dk, obs GROUP BY obs.n_units, obs.obs_diff
"""

# Always-valid mSPRT (lock-step with abtest.msprt_always_valid:
# per-day exact integer arm sums → ONE double gap expression; running
# sum/max over the day-ordered frame of the bounded daily table;
# log-space Λ so large S_n never overflows; σ²=τ²=25 shared parsed
# constants)
_MSPRT_SQL = f"""
WITH {_CONV_CTE},
turns AS (
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
           length(text) AS yl,
           ({_H48.format(x="concat('msprt', conv_id)")}) % 2 AS arm
    FROM conversations WHERE text IS NOT NULL
),
daily AS (
    SELECT d,
           CAST(SUM(CASE WHEN arm = 1 THEN yl ELSE 0 END) AS BIGINT) AS s1,
           CAST(SUM(CASE WHEN arm = 0 THEN yl ELSE 0 END) AS BIGINT) AS s0,
           CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0
    FROM turns GROUP BY d
),
dx AS (
    SELECT d,
           CASE WHEN n1 > 0 AND n0 > 0
                THEN CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                     - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                ELSE 0.0 END AS x
    FROM daily
),
stepped AS (
    SELECT d, x,
           CAST(COUNT(*) OVER w AS BIGINT) AS n,
           CAST(COUNT(*) OVER w AS DOUBLE) AS nd,
           SUM(x) OVER w AS s_n
    FROM dx
    WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
lam AS (
    SELECT d, x, n, s_n,
           0.5 * ln(25.0 / (25.0 + nd * 25.0))
             + 25.0 * s_n * s_n / (2.0 * 25.0 * (25.0 + nd * 25.0)) AS log_lambda
    FROM stepped
)
SELECT d,
       ROUND(x, 6) AS x,
       n,
       ROUND(s_n, 6) AS s_n,
       ROUND(log_lambda, 6) AS log_lambda,
       ROUND(LEAST(1.0, exp(-MAX(log_lambda) OVER (
           ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ))), 6) AS p_always_valid
FROM lam
"""


# Theil-Sen robust daily trend (lock-step with windows.theil_sen_daily
# exact path: integer day-number/count deltas → ONE double division per
# pair; quantile_cont ↔ Spark percentile over the calendar-bounded
# pair table; intercept = median residual vs the fitted slope)
_THEIL_SEN_SQL = f"""
WITH {_CONV_CTE},
daily AS (
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
           CAST(COUNT(*) AS BIGINT) AS x
    FROM conversations GROUP BY 1
),
days AS (
    SELECT CAST(floor(epoch_us(d) / {86400 * 1_000_000}) AS BIGINT) AS dn, x
    FROM daily
),
pairs AS (
    SELECT CAST(a.x - b.x AS DOUBLE) / CAST(a.dn - b.dn AS DOUBLE) AS slope
    FROM days a JOIN days b ON b.dn < a.dn
),
sl AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           quantile_cont(slope, 0.5) AS m_slope
    FROM pairs
),
resid AS (
    SELECT n_pairs, m_slope,
           CAST(x AS DOUBLE) - m_slope * CAST(dn AS DOUBLE) AS r
    FROM days, sl
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       n_pairs,
       ROUND(m_slope, 6) AS slope_per_day,
       ROUND(quantile_cont(r, 0.5), 6) AS intercept
FROM resid GROUP BY n_pairs, m_slope
"""

# PACF via Durbin-Levinson (lock-step with windows.pacf_daily: the
# recursion is UNROLLED over the 6dp-ROUNDED lag-1..4 ACF profile —
# identical rounded inputs into the identical expression DAG, so no
# float-iteration divergence exists; NULL propagates past degenerate
# 1-phi² denominators on both engines)
_PACF_SQL = f"""
WITH {_CONV_CTE},
daily AS (
    SELECT date_trunc('day', ts) AS d, COUNT(*) * 1.0 AS x
    FROM conversations GROUP BY 1
),
mu AS (SELECT AVG(x) AS m FROM daily),
dev AS (
    SELECT d, x - m AS dv, row_number() OVER (ORDER BY d) AS rn
    FROM daily CROSS JOIN mu
),
den AS (SELECT SUM(dv * dv) AS dn FROM dev),
ks AS (SELECT unnest(generate_series(1, 4)) AS lag),
acfpairs AS (
    SELECT CAST(k.lag AS INTEGER) AS lag, a.dv * b.dv AS prod
    FROM dev a JOIN ks k ON TRUE JOIN dev b ON a.rn = b.rn + k.lag
),
acf AS (
    SELECT lag,
           ROUND(CASE WHEN dn > 1e-12 THEN SUM(prod) / dn END, 6) AS acf
    FROM acfpairs CROSS JOIN den GROUP BY lag, dn
),
prof AS (
    SELECT MAX(CASE WHEN lag = 1 THEN acf END) AS r1,
           MAX(CASE WHEN lag = 2 THEN acf END) AS r2,
           MAX(CASE WHEN lag = 3 THEN acf END) AS r3,
           MAX(CASE WHEN lag = 4 THEN acf END) AS r4
    FROM acf
),
s1 AS (
    SELECT r1, r2, r3, r4, r1 AS p11, 1.0 - r1 * r1 AS d1 FROM prof
),
s2a AS (
    SELECT *, CASE WHEN abs(d1) > 1e-9 THEN (r2 - p11 * r1) / d1 END AS p22
    FROM s1
),
s2 AS (
    SELECT *, p11 - p22 * p11 AS p21, d1 * (1.0 - p22 * p22) AS d2 FROM s2a
),
s3a AS (
    SELECT *, CASE WHEN abs(d2) > 1e-9
                   THEN (r3 - (p21 * r2 + p22 * r1)) / d2 END AS p33
    FROM s2
),
s3 AS (
    SELECT *, p21 - p33 * p22 AS p31, p22 - p33 * p21 AS p32,
           d2 * (1.0 - p33 * p33) AS d3
    FROM s3a
),
s4 AS (
    SELECT *, CASE WHEN abs(d3) > 1e-9
                   THEN (r4 - (p31 * r3 + p32 * r2 + p33 * r1)) / d3 END AS p44
    FROM s3
)
SELECT CAST(1 AS INTEGER) AS lag, r1 AS acf, ROUND(p11, 6) AS pacf FROM s4
UNION ALL
SELECT CAST(2 AS INTEGER), r2, ROUND(p22, 6) FROM s4
UNION ALL
SELECT CAST(3 AS INTEGER), r3, ROUND(p33, 6) FROM s4
UNION ALL
SELECT CAST(4 AS INTEGER), r4, ROUND(p44, 6) FROM s4
"""

# Tool retry chains (lock-step with lags.tool_retry_chains: lag over
# tool turns only, run-id cumsum on the same per-conv ordering, exact
# integer counters; NULL-lag first calls start chains on both engines)
_TOOL_RETRY_SQL = f"""
WITH {_CONV_CTE},
calls AS (
    SELECT conv_id, ts, turn_idx, tool FROM conversations WHERE tool IS NOT NULL
),
starts AS (
    SELECT conv_id, ts, turn_idx, tool,
           CASE WHEN lag(tool) OVER w = tool THEN 0 ELSE 1 END AS chain_start
    FROM calls
    WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx)
),
runs AS (
    SELECT conv_id, tool,
           SUM(chain_start) OVER (
               PARTITION BY conv_id ORDER BY ts, turn_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS run_id
    FROM starts
),
run_lens AS (
    SELECT conv_id, run_id, tool, CAST(COUNT(*) AS BIGINT) AS run_len
    FROM runs GROUP BY 1, 2, 3
),
per_tool AS (
    SELECT tool,
           CAST(COUNT(*) AS BIGINT) AS n_chains,
           CAST(MAX(run_len) AS BIGINT) AS max_chain_len,
           CAST(SUM(run_len) AS BIGINT) AS n_calls
    FROM run_lens GROUP BY tool
)
SELECT tool, n_calls,
       CAST(n_calls - n_chains AS BIGINT) AS n_retries,
       n_chains, max_chain_len,
       ROUND(CAST(n_calls - n_chains AS DOUBLE) / CAST(n_calls AS DOUBLE), 6)
           AS retry_rate
FROM per_tool
"""


def _bt_oracle(items: tuple = ("assistant", "system", "tool", "user"),
               n_iter: int = 20) -> str:
    """Bradley-Terry oracle generator — unrolls the SAME fixed-order
    MM iterations as ``preference.bradley_terry`` (win counts exact
    BIGINT, denominator terms added in item-ascending order, mean-1
    normalization each step, CASE-guarded zero denominators), so
    both engines walk a byte-identical float trajectory."""
    t = len(items)
    idx = range(t)
    w_cols = ",\n           ".join(
        f"CAST(SUM(CASE WHEN winner = '{items[i]}' AND loser = '{items[j]}'"
        f" THEN 1 ELSE 0 END) AS BIGINT) AS w_{i}_{j}"
        for i in idx for j in idx if i != j
    )
    win_cols = ",\n           ".join(
        f"CAST({' + '.join(f'w_{i}_{j}' for j in idx if j != i)} AS BIGINT)"
        f" AS win_{i}"
        for i in idx
    )
    n_cols = ",\n           ".join(
        f"CAST(w_{i}_{j} + w_{j}_{i} AS BIGINT) AS n_{i}_{j}"
        for i in idx for j in idx if i < j
    )
    base_cols = ", ".join(
        [f"win_{i}" for i in idx]
        + [f"n_{i}_{j}" for i in idx for j in idx if i < j]
    )
    it_ctes = []
    prev = "it0"
    for s in range(1, n_iter + 1):
        q_exprs = []
        for i in idx:
            terms = []
            for j in idx:
                if j == i:
                    continue
                a, b = min(i, j), max(i, j)
                terms.append(f"CAST(n_{a}_{b} AS DOUBLE) / (p_{i} + p_{j})")
            den = " + ".join(terms)
            q_exprs.append(
                f"CASE WHEN {den} > 1e-12"
                f" THEN CAST(win_{i} AS DOUBLE) / ({den})"
                f" ELSE p_{i} END AS q_{i}"
            )
        norm = f"(({' + '.join(f'q_{i}' for i in idx)}) / {float(t)})"
        p_exprs = ", ".join(f"q_{i} / {norm} AS p_{i}" for i in idx)
        it_ctes.append(
            f"it{s}q AS (SELECT {base_cols}, "
            + ", ".join(q_exprs)
            + f" FROM {prev}),\n"
            f"it{s} AS (SELECT {base_cols}, {p_exprs} FROM it{s}q)"
        )
        prev = f"it{s}"
    match_sel = []
    for i in idx:
        msum = " + ".join(
            f"n_{min(i, j)}_{max(i, j)}" for j in idx if j != i
        )
        match_sel.append(
            f"SELECT '{items[i]}' AS item, win_{i} AS wins,"
            f" CAST({msum} AS BIGINT) AS matches, p_{i} AS score FROM {prev}"
        )
    return f"""
WITH {_CONV_CTE},
stepped AS (
    SELECT role, length(text) AS len,
           lag(role) OVER w AS prev_role,
           lag(length(text)) OVER w AS prev_len
    FROM conversations WHERE text IS NOT NULL
    WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx)
),
prs AS (
    SELECT CASE WHEN len > prev_len THEN role
                WHEN prev_len > len THEN prev_role
                ELSE LEAST(role, prev_role) END AS winner,
           CASE WHEN len > prev_len THEN prev_role
                WHEN prev_len > len THEN role
                ELSE GREATEST(role, prev_role) END AS loser
    FROM stepped
    WHERE prev_role IS NOT NULL AND prev_role <> role
),
prof AS (
    SELECT {w_cols}
    FROM prs
    WHERE winner IN ({", ".join(f"'{x}'" for x in items)})
      AND loser IN ({", ".join(f"'{x}'" for x in items)})
),
tot AS (
    SELECT {win_cols},
           {n_cols}
    FROM prof
),
it0 AS (SELECT {base_cols}, {", ".join(f"1.0 AS p_{i}" for i in idx)} FROM tot),
{",".join(it_ctes)},
longf AS (
    {" UNION ALL ".join(match_sel)}
)
SELECT item, wins, matches,
       ROUND(score, 6) AS bt_score,
       CAST(row_number() OVER (ORDER BY score DESC, item) AS INTEGER) AS rank
FROM longf
"""


# Group fairness (lock-step with fairness.group_fairness: exact
# integer confusion counts per lang + pooled one-row totals; every
# rate/gap is a single double expression; degenerate cohorts emit 0.0)
_FAIRNESS_SQL = """
WITH tagged AS (
    SELECT lang AS grp,
           CASE WHEN (CASE WHEN trim(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) = ''
                      THEN 0
                      ELSE len(string_split(trim(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' '))
                      END) >= 55
                THEN 1 ELSE 0 END AS y,
           CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS yhat
    FROM documents
    WHERE lang IS NOT NULL AND text IS NOT NULL AND n_chars IS NOT NULL
),
per AS (
    SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN y = 1 AND yhat = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(SUM(CASE WHEN y = 0 AND yhat = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(SUM(CASE WHEN y = 1 AND yhat = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           CAST(SUM(CASE WHEN y = 0 AND yhat = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
    FROM tagged GROUP BY grp
),
tot AS (
    SELECT CAST(SUM(n) AS BIGINT) AS _n, CAST(SUM(tp) AS BIGINT) AS _tp,
           CAST(SUM(fp) AS BIGINT) AS _fp, CAST(SUM(fn) AS BIGINT) AS _fn,
           CAST(SUM(tn) AS BIGINT) AS _tn
    FROM per
),
rates AS (
    SELECT grp AS "group", n, tp, fp, fn, tn,
           CASE WHEN n > 0 THEN CAST(tp + fp AS DOUBLE) / CAST(n AS DOUBLE)
                ELSE 0.0 END AS pos_rate,
           CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)
                ELSE 0.0 END AS tpr,
           CASE WHEN fp + tn > 0 THEN CAST(fp AS DOUBLE) / CAST(fp + tn AS DOUBLE)
                ELSE 0.0 END AS fpr,
           CASE WHEN _n > 0 THEN CAST(_tp + _fp AS DOUBLE) / CAST(_n AS DOUBLE)
                ELSE 0.0 END AS o_pos,
           CASE WHEN _tp + _fn > 0
                THEN CAST(_tp AS DOUBLE) / CAST(_tp + _fn AS DOUBLE)
                ELSE 0.0 END AS o_tpr,
           CASE WHEN _fp + _tn > 0
                THEN CAST(_fp AS DOUBLE) / CAST(_fp + _tn AS DOUBLE)
                ELSE 0.0 END AS o_fpr
    FROM per, tot
)
SELECT "group", n, tp, fp, fn, tn,
       ROUND(pos_rate, 6) AS pos_rate,
       ROUND(tpr, 6) AS tpr,
       ROUND(fpr, 6) AS fpr,
       ROUND(pos_rate - o_pos, 6) AS dp_gap,
       ROUND(tpr - o_tpr, 6) AS tpr_gap,
       ROUND(fpr - o_fpr, 6) AS fpr_gap
FROM rates
"""

# Schema drift (lock-step with profile.schema_drift_report: stacked
# long format, Expand-free two-phase exact NDV, counts pivoted per
# column; string casts differ in format across engines but are
# injective, so cardinalities agree)
_SCHEMA_DRIFT_SQL = """
WITH ev AS (
    SELECT *, epoch_us(CAST(ts AS TIMESTAMP)) AS us
    FROM events WHERE ts IS NOT NULL
),
b AS (SELECT CAST(MIN(us) AS BIGINT) AS mn, CAST(MAX(us) AS BIGINT) AS mx FROM ev),
longf AS (
    SELECT CASE WHEN us <= CAST(floor((mn + mx) / 2) AS BIGINT)
                THEN 1 ELSE 0 END AS early,
           'event_type' AS col_name, CAST(event_type AS VARCHAR) AS v
    FROM ev, b
    UNION ALL
    SELECT CASE WHEN us <= CAST(floor((mn + mx) / 2) AS BIGINT)
                THEN 1 ELSE 0 END,
           'value', CAST(value AS VARCHAR) FROM ev, b
    UNION ALL
    SELECT CASE WHEN us <= CAST(floor((mn + mx) / 2) AS BIGINT)
                THEN 1 ELSE 0 END,
           'props', CAST(props AS VARCHAR) FROM ev, b
    UNION ALL
    SELECT CASE WHEN us <= CAST(floor((mn + mx) / 2) AS BIGINT)
                THEN 1 ELSE 0 END,
           'user_id', CAST(user_id AS VARCHAR) FROM ev, b
),
stats AS (
    SELECT col_name, early, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null
    FROM longf GROUP BY 1, 2
),
ndv AS (
    SELECT col_name, early, CAST(COUNT(*) AS BIGINT) AS ndv
    FROM (SELECT DISTINCT col_name, early, v FROM longf WHERE v IS NOT NULL)
    GROUP BY 1, 2
),
j AS (
    SELECT s.col_name, s.early, s.n, s.n_null,
           CAST(COALESCE(d.ndv, 0) AS BIGINT) AS ndv
    FROM stats s LEFT JOIN ndv d
      ON s.col_name = d.col_name AND s.early = d.early
),
piv AS (
    SELECT col_name,
           CAST(COALESCE(MAX(CASE WHEN early = 1 THEN n END), 0) AS BIGINT) AS n_early,
           CAST(COALESCE(MAX(CASE WHEN early = 0 THEN n END), 0) AS BIGINT) AS n_late,
           CAST(COALESCE(MAX(CASE WHEN early = 1 THEN n_null END), 0) AS BIGINT) AS null_early,
           CAST(COALESCE(MAX(CASE WHEN early = 0 THEN n_null END), 0) AS BIGINT) AS null_late,
           CAST(COALESCE(MAX(CASE WHEN early = 1 THEN ndv END), 0) AS BIGINT) AS ndv_early,
           CAST(COALESCE(MAX(CASE WHEN early = 0 THEN ndv END), 0) AS BIGINT) AS ndv_late
    FROM j GROUP BY col_name
)
SELECT col_name AS "column", n_early, n_late,
       ROUND(CASE WHEN n_early > 0
                  THEN CAST(null_early AS DOUBLE) / CAST(n_early AS DOUBLE)
                  ELSE 0.0 END, 6) AS null_rate_early,
       ROUND(CASE WHEN n_late > 0
                  THEN CAST(null_late AS DOUBLE) / CAST(n_late AS DOUBLE)
                  ELSE 0.0 END, 6) AS null_rate_late,
       ROUND(CASE WHEN n_early > 0
                  THEN CAST(null_early AS DOUBLE) / CAST(n_early AS DOUBLE)
                  ELSE 0.0 END
             - CASE WHEN n_late > 0
                    THEN CAST(null_late AS DOUBLE) / CAST(n_late AS DOUBLE)
                    ELSE 0.0 END, 6) AS null_rate_delta,
       ndv_early, ndv_late
FROM piv
"""


# Periodogram (lock-step with windows.periodogram_daily: exact
# integer day offsets → identical cos/sin arguments; float term sums
# over the day-ordered full-frame window of the bounded daily table —
# the EWMA accumulation device; rank on the shared unrounded power)
_PERIODOGRAM_SQL = f"""
WITH {_CONV_CTE},
daily AS (
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
           CAST(COUNT(*) AS BIGINT) AS x
    FROM conversations GROUP BY 1
),
days AS (
    SELECT CAST(floor(epoch_us(d) / {86400 * 1_000_000}) AS BIGINT) AS dn, x
    FROM daily
),
stats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(x) AS BIGINT) AS sx,
           CAST(MIN(dn) AS BIGINT) AS dn0
    FROM days
),
base AS (
    SELECT dn, n_days,
           CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE) AS dev,
           CAST(dn - dn0 AS BIGINT) AS t
    FROM days, stats
),
terms AS (
    SELECT dn, n_days, p.period,
           dev * cos(6.283185307179586
                     * (CAST(t AS DOUBLE) / CAST(p.period AS DOUBLE))) AS ct,
           dev * sin(6.283185307179586
                     * (CAST(t AS DOUBLE) / CAST(p.period AS DOUBLE))) AS st,
           dev * dev AS d2
    FROM base CROSS JOIN (SELECT unnest([2, 3, 4, 5, 6, 7, 10, 14]) AS period) p
),
summed0 AS (
    SELECT period, n_days,
           SUM(ct) OVER w AS c, SUM(st) OVER w AS s, SUM(d2) OVER w AS ss
    FROM terms
    WINDOW w AS (PARTITION BY period ORDER BY dn
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
),
summed AS (
    SELECT period, MAX(n_days) AS n_days, MAX(c) AS c, MAX(s) AS s,
           MAX(ss) AS ss
    FROM summed0 GROUP BY period
),
calc AS (
    SELECT period,
           (c * c + s * s) / CAST(n_days AS DOUBLE) AS pw,
           CASE WHEN ss > 0 THEN (c * c + s * s) / ss ELSE 0.0 END AS pn
    FROM summed
)
SELECT CAST(period AS INTEGER) AS period,
       ROUND(pw, 6) AS power,
       ROUND(pn, 6) AS power_norm,
       CAST(row_number() OVER (ORDER BY pw DESC, period) AS INTEGER) AS rank
FROM calc
"""

# Curriculum order (lock-step with sampling.curriculum_order exact
# path: quantile_cont quartile edges ↔ Spark percentile, stage =
# 1 + Σ(score > e_k), windowless sort key stage·2^48 + hash48)
_CURRICULUM_SQL = f"""
WITH edges AS (
    SELECT quantile_cont(CAST(n_chars AS DOUBLE), 0.25) AS e1,
           quantile_cont(CAST(n_chars AS DOUBLE), 0.5) AS e2,
           quantile_cont(CAST(n_chars AS DOUBLE), 0.75) AS e3
    FROM documents
),
staged AS (
    SELECT doc_id, CAST(n_chars AS BIGINT) AS score,
           1 + (CASE WHEN CAST(n_chars AS DOUBLE) > e1 THEN 1 ELSE 0 END)
             + (CASE WHEN CAST(n_chars AS DOUBLE) > e2 THEN 1 ELSE 0 END)
             + (CASE WHEN CAST(n_chars AS DOUBLE) > e3 THEN 1 ELSE 0 END)
               AS stage,
           {_H48.format(x="concat('cur', CAST(doc_id AS VARCHAR))")} AS h
    FROM documents, edges
)
SELECT doc_id, score, CAST(stage AS INTEGER) AS stage,
       CAST(CAST(stage AS BIGINT) * 281474976710656 + h AS BIGINT) AS sort_key
FROM staged
"""


# LSH banding recall/precision vs the exact Jaccard ground truth
# (lock-step with dedup.lsh_recall_eval: wraps the two existing pair
# oracles — identical shingle order, threshold, hot-shingle cap —
# full-outer join + one exact count row)
_LSH_RECALL_SQL = f"""
WITH e AS (SELECT doc_a, doc_b FROM ({_DEDUP_NGRAM_JACCARD_SQL})),
c AS (SELECT doc_a, doc_b FROM ({_MINHASH_LSH_SQL})),
j AS (
    SELECT CASE WHEN e.doc_a IS NOT NULL THEN 1 ELSE 0 END AS in_e,
           CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END AS in_c
    FROM e FULL OUTER JOIN c
      ON e.doc_a = c.doc_a AND e.doc_b = c.doc_b
)
SELECT CAST(SUM(in_e) AS BIGINT) AS n_true,
       CAST(SUM(in_c) AS BIGINT) AS n_candidates,
       CAST(SUM(in_e * in_c) AS BIGINT) AS n_common,
       ROUND(CASE WHEN SUM(in_e) > 0
                  THEN CAST(SUM(in_e * in_c) AS DOUBLE)
                       / CAST(SUM(in_e) AS DOUBLE)
                  ELSE 0.0 END, 6) AS recall,
       ROUND(CASE WHEN SUM(in_c) > 0
                  THEN CAST(SUM(in_e * in_c) AS DOUBLE)
                       / CAST(SUM(in_c) AS DOUBLE)
                  ELSE 0.0 END, 6) AS precision
FROM j
"""


# Kneser-Ney bigram LM (lock-step with
# textstats.kneser_ney_logprob_score: exact integer count/type tables,
# d=0.75 is exact in binary, ONE fixed-shape double per bigram type;
# ppl exponentiates the 6dp-ROUNDED per-doc average on both engines)
_KN_BIGRAM_SQL = f"""
WITH tok AS (
    SELECT doc_id, {_TOKS} AS ws FROM documents
),
bg AS (
    SELECT doc_id, unnest(list_transform(range(1, len(ws)),
                                         i -> ws[i] || ' ' || ws[i + 1])) AS bigram
    FROM tok WHERE len(ws) >= 2
),
bcnt AS (SELECT bigram, COUNT(*) AS c12 FROM bg GROUP BY bigram),
split AS (
    SELECT bigram, c12,
           string_split(bigram, ' ')[1] AS w1,
           string_split(bigram, ' ')[2] AS w2
    FROM bcnt
),
ctx AS (
    SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
           CAST(COUNT(*) AS BIGINT) AS n1f
    FROM split GROUP BY w1
),
pred AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1b FROM split GROUP BY w2),
types AS (SELECT CAST(COUNT(*) AS BIGINT) AS b FROM bcnt),
probs AS (
    SELECT s.bigram,
           LN(GREATEST(CAST(s.c12 AS DOUBLE) - 0.75, 0.0)
                / CAST(ctx.c1 AS DOUBLE)
              + (0.75 * CAST(ctx.n1f AS DOUBLE) / CAST(ctx.c1 AS DOUBLE))
                * (CAST(pred.n1b AS DOUBLE) / CAST(types.b AS DOUBLE))) AS lp
    FROM split s
    JOIN ctx ON ctx.w1 = s.w1
    JOIN pred ON pred.w2 = s.w2
    CROSS JOIN types
),
per AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(lp), 6) AS avg_kn_logprob
    FROM bg JOIN probs USING (bigram)
    GROUP BY doc_id
)
SELECT doc_id, n_bigrams, avg_kn_logprob,
       ROUND(EXP(-avg_kn_logprob), 6) AS ppl
FROM per
"""

# Watermark depth audit (lock-step with lags.out_of_order_depth:
# integer floor-division range buckets (// ↔ DIV, never float),
# strictly-before prefix max per bucket + carry-in over the bounded
# bucket-maxima table; exact integer depths; quantile_cont ↔ exact
# percentile over late depths)
_WATERMARK_DEPTH_SQL = f"""
WITH e AS (
    SELECT event_id,
           epoch_us(CAST(ts AS TIMESTAMP)) AS us,
           epoch_us(CAST(ts AS TIMESTAMP))
             + (({_H48.format(x="concat('wm', CAST(event_id AS VARCHAR))")})
                % 3600) * 1000000 AS arr
    FROM events WHERE ts IS NOT NULL AND event_id IS NOT NULL
),
b AS (SELECT CAST(MIN(arr) AS BIGINT) AS mn, CAST(MAX(arr) AS BIGINT) AS mx FROM e),
bk AS (
    SELECT arr, us, event_id AS tb,
           CAST(((arr - mn) * 256) // (mx - mn + 1) AS BIGINT) AS bkt
    FROM e, b
),
wb AS (
    SELECT us, bkt,
           COALESCE(CAST(MAX(us) OVER (
               PARTITION BY bkt ORDER BY arr, tb
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS BIGINT), {-(1 << 62)}) AS wbm
    FROM bk
),
pb AS (SELECT bkt, CAST(MAX(us) AS BIGINT) AS bmax FROM bk GROUP BY bkt),
cr AS (
    SELECT bkt,
           COALESCE(CAST(MAX(bmax) OVER (
               ORDER BY bkt ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS BIGINT), {-(1 << 62)}) AS carry_max
    FROM pb
),
d AS (SELECT us, GREATEST(wbm, carry_max) AS prior_max FROM wb JOIN cr USING (bkt)),
l AS (SELECT CASE WHEN prior_max > us THEN prior_max - us END AS late_us FROM d)
SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(late_us) AS BIGINT) AS n_late,
       ROUND(CAST(COUNT(late_us) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
           AS late_rate,
       CAST(COALESCE(MAX(late_us), 0) AS BIGINT) AS max_late_us,
       ROUND(COALESCE(quantile_cont(late_us, 0.5), 0.0) / 1000000.0, 6)
           AS p50_late_s,
       ROUND(COALESCE(quantile_cont(late_us, 0.95), 0.0) / 1000000.0, 6)
           AS p95_late_s,
       ROUND(COALESCE(quantile_cont(late_us, 0.99), 0.0) / 1000000.0, 6)
           AS p99_late_s
FROM l
"""


# Brown double smoothing (lock-step with windows.brown_double_daily:
# the ewma_daily staircase pair-join device applied TWICE — bit-shift
# weights, day-ordered full-frame window sums; the second pass
# consumes the first pass's fixed-shape double levels)
_BROWN_DOUBLE_SQL = f"""
WITH {_CONV_CTE},
daily AS (
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
           CAST(COUNT(*) AS BIGINT) AS n_turns
    FROM conversations GROUP BY 1
),
days AS (
    SELECT d, CAST(floor(epoch_us(d) / {86400 * 1_000_000}) AS BIGINT) AS dn,
           n_turns
    FROM daily
),
p1 AS (
    SELECT a.d, a.dn, a.n_turns, b.dn AS dni,
           CASE WHEN CAST(floor((a.dn - b.dn) / 3) AS INTEGER) <= 62
                THEN 1.0 / CAST(CAST(1 AS BIGINT)
                                << CAST(floor((a.dn - b.dn) / 3) AS INTEGER)
                           AS DOUBLE)
                ELSE 0.0 END AS w,
           CAST(b.n_turns AS DOUBLE) AS xi
    FROM days a JOIN days b ON b.dn <= a.dn
),
s1t AS (
    SELECT d, dn, n_turns, MAX(num) AS num, MAX(den) AS den FROM (
        SELECT d, dn, n_turns,
               SUM(w * xi) OVER (PARTITION BY dn ORDER BY dni
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS num,
               SUM(w) OVER (PARTITION BY dn ORDER BY dni
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS den
        FROM p1
    ) GROUP BY d, dn, n_turns
),
s1 AS (SELECT d, dn, n_turns, num / den AS s1 FROM s1t),
p2 AS (
    SELECT a.d, a.dn, a.n_turns, a.s1, b.dn AS dni,
           CASE WHEN CAST(floor((a.dn - b.dn) / 3) AS INTEGER) <= 62
                THEN 1.0 / CAST(CAST(1 AS BIGINT)
                                << CAST(floor((a.dn - b.dn) / 3) AS INTEGER)
                           AS DOUBLE)
                ELSE 0.0 END AS w,
           b.s1 AS xi
    FROM s1 a JOIN s1 b ON b.dn <= a.dn
),
s2t AS (
    SELECT d, dn, n_turns, s1, MAX(num) AS num, MAX(den) AS den FROM (
        SELECT d, dn, n_turns, s1,
               SUM(w * xi) OVER (PARTITION BY dn ORDER BY dni
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS num,
               SUM(w) OVER (PARTITION BY dn ORDER BY dni
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS den
        FROM p2
    ) GROUP BY d, dn, n_turns, s1
),
s2 AS (SELECT d, dn, n_turns, s1, num / den AS s2 FROM s2t),
fc AS (
    SELECT d, dn, n_turns, s1, s2,
           2.0 * lag(s1) OVER (ORDER BY dn) - lag(s2) OVER (ORDER BY dn) AS f
    FROM s2
)
SELECT d, n_turns,
       ROUND(s1, 6) AS s1,
       ROUND(s2, 6) AS s2,
       ROUND(COALESCE(f, -1.0), 6) AS forecast,
       ROUND(COALESCE(CASE WHEN f IS NOT NULL AND f <> 0
                           THEN (CAST(n_turns AS DOUBLE) - f) / f END, 0.0), 6)
           AS forecast_err
FROM fc
"""

# Raw-SQL surface demo (S3): the engine-side query IS spark.sql text —
# the oracle is the same statement over the conversations CTE
_SQL_WEEKLY_ROLE_MIX = f"""
WITH {_CONV_CTE}
SELECT role,
       CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk,
       CAST(COUNT(*) AS BIGINT) AS n_turns,
       CAST(SUM(length(text)) AS BIGINT) AS text_len_sum
FROM conversations
GROUP BY role, wk
"""


# LSH-DBSCAN (lock-step with components.lsh_dbscan: the
# neardup_embedding pair oracle feeds degrees/cores; recursive-CTE
# transitive closure on the core-core graph; deterministic
# min-component border assignment; noise −1 over the full corpus)
_LSH_DBSCAN_SQL = f"""
WITH RECURSIVE prs AS (SELECT doc_a, doc_b FROM ({_NEARDUP_EMB_SQL})),
sym AS (
    SELECT doc_a AS u, doc_b AS v FROM prs
    UNION ALL
    SELECT doc_b AS u, doc_a AS v FROM prs
),
deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS n_nb FROM sym GROUP BY u),
core AS (SELECT u AS node FROM deg WHERE n_nb >= 2),
core_edges AS (
    SELECT p.doc_a AS u, p.doc_b AS v
    FROM prs p
    JOIN core c1 ON c1.node = p.doc_a
    JOIN core c2 ON c2.node = p.doc_b
),
cedges AS (
    SELECT u, v FROM core_edges UNION SELECT v, u FROM core_edges
),
reach(node, label) AS (
    SELECT u, u FROM (SELECT DISTINCT u FROM cedges) n
    UNION
    SELECT e.v, r.label FROM reach r JOIN cedges e ON e.u = r.node
),
comp AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node),
core_comp AS (
    SELECT c.node, COALESCE(k.component, c.node) AS component
    FROM core c LEFT JOIN comp k ON k.node = c.node
),
border AS (
    SELECT s.u AS node, MIN(cc.component) AS component
    FROM sym s
    JOIN core_comp cc ON cc.node = s.v
    LEFT JOIN core k ON k.node = s.u
    WHERE k.node IS NULL
    GROUP BY s.u
),
lab AS (
    SELECT b.vec_id,
           CAST(COALESCE(cc.component, bd.component, -1) AS BIGINT) AS cluster,
           CAST(CASE WHEN cc.node IS NOT NULL THEN 1 ELSE 0 END AS INTEGER)
               AS is_core,
           CAST(COALESCE(d.n_nb, 0) AS BIGINT) AS n_neighbors
    FROM (SELECT vec_id FROM embeddings) b
    LEFT JOIN core_comp cc ON cc.node = b.vec_id
    LEFT JOIN border bd ON bd.node = b.vec_id
    LEFT JOIN deg d ON d.u = b.vec_id
),
sizes AS (
    SELECT cluster, CAST(COUNT(*) AS BIGINT) AS cluster_size
    FROM lab WHERE cluster <> -1 GROUP BY cluster
)
SELECT l.vec_id, l.cluster, l.is_core, l.n_neighbors,
       CAST(COALESCE(s.cluster_size, 0) AS BIGINT) AS cluster_size
FROM lab l LEFT JOIN sizes s USING (cluster)
"""


# Nelson-Aalen cumulative hazard (lock-step with
# operators/survival.py::nelson_aalen — km's per_t/n_risk core, then
# ordered running sums of d/n and d/n², FH survival = exp(-H))
_NELSON_AALEN_SQL = f"""
WITH {_SURVIVAL_CORE},
per_t AS (
    SELECT duration_days AS t, COUNT(*) AS n_leaving, SUM(observed) AS n_event
    FROM labels GROUP BY duration_days
),
curve AS (
    SELECT t, n_event,
           SUM(n_leaving) OVER ()
             - COALESCE(SUM(n_leaving) OVER
                 (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS n_risk
    FROM per_t
),
run AS (
    SELECT t, n_risk, n_event,
           SUM(CAST(n_event AS DOUBLE) / CAST(n_risk AS DOUBLE)) OVER
               (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS h,
           SUM(CAST(n_event AS DOUBLE)
               / (CAST(n_risk AS DOUBLE) * CAST(n_risk AS DOUBLE))) OVER
               (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hv
    FROM curve
)
SELECT CAST(t AS INTEGER) AS t,
       CAST(n_risk AS BIGINT) AS n_risk,
       CAST(n_event AS BIGINT) AS n_event,
       ROUND(h, 6) AS cum_hazard,
       ROUND(hv, 6) AS hazard_var,
       ROUND(EXP(-h), 6) AS fh_survival
FROM run
"""

# Sharp RDD at turn_idx=30, bandwidth 20 (lock-step with
# operators/abtest.py::regression_discontinuity: per-side OLS
# sufficient statistics in ONE conditional agg — x, y, and their
# products are integer-valued so the double sums are exact and
# order-free — then identical closed-form intercept/slope algebra)
_RDD_TURNS_SQL = f"""
WITH {_CONV_CTE},
pts AS (
    SELECT CAST(turn_idx AS DOUBLE) - 30.0 AS x,
           CAST(length(text) AS DOUBLE) AS y,
           turn_idx >= 30 AS r
    FROM conversations
    WHERE ABS(CAST(turn_idx AS DOUBLE) - 30.0) <= 20.0
),
s AS (
    SELECT
        CAST(SUM(CASE WHEN r THEN 1 ELSE 0 END) AS BIGINT) AS n_r,
        SUM(CASE WHEN r THEN x ELSE 0.0 END) AS sx_r,
        SUM(CASE WHEN r THEN y ELSE 0.0 END) AS sy_r,
        SUM(CASE WHEN r THEN x * y ELSE 0.0 END) AS sxy_r,
        SUM(CASE WHEN r THEN x * x ELSE 0.0 END) AS sxx_r,
        CAST(SUM(CASE WHEN NOT r THEN 1 ELSE 0 END) AS BIGINT) AS n_l,
        SUM(CASE WHEN NOT r THEN x ELSE 0.0 END) AS sx_l,
        SUM(CASE WHEN NOT r THEN y ELSE 0.0 END) AS sy_l,
        SUM(CASE WHEN NOT r THEN x * y ELSE 0.0 END) AS sxy_l,
        SUM(CASE WHEN NOT r THEN x * x ELSE 0.0 END) AS sxx_l
    FROM pts
),
fit AS (
    SELECT n_l, n_r,
        CASE WHEN CAST(n_l AS DOUBLE) * sxx_l - sx_l * sx_l <> 0
             THEN (CAST(n_l AS DOUBLE) * sxy_l - sx_l * sy_l)
                  / (CAST(n_l AS DOUBLE) * sxx_l - sx_l * sx_l)
             ELSE 0.0 END AS b1_l,
        CASE WHEN CAST(n_r AS DOUBLE) * sxx_r - sx_r * sx_r <> 0
             THEN (CAST(n_r AS DOUBLE) * sxy_r - sx_r * sy_r)
                  / (CAST(n_r AS DOUBLE) * sxx_r - sx_r * sx_r)
             ELSE 0.0 END AS b1_r,
        sx_l, sy_l, sx_r, sy_r
    FROM s
),
ab AS (
    SELECT n_l, n_r, b1_l, b1_r,
        CASE WHEN n_l > 0 THEN (sy_l - b1_l * sx_l) / CAST(n_l AS DOUBLE)
             ELSE 0.0 END AS b0_l,
        CASE WHEN n_r > 0 THEN (sy_r - b1_r * sx_r) / CAST(n_r AS DOUBLE)
             ELSE 0.0 END AS b0_r
    FROM fit
)
SELECT n_l, n_r,
       ROUND(b0_l, 6) AS intercept_left,
       ROUND(b1_l, 6) AS slope_left,
       ROUND(b0_r, 6) AS intercept_right,
       ROUND(b1_r, 6) AS slope_right,
       ROUND(b0_r - b0_l, 6) AS rd_effect
FROM ab
"""

# Per-role freshness audit (lock-step with
# operators/profile.py::freshness_audit: day-bucketed single scan,
# global high-water marks, trailing-7-CALENDAR-day recent volume,
# stale = lag > 24h; micros arithmetic exact)
_FRESHNESS_AUDIT_SQL = f"""
WITH {_CONV_CTE},
per_day AS (
    SELECT role, date_trunc('day', ts) AS d,
           CAST(COUNT(*) AS BIGINT) AS n, MAX(epoch_us(ts)) AS mx
    FROM conversations GROUP BY role, date_trunc('day', ts)
),
per AS (
    SELECT role, CAST(SUM(n) AS BIGINT) AS n_rows,
           MAX(mx) AS max_us, MAX(d) AS max_day
    FROM per_day GROUP BY role
),
g AS (
    SELECT role, n_rows, max_us, max_day,
           MAX(max_us) OVER () AS gmax_us,
           MAX(max_day) OVER () AS gmax_day
    FROM per
),
recent AS (
    SELECT pd.role, CAST(SUM(pd.n) AS BIGINT) AS rows_recent
    FROM per_day pd, (SELECT MAX(d) AS gday FROM per_day) gg
    WHERE pd.d >= gg.gday - INTERVAL 6 DAY AND pd.d <= gg.gday
    GROUP BY pd.role
)
SELECT g.role, g.n_rows,
       make_timestamp(g.max_us) AS max_ts,
       ROUND(CAST(g.gmax_us - g.max_us AS DOUBLE) / 3600000000.0, 6) AS lag_hours,
       CAST(COALESCE(r.rows_recent, 0) AS BIGINT) AS rows_recent,
       CAST(CASE WHEN CAST(g.gmax_us - g.max_us AS DOUBLE) / 3600000000.0 > 24.0
                 THEN 1 ELSE 0 END AS INTEGER) AS is_stale
FROM g LEFT JOIN recent r USING (role)
"""

# Compaction plan over (day, role) shards (lock-step with
# operators/layout.py::compaction_plan: bytes-desc/key-asc total
# order, bucket = floor(bytes-before / 1024), per-bucket rollup)
_COMPACTION_PLAN_SQL = f"""
WITH {_CONV_CTE},
shards AS (
    SELECT date_trunc('day', ts) AS day, role,
           CAST(SUM(length(text)) AS BIGINT) AS bytes
    FROM conversations GROUP BY date_trunc('day', ts), role
),
planned AS (
    SELECT day, role, bytes,
        CAST(FLOOR(CAST(COALESCE(SUM(bytes) OVER
            (ORDER BY bytes DESC, day ASC, role ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
            / 1024.0) AS BIGINT) AS bucket
    FROM shards
),
per_bucket AS (
    SELECT bucket, CAST(SUM(bytes) AS BIGINT) AS bucket_bytes,
           CAST(COUNT(*) AS BIGINT) AS bucket_files
    FROM planned GROUP BY bucket
)
SELECT p.day, p.role, p.bytes, p.bucket, b.bucket_bytes, b.bucket_files
FROM planned p JOIN per_bucket b USING (bucket)
"""


def _power_iter_oracle(n_iter: int = 24) -> str:
    """Unrolled fixed-point power iteration (lock-step with
    operators/spectral.py::power_iteration_top_eigen): covariance
    quantized to 1e-6 BIGINT units, vector to 1e-9 units, exact
    integer mat-vec (HUGEINT squared-norm ↔ Spark decimal(38,0)),
    one sqrt + one IEEE division per step — the chained-CTE device
    of _platt_oracle, here to a bit-exact fixed point."""
    ctes = ["""ev AS MATERIALIZED (
    SELECT vec_id, CAST(i AS INTEGER) - 1 AS dim,
           CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) AS v
    FROM (
        SELECT vec_id, embedding, unnest(range(1, len(embedding) + 1)) AS i
        FROM embeddings
    )
),
cov AS MATERIALIZED (
    SELECT a.dim AS i, b.dim AS j,
           CAST(ROUND(ROUND(covar_samp(a.v, b.v), 6) * 1000000.0) AS BIGINT) AS cq
    FROM ev a JOIN ev b ON a.vec_id = b.vec_id
    GROUP BY a.dim, b.dim
),
v0 AS (
    SELECT DISTINCT i AS j,
           CAST(ROUND(1000000000.0
                / SQRT(CAST((SELECT COUNT(DISTINCT dim) FROM ev) AS DOUBLE)))
                AS BIGINT) AS vq
    FROM cov
)"""]
    for t in range(1, n_iter + 1):
        ctes.append(f"""s{t} AS MATERIALIZED (
    SELECT m.i, SUM(m.cq * v.vq) AS s
    FROM cov m JOIN v{t-1} v ON v.j = m.j GROUP BY m.i
),
n{t} AS MATERIALIZED (
    SELECT SQRT(CAST(SUM(CAST(s AS HUGEINT) * s) AS DOUBLE)) AS nrm FROM s{t}
),
v{t} AS MATERIALIZED (
    SELECT i AS j,
           CAST(ROUND(CAST(s AS DOUBLE) / nrm * 1000000000.0) AS BIGINT) AS vq
    FROM s{t}, n{t}
)""")
    last = f"v{n_iter}"
    tail = f"""quad AS (
    SELECT SUM(CAST(vi.vq AS HUGEINT) * m.cq * vj.vq) AS num
    FROM cov m JOIN {last} vj ON vj.j = m.j JOIN {last} vi ON vi.j = m.i
),
den AS (SELECT SUM(CAST(vq AS HUGEINT) * vq) AS den FROM {last}),
lam AS (
    SELECT CAST(num AS DOUBLE) / CAST(den AS DOUBLE) / 1000000.0 AS eigenvalue
    FROM quad, den
),
pvt AS (SELECT vq FROM {last} ORDER BY ABS(vq) DESC, j ASC LIMIT 1)
SELECT CAST(v.j AS INTEGER) AS dim,
       ROUND(CAST(CASE WHEN p.vq < 0 THEN -v.vq ELSE v.vq END AS DOUBLE)
             / 1000000000.0, 6) AS loading,
       ROUND(l.eigenvalue, 6) AS eigenvalue
FROM {last} v, pvt p, lam l"""
    return "WITH " + ",\n".join(ctes) + ",\n" + tail


_PCA_POWER_SQL = _power_iter_oracle(24)

# LOF k=5 (lock-step with similarity.lof_scores: full brute-force
# kNN on rounded cosine, kdist/reach/lrd/lof chain, ε-floored lrd)
_LOF_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings),
v AS (SELECT vec_id AS neighbor_id, embedding AS ne FROM embeddings),
scored AS (
    SELECT query_id, neighbor_id, ROUND({_COS}, 6) AS cosine
    FROM q, v WHERE neighbor_id <> query_id
),
knn AS (
    SELECT query_id AS a, neighbor_id AS b,
           ROUND(1.0 - cosine, 6) AS dist,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, neighbor_id ASC) AS rnk
    FROM scored
),
edges AS (SELECT a, b, dist FROM knn WHERE rnk <= 5),
kdist AS (SELECT a AS node, MAX(dist) AS kdist FROM edges GROUP BY a),
reach AS (
    SELECT e.a, e.b, GREATEST(e.dist, k.kdist) AS reach
    FROM edges e JOIN kdist k ON k.node = e.b
),
lrd AS (
    -- order-free integer-grid sums (lock-step with the engine's r5
    -- rewrite): reach already sits on the 1e-6 grid, lrd re-quantized
    -- before the neighbor sum so lof is one exact-integer division
    SELECT a,
           CAST(COUNT(*) AS DOUBLE)
           / GREATEST(CAST(SUM(CAST(ROUND(reach * 1000000.0) AS BIGINT)) AS DOUBLE)
                      / 1000000.0, 0.000000001) AS lrd,
           CAST(COUNT(*) AS BIGINT) AS n_k
    FROM reach GROUP BY a
),
lrdq AS (
    SELECT a, lrd, n_k, CAST(ROUND(lrd * 1000000.0) AS BIGINT) AS lrd_q
    FROM lrd
),
agg AS (
    SELECT r.a, CAST(SUM(l2.lrd_q) AS BIGINT) AS slbq
    FROM reach r JOIN lrdq l2 ON l2.a = r.b GROUP BY r.a
)
SELECT g.a AS vec_id, l.n_k, ROUND(l.lrd, 6) AS lrd,
       ROUND(LEAST(CAST(g.slbq AS DOUBLE) / CAST(l.n_k * l.lrd_q AS DOUBLE),
                   1000000.0), 6) AS lof
FROM agg g JOIN lrdq l ON l.a = g.a
"""

# frame-sampling rollup (lock-step with multimodal.frame_sample_plan
# at every_n=30 over the fake-decode n_frames; closed form of the
# exploded sequence 0, 30, 60, …)
_VIDEO_FRAME_SAMPLE_SQL = f"""
WITH b AS (SELECT doc_id, {_byte_int_expr(8)} AS h FROM documents),
f AS (
    SELECT doc_id AS media_id,
           CAST(1 + (h // 1048576) % 300 AS INTEGER) AS n_frames
    FROM b
)
SELECT media_id, n_frames,
       CAST((n_frames - 1) // 30 + 1 AS BIGINT) AS n_sampled,
       CAST(((n_frames - 1) // 30) * 30 AS INTEGER) AS last_frame
FROM f
"""

# Levenshtein near-dup pairs (lock-step with dedup.edit_distance_pairs:
# (len//16, first-token) blocking, a<b, dist ≤ 20; DuckDB computes the
# full distance where Spark's banded threshold DP early-exits — the
# surviving rows and distances are identical)
_EDITDIST_PAIRS_SQL = """
WITH d AS (
    SELECT doc_id, text,
           CAST(length(text) // 16 AS BIGINT) AS lb,
           split_part(text, ' ', 1) AS ft
    FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lb AS len_bucket,
       CAST(levenshtein(a.text, b.text) AS INTEGER) AS edit_dist,
       ROUND(1.0 - CAST(levenshtein(a.text, b.text) AS DOUBLE)
             / GREATEST(length(a.text), length(b.text), 1), 6) AS similarity
FROM d a JOIN d b ON a.lb = b.lb AND a.ft = b.ft AND a.doc_id < b.doc_id
WHERE levenshtein(a.text, b.text) <= 20
"""


# Content-defined chunking (lock-step with chunking.cdc_chunk_docs at
# window=16, base=257, mod=2^31−1, mask=63: DuckDB computes the same
# rolling hash by exploding chars and joining the 16 precomputed
# base^j mod M offsets — Spark does it zero-shuffle in-row; identical
# boundaries, identical md5 chunk addresses)
_CDC_POWS = [pow(257, j, 2_147_483_647) for j in range(16)]
_CDC_CHUNKS_SQL = f"""
WITH chars AS MATERIALIZED (
    SELECT doc_id, CAST(i AS BIGINT) AS i,
           CAST(ascii(substr(text, CAST(i AS INTEGER), 1)) AS BIGINT) AS c
    FROM documents, unnest(range(1, length(text)+1)) AS t(i)
),
offs AS (SELECT unnest(range(0,16)) AS j,
                unnest([{",".join(str(p) for p in _CDC_POWS)}]) AS p),
h AS (
    SELECT ch.doc_id, ch.i AS pos, SUM(c2.c * o.p) % 2147483647 AS h
    FROM chars ch JOIN offs o ON TRUE JOIN chars c2
      ON c2.doc_id = ch.doc_id AND c2.i = ch.i - o.j
    WHERE ch.i >= 16
    GROUP BY ch.doc_id, ch.i
),
bounds AS (
    SELECT doc_id, pos FROM h WHERE h % 64 = 0
    UNION SELECT doc_id, CAST(length(text) AS BIGINT) FROM documents
),
ck AS (
    SELECT doc_id,
           COALESCE(lag(pos) OVER (PARTITION BY doc_id ORDER BY pos), 0) AS s,
           pos AS e
    FROM bounds
),
ct AS (
    SELECT ck.doc_id, e - s AS chunk_len,
           md5(substr(d.text, CAST(s+1 AS INTEGER), CAST(e-s AS INTEGER))) AS chunk_md5
    FROM ck JOIN documents d ON d.doc_id = ck.doc_id WHERE e > s
),
freq AS (SELECT chunk_md5, COUNT(*) AS f FROM ct GROUP BY chunk_md5)
SELECT ct.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN f >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_chunks,
       CAST(SUM(chunk_len) AS BIGINT) AS chunk_bytes,
       CAST(SUM(CASE WHEN f >= 2 THEN chunk_len ELSE 0 END) AS BIGINT) AS shared_bytes,
       ROUND(CAST(SUM(CASE WHEN f >= 2 THEN chunk_len ELSE 0 END) AS DOUBLE)
             / CAST(SUM(chunk_len) AS DOUBLE), 6) AS dup_byte_ratio
FROM ct JOIN freq USING (chunk_md5)
GROUP BY ct.doc_id
"""

# Pareto frontier (lock-step with skyline.pareto_frontier_2d over
# (distinct-word-ratio quality, text length), both maximized; the
# oracle uses the direct window formulation — per-quality maxima,
# strict prefix max over greater quality)
_PARETO_DOCS_SQL = """
WITH d AS (
    SELECT doc_id,
           ROUND(CAST(length(list_distinct(string_split(text,' '))) AS DOUBLE)
                 / GREATEST(length(string_split(text,' ')), 1), 6) AS quality,
           CAST(length(text) AS BIGINT) AS text_len
    FROM documents
),
per_q AS (SELECT quality, MAX(text_len) AS maxlen FROM d GROUP BY quality),
sky AS (
    SELECT quality, maxlen,
           MAX(maxlen) OVER (ORDER BY quality DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
    FROM per_q
)
SELECT d.doc_id, d.quality, d.text_len
FROM d JOIN sky USING (quality)
WHERE d.text_len = sky.maxlen AND (sky.pm IS NULL OR sky.maxlen > sky.pm)
"""


def _huber_oracle(n_iter: int = 15, k_mult: float = 1.345) -> str:
    """Unrolled IRLS (lock-step with robust.huber_location): exact
    integer histogram, median/MAD via DuckDB median() (the same
    interpolated-percentile convention), k and mu quantized to 1e-9
    between steps, fixed iteration count."""
    ctes = ["""hist AS MATERIALIZED (
    -- text IS NOT NULL: the engine histograms non-NULL values only;
    -- without the filter the NULL group inflates SUM(c) (n, mean
    -- denominator) while SUM(v*c) silently skips it — inconsistent
    -- with median()'s NULL handling too (r5 fuzz-net catch)
    SELECT CAST(length(text) AS BIGINT) AS v, CAST(COUNT(*) AS BIGINT) AS c
    FROM documents WHERE text IS NOT NULL GROUP BY 1
),
med AS (SELECT median(CAST(length(text) AS BIGINT)) AS med FROM documents),
madt AS (
    SELECT median(ABS(CAST(length(text) AS BIGINT) - med)) AS mad
    FROM documents, med
),
m0 AS (
    SELECT CAST(ROUND(med * 1000000000.0) AS BIGINT) AS muq,
           CAST(ROUND(mad * {k} * 1000000000.0) AS BIGINT) AS kq
    FROM med, madt
)""".format(k=repr(float(k_mult)))]
    for t in range(1, n_iter + 1):
        ctes.append(f"""m{t} AS MATERIALIZED (
    SELECT CAST(ROUND(SUM(w * v * c) / SUM(w * c) * 1000000000.0) AS BIGINT) AS muq,
           MIN(kq) AS kq
    FROM (
        SELECT h.v, h.c, m.kq,
               CASE WHEN ABS(CAST(h.v AS DOUBLE) - CAST(m.muq AS DOUBLE)/1000000000.0)
                         <= CAST(m.kq AS DOUBLE)/1000000000.0
                    THEN 1.0
                    ELSE (CAST(m.kq AS DOUBLE)/1000000000.0)
                         / ABS(CAST(h.v AS DOUBLE) - CAST(m.muq AS DOUBLE)/1000000000.0)
               END AS w
        FROM hist h, m{t-1} m
    )
)""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
stats AS (
    SELECT CAST(SUM(c) AS BIGINT) AS n,
           ROUND(CAST(SUM(v * c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6) AS mean
    FROM hist
)
SELECT s.n, s.mean,
       ROUND(med.med, 6) AS median,
       ROUND(madt.mad, 6) AS mad,
       ROUND(CAST(m.kq AS DOUBLE) / 1000000000.0, 6) AS k,
       ROUND(CAST(m.muq AS DOUBLE) / 1000000000.0, 6) AS huber_mu,
       CAST({n_iter} AS INTEGER) AS n_iter
FROM stats s, med, madt, m{n_iter} m
"""
    )


_HUBER_SQL = _huber_oracle(15)


def _hits_oracle(n_iter: int = 12) -> str:
    """Unrolled HITS fixed point (lock-step with
    spectral.hits_scores over the supplier→part lineitem-count
    graph): exact HUGEINT half-step mat-vecs, L2 norm + 1e-9
    re-quantization per half-step — the _power_iter_oracle device on
    the bipartite graph."""
    ctes = ["""edges AS MATERIALIZED (
    SELECT l_suppkey AS src, l_partkey AS dst, CAST(COUNT(*) AS BIGINT) AS w
    FROM lineitem GROUP BY 1, 2
),
a0 AS (
    SELECT DISTINCT dst,
           CAST(ROUND(1000000000.0 / SQRT(CAST(
               (SELECT COUNT(DISTINCT dst) FROM edges) AS DOUBLE))) AS BIGINT) AS aq
    FROM edges
)"""]
    for t in range(1, n_iter + 1):
        ctes.append(f"""hs{t} AS MATERIALIZED (
    SELECT e.src, SUM(CAST(e.w AS HUGEINT) * a.aq) AS s
    FROM edges e JOIN a{t-1} a USING (dst) GROUP BY e.src
),
hn{t} AS (SELECT SQRT(CAST(SUM(s * s) AS DOUBLE)) AS nrm FROM hs{t}),
h{t} AS MATERIALIZED (
    SELECT src,
           CAST(ROUND(CAST(s AS DOUBLE) / nrm * 1000000000.0) AS BIGINT) AS hq
    FROM hs{t}, hn{t}
),
as{t} AS MATERIALIZED (
    SELECT e.dst, SUM(CAST(e.w AS HUGEINT) * h.hq) AS s
    FROM edges e JOIN h{t} h USING (src) GROUP BY e.dst
),
an{t} AS (SELECT SQRT(CAST(SUM(s * s) AS DOUBLE)) AS nrm FROM as{t}),
a{t} AS MATERIALIZED (
    SELECT dst,
           CAST(ROUND(CAST(s AS DOUBLE) / nrm * 1000000000.0) AS BIGINT) AS aq
    FROM as{t}, an{t}
)""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
deg AS (
    SELECT src, CAST(COUNT(DISTINCT dst) AS BIGINT) AS n_dst,
           CAST(SUM(w) AS BIGINT) AS total_w
    FROM edges GROUP BY src
)
SELECT h.src AS supp_key,
       ROUND(CAST(h.hq AS DOUBLE) / 1000000000.0, 6) AS hub,
       d.n_dst, d.total_w
FROM h{n_iter} h JOIN deg d USING (src)
"""
    )


_HITS_SQL = _hits_oracle(12)

# Winnowing (lock-step with textstats.winnow_fingerprints k=5 w=8 +
# winnow_overlap_stats: forward polynomial k-gram hashes, min per
# 8-window, distinct per doc, shared = in ≥2 distinct docs; DuckDB
# explodes chars + windows — Spark selects in-row)
_WINNOW_POWS = [pow(257, j, 2_147_483_647) for j in range(5)]
_WINNOW_SQL = f"""
WITH chars AS MATERIALIZED (
    SELECT doc_id, CAST(i AS BIGINT) AS i,
           CAST(ascii(substr(text, CAST(i AS INTEGER), 1)) AS BIGINT) AS c
    FROM documents, unnest(range(1, length(text)+1)) AS t(i)
),
offs AS (SELECT unnest(range(0,5)) AS j,
                unnest([{",".join(str(p) for p in _WINNOW_POWS)}]) AS p),
kg AS MATERIALIZED (
    SELECT ch.doc_id, ch.i, SUM(c2.c * o.p) % 2147483647 AS h
    FROM chars ch JOIN offs o ON TRUE JOIN chars c2
      ON c2.doc_id = ch.doc_id AND c2.i = ch.i + o.j
    JOIN documents d ON d.doc_id = ch.doc_id
    WHERE ch.i <= length(d.text) - 4
    GROUP BY ch.doc_id, ch.i
),
wm AS (
    SELECT doc_id, i,
           MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                        ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS m,
           COUNT(*) OVER (PARTITION BY doc_id) AS L
    FROM kg
),
fps AS (
    SELECT DISTINCT doc_id, m AS fp FROM wm WHERE L >= 8 AND i <= L - 7
    UNION
    SELECT doc_id, MIN(h) AS fp FROM kg
    GROUP BY doc_id HAVING COUNT(*) BETWEEN 1 AND 7
),
freq AS (SELECT fp, COUNT(DISTINCT doc_id) AS d FROM fps GROUP BY fp)
SELECT fps.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_fingerprints,
       CAST(SUM(CASE WHEN d >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_fp,
       ROUND(CAST(SUM(CASE WHEN d >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS share_ratio
FROM fps JOIN freq USING (fp)
GROUP BY fps.doc_id
"""


def _esd_oracle(n_rounds: int = 5) -> str:
    """Unrolled generalized-ESD extraction (lock-step with
    robust.esd_topk_outliers over the daily turn count): per round,
    exact-integer (n, Σv, Σv²) on the remaining set, the identical
    double expression tree for z, max-z pick with min-key tiebreak,
    anti-join removal."""
    parts = [f"""{_CONV_CTE},
r0 AS MATERIALIZED (
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS k,
           CAST(COUNT(*) AS BIGINT) AS v
    FROM conversations GROUP BY 1
)"""]
    for t in range(1, n_rounds + 1):
        parts.append(f"""s{t} AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS a,
           CAST(SUM(v*v) AS BIGINT) AS b
    FROM r{t-1}
),
z{t} AS (
    SELECT k, v,
           ABS(CAST(v AS DOUBLE) - CAST(a AS DOUBLE) / CAST(n AS DOUBLE))
           / SQRT((CAST(n AS DOUBLE) * CAST(b AS DOUBLE)
                   - CAST(a AS DOUBLE) * CAST(a AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) AS z
    FROM r{t-1}, s{t}
),
p{t} AS MATERIALIZED (
    SELECT CAST({t} AS INTEGER) AS round, k, v, ROUND(z, 6) AS zscore
    FROM z{t}, (SELECT MAX(z) AS mz FROM z{t})
    WHERE z = mz ORDER BY k LIMIT 1
),
r{t} AS MATERIALIZED (
    SELECT k, v FROM r{t-1} WHERE k NOT IN (SELECT k FROM p{t})
)""")
    tail = " UNION ALL ".join(
        f"SELECT round, k AS day, v AS value, zscore FROM p{t}"
        for t in range(1, n_rounds + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + tail


# kNN label agreement (lock-step with similarity.knn_label_consistency
# k=5, method="lsh" bits=4 over the sign-of-first-coordinate proxy
# label: every point is a query, so candidates are restricted to the
# sign-LSH bucket — the all-pairs brute kNN was the measured sf0.1
# bottleneck; the oracle mirrors the bucket equi-join)
_KNN_LABEL_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe,
                  {_BUCKET.format(e='embedding')} AS bucket
           FROM embeddings),
v AS (SELECT vec_id AS neighbor_id, embedding AS ne,
             {_BUCKET.format(e='embedding')} AS bucket
      FROM embeddings),
scored AS (
    SELECT query_id, neighbor_id, ROUND({_COS}, 6) AS cosine
    FROM q JOIN v USING (bucket) WHERE neighbor_id <> query_id
),
knn AS (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, neighbor_id ASC) AS rnk
    FROM scored
),
lbl AS (
    SELECT vec_id, CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END AS label
    FROM embeddings
)
SELECT k.query_id AS vec_id, lo.label,
       CAST(COUNT(*) AS BIGINT) AS n_k,
       CAST(SUM(CASE WHEN ln.label = lo.label THEN 1 ELSE 0 END) AS BIGINT)
           AS n_match,
       ROUND(CAST(SUM(CASE WHEN ln.label = lo.label THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS consistency,
       CASE WHEN CAST(SUM(CASE WHEN ln.label = lo.label THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) <= 0.2
            THEN 1 ELSE 0 END AS suspect
FROM knn k
JOIN lbl lo ON lo.vec_id = k.query_id
JOIN lbl ln ON ln.vec_id = k.neighbor_id
WHERE k.rnk <= 5
GROUP BY k.query_id, lo.label
"""


# Data-constrained epoch budgeting (lock-step with
# sampling.epoch_budget_plan: even 4×-corpus split, epochs capped 16,
# geometric repeat-value decay 0.71 — pow/divisions identical IEEE)
_EPOCH_BUDGET_SQL = f"""
WITH per AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN trim(text) = '' THEN 0
                         ELSE {_NTOK_RAW} END) AS BIGINT) AS unique_tokens
    FROM documents GROUP BY source
),
tot AS (
    SELECT CAST(SUM(unique_tokens) AS BIGINT) AS total,
           CAST(COUNT(*) AS BIGINT) AS k
    FROM per
)
SELECT source, n_docs, unique_tokens,
       ROUND(4.0 * CAST(total AS DOUBLE) / CAST(k AS DOUBLE), 6) AS alloc_tokens,
       ROUND(LEAST(16.0, 4.0 * CAST(total AS DOUBLE) / CAST(k AS DOUBLE)
                          / CAST(unique_tokens AS DOUBLE)), 6) AS epochs,
       ROUND(CAST(unique_tokens AS DOUBLE)
             * (1.0 - POWER(0.71, LEAST(16.0,
                    4.0 * CAST(total AS DOUBLE) / CAST(k AS DOUBLE)
                    / CAST(unique_tokens AS DOUBLE))))
             / (1.0 - 0.71), 6) AS effective_tokens,
       ROUND(CAST(unique_tokens AS DOUBLE)
             * (1.0 - POWER(0.71, LEAST(16.0,
                    4.0 * CAST(total AS DOUBLE) / CAST(k AS DOUBLE)
                    / CAST(unique_tokens AS DOUBLE))))
             / (1.0 - 0.71)
             / (4.0 * CAST(total AS DOUBLE) / CAST(k AS DOUBLE)), 6)
           AS utilization
FROM per, tot
"""


# TPC-H Q5 shape (lock-step with _q_q5_local_supplier_volume:
# ASIA nations, 1996 orders, customer/supplier same-nation locality,
# DECIMAL-exact revenue cast to double at the edge)
_Q5_SQL = """
SELECT n.n_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(5,2)) - CAST(l.l_discount AS DECIMAL(5,2))))
            AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND c.c_nationkey = s.s_nationkey
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
"""


# Deletion-cascade audit (lock-step with
# privacy.deletion_cascade_audit over customer->orders->lineitem,
# deletion list custkey % 97 == 0)
_DELETION_CASCADE_SQL = """
WITH dele AS (SELECT c_custkey AS key FROM customer WHERE c_custkey % 97 = 0),
aff_cust AS (SELECT * FROM customer WHERE c_custkey IN (SELECT key FROM dele)),
aff_ord AS (SELECT * FROM orders
            WHERE o_custkey IN (SELECT DISTINCT c_custkey FROM aff_cust)),
aff_li AS (SELECT * FROM lineitem
           WHERE l_orderkey IN (SELECT DISTINCT o_orderkey FROM aff_ord))
SELECT 'customer' AS "table",
       CAST((SELECT COUNT(*) FROM customer) AS BIGINT) AS rows_total,
       CAST((SELECT COUNT(*) FROM aff_cust) AS BIGINT) AS rows_affected,
       ROUND(CAST((SELECT COUNT(*) FROM aff_cust) AS DOUBLE)
             / CAST((SELECT COUNT(*) FROM customer) AS DOUBLE), 6) AS share
UNION ALL
SELECT 'orders',
       CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
       CAST((SELECT COUNT(*) FROM aff_ord) AS BIGINT),
       ROUND(CAST((SELECT COUNT(*) FROM aff_ord) AS DOUBLE)
             / CAST((SELECT COUNT(*) FROM orders) AS DOUBLE), 6)
UNION ALL
SELECT 'lineitem',
       CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
       CAST((SELECT COUNT(*) FROM aff_li) AS BIGINT),
       ROUND(CAST((SELECT COUNT(*) FROM aff_li) AS DOUBLE)
             / CAST((SELECT COUNT(*) FROM lineitem) AS DOUBLE), 6)
"""


# MMR re-ranking (lock-step with similarity.mmr_rerank over query-0's
# top-10 candidates, λ=0.7: greedy unrolled, identical float literals
# — note 1−0.7 is 0.30000000000000004 in IEEE, reproduced verbatim)
def _mmr_oracle(k: int = 10, lam: float = 0.7) -> str:
    om = repr(1.0 - lam)
    head = f"""q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id = 0),
v AS (SELECT vec_id AS neighbor_id, embedding AS ne FROM embeddings),
allsc AS (
    SELECT neighbor_id, ROUND({_COS}, 6) AS rel
    FROM v, q WHERE neighbor_id <> query_id
),
cands AS MATERIALIZED (
    -- rel IS NOT NULL: zero-norm query -> NULL cosines -> no
    -- candidates (mirrors the engine gate's filter)
    SELECT neighbor_id AS cand_id, rel FROM allsc
    WHERE rel IS NOT NULL
    ORDER BY rel DESC, neighbor_id ASC LIMIT {k}
),
ca AS (SELECT e.vec_id AS a, e.embedding AS qe
       FROM embeddings e JOIN cands c ON c.cand_id = e.vec_id),
cb AS (SELECT e.vec_id AS b, e.embedding AS ne
       FROM embeddings e JOIN cands c ON c.cand_id = e.vec_id),
sims AS MATERIALIZED (
    SELECT a, b, ROUND({_COS}, 6) AS sim FROM ca, cb WHERE a <> b
),
rem0 AS (SELECT cand_id, rel FROM cands)"""
    parts = [head]
    for i in range(1, k + 1):
        if i == 1:
            scored = f"sc{i} AS (SELECT cand_id, rel, {lam!r} * rel AS score FROM rem{i-1})"
        else:
            scored = f"""sc{i} AS (
    SELECT r.cand_id, r.rel,
           {lam!r} * r.rel - {om} * COALESCE(m.ms, 0.0) AS score
    FROM rem{i-1} r LEFT JOIN (
        SELECT s.a AS cand_id, MAX(s.sim) AS ms
        FROM sims s JOIN sel{i-1} x ON s.b = x.cand_id GROUP BY s.a
    ) m USING (cand_id)
)"""
        parts.append(scored)
        parts.append(
            f"""p{i} AS MATERIALIZED (
    SELECT CAST({i} AS INTEGER) AS rank, cand_id, rel,
           ROUND(score, 6) AS mmr_score
    FROM sc{i}, (SELECT MAX(score) AS mx FROM sc{i})
    WHERE score = mx ORDER BY cand_id LIMIT 1
)"""
        )
        sel = " UNION ALL ".join(f"SELECT cand_id FROM p{j}" for j in range(1, i + 1))
        parts.append(f"sel{i} AS (  {sel})")
        parts.append(
            f"rem{i} AS (SELECT cand_id, rel FROM rem{i-1} "
            f"WHERE cand_id NOT IN (SELECT cand_id FROM p{i}))"
        )
    tail = " UNION ALL ".join(
        f"SELECT rank, cand_id, rel, mmr_score FROM p{j}" for j in range(1, k + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + tail


# Modularity of the near-dup partition (lock-step with
# components.modularity over the MinHash-LSH pair graph + the
# recursive-CTE transitive closure of _DEDUP_COMPONENTS_SQL; the
# score is ONE exact-integer expression over a common denominator)
_LSH_MODULARITY_SQL = f"""
WITH RECURSIVE pairs AS ({{lsh}}),
edges AS (
    SELECT doc_a AS u, doc_b AS v FROM pairs
    UNION
    SELECT doc_b AS u, doc_a AS v FROM pairs
),
reach(node, label) AS (
    SELECT u, u FROM (SELECT DISTINCT u FROM edges) n
    UNION
    SELECT e.v, r.label FROM reach r JOIN edges e ON e.u = r.node
),
comp AS (SELECT node, MIN(label) AS community FROM reach GROUP BY node),
deg AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY u),
d_c AS (
    SELECT c.community, CAST(SUM(g.d) AS BIGINT) AS dc
    FROM deg g JOIN comp c USING (node) GROUP BY c.community
),
internal AS (
    SELECT cu.community, CAST(COUNT(*) AS BIGINT) AS ec
    FROM pairs p
    JOIN comp cu ON cu.node = p.doc_a
    JOIN comp cv ON cv.node = p.doc_b
    WHERE cu.community = cv.community
    GROUP BY cu.community
),
per_c AS (
    SELECT d.community, d.dc, COALESCE(i.ec, 0) AS ec
    FROM d_c d LEFT JOIN internal i USING (community)
),
sums AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_communities,
           CAST(SUM(ec) AS BIGINT) AS se,
           CAST(SUM(dc * dc) AS BIGINT) AS sd2
    FROM per_c
),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM pairs),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM deg)
SELECT nn.n_nodes, m.m AS n_edges, s.n_communities,
       ROUND(CAST(4 * m.m * s.se - s.sd2 AS DOUBLE)
             / CAST(4 * m.m * m.m AS DOUBLE), 6) AS modularity
FROM sums s, m, nn
"""

# Leave-one-out n-gram novelty (lock-step with textstats.ngram_novelty
# n=3: distinct trigram shingles, corpus df, df==1 share per doc)
_NGRAM_NOVELTY_SQL = f"""
WITH sh AS MATERIALIZED (
    SELECT doc_id, unnest({_SHINGLES.format(toks=_TOKS, nm1=2)}) AS sh
    FROM documents
),
dfsh AS (SELECT sh, CAST(COUNT(*) AS BIGINT) AS df FROM sh GROUP BY sh)
SELECT s.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       ROUND(CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS novelty
FROM sh s JOIN dfsh USING (sh)
GROUP BY s.doc_id
"""


# PPMI spectral factor (lock-step with _q_pmi_top_factor: top-40
# df terms, doc-presence cooccurrence, PPMI rounded 6 → the
# _power_iter_oracle integer fixed point on the new matrix)
def _pmi_factor_oracle(n_iter: int = 24) -> str:
    head = f"""toks AS MATERIALIZED (
    SELECT doc_id, unnest(list_distinct({_TOKS})) AS term FROM documents
),
dft AS (SELECT term, COUNT(*) AS df FROM toks GROUP BY term),
top AS MATERIALIZED (
    SELECT term, df,
           row_number() OVER (ORDER BY df DESC, term) - 1 AS idx
    FROM dft ORDER BY df DESC, term LIMIT 40
),
filt AS (SELECT t.doc_id, p.idx, p.df FROM toks t JOIN top p USING (term)),
prs AS (
    SELECT a.idx AS i, b.idx AS j, a.df AS df_i, b.df AS df_j,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM filt a JOIN filt b ON a.doc_id = b.doc_id AND a.idx < b.idx
    GROUP BY 1, 2, 3, 4
),
uppr AS (
    SELECT i, j,
           GREATEST(0.0, ROUND(LN(CAST(c AS DOUBLE) * CAST(D AS DOUBLE)
               / (CAST(df_i AS DOUBLE) * CAST(df_j AS DOUBLE))), 6)) AS v
    FROM prs, (SELECT CAST(COUNT(*) AS BIGINT) AS D FROM documents)
),
cov AS MATERIALIZED (
    SELECT i, j, CAST(ROUND(v * 1000000.0) AS BIGINT) AS cq FROM uppr
    UNION ALL
    SELECT j, i, CAST(ROUND(v * 1000000.0) AS BIGINT) FROM uppr
),
v0 AS (
    SELECT DISTINCT i AS j,
           CAST(ROUND(1000000000.0
                / SQRT(CAST((SELECT COUNT(DISTINCT i) FROM cov) AS DOUBLE)))
                AS BIGINT) AS vq
    FROM cov
)"""
    ctes = [head]
    for t in range(1, n_iter + 1):
        ctes.append(f"""s{t} AS MATERIALIZED (
    SELECT m.i, SUM(m.cq * v.vq) AS s
    FROM cov m JOIN v{t-1} v ON v.j = m.j GROUP BY m.i
),
n{t} AS MATERIALIZED (
    SELECT SQRT(CAST(SUM(CAST(s AS HUGEINT) * s) AS DOUBLE)) AS nrm FROM s{t}
),
v{t} AS MATERIALIZED (
    SELECT i AS j,
           CAST(ROUND(CAST(s AS DOUBLE) / nrm * 1000000000.0) AS BIGINT) AS vq
    FROM s{t}, n{t}
)""")
    last = f"v{n_iter}"
    tail = f"""quad AS (
    SELECT SUM(CAST(vi.vq AS HUGEINT) * m.cq * vj.vq) AS num
    FROM cov m JOIN {last} vj ON vj.j = m.j JOIN {last} vi ON vi.j = m.i
),
den AS (SELECT SUM(CAST(vq AS HUGEINT) * vq) AS den FROM {last}),
lam AS (
    SELECT CAST(num AS DOUBLE) / CAST(den AS DOUBLE) / 1000000.0 AS eigenvalue
    FROM quad, den
),
pvt AS (SELECT vq FROM {last} ORDER BY ABS(vq) DESC, j ASC LIMIT 1)
SELECT t.term, CAST(v.j AS INTEGER) AS dim,
       ROUND(CAST(CASE WHEN p.vq < 0 THEN -v.vq ELSE v.vq END AS DOUBLE)
             / 1000000000.0, 6) AS loading,
       ROUND(l.eigenvalue, 6) AS eigenvalue
FROM {last} v JOIN top t ON t.idx = v.j, pvt p, lam l"""
    return "WITH " + ",\n".join(ctes) + ",\n" + tail


# Quantile (pinball) trend (lock-step with
# windows.quantile_trend_daily tau=0.9: OLS start, 12 unrolled IRLS
# steps on the calendar-bounded daily table, (a,b) re-quantized to
# 1e-9 per step, identical weighted-normal-equation expression trees)
def _quantile_trend_oracle(tau: float = 0.9, n_iter: int = 12) -> str:
    q = 1_000_000_000
    day_us = 86400 * 1_000_000
    parts = [
        f"""{_CONV_CTE},
daily AS (
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
           CAST(COUNT(*) AS BIGINT) AS x
    FROM conversations GROUP BY 1
),
pts AS MATERIALIZED (
    SELECT CAST(floor(epoch_us(d) / {day_us}) AS BIGINT)
           - (SELECT MIN(CAST(floor(epoch_us(d) / {day_us}) AS BIGINT))
              FROM daily) AS t,
           x
    FROM daily
),
f0 AS (
    SELECT CAST(ROUND((swy - (sw * swty - swt * swy) / (sw * swtt - swt * swt)
                       * swt) / sw * {q}.0) AS BIGINT) AS aq,
           CAST(ROUND((sw * swty - swt * swy) / (sw * swtt - swt * swt)
                      * {q}.0) AS BIGINT) AS bq
    FROM (
        SELECT SUM(w) AS sw, SUM(w * t) AS swt, SUM(w * t * t) AS swtt,
               SUM(w * x) AS swy, SUM(w * t * x) AS swty
        FROM (SELECT t, x, 1.0 AS w FROM pts)
    )
)"""
    ]
    resid = (
        f"CAST(x AS DOUBLE) - CAST(aq AS DOUBLE) / {q}.0"
        f" - CAST(bq AS DOUBLE) / {q}.0 * CAST(t AS DOUBLE)"
    )
    wexpr = (
        f"CASE WHEN ({resid}) > 0 THEN {tau!r} / GREATEST(({resid}), 1e-06)"
        f" ELSE {1.0 - tau!r} / GREATEST(-({resid}), 1e-06) END"
    )
    for i in range(1, n_iter + 1):
        parts.append(
            f"""f{i} AS MATERIALIZED (
    SELECT CAST(ROUND((swy - (sw * swty - swt * swy) / (sw * swtt - swt * swt)
                       * swt) / sw * {q}.0) AS BIGINT) AS aq,
           CAST(ROUND((sw * swty - swt * swy) / (sw * swtt - swt * swt)
                      * {q}.0) AS BIGINT) AS bq
    FROM (
        SELECT SUM(w) AS sw, SUM(w * t) AS swt, SUM(w * t * t) AS swtt,
               SUM(w * x) AS swy, SUM(w * t * x) AS swty
        FROM (SELECT t, x, {wexpr} AS w FROM pts, f{i-1})
    )
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND({tau!r}, 6) AS tau,
       ROUND(CAST(MIN(bq) AS DOUBLE) / {q}.0, 6) AS slope,
       ROUND(CAST(MIN(aq) AS DOUBLE) / {q}.0, 6) AS intercept,
       ROUND(AVG(CASE WHEN ({resid}) > 0 THEN {tau!r} * ({resid})
                      ELSE {tau - 1.0!r} * ({resid}) END), 6) AS pinball_loss
FROM pts, f{n_iter}
"""
    )


# Permutation importance (lock-step with
# error_analysis.permutation_importance over the conv-level proxy
# scorer: same bucket-cyclic permutation from stable_hash48, same
# left-assoc linear form, same Mann-Whitney AUC machine as _AUC_SQL)
def _perm_importance_oracle() -> str:
    feats = ["f_turns", "f_len", "f_tool"]
    weights = {"f_turns": 0.5, "f_len": 0.15, "f_tool": 4.0}
    lin = "-3.0 + 0.5 * f_turns + 0.15 * f_len + 4.0 * f_tool"
    score = f"ROUND(1.0 / (1.0 + EXP(-({lin}))), 6)"
    bkt = _H48.format(x="concat('pib', conv_id)")
    hk = _H48.format(x="concat('pir', conv_id)")
    parts = [
        f"""{_CONV_CTE},
feats AS MATERIALIZED (
    SELECT conv_id,
           CAST(CASE WHEN SUM(CASE WHEN tool = 'error' THEN 1 ELSE 0 END) * 4
                          > COUNT(*)
                     THEN 1 ELSE 0 END AS INTEGER) AS y,
           ROUND(LN(1.0 + COUNT(*)), 6) AS f_turns,
           ROUND(LN(1.0 + SUM(length(text))), 6) AS f_len,
           ROUND(CAST(SUM(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS f_tool,
           {bkt} % 64 AS bkt,
           {hk} AS hk
    FROM conversations GROUP BY conv_id
)"""
    ]
    variant_selects = [f"SELECT 'base' AS variant, y, {score} AS score FROM feats"]
    for pf in feats:
        cols = ", ".join(
            (
                f"COALESCE(LEAD({f}) OVER w, FIRST_VALUE({f}) OVER wf) AS {f}"
                if f == pf
                else f
            )
            for f in feats
        )
        parts.append(
            f"""perm_{pf} AS (
    SELECT conv_id, y, {cols}
    FROM feats
    WINDOW w AS (PARTITION BY bkt ORDER BY hk, conv_id),
           wf AS (PARTITION BY bkt ORDER BY hk, conv_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)"""
        )
        variant_selects.append(
            f"SELECT '{pf}' AS variant, y, {score} AS score FROM perm_{pf}"
        )
    parts.append(
        "stacked AS (\n    " + "\n    UNION ALL ".join(variant_selects) + "\n)"
    )
    parts.append(
        """per_score AS (
    SELECT variant, score,
           CAST(SUM(y) AS BIGINT) AS pos, CAST(SUM(1 - y) AS BIGINT) AS neg
    FROM stacked GROUP BY variant, score
),
cum AS (
    SELECT variant, pos, neg,
           SUM(neg) OVER (PARTITION BY variant ORDER BY score) - neg AS cumneg_below,
           SUM(pos) OVER (PARTITION BY variant) AS tp,
           SUM(neg) OVER (PARTITION BY variant) AS tn
    FROM per_score
),
aucs AS (
    SELECT variant AS feature,
           CAST(MAX(tp) AS BIGINT) AS n_pos, CAST(MAX(tn) AS BIGINT) AS n_neg,
           ROUND(SUM(pos * (CAST(cumneg_below AS DOUBLE) + neg / 2.0))
                 / (CAST(MAX(tp) AS DOUBLE) * CAST(MAX(tn) AS DOUBLE)), 6) AS auc
    FROM cum GROUP BY variant
)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + """
SELECT a.feature, a.n_pos, a.n_neg, a.auc,
       ROUND(b.auc - a.auc, 6) AS importance
FROM aucs a, (SELECT auc FROM aucs WHERE feature = 'base') b
"""
    )


# Rolling 7-day distinct-active conversations (lock-step with
# windows.rolling_active_entities: interval-cover rewrite — distinct
# entity-days exploded to the <=7 window-END days each covers, second
# dedup, per-end-day counts; reported days bounded by the corpus max)
_ROLLING_ACTIVE_SQL = f"""
WITH {_CONV_CTE},
pairs AS (
    SELECT DISTINCT conv_id,
           CAST(floor(epoch_us(date_trunc('day', ts)) / 86400000000)
                AS BIGINT) AS dn
    FROM conversations
),
mx AS (SELECT max(dn) AS m FROM pairs),
cover AS (
    SELECT DISTINCT conv_id, dn + o AS cd
    FROM pairs CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS o) r
    WHERE dn + o <= (SELECT m FROM mx)
),
win AS (
    SELECT cd, CAST(COUNT(*) AS BIGINT) AS active_window
    FROM cover GROUP BY cd
),
day AS (
    SELECT dn AS cd, CAST(COUNT(*) AS BIGINT) AS active_day
    FROM pairs GROUP BY dn
)
SELECT epoch_ms(win.cd * 86400000) AS d,
       COALESCE(day.active_day, 0) AS active_day,
       win.active_window,
       ROUND(COALESCE(day.active_day, 0)
             / CAST(win.active_window AS DOUBLE), 6) AS stickiness
FROM win LEFT JOIN day ON win.cd = day.cd
"""

# Daily cross-correlation user vs assistant (lock-step with
# windows.ccf_daily: one conditional-agg day collapse, full-series
# means/denominators, observation lags over the day-ordered series,
# positive lag = assistant series lagged, negative = user lagged)
_CCF_ROLES_SQL = f"""
WITH {_CONV_CTE},
daily AS (
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
           CAST(SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END)
                AS DOUBLE) AS a,
           CAST(SUM(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)
                AS DOUBLE) AS b
    FROM conversations GROUP BY 1
),
mu AS (SELECT avg(a) AS ma, avg(b) AS mb FROM daily),
dev AS (
    SELECT d, a - (SELECT ma FROM mu) AS da, b - (SELECT mb FROM mu) AS db
    FROM daily
),
den AS (SELECT SUM(da * da) AS dena, SUM(db * db) AS denb FROM dev),
lagd AS (
    SELECT d, da, db,
           lag(db, 1) OVER w AS lb1,
           lag(db, 2) OVER w AS lb2,
           lag(db, 3) OVER w AS lb3,
           lag(db, 4) OVER w AS lb4,
           lag(db, 5) OVER w AS lb5,
           lag(db, 6) OVER w AS lb6,
           lag(db, 7) OVER w AS lb7,
           lag(da, 1) OVER w AS la1,
           lag(da, 2) OVER w AS la2,
           lag(da, 3) OVER w AS la3,
           lag(da, 4) OVER w AS la4,
           lag(da, 5) OVER w AS la5,
           lag(da, 6) OVER w AS la6,
           lag(da, 7) OVER w AS la7
    FROM dev WINDOW w AS (ORDER BY d)
),
stack AS (
    SELECT 0 AS "lag", da * db AS prod FROM lagd
    UNION ALL
    SELECT 1, da * lb1 FROM lagd
    UNION ALL
    SELECT -1, db * la1 FROM lagd
    UNION ALL
    SELECT 2, da * lb2 FROM lagd
    UNION ALL
    SELECT -2, db * la2 FROM lagd
    UNION ALL
    SELECT 3, da * lb3 FROM lagd
    UNION ALL
    SELECT -3, db * la3 FROM lagd
    UNION ALL
    SELECT 4, da * lb4 FROM lagd
    UNION ALL
    SELECT -4, db * la4 FROM lagd
    UNION ALL
    SELECT 5, da * lb5 FROM lagd
    UNION ALL
    SELECT -5, db * la5 FROM lagd
    UNION ALL
    SELECT 6, da * lb6 FROM lagd
    UNION ALL
    SELECT -6, db * la6 FROM lagd
    UNION ALL
    SELECT 7, da * lb7 FROM lagd
    UNION ALL
    SELECT -7, db * la7 FROM lagd
)
SELECT "lag", CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(CASE WHEN (SELECT dena FROM den) > 1e-12
                   AND (SELECT denb FROM den) > 1e-12
             THEN SUM(prod) / sqrt((SELECT dena FROM den)
                                   * (SELECT denb FROM den)) END, 6) AS ccf
FROM stack WHERE prod IS NOT NULL GROUP BY "lag"
"""

# Mann-Kendall trend test (lock-step with windows.mann_kendall_daily:
# pair scan over the bounded daily series only, tie-corrected
# variance, continuity-corrected z, tau-b with the time side tie-free)
_MANN_KENDALL_SQL = f"""
WITH {_CONV_CTE},
daily AS (
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
           CAST(COUNT(*) AS BIGINT) AS x
    FROM conversations GROUP BY 1
),
s AS (
    SELECT CAST(SUM(SIGN(CAST(j.x AS DOUBLE) - i.x)) AS BIGINT) AS s_stat
    FROM daily i JOIN daily j ON i.d < j.d
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily),
ties AS (
    SELECT SUM(t * (t - 1) * (2 * t + 5)) AS tv,
           SUM(t * (t - 1) / 2) AS tt
    FROM (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM daily GROUP BY x)
),
one AS (
    SELECT n_days, s_stat, tv, tt,
           (CAST(n_days AS DOUBLE) * (n_days - 1) * (2 * n_days + 5) - tv)
             / 18.0 AS vs,
           CAST(n_days AS DOUBLE) * (n_days - 1) / 2 AS dp
    FROM n, s, ties
)
SELECT n_days, s_stat,
       ROUND(vs, 6) AS var_s,
       ROUND(CASE WHEN vs <= 0 THEN 0.0
                  WHEN s_stat > 0
                    THEN (CAST(s_stat AS DOUBLE) - 1) / sqrt(vs)
                  WHEN s_stat < 0
                    THEN (CAST(s_stat AS DOUBLE) + 1) / sqrt(vs)
                  ELSE 0.0 END, 6) AS z_stat,
       ROUND(CASE WHEN sqrt(dp * (dp - tt)) > 0
                  THEN CAST(s_stat AS DOUBLE) / sqrt(dp * (dp - tt))
                  ELSE 0.0 END, 6) AS tau_b
FROM one
"""

# Chao1 richness + Good-Turing coverage (lock-step with
# textstats.vocab_richness: the zipf_stats normalize+tokenize device,
# bias-corrected chao1 = V + f1(f1-1)/(2(f2+1)), coverage = 1 - f1/N)
_VOCAB_RICHNESS_SQL = f"""
WITH words AS (
    SELECT word, COUNT(*) AS c
    FROM (SELECT unnest({_TOKS}) AS word FROM documents) t
    WHERE word IS NOT NULL AND word <> ''
    GROUP BY 1
),
one AS (
    SELECT CAST(SUM(c) AS BIGINT) AS total_tokens,
           CAST(COUNT(*) AS BIGINT) AS vocab_size,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
           CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
    FROM words
)
SELECT total_tokens, vocab_size, f1, f2,
       ROUND(vocab_size + CAST(f1 AS DOUBLE) * (f1 - 1) / (2 * (f2 + 1)),
             6) AS chao1,
       ROUND(CASE WHEN total_tokens > 0
                  THEN 1.0 - CAST(f1 AS DOUBLE) / total_tokens END,
             6) AS coverage
FROM one
"""



# STL-lite decomposition (lock-step with windows.stl_daily: centered
# 7-point rolling-MEDIAN trend with partial edge windows, full-series
# per-isodow seasonal means of the detrended series — NOT centered —
# remainder = n - trend - seasonal)
_STL_DAILY_SQL = f"""
WITH {_CONV_CTE},
daily AS (
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
           CAST(COUNT(*) AS BIGINT) AS n_turns
    FROM conversations GROUP BY 1
),
tr AS (
    SELECT d, n_turns, CAST(isodow(d) AS INTEGER) AS iso_dow,
           median(CAST(n_turns AS DOUBLE)) OVER (
               ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
           ) AS trend
    FROM daily
),
se AS (
    SELECT d, n_turns, iso_dow, trend,
           avg(n_turns - trend) OVER (PARTITION BY iso_dow) AS seasonal
    FROM tr
)
SELECT d, n_turns, iso_dow,
       ROUND(trend, 6) AS trend,
       ROUND(seasonal, 6) AS seasonal,
       ROUND(n_turns - trend - seasonal, 6) AS remainder
FROM se
"""

# Balancing-weight ESS (lock-step with sampling.balance_weights +
# weight_diagnostics: w = N/(K*n_source), Kish ESS = (Sum w)^2/Sum w^2,
# cv floor-guarded at 0)
_WEIGHT_ESS_SQL = """
WITH sizes AS (SELECT source, COUNT(*) AS ng FROM documents GROUP BY 1),
tot AS (
    SELECT CAST(SUM(ng) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k
    FROM sizes
),
w AS (
    SELECT CAST(n AS DOUBLE) / (k * ng) AS w
    FROM documents d JOIN sizes USING (source), tot
),
one AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           SUM(w) AS sw, SUM(w * w) AS sww, MAX(w) AS mw
    FROM w
)
SELECT n_rows,
       ROUND(sw, 6) AS sum_w,
       ROUND(sw * sw / sww, 6) AS ess,
       ROUND(sw * sw / sww / n_rows, 6) AS ess_frac,
       ROUND(mw / sw, 6) AS max_w_share,
       ROUND(sqrt(CASE WHEN n_rows * sww / (sw * sw) - 1 > 0
                       THEN n_rows * sww / (sw * sw) - 1
                       ELSE 0 END), 6) AS cv_w
FROM one
"""

# Shuffle-key skew report (lock-step with skew.skew_diagnosis: exact
# lower-inverse-CDF p99 over the cumulative counts-of-counts table,
# salt recommendation = ceil(max/mean))
_SKEW_DIAGNOSIS_SQL = f"""
WITH {_CONV_CTE},
counts AS (SELECT conv_id, COUNT(*) AS c FROM conversations GROUP BY 1),
cc AS (SELECT c, COUNT(*) AS k FROM counts GROUP BY 1),
cum AS (
    SELECT c, k, SUM(k) OVER (
        ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS cum
    FROM cc
),
tot AS (
    SELECT CAST(SUM(c * k) AS BIGINT) AS n_rows,
           CAST(SUM(k) AS BIGINT) AS n_keys,
           CAST(MAX(c) AS BIGINT) AS max_count
    FROM cc
),
p99 AS (
    SELECT CAST(MIN(c) AS BIGINT) AS p99_count
    FROM cum, tot WHERE CAST(cum AS DOUBLE) >= 0.99 * n_keys
)
SELECT n_rows, n_keys, max_count, p99_count,
       ROUND(CAST(n_rows AS DOUBLE) / n_keys, 6) AS mean_count,
       ROUND(max_count / (CAST(n_rows AS DOUBLE) / n_keys), 6)
         AS max_to_mean,
       ROUND(p99_count / (CAST(n_rows AS DOUBLE) / n_keys), 6)
         AS p99_to_mean,
       CAST(CEIL(max_count / (CAST(n_rows AS DOUBLE) / n_keys)) AS BIGINT)
         AS salt_buckets
FROM tot, p99
"""


# Granger lag-1 lead/lag F-test (lock-step with windows.granger_daily:
# exact integer sufficient statistics over the lagged daily frame,
# closed-form 2x2 normal equations, singular-design/m<=3 NULL guards)
_GRANGER_SQL = f"""
WITH {_CONV_CTE},
daily AS (
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
           CAST(SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT) AS a,
           CAST(SUM(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS BIGINT) AS b
    FROM conversations GROUP BY 1
),
lagged AS (
    SELECT * FROM (
        SELECT a, b,
               lag(a) OVER (ORDER BY d) AS al,
               lag(b) OVER (ORDER BY d) AS bl
        FROM daily
    ) WHERE al IS NOT NULL
),
mom AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS m,
           SUM(a) AS s_a, SUM(b) AS s_b, SUM(al) AS s_al, SUM(bl) AS s_bl,
           SUM(a * a) AS s_aa, SUM(b * b) AS s_bb,
           SUM(al * al) AS s_alal, SUM(bl * bl) AS s_blbl,
           SUM(al * bl) AS s_albl,
           SUM(a * al) AS s_aal, SUM(a * bl) AS s_abl,
           SUM(b * al) AS s_bal, SUM(b * bl) AS s_bbl
    FROM lagged
),
momd AS (SELECT *, CAST(m AS DOUBLE) AS md FROM mom)
SELECT 'a_to_b' AS direction, m AS n_obs,
       ROUND((CASE WHEN (CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) > 0 THEN (CAST(s_bb AS DOUBLE) - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE) / md) - (CAST(s_bbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_b AS DOUBLE) / md) * (CAST(s_bbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_b AS DOUBLE) / md) / (CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) END), 6) AS rss_r,
       ROUND((CASE WHEN ((CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) * (CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) - (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md)) > 0 THEN (CAST(s_bb AS DOUBLE) - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE) / md) - ((((CAST(s_bbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_b AS DOUBLE) / md) * (CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) - (CAST(s_bal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_b AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md)) / ((CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) * (CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) - (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md))) * (CAST(s_bbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_b AS DOUBLE) / md) + (((CAST(s_bal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_b AS DOUBLE) / md) * (CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) - (CAST(s_bbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_b AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md)) / ((CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) * (CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) - (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md))) * (CAST(s_bal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_b AS DOUBLE) / md)) END), 6) AS rss_u,
       ROUND(CASE WHEN ((CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) * (CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) - (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md)) > 0 THEN (((CAST(s_bal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_b AS DOUBLE) / md) * (CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) - (CAST(s_bbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_b AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md)) / ((CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) * (CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) - (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md))) END, 6) AS cross_coef,
       ROUND((CASE WHEN m > 3 AND (CASE WHEN ((CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) * (CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) - (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md)) > 0 THEN (CAST(s_bb AS DOUBLE) - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE) / md) - ((((CAST(s_bbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_b AS DOUBLE) / md) * (CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) - (CAST(s_bal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_b AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md)) / ((CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) * (CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) - (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md))) * (CAST(s_bbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_b AS DOUBLE) / md) + (((CAST(s_bal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_b AS DOUBLE) / md) * (CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) - (CAST(s_bbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_b AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md)) / ((CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) * (CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) - (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md))) * (CAST(s_bal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_b AS DOUBLE) / md)) END) IS NOT NULL AND (CASE WHEN ((CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) * (CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) - (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md)) > 0 THEN (CAST(s_bb AS DOUBLE) - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE) / md) - ((((CAST(s_bbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_b AS DOUBLE) / md) * (CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) - (CAST(s_bal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_b AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md)) / ((CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) * (CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) - (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md))) * (CAST(s_bbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_b AS DOUBLE) / md) + (((CAST(s_bal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_b AS DOUBLE) / md) * (CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) - (CAST(s_bbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_b AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md)) / ((CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) * (CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) - (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md))) * (CAST(s_bal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_b AS DOUBLE) / md)) END) > 0 THEN ((CASE WHEN (CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) > 0 THEN (CAST(s_bb AS DOUBLE) - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE) / md) - (CAST(s_bbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_b AS DOUBLE) / md) * (CAST(s_bbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_b AS DOUBLE) / md) / (CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) END) - (CASE WHEN ((CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) * (CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) - (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md)) > 0 THEN (CAST(s_bb AS DOUBLE) - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE) / md) - ((((CAST(s_bbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_b AS DOUBLE) / md) * (CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) - (CAST(s_bal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_b AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md)) / ((CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) * (CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) - (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md))) * (CAST(s_bbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_b AS DOUBLE) / md) + (((CAST(s_bal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_b AS DOUBLE) / md) * (CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) - (CAST(s_bbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_b AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md)) / ((CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) * (CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) - (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md))) * (CAST(s_bal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_b AS DOUBLE) / md)) END)) / ((CASE WHEN ((CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) * (CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) - (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md)) > 0 THEN (CAST(s_bb AS DOUBLE) - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE) / md) - ((((CAST(s_bbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_b AS DOUBLE) / md) * (CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) - (CAST(s_bal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_b AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md)) / ((CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) * (CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) - (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md))) * (CAST(s_bbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_b AS DOUBLE) / md) + (((CAST(s_bal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_b AS DOUBLE) / md) * (CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) - (CAST(s_bbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_b AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md)) / ((CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) * (CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) - (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_al AS DOUBLE) / md))) * (CAST(s_bal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_b AS DOUBLE) / md)) END) / (md - 3)) END), 6) AS f_stat
FROM momd
UNION ALL
SELECT 'b_to_a' AS direction, m AS n_obs,
       ROUND((CASE WHEN (CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) > 0 THEN (CAST(s_aa AS DOUBLE) - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE) / md) - (CAST(s_aal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_a AS DOUBLE) / md) * (CAST(s_aal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_a AS DOUBLE) / md) / (CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) END), 6) AS rss_r,
       ROUND((CASE WHEN ((CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) * (CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) - (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md)) > 0 THEN (CAST(s_aa AS DOUBLE) - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE) / md) - ((((CAST(s_aal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_a AS DOUBLE) / md) * (CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) - (CAST(s_abl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_a AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md)) / ((CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) * (CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) - (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md))) * (CAST(s_aal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_a AS DOUBLE) / md) + (((CAST(s_abl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_a AS DOUBLE) / md) * (CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) - (CAST(s_aal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_a AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md)) / ((CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) * (CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) - (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md))) * (CAST(s_abl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_a AS DOUBLE) / md)) END), 6) AS rss_u,
       ROUND(CASE WHEN ((CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) * (CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) - (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md)) > 0 THEN (((CAST(s_abl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_a AS DOUBLE) / md) * (CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) - (CAST(s_aal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_a AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md)) / ((CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) * (CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) - (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md))) END, 6) AS cross_coef,
       ROUND((CASE WHEN m > 3 AND (CASE WHEN ((CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) * (CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) - (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md)) > 0 THEN (CAST(s_aa AS DOUBLE) - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE) / md) - ((((CAST(s_aal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_a AS DOUBLE) / md) * (CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) - (CAST(s_abl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_a AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md)) / ((CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) * (CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) - (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md))) * (CAST(s_aal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_a AS DOUBLE) / md) + (((CAST(s_abl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_a AS DOUBLE) / md) * (CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) - (CAST(s_aal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_a AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md)) / ((CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) * (CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) - (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md))) * (CAST(s_abl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_a AS DOUBLE) / md)) END) IS NOT NULL AND (CASE WHEN ((CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) * (CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) - (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md)) > 0 THEN (CAST(s_aa AS DOUBLE) - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE) / md) - ((((CAST(s_aal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_a AS DOUBLE) / md) * (CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) - (CAST(s_abl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_a AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md)) / ((CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) * (CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) - (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md))) * (CAST(s_aal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_a AS DOUBLE) / md) + (((CAST(s_abl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_a AS DOUBLE) / md) * (CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) - (CAST(s_aal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_a AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md)) / ((CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) * (CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) - (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md))) * (CAST(s_abl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_a AS DOUBLE) / md)) END) > 0 THEN ((CASE WHEN (CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) > 0 THEN (CAST(s_aa AS DOUBLE) - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE) / md) - (CAST(s_aal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_a AS DOUBLE) / md) * (CAST(s_aal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_a AS DOUBLE) / md) / (CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) END) - (CASE WHEN ((CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) * (CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) - (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md)) > 0 THEN (CAST(s_aa AS DOUBLE) - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE) / md) - ((((CAST(s_aal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_a AS DOUBLE) / md) * (CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) - (CAST(s_abl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_a AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md)) / ((CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) * (CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) - (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md))) * (CAST(s_aal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_a AS DOUBLE) / md) + (((CAST(s_abl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_a AS DOUBLE) / md) * (CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) - (CAST(s_aal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_a AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md)) / ((CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) * (CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) - (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md))) * (CAST(s_abl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_a AS DOUBLE) / md)) END)) / ((CASE WHEN ((CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) * (CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) - (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md)) > 0 THEN (CAST(s_aa AS DOUBLE) - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE) / md) - ((((CAST(s_aal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_a AS DOUBLE) / md) * (CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) - (CAST(s_abl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_a AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md)) / ((CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) * (CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) - (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md))) * (CAST(s_aal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_a AS DOUBLE) / md) + (((CAST(s_abl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_a AS DOUBLE) / md) * (CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) - (CAST(s_aal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_a AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md)) / ((CAST(s_alal AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_al AS DOUBLE) / md) * (CAST(s_blbl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) - (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md) * (CAST(s_albl AS DOUBLE) - CAST(s_al AS DOUBLE) * CAST(s_bl AS DOUBLE) / md))) * (CAST(s_abl AS DOUBLE) - CAST(s_bl AS DOUBLE) * CAST(s_a AS DOUBLE) / md)) END) / (md - 3)) END), 6) AS f_stat
FROM momd
"""



# Holt linear smoothing (lock-step with windows.holt_linear_daily:
# states on the exact 1e-9 long grid, round-half-away re-quantization
# per step via a recursive CTE, alpha=1/4 beta=1/8 exact binary
# fractions; init l0=y0, b0=y1-y0)
_HOLT_LINEAR_SQL = f"""
WITH RECURSIVE {_CONV_CTE},
daily AS (
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
           CAST(COUNT(*) AS BIGINT) AS y
    FROM conversations GROUP BY 1
),
idx AS (SELECT d, y, row_number() OVER (ORDER BY d) - 1 AS i FROM daily),
hw(i, lq, bq) AS (
    SELECT 0, y * 1000000000,
           COALESCE((SELECT y FROM idx WHERE i = 1) - y, 0) * 1000000000
    FROM idx WHERE i = 0
    UNION ALL
    SELECT x.i,
        CAST(ROUND((0.25 * CAST(x.y AS DOUBLE)
            + 0.75 * (CAST(h.lq AS DOUBLE) / 1e9 + CAST(h.bq AS DOUBLE) / 1e9)) * 1e9) AS BIGINT),
        CAST(ROUND((0.125 * (CAST(CAST(ROUND((0.25 * CAST(x.y AS DOUBLE)
            + 0.75 * (CAST(h.lq AS DOUBLE) / 1e9 + CAST(h.bq AS DOUBLE) / 1e9)) * 1e9) AS BIGINT) AS DOUBLE) / 1e9
            - CAST(h.lq AS DOUBLE) / 1e9)
            + 0.875 * CAST(h.bq AS DOUBLE) / 1e9) * 1e9) AS BIGINT)
    FROM hw h JOIN idx x ON x.i = h.i + 1
)
SELECT x.d, x.y AS n_turns,
       ROUND(CAST(c.lq AS DOUBLE) / 1e9, 6) AS level,
       ROUND(CAST(c.bq AS DOUBLE) / 1e9, 6) AS trend,
       CASE WHEN x.i = 0 THEN -1.0
            ELSE ROUND(CAST(p.lq AS DOUBLE) / 1e9 + CAST(p.bq AS DOUBLE) / 1e9, 6) END AS forecast,
       CASE WHEN x.i = 0 THEN 0.0
            ELSE ROUND(CAST(x.y AS DOUBLE)
                 - (CAST(p.lq AS DOUBLE) / 1e9 + CAST(p.bq AS DOUBLE) / 1e9), 6) END AS forecast_err
FROM idx x
JOIN hw c ON c.i = x.i
LEFT JOIN hw p ON p.i = x.i - 1
"""


# Kruskal-Wallis H (lock-step with abtest.kruskal_wallis: value
# histogram midranks, exact integer 2*midrank / 2*R_g / tie sums,
# identical double expression shapes)
_KRUSKAL_SQL = f"""
WITH {_CONV_CTE},
gv AS (
    SELECT CAST(length(text) AS BIGINT) AS v, role AS grp,
           CAST(COUNT(*) AS BIGINT) AS t_gv
    FROM conversations
    WHERE text IS NOT NULL AND role IS NOT NULL
    GROUP BY 1, 2
),
hist AS (SELECT v, CAST(SUM(t_gv) AS BIGINT) AS t FROM gv GROUP BY v),
ranked AS (
    SELECT v, t,
           CAST(COALESCE(SUM(t) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
    FROM hist
),
pg AS (
    SELECT grp, CAST(SUM(t_gv) AS BIGINT) AS n,
           SUM(CAST(t_gv AS HUGEINT) * (2 * CAST(cb AS HUGEINT) + t + 1)) AS two_r
    FROM gv JOIN ranked USING (v) GROUP BY grp
),
tot AS (
    SELECT CAST(SUM(t) AS BIGINT) AS n_total,
           SUM(CAST(t AS HUGEINT) * t * t - t) AS tie_term
    FROM ranked
),
kc AS (SELECT CAST(COUNT(*) AS BIGINT) AS k_groups FROM pg),
srr AS (
    SELECT SUM((CAST(two_r AS DOUBLE) / 2.0) * (CAST(two_r AS DOUBLE) / 2.0)
               / CAST(n AS DOUBLE)) AS s_rr
    FROM pg
),
stats AS (
    SELECT n_total, k_groups,
           ROUND(12.0 / (CAST(n_total AS DOUBLE) * (CAST(n_total AS DOUBLE) + 1.0)) * s_rr
                 - 3.0 * (CAST(n_total AS DOUBLE) + 1.0), 6) AS h_stat,
           ROUND(1.0 - CAST(tie_term AS DOUBLE)
                 / (CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE)
                    - CAST(n_total AS DOUBLE)), 6) AS tie_correction,
           ROUND(CASE WHEN (1.0 - CAST(tie_term AS DOUBLE)
                 / (CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE)
                    - CAST(n_total AS DOUBLE))) > 0
                 THEN (12.0 / (CAST(n_total AS DOUBLE) * (CAST(n_total AS DOUBLE) + 1.0)) * s_rr
                       - 3.0 * (CAST(n_total AS DOUBLE) + 1.0))
                      / (1.0 - CAST(tie_term AS DOUBLE)
                         / (CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE)
                            - CAST(n_total AS DOUBLE)))
                 ELSE 0.0 END, 6) AS h_corrected,
           CAST(k_groups - 1 AS BIGINT) AS dof
    FROM tot, kc, srr
)
SELECT g.grp, g.n,
       ROUND(CAST(g.two_r AS DOUBLE) / 2.0 / CAST(g.n AS DOUBLE), 6) AS mean_rank,
       s.n_total, s.k_groups, s.h_stat, s.tie_correction, s.h_corrected, s.dof
FROM pg g CROSS JOIN stats s
"""


# Gopher-style rule screen (lock-step with textstats.gopher_quality_flags:
# whitespace tokens of the normalized text, identical double ratio
# expressions, flag product for the all-rules pass)
_GOPHER_SQL = f"""
WITH base AS (
    SELECT source,
           len({_TOKS}) AS nw,
           length(replace({_NORM}, ' ', '')) * 1.0
               / greatest(len({_TOKS}), 1) AS mean_wlen,
           length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) * 1.0
               / greatest(length(text), 1) AS punct_ratio,
           len(list_filter({_TOKS}, t -> regexp_matches(t, '[a-z]'))) * 1.0
               / greatest(len({_TOKS}), 1) AS alpha_ratio,
           1.0 - len(list_distinct({_TOKS})) * 1.0
               / greatest(len({_TOKS}), 1) AS dup_ratio
    FROM documents
),
flags AS (
    SELECT source,
           CASE WHEN nw BETWEEN 20 AND 100000 THEN 1 ELSE 0 END AS f_words,
           CASE WHEN mean_wlen >= 3.0 AND mean_wlen <= 10.0 THEN 1 ELSE 0 END AS f_wlen,
           CASE WHEN punct_ratio <= 0.2 THEN 1 ELSE 0 END AS f_punct,
           CASE WHEN alpha_ratio >= 0.8 THEN 1 ELSE 0 END AS f_alpha,
           CASE WHEN dup_ratio <= 0.6 THEN 1 ELSE 0 END AS f_dup
    FROM base
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(f_words) AS BIGINT) AS pass_word_count,
       CAST(SUM(f_wlen) AS BIGINT) AS pass_mean_word_len,
       CAST(SUM(f_punct) AS BIGINT) AS pass_punct_ratio,
       CAST(SUM(f_alpha) AS BIGINT) AS pass_alpha_words,
       CAST(SUM(f_dup) AS BIGINT) AS pass_dup_words,
       CAST(SUM(f_words * f_wlen * f_punct * f_alpha * f_dup) AS BIGINT) AS pass_all,
       ROUND(SUM(f_words * f_wlen * f_punct * f_alpha * f_dup) * 1.0
             / COUNT(*), 6) AS pass_all_share
FROM flags
GROUP BY source
ORDER BY source
"""


# Circular hour-of-day stats (lock-step with rhythm.circadian_profile:
# integer hour/minute/second folded to fractional hours, identical
# double literals for the 2*pi/24 phase factor and its inverse)
_CIRCADIAN_SQL = f"""
WITH {_CONV_CTE},
agg AS (
    SELECT role,
           CAST(COUNT(*) AS BIGINT) AS n,
           SUM(sin((hour(ts) + minute(ts) / 60.0 + second(ts) / 3600.0)
                   * 0.2617993877991494)) AS s_sin,
           SUM(cos((hour(ts) + minute(ts) / 60.0 + second(ts) / 3600.0)
                   * 0.2617993877991494)) AS s_cos
    FROM conversations
    WHERE role IS NOT NULL
    GROUP BY role
)
SELECT role, n,
       ROUND(fmod(fmod(atan2(s_sin, s_cos) * 3.8197186342054885, 24.0)
                  + 24.0, 24.0), 6) AS mean_hour,
       ROUND(sqrt(s_sin * s_sin + s_cos * s_cos) / n, 6) AS resultant_r,
       ROUND(sqrt(-2.0 * ln(greatest(
           sqrt(s_sin * s_sin + s_cos * s_cos) / n, 1e-300))), 6) AS circ_std
FROM agg
ORDER BY role
"""


def _markov_sql(n_iter: int = 40, grid: int = 1_000_000_000) -> str:
    """Unrolled integer-grid power iteration (lock-step with
    lags.markov_stationary: the same two-pass state restriction,
    half-away quantization via (2x+d)//(2d), HUGEINT products so
    every step is exact integer arithmetic — bit-identical to the
    driver replay)."""
    steps = []
    for i in range(1, n_iter + 1):
        steps.append(
            f"s{i} AS MATERIALIZED (\n"
            f"    SELECT t.t AS state,\n"
            f"           (2 * SUM(CAST(p.s AS HUGEINT) * t.pcq) + {grid})\n"
            f"               // (2 * CAST({grid} AS HUGEINT)) AS s\n"
            f"    FROM s{i - 1} p JOIN trans t ON t.f = p.state\n"
            f"    GROUP BY 1\n"
            f")"
        )
    return f"""
WITH {_CONV_CTE},
pairs AS (
    SELECT lag(role) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx) AS f,
           role AS t
    FROM conversations
),
cnt AS (
    SELECT f, t, CAST(COUNT(*) AS BIGINT) AS n
    FROM pairs WHERE f IS NOT NULL GROUP BY 1, 2
),
froms1 AS (SELECT DISTINCT f FROM cnt),
kept1 AS (SELECT c.f, c.t, c.n FROM cnt c JOIN froms1 x ON c.t = x.f),
outn AS MATERIALIZED (SELECT f, SUM(n) AS n_out FROM kept1 GROUP BY f),
trans AS MATERIALIZED (
    SELECT k.f, k.t,
           (2 * CAST(k.n AS HUGEINT) * {grid} + o.n_out)
               // (2 * CAST(o.n_out AS HUGEINT)) AS pcq
    FROM kept1 k
    JOIN outn o ON k.f = o.f
    JOIN outn o2 ON k.t = o2.f
),
s0 AS (
    SELECT f AS state,
           (2 * CAST({grid} AS HUGEINT) + (SELECT COUNT(*) FROM outn))
               // (2 * (SELECT COUNT(*) FROM outn)) AS s
    FROM outn
),
{",".join(steps)}
SELECT o.f AS state,
       CAST(o.n_out AS BIGINT) AS n_out,
       CAST(COALESCE(fin.s, 0) AS BIGINT) AS mass_q,
       CAST((2 * CAST(COALESCE(fin.s, 0) AS HUGEINT) * 1000000 + tot.t)
            // (2 * tot.t) AS DOUBLE) / 1e6 AS pi
FROM outn o
LEFT JOIN s{n_iter} fin ON fin.state = o.f,
     (SELECT SUM(s) AS t FROM s{n_iter}) tot
ORDER BY state
"""


# Bayesian two-arm binary (lock-step with abtest.bayes_ab_binary:
# Cook's finite sum with lgamma-integer beta functions; posterior
# means on the exact 1e-6 integer grid; succ = conv ever errored)
_BAYES_AB_SQL = f"""
WITH {_CONV_CTE},
perconv AS (
    SELECT conv_id,
           MAX(CASE WHEN tool = 'error' THEN 1 ELSE 0 END) AS succ
    FROM conversations GROUP BY conv_id
),
units AS (
    SELECT CASE WHEN ({_H48.format(x="concat('ab', conv_id)")}) % 2 = 0
                THEN 'a' ELSE 'b' END AS arm,
           succ
    FROM perconv
),
counts AS (
    SELECT CAST(COUNT(CASE WHEN arm = 'a' THEN 1 END) AS BIGINT) AS n_a,
           CAST(COUNT(CASE WHEN arm = 'b' THEN 1 END) AS BIGINT) AS n_b,
           CAST(SUM(CASE WHEN arm = 'a' THEN succ ELSE 0 END) AS BIGINT) AS s_a,
           CAST(SUM(CASE WHEN arm = 'b' THEN succ ELSE 0 END) AS BIGINT) AS s_b
    FROM units
),
params AS (
    SELECT n_a, s_a, n_b, s_b,
           s_a + 1 AS aa, n_a - s_a + 1 AS ba,
           s_b + 1 AS ab2, n_b - s_b + 1 AS bb
    FROM counts
),
prob AS (
    SELECT SUM(exp(
        (lgamma(p.aa + g.i) + lgamma(p.ba + p.bb)
             - lgamma(p.aa + g.i + p.ba + p.bb))
        - ln(p.bb + g.i)
        - (lgamma(1 + g.i) + lgamma(p.bb) - lgamma(1 + g.i + p.bb))
        - (lgamma(p.aa) + lgamma(p.ba) - lgamma(p.aa + p.ba))
    )) AS pr
    FROM params p, generate_series(0, 1000000) g(i)
    WHERE g.i < p.ab2
)
SELECT p.n_a, p.s_a, p.n_b, p.s_b,
       CAST((2 * CAST(p.aa AS HUGEINT) * 1000000 + (p.aa + p.ba))
            // (2 * (p.aa + p.ba)) AS DOUBLE) / 1e6 AS post_mean_a,
       CAST((2 * CAST(p.ab2 AS HUGEINT) * 1000000 + (p.ab2 + p.bb))
            // (2 * (p.ab2 + p.bb)) AS DOUBLE) / 1e6 AS post_mean_b,
       ROUND(prob.pr, 6) AS prob_b_beats_a
FROM params p, prob
"""


# Seeded-Laplace DP counts (lock-step with privacy.dp_noisy_counts:
# u = stable_hash48('dp:' || grp)/2^48, inverse-CDF deviate, clamp 0)
_DP_ROLE_SQL = f"""
WITH {_CONV_CTE},
cnt AS (
    SELECT role AS grp, CAST(COUNT(*) AS BIGINT) AS n
    FROM conversations WHERE role IS NOT NULL GROUP BY role
),
noise AS (
    SELECT grp, n,
           ({_H48.format(x="concat('dp', ':', CAST(grp AS VARCHAR))")})
               / 281474976710656.0 AS u
    FROM cnt
)
SELECT grp AS role,
       ROUND(greatest(
           CAST(n AS DOUBLE)
           + (-1.0 * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5))),
           0.0), 6) AS noisy_count,
       1.0 AS epsilon
FROM noise
ORDER BY role
"""


def _kcore_sql(k: int = 3, rounds: int = 16) -> str:
    """Unrolled degree-peel rounds (lock-step with components.k_core:
    symmetrized simple graph, drop-below-k per round; extra rounds
    past the fixpoint are no-ops, so a generous unroll is safe)."""
    steps = []
    for i in range(1, rounds + 1):
        steps.append(
            f"e{i} AS MATERIALIZED (\n"
            f"    SELECT e.u, e.v FROM e{i - 1} e\n"
            f"    JOIN (SELECT u FROM e{i - 1} GROUP BY u\n"
            f"          HAVING COUNT(*) >= {k}) du USING (u)\n"
            f"    JOIN (SELECT u AS v FROM e{i - 1} GROUP BY u\n"
            f"          HAVING COUNT(*) >= {k}) dv USING (v)\n"
            f")"
        )
    return f"""
WITH e0 AS MATERIALIZED (
    SELECT u, v FROM (
        SELECT concat('c', o_custkey) AS u, concat('s', l_suppkey) AS v
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        UNION
        SELECT concat('s', l_suppkey) AS u, concat('c', o_custkey) AS v
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ) WHERE u <> v
),
{",".join(steps)}
SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS core_degree
FROM e{rounds}
GROUP BY u
ORDER BY node
"""


# Brown–Forsythe (lock-step with abtest.brown_forsythe: quantile_cont
# == Spark exact percentile; identical double algebra for the F)
_LEVENE_SQL = f"""
WITH {_CONV_CTE},
vals AS (
    SELECT role AS g, CAST(length(text) AS DOUBLE) AS v
    FROM conversations
    WHERE text IS NOT NULL AND role IS NOT NULL
),
meds AS (SELECT g, quantile_cont(v, 0.5) AS med FROM vals GROUP BY g),
mom AS (
    SELECT v.g, CAST(COUNT(*) AS BIGINT) AS n,
           SUM(abs(v.v - m.med)) AS s1,
           SUM(abs(v.v - m.med) * abs(v.v - m.med)) AS s2
    FROM vals v JOIN meds m ON v.g = m.g
    GROUP BY v.g
),
tot AS (
    SELECT CAST(SUM(n) AS BIGINT) AS n_total,
           CAST(COUNT(*) AS BIGINT) AS k_groups,
           SUM(s1) AS t1,
           SUM(s2 - s1 * s1 / n) AS ssw,
           SUM(s1 * s1 / n) AS szb
    FROM mom
)
SELECT m.g AS grp, m.n,
       ROUND(m.s1 / m.n, 6) AS mean_abs_dev,
       t.n_total, t.k_groups,
       CAST(t.k_groups - 1 AS BIGINT) AS df1,
       CAST(t.n_total - t.k_groups AS BIGINT) AS df2,
       ROUND(CASE WHEN t.ssw > 0 AND t.k_groups - 1 > 0
                       AND t.n_total - t.k_groups > 0
                  THEN ((t.szb - t.t1 * t.t1 / t.n_total)
                            / (t.k_groups - 1))
                       / (t.ssw / (t.n_total - t.k_groups)) END, 6) AS f_stat
FROM mom m CROSS JOIN tot t
ORDER BY grp
"""


# Cochran–Armitage (lock-step with abtest.cochran_armitage: identical
# per-score conditional agg + scalar trend algebra; week scores
# anchored at 2024-01-01)
_TREND_ERROR_SQL = f"""
WITH {_CONV_CTE},
scored AS (
    SELECT CAST(floor(date_diff('day', DATE '2024-01-01', ts) / 7) AS DOUBLE) AS w,
           CAST(CASE WHEN tool = 'error' THEN 1 ELSE 0 END AS BIGINT) AS s
    FROM conversations
),
per AS (
    SELECT w, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(s) AS BIGINT) AS succ
    FROM scored WHERE w IS NOT NULL GROUP BY w
),
tot AS (
    SELECT CAST(SUM(n) AS BIGINT) AS n_total,
           CAST(SUM(succ) AS BIGINT) AS s_total,
           SUM(CAST(n AS DOUBLE) * w) AS nw,
           SUM(CAST(n AS DOUBLE) * w * w) AS nww,
           SUM(CAST(succ AS DOUBLE) * w) AS sw
    FROM per
)
SELECT p.w AS score, p.n, p.succ,
       ROUND(CAST(p.succ AS DOUBLE) / CAST(p.n AS DOUBLE), 6) AS rate,
       t.n_total, t.s_total,
       ROUND(t.sw - (CAST(t.s_total AS DOUBLE) / t.n_total) * t.nw, 6) AS t_stat,
       ROUND((CAST(t.s_total AS DOUBLE) / t.n_total)
             * (1.0 - CAST(t.s_total AS DOUBLE) / t.n_total)
             * (t.nww - t.nw * t.nw / t.n_total), 6) AS var_t,
       ROUND(CASE WHEN (CAST(t.s_total AS DOUBLE) / t.n_total)
                       * (1.0 - CAST(t.s_total AS DOUBLE) / t.n_total)
                       * (t.nww - t.nw * t.nw / t.n_total) > 0
                  THEN (t.sw - (CAST(t.s_total AS DOUBLE) / t.n_total) * t.nw)
                       / sqrt((CAST(t.s_total AS DOUBLE) / t.n_total)
                              * (1.0 - CAST(t.s_total AS DOUBLE) / t.n_total)
                              * (t.nww - t.nw * t.nw / t.n_total))
                  ELSE 0.0 END, 6) AS z_trend
FROM per p CROSS JOIN tot t
ORDER BY score
"""


# Page–Hinkley (lock-step with windows.page_hinkley_daily: share and
# running mean on the exact 1e9 integer grid, half-away divisions as
# (2x+d)//(2d); lam=0.02 -> 20,000,000 on the grid)
_PAGE_HINKLEY_SQL = f"""
WITH {_CONV_CTE},
daily AS (
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
           CAST(COUNT(*) AS BIGINT) AS n_turns
    FROM conversations WHERE ts IS NOT NULL GROUP BY 1
),
tot AS (SELECT SUM(n_turns) AS t FROM daily),
sq AS (
    SELECT d, n_turns,
           (2 * CAST(n_turns AS HUGEINT) * 1000000000 + t.t)
               // (2 * CAST(t.t AS HUGEINT)) AS sq
    FROM daily, tot t
),
cm AS (
    SELECT d, n_turns, sq,
           row_number() OVER (ORDER BY d) AS t,
           SUM(sq) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS cum
    FROM sq
),
dev AS (
    SELECT d, n_turns,
           sq - ((2 * cum + t) // (2 * CAST(t AS HUGEINT))) AS dv
    FROM cm
),
m AS (
    SELECT d, n_turns,
           SUM(dv) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS mm
    FROM dev
),
ph AS (
    SELECT d, n_turns,
           mm - MIN(mm) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS phq
    FROM m
)
SELECT d, n_turns,
       CAST((2 * phq * 1000000 + 1000000000)
            // (2 * CAST(1000000000 AS HUGEINT)) AS DOUBLE) / 1e6 AS ph,
       CAST(CASE WHEN phq > 20000000 THEN 1 ELSE 0 END AS INT) AS alarm_flag
FROM ph
ORDER BY d
"""


# Bloom-filter audit (lock-step with sketches.bloom_filter_audit:
# k independent md5 slot hashes, 32-bit word packing, identical
# fill/pow/ratio algebra; probes = 'probe:0'..'probe:4999')
_BLOOM_SQL = f"""
WITH {_CONV_CTE},
keys AS (SELECT DISTINCT conv_id AS k FROM conversations),
kpos AS (
    SELECT ({_H48.format(x="concat(k, '#', CAST(g.i AS VARCHAR))")}) % 4096 AS idx
    FROM keys, generate_series(0, 2) g(i)
),
words AS (
    SELECT idx // 32 AS word,
           bit_or(CAST(1 AS BIGINT) << CAST(idx % 32 AS INTEGER)) AS bits
    FROM kpos GROUP BY 1
),
kstats AS (
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM keys) AS n_keys,
           (SELECT CAST(SUM(bit_count(bits)) AS BIGINT) FROM words) AS bits_set
),
probes AS (
    SELECT concat('probe:', CAST(g.i AS VARCHAR)) AS p
    FROM generate_series(0, 4999) g(i)
),
ppos AS (
    SELECT p,
           ({_H48.format(x="concat(p, '#', CAST(g2.i AS VARCHAR))")}) % 4096 AS idx
    FROM probes, generate_series(0, 2) g2(i)
),
hits AS (
    SELECT p,
           MIN(CAST((COALESCE(w.bits, 0) >> CAST(idx % 32 AS INTEGER)) & 1 AS INT)) AS pass
    FROM ppos LEFT JOIN words w ON w.word = idx // 32
    GROUP BY p
),
pstats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
           CAST(SUM(pass) AS BIGINT) AS n_false_pos
    FROM hits
)
SELECT k.n_keys,
       CAST(4096 AS BIGINT) AS m_bits,
       CAST(3 AS BIGINT) AS k_hashes,
       k.bits_set,
       ROUND(k.bits_set / 4096.0, 6) AS fill_ratio,
       ROUND(pow(k.bits_set / 4096.0, 3.0), 6) AS predicted_fpp,
       p.n_probes, p.n_false_pos,
       ROUND(p.n_false_pos * 1.0 / p.n_probes, 6) AS measured_fpp
FROM kstats k, pstats p
"""


# Overdispersion (lock-step with association.dispersion_test:
# identical co-moment variance algebra; ISO dow = weekday(d)+1 =
# isodow(d), the activity_clock convention)
_DISPERSION_SQL = f"""
WITH {_CONV_CTE},
cd AS (
    SELECT conv_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM conversations GROUP BY 1, 2
),
vals AS (
    SELECT CAST(isodow(d) AS INTEGER) AS grp, CAST(c AS DOUBLE) AS v
    FROM cd
),
agg AS (
    SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
           SUM(v) AS s1, SUM(v * v) AS s2
    FROM vals GROUP BY grp
)
SELECT grp, n,
       ROUND(s1 / n, 6) AS mean,
       ROUND(CASE WHEN n > 1 THEN (s2 - s1 * s1 / n) / (n - 1.0) END, 6) AS variance,
       ROUND(CASE WHEN s1 / n > 0 THEN
             (CASE WHEN n > 1 THEN (s2 - s1 * s1 / n) / (n - 1.0) END) / (s1 / n)
             END, 6) AS vmr,
       ROUND((n - 1.0) * (CASE WHEN s1 / n > 0 THEN
             (CASE WHEN n > 1 THEN (s2 - s1 * s1 / n) / (n - 1.0) END) / (s1 / n)
             END), 6) AS chi2_stat,
       CASE WHEN (CASE WHEN s1 / n > 0 THEN
             (CASE WHEN n > 1 THEN (s2 - s1 * s1 / n) / (n - 1.0) END) / (s1 / n)
             END) > 1.5 THEN 1 ELSE 0 END AS overdispersed_flag
FROM agg
ORDER BY grp
"""


# Simpson screen (lock-step with association.simpsons_paradox_screen:
# per-stratum 4-count conditional agg, rounded-diff signs, pooled
# rollup, opposing-strata count, all-opposing reversal flag)
_SIMPSONS_SQL = f"""
WITH {_CONV_CTE},
base AS (
    SELECT CASE WHEN ({_H48.format(x="concat('ab', conv_id)")}) % 2 = 0
                THEN 'a' ELSE 'b' END AS g,
           CAST(CASE WHEN tool = 'error' THEN 1 ELSE 0 END AS BIGINT) AS y,
           CAST(role AS VARCHAR) AS s
    FROM conversations
    WHERE role IS NOT NULL
),
per AS (
    SELECT s AS stratum,
           CAST(COUNT(CASE WHEN g = 'a' THEN 1 END) AS BIGINT) AS n_a,
           CAST(SUM(CASE WHEN g = 'a' THEN y ELSE 0 END) AS BIGINT) AS s_a,
           CAST(COUNT(CASE WHEN g = 'b' THEN 1 END) AS BIGINT) AS n_b,
           CAST(SUM(CASE WHEN g = 'b' THEN y ELSE 0 END) AS BIGINT) AS s_b
    FROM base GROUP BY s
),
rated AS (
    SELECT stratum, n_a, s_a, n_b, s_b,
           ROUND(CASE WHEN n_a > 0 THEN s_a / CAST(n_a AS DOUBLE) ELSE 0.0 END, 6) AS rate_a,
           ROUND(CASE WHEN n_b > 0 THEN s_b / CAST(n_b AS DOUBLE) ELSE 0.0 END, 6) AS rate_b,
           ROUND((CASE WHEN n_b > 0 THEN s_b / CAST(n_b AS DOUBLE) ELSE 0.0 END)
                 - (CASE WHEN n_a > 0 THEN s_a / CAST(n_a AS DOUBLE) ELSE 0.0 END), 6) AS diff
    FROM per
),
signed AS (SELECT *, sign(diff) AS sgn FROM rated),
pooled AS (
    SELECT ROUND((CASE WHEN SUM(n_b) > 0 THEN SUM(s_b) / CAST(SUM(n_b) AS DOUBLE) ELSE 0.0 END)
                 - (CASE WHEN SUM(n_a) > 0 THEN SUM(s_a) / CAST(SUM(n_a) AS DOUBLE) ELSE 0.0 END),
                 6) AS pooled_diff
    FROM per
),
psigned AS (SELECT pooled_diff, sign(pooled_diff) AS psgn FROM pooled),
flags AS (
    SELECT CAST(SUM(CASE WHEN s.sgn * p.psgn < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_opposing_strata,
           CAST(SUM(CASE WHEN s.sgn <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_signed_strata
    FROM signed s CROSS JOIN psigned p
)
SELECT s.stratum, s.n_a, s.s_a, s.n_b, s.s_b, s.rate_a, s.rate_b, s.diff,
       p.pooled_diff,
       f.n_opposing_strata,
       CAST(CASE WHEN p.psgn <> 0 AND f.n_signed_strata > 0
                      AND f.n_opposing_strata = f.n_signed_strata
                 THEN 1 ELSE 0 END AS INT) AS paradox_flag
FROM signed s CROSS JOIN psigned p CROSS JOIN flags f
ORDER BY s.stratum
"""


def _holt_winters_sql(
    alpha: str = "0.25", beta: str = "0.125", gamma: str = "0.25", m: int = 7
) -> str:
    """Holt–Winters additive oracle (lock-step with
    windows.holt_winters_daily): the Holt recursive-CTE device with
    the m seasonal states carried as a LIST through the recursion;
    every state re-quantized to the 1e-9 grid per step (sign-aware
    half-away), output 6-dp rounded on the grid."""

    def Q(v: str) -> str:
        # round-half-away x -> 1e-9-grid BIGINT (the applyInPandas q())
        return (
            f"(CASE WHEN ({v}) >= 0 THEN CAST(floor(({v}) * 1e9 + 0.5) AS BIGINT)"
            f" ELSE -CAST(floor(-({v}) * 1e9 + 0.5) AS BIGINT) END)"
        )

    def Q6(xq: str) -> str:
        # 6-dp half-away of a grid integer, exact integer math
        return (
            f"(CASE WHEN ({xq}) >= 0 THEN "
            f"CAST((2 * CAST(({xq}) AS HUGEINT) * 1000000 + 1000000000)"
            f" // 2000000000 AS DOUBLE) / 1e6 ELSE "
            f"-(CAST((2 * CAST(-({xq}) AS HUGEINT) * 1000000 + 1000000000)"
            f" // 2000000000 AS DOUBLE) / 1e6) END)"
        )

    # recursion-step expressions (identical float shapes to the Python)
    l_prev = "CAST(h.lq AS DOUBLE) / 1e9"
    b_prev = "CAST(h.bq AS DOUBLE) / 1e9"
    s_old = "CAST(h.seas[1] AS DOUBLE) / 1e9"
    l_new_q = Q(
        f"{alpha} * (CAST(x.y AS DOUBLE) - {s_old})"
        f" + (1.0 - {alpha}) * ({l_prev} + {b_prev})"
    )
    l_new = f"CAST({l_new_q} AS DOUBLE) / 1e9"
    b_new_q = Q(
        f"{beta} * ({l_new} - {l_prev}) + (1.0 - {beta}) * {b_prev}"
    )
    s_new_q = Q(
        f"{gamma} * (CAST(x.y AS DOUBLE) - {l_new}) + (1.0 - {gamma}) * {s_old}"
    )
    # forecast from the PREVIOUS state row p (state after step i-1)
    fc = (
        "CAST(p.lq AS DOUBLE) / 1e9 + CAST(p.bq AS DOUBLE) / 1e9"
        " + CAST(p.seas[1] AS DOUBLE) / 1e9"
    )
    return f"""
WITH RECURSIVE {_CONV_CTE},
daily AS (
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
           CAST(COUNT(*) AS BIGINT) AS y
    FROM conversations GROUP BY 1
),
idx AS (SELECT d, y, row_number() OVER (ORDER BY d) - 1 AS i FROM daily),
sums AS (
    SELECT (SELECT SUM(y) FROM idx WHERE i < {m}) AS s1,
           (SELECT SUM(y) FROM idx WHERE i >= {m} AND i < {2 * m}) AS s2
),
init AS (
    SELECT (2 * s1 * 1000000000 + {m}) // (2 * {m}) AS lq0,
           (CASE WHEN s2 - s1 >= 0
                 THEN (2 * (s2 - s1) * 1000000000 + {m * m}) // (2 * {m * m})
                 ELSE -((2 * (s1 - s2) * 1000000000 + {m * m}) // (2 * {m * m}))
            END) AS bq0
    FROM sums
),
seas0 AS (
    SELECT list(x.y * 1000000000 - init.lq0 ORDER BY x.i) AS s
    FROM idx x, init WHERE x.i < {m}
),
hw(i, lq, bq, seas) AS (
    SELECT {m - 1}, init.lq0, init.bq0, seas0.s FROM init, seas0
    UNION ALL
    SELECT x.i,
           {l_new_q},
           {b_new_q},
           h.seas[2:{m}] || [{s_new_q}]
    FROM hw h JOIN idx x ON x.i = h.i + 1
)
SELECT x.d, x.y AS n_turns,
       CASE WHEN x.i < {m} THEN {Q6("init.lq0")}
            ELSE {Q6("c.lq")} END AS level,
       CASE WHEN x.i < {m} THEN {Q6("init.bq0")}
            ELSE {Q6("c.bq")} END AS trend,
       CASE WHEN x.i < {m} THEN {Q6("x.y * 1000000000 - init.lq0")}
            ELSE {Q6(f"c.seas[{m}]")} END AS seasonal,
       CASE WHEN x.i < {m} THEN -1.0
            ELSE {Q6(Q(fc))} END AS forecast,
       CASE WHEN x.i < {m} THEN 0.0
            ELSE {Q6(Q(f"CAST(x.y AS DOUBLE) - ({fc})"))} END AS forecast_err
FROM idx x
CROSS JOIN init
LEFT JOIN hw c ON c.i = x.i AND x.i >= {m}
LEFT JOIN hw p ON p.i = x.i - 1 AND x.i >= {m}
WHERE (SELECT COUNT(*) FROM idx) >= {2 * m}
ORDER BY x.d
"""


# Theil T (lock-step with rhythm.theil_index: one-pass algebraic
# form over per-conv counts; x>0 guard on the x·ln x term)
_THEIL_SQL = f"""
WITH {_CONV_CTE},
counts AS (
    SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_turns
    FROM conversations GROUP BY conv_id
),
agg AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           SUM(CAST(n_turns AS DOUBLE)) AS s1,
           SUM(CASE WHEN n_turns > 0
                    THEN CAST(n_turns AS DOUBLE) * ln(CAST(n_turns AS DOUBLE))
                    ELSE 0.0 END) AS sxlx
    FROM counts
)
SELECT n,
       ROUND(s1 / n, 6) AS mean,
       ROUND(CASE WHEN n > 0 AND s1 / n > 0
                  THEN sxlx / (n * (s1 / n)) - ln(s1 / n) END, 6) AS theil_t,
       ROUND(CASE WHEN n > 1
                  THEN (CASE WHEN n > 0 AND s1 / n > 0
                             THEN sxlx / (n * (s1 / n)) - ln(s1 / n) END)
                       / ln(CAST(n AS DOUBLE))
                  ELSE 0.0 END, 6) AS theil_norm
FROM agg
"""


# HHI (lock-step with rhythm.hhi_concentration)
_HHI_SQL = """
WITH per AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS c
    FROM documents WHERE source IS NOT NULL GROUP BY source
),
tot AS (
    SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           SUM(CAST(c AS DOUBLE) * CAST(c AS DOUBLE)) AS ss
    FROM per
)
SELECT n_rows, n_groups,
       ROUND(ss / (CAST(n_rows AS DOUBLE) * CAST(n_rows AS DOUBLE)), 6) AS hhi,
       ROUND(1.0 / (ss / (CAST(n_rows AS DOUBLE) * CAST(n_rows AS DOUBLE))), 6)
           AS effective_groups
FROM tot
"""


def _yuen_sql(trim: float = 0.2) -> str:
    """Yuen trimmed test oracle (lock-step with abtest.yuen_trimmed_test:
    quantile_cont boundaries, identical winsorized-moment and
    Welch–Satterthwaite double algebra, portable-CDF p-value)."""
    from kkbox_churn_prediction_spark.functions.stats import two_sided_p_sql

    def d(side: str) -> str:
        n = f"CAST(n_{side} AS DOUBLE)"
        h = f"CAST(h_{side} AS DOUBLE)"
        var_w = (
            f"(CASE WHEN n_{side} > 1 THEN "
            f"(sww_{side} - sw_{side} * sw_{side} / {n}) / ({n} - 1.0) END)"
        )
        return (
            f"(CASE WHEN h_{side} > 1 THEN {var_w} * ({n} - 1.0)"
            f" / ({h} * ({h} - 1.0)) END)"
        )

    d_a, d_b = d("a"), d("b")
    m_a = "st_a / CAST(h_a AS DOUBLE)"
    m_b = "st_b / CAST(h_b AS DOUBLE)"
    t = (
        f"(CASE WHEN ({d_a} + {d_b}) > 0 THEN"
        f" ({m_a} - {m_b}) / sqrt({d_a} + {d_b}) END)"
    )
    dof = (
        f"(CASE WHEN ({d_a} > 0 OR {d_b} > 0) THEN"
        f" ({d_a} + {d_b}) * ({d_a} + {d_b})"
        f" / ({d_a} * {d_a} / greatest(CAST(h_a AS DOUBLE) - 1.0, 1.0)"
        f"  + {d_b} * {d_b} / greatest(CAST(h_b AS DOUBLE) - 1.0, 1.0)) END)"
    )
    return f"""
WITH {_CONV_CTE},
vals AS (
    SELECT CASE WHEN ({_H48.format(x="concat('ab', conv_id)")}) % 2 = 0
                THEN 'a' ELSE 'b' END AS g,
           CAST(length(text) AS DOUBLE) AS v
    FROM conversations
    WHERE text IS NOT NULL
),
qs AS (
    SELECT g, quantile_cont(v, {trim}) AS qlo,
           quantile_cont(v, {1.0 - trim}) AS qhi
    FROM vals GROUP BY g
),
mom AS (
    SELECT v.g,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN v.v >= q.qlo AND v.v <= q.qhi THEN 1 ELSE 0 END) AS BIGINT) AS h,
           SUM(CASE WHEN v.v >= q.qlo AND v.v <= q.qhi THEN v.v ELSE 0.0 END) AS st,
           SUM(greatest(least(v.v, q.qhi), q.qlo)) AS sw,
           SUM(greatest(least(v.v, q.qhi), q.qlo)
               * greatest(least(v.v, q.qhi), q.qlo)) AS sww
    FROM vals v JOIN qs q ON v.g = q.g
    GROUP BY v.g
),
one AS (
    SELECT MAX(CASE WHEN g = 'a' THEN n END) AS n_a,
           MAX(CASE WHEN g = 'a' THEN h END) AS h_a,
           MAX(CASE WHEN g = 'a' THEN st END) AS st_a,
           MAX(CASE WHEN g = 'a' THEN sw END) AS sw_a,
           MAX(CASE WHEN g = 'a' THEN sww END) AS sww_a,
           MAX(CASE WHEN g = 'b' THEN n END) AS n_b,
           MAX(CASE WHEN g = 'b' THEN h END) AS h_b,
           MAX(CASE WHEN g = 'b' THEN st END) AS st_b,
           MAX(CASE WHEN g = 'b' THEN sw END) AS sw_b,
           MAX(CASE WHEN g = 'b' THEN sww END) AS sww_b
    FROM mom
)
SELECT n_a, h_a, n_b, h_b,
       ROUND({m_a}, 6) AS mean_trim_a,
       ROUND({m_b}, 6) AS mean_trim_b,
       ROUND({t}, 6) AS t_stat,
       ROUND({dof}, 6) AS dof,
       ROUND({two_sided_p_sql(f"ROUND({t}, 6)")}, 6) AS p_normal
FROM one
"""


def _spiegelhalter_sql() -> str:
    """Spiegelhalter Z oracle (lock-step with
    calibration.spiegelhalter_z over the shared _PRED_CTE)."""
    from kkbox_churn_prediction_spark.functions.stats import two_sided_p_sql

    z = "(CASE WHEN var > 0 THEN num / sqrt(var) END)"
    return f"""
WITH {_PRED_CTE}
, agg AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           SUM((y - p) * (1.0 - 2.0 * p)) AS num,
           SUM((1.0 - 2.0 * p) * (1.0 - 2.0 * p) * p * (1.0 - p)) AS var
    FROM preds WHERE y IS NOT NULL AND p IS NOT NULL
)
SELECT n,
       ROUND(num, 6) AS sum_resid,
       ROUND({z}, 6) AS z_stat,
       ROUND({two_sided_p_sql(f"ROUND({z}, 6)")}, 6) AS p_two
FROM agg
"""


# direct standardization (lock-step with abtest.standardized_rates:
# per-stratum 4-counts, arm-A weights, pooled-B small-cell fallback)
_STANDARDIZED_SQL = f"""
WITH {_CONV_CTE},
base AS (
    SELECT CASE WHEN ({_H48.format(x="concat('ab', conv_id)")}) % 2 = 0
                THEN 'a' ELSE 'b' END AS g,
           CAST(CASE WHEN tool = 'error' THEN 1 ELSE 0 END AS BIGINT) AS y,
           CAST(role AS VARCHAR) AS s
    FROM conversations
    WHERE role IS NOT NULL
),
per AS (
    SELECT s,
           CAST(COUNT(CASE WHEN g = 'a' THEN 1 END) AS BIGINT) AS n_a,
           CAST(SUM(CASE WHEN g = 'a' THEN y ELSE 0 END) AS BIGINT) AS s_a,
           CAST(COUNT(CASE WHEN g = 'b' THEN 1 END) AS BIGINT) AS n_b,
           CAST(SUM(CASE WHEN g = 'b' THEN y ELSE 0 END) AS BIGINT) AS s_b
    FROM base GROUP BY s
),
tot AS (
    SELECT CAST(SUM(n_a) AS BIGINT) AS t_na, CAST(SUM(s_a) AS BIGINT) AS t_sa,
           CAST(SUM(n_b) AS BIGINT) AS t_nb, CAST(SUM(s_b) AS BIGINT) AS t_sb
    FROM per
),
std AS (
    SELECT SUM((CAST(p.n_a AS DOUBLE) / CAST(t.t_na AS DOUBLE))
               * (CASE WHEN p.n_b > 0 THEN p.s_b / CAST(p.n_b AS DOUBLE)
                       ELSE (CASE WHEN t.t_nb > 0
                                  THEN t.t_sb / CAST(t.t_nb AS DOUBLE)
                                  ELSE 0.0 END) END)) AS rate_b_std,
           MAX(t.t_na) AS n_a, MAX(t.t_sa) AS s_a,
           MAX(t.t_nb) AS n_b, MAX(t.t_sb) AS s_b
    FROM per p CROSS JOIN tot t
)
SELECT CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b,
       ROUND(CASE WHEN n_a > 0 THEN s_a / CAST(n_a AS DOUBLE) ELSE 0.0 END, 6) AS rate_a,
       ROUND(CASE WHEN n_b > 0 THEN s_b / CAST(n_b AS DOUBLE) ELSE 0.0 END, 6) AS rate_b,
       ROUND(rate_b_std, 6) AS rate_b_std,
       ROUND((CASE WHEN n_b > 0 THEN s_b / CAST(n_b AS DOUBLE) ELSE 0.0 END)
             - (CASE WHEN n_a > 0 THEN s_a / CAST(n_a AS DOUBLE) ELSE 0.0 END), 6) AS diff_raw,
       ROUND(rate_b_std
             - (CASE WHEN n_a > 0 THEN s_a / CAST(n_a AS DOUBLE) ELSE 0.0 END), 6) AS diff_std
FROM std
"""


# join-size estimate (lock-step with profile.join_size_estimate)
_JOIN_SIZE_SQL = """
WITH lc AS (SELECT o_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS cl FROM orders GROUP BY 1),
rc AS (SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS cr FROM lineitem GROUP BY 1),
j AS (
    SELECT CAST(SUM(cl * cr) AS BIGINT) AS join_rows,
           CAST(MAX(cl * cr) AS BIGINT) AS max_key_product,
           CAST(COUNT(*) AS BIGINT) AS matched_keys
    FROM lc JOIN rc USING (k)
),
ls AS (SELECT CAST(SUM(cl) AS BIGINT) AS rows_left, CAST(COUNT(*) AS BIGINT) AS keys_left FROM lc),
rs AS (SELECT CAST(SUM(cr) AS BIGINT) AS rows_right, CAST(COUNT(*) AS BIGINT) AS keys_right FROM rc)
SELECT rows_left, keys_left, rows_right, keys_right,
       matched_keys, join_rows, max_key_product,
       ROUND(CAST(rows_left AS DOUBLE) * CAST(rows_right AS DOUBLE)
             / greatest(CAST(greatest(keys_left, keys_right) AS DOUBLE), 1.0), 6)
           AS independence_estimate,
       ROUND(CAST(join_rows AS DOUBLE)
             / greatest(CAST(rows_left AS DOUBLE) * CAST(rows_right AS DOUBLE)
                        / greatest(CAST(greatest(keys_left, keys_right) AS DOUBLE), 1.0),
                        1e-300), 6) AS estimate_ratio
FROM ls, rs, j
"""


# FK orphan audit (lock-step with profile.fk_orphan_audit: LEFT ANTI
# == NOT IN with null-safe distinct parent keys)
_FK_ORPHANS_SQL = """
WITH rel AS (
    SELECT 'lineitem_orders' AS relationship,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS child_rows,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
            WHERE l_orderkey IS NOT NULL
              AND l_orderkey NOT IN (SELECT DISTINCT o_orderkey FROM orders
                                     WHERE o_orderkey IS NOT NULL)) AS orphan_rows
    UNION ALL
    SELECT 'orders_customer',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
            WHERE o_custkey IS NOT NULL
              AND o_custkey NOT IN (SELECT DISTINCT c_custkey FROM customer
                                    WHERE c_custkey IS NOT NULL))
    UNION ALL
    SELECT 'customer_nation',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM customer),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
            WHERE c_nationkey IS NOT NULL
              AND c_nationkey NOT IN (SELECT DISTINCT n_nationkey FROM nation
                                      WHERE n_nationkey IS NOT NULL))
    UNION ALL
    SELECT 'events_customer',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM events),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM events
            WHERE user_id IS NOT NULL
              AND user_id NOT IN (SELECT DISTINCT c_custkey FROM customer
                                  WHERE c_custkey IS NOT NULL))
)
SELECT relationship, child_rows, orphan_rows,
       ROUND(CAST(orphan_rows AS DOUBLE)
             / greatest(CAST(child_rows AS DOUBLE), 1.0), 6) AS orphan_share
FROM rel
ORDER BY relationship
"""


def _rmst_sql(tau: int) -> str:
    """RMST oracle (lock-step with survival.rmst: step integral over
    the shared KM-curve SQL, last level carried to tau)."""
    t = float(tau)
    return f"""
WITH km AS ({_KM_CURVE_SQL}),
seg AS (
    SELECT t, n_risk, survival,
           LEAD(t) OVER (ORDER BY t) AS t_next
    FROM km
)
SELECT CAST({tau} AS INTEGER) AS tau,
       CAST(MAX(n_risk) AS BIGINT) AS n_subjects,
       ROUND(least(CAST(MIN(t) AS DOUBLE), {t})
             + COALESCE(SUM(survival
                 * (least(COALESCE(CAST(t_next AS DOUBLE), {t}), {t})
                    - least(CAST(t AS DOUBLE), {t}))), 0.0), 6) AS rmst
FROM seg
"""


# Welch ANOVA (lock-step with abtest.welch_anova: identical moment
# and weight algebra over the k-row group table)
_WELCH_ANOVA_SQL = f"""
WITH {_CONV_CTE},
vals AS (
    SELECT role AS grp, CAST(length(text) AS DOUBLE) AS v
    FROM conversations
    WHERE text IS NOT NULL AND role IS NOT NULL
),
mom AS (
    SELECT grp, CAST(COUNT(*) AS BIGINT) AS n, SUM(v) AS s1, SUM(v * v) AS s2
    FROM vals GROUP BY grp
),
per AS (
    SELECT grp, n,
           s1 / n AS m,
           (CASE WHEN n > 1 THEN (s2 - s1 * s1 / n) / (n - 1.0) END) AS var,
           (CASE WHEN (CASE WHEN n > 1 THEN (s2 - s1 * s1 / n) / (n - 1.0) END) > 0
                 THEN n / (CASE WHEN n > 1 THEN (s2 - s1 * s1 / n) / (n - 1.0) END)
            END) AS w
    FROM mom
),
tot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS k_groups,
           SUM(w) AS sw, SUM(w * m) AS swm
    FROM per
),
red AS (
    SELECT SUM(p.w * (p.m - t.swm / t.sw) * (p.m - t.swm / t.sw)) AS num,
           SUM((1.0 - p.w / t.sw) * (1.0 - p.w / t.sw) / (p.n - 1.0)) AS lam,
           MAX(t.k_groups) AS k_groups
    FROM per p CROSS JOIN tot t
)
SELECT p.grp, p.n,
       ROUND(p.m, 6) AS mean,
       ROUND(p.var, 6) AS variance,
       r.k_groups,
       CAST(r.k_groups - 1 AS BIGINT) AS df1,
       ROUND(CASE WHEN r.lam > 0
                  THEN (r.k_groups * r.k_groups - 1.0) / (3.0 * r.lam) END, 6) AS df2,
       ROUND(CASE WHEN r.lam >= 0 AND r.k_groups > 1
                  THEN (r.num / (r.k_groups - 1.0))
                       / (1.0 + 2.0 * (r.k_groups - 2.0)
                          / (r.k_groups * r.k_groups - 1.0) * r.lam) END, 6) AS f_stat
FROM per p CROSS JOIN red r
ORDER BY p.grp
"""



# Cramér–von Mises drift (lock-step with psi.cvm_from_bins: exact
# hugeint squared-cross-product numerator over the shared KS binning)
_CVM_SQL = f"""
WITH {_CONV_CTE},
binned AS (
    SELECT CASE WHEN CAST(floor(epoch_us(CAST(date_trunc('week', ts) AS TIMESTAMP))
                            / {7 * 86400 * 1_000_000}) AS BIGINT) % 2 = 0
                THEN 'even' ELSE 'odd' END AS fold,
           CAST(LEAST(GREATEST(floor(CAST(length(text) AS BIGINT) / 5.0), 0), 9) AS INTEGER) AS bin
    FROM conversations
),
counts AS (SELECT fold, bin, CAST(COUNT(*) AS BIGINT) AS n FROM binned GROUP BY 1, 2),
bins AS (SELECT DISTINCT bin FROM counts),
cur_grid AS (
    SELECT f.fold, b.bin
    FROM (SELECT DISTINCT fold FROM counts WHERE fold <> 'even') f
    CROSS JOIN bins b
),
cur_full AS (
    SELECT g.fold, g.bin, COALESCE(c.n, 0) AS n
    FROM cur_grid g
    LEFT JOIN counts c ON g.fold = c.fold AND g.bin = c.bin
),
ref_full AS (
    SELECT b.bin, COALESCE(c.n, 0) AS n
    FROM bins b
    LEFT JOIN (SELECT bin, n FROM counts WHERE fold = 'even') c ON b.bin = c.bin
),
cur AS (
    SELECT fold, bin, CAST(n AS BIGINT) AS n_b,
           CAST(SUM(n) OVER (PARTITION BY fold ORDER BY bin
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS _cum,
           CAST(SUM(n) OVER (PARTITION BY fold) AS BIGINT) AS _tot
    FROM cur_full
),
ref AS (
    SELECT bin, CAST(n AS BIGINT) AS rn_b,
           CAST(SUM(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS _rcum,
           CAST(SUM(n) OVER () AS BIGINT) AS _rtot
    FROM ref_full
)
SELECT c.fold,
       ROUND(CAST(SUM(
                 (CAST(c._cum AS HUGEINT) * CAST(r._rtot AS HUGEINT)
                  - CAST(r._rcum AS HUGEINT) * CAST(c._tot AS HUGEINT))
                 * (CAST(c._cum AS HUGEINT) * CAST(r._rtot AS HUGEINT)
                    - CAST(r._rcum AS HUGEINT) * CAST(c._tot AS HUGEINT))
                 * CAST(c.n_b + r.rn_b AS HUGEINT)) AS DOUBLE)
             / (CAST(MAX(c._tot) AS DOUBLE) * CAST(MAX(r._rtot) AS DOUBLE)
                * CAST(MAX(c._tot) AS DOUBLE) * CAST(MAX(r._rtot) AS DOUBLE)
                * (CAST(MAX(c._tot) AS DOUBLE) + CAST(MAX(r._rtot) AS DOUBLE))), 6)
           AS cvm,
       CAST(MAX(c._tot) AS BIGINT) AS n_cur,
       CAST(MAX(r._rtot) AS BIGINT) AS n_ref
FROM cur c JOIN ref r ON c.bin = r.bin
GROUP BY c.fold
"""


# Average precision (lock-step with calibration.average_precision_by_fold:
# distinct-score desc cumulative machine, floor-1e9-grid exact term sum)
_AP_SQL = f"""
WITH {_PRED_CTE},
per_score AS (
    SELECT fold, p AS score,
           CAST(SUM(y) AS BIGINT) AS pos,
           CAST(SUM(1 - y) AS BIGINT) AS neg
    FROM preds GROUP BY fold, p
),
cum AS (
    SELECT fold, pos,
           CAST(SUM(pos) OVER (PARTITION BY fold ORDER BY score DESC
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tp,
           CAST(SUM(neg) OVER (PARTITION BY fold ORDER BY score DESC
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS fp
    FROM per_score
)
SELECT fold,
       CAST(MAX(tp) AS BIGINT) AS n_pos,
       CAST(MAX(fp) AS BIGINT) AS n_neg,
       ROUND(CAST(MAX(tp) AS DOUBLE)
             / (CAST(MAX(tp) AS DOUBLE) + CAST(MAX(fp) AS DOUBLE)), 6) AS prevalence,
       ROUND(CAST(SUM(CAST(FLOOR(CAST(pos AS DOUBLE) * CAST(tp AS DOUBLE)
                                 * 1000000000.0
                                 / CAST(tp + fp AS DOUBLE)) AS HUGEINT)) AS DOUBLE)
             / (CAST(MAX(tp) AS DOUBLE) * 1000000000.0), 6) AS ap
FROM cum
GROUP BY fold
ORDER BY fold
"""


# McNemar paired (lock-step with abtest.mcnemar_paired over the
# first-half/second-half error split; shared normal polynomial p)
def _mcnemar_sql() -> str:
    from kkbox_churn_prediction_spark.functions.stats import two_sided_p_sql

    return f"""
WITH {_CONV_CTE},
mx AS (SELECT conv_id, MAX(turn_idx) AS _mx FROM conversations GROUP BY conv_id),
units AS (
    SELECT c.conv_id,
           MAX(CASE WHEN c.turn_idx * 2 <= m._mx
                         AND c.tool = 'error' THEN 1 ELSE 0 END) AS pre,
           MAX(CASE WHEN c.turn_idx * 2 > m._mx
                         AND c.tool = 'error' THEN 1 ELSE 0 END) AS post
    FROM conversations c JOIN mx m ON c.conv_id = m.conv_id
    GROUP BY c.conv_id
),
counts AS (
    SELECT CAST(SUM(CASE WHEN pre = 0 AND post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b00,
           CAST(SUM(CASE WHEN pre = 0 AND post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b01,
           CAST(SUM(CASE WHEN pre = 1 AND post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b10,
           CAST(SUM(CASE WHEN pre = 1 AND post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b11
    FROM units
),
stat AS (
    SELECT b00, b01, b10, b11,
           CASE WHEN b01 + b10 > 0
                THEN GREATEST(ABS(CAST(b01 - b10 AS DOUBLE)) - 1.0, 0.0)
                     * GREATEST(ABS(CAST(b01 - b10 AS DOUBLE)) - 1.0, 0.0)
                     / CAST(b01 + b10 AS DOUBLE)
                ELSE 0.0 END AS chi2_raw
    FROM counts
)
SELECT b00, b01, b10, b11,
       ROUND(chi2_raw, 6) AS chi2,
       ROUND(CASE WHEN b01 + b10 > 0
                  THEN {two_sided_p_sql('sqrt(chi2_raw)')}
                  ELSE 1.0 END, 6) AS p_value
FROM stat
"""


# Fisher exact greater (lock-step with abtest.fisher_exact_greater:
# identical lchoose/lgamma sum over the deterministic index range)
_FISHER_SQL = f"""
WITH {_CONV_CTE},
perconv AS (
    SELECT conv_id,
           MAX(CASE WHEN tool = 'error' AND turn_idx < 5 THEN 1 ELSE 0 END) AS succ
    FROM conversations GROUP BY conv_id
),
units AS (
    SELECT CASE WHEN ({_H48.format(x="concat('fx', conv_id)")}) % 2 = 0
                THEN 'a' ELSE 'b' END AS arm,
           succ
    FROM perconv
),
counts AS (
    SELECT CAST(COUNT(CASE WHEN arm = 'a' THEN 1 END) AS BIGINT) AS n_a,
           CAST(COUNT(CASE WHEN arm = 'b' THEN 1 END) AS BIGINT) AS n_b,
           CAST(SUM(CASE WHEN arm = 'a' THEN succ ELSE 0 END) AS BIGINT) AS s_a,
           CAST(SUM(CASE WHEN arm = 'b' THEN succ ELSE 0 END) AS BIGINT) AS s_b
    FROM units
),
params AS (
    SELECT n_a, n_b, s_a, s_b,
           n_a + n_b AS n, s_a + s_b AS c1
    FROM counts
),
prob AS (
    SELECT SUM(exp(
        (lgamma(p.n_a + 1) - lgamma(g.i + 1) - lgamma(p.n_a - g.i + 1))
        + (lgamma(p.n_b + 1) - lgamma(p.c1 - g.i + 1)
               - lgamma(p.n_b - (p.c1 - g.i) + 1))
        - (lgamma(p.n + 1) - lgamma(p.c1 + 1) - lgamma(p.n - p.c1 + 1))
    )) AS pr
    FROM params p, generate_series(0, 1000000) g(i)
    WHERE g.i >= p.s_a AND g.i <= LEAST(p.n_a, p.c1) AND p.c1 - g.i <= p.n_b
)
SELECT p.n_a, p.s_a, p.n_b, p.s_b,
       CASE WHEN p.s_b * (p.n_a - p.s_a) > 0
            THEN CAST((2 * CAST(p.s_a * (p.n_b - p.s_b) AS HUGEINT) * 1000000
                       + p.s_b * (p.n_a - p.s_a))
                      // (2 * (p.s_b * (p.n_a - p.s_a))) AS DOUBLE) / 1e6
            END AS odds_ratio,
       ROUND(LEAST(COALESCE(prob.pr, 0.0), 1.0), 6) AS p_greater
FROM params p, prob
"""



# Turn contiguity audit (lock-step with profile.turn_contiguity_audit)
_TURN_CONTIGUITY_SQL = f"""
WITH {_CONV_CTE},
lagged AS (
    SELECT conv_id, turn_idx,
           LAG(turn_idx) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx) AS prev_idx
    FROM conversations
),
per_conv AS (
    SELECT conv_id,
           CAST(COUNT(*) AS BIGINT) AS _n,
           CAST(COUNT(DISTINCT turn_idx) AS BIGINT) AS _nd,
           CAST(MIN(turn_idx) AS BIGINT) AS _mn,
           CAST(MAX(turn_idx) AS BIGINT) AS _mx,
           CAST(SUM(CASE WHEN prev_idx IS NOT NULL AND turn_idx < prev_idx
                         THEN 1 ELSE 0 END) AS BIGINT) AS _oov
    FROM lagged
    GROUP BY conv_id
),
flags AS (
    SELECT CASE WHEN _n > _nd THEN 1 ELSE 0 END AS dup,
           CASE WHEN (_mx - _mn + 1) > _nd THEN 1 ELSE 0 END AS gap,
           CASE WHEN _mn <> 0 THEN 1 ELSE 0 END AS nz,
           CASE WHEN _oov > 0 THEN 1 ELSE 0 END AS oov,
           _n, _nd, _mn, _mx
    FROM per_conv
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_convs,
       CAST(SUM(dup) AS BIGINT) AS n_dup_idx,
       CAST(SUM(gap) AS BIGINT) AS n_gapped,
       CAST(SUM(nz) AS BIGINT) AS n_nonzero_start,
       CAST(SUM(oov) AS BIGINT) AS n_order_violation,
       CAST(SUM(CASE WHEN dup + gap + nz + oov = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clean,
       CAST(SUM(_n - _nd) AS BIGINT) AS excess_dup_rows,
       CAST(SUM(_mx - _mn + 1 - _nd) AS BIGINT) AS missing_indices
FROM flags
"""


# Null-pattern profile (lock-step with profile.null_pattern_profile
# over (role, text, tool))
_NULL_PATTERNS_SQL = f"""
WITH {_CONV_CTE},
sig AS (
    SELECT concat('role:', CASE WHEN role IS NULL THEN '1' ELSE '0' END,
                  ',text:', CASE WHEN text IS NULL THEN '1' ELSE '0' END,
                  ',tool:', CASE WHEN tool IS NULL THEN '1' ELSE '0' END) AS pattern
    FROM conversations
),
counts AS (
    SELECT pattern, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM sig GROUP BY pattern
),
tot AS (SELECT SUM(n_rows) AS _tot FROM counts)
SELECT c.pattern, c.n_rows,
       ROUND(CAST(c.n_rows AS DOUBLE) / CAST(t._tot AS DOUBLE), 6) AS share
FROM counts c CROSS JOIN tot t
ORDER BY c.n_rows DESC, c.pattern
LIMIT 50
"""


# ICC(1) (lock-step with association.icc_oneway: exact integer
# moments; Σ s1²/n on the 1e-6 floor grid as hugeint)
_ICC_SQL = f"""
WITH {_CONV_CTE},
per AS (
    SELECT conv_id,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(length(text) AS BIGINT)) AS BIGINT) AS s1,
           CAST(SUM(CAST(length(text) AS BIGINT) * CAST(length(text) AS BIGINT))
                AS BIGINT) AS s2
    FROM conversations
    WHERE text IS NOT NULL
    GROUP BY conv_id
),
red AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS k,
           CAST(SUM(n) AS BIGINT) AS n_tot,
           CAST(SUM(s1) AS HUGEINT) AS t1,
           CAST(SUM(s2) AS HUGEINT) AS t2,
           CAST(SUM(CAST(FLOOR(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) * 1000000.0
                                / CAST(n AS DOUBLE)) AS HUGEINT)) AS HUGEINT) AS tsq,
           CAST(SUM(CAST(n AS HUGEINT) * CAST(n AS HUGEINT)) AS HUGEINT) AS tn2
    FROM per
)
SELECT k AS k_groups, n_tot AS n_total,
       ROUND((CAST(n_tot AS DOUBLE) - CAST(tn2 AS DOUBLE) / CAST(n_tot AS DOUBLE))
             / (CAST(k AS DOUBLE) - 1.0), 6) AS n0,
       ROUND(CASE WHEN k > 1 THEN
             (CAST(tsq AS DOUBLE) / 1e6
              - CAST(t1 AS DOUBLE) * CAST(t1 AS DOUBLE) / CAST(n_tot AS DOUBLE))
             / (CAST(k AS DOUBLE) - 1.0) END, 6) AS msb,
       ROUND(CASE WHEN n_tot > k THEN
             (CAST(t2 AS DOUBLE) - CAST(tsq AS DOUBLE) / 1e6)
             / (CAST(n_tot AS DOUBLE) - CAST(k AS DOUBLE)) END, 6) AS msw,
       ROUND(CASE WHEN k > 1 AND n_tot > k AND
             ((CAST(tsq AS DOUBLE) / 1e6
               - CAST(t1 AS DOUBLE) * CAST(t1 AS DOUBLE) / CAST(n_tot AS DOUBLE))
              / (CAST(k AS DOUBLE) - 1.0)
              + ((CAST(n_tot AS DOUBLE) - CAST(tn2 AS DOUBLE) / CAST(n_tot AS DOUBLE))
                 / (CAST(k AS DOUBLE) - 1.0) - 1.0)
                * ((CAST(t2 AS DOUBLE) - CAST(tsq AS DOUBLE) / 1e6)
                   / (CAST(n_tot AS DOUBLE) - CAST(k AS DOUBLE)))) > 0
             THEN
             ((CAST(tsq AS DOUBLE) / 1e6
               - CAST(t1 AS DOUBLE) * CAST(t1 AS DOUBLE) / CAST(n_tot AS DOUBLE))
              / (CAST(k AS DOUBLE) - 1.0)
              - (CAST(t2 AS DOUBLE) - CAST(tsq AS DOUBLE) / 1e6)
                / (CAST(n_tot AS DOUBLE) - CAST(k AS DOUBLE)))
             / ((CAST(tsq AS DOUBLE) / 1e6
                 - CAST(t1 AS DOUBLE) * CAST(t1 AS DOUBLE) / CAST(n_tot AS DOUBLE))
                / (CAST(k AS DOUBLE) - 1.0)
                + ((CAST(n_tot AS DOUBLE) - CAST(tn2 AS DOUBLE) / CAST(n_tot AS DOUBLE))
                   / (CAST(k AS DOUBLE) - 1.0) - 1.0)
                  * ((CAST(t2 AS DOUBLE) - CAST(tsq AS DOUBLE) / 1e6)
                     / (CAST(n_tot AS DOUBLE) - CAST(k AS DOUBLE)))) END, 6) AS icc
FROM red
"""


# Tool trigrams (lock-step with lags.tool_trigrams)
_TOOL_TRIGRAMS_SQL = f"""
WITH {_CONV_CTE},
calls AS (
    SELECT conv_id, ts, turn_idx, tool FROM conversations WHERE tool IS NOT NULL
),
led AS (
    SELECT tool AS t1,
           LEAD(tool, 1) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx) AS t2,
           LEAD(tool, 2) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx) AS t3
    FROM calls
),
tri AS (
    SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n
    FROM led WHERE t2 IS NOT NULL AND t3 IS NOT NULL
    GROUP BY t1, t2, t3
),
ctx AS (SELECT t1, t2, SUM(n) AS _cn FROM tri GROUP BY t1, t2),
pairs AS (
    SELECT t1 AS t2, t2 AS t3, CAST(COUNT(*) AS BIGINT) AS _bn
    FROM led WHERE t2 IS NOT NULL
    GROUP BY 1, 2
),
from_b AS (SELECT t2, SUM(_bn) AS _btot FROM pairs GROUP BY t2),
bigram_cond AS (
    SELECT p.t2, p.t3, CAST(p._bn AS DOUBLE) / CAST(f._btot AS DOUBLE) AS _p1
    FROM pairs p JOIN from_b f ON p.t2 = f.t2
)
SELECT tri.t1, tri.t2, tri.t3, tri.n,
       ROUND(CAST(tri.n AS DOUBLE) * 1.0 / CAST(c._cn AS DOUBLE), 6) AS p_cond,
       ROUND((CAST(tri.n AS DOUBLE) * 1.0 / CAST(c._cn AS DOUBLE)) / b._p1, 6) AS lift
FROM tri
JOIN ctx c ON tri.t1 = c.t1 AND tri.t2 = c.t2
JOIN bigram_cond b ON tri.t2 = b.t2 AND tri.t3 = b.t3
ORDER BY tri.n DESC, tri.t1, tri.t2, tri.t3
LIMIT 20
"""



# Adamic–Adar (lock-step with components.adamic_adar over the
# supplier_pagerank edge build; hub cap mirrored)
_ADAMIC_ADAR_SQL = """
WITH e AS (
    SELECT DISTINCT concat('c', o_custkey) AS a, concat('s', l_suppkey) AS b
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
und AS (
    SELECT a, b FROM e
    UNION
    SELECT b AS a, a AS b FROM e
),
deg AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS deg FROM und GROUP BY a),
centers AS (
    SELECT a AS w,
           CAST(FLOOR(1000000000.0 / ln(CAST(deg AS DOUBLE))) AS BIGINT) AS term
    FROM deg WHERE deg >= 2 AND deg <= 50
),
adj AS (
    SELECT u.a AS w, c.term, u.b AS n
    FROM und u JOIN centers c ON u.a = c.w
),
wedges AS (
    SELECT l.w, l.term, l.n AS u, r.n AS v
    FROM adj l JOIN adj r ON l.w = r.w
    WHERE l.n < r.n
),
scored AS (
    SELECT u, v, CAST(COUNT(*) AS BIGINT) AS n_common,
           CAST(SUM(term) AS BIGINT) AS s
    FROM wedges GROUP BY u, v
),
cand AS (
    SELECT sc.* FROM scored sc
    WHERE NOT EXISTS (SELECT 1 FROM und WHERE und.a = sc.u AND und.b = sc.v)
)
SELECT u, v, n_common,
       ROUND(CAST(s AS DOUBLE) / 1000000000.0, 6) AS score
FROM cand
ORDER BY s DESC, u, v
LIMIT 50
"""


def _bpe_train_sql(n_merges: int = 8) -> str:
    """Unrolled BPE merge-training oracle (lock-step with
    textstats.bpe_train_merges: same vocab filter, delimiter
    encoding, argmax tiebreak, and replace() merge semantics)."""
    x = "regexp_replace(word, '(.)', '\\1||', 'g')"
    parts = [
        f"""words AS MATERIALIZED (
    SELECT word, CAST(COUNT(*) AS BIGINT) AS wf
    FROM (SELECT unnest({_TOKS}) AS word FROM documents) t
    WHERE len(word) >= 2 AND len(word) <= 32
      AND regexp_matches(word, '^[a-z0-9]+$')
    GROUP BY 1
),
reps0 AS MATERIALIZED (
    SELECT '|' || substr({x}, 1, length({x}) - 1) AS rep, wf FROM words
)"""
    ]
    for i in range(1, n_merges + 1):
        j = i - 1
        pat = (
            f"COALESCE('|' || (SELECT a FROM best{i}) || '||' "
            f"|| (SELECT b FROM best{i}) || '|', chr(1))"
        )
        sub = (
            f"COALESCE('|' || (SELECT a FROM best{i}) "
            f"|| (SELECT b FROM best{i}) || '|', chr(1))"
        )
        parts.append(
            f"""syms{i} AS MATERIALIZED (
    SELECT string_split(substr(rep, 2, length(rep) - 2), '||') AS l, wf
    FROM reps{j}
),
pairs{i} AS (
    SELECT l[CAST(jj AS INTEGER)] AS a, l[CAST(jj AS INTEGER) + 1] AS b, wf
    FROM (SELECT l, wf, unnest(range(1, len(l))) AS jj FROM syms{i}) t
),
best{i} AS MATERIALIZED (
    SELECT a, b, CAST(SUM(wf) AS BIGINT) AS c
    FROM pairs{i} GROUP BY a, b
    ORDER BY c DESC, a, b LIMIT 1
),
reps{i} AS MATERIALIZED (
    SELECT replace(rep, {pat}, {sub}) AS rep, wf FROM reps{j}
)"""
        )
    selects = "\nUNION ALL\n".join(
        f"SELECT {i} AS merge_rank, a AS left_sym, b AS right_sym, "
        f"a || b AS merged, c AS pair_count FROM best{i}"
        for i in range(1, n_merges + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + selects + "\nORDER BY merge_rank"



# Adaptive ECE (lock-step with calibration.ece_adaptive: rank-based
# integer bin assignment over the distinct-score histogram)
_ECE_ADAPTIVE_SQL = f"""
WITH {_PRED_CTE},
hist AS (
    SELECT p AS score, CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(y) AS BIGINT) AS sy
    FROM preds GROUP BY p
),
ranked AS (
    SELECT score, cnt, sy,
           CAST(COALESCE(SUM(cnt) OVER (ORDER BY score
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS _cb,
           CAST(SUM(cnt) OVER () AS BIGINT) AS _n
    FROM hist
),
binned AS (
    SELECT CAST(FLOOR(_cb * 10 / _n) AS INTEGER) AS bin,
           score, cnt, sy, _n
    FROM ranked
),
per_bin AS (
    SELECT bin, CAST(SUM(cnt) AS BIGINT) AS n,
           SUM(score * cnt) AS sp,
           CAST(SUM(sy) AS BIGINT) AS ty,
           MAX(_n) AS _nn
    FROM binned GROUP BY bin
)
SELECT 10 AS n_bins,
       CAST(COUNT(*) AS BIGINT) AS n_bins_used,
       CAST(MAX(_nn) AS BIGINT) AS n_rows,
       ROUND(SUM(CAST(n AS DOUBLE) / CAST(_nn AS DOUBLE)
                 * ABS(CAST(ty AS DOUBLE) / CAST(n AS DOUBLE)
                       - sp / CAST(n AS DOUBLE))), 6) AS ece_adaptive
FROM per_bin
"""


# Qini uplift (lock-step with calibration.qini_curve over the
# hash-parity treatment arm)
_QINI_SQL = f"""
WITH {_PRED_CTE},
units AS (
    SELECT CASE WHEN ({_H48.format(x="concat('up', event_id)")}) % 2 = 0
                THEN 1 ELSE 0 END AS t,
           y, p AS score
    FROM preds
),
hist AS (
    SELECT score, CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(t) AS BIGINT) AS nt,
           CAST(SUM(t * y) AS BIGINT) AS rt,
           CAST(SUM((1 - t) * y) AS BIGINT) AS rc
    FROM units GROUP BY score
),
ranked AS (
    SELECT score, cnt, nt, rt, rc,
           CAST(COALESCE(SUM(cnt) OVER (ORDER BY score DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS _cb,
           CAST(SUM(cnt) OVER () AS BIGINT) AS _n
    FROM hist
),
binned AS (
    SELECT CAST(FLOOR(_cb * 10 / _n) AS INTEGER) AS decile, cnt, nt, rt, rc
    FROM ranked
),
per AS (
    SELECT decile, CAST(SUM(cnt) AS BIGINT) AS _c, CAST(SUM(nt) AS BIGINT) AS _t,
           CAST(SUM(rt) AS BIGINT) AS _rt, CAST(SUM(rc) AS BIGINT) AS _rc
    FROM binned GROUP BY decile
),
cum AS (
    SELECT decile,
           CAST(SUM(_c) OVER w AS BIGINT) AS cum_n,
           CAST(SUM(_t) OVER w AS BIGINT) AS cum_n_t,
           CAST(SUM(_c) OVER w - SUM(_t) OVER w AS BIGINT) AS cum_n_c,
           CAST(SUM(_rt) OVER w AS BIGINT) AS cum_resp_t,
           CAST(SUM(_rc) OVER w AS BIGINT) AS cum_resp_c
    FROM per
    WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT decile, cum_n, cum_n_t, cum_n_c, cum_resp_t, cum_resp_c,
       ROUND(CASE WHEN cum_n_t > 0
                  THEN CAST(cum_resp_t AS DOUBLE) / CAST(cum_n_t AS DOUBLE)
                  ELSE 0.0 END
             - CASE WHEN cum_n_c > 0
                    THEN CAST(cum_resp_c AS DOUBLE) / CAST(cum_n_c AS DOUBLE)
                    ELSE 0.0 END, 6) AS uplift_rate_gap,
       ROUND(CAST(cum_resp_t AS DOUBLE)
             - CASE WHEN cum_n_c > 0
                    THEN CAST(cum_resp_c AS DOUBLE) * CAST(cum_n_t AS DOUBLE)
                         / CAST(cum_n_c AS DOUBLE)
                    ELSE 0.0 END, 6) AS qini
FROM cum
ORDER BY decile
"""


# Aalen–Johansen competing-risks CIF (lock-step with
# survival.competing_risks_labels + cumulative_incidence; the
# EXP(SUM(LN)) product with zero-escape is the KM-oracle device)
_CIF_SQL = f"""
WITH {_CONV_CTE},
fa AS (
    SELECT c.conv_id, k.cutoff_ts, MIN(epoch_us(c.ts)) AS a_us
    FROM conversations c
    JOIN cutoffs k ON c.ts > k.cutoff_ts AND c.ts <= k.cutoff_ts + INTERVAL 14 DAY
    WHERE c.role = 'user'
    GROUP BY c.conv_id, k.cutoff_ts
),
fb AS (
    SELECT c.conv_id, k.cutoff_ts, MIN(epoch_us(c.ts)) AS b_us
    FROM conversations c
    JOIN cutoffs k ON c.ts > k.cutoff_ts AND c.ts <= k.cutoff_ts + INTERVAL 14 DAY
    WHERE c.tool = 'error'
    GROUP BY c.conv_id, k.cutoff_ts
),
grid AS (
    SELECT e.conv_id, k.cutoff_ts
    FROM (SELECT DISTINCT conv_id FROM conversations) e CROSS JOIN cutoffs k
),
labels AS (
    SELECT g.conv_id, g.cutoff_ts,
           CAST(COALESCE(ceil((CASE
                    WHEN fa.a_us IS NOT NULL
                         AND (fb.b_us IS NULL OR fa.a_us <= fb.b_us) THEN fa.a_us
                    ELSE fb.b_us END - epoch_us(g.cutoff_ts)) / 86400000000.0), 14)
                AS INTEGER) AS duration_days,
           CAST(CASE WHEN fa.a_us IS NOT NULL
                          AND (fb.b_us IS NULL OR fa.a_us <= fb.b_us) THEN 1
                     WHEN fb.b_us IS NOT NULL THEN 2
                     ELSE 0 END AS INTEGER) AS cause
    FROM grid g
    LEFT JOIN fa ON g.conv_id = fa.conv_id AND g.cutoff_ts = fa.cutoff_ts
    LEFT JOIN fb ON g.conv_id = fb.conv_id AND g.cutoff_ts = fb.cutoff_ts
),
per_t AS (
    SELECT duration_days AS t, COUNT(*) AS n_leaving,
           SUM(CASE WHEN cause = 1 THEN 1 ELSE 0 END) AS d_a,
           SUM(CASE WHEN cause = 2 THEN 1 ELSE 0 END) AS d_b
    FROM labels GROUP BY duration_days
),
at_risk AS (
    SELECT t, d_a, d_b,
           SUM(n_leaving) OVER ()
             - COALESCE(SUM(n_leaving) OVER
                 (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS n_risk
    FROM per_t
),
stepped AS (
    SELECT t, n_risk, d_a, d_b,
           CASE WHEN MIN(1.0 - (d_a + d_b) / n_risk) OVER
                     (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     <= 0.0
                THEN 0.0
                ELSE EXP(SUM(LN(CASE WHEN 1.0 - (d_a + d_b) / n_risk > 0.0
                                     THEN 1.0 - (d_a + d_b) / n_risk
                                     ELSE 1.0 END)) OVER
                         (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW))
           END AS _s
    FROM at_risk
),
terms AS (
    SELECT t, n_risk, d_a, d_b, _s,
           COALESCE(LAG(_s) OVER (ORDER BY t), 1.0)
               * CAST(d_a AS DOUBLE) / n_risk AS _ta,
           COALESCE(LAG(_s) OVER (ORDER BY t), 1.0)
               * CAST(d_b AS DOUBLE) / n_risk AS _tb
    FROM stepped
)
SELECT CAST(t AS INTEGER) AS t,
       CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d_a AS BIGINT) AS d_a,
       CAST(d_b AS BIGINT) AS d_b,
       ROUND(_s, 6) AS surv_overall,
       ROUND(SUM(_ta) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW), 6) AS cif_a,
       ROUND(SUM(_tb) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW), 6) AS cif_b
FROM terms
ORDER BY t
"""



# MRR@5 (lock-step with similarity.mrr_at_k over the same
# LSH-vs-brute pair as ann_recall / ndcg_lsh)
_MRR_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
v AS (SELECT vec_id AS neighbor_id, embedding AS ne FROM embeddings),
ex_scored AS (
    SELECT query_id, neighbor_id, ROUND({_COS}, 6) AS cosine
    FROM q, v WHERE neighbor_id <> query_id
),
ex_ranked AS (
    SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id ASC) AS rank
    FROM ex_scored
),
exact AS (SELECT query_id, neighbor_id FROM ex_ranked WHERE rank <= 5),
qb AS (SELECT vec_id AS query_id, embedding AS qe,
              {_BUCKET.format(e='embedding')} AS bucket
       FROM embeddings WHERE vec_id < 10),
vb AS (SELECT vec_id AS neighbor_id, embedding AS ne,
              {_BUCKET.format(e='embedding')} AS bucket
      FROM embeddings),
ap_scored AS (
    SELECT query_id, neighbor_id, ROUND({_COS}, 6) AS cosine
    FROM qb JOIN vb USING (bucket) WHERE neighbor_id <> query_id
),
ap_ranked AS (
    SELECT *, CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
    FROM ap_scored
),
approx AS (SELECT query_id, neighbor_id, rank FROM ap_ranked WHERE rank <= 5),
first AS (
    SELECT a.query_id, CAST(MIN(a.rank) AS INTEGER) AS first_hit_rank
    FROM approx a JOIN exact e
      ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
    GROUP BY a.query_id
),
qs AS (SELECT DISTINCT query_id FROM exact)
SELECT qs.query_id, f.first_hit_rank,
       COALESCE(ROUND(1.0 / f.first_hit_rank, 6), 0.0) AS rr
FROM qs LEFT JOIN first f ON qs.query_id = f.query_id
"""



# Hosmer–Lemeshow (lock-step with calibration.hosmer_lemeshow:
# ece_adaptive rank-bin machine + Wilson–Hilferty p through the
# portable CDF polynomial)
def _hl_sql() -> str:
    from kkbox_churn_prediction_spark.functions.stats import normal_cdf_sql

    wh_z = (
        "((pow(_hl / _df, 1.0/3.0) - (1.0 - 2.0 / (9.0 * _df)))"
        " / sqrt(2.0 / (9.0 * _df)))"
    )
    return f"""
WITH {_PRED_CTE},
hist AS (
    SELECT p AS score, CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(y) AS BIGINT) AS sy
    FROM preds GROUP BY p
),
ranked AS (
    SELECT score, cnt, sy,
           CAST(COALESCE(SUM(cnt) OVER (ORDER BY score
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS _cb,
           CAST(SUM(cnt) OVER () AS BIGINT) AS _n
    FROM hist
),
per_bin AS (
    SELECT CAST(FLOOR(_cb * 10 / _n) AS INTEGER) AS bin,
           CAST(SUM(cnt) AS BIGINT) AS n,
           SUM(score * cnt) AS e,
           CAST(SUM(sy) AS BIGINT) AS o
    FROM ranked GROUP BY 1
),
red AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS g,
           SUM(CASE WHEN e > 0 AND e < n
                    THEN (o - e) * (o - e) / (e * (1.0 - e / n))
                    ELSE 0.0 END) AS _hl,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - 2 AS DOUBLE) AS _df
    FROM per_bin
)
SELECT g AS n_bins_used, n_rows,
       ROUND(_hl, 6) AS hl_stat,
       CAST(g - 2 AS BIGINT) AS df,
       ROUND(CASE WHEN _df > 0 THEN 1.0 - {normal_cdf_sql(wh_z)} END, 6) AS p_wh
FROM red
"""


# Univariate AUC screen (lock-step with calibration.univariate_auc_screen
# over the per-conversation feature table; auc machine per feature)
_UNIAUC_SQL = f"""
WITH {_CONV_CTE},
per AS (
    SELECT conv_id,
           CAST(COUNT(*) AS BIGINT) AS n_turns,
           CAST(SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_user_turns,
           CAST(SUM(CAST(length(text) AS BIGINT)) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS avg_text_len,
           CAST(MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS DOUBLE) / 3600000000.0
               AS span_hours,
           MAX(CASE WHEN tool = 'error' AND turn_idx < 10 THEN 1 ELSE 0 END) AS y
    FROM conversations GROUP BY conv_id
),
stacked AS (
    SELECT 'avg_text_len' AS feature, avg_text_len AS v, y FROM per
    UNION ALL
    SELECT 'n_turns', CAST(n_turns AS DOUBLE), y FROM per
    UNION ALL
    SELECT 'n_user_turns', CAST(n_user_turns AS DOUBLE), y FROM per
    UNION ALL
    SELECT 'span_hours', span_hours, y FROM per
),
per_score AS (
    SELECT feature, v AS score,
           CAST(SUM(y) AS BIGINT) AS pos,
           CAST(SUM(1 - y) AS BIGINT) AS neg
    FROM stacked WHERE v IS NOT NULL GROUP BY feature, v
),
cum AS (
    SELECT feature, pos, neg,
           SUM(neg) OVER (PARTITION BY feature ORDER BY score) - neg AS cumneg_below,
           SUM(pos) OVER (PARTITION BY feature ORDER BY score) AS cumpos,
           SUM(neg) OVER (PARTITION BY feature ORDER BY score) AS cumneg,
           SUM(pos) OVER (PARTITION BY feature) AS tp,
           SUM(neg) OVER (PARTITION BY feature) AS tn
    FROM per_score
)
SELECT feature,
       CAST(MAX(tp) AS BIGINT) AS n_pos,
       CAST(MAX(tn) AS BIGINT) AS n_neg,
       ROUND(SUM(pos * (CAST(cumneg_below AS DOUBLE) + neg / 2.0))
             / (CAST(MAX(tp) AS DOUBLE) * CAST(MAX(tn) AS DOUBLE)), 6) AS auc,
       ROUND(MAX(ABS(CAST(cumpos AS DOUBLE) / tp - CAST(cumneg AS DOUBLE) / tn)), 6) AS ks
FROM cum GROUP BY feature
ORDER BY feature
"""


# Simplified silhouette (lock-step with similarity.silhouette_by_label:
# 6dp-rounded centroids, exploded-dim distance sums, micro-grid means)
_SILHOUETTE_SQL = f"""
WITH dims AS (SELECT unnest(generate_series(1, 64)) AS dim),
expl AS (
    SELECT vec_id, label, dim, CAST(embedding[dim] AS DOUBLE) AS v
    FROM embeddings CROSS JOIN dims
),
cents AS (
    SELECT label AS cand, dim, ROUND(AVG(v), 6) AS c
    FROM expl GROUP BY label, dim
),
dists AS (
    SELECT e.vec_id, e.label AS own, c.cand,
           SUM((e.v - c.c) * (e.v - c.c)) AS d2
    FROM expl e JOIN cents c USING (dim)
    GROUP BY e.vec_id, e.label, c.cand
),
per_point AS (
    SELECT vec_id, own,
           MAX(CASE WHEN cand = own THEN d2 END) AS a2,
           MIN(CASE WHEN cand <> own THEN d2 END) AS b2
    FROM dists GROUP BY vec_id, own
),
micro AS (
    SELECT own,
           CAST(ROUND(sqrt(a2) * 1000000.0) AS BIGINT) AS am,
           CAST(ROUND(sqrt(b2) * 1000000.0) AS BIGINT) AS bm,
           CAST(ROUND(CASE WHEN greatest(sqrt(a2), sqrt(b2)) > 0
                           THEN (sqrt(b2) - sqrt(a2))
                                / greatest(sqrt(a2), sqrt(b2))
                           ELSE 0.0 END * 1000000.0) AS BIGINT) AS sm
    FROM per_point
)
SELECT own AS label,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       ROUND(CAST(SUM(am) AS DOUBLE) / (COUNT(*) * 1000000.0), 6) AS mean_a,
       ROUND(CAST(SUM(bm) AS DOUBLE) / (COUNT(*) * 1000000.0), 6) AS mean_b,
       ROUND(CAST(SUM(sm) AS DOUBLE) / (COUNT(*) * 1000000.0), 6)
           AS mean_silhouette,
       CAST(SUM(CASE WHEN sm < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative
FROM micro GROUP BY own
ORDER BY own
"""


# Hurst R/S (lock-step with windows.hurst_daily: exact prefix-sum
# cumulative deviations, micro-grid per-m means, fixed-shape slope)
_HURST_SQL = f"""
WITH {_CONV_CTE},
daily AS (
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
           CAST(COUNT(*) AS BIGINT) AS x
    FROM conversations GROUP BY 1
),
idx AS (SELECT d, x, CAST(row_number() OVER (ORDER BY d) - 1 AS BIGINT) AS r FROM daily),
rep AS (
    SELECT m.m, CAST(FLOOR(r / m.m) AS BIGINT) AS seg, r % m.m AS j, x
    FROM idx CROSS JOIN (SELECT unnest([4, 8, 16, 32]) AS m) m
),
stats AS (
    SELECT m, seg, j, x,
           COUNT(*) OVER (PARTITION BY m, seg) AS _cnt,
           CAST(SUM(x) OVER (PARTITION BY m, seg) AS BIGINT) AS _sx,
           CAST(SUM(x * x) OVER (PARTITION BY m, seg) AS BIGINT) AS _sxx,
           CAST(SUM(x) OVER (PARTITION BY m, seg ORDER BY j
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS _cs
    FROM rep
),
per_seg AS (
    SELECT m, seg,
           MAX(CAST(_cs AS DOUBLE) - CAST(j + 1 AS DOUBLE)
               * (CAST(_sx AS DOUBLE) / m))
             - MIN(CAST(_cs AS DOUBLE) - CAST(j + 1 AS DOUBLE)
                   * (CAST(_sx AS DOUBLE) / m)) AS _range,
           MAX(_sxx) AS _sxx, MAX(_sx) AS _sx
    FROM stats WHERE _cnt = m
    GROUP BY m, seg
),
per_m AS (
    SELECT m, CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(CAST(ROUND(_range / sqrt(
                 (CAST(_sxx AS DOUBLE)
                  - CAST(_sx AS DOUBLE) * CAST(_sx AS DOUBLE) / CAST(m AS DOUBLE))
                 / CAST(m AS DOUBLE)) * 1000000.0) AS BIGINT)) AS BIGINT) AS _rsm
    FROM per_seg
    WHERE (CAST(_sxx AS DOUBLE)
           - CAST(_sx AS DOUBLE) * CAST(_sx AS DOUBLE) / CAST(m AS DOUBLE))
          / CAST(m AS DOUBLE) > 0
    GROUP BY m
),
pts AS (
    SELECT m, n_segments,
           CAST(_rsm AS DOUBLE) / (n_segments * 1000000.0) AS _mean_rs,
           ln(CAST(m AS DOUBLE)) AS _lx,
           ln(CAST(_rsm AS DOUBLE) / (n_segments * 1000000.0)) AS _ly
    FROM per_m
),
reg AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS _k, SUM(_lx) AS _sx, SUM(_ly) AS _sy,
           SUM(_lx * _ly) AS _sxy, SUM(_lx * _lx) AS _sxx
    FROM pts
)
SELECT p.m, p.n_segments,
       ROUND(p._mean_rs, 6) AS mean_rs,
       ROUND(CASE WHEN r._k * r._sxx - r._sx * r._sx > 0
                  THEN (r._k * r._sxy - r._sx * r._sy)
                       / (r._k * r._sxx - r._sx * r._sx) END, 6) AS hurst
FROM pts p CROSS JOIN reg r
ORDER BY p.m
"""



def _bpe_apply_sql(n_merges: int = 8) -> str:
    """BPE apply oracle: the SAME unrolled merge chain as
    _bpe_train_sql, finished with the delimiter-arithmetic token
    stats over reps{n} (lock-step with textstats.bpe_apply_stats)."""
    train = _bpe_train_sql(n_merges)
    # reuse the chain: strip the trainer's final SELECT/UNION block
    body = train[: train.rindex("SELECT 1 AS merge_rank")]
    return (
        body
        + f"""SELECT CAST(SUM(wf) AS BIGINT) AS n_words,
       CAST(SUM(wf * length(replace(rep, '|', ''))) AS BIGINT) AS n_chars,
       CAST(SUM(wf * ((length(rep) - length(replace(rep, '|', ''))) // 2))
            AS BIGINT) AS n_tokens,
       ROUND(CAST(SUM(wf * length(replace(rep, '|', ''))) AS DOUBLE)
             / CAST(SUM(wf) AS DOUBLE), 6) AS chars_per_word,
       ROUND(CAST(SUM(wf * ((length(rep) - length(replace(rep, '|', ''))) // 2))
                  AS DOUBLE) / CAST(SUM(wf) AS DOUBLE), 6) AS tokens_per_word,
       ROUND(1.0 - CAST(SUM(wf * ((length(rep) - length(replace(rep, '|', '')))
                                  // 2)) AS DOUBLE)
                   / CAST(SUM(wf * length(replace(rep, '|', ''))) AS DOUBLE), 6)
           AS compression_vs_chars
FROM reps{n_merges}
"""
    )


# NB moments fit (lock-step with association.nb_fit_daily over
# per-(conv, active day) error counts by ISO weekday)
_NB_FIT_SQL = f"""
WITH {_CONV_CTE},
counts AS (
    SELECT conv_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
           CAST(SUM(CASE WHEN tool = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS c
    FROM conversations GROUP BY conv_id, date_trunc('day', ts)
),
vals AS (SELECT CAST(isodow(d) AS INTEGER) AS dow, c FROM counts),
per AS (
    SELECT dow, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(c) AS BIGINT) AS s1,
           CAST(SUM(c * c) AS BIGINT) AS s2,
           CAST(SUM(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT) AS z
    FROM vals GROUP BY dow
)
SELECT dow, n,
       ROUND(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean,
       ROUND(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
             - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS variance,
       ROUND(CASE WHEN (CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                       > (CAST(s1 AS DOUBLE) / n)
                  THEN (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                       / ((CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                          - CAST(s1 AS DOUBLE) / n) END, 6) AS nb_r,
       ROUND(CASE WHEN (CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                       > (CAST(s1 AS DOUBLE) / n)
                  THEN (CAST(s1 AS DOUBLE) / n)
                       / (CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
             END, 6) AS nb_p,
       ROUND(CAST(z AS DOUBLE) / CAST(n AS DOUBLE), 6) AS zero_frac_obs,
       ROUND(CASE WHEN (CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                       > (CAST(s1 AS DOUBLE) / n)
                  THEN pow((CAST(s1 AS DOUBLE) / n)
                           / (CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)),
                           (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                           / ((CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                              - CAST(s1 AS DOUBLE) / n)) END, 6) AS zero_frac_nb,
       ROUND(CASE WHEN (CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                       > (CAST(s1 AS DOUBLE) / n)
                  THEN CAST(z AS DOUBLE) / CAST(n AS DOUBLE)
                       - pow((CAST(s1 AS DOUBLE) / n)
                             / (CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)),
                             (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                             / ((CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                                - CAST(s1 AS DOUBLE) / n)) END, 6) AS zero_inflation
FROM per
ORDER BY dow
"""


# Partition advisor (lock-step with layout.partition_advisor over
# lineitem: same per-type width map, all-integer recommendation math)
_PARTITION_ADVISOR_SQL = """
WITH probe AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(8 + 8 + 8 + 4 + 8 + 8 + 8 + 8
               + (COALESCE(length(l_returnflag), 0) + 20)
               + (COALESCE(length(l_linestatus), 0) + 20)
               + 8 AS BIGINT)) AS BIGINT) AS sw
    FROM lineitem
),
calc AS (
    SELECT n, sw // greatest(n, 1) AS avg_w,
           n * (sw // greatest(n, 1)) AS total,
           CAST(128 AS BIGINT) * 1024 * 1024 AS target
    FROM probe
),
parts AS (
    SELECT n, avg_w, total, target,
           greatest(CAST(1 AS BIGINT), (total + target - 1) // target) AS raw_parts
    FROM calc
)
SELECT n AS n_rows, avg_w AS avg_row_bytes, total AS est_total_bytes,
       greatest(CAST(32 AS BIGINT), ((raw_parts + 31) // 32) * 32)
           AS recommended_shuffle_partitions,
       target AS recommended_max_partition_bytes,
       (greatest(CAST(32 AS BIGINT), ((raw_parts + 31) // 32) * 32) + 31) // 32
           AS waves
FROM parts
"""


# Tool attribution (lock-step with funnel.tool_attribution)
_TOOL_ATTRIBUTION_SQL = f"""
WITH {_CONV_CTE},
calls AS (
    SELECT conv_id, ts, turn_idx, tool FROM conversations WHERE tool IS NOT NULL
),
prior AS (
    SELECT tool,
           list(tool) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx
                            ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING) AS _prior
    FROM calls
),
attributed AS (
    SELECT lf[1] AS first_touch_tool, lf[len(lf)] AS last_touch_tool
    FROM (
        SELECT list_filter(_prior, t -> t <> 'purchase') AS lf
        FROM prior WHERE tool = 'purchase'
    ) t
    WHERE len(lf) > 0
),
ft AS (
    SELECT first_touch_tool AS tool, CAST(COUNT(*) AS BIGINT) AS first_touch
    FROM attributed GROUP BY 1
),
lt AS (
    SELECT last_touch_tool AS tool, CAST(COUNT(*) AS BIGINT) AS last_touch
    FROM attributed GROUP BY 1
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS _tot FROM attributed)
SELECT COALESCE(f.tool, l.tool) AS tool,
       COALESCE(f.first_touch, 0) AS first_touch,
       COALESCE(l.last_touch, 0) AS last_touch,
       ROUND(CAST(COALESCE(f.first_touch, 0) AS DOUBLE) * 1.0 / t._tot, 6)
           AS share_first,
       ROUND(CAST(COALESCE(l.last_touch, 0) AS DOUBLE) * 1.0 / t._tot, 6)
           AS share_last
FROM ft f FULL OUTER JOIN lt l ON f.tool = l.tool
CROSS JOIN tot t
ORDER BY 1
"""



# Stratified ATE (lock-step with abtest.stratified_ate over the SAME
# confounded assignment as the IPW oracle)
_STRAT_ATE_SQL = f"""
WITH {_CONV_CTE},
per_conv AS (
    SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_turns,
           CAST(SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_user
    FROM conversations GROUP BY conv_id
),
units AS (
    SELECT LEAST(n_user, 20) AS x, n_turns AS y,
           CASE WHEN ({_H48.format(x="concat('ipw', conv_id)")}) % 100
                     < 20 + 3 * LEAST(n_user, 20)
                THEN 1 ELSE 0 END AS t
    FROM per_conv
),
per AS (
    SELECT x AS _x, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(t) AS BIGINT) AS nt,
           CAST(SUM(CASE WHEN t = 1 THEN y ELSE 0 END) AS BIGINT) AS syt,
           CAST(SUM(CASE WHEN t = 0 THEN y ELSE 0 END) AS BIGINT) AS syc
    FROM units GROUP BY x
),
red AS (
    SELECT CAST(SUM(n) AS BIGINT) AS n_units,
           CAST(COUNT(*) AS BIGINT) AS n_strata,
           CAST(SUM(CASE WHEN nt > 0 AND n - nt > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_strata_used,
           CAST(SUM(CASE WHEN nt > 0 AND n - nt > 0 THEN n ELSE 0 END) AS BIGINT)
               AS n_used,
           SUM(CASE WHEN nt > 0 AND n - nt > 0
                    THEN CAST(FLOOR(CAST(n AS DOUBLE)
                         * (CAST(syt AS DOUBLE) / CAST(nt AS DOUBLE)
                            - CAST(syc AS DOUBLE) / CAST(n - nt AS DOUBLE))
                         * 1000000000.0) AS HUGEINT) END) AS num,
           CAST(SUM(nt) AS BIGINT) AS nt_all,
           CAST(SUM(syt) AS BIGINT) AS syt_all,
           CAST(SUM(syc) AS BIGINT) AS syc_all
    FROM per
)
SELECT n_units, n_strata, n_strata_used,
       ROUND(1.0 - CAST(n_used AS DOUBLE) / CAST(n_units AS DOUBLE), 6)
           AS excluded_share,
       ROUND(CAST(syt_all AS DOUBLE) / CAST(nt_all AS DOUBLE)
             - CAST(syc_all AS DOUBLE) / CAST(n_units - nt_all AS DOUBLE), 6)
           AS naive_diff,
       ROUND(CAST(num AS DOUBLE) / (CAST(n_used AS DOUBLE) * 1000000000.0), 6)
           AS ate_stratified
FROM red
"""


# KM + Greenwood band (lock-step with survival.km_greenwood)
_KM_GREENWOOD_SQL = f"""
WITH {_SURVIVAL_CORE},
per_t AS (
    SELECT duration_days AS t, COUNT(*) AS n_leaving, SUM(observed) AS n_event
    FROM labels GROUP BY duration_days
),
at_risk AS (
    SELECT t, n_event,
           SUM(n_leaving) OVER ()
             - COALESCE(SUM(n_leaving) OVER
                 (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS n_risk
    FROM per_t
),
stepped AS (
    SELECT t,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(n_event AS BIGINT) AS n_event,
           CASE WHEN MIN(1.0 - n_event / n_risk) OVER
                     (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     <= 0.0
                THEN 0.0
                ELSE EXP(SUM(LN(CASE WHEN 1.0 - n_event / n_risk > 0.0
                                     THEN 1.0 - n_event / n_risk ELSE 1.0 END)) OVER
                         (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW))
           END AS _s,
           SUM(CASE WHEN n_risk - n_event > 0
                    THEN CAST(n_event AS DOUBLE)
                         / (CAST(n_risk AS DOUBLE) * (n_risk - n_event))
                    ELSE 0.0 END) OVER
               (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _g
    FROM at_risk
)
SELECT CAST(t AS INTEGER) AS t, n_risk, n_event,
       ROUND(_s, 6) AS survival,
       ROUND(CASE WHEN _s > 0.0 THEN _s * sqrt(_g) END, 6) AS se_greenwood,
       ROUND(CASE WHEN _s > 0.0 AND _s < 1.0
                  THEN pow(_s, exp(1.959964 * (sqrt(_g) / ABS(ln(_s))))) END, 6)
           AS ci_lo,
       ROUND(CASE WHEN _s > 0.0 AND _s < 1.0
                  THEN pow(_s, exp(-1.959964 * (sqrt(_g) / ABS(ln(_s))))) END, 6)
           AS ci_hi
FROM stepped
ORDER BY t
"""


# Encoding quality (lock-step with textstats.encoding_quality; char
# classes via chr() so the oracle source stays ASCII)
_ENCODING_SQL = r"""
WITH per AS (
    SELECT source,
           CAST(length(text) AS BIGINT) AS _nc,
           CAST(length(text) - length(regexp_replace(text,
                '[\x00-\x08\x0b\x0c\x0e-\x1f]', '', 'g')) AS BIGINT) AS _ctl,
           CAST(length(text) - length(regexp_replace(text,
                '[^\x00-\x7f]', '', 'g')) AS BIGINT) AS _na,
           CASE WHEN strpos(text, chr(65533)) > 0 THEN 1 ELSE 0 END AS _repl,
           CASE WHEN regexp_matches(text,
                chr(195) || '[' || chr(128) || '-' || chr(255) || ']')
                THEN 1 ELSE 0 END AS _moji
    FROM documents WHERE text IS NOT NULL
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(_repl) AS BIGINT) AS repl_char_docs,
       CAST(SUM(_moji) AS BIGINT) AS mojibake_docs,
       ROUND(CAST(SUM(_ctl) AS DOUBLE)
             / CAST(greatest(SUM(_nc), 1) AS DOUBLE), 6) AS control_char_rate,
       ROUND(CAST(SUM(_na) AS DOUBLE)
             / CAST(greatest(SUM(_nc), 1) AS DOUBLE), 6) AS non_ascii_rate
FROM per GROUP BY source ORDER BY source
"""


# Lorenz deciles (lock-step with rhythm.lorenz_deciles)
_LORENZ_SQL = f"""
WITH {_CONV_CTE},
per AS (
    SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS _c
    FROM conversations GROUP BY conv_id
),
hist AS (SELECT _c, CAST(COUNT(*) AS BIGINT) AS _ne FROM per GROUP BY _c),
ranked AS (
    SELECT _c, _ne,
           CAST(COALESCE(SUM(_ne) OVER (ORDER BY _c
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS _cb,
           CAST(SUM(_ne) OVER () AS BIGINT) AS _n
    FROM hist
),
per_bin AS (
    SELECT CAST(FLOOR(_cb * 10 / _n) AS INTEGER) AS decile,
           CAST(SUM(_ne) AS BIGINT) AS n_entities,
           CAST(SUM(_c * _ne) AS BIGINT) AS n_events
    FROM ranked GROUP BY 1
)
SELECT decile, n_entities, n_events,
       ROUND(CAST(n_events AS DOUBLE)
             / CAST(SUM(n_events) OVER () AS DOUBLE), 6) AS share_events,
       ROUND(CAST(SUM(n_entities) OVER (ORDER BY decile
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / CAST(SUM(n_entities) OVER () AS DOUBLE), 6) AS cum_share_entities,
       ROUND(CAST(SUM(n_events) OVER (ORDER BY decile
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / CAST(SUM(n_events) OVER () AS DOUBLE), 6) AS cum_share_events
FROM per_bin
ORDER BY decile
"""



# Risk ratio / OR effect sizes (lock-step with abtest.risk_ratio_ci)
_RISK_RATIO_SQL = f"""
WITH {_CONV_CTE},
perconv AS (
    SELECT conv_id,
           MAX(CASE WHEN tool = 'error' AND turn_idx < 5 THEN 1 ELSE 0 END) AS succ
    FROM conversations GROUP BY conv_id
),
units AS (
    SELECT CASE WHEN ({_H48.format(x="concat('fx', conv_id)")}) % 2 = 0
                THEN 'a' ELSE 'b' END AS arm,
           succ
    FROM perconv
),
counts AS (
    SELECT CAST(COUNT(CASE WHEN arm = 'a' THEN 1 END) AS BIGINT) AS n_a,
           CAST(COUNT(CASE WHEN arm = 'b' THEN 1 END) AS BIGINT) AS n_b,
           CAST(SUM(CASE WHEN arm = 'a' THEN succ ELSE 0 END) AS BIGINT) AS s_a,
           CAST(SUM(CASE WHEN arm = 'b' THEN succ ELSE 0 END) AS BIGINT) AS s_b
    FROM units
)
SELECT n_a, s_a, n_b, s_b,
       ROUND(CASE WHEN n_a > 0 THEN CAST(s_a AS DOUBLE) / n_a END, 6) AS rate_a,
       ROUND(CASE WHEN n_b > 0 THEN CAST(s_b AS DOUBLE) / n_b END, 6) AS rate_b,
       ROUND(CASE WHEN s_b > 0 AND n_a > 0 AND n_b > 0
                  THEN (CAST(s_a AS DOUBLE) / n_a) / (CAST(s_b AS DOUBLE) / n_b)
             END, 6) AS risk_ratio,
       ROUND(CASE WHEN s_a > 0 AND s_b > 0
                  THEN ((CAST(s_a AS DOUBLE) / n_a) / (CAST(s_b AS DOUBLE) / n_b))
                       * exp(-1.959964 * sqrt(1.0 / s_a - 1.0 / n_a
                                              + 1.0 / s_b - 1.0 / n_b))
             END, 6) AS rr_ci_lo,
       ROUND(CASE WHEN s_a > 0 AND s_b > 0
                  THEN ((CAST(s_a AS DOUBLE) / n_a) / (CAST(s_b AS DOUBLE) / n_b))
                       * exp(1.959964 * sqrt(1.0 / s_a - 1.0 / n_a
                                             + 1.0 / s_b - 1.0 / n_b))
             END, 6) AS rr_ci_hi,
       ROUND(CASE WHEN s_b > 0 AND n_a - s_a > 0
                  THEN (CAST(s_a AS DOUBLE) * (n_b - s_b))
                       / (CAST(s_b AS DOUBLE) * (n_a - s_a)) END, 6) AS odds_ratio,
       ROUND(CASE WHEN s_a > 0 AND s_b > 0 AND n_a - s_a > 0 AND n_b - s_b > 0
                  THEN ((CAST(s_a AS DOUBLE) * (n_b - s_b))
                        / (CAST(s_b AS DOUBLE) * (n_a - s_a)))
                       * exp(-1.959964 * sqrt(1.0 / s_a + 1.0 / (n_a - s_a)
                                              + 1.0 / s_b + 1.0 / (n_b - s_b)))
             END, 6) AS or_ci_lo,
       ROUND(CASE WHEN s_a > 0 AND s_b > 0 AND n_a - s_a > 0 AND n_b - s_b > 0
                  THEN ((CAST(s_a AS DOUBLE) * (n_b - s_b))
                        / (CAST(s_b AS DOUBLE) * (n_a - s_a)))
                       * exp(1.959964 * sqrt(1.0 / s_a + 1.0 / (n_a - s_a)
                                             + 1.0 / s_b + 1.0 / (n_b - s_b)))
             END, 6) AS or_ci_hi,
       ROUND(2.0 * asin(sqrt(CAST(s_a AS DOUBLE) / n_a))
             - 2.0 * asin(sqrt(CAST(s_b AS DOUBLE) / n_b)), 6) AS cohens_h
FROM counts
"""


# Mantel–Haenszel (lock-step with abtest.mantel_haenszel)
def _mh_sql() -> str:
    from kkbox_churn_prediction_spark.functions.stats import two_sided_p_sql

    return f"""
WITH {_CONV_CTE},
perconv AS (
    SELECT conv_id,
           CAST(SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT) AS n_user,
           MAX(CASE WHEN tool = 'error' AND turn_idx < 5 THEN 1 ELSE 0 END) AS succ
    FROM conversations GROUP BY conv_id
),
units AS (
    SELECT LEAST(n_user, 5) AS stratum,
           CASE WHEN ({_H48.format(x="concat('mh', conv_id)")}) % 2 = 0
                THEN 'a' ELSE 'b' END AS arm,
           succ
    FROM perconv
),
per AS (
    SELECT stratum,
           CAST(SUM(CASE WHEN arm = 'a' AND succ = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
           CAST(SUM(CASE WHEN arm = 'a' AND succ = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
           CAST(SUM(CASE WHEN arm = 'b' AND succ = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
           CAST(SUM(CASE WHEN arm = 'b' AND succ = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
    FROM units GROUP BY stratum
),
red AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
           CAST(SUM(a) AS BIGINT) AS sum_a,
           CAST(SUM(a + b + c + d) AS BIGINT) AS n_units,
           SUM(CAST(FLOOR(CASE WHEN a + b + c + d > 0
                    THEN CAST(a AS DOUBLE) * d / (a + b + c + d) ELSE 0.0 END
                    * 1000000000.0) AS HUGEINT)) AS num,
           SUM(CAST(FLOOR(CASE WHEN a + b + c + d > 0
                    THEN CAST(b AS DOUBLE) * c / (a + b + c + d) ELSE 0.0 END
                    * 1000000000.0) AS HUGEINT)) AS den,
           SUM(CAST(FLOOR(CASE WHEN a + b + c + d > 0
                    THEN CAST(a + b AS DOUBLE) * (a + c) / (a + b + c + d)
                    ELSE 0.0 END * 1000000000.0) AS HUGEINT)) AS e,
           SUM(CAST(FLOOR(CASE WHEN a + b + c + d > 1
                    THEN CAST(a + b AS DOUBLE) * (c + d) * (a + c) * (b + d)
                         / (CAST(a + b + c + d AS DOUBLE)
                            * (a + b + c + d) * (a + b + c + d - 1))
                    ELSE 0.0 END * 1000000000.0) AS HUGEINT)) AS v
    FROM per
),
stat AS (
    SELECT n_strata, n_units,
           CAST(num AS DOUBLE) / 1e9 AS num_d,
           CAST(den AS DOUBLE) / 1e9 AS den_d,
           CAST(e AS DOUBLE) / 1e9 AS e_d,
           CAST(v AS DOUBLE) / 1e9 AS v_d,
           sum_a
    FROM red
),
chi AS (
    SELECT *,
           CASE WHEN v_d > 0
                THEN greatest(ABS(CAST(sum_a AS DOUBLE) - e_d) - 0.5, 0.0)
                     * greatest(ABS(CAST(sum_a AS DOUBLE) - e_d) - 0.5, 0.0) / v_d
                ELSE 0.0 END AS chi2_raw
    FROM stat
)
SELECT n_strata, n_units,
       ROUND(CASE WHEN den_d > 0 THEN num_d / den_d END, 6) AS or_mh,
       ROUND(chi2_raw, 6) AS chi2_mh,
       ROUND(CASE WHEN v_d > 0 THEN {two_sided_p_sql('sqrt(chi2_raw)')}
                  ELSE 1.0 END, 6) AS p_value
FROM chi
"""


# Temperature mixture weights (lock-step with
# sampling.mixture_temperature_weights, alpha = 0.3)
_MIXTURE_TEMP_SQL = """
WITH per AS (
    SELECT source, CAST(COUNT(*) AS DOUBLE) AS _n
    FROM documents GROUP BY source
),
tot AS (SELECT SUM(_n) AS _N FROM per),
shared AS (
    SELECT p.source, CAST(p._n AS BIGINT) AS n_rows,
           p._n / t._N AS _p,
           pow(p._n / t._N, 0.3) AS _pa
    FROM per p CROSS JOIN tot t
),
z AS (SELECT SUM(_pa) AS _Z FROM shared),
outq AS (
    SELECT s.source, s.n_rows, s._p, s._pa / z._Z AS _q
    FROM shared s CROSS JOIN z
),
ent AS (SELECT exp(-SUM(_q * ln(_q))) AS _eff FROM outq)
SELECT o.source, o.n_rows,
       ROUND(o._p, 6) AS natural_share,
       ROUND(o._q, 6) AS sampling_share,
       ROUND(o._q / o._p, 6) AS epoch_multiplier,
       ROUND(e._eff, 6) AS effective_sources
FROM outq o CROSS JOIN ent e
ORDER BY o.source
"""


def _rake_sql(n_iter: int = 3) -> str:
    """Unrolled 3-round IPF oracle (lock-step with
    sampling.rake_weights over uniform role × isodow margins)."""
    parts = [
        f"""cells AS MATERIALIZED (
    SELECT role AS r, CAST(isodow(date_trunc('day', ts)) AS INTEGER) AS c,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM conversations GROUP BY role, isodow(date_trunc('day', ts))
),
tr AS (SELECT 1.0 / COUNT(DISTINCT r) AS t FROM cells),
tc AS (SELECT 1.0 / COUNT(DISTINCT c) AS t FROM cells),
w0 AS MATERIALIZED (SELECT r, c, n, 1.0 AS w FROM cells)"""
    ]
    for i in range(1, n_iter + 1):
        j = i - 1
        parts.append(
            f"""ra{i} AS MATERIALIZED (
    SELECT w0x.r, w0x.c, w0x.n,
           w0x.w * (SELECT t FROM tr)
               * (SELECT SUM(w * n) FROM w{j}) / rs._rs AS w
    FROM w{j} w0x
    JOIN (SELECT r, SUM(w * n) AS _rs FROM w{j} GROUP BY r) rs ON w0x.r = rs.r
),
w{i} AS MATERIALIZED (
    SELECT rax.r, rax.c, rax.n,
           rax.w * (SELECT t FROM tc)
               * (SELECT SUM(w * n) FROM ra{i}) / cs._cs AS w
    FROM ra{i} rax
    JOIN (SELECT c, SUM(w * n) AS _cs FROM ra{i} GROUP BY c) cs ON rax.c = cs.c
)"""
        )
    n = n_iter
    return (
        "WITH " + _CONV_CTE.strip().lstrip("\n") + ",\n"
        + ",\n".join(parts)
        + f"""
SELECT w.r AS row_value, w.c AS col_value, w.n AS n_units,
       ROUND(w.w, 6) AS weight,
       ROUND(w.w * w.n / (SELECT SUM(w * n) FROM w{n}), 6) AS weighted_share,
       ROUND(rs._rs / (SELECT SUM(w * n) FROM w{n}), 6) AS row_share_after,
       ROUND(cs._cs / (SELECT SUM(w * n) FROM w{n}), 6) AS col_share_after
FROM w{n} w
JOIN (SELECT r, SUM(w * n) AS _rs FROM w{n} GROUP BY r) rs ON w.r = rs.r
JOIN (SELECT c, SUM(w * n) AS _cs FROM w{n} GROUP BY c) cs ON w.c = cs.c
ORDER BY row_value, col_value
"""
    )



# Anderson–Darling drift (lock-step with psi.anderson_darling_from_bins
# over the shared KS/CvM binning; per-term 1e-9 floor grid)
_AD_SQL = f"""
WITH {_CONV_CTE},
binned AS (
    SELECT CASE WHEN CAST(floor(epoch_us(CAST(date_trunc('week', ts) AS TIMESTAMP))
                            / {7 * 86400 * 1_000_000}) AS BIGINT) % 2 = 0
                THEN 'even' ELSE 'odd' END AS fold,
           CAST(LEAST(GREATEST(floor(CAST(length(text) AS BIGINT) / 5.0), 0), 9) AS INTEGER) AS bin
    FROM binned_src
),
counts AS (SELECT fold, bin, CAST(COUNT(*) AS BIGINT) AS n FROM binned GROUP BY 1, 2),
bins AS (SELECT DISTINCT bin FROM counts),
cur_grid AS (
    SELECT f.fold, b.bin
    FROM (SELECT DISTINCT fold FROM counts WHERE fold <> 'even') f
    CROSS JOIN bins b
),
cur_full AS (
    SELECT g.fold, g.bin, COALESCE(c.n, 0) AS n
    FROM cur_grid g
    LEFT JOIN counts c ON g.fold = c.fold AND g.bin = c.bin
),
ref_full AS (
    SELECT b.bin, COALESCE(c.n, 0) AS n
    FROM bins b
    LEFT JOIN (SELECT bin, n FROM counts WHERE fold = 'even') c ON b.bin = c.bin
),
cur AS (
    SELECT fold, bin, CAST(n AS BIGINT) AS n_b,
           CAST(SUM(n) OVER (PARTITION BY fold ORDER BY bin
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS _cum,
           CAST(SUM(n) OVER (PARTITION BY fold) AS BIGINT) AS _tot
    FROM cur_full
),
ref AS (
    SELECT bin, CAST(n AS BIGINT) AS rn_b,
           CAST(SUM(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS _rcum,
           CAST(SUM(n) OVER () AS BIGINT) AS _rtot
    FROM ref_full
)
SELECT c.fold,
       ROUND(CAST(SUM(CASE WHEN c._cum + r._rcum < c._tot + r._rtot THEN
                 CAST(FLOOR(
                   (CAST(c._cum AS DOUBLE) * CAST(r._rtot AS DOUBLE)
                    - CAST(r._rcum AS DOUBLE) * CAST(c._tot AS DOUBLE))
                   * (CAST(c._cum AS DOUBLE) * CAST(r._rtot AS DOUBLE)
                      - CAST(r._rcum AS DOUBLE) * CAST(c._tot AS DOUBLE))
                   * CAST(c.n_b + r.rn_b AS DOUBLE) * 1000000000.0
                   / (CAST(c._tot AS DOUBLE) * CAST(r._rtot AS DOUBLE))
                   / CAST(c._cum + r._rcum AS DOUBLE)
                   / (CAST(c._tot + r._rtot AS DOUBLE)
                      - CAST(c._cum + r._rcum AS DOUBLE))) AS HUGEINT)
             END) AS DOUBLE) / 1000000000.0, 6) AS ad,
       CAST(MAX(c._tot) AS BIGINT) AS n_cur,
       CAST(MAX(r._rtot) AS BIGINT) AS n_ref
FROM cur c JOIN ref r ON c.bin = r.bin
GROUP BY c.fold
"""
_AD_SQL = _AD_SQL.replace("FROM binned_src", "FROM conversations")


# BBSE label shift (lock-step with calibration.label_shift_estimate)
_BBSE_SQL = f"""
WITH {_PRED_CTE},
flags AS (
    SELECT fold, y, CASE WHEN p >= 0.5 THEN 1 ELSE 0 END AS yh FROM preds
),
one AS (
    SELECT CAST(SUM(CASE WHEN fold = 'a' AND y = 1 AND yh = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(SUM(CASE WHEN fold = 'a' AND y = 1 AND yh = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           CAST(SUM(CASE WHEN fold = 'a' AND y = 0 AND yh = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(SUM(CASE WHEN fold = 'a' AND y = 0 AND yh = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
           CAST(SUM(CASE WHEN fold = 'b' AND yh = 1 THEN 1 ELSE 0 END) AS BIGINT) AS t1,
           CAST(SUM(CASE WHEN fold = 'b' AND yh = 0 THEN 1 ELSE 0 END) AS BIGINT) AS t0
    FROM flags
),
calc AS (
    SELECT *,
           CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / (tp + fn) END AS tpr,
           CASE WHEN fp + tn > 0 THEN CAST(fp AS DOUBLE) / (fp + tn) END AS fpr,
           CAST(t1 AS DOUBLE) / (t1 + t0) AS mu
    FROM one
),
q AS (
    SELECT *,
           CASE WHEN ABS(tpr - fpr) > 1e-9 THEN (mu - fpr) / (tpr - fpr) END AS q_raw
    FROM calc
)
SELECT CAST(tp + fn + fp + tn AS BIGINT) AS n_source,
       CAST(t1 + t0 AS BIGINT) AS n_target,
       ROUND(CAST(tp + fn AS DOUBLE) / (tp + fn + fp + tn), 6) AS source_prior,
       ROUND(tpr, 6) AS tpr,
       ROUND(fpr, 6) AS fpr,
       ROUND(mu, 6) AS target_pred_rate,
       ROUND(q_raw, 6) AS target_prior_raw,
       ROUND(LEAST(GREATEST(q_raw, 0.0), 1.0), 6) AS target_prior_est,
       ROUND(tpr - fpr, 6) AS confusion_det,
       ROUND(CASE WHEN tp + fn > 0
                  THEN LEAST(GREATEST(q_raw, 0.0), 1.0)
                       / (CAST(tp + fn AS DOUBLE) / (tp + fn + fp + tn)) END, 6)
           AS pos_weight
FROM q
"""


# Harrell C-index (lock-step with survival.survival_c_index over the
# activity risk score; bounded duration×score grid, window algebra)
_C_INDEX_SQL = f"""
WITH {_SURVIVAL_CORE},
score AS (
    SELECT conv_id, CAST(LEAST(COUNT(*), 1000) AS BIGINT) AS s
    FROM conversations GROUP BY conv_id
),
base AS (
    SELECT l.duration_days AS t, l.observed AS e, sc.s
    FROM labels l JOIN score sc ON l.conv_id = sc.conv_id
),
cells AS (
    SELECT t, s, CAST(COUNT(*) AS BIGINT) AS m, CAST(SUM(e) AS BIGINT) AS ev
    FROM base GROUP BY t, s
),
sgrid AS (
    SELECT tt.t, ss.s
    FROM (SELECT DISTINCT t FROM cells) tt
    CROSS JOIN (SELECT DISTINCT s FROM cells) ss
),
fullg AS (
    SELECT g.t, g.s, COALESCE(c.m, 0) AS m, COALESCE(c.ev, 0) AS ev
    FROM sgrid g LEFT JOIN cells c ON g.t = c.t AND g.s = c.s
),
aft AS (
    SELECT t, s, ev,
           CAST(COALESCE(SUM(m) OVER (PARTITION BY s ORDER BY t DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS _aft
    FROM fullg
),
terms AS (
    SELECT ev,
           ev * CAST(COALESCE(SUM(_aft) OVER (PARTITION BY t ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS _conc,
           ev * _aft AS _tie,
           ev * CAST(SUM(_aft) OVER (PARTITION BY t) AS BIGINT) AS _comp
    FROM aft
),
red AS (
    SELECT CAST(SUM(_conc) AS BIGINT) AS n_concordant,
           CAST(SUM(_tie) AS BIGINT) AS n_tied_score,
           CAST(SUM(_comp) AS BIGINT) AS n_comparable_pairs
    FROM terms
),
nu AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_units FROM base)
SELECT nu.n_units, red.n_comparable_pairs, red.n_concordant, red.n_tied_score,
       ROUND(CASE WHEN red.n_comparable_pairs > 0
                  THEN (CAST(red.n_concordant AS DOUBLE)
                        + 0.5 * CAST(red.n_tied_score AS DOUBLE))
                       / CAST(red.n_comparable_pairs AS DOUBLE) END, 6) AS c_index
FROM red CROSS JOIN nu
"""



def _by_fdr_sql() -> str:
    """BY oracle: the BH oracle with the c(m) = Σ1/i dependence
    factor spliced into the step-up (ascending finite sum — the same
    order Python's driver loop uses)."""
    out = _BH_FDR_SQL.replace(
        "m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM pv),",
        "m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM pv),\n"
        "cm AS (SELECT SUM(1.0 / g.i) AS c\n"
        "       FROM generate_series(1, 1000000) g(i), m\n"
        "       WHERE g.i <= CAST(m.m AS BIGINT)),",
    )
    out = out.replace(
        "MIN(p_raw * m / CAST(rank AS DOUBLE))",
        "MIN(p_raw * m * c / CAST(rank AS DOUBLE))",
    )
    out = out.replace("FROM ranked, m", "FROM ranked, m, cm")
    return out


# Threshold sweep (lock-step with calibration.threshold_sweep)
def _threshold_sweep_sql() -> str:
    ths = [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]
    branches = "\nUNION ALL\n".join(
        f"""SELECT CAST({t} AS DOUBLE) AS threshold,
       CAST(SUM(CASE WHEN p >= {t} AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       CAST(SUM(CASE WHEN p >= {t} THEN 1 ELSE 0 END) AS BIGINT) AS pp,
       CAST(SUM(y) AS BIGINT) AS pos,
       CAST(COUNT(*) AS BIGINT) AS n
FROM preds"""
        for t in ths
    )
    return f"""
WITH {_PRED_CTE},
sweep AS (
{branches}
)
SELECT ROUND(threshold, 6) AS threshold,
       tp,
       CAST(pp - tp AS BIGINT) AS fp,
       CAST(pos - tp AS BIGINT) AS fn,
       CAST(n - pos - (pp - tp) AS BIGINT) AS tn,
       ROUND(CASE WHEN pp > 0 THEN CAST(tp AS DOUBLE) / CAST(pp AS DOUBLE) END, 6)
           AS precision,
       ROUND(CASE WHEN pos > 0 THEN CAST(tp AS DOUBLE) / CAST(pos AS DOUBLE) END, 6)
           AS recall,
       ROUND(CASE WHEN (CASE WHEN pp > 0 THEN CAST(tp AS DOUBLE) / CAST(pp AS DOUBLE) END)
                       + (CASE WHEN pos > 0 THEN CAST(tp AS DOUBLE) / CAST(pos AS DOUBLE) END)
                       > 0
                  THEN 2.0 * (CAST(tp AS DOUBLE) / CAST(pp AS DOUBLE))
                       * (CAST(tp AS DOUBLE) / CAST(pos AS DOUBLE))
                       / ((CAST(tp AS DOUBLE) / CAST(pp AS DOUBLE))
                          + (CAST(tp AS DOUBLE) / CAST(pos AS DOUBLE)))
                  ELSE 0.0 END, 6) AS f1,
       ROUND((CAST(tp AS DOUBLE) + (n - pos - (pp - tp))) / CAST(n AS DOUBLE), 6)
           AS accuracy
FROM sweep
ORDER BY threshold
"""


# LSH parameter plan (lock-step with dedup.lsh_parameter_plan)
_LSH_PLAN_SQL = """
WITH bands AS (SELECT unnest([2, 4, 8, 16, 32, 64]) AS b),
rws AS (SELECT unnest([1, 2, 4, 8]) AS r),
grid AS (
    SELECT b, r FROM bands CROSS JOIN rws WHERE b * r <= 256
)
SELECT CAST(b AS INTEGER) AS bands,
       CAST(r AS INTEGER) AS rows_per_band,
       CAST(b * r AS INTEGER) AS n_hashes,
       ROUND(pow(1.0 / b, 1.0 / r), 6) AS threshold,
       ROUND(1.0 - pow(1.0 - pow(0.4, r), b), 6) AS p_at_below,
       ROUND(1.0 - pow(1.0 - pow(0.8, r), b), 6) AS p_at_target,
       ROUND(1.0 - pow(1.0 - pow(0.9, r), b), 6) AS p_at_above
FROM grid
ORDER BY bands, rows_per_band
"""



# Streaming left-outer range join (lock-step with
# streaming/joins.stream_left_pairs over the bounded replay: every
# user turn LEFT JOIN answering assistant turns within 2h; flush
# sentinels are engine-side only and never reach the result)

_STREAM_FULL_JOIN_SQL = """
WITH t AS (
    SELECT concat('c', user_id) AS conv_id,
           event_id AS turn_idx,
           CASE event_type WHEN 'signup' THEN 'system'
                           WHEN 'purchase' THEN 'assistant'
                           WHEN 'error' THEN 'tool'
                           ELSE 'user' END AS role,
           CAST(ts AS TIMESTAMP) AS ts
    FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
u AS (SELECT conv_id, ts AS u_ts, turn_idx AS u_idx FROM t WHERE role = 'user'),
a AS (SELECT conv_id, ts AS a_ts, turn_idx AS a_idx FROM t WHERE role = 'assistant'),
pairs AS (
    SELECT COALESCE(u.conv_id, a.conv_id) AS conv_id,
           u.u_idx, a.a_idx,
           CASE WHEN u.u_idx IS NOT NULL AND a.a_idx IS NOT NULL
                THEN 1 ELSE 0 END AS answered,
           CASE WHEN u.u_idx IS NULL THEN 1 ELSE 0 END AS orphan
    FROM u FULL JOIN a
      ON u.conv_id = a.conv_id
     AND a.a_ts > u.u_ts AND a.a_ts <= u.u_ts + INTERVAL 2 HOUR
)
SELECT conv_id,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(answered) AS BIGINT) AS n_answered_pairs,
       CAST(SUM(CASE WHEN answered = 0 AND orphan = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_unanswered,
       CAST(SUM(orphan) AS BIGINT) AS n_orphan_answers
FROM pairs
GROUP BY conv_id
ORDER BY conv_id
"""


_STREAM_LEFT_JOIN_SQL = """
WITH t AS (
    SELECT concat('c', user_id) AS conv_id,
           event_id AS turn_idx,
           CASE event_type WHEN 'signup' THEN 'system'
                           WHEN 'purchase' THEN 'assistant'
                           WHEN 'error' THEN 'tool'
                           ELSE 'user' END AS role,
           CAST(ts AS TIMESTAMP) AS ts
    FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
u AS (SELECT conv_id, ts AS u_ts, turn_idx AS u_idx FROM t WHERE role = 'user'),
a AS (SELECT conv_id, ts AS a_ts, turn_idx AS a_idx FROM t WHERE role = 'assistant'),
pairs AS (
    SELECT u.conv_id, u.u_idx, a.a_idx,
           CASE WHEN a.a_idx IS NOT NULL THEN 1 ELSE 0 END AS answered
    FROM u LEFT JOIN a
      ON u.conv_id = a.conv_id
     AND a.a_ts > u.u_ts AND a.a_ts <= u.u_ts + INTERVAL 2 HOUR
)
SELECT conv_id,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(answered) AS BIGINT) AS n_answered_pairs,
       CAST(SUM(1 - answered) AS BIGINT) AS n_unanswered
FROM pairs
GROUP BY conv_id
ORDER BY conv_id
"""



# Event study (lock-step with abtest.event_study over the hash-parity
# cohorts × corpus-midpoint intervention)
_EVENT_STUDY_SQL = f"""
WITH {_CONV_CTE},
per AS (
    SELECT conv_id,
           CAST(floor(epoch_us(CAST(date_trunc('week', ts) AS TIMESTAMP))
                      / {7 * 86400 * 1_000_000}) AS BIGINT) AS w,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM conversations GROUP BY 1, 2
),
b AS (SELECT CAST(MIN(w) AS BIGINT) AS mn, CAST(MAX(w) AS BIGINT) AS mx FROM per),
units AS (
    SELECT CASE WHEN ({_H48.format(x="concat('es', conv_id)")}) % 2 = 0
                THEN 1 ELSE 0 END AS t,
           CAST(w - CAST(floor((mn + mx) / 2) AS BIGINT) AS INTEGER) AS r,
           n
    FROM per, b
),
agg AS (
    SELECT r AS rel_period,
           CAST(SUM(t) AS BIGINT) AS n_t,
           CAST(SUM(1 - t) AS BIGINT) AS n_c,
           CAST(SUM(CASE WHEN t = 1 THEN n ELSE 0 END) AS BIGINT) AS sy_t,
           CAST(SUM(CASE WHEN t = 0 THEN n ELSE 0 END) AS BIGINT) AS sy_c
    FROM units WHERE r BETWEEN -4 AND 4
    GROUP BY r
),
withgap AS (
    SELECT rel_period, n_t, n_c,
           CAST(sy_t AS DOUBLE) / CAST(n_t AS DOUBLE) AS mt,
           CAST(sy_c AS DOUBLE) / CAST(n_c AS DOUBLE) AS mc,
           CASE WHEN n_t > 0 AND n_c > 0
                THEN CAST(sy_t AS DOUBLE) / CAST(n_t AS DOUBLE)
                     - CAST(sy_c AS DOUBLE) / CAST(n_c AS DOUBLE) END AS gap
    FROM agg
),
anchor AS (SELECT gap AS anchor_gap FROM withgap WHERE rel_period = -1)
SELECT w.rel_period,
       w.n_t AS n_treated, w.n_c AS n_control,
       ROUND(w.mt, 6) AS mean_treated,
       ROUND(w.mc, 6) AS mean_control,
       ROUND(w.gap, 6) AS gap,
       ROUND(w.gap - a.anchor_gap, 6) AS coef
FROM withgap w CROSS JOIN anchor a
ORDER BY w.rel_period
"""


# Pairwise KS matrix (lock-step with psi.ks_pair_matrix over document
# lengths, width-100 20-bin grid)
_KS_MATRIX_SQL = """
WITH binned AS (
    SELECT source,
           CAST(LEAST(GREATEST(floor(CAST(length(text) AS BIGINT) / 100.0), 0), 19)
                AS INTEGER) AS bin
    FROM documents
),
counts AS (
    SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS n
    FROM binned GROUP BY 1, 2
),
groups AS (SELECT DISTINCT source FROM counts),
bins AS (SELECT DISTINCT bin FROM counts),
fullg AS (
    SELECT g.source, b.bin, COALESCE(c.n, 0) AS n
    FROM groups g CROSS JOIN bins b
    LEFT JOIN counts c ON g.source = c.source AND b.bin = c.bin
),
cdf AS (
    SELECT source, bin,
           CAST(SUM(n) OVER (PARTITION BY source ORDER BY bin
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS _cum,
           CAST(SUM(n) OVER (PARTITION BY source) AS BIGINT) AS _tot
    FROM fullg
),
pairs AS (
    SELECT l.source AS group_a, r.source AS group_b, l.bin,
           ABS(CAST(l._cum AS HUGEINT) * CAST(r._tot AS HUGEINT)
               - CAST(r._cum AS HUGEINT) * CAST(l._tot AS HUGEINT)) AS gap,
           l._tot AS na, r._tot AS nb
    FROM cdf l JOIN cdf r ON l.bin = r.bin AND l.source < r.source
)
SELECT group_a, group_b,
       ROUND(CAST(MAX(gap) AS DOUBLE)
             / (CAST(MAX(na) AS DOUBLE) * CAST(MAX(nb) AS DOUBLE)), 6) AS ks,
       CAST(MAX(na) AS BIGINT) AS n_a,
       CAST(MAX(nb) AS BIGINT) AS n_b
FROM pairs
GROUP BY group_a, group_b
ORDER BY group_a, group_b
"""


def _ab_pvalue_sql() -> str:
    """proportion_tool_use oracle wrapped with the lock-step A&S
    normal-CDF polynomial (functions/stats.normal_cdf_sql)."""
    from kkbox_churn_prediction_spark.functions.stats import two_sided_p_sql

    return (
        f"SELECT *, ROUND({two_sided_p_sql('z_stat')}, 6) AS p_two "
        f"FROM ({_PROPORTION_TOOL_USE_SQL})"
    )



# Quality classifier (lock-step with operators/quality_model.py:
# hashed md5-prefix token-count buckets clipped at 10, label = the
# Gopher all-rules pass, then 24 unrolled damped diagonal-Newton
# steps on the exact 1e-9 integer weight grid -- every gradient /
# Hessian sum is exact-integer (HUGEINT), the sigmoid is the one
# transcendental with the identical expression shape, immediately
# HALF_UP re-quantized, so both engines walk the same grid points)
_QM_D = 16
_QM_ITERS = 24


def _quality_feats_cte() -> str:
    h = _H48.format(x="w")
    return rf"""
qm_lab AS MATERIALIZED (
    SELECT doc_id,
           CASE WHEN len({_TOKS}) BETWEEN 20 AND 100000
                AND length(regexp_replace({_NORM}, '[ \t\n\x0B\f\r]', '', 'g')) * 1.0
                    / greatest(len({_TOKS}), 1) >= 3.0
                AND length(regexp_replace({_NORM}, '[ \t\n\x0B\f\r]', '', 'g')) * 1.0
                    / greatest(len({_TOKS}), 1) <= 10.0
                AND length(regexp_replace(text, '[^!-/:-@\[-`{{-~]', '', 'g')) * 1.0
                    / greatest(length(text), 1) <= 0.2
                AND len(list_filter({_TOKS}, t -> regexp_matches(t, '[a-z]'))) * 1.0
                    / greatest(len({_TOKS}), 1) >= 0.8
                AND 1.0 - len(list_distinct({_TOKS})) * 1.0
                    / greatest(len({_TOKS}), 1) <= 0.6
           THEN 1 ELSE 0 END AS y
    FROM documents
),
qm_tok AS (
    SELECT doc_id, unnest({_TOKS}) AS w FROM documents
),
qm_cnt AS (
    SELECT doc_id, ({h}) % {_QM_D} AS j, LEAST(COUNT(*), 10) AS x
    FROM qm_tok GROUP BY 1, 2
),
qm_feats AS MATERIALIZED (
    SELECT c.doc_id, l.y, c.j, CAST(c.x AS BIGINT) AS x
    FROM qm_cnt c JOIN qm_lab l USING (doc_id)
    UNION ALL
    SELECT doc_id, y, {_QM_D} AS j, CAST(1 AS BIGINT) AS x FROM qm_lab
),
qm_w0 AS (SELECT j, CAST(0 AS BIGINT) AS wq FROM generate_series(0, {_QM_D}) t(j))"""


def _quality_iter_ctes(n_iter: int = _QM_ITERS) -> str:
    sig = (
        "1.0 / (1.0 + exp(-least(greatest("
        "CAST(zq AS DOUBLE) / 1000000000.0, -30.0), 30.0)))"
    )
    steps = []
    for i in range(1, n_iter + 1):
        steps.append(f"""
qm_z{i} AS MATERIALIZED (
    SELECT f.doc_id, f.y, CAST(SUM(f.x * w.wq) AS BIGINT) AS zq
    FROM qm_feats f JOIN qm_w{i - 1} w USING (j) GROUP BY 1, 2
),
qm_p{i} AS MATERIALIZED (
    SELECT doc_id,
           y * 1000000000 - CAST(ROUND(({sig}) * 1000000000.0) AS BIGINT) AS rq,
           GREATEST(CAST(ROUND(({sig}) * (1.0 - ({sig})) * 1000000000.0)
                         AS BIGINT), 10000000) AS hq
    FROM qm_z{i}
),
qm_g{i} AS MATERIALIZED (
    SELECT f.j,
           SUM(CAST(f.x AS HUGEINT) * p.rq) AS g,
           SUM(CAST(f.x AS HUGEINT) * f.x * p.hq) AS h
    FROM qm_feats f JOIN qm_p{i} p USING (doc_id) GROUP BY 1
),
qm_w{i} AS MATERIALIZED (
    SELECT w.j,
           w.wq + CAST(ROUND(0.1 * (CAST(COALESCE(g.g, 0) AS DOUBLE)
                     / (CAST(COALESCE(g.h, 0) AS DOUBLE) + 1000000000.0))
                     * 1000000000.0) AS BIGINT) AS wq
    FROM qm_w{i - 1} w LEFT JOIN qm_g{i} g USING (j)
)""")
    return ",".join(steps)


def _quality_fit_sql() -> str:
    return f"""
WITH {_quality_feats_cte()},{_quality_iter_ctes()}
SELECT CAST(w.j AS INTEGER) AS feature,
       ROUND(CAST(w.wq AS DOUBLE) / 1000000000.0, 6) AS weight,
       CASE WHEN w.j = {_QM_D} THEN t.n_docs
            ELSE COALESCE(s.n_docs_with, CAST(0 AS BIGINT)) END AS n_docs_with,
       t.n_docs, t.n_pos
FROM qm_w{_QM_ITERS} w
LEFT JOIN (
    SELECT j, CAST(COUNT(*) AS BIGINT) AS n_docs_with
    FROM qm_feats WHERE j < {_QM_D} GROUP BY 1
) s USING (j),
(SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(y) AS BIGINT) AS n_pos FROM qm_lab) t
ORDER BY feature
"""


def _quality_apply_sql() -> str:
    sig = (
        "1.0 / (1.0 + exp(-least(greatest("
        "CAST(zq AS DOUBLE) / 1000000000.0, -30.0), 30.0)))"
    )
    return f"""
WITH {_quality_feats_cte()},{_quality_iter_ctes()},
qm_pub AS (
    SELECT j, CAST(ROUND(ROUND(CAST(wq AS DOUBLE) / 1000000000.0, 6)
                         * 1000000000.0) AS BIGINT) AS wq
    FROM qm_w{_QM_ITERS}
),
qm_sc AS (
    SELECT f.doc_id, f.y, CAST(SUM(f.x * p.wq) AS BIGINT) AS zq
    FROM qm_feats f JOIN qm_pub p USING (j) GROUP BY 1, 2
)
SELECT doc_id, y,
       ROUND({sig}, 6) AS quality_prob,
       CAST(zq >= 0 AS INTEGER) AS pred_pass
FROM qm_sc ORDER BY doc_id
"""


def _quality_stream_score_sql() -> str:
    """streaming_quality_scores oracle: the batch apply SQL (the
    stream-static scorer is exactly-equal to batch apply by the
    integer-grid contract) + the keep/drop route CASE on the same
    exact zq sign."""
    sig = (
        "1.0 / (1.0 + exp(-least(greatest("
        "CAST(zq AS DOUBLE) / 1000000000.0, -30.0), 30.0)))"
    )
    return f"""
WITH {_quality_feats_cte()},{_quality_iter_ctes()},
qm_pub AS (
    SELECT j, CAST(ROUND(ROUND(CAST(wq AS DOUBLE) / 1000000000.0, 6)
                         * 1000000000.0) AS BIGINT) AS wq
    FROM qm_w{_QM_ITERS}
),
qm_sc AS (
    SELECT f.doc_id, f.y, CAST(SUM(f.x * p.wq) AS BIGINT) AS zq
    FROM qm_feats f JOIN qm_pub p USING (j) GROUP BY 1, 2
)
SELECT doc_id, y,
       ROUND({sig}, 6) AS quality_prob,
       CAST(zq >= 0 AS INTEGER) AS pred_pass,
       CASE WHEN zq >= 0 THEN 'keep' ELSE 'drop' END AS route
FROM qm_sc ORDER BY doc_id
"""


def oracle_sql() -> dict[str, str]:
    return {
        "asof_features": _asof_oracle(),
        "sessionize": _SESSIONIZE_SQL,
        "lag_lead": _LAG_LEAD_SQL,
        "turn_labels": _TURN_LABELS_SQL,
        "entity_labels": _ENTITY_LABELS_SQL,
        "history_lags": _HISTORY_LAGS_SQL,
        "psi_text_len": _PSI_TEXT_LEN_SQL,
        "leakage_audit": _LEAKAGE_AUDIT_SQL,
        "dedup_exact": _DEDUP_EXACT_SQL,
        "dedup_ngram_jaccard": _DEDUP_NGRAM_JACCARD_SQL,
        "dedup_containment": _DEDUP_CONTAINMENT_SQL,
        "minhash_signatures": _MINHASH_SQL,
        "simhash": _SIMHASH_SQL,
        "embedding_topk": _EMB_TOPK_SQL,
        "ann_recall": _ANN_RECALL_SQL,
        "embedding_diversity": _EMB_DIVERSITY_SQL,
        "embedding_topk_lsh": _EMB_TOPK_LSH_SQL,
        "lang_id": _lang_id_oracle(),
        "text_quality": _TEXT_QUALITY_SQL,
        "token_stats": _TOKEN_STATS_SQL,
        "fingerprint_docs": _FINGERPRINT_SQL,
        "mode_tool": _MODE_TOOL_SQL,
        "last_role": _LAST_ROLE_SQL,
        "daily_engagement": _DAILY_ENGAGEMENT_SQL,
        "session_percentiles": _SESSION_PERCENTILES_SQL,
        "topk_busiest": _TOPK_BUSIEST_SQL,
        "semi_join_tool_users": _SEMI_JOIN_SQL,
        "pivot_role_counts": _PIVOT_ROLE_SQL,
        "unpivot_role_counts": _UNPIVOT_ROLE_SQL,
        "union_dedup_activity": _UNION_DEDUP_SQL,
        "q1_pricing_summary": _Q1_SQL,
        "session_assignment": _SESSION_ASSIGN_SQL,
        "rolling_turn_stats": _ROLLING_SQL,
        "tumbling_activity": _TUMBLING_SQL,
        "trend_features": _TREND_SQL.format(asof=_asof_oracle()),
        "backtest_folds": _BACKTEST_FOLDS_SQL.format(
            asof=_asof_oracle(), labels=_ENTITY_LABELS_SQL
        ),
        "backtest_folds_expanding": _BACKTEST_FOLDS_SQL.format(
            asof=_asof_expanding_oracle(), labels=_ENTITY_LABELS_SQL
        ),
        "cv_fold_assignment": _CV_FOLD_ASSIGNMENT_SQL,
        "dedup_minhash_lsh": _MINHASH_LSH_SQL,
        "neardup_embedding": _NEARDUP_EMB_SQL,
        "embedding_topk_ivf": _IVF_SQL,
        "multimodal_features": _MULTIMODAL_SQL,
        "media_resize": _MEDIA_RESIZE_SQL,
        "media_token_cost": _MEDIA_TOKEN_COST_SQL,
        "multimodal_token_budget": _MULTIMODAL_BUDGET_SQL,
        "quintile_stats": _QUINTILE_SQL,
        "sales_by_region": _SALES_BY_REGION_SQL,
        "asof_entity_grid": _asof_entity_grid_oracle(),
        "psi_quantile": _PSI_QUANTILE_SQL,
        "psi_categorical": _PSI_CATEGORICAL_SQL,
        "feature_validation": _feature_validation_oracle(),
        "streaming_closed_sessions": _STREAMING_SESSIONS_SQL,
        "streaming_asof_depth": _STREAMING_ASOF_SQL,
        "reliability_diagram": _RELIABILITY_SQL,
        "calibration_ece": _ECE_SQL,
        "gains_table": _GAINS_SQL,
        "brier_decomposition": _BRIER_DECOMP_SQL,
        "label_noise": _LABEL_NOISE_SQL,
        "feature_label_corr": _FEATURE_CORR_SQL,
        "collapse_rare_tools": _COLLAPSE_RARE_SQL,
        "eb_tool_rates": _EB_TOOL_RATES_SQL,
        "weekly_latency_sla": _WEEKLY_SLA_SQL,
        "isotonic_apply": _ISOTONIC_APPLY_SQL,
        "weekly_bounce_rate": _WEEKLY_BOUNCE_SQL,
        "calibration_metrics": _CALIBRATION_METRICS_SQL,
        "bootstrap_ci": _BOOTSTRAP_CI_SQL,
        "auc_by_fold": _AUC_SQL,
        "isotonic_calibration": _ISOTONIC_SQL,
        "platt_calibration": _platt_oracle(),
        "platt_apply": _platt_oracle(apply=True),
        "error_by_segment": _ERROR_BY_SEGMENT_SQL,
        "hardest_examples": _HARDEST_EXAMPLES_SQL,
        "confusion_costs": _CONFUSION_COSTS_SQL,
        "dedup_components": _DEDUP_COMPONENTS_SQL,
        "curate_corpus": _curation_oracle(),
        "curation_report": _curation_report_oracle(),
        "stratified_sample": _STRATIFIED_SAMPLE_SQL,
        "token_budget_select": _TOKEN_BUDGET_SQL,
        "match_token_distribution": _MATCH_TOKEN_DIST_SQL,
        "cluster_safe_split": _CLUSTER_SPLIT_SQL,
        "capped_per_source": _CAPPED_PER_SOURCE_SQL,
        "weighted_sample": _WEIGHTED_SAMPLE_SQL,
        "pack_documents": _PACK_DOCUMENTS_SQL,
        "tfidf_top_terms": _TFIDF_SQL,
        "bm25_search": _bm25_oracle(_BM25_TERMS, k=20),
        "vocab_oov": _VOCAB_OOV_SQL,
        "gap_percentiles": _GAP_PCTL_SQL,
        "fuzzy_pairs": _FUZZY_PAIRS_SQL,
        "decontaminate": _DECONTAMINATE_SQL,
        "cluster_centroids": _CLUSTER_CENTROIDS_SQL,
        "response_latency": _RESPONSE_LATENCY_SQL,
        "streaming_drift_counts": _STREAMING_DRIFT_SQL,
        "streaming_enriched_counts": _STREAMING_ENRICHED_SQL,
        "streaming_turn_pairs": _STREAMING_PAIRS_SQL,
        "quantize_embeddings": _QUANTIZE_SQL,
        "assemble_documents": _ASSEMBLE_SQL,
        "corpus_pipeline": _corpus_pipeline_oracle(),
        "unigram_logprob": _UNIGRAM_LOGPROB_SQL,
        "dsir_scores": _DSIR_SQL,
        "distinctive_terms": _DISTINCTIVE_TERMS_SQL,
        "fold_standardize": _FOLD_STANDARDIZE_SQL,
        "chunk_documents": _CHUNK_DOCUMENTS_SQL,
        "rollup_activity": _ROLLUP_ACTIVITY_SQL,
        "cube_activity": _CUBE_ACTIVITY_SQL,
        "set_ops_convs": _SET_OPS_SQL,
        "scd2_role_intervals": _SCD2_ROLE_INTERVALS_SQL,
        "interval_session_join": _INTERVAL_SESSION_JOIN_SQL,
        "resample_daily_activity": _RESAMPLE_DAILY_SQL,
        "repetition_stats": _REPETITION_STATS_SQL,
        "bigram_pmi": _BIGRAM_PMI_SQL,
        "zorder_keys": _ZORDER_KEYS_SQL,
        "profile_orders": _PROFILE_ORDERS_SQL,
        "target_encode_role": _TARGET_ENCODE_ROLE_SQL,
        "standardize_text_len": _STANDARDIZE_TEXT_LEN_SQL,
        "hashed_cross_features": _HASHED_CROSS_SQL,
        "mi_role_tooluse": _MI_ROLE_TOOLUSE_SQL,
        "chi2_role_tool": _CHI2_ROLE_TOOL_SQL,
        "role_transitions": _ROLE_TRANSITIONS_SQL,
        "hll_weekly_rollup": _HLL_WEEKLY_ROLLUP_SQL,
        "negative_samples": _NEGATIVE_SAMPLES_SQL,
        "json_props_stats": _JSON_PROPS_STATS_SQL,
        "decayed_features": _DECAYED_FEATURES_SQL,
        "survival_labels": _SURVIVAL_LABELS_SQL,
        "km_curve": _KM_CURVE_SQL,
        "interarrival_stats": _INTERARRIVAL_STATS_SQL,
        "activity_profile": _ACTIVITY_PROFILE_SQL,
        "activity_trend": _ACTIVITY_TREND_SQL,
        "daily_regularity": _DAILY_REGULARITY_SQL,
        "shard_profile": _SHARD_PROFILE_SQL,
        "redact_pii": _REDACT_PII_SQL,
        "cms_weekly_tools": _CMS_WEEKLY_TOOLS_SQL,
        "funnel_steps": _FUNNEL_STEPS_SQL,
        "funnel_rollup": _FUNNEL_ROLLUP_SQL,
        "rfm_scores": _RFM_SCORES_SQL,
        "cohort_retention": _COHORT_RETENTION_SQL,
        "hopping_activity": _HOPPING_ACTIVITY_SQL,
        "ab_test_text_len": _AB_TEST_TEXT_LEN_SQL,
        "turn_taking": _TURN_TAKING_SQL,
        "streaming_dedup_counts": _STREAMING_DEDUP_SQL,
        "daily_anomalies": _DAILY_ANOMALIES_SQL,
        "engagement_regression": _ENGAGEMENT_REGRESSION_SQL,
        "corr_matrix": _CORR_MATRIX_SQL,
        "peak_concurrency": _PEAK_CONCURRENCY_SQL,
        "risk_buckets": _RISK_BUCKETS_SQL,
        "weekly_quantile_sketch": _WEEKLY_QSKETCH_SQL,
        "debounce_events": _DEBOUNCE_SQL,
        "topk_days_per_conv": _TOPK_DAYS_SQL,
        "q3_shipping_priority": _Q3_SQL,
        "q6_forecast_revenue": _Q6_SQL,
        "q14_promo_share": _Q14_SQL,
        "top_suppliers_per_nation": _TOP_SUPPLIERS_SQL,
        "rank_normalize_turns": _RANK_NORM_SQL,
        "term_cooccurrence": _COOCCURRENCE_SQL,
        "activity_clock": _ACTIVITY_CLOCK_SQL,
        "wasserstein_text_len": _WASSERSTEIN_SQL,
        "jsd_text_len": _JSD_SQL,
        "episode_segments": _EPISODE_SQL,
        "cdc_latest_state": _CDC_SQL,
        "gini_activity": _GINI_SQL,
        "mad_outliers": _MAD_SQL,
        "role_entropy": _ROLE_ENTROPY_SQL,
        "daily_autocorr": _DAILY_AUTOCORR_SQL,
        "neyman_allocation": _NEYMAN_SQL,
        "k_anonymity": _K_ANONYMITY_SQL,
        "k_anonymity_summary": _K_ANONYMITY_SUMMARY_SQL,
        "l_diversity": _L_DIVERSITY_SQL,
        "t_closeness": _T_CLOSENESS_SQL,
        "ks_text_len": _KS_SQL,
        "tokenizer_fertility": _fertility_oracle(),
        "mde_text_len": _MDE_TEXT_LEN_SQL,
        "covariate_balance": _COVARIATE_BALANCE_SQL,
        "refusal_rate_weekly": _REFUSAL_RATE_WEEKLY_SQL,
        "daily_anomalies_adj": _DAILY_ANOMALIES_ADJ_SQL,
        "daily_anomalies_online": _DAILY_ANOMALIES_ONLINE_SQL,
        "did_turns": _DID_TURNS_SQL,
        "asof_last_event": _ASOF_LAST_EVENT_SQL,
        "asof_next_event": _ASOF_NEXT_EVENT_SQL,
        "session_gap_sensitivity": _SESSION_GAP_SENSITIVITY_SQL,
        "streaming_srm_arms": _STREAMING_SRM_SQL,
        "dedup_effective_size": _DEDUP_EFFECTIVE_SIZE_SQL,
        "dow_seasonality": _DOW_SEASONALITY_SQL,
        "label_rate_by_horizon": _LABEL_RATE_BY_HORIZON_SQL,
        "ewma_daily": _EWMA_DAILY_SQL,
        "qq_shift_text_len": _QQ_SHIFT_SQL,
        "spearman_turns_textlen": _SPEARMAN_SQL,
        "transition_backtest": _TRANSITION_BACKTEST_SQL,
        "source_tf_cosine": _SOURCE_TF_COSINE_SQL,
        "ndcg_lsh": _NDCG_LSH_SQL,
        "logrank_cohorts": _LOGRANK_SQL,
        "cuped_turns": _CUPED_TURNS_SQL,
        "proportion_tool_use": _PROPORTION_TOOL_USE_SQL,
        "srm_arms": _SRM_ARMS_SQL,
        "distinct_ngrams": _DISTINCT_NGRAMS_SQL,
        "readability": _READABILITY_SQL,
        "random_projection": _random_projection_oracle(),
        "winsorize_value": _WINSORIZE_VALUE_SQL,
        "winsorize_audit": _WINSORIZE_AUDIT_SQL,
        "label_agreement_kappa": _KAPPA_SQL,
        "embedding_outliers": _EMB_OUTLIERS_SQL,
        "table_checksum": _TABLE_CHECKSUM_SQL,
        "snapshot_diff": _SNAPSHOT_DIFF_SQL,
        "supplier_pagerank": _PAGERANK_SQL,
        "bpe_pair_counts": _BPE_PAIRS_SQL,
        "cusum_drift": _CUSUM_SQL,
        "cooccurrence_triangles": _TRIANGLES_SQL,
        "dedup_canonical": _DEDUP_CANONICAL_SQL,
        "dedup_weights": _DEDUP_WEIGHTS_SQL,
        "rrf_fusion": _RRF_SQL,
        "bigram_logprob": _BIGRAM_LOGPROB_SQL,
        "streaming_cms_tools": _STREAMING_CMS_SQL,
        "blocklist_filter": _BLOCKLIST_SQL,
        "embedding_drift": _EMB_DRIFT_SQL,
        "source_datacard": _source_datacard_oracle(),
        "duplicate_spans": _DUP_SPANS_SQL,
        "embedding_covariance": _EMB_COV_SQL,
        "source_overlap": _SOURCE_OVERLAP_SQL,
        "zipf_stats": _ZIPF_SQL,
        "contrastive_pairs": _CONTRASTIVE_PAIRS_SQL,
        "sft_pair_quality": _SFT_PAIR_QUALITY_SQL,
        "prefix_sharing": _PREFIX_SHARING_SQL,
        "conversation_outcomes": _CONV_OUTCOMES_SQL,
        "mad_text_len": _MAD_TEXT_LEN_SQL,
        "tool_latency": _TOOL_LATENCY_SQL,
        "vocab_growth": _VOCAB_GROWTH_SQL,
        "heaps_law": _HEAPS_LAW_SQL,
        "vocab_coverage_curve": _VOCAB_COVERAGE_CURVE_SQL,
        "benford_prices": _BENFORD_SQL,
        "daily_acf": _DAILY_ACF_SQL,
        "tool_bigrams": _TOOL_BIGRAMS_SQL,
        "woe_tokens": _WOE_TOKENS_SQL,
        "quantile_match_lengths": _QUANTILE_MATCH_SQL,
        "dialogue_pairs": _DIALOGUE_PAIRS_SQL,
        "mann_whitney": _MANN_WHITNEY_SQL,
        "qte_text_len": _QTE_SQL,
        "ipw_ate": _ipw_oracle(),
        "seasonal_naive_eval": _SEASONAL_NAIVE_SQL,
        "binseg_changepoint": _BINSEG_SQL,
        "pot_tail_gaps": _POT_TAIL_SQL,
        "temperature_scaling": _temp_oracle(),
        "conformal_interval": _CONFORMAL_SQL,
        "pinball_text_len": _pinball_oracle(),
        "effect_sizes_text_len": _EFFECT_SIZES_SQL,
        "bh_fdr_event_mix": _BH_FDR_SQL,
        "permutation_test_convs": _PERMUTATION_SQL,
        "msprt_daily_gap": _MSPRT_SQL,
        "theil_sen_trend": _THEIL_SEN_SQL,
        "pacf_daily": _PACF_SQL,
        "tool_retry_chains": _TOOL_RETRY_SQL,
        "bradley_terry_roles": _bt_oracle(),
        "fairness_by_lang": _FAIRNESS_SQL,
        "schema_drift": _SCHEMA_DRIFT_SQL,
        "periodogram_daily": _PERIODOGRAM_SQL,
        "lsh_recall": _LSH_RECALL_SQL,
        "curriculum_order": _CURRICULUM_SQL,
        "kn_bigram_logprob": _KN_BIGRAM_SQL,
        "watermark_depth": _WATERMARK_DEPTH_SQL,
        "brown_double_daily": _BROWN_DOUBLE_SQL,
        "sql_weekly_role_mix": _SQL_WEEKLY_ROLE_MIX,
        "lsh_dbscan": _LSH_DBSCAN_SQL,
        "nelson_aalen": _NELSON_AALEN_SQL,
        "rdd_turns": _RDD_TURNS_SQL,
        "freshness_audit": _FRESHNESS_AUDIT_SQL,
        "compaction_plan": _COMPACTION_PLAN_SQL,
        "pca_power_eigen": _PCA_POWER_SQL,
        "lof_outliers": _LOF_SQL,
        "video_frame_sample": _VIDEO_FRAME_SAMPLE_SQL,
        "editdist_pairs": _EDITDIST_PAIRS_SQL,
        "cdc_chunks": _CDC_CHUNKS_SQL,
        "pareto_docs": _PARETO_DOCS_SQL,
        "huber_location": _HUBER_SQL,
        "hits_suppliers": _HITS_SQL,
        "winnow_overlap": _WINNOW_SQL,
        "esd_daily_outliers": _esd_oracle(5),
        "knn_label_agreement": _KNN_LABEL_SQL,
        "perm_importance": _perm_importance_oracle(),
        "epoch_budget": _EPOCH_BUDGET_SQL,
        "quantile_trend": _quantile_trend_oracle(0.9, 12),
        "pmi_top_factor": _pmi_factor_oracle(24),
        "lsh_modularity": _LSH_MODULARITY_SQL.format(lsh=_MINHASH_LSH_SQL),
        "ngram_novelty": _NGRAM_NOVELTY_SQL,
        "q5_local_supplier_volume": _Q5_SQL,
        "streaming_hopping_rate": _STREAMING_HOPPING_SQL,
        "mmr_rerank": _mmr_oracle(10, 0.7),
        "deletion_cascade": _DELETION_CASCADE_SQL,
        "rolling_active_7d": _ROLLING_ACTIVE_SQL,
        "ccf_user_assistant": _CCF_ROLES_SQL,
        "mann_kendall_daily": _MANN_KENDALL_SQL,
        "vocab_richness": _VOCAB_RICHNESS_SQL,
        "stl_daily": _STL_DAILY_SQL,
        "weight_ess": _WEIGHT_ESS_SQL,
        "skew_diagnosis": _SKEW_DIAGNOSIS_SQL,
        "granger_roles": _GRANGER_SQL,
        "holt_linear": _HOLT_LINEAR_SQL,
        "kruskal_roles": _KRUSKAL_SQL,
        "gopher_quality": _GOPHER_SQL,
        "circadian_roles": _CIRCADIAN_SQL,
        "markov_stationary": _markov_sql(),
        "bayes_ab": _BAYES_AB_SQL,
        "dp_role_counts": _DP_ROLE_SQL,
        "kcore_suppliers": _kcore_sql(),
        "levene_roles": _LEVENE_SQL,
        "trend_error_rate": _TREND_ERROR_SQL,
        "page_hinkley_daily": _PAGE_HINKLEY_SQL,
        "bloom_filter_fpp": _BLOOM_SQL,
        "dispersion_daily": _DISPERSION_SQL,
        "simpsons_check": _SIMPSONS_SQL,
        "holt_winters": _holt_winters_sql(),
        "theil_activity": _THEIL_SQL,
        "hhi_sources": _HHI_SQL,
        "ab_pvalue": _ab_pvalue_sql(),
        "yuen_text_len": _yuen_sql(),
        "spiegelhalter_cal": _spiegelhalter_sql(),
        "standardized_rates": _STANDARDIZED_SQL,
        "join_size_estimate": _JOIN_SIZE_SQL,
        "fk_orphans": _FK_ORPHANS_SQL,
        "rmst_14d": _rmst_sql(14),
        "welch_anova_roles": _WELCH_ANOVA_SQL,
        "cvm_text_len": _CVM_SQL,
        "ap_by_fold": _AP_SQL,
        "mcnemar_error_shift": _mcnemar_sql(),
        "fisher_exact_early_error": _FISHER_SQL,
        "turn_contiguity": _TURN_CONTIGUITY_SQL,
        "null_patterns": _NULL_PATTERNS_SQL,
        "icc_text_len": _ICC_SQL,
        "tool_trigrams": _TOOL_TRIGRAMS_SQL,
        "adamic_adar_trades": _ADAMIC_ADAR_SQL,
        "bpe_train_merges": _bpe_train_sql(8),
        "ece_adaptive": _ECE_ADAPTIVE_SQL,
        "qini_uplift": _QINI_SQL,
        "mrr_lsh": _MRR_SQL,
        "cumulative_incidence": _CIF_SQL,
        "hosmer_lemeshow": _hl_sql(),
        "univariate_auc": _UNIAUC_SQL,
        "silhouette_labels": _SILHOUETTE_SQL,
        "hurst_daily": _HURST_SQL,
        "bpe_apply_stats": _bpe_apply_sql(8),
        "nb_fit_dow": _NB_FIT_SQL,
        "partition_advisor": _PARTITION_ADVISOR_SQL,
        "tool_attribution": _TOOL_ATTRIBUTION_SQL,
        "stratified_ate_conf": _STRAT_ATE_SQL,
        "km_greenwood": _KM_GREENWOOD_SQL,
        "encoding_quality": _ENCODING_SQL,
        "lorenz_deciles": _LORENZ_SQL,
        "risk_ratio_tools": _RISK_RATIO_SQL,
        "mantel_haenszel_strata": _mh_sql(),
        "mixture_temperature": _MIXTURE_TEMP_SQL,
        "rake_role_dow": _rake_sql(3),
        "ad_text_len": _AD_SQL,
        "label_shift_bbse": _BBSE_SQL,
        "survival_c_index": _C_INDEX_SQL,
        "by_fdr_event_mix": _by_fdr_sql(),
        "threshold_sweep": _threshold_sweep_sql(),
        "lsh_parameter_plan": _LSH_PLAN_SQL,
        "streaming_left_join": _STREAM_LEFT_JOIN_SQL,
        "event_study_weekly": _EVENT_STUDY_SQL,
        "ks_source_matrix": _KS_MATRIX_SQL,
        "quality_classifier_fit": _quality_fit_sql(),
        "quality_classifier_apply": _quality_apply_sql(),
        "streaming_quality_scores": _quality_stream_score_sql(),
        "streaming_full_join": _STREAM_FULL_JOIN_SQL,
        "dedup_components_star": _DEDUP_COMPONENTS_SQL,
    }
