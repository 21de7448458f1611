"""Corpus curation: the composed training-data filter pipeline.

A pretraining corpus build chains the per-doc operators this engine
already ships — quality scoring, language ID, exact dedup — into one
audited verdict per document. The reference has no corpus stage (its
pipeline starts from structured logs); this is the LLM-data-pipeline
composition the engine's operators exist for.

Plan shape (deliberate, audited):
- ALL per-doc signals (quality columns, language argmax, dedup key)
  compute over ONE scan in a STAGED projection chain — the operators
  expose stage-level column builders so composition neither
  multiplies scans/joins nor re-evaluates heavy subtrees per
  reference (the one-giant-projection form cost ~10x at 8M docs).
- the only shuffle is the dedup self-aggregation: groupBy(doc hash)
  + join back on the same key (co-partitioned, AQE-coalesced).
- verdicts are a when-chain with fixed precedence (quality → lang →
  duplicate → kept), so every dropped doc carries exactly one
  auditable reason — the curation report is the groupBy(verdict) of
  this output, no second pass.

At 10^12 docs: one wide scan (column-pruned to doc_id+text), one
hash-partitioned exchange on a 48-bit key (uniform by construction —
no skew salting needed), expression-only otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kkbox_churn_prediction_spark.functions.text import normalize_text, stable_hash48
from kkbox_churn_prediction_spark.operators.textstats import (
    doc_signal_stage1,
    doc_signal_stage2,
    lang_pred_from_scores,
    quality_output_cols,
)

QUALITY_THRESHOLD = 0.666667  # ≥ 2 of 3 quality checks (round-6 of 2/3)


def curate_corpus(
    docs: DataFrame,
    *,
    keep_lang: str = "en",
    min_quality: float = QUALITY_THRESHOLD,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document curation verdict: (doc_id, n_tokens,
    quality_score, pred_lang, dup_group_size, verdict).

    verdict ∈ {low_quality, wrong_lang, duplicate, kept} with that
    precedence; ``duplicate`` keeps the smallest doc_id per exact
    normalized-text group as canonical.
    """
    t = F.col(text_col)
    # staged projections (see textstats staged-construction note):
    # heavy intermediates once, ratios/scores from columns, verdicts
    # from columns — the single-projection form re-evaluated the
    # token/regex subtrees per reference (measured ~10x at 8M docs)
    base = (
        docs.select(
            F.col(id_col),
            *doc_signal_stage1(t),
            stable_hash48(normalize_text(t)).alias("_k"),
        )
        .select(id_col, "_k", "n_chars_calc", "n_tokens", *doc_signal_stage2())
        .select(
            id_col,
            "_k",
            *quality_output_cols(),
            lang_pred_from_scores().alias("pred_lang"),
        )
    )
    groups = base.groupBy("_k").agg(
        F.min(id_col).alias("_canonical_id"),
        F.count(F.lit(1)).alias("dup_group_size"),
    )
    joined = base.join(groups, "_k")
    verdict = (
        F.when(F.col("quality_score") < F.lit(float(min_quality)), "low_quality")
        .when(F.col("pred_lang") != keep_lang, "wrong_lang")
        .when(F.col(id_col) != F.col("_canonical_id"), "duplicate")
        .otherwise("kept")
    )
    return joined.select(
        id_col,
        "n_tokens",
        "quality_score",
        "pred_lang",
        "dup_group_size",
        verdict.alias("verdict"),
    )


def curation_report(curated: DataFrame) -> DataFrame:
    """(verdict, n_docs, total_tokens): the corpus-build audit
    summary — one tiny groupBy over the verdict table."""
    return curated.groupBy("verdict").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )


def source_datacard(docs: DataFrame, *, keep_lang: str = "en") -> DataFrame:
    """Per-source data card → ``(source, n_docs, total_tokens,
    mean_quality, kept_rate, dup_rate)``: the mixture-weighting input
    every multi-crawl corpus build starts from (which sources are
    clean, which are duplicate-heavy, how many tokens survive
    curation per source).

    Composes :func:`curate_corpus` (quality → lang → dedup verdicts,
    one scan + one shuffle) with a broadcast source-lookup join and
    ONE per-source aggregate — the source dimension is not threaded
    through the curation plan, so the verdict logic stays a single
    shared implementation.
    """
    curated = curate_corpus(docs, keep_lang=keep_lang)
    src = docs.select("doc_id", "source")
    return (
        curated.join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.round(F.avg("quality_score"), 6).alias("mean_quality"),
            F.round(
                F.avg(F.when(F.col("verdict") == "kept", 1.0).otherwise(0.0)), 6
            ).alias("kept_rate"),
            F.round(
                F.avg(F.when(F.col("verdict") == "duplicate", 1.0).otherwise(0.0)),
                6,
            ).alias("dup_rate"),
        )
    )
