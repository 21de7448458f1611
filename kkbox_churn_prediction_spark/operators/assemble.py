"""Document assembly: transcripts → training documents.

The bridge between the engine's two halves: the transcript side
(axis A — sessionize, lag/lead, as-of features) produces per-turn
rows; the corpus side (axis B — dedup, quality, packing, curation)
consumes per-document text. Assembly concatenates each
conversation's turns in the stable (ts, turn_idx) order into one
role-tagged document — the standard chat-transcript serialization
for pretraining/SFT corpora — after which every corpus operator
(curate_corpus, pack_documents, decontaminate, …) applies directly.

Scale: one shuffle keyed by conv_id; ``sort_array(collect_list(...))``
keeps ordering inside the aggregate (no window sort pass). A single
conversation must fit one aggregation buffer — the same
mega-conversation caveat as sessionization, with the same remedy:
cap turns per conversation upstream (``capped_per_group``) or split
by session id first and assemble per session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble_documents(
    turns: DataFrame,
    *,
    sep: str = "\n",
    role_tags: bool = True,
    max_turns: int | None = None,
) -> DataFrame:
    """(conv_id, doc, n_turns, t0_us, t1_us): each conversation's
    turns joined with ``sep`` in (ts, turn_idx) order; ``role_tags``
    prefixes every line with ``role: ``. ``max_turns`` keeps only the
    FIRST k turns per conversation (deterministic truncation for
    mega-conversations — applied inside the sorted aggregate, so no
    extra window pass)."""
    line = (
        F.concat(F.col("role"), F.lit(": "), F.col("text"))
        if role_tags
        else F.col("text")
    )
    payload = F.struct(
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.col("turn_idx").alias("turn_idx"),
        line.alias("line"),
    )
    agg = turns.groupBy("conv_id").agg(
        F.sort_array(F.collect_list(payload)).alias("_p"),
        F.count(F.lit(1)).alias("n_turns"),
    )
    p = F.col("_p")
    if max_turns is not None:
        p = F.slice(p, 1, int(max_turns))
    return agg.select(
        "conv_id",
        F.concat_ws(sep, F.transform(p, lambda x: x["line"])).alias("doc"),
        "n_turns",
        F.element_at(F.col("_p"), 1)["ts_us"].alias("t0_us"),
        F.element_at(F.col("_p"), -1)["ts_us"].alias("t1_us"),
    )


def dialogue_pairs(
    turns: DataFrame,
    *,
    prompt_role: str = "user",
    response_role: str = "assistant",
    min_prompt_len: int = 1,
    min_response_len: int = 1,
) -> DataFrame:
    """(prompt, response) training-pair extraction from transcripts —
    the SFT counterpart of :func:`assemble_documents` (which builds
    pretraining documents): every ``response_role`` turn whose
    IMMEDIATELY preceding turn in the conversation is a
    ``prompt_role`` turn becomes one example →
    ``(conv_id, turn_idx, prompt, response, prompt_len,
    response_len)``. Pairs with an intervening system/tool turn are
    deliberately excluded (the prompt shown to the model would not
    be the adjacent text), matching the strict-adjacency convention
    of instruction-tuning pair miners.

    Shape: one ``lag`` over the shared per-conversation sort (the
    same ``(conv_id → ts, turn_idx)`` window every turn-level
    operator rides) + a filter — no join, no second scan. Length
    floors drop empty/degenerate pairs at the source.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("ts", "turn_idx")
    prev_role = F.lag("role").over(w)
    prev_text = F.lag("text").over(w)
    out = (
        turns.withColumn("_pr", prev_role)
        .withColumn("_pt", prev_text)
        .where(
            (F.col("role") == response_role)
            & (F.col("_pr") == prompt_role)
            & (F.length(F.col("_pt")) >= int(min_prompt_len))
            & (F.length(F.col("text")) >= int(min_response_len))
        )
    )
    return out.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.col("_pt").alias("prompt"),
        F.col("text").alias("response"),
        F.length("_pt").cast("bigint").alias("prompt_len"),
        F.length("text").cast("bigint").alias("response_len"),
    )


def contrastive_pairs(
    docs: DataFrame,
    n_batches: int,
    *,
    id_col: str = "doc_id",
    dup_key: "Column | None" = None,
    salt: str = "batch",
) -> DataFrame:
    """In-batch negative pairs for contrastive/embedding training:
    assign every document to a deterministic hash batch (the same
    stable-hash coin as the samplers — rerun/partition-invariant,
    oracle-reproducible), then emit every unordered pair within a
    batch EXCLUDING pairs that share ``dup_key`` — near-identical
    docs are false negatives and must not be pushed apart (the
    in-batch-negatives discipline of SimCLR/DPR-style trainers, with
    the same dedup-key exclusion the canonical-selection op uses).

    Output: ``(batch, a_id, b_id)`` with ``a_id < b_id``.

    Shape: the corpus collapses to a slim ``(batch, id, key-hash)``
    projection BEFORE the self-join (text never rides the shuffle);
    the equi-join on ``batch`` shuffles both sides once and AQE
    reuses the identical exchange. Pair fan-out is bounded by
    batch-size² — batch occupancy is Poisson(N/n_batches), so pick
    ``n_batches ≈ N/B`` for trainer batch size B and the output is
    ~N·B/2 rows, never all-pairs.
    """
    from kkbox_churn_prediction_spark.functions.text import stable_hash48

    key = dup_key if dup_key is not None else F.col(id_col).cast("string")
    slim = docs.select(
        F.pmod(
            stable_hash48(
                F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string"))
            ),
            F.lit(int(n_batches)),
        ).alias("batch"),
        F.col(id_col),
        stable_hash48(key.cast("string")).alias("_k"),
    )
    left = slim.select("batch", F.col(id_col).alias("a_id"), F.col("_k").alias("_ka"))
    right = slim.select("batch", F.col(id_col).alias("b_id"), F.col("_k").alias("_kb"))
    return (
        left.join(right, "batch")
        .where((F.col("a_id") < F.col("b_id")) & (F.col("_ka") != F.col("_kb")))
        .select("batch", "a_id", "b_id")
    )


DEFAULT_REFUSAL_PHRASES = ("i can't", "i cannot", "i'm sorry", "as an ai")


def sft_pair_quality(
    pairs: DataFrame,
    *,
    refusal_phrases: tuple[str, ...] = DEFAULT_REFUSAL_PHRASES,
    min_response_len: int = 8,
) -> DataFrame:
    """Quality verdicts for SFT (prompt, response) pairs — the filter
    pass instruction-tuning corpora run after :func:`dialogue_pairs`
    mining: flag refusal-styled responses (they teach the model to
    refuse), degenerate short responses, and surface the
    response/prompt length ratio (extreme ratios correlate with
    truncation and low-effort answers). ``keep`` = neither flag.

    Phrase matching is literal-substring on the lowercased response
    (NOT regex) so the verdicts are trivially reproducible in any
    engine; pass domain-specific ``refusal_phrases`` to tune.

    Shape: pure per-row column expressions on the pair stream — zero
    shuffles, embarrassingly parallel at any scale.
    """
    lower = F.lower(F.col("response"))
    refusal = F.lit(False)
    for p in refusal_phrases:
        refusal = refusal | lower.contains(p)
    short = F.col("response_len") < int(min_response_len)
    return pairs.select(
        "conv_id",
        "turn_idx",
        "prompt_len",
        "response_len",
        F.round(
            F.col("response_len") * 1.0 / F.greatest(F.col("prompt_len"), F.lit(1)), 6
        ).alias("len_ratio"),
        refusal.cast("int").alias("is_refusal"),
        short.cast("int").alias("is_short"),
        ((~refusal) & (~short)).cast("int").alias("keep"),
    )


def refusal_rate_weekly(
    turns: DataFrame,
    *,
    refusal_phrases: tuple[str, ...] = DEFAULT_REFUSAL_PHRASES,
    role: str = "assistant",
) -> DataFrame:
    """Safety-ops trend: per calendar week, the share of ``role``
    turns whose text matches the refusal lexicon — the TIME-SERIES
    view of :func:`sft_pair_quality`'s per-pair flag (a refusal-rate
    step after a deploy is the first thing an agent-ops review asks
    for; the same literal-substring lexicon keeps the two views
    consistent by construction).

    Determinism: exact conditional counts per week; one division.
    Shape: scan-stage flag → ONE week-keyed hash agg (map-side
    partials); output rows = |weeks|.
    """
    lower = F.lower(F.col("text"))
    refusal = F.lit(False)
    for p in refusal_phrases:
        refusal = refusal | lower.contains(p)
    base = turns.where(F.col("role") == role).select(
        F.date_trunc("week", F.col("ts")).alias("week"),
        refusal.cast("int").alias("_r"),
    )
    per = base.groupBy("week").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum("_r").cast("long").alias("n_refusals"),
    )
    return per.select(
        "week",
        "n_turns",
        "n_refusals",
        F.round(
            F.col("n_refusals").cast("double") / F.col("n_turns").cast("double"), 6
        ).alias("refusal_rate"),
    )
