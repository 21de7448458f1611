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
