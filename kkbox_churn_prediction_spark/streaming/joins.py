"""Stream-stream event-time range join.

The hardest Structured Streaming operator the engine exposes: both
sides are unbounded, so Spark buffers each side's rows in state until
the other side's watermark proves no more matches can arrive. The
event-time range predicate (``a_ts ∈ (u_ts, u_ts + horizon]``) is
what makes state BOUNDED: combined with both watermarks, Spark derives
a state-eviction bound for each side (user rows older than
``watermark + horizon`` can never match a future assistant row).

Semantics contract: INNER stream-stream joins in append mode emit
every match as soon as both rows have arrived — the watermark bounds
STATE, not emission — so over a bounded replay the result equals the
batch range join exactly (the gate cross-checks that against DuckDB).

Reference analog: the reply-latency pairing the batch engine computes
join-free with a forward window (``operators/lags.py::
response_latency``); streaming cannot see "the next turn" without
state, so the range join is the honest streaming form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_turn_pairs(
    turns: DataFrame,
    *,
    horizon: str = "5 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Pair each user turn with every assistant turn of the SAME
    conversation within ``(u_ts, u_ts + horizon]`` →
    ``(conv_id, u_idx, a_idx, reply_delay_us)``.

    Works identically on a streaming frame (stream-stream self-join,
    state bounded by watermark + horizon) and a bounded batch frame
    (plain range join — the oracle path). The join key includes
    conv_id, so the only exchange is the conv hash partition of each
    side.
    """
    is_stream = turns.isStreaming
    u = turns.where(F.col("role") == "user").select(
        F.col("conv_id"),
        F.col("ts").alias("u_ts"),
        F.col("turn_idx").alias("u_idx"),
    )
    a = turns.where(F.col("role") == "assistant").select(
        F.col("conv_id").alias("a_conv_id"),
        F.col("ts").alias("a_ts"),
        F.col("turn_idx").alias("a_idx"),
    )
    if is_stream:
        u = u.withWatermark("u_ts", watermark)
        a = a.withWatermark("a_ts", watermark)
    joined = u.join(
        a,
        F.expr(
            f"conv_id = a_conv_id AND a_ts > u_ts AND "
            f"a_ts <= u_ts + INTERVAL {horizon}"
        ),
        "inner",
    )
    return joined.select(
        "conv_id",
        "u_idx",
        "a_idx",
        (F.unix_micros(F.col("a_ts")) - F.unix_micros(F.col("u_ts"))).alias(
            "reply_delay_us"
        ),
    )


def stream_left_pairs(
    turns: DataFrame,
    *,
    horizon: str = "2 hours",
    watermark: str = "4 hours",
) -> DataFrame:
    """Stream-stream LEFT OUTER event-time range join: every user
    turn paired with the assistant turns that answered it within
    ``horizon`` — and, crucially, user turns that got NO answer
    emitted with NULLs once the watermark PROVES no answer can still
    arrive. This is the semantics inner joins can't express (an
    unanswered question is invisible to them) and the reason outer
    stream joins need watermarks at all: the null row may only be
    emitted when ``u_ts + horizon`` falls behind the join watermark,
    so emission is DELAYED by construction — a bounded replay must
    push the watermark past the data's tail (flush batches) before
    the unmatched rows appear (the gate harness does exactly that;
    see the replay contract note there).

    Output: ``(conv_id, u_idx, a_idx, answered)`` with ``a_idx``
    NULL and ``answered = 0`` for timed-out questions.

    State story at scale: identical to :func:`stream_turn_pairs` —
    the range predicate plus both watermarks bound each side's
    buffered state; the left side additionally holds rows until the
    null-emission decision, still bounded by watermark + horizon.
    """
    is_stream = turns.isStreaming
    u = turns.where(F.col("role") == "user").select(
        F.col("conv_id"),
        F.col("ts").alias("u_ts"),
        F.col("turn_idx").alias("u_idx"),
    )
    a = turns.where(F.col("role") == "assistant").select(
        F.col("conv_id").alias("a_conv_id"),
        F.col("ts").alias("a_ts"),
        F.col("turn_idx").alias("a_idx"),
    )
    if is_stream:
        u = u.withWatermark("u_ts", watermark)
        a = a.withWatermark("a_ts", watermark)
    joined = u.join(
        a,
        F.expr(
            f"conv_id = a_conv_id AND a_ts > u_ts AND "
            f"a_ts <= u_ts + INTERVAL {horizon}"
        ),
        "left_outer",
    )
    return joined.select(
        "conv_id",
        "u_idx",
        "a_idx",
        F.when(F.col("a_idx").isNotNull(), 1).otherwise(0).alias("answered"),
    )


def stream_full_pairs(
    turns: DataFrame,
    *,
    horizon: str = "2 hours",
    watermark: str = "4 hours",
) -> DataFrame:
    """Stream-stream FULL OUTER event-time range join — BOTH
    unmatched sides surface with NULLs once the watermark proves no
    partner can still arrive: user turns nobody answered within
    ``horizon`` (the :func:`stream_left_pairs` semantics) AND orphan
    assistant turns no user turn prompted in the preceding window
    (system-initiated messages, replies whose question was lost
    upstream — the data-quality signal a left join is blind to).

    Output: ``(conv_id, u_idx, a_idx, answered, orphan)`` —
    ``answered = 1`` iff both sides matched; ``orphan = 1`` on
    a-side-only rows (``u_idx`` NULL). ``conv_id`` is coalesced
    across the two sides so unmatched rows of either side keep their
    conversation.

    Emission contract: like the left join, BOTH null-emission paths
    are watermark-driven (an a-side row may only surface once the
    u-side watermark passes ``a_ts``, and vice versa), so a bounded
    replay must march the watermark past the tail with flush batches
    carrying BOTH roles — the join watermark is the MIN across the
    two ``withWatermark`` operators (the gate's dual-role-sentinel
    contract, shared with ``streaming_left_join``).

    State story at scale: the range predicate plus both watermarks
    bound each side's buffered state to watermark + horizon of
    event-time, exactly as in the inner/left variants — full outer
    adds no state, only the two delayed null-emission decisions.
    """
    is_stream = turns.isStreaming
    u = turns.where(F.col("role") == "user").select(
        F.col("conv_id"),
        F.col("ts").alias("u_ts"),
        F.col("turn_idx").alias("u_idx"),
    )
    a = turns.where(F.col("role") == "assistant").select(
        F.col("conv_id").alias("a_conv_id"),
        F.col("ts").alias("a_ts"),
        F.col("turn_idx").alias("a_idx"),
    )
    if is_stream:
        u = u.withWatermark("u_ts", watermark)
        a = a.withWatermark("a_ts", watermark)
    joined = u.join(
        a,
        F.expr(
            f"conv_id = a_conv_id AND a_ts > u_ts AND "
            f"a_ts <= u_ts + INTERVAL {horizon}"
        ),
        "full_outer",
    )
    return joined.select(
        F.coalesce(F.col("conv_id"), F.col("a_conv_id")).alias("conv_id"),
        "u_idx",
        "a_idx",
        F.when(
            F.col("u_idx").isNotNull() & F.col("a_idx").isNotNull(), 1
        )
        .otherwise(0)
        .alias("answered"),
        F.when(F.col("u_idx").isNull(), 1).otherwise(0).alias("orphan"),
    )
