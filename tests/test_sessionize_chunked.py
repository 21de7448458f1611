"""Two-phase chunk-and-stitch sessionization (VERDICT #8): must equal
the single-window result on every turn, including sessions that span
chunk boundaries and gaps that coincide with them."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest


def _assert_equivalent(spark, turns, chunk_seconds):
    from kkbox_churn_prediction_spark.operators.sessionize import (
        sessionize,
        sessionize_chunked,
    )

    single = {
        (r["conv_id"], r["turn_idx"]): r["session_id"]
        for r in sessionize(turns).collect()
    }
    chunked = {
        (r["conv_id"], r["turn_idx"]): r["session_id"]
        for r in sessionize_chunked(turns, chunk_seconds=chunk_seconds).collect()
    }
    assert chunked == single


@pytest.fixture(scope="module")
def boundary_turns(spark):
    """One mega-conversation engineered around hour-chunk boundaries:
    sessions that continue across a boundary, sessions that end
    exactly at one, and multi-session chunks."""
    base = datetime(2024, 1, 1)
    ts = [
        # session 0: spans the 01:00 chunk boundary (10-min steps)
        base + timedelta(minutes=m) for m in (40, 50, 60, 70)
    ] + [
        # gap > 30 min inside chunk 1 → session 1
        base + timedelta(minutes=150),
        base + timedelta(minutes=155),
    ] + [
        # gap lands EXACTLY on the 03:00 boundary, > 30 min → session 2
        base + timedelta(minutes=240),
    ] + [
        # session 2 continues; boundary gap == exactly 30 min (no split)
        base + timedelta(minutes=270),
    ] + [
        # far-future chunk with 2 sessions inside → sessions 3, 4
        base + timedelta(hours=10),
        base + timedelta(hours=10, minutes=5),
        base + timedelta(hours=10, minutes=59),
    ]
    rows = [("mega", i, t) for i, t in enumerate(ts)]
    # a second, small conversation to check per-conv independence
    rows += [
        ("tiny", 0, base + timedelta(minutes=10)),
        ("tiny", 1, base + timedelta(hours=5)),
    ]
    return spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp")


def test_chunked_equals_single_hour_chunks(spark, boundary_turns):
    _assert_equivalent(spark, boundary_turns, chunk_seconds=3600)


def test_chunked_equals_single_tiny_chunks(spark, boundary_turns):
    # 10-minute chunks: nearly every turn in its own chunk — the
    # stitch phase does all the work
    _assert_equivalent(spark, boundary_turns, chunk_seconds=600)


def test_chunked_equals_single_on_generated_skew(spark):
    from kkbox_churn_prediction_spark.sources.synth import (
        clean_turns,
        generate_transcripts,
        to_spark,
    )

    turns = clean_turns(
        to_spark(spark, generate_transcripts(n_convs=20, mean_turns=30, seed=11))
    )
    _assert_equivalent(spark, turns, chunk_seconds=86400)


def test_chunked_splits_mega_conversation_window(spark, boundary_turns):
    """The point of the operator: phase-1 windows partition by
    (conv_id, chunk), so a mega-conversation no longer forms one
    window partition."""
    from kkbox_churn_prediction_spark.operators.sessionize import sessionize_chunked

    plan = (
        sessionize_chunked(boundary_turns, chunk_seconds=3600)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "_chunk" in plan  # phase-1 window keyed by (conv_id, chunk)


def test_auto_switch_picks_chunked_and_matches_single_pass(spark):
    """sessionize_auto (VERDICT r2 task #7): with a max_conv_rows
    guard any real conversation exceeds, the auto path must route to
    the chunked variant (visible as the phase-2 stitch join in the
    plan) and produce IDENTICAL session ids to plain sessionize."""
    from kkbox_churn_prediction_spark.operators.sessionize import (
        sessionize,
        sessionize_auto,
    )
    from kkbox_churn_prediction_spark.sources.synth import (
        clean_turns,
        generate_transcripts,
        to_spark,
    )

    turns = clean_turns(
        to_spark(spark, generate_transcripts(n_convs=12, mean_turns=40, seed=23))
    )
    auto = sessionize_auto(turns, max_conv_rows=5, chunk_seconds=86400)
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "_chunk" in plan  # the chunked path was chosen
    want = {
        (r["conv_id"], r["turn_idx"]): r["session_id"]
        for r in sessionize(turns).collect()
    }
    got = {
        (r["conv_id"], r["turn_idx"]): r["session_id"] for r in auto.collect()
    }
    assert got == want


def test_auto_switch_keeps_plain_window_for_small_conversations(spark):
    """Below the guard the auto path must stay the single-window plan
    (no stitch join, no chunk key)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.sessionize import sessionize_auto
    from kkbox_churn_prediction_spark.sources.synth import (
        clean_turns,
        generate_transcripts,
        to_spark,
    )

    turns = clean_turns(
        to_spark(spark, generate_transcripts(n_convs=6, mean_turns=10, seed=29))
    )
    auto = sessionize_auto(turns, max_conv_rows=1_000_000)
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "_chunk" not in plan
    assert auto.where(F.col("session_id").isNull()).count() == 0
