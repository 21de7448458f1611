"""Sessionization boundary goldens (30-min gap threshold)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
import pytest

from kkbox_churn_prediction_spark.operators.sessionize import (
    session_aggregates,
    sessionize,
)
from kkbox_churn_prediction_spark.sources.synth import to_spark

T0 = datetime(2024, 1, 1, 9, 0, 0)


def _turns(spark, gaps_seconds):
    ts, t = [], T0
    for g in gaps_seconds:
        t = t + timedelta(seconds=g)
        ts.append(t)
    pdf = pd.DataFrame(
        {
            "conv_id": ["c1"] * len(ts),
            "turn_idx": range(len(ts)),
            "role": ["user"] * len(ts),
            "text": ["ab"] * len(ts),
            "tool": [None] * len(ts),
            "ts": ts,
        }
    )
    return to_spark(spark, pdf)


def test_exact_30min_gap_does_not_split(spark):
    # gaps: 0, exactly 1800s, 1801s, 10s
    out = sessionize(_turns(spark, [0, 1800, 1801, 10])).orderBy("turn_idx").collect()
    assert [r["session_id"] for r in out] == [0, 0, 1, 1]


def test_session_ids_zero_based_and_dense(spark):
    out = sessionize(_turns(spark, [0, 7200, 7200, 5, 7200])).orderBy("turn_idx").collect()
    assert [r["session_id"] for r in out] == [0, 1, 2, 2, 3]


def test_session_aggregates_golden(spark):
    df = session_aggregates(_turns(spark, [0, 60, 7200, 30]))
    rows = {r["session_id"]: r for r in df.collect()}
    assert rows[0]["n_turns"] == 2 and rows[1]["n_turns"] == 2
    assert rows[0]["duration_micros"] == 60_000_000
    assert rows[1]["duration_micros"] == 30_000_000
    assert rows[0]["text_len_sum"] == 4


def test_custom_gap_threshold(spark):
    out = sessionize(_turns(spark, [0, 61, 59]), gap_seconds=60).orderBy("turn_idx").collect()
    assert [r["session_id"] for r in out] == [0, 1, 1]


def test_assemble_documents_order_and_truncation(spark):
    from datetime import datetime

    import pandas as pd

    from kkbox_churn_prediction_spark.operators.assemble import assemble_documents
    from kkbox_churn_prediction_spark.sources.synth import to_spark

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    pdf = pd.DataFrame(
        {
            "conv_id": ["c1"] * 3,
            "turn_idx": [2, 0, 1],  # shuffled input order
            "role": ["assistant", "user", "tool"],
            "text": ["three", "one", "two"],
            "tool": [None] * 3,
            "ts": [t(30), t(10), t(20)],
        }
    )
    df = to_spark(spark, pdf).repartition(3)
    r = assemble_documents(df).first()
    assert r["doc"] == "user: one\ntool: two\nassistant: three"
    assert r["n_turns"] == 3
    assert r["t1_us"] - r["t0_us"] == 20_000_000
    # deterministic truncation keeps the FIRST turns
    r2 = assemble_documents(df, max_turns=2, role_tags=False).first()
    assert r2["doc"] == "one\ntwo"
    # ts tie broken by turn_idx
    pdf2 = pdf.copy()
    pdf2["ts"] = [t(10)] * 3
    r3 = assemble_documents(to_spark(spark, pdf2)).first()
    assert r3["doc"] == "user: one\ntool: two\nassistant: three"


def test_segment_by_marker_episode_semantics(spark):
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.sessionize import segment_by_marker

    t0 = datetime(2024, 1, 1)
    rows = [("c1", i, r, t0 + timedelta(minutes=i)) for i, r in
            enumerate(["user", "system", "user", "assistant", "system", "user"])]
    # c2 OPENS with a marker — episodes must still start at 0
    rows += [("c2", i, r, t0 + timedelta(minutes=i)) for i, r in
             enumerate(["system", "user", "assistant"])]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts timestamp"
    )
    out = segment_by_marker(df, F.col("role") == "system")
    got = {(r["conv_id"], r["turn_idx"]): r["episode_id"] for r in out.collect()}
    assert [got[("c1", i)] for i in range(6)] == [0, 1, 1, 1, 2, 2]
    assert [got[("c2", i)] for i in range(3)] == [0, 0, 0]
    # partition-layout invariance
    got2 = {(r["conv_id"], r["turn_idx"]): r["episode_id"]
            for r in segment_by_marker(
                df.repartition(4), F.col("role") == "system"
            ).collect()}
    assert got == got2


def test_session_gap_sensitivity_matches_sessionize(spark):
    """The conditional-count shortcut must agree with ACTUALLY
    re-sessionizing at each threshold."""
    from datetime import datetime, timedelta

    import pandas as pd

    from kkbox_churn_prediction_spark.operators.sessionize import (
        session_gap_sensitivity,
        sessionize,
    )

    t0 = datetime(2024, 1, 1, 9, 0, 0)
    rows = []
    # conv a: gaps of 10min, 20min, 45min, 70min
    offs = [0, 10, 30, 75, 145]
    rows += [("a", i, "user", "x", None, t0 + timedelta(minutes=m))
             for i, m in enumerate(offs)]
    # conv b: single turn
    rows += [("b", 0, "user", "x", None, t0)]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    df = spark.createDataFrame(pdf)
    out = {r["gap_seconds"]: r for r in
           session_gap_sensitivity(df, gaps_seconds=(900, 1800, 3600)).collect()}
    for g in (900, 1800, 3600):
        actual = (
            sessionize(df, gap_seconds=g)
            .select("conv_id", "session_id").distinct().count()
        )
        assert out[g]["n_sessions"] == actual, g
        assert out[g]["n_turns"] == 6
    # more sessions at tighter thresholds (monotone non-increasing in g)
    assert out[900]["n_sessions"] >= out[1800]["n_sessions"] >= out[3600]["n_sessions"]
