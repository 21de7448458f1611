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
