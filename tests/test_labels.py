"""Label-rule horizon edges.

Mirrors the reference's renewal-at-day-5/30/31 cases
(``tests/test_labels.py:36-113``): next qualifying event at
horizon−1 → not churn; exactly at horizon → not churn under the
inclusive label rule (``src/labels.py:142`` day-30 NOT churn) but
churn under the strict backtest rule (``src/backtest.py:182``);
horizon+1 → churn.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
import pytest

from kkbox_churn_prediction_spark.operators.labels import (
    entity_labels,
    time_to_next_qualifying_turn,
)
from kkbox_churn_prediction_spark.sources.synth import to_spark

CUTOFF = datetime(2024, 1, 10)
H = 3  # days


@pytest.fixture(scope="module")
def fixture(spark):
    def mk(conv, offsets_and_roles):
        return [
            {
                "conv_id": conv,
                "turn_idx": i,
                "role": r,
                "text": "x",
                "tool": None,
                "ts": CUTOFF + timedelta(**off),
            }
            for i, (off, r) in enumerate(offsets_and_roles)
        ]

    rows = (
        # next user turn at horizon-1 day → not churn
        mk("early", [({"days": -1}, "user"), ({"days": H - 1}, "user")])
        # exactly at horizon → rule-dependent
        + mk("edge", [({"days": -1}, "user"), ({"days": H}, "user")])
        # at horizon+1 → churn
        + mk("late", [({"days": -1}, "user"), ({"days": H, "seconds": 1}, "user")])
        # only non-qualifying (assistant) activity in horizon → churn
        + mk("wrongrole", [({"days": -1}, "user"), ({"days": 1}, "assistant")])
        # turn exactly AT the cutoff is NOT in the future window (> cutoff)
        + mk("atcutoff", [({"days": 0}, "user")])
    )
    turns = to_spark(spark, pd.DataFrame(rows))
    cutoffs = spark.createDataFrame(pd.DataFrame({"cutoff_ts": [CUTOFF]}))
    return turns, cutoffs


def _by_conv(df):
    return {r["conv_id"]: r.asDict() for r in df.collect()}


def test_inclusive_horizon_rule(spark, fixture):
    turns, cutoffs = fixture
    got = _by_conv(entity_labels(turns, cutoffs, H, inclusive=True))
    assert got["early"]["is_churn"] == 0
    assert got["edge"]["is_churn"] == 0  # day-H event counts (labels.py rule)
    assert got["late"]["is_churn"] == 1
    assert got["wrongrole"]["is_churn"] == 1
    assert got["atcutoff"]["is_churn"] == 1
    assert got["early"]["micros_to_next_qualifying"] == (H - 1) * 86400 * 1_000_000


def test_strict_horizon_rule(spark, fixture):
    turns, cutoffs = fixture
    got = _by_conv(entity_labels(turns, cutoffs, H, inclusive=False))
    assert got["edge"]["is_churn"] == 1  # strict backtest variant


def test_time_to_next_qualifying_turn_window(spark, fixture):
    turns, _ = fixture
    got = {
        (r["conv_id"], r["turn_idx"]): r["micros_to_next_qualifying"]
        for r in time_to_next_qualifying_turn(turns).collect()
    }
    assert got[("early", 0)] == H * 86400 * 1_000_000  # from day -1 to day H-1
    assert got[("early", 1)] == -1  # no later qualifying turn
    assert got[("wrongrole", 0)] == -1  # assistant turn does not qualify
