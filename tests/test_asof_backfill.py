"""Leak-safety + boundary goldens for the as-of backfill.

Mirrors the reference's adversarial temporal-safety tests
(``tests/test_temporal_safety.py:16-133``: fabricate events after the
cutoff, assert features count only past rows with exact golden
values) and window-boundary tests
(``tests/test_feature_windows.py:270-363``: 89th day in, 91st out).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from kkbox_churn_prediction_spark.operators.asof import (
    asof_join_broadcast_cutoffs,
    asof_join_entity_cutoffs,
)
from kkbox_churn_prediction_spark.plans.backfill import backfill_features
from kkbox_churn_prediction_spark.sources.synth import leak_trap_fixture, to_spark


@pytest.fixture(scope="module")
def trap(spark):
    pdf, cutoff = leak_trap_fixture()
    turns = to_spark(spark, pdf)
    cutoffs = spark.createDataFrame(pd.DataFrame({"cutoff_ts": [cutoff]}))
    return turns, cutoffs, cutoff


def _by_conv(rows):
    return {r["conv_id"]: r for r in rows}


def test_no_future_turns_reach_aggregates(trap, spark):
    turns, cutoffs, _ = trap
    out = backfill_features(turns, cutoffs, horizons_days=(1, 3, 7)).collect()
    got = _by_conv([r.asDict() for r in out])

    # convA: only the 3 pre-cutoff turns count; the turn exactly AT the
    # cutoff is excluded (strictly-prior semantics)
    assert got["convA"]["turn_cnt_7d"] == 3
    assert got["convA"]["text_len_sum_7d"] == 60  # 10+20+30, not 1060
    assert got["convA"]["tool_call_cnt_7d"] == 1  # 'search' only, not 'code'
    assert got["convA"]["turn_cnt_1d"] == 1  # only the Jan-14 12:00 turn
    assert got["convA"]["text_len_sum_1d"] == 30

    # convB: all turns after cutoff → default row from grid join
    assert got["convB"]["turn_cnt_7d"] == 0
    assert got["convB"]["text_len_sum_7d"] == 0
    assert got["convB"]["micros_since_last_turn"] == -1

    # convC boundary: cutoff-7d turn INcluded (>=), 1µs-before INcluded
    assert got["convC"]["turn_cnt_7d"] == 2
    assert got["convC"]["text_len_sum_7d"] == 16
    # recency = 1µs before cutoff
    assert got["convC"]["micros_since_last_turn"] == 1


def test_inclusive_boundary_variant(trap):
    """Reference feature path uses ts <= cutoff
    (features/features_comprehensive.sql:48) — parameterized here."""
    turns, cutoffs, _ = trap
    joined = asof_join_broadcast_cutoffs(turns, cutoffs, lookback_days=7, inclusive=True)
    a = joined.where(F.col("conv_id") == "convA").count()
    assert a == 4  # the exactly-at-cutoff turn now included


def test_entity_grid_variant_matches_broadcast(trap, spark):
    turns, cutoffs, _ = trap
    grid = turns.select("conv_id").distinct().crossJoin(cutoffs)
    a = asof_join_broadcast_cutoffs(turns, cutoffs, 7).select("conv_id", "turn_idx", "cutoff_ts")
    b = asof_join_entity_cutoffs(turns, grid, 7).select("conv_id", "turn_idx", "cutoff_ts")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_partition_count_invariance(trap):
    """Identical results at different parallelism (allclose invariant,
    FIXTURES.md §C; analog of local[8]-vs-local[32] determinism)."""
    turns, cutoffs, _ = trap
    out1 = backfill_features(turns.repartition(1), cutoffs).orderBy("conv_id", "cutoff_ts")
    out8 = backfill_features(turns.repartition(8), cutoffs).orderBy("conv_id", "cutoff_ts")
    p1, p8 = out1.toPandas(), out8.toPandas()
    pd.testing.assert_frame_equal(p1, p8, check_exact=False, rtol=1e-12)


def test_asof_forward_nearest_golden(spark):
    from datetime import datetime, timedelta

    import pandas as pd

    from kkbox_churn_prediction_spark.operators.asof import asof_forward_nearest

    cut = datetime(2024, 1, 10)
    rows = [
        # conv a: one turn before the cutoff (never picked), two after
        ("a", 0, "user", "x", None, cut - timedelta(days=1)),
        ("a", 1, "assistant", "x", "code", cut + timedelta(hours=2)),
        ("a", 2, "user", "x", None, cut + timedelta(hours=5)),
        # conv b: first post-cutoff turn beyond the horizon -> not found
        ("b", 0, "user", "x", None, cut + timedelta(days=20)),
        # conv c: two turns at the SAME ts -> turn_idx breaks the tie
        ("c", 5, "tool", "x", "search", cut + timedelta(hours=1)),
        ("c", 4, "user", "x", None, cut + timedelta(hours=1)),
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    cutoffs = spark.createDataFrame([(cut,)], "cutoff_ts timestamp")
    out = {
        r["conv_id"]: r
        for r in asof_forward_nearest(
            spark.createDataFrame(pdf), cutoffs, horizon_days=14
        ).collect()
    }
    a = out["a"]
    assert a["found"] and a["next_role"] == "assistant" and a["next_tool"] == "code"
    assert a["gap_us"] == 2 * 3600 * 1_000_000
    b = out["b"]
    assert not b["found"] and b["next_ts_us"] is None and b["next_role"] is None
    c = out["c"]
    assert c["next_role"] == "user"  # turn_idx 4 < 5 at the tied ts


def test_asof_forward_inclusive_boundary(spark):
    from datetime import datetime

    import pandas as pd

    from kkbox_churn_prediction_spark.operators.asof import asof_forward_nearest

    cut = datetime(2024, 1, 10)
    rows = [("a", 0, "user", "x", None, cut)]  # exactly AT the cutoff
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    cutoffs = spark.createDataFrame([(cut,)], "cutoff_ts timestamp")
    strict = asof_forward_nearest(
        spark.createDataFrame(pdf), cutoffs, horizon_days=7
    ).collect()[0]
    incl = asof_forward_nearest(
        spark.createDataFrame(pdf), cutoffs, horizon_days=7, inclusive=True
    ).collect()[0]
    assert not strict["found"]
    assert incl["found"] and incl["gap_us"] == 0


def test_asof_backward_nearest_ttl_and_tiebreak(spark):
    from datetime import datetime, timedelta

    import pandas as pd

    from kkbox_churn_prediction_spark.operators.asof import asof_backward_nearest

    cut = datetime(2024, 1, 20)
    rows = [
        # conv a: latest pre-cutoff turn wins; tied-ts -> higher turn_idx
        ("a", 1, "user", "x", None, cut - timedelta(days=2)),
        ("a", 2, "assistant", "x", "code", cut - timedelta(days=1)),
        ("a", 3, "tool", "x", "search", cut - timedelta(days=1)),
        # conv b: only activity is OLDER than the 14-day TTL -> not found
        ("b", 0, "user", "x", None, cut - timedelta(days=30)),
        # conv c: a turn exactly AT the cutoff is NOT prior (strict)
        ("c", 0, "user", "x", None, cut),
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    cutoffs = spark.createDataFrame([(cut,)], "cutoff_ts timestamp")
    out = {
        r["conv_id"]: r
        for r in asof_backward_nearest(
            spark.createDataFrame(pdf), cutoffs, lookback_days=14
        ).collect()
    }
    a = out["a"]
    assert a["found"] and a["last_role"] == "tool"  # turn_idx 3 > 2 at tied ts
    assert a["staleness_us"] == 24 * 3600 * 1_000_000
    assert not out["b"]["found"] and out["b"]["staleness_us"] is None
    assert not out["c"]["found"]
    # unbounded lookback resurrects conv b's old snapshot
    unb = {
        r["conv_id"]: r
        for r in asof_backward_nearest(
            spark.createDataFrame(pdf), cutoffs, lookback_days=None
        ).collect()
    }
    assert unb["b"]["found"] and unb["b"]["staleness_us"] == 30 * 24 * 3600 * 1_000_000
