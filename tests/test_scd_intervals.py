"""SCD2 run compression + interval containment join goldens."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _t(m):
    return dt.datetime(2024, 1, 1, 0, m)


def _stream(spark, parts=1):
    rows = [
        # key a: x,x,None,None,x  -> runs x[0:2) None[2:4) x[4:)
        ("a", 0, "x", _t(0)),
        ("a", 1, "x", _t(5)),
        ("a", 2, None, _t(10)),
        ("a", 3, None, _t(15)),
        ("a", 4, "x", _t(20)),
        # key b: single run
        ("b", 0, "y", _t(1)),
        ("b", 1, "y", _t(2)),
    ]
    return spark.createDataFrame(
        rows, ["conv_id", "turn_idx", "attr", "ts"]
    ).repartition(parts)


def test_scd2_runs_golden(spark):
    from kkbox_churn_prediction_spark.operators.scd import scd2_intervals

    out = (
        scd2_intervals(_stream(spark), "conv_id", "turn_idx", "attr", ts_col="ts")
        .orderBy("conv_id", "run_idx")
        .toPandas()
    )
    a = out[out["conv_id"] == "a"]
    assert list(a["attr"]) == ["x", None, "x"]
    assert list(a["from_turn_idx"]) == [0, 2, 4]
    assert list(a["to_turn_idx"].fillna(-1)) == [2, 4, -1]
    assert list(a["n_rows"]) == [2, 2, 1]
    assert list(a["valid_from"]) == [_t(0), _t(10), _t(20)]
    assert list(a["valid_to"].iloc[:2]) == [_t(10), _t(20)]
    assert a["valid_to"].iloc[2] is None or str(a["valid_to"].iloc[2]) == "NaT"
    b = out[out["conv_id"] == "b"]
    assert len(b) == 1 and b["n_rows"].iloc[0] == 2


def test_scd2_partition_invariant(spark):
    from kkbox_churn_prediction_spark.operators.scd import scd2_intervals

    a = sorted(map(tuple, scd2_intervals(_stream(spark, 1), "conv_id", "turn_idx", "attr").collect()))
    b = sorted(map(tuple, scd2_intervals(_stream(spark, 7), "conv_id", "turn_idx", "attr").collect()))
    assert a == b


def test_snapshot_at_returns_one_run_per_key(spark):
    from kkbox_churn_prediction_spark.operators.scd import scd2_intervals, snapshot_at

    iv = scd2_intervals(_stream(spark), "conv_id", "turn_idx", "attr", ts_col="ts")
    snap = snapshot_at(iv, "conv_id", _t(12)).toPandas()
    assert len(snap) == 2  # one per key
    row = snap[snap["conv_id"] == "a"].iloc[0]
    assert row["attr"] is None and row["run_idx"] == 1
    # probe inside the open-ended last run
    snap2 = snapshot_at(iv, "conv_id", dt.datetime(2024, 1, 1, 2, 0)).toPandas()
    assert snap2[snap2["conv_id"] == "a"]["run_idx"].iloc[0] == 2


def _points_intervals(spark):
    pts = spark.createDataFrame(
        [("a", 0, _t(m)) for m in (0, 7, 12, 30)] + [("b", 0, _t(3))],
        ["conv_id", "pid", "ts"],
    ).withColumn("pid", F.monotonically_increasing_id())
    iv = spark.createDataFrame(
        [
            ("a", 0, _t(0), _t(10)),
            ("a", 1, _t(10), None),  # open-ended
            ("b", 0, _t(0), _t(5)),
        ],
        ["conv_id", "iv_id", "valid_from", "valid_to"],
    )
    return pts, iv


def test_interval_join_range_halfopen(spark):
    from kkbox_churn_prediction_spark.operators.intervals import interval_join

    pts, iv = _points_intervals(spark)
    out = interval_join(
        pts, iv, key="conv_id", ts_col="ts",
        start_col="valid_from", end_col="valid_to",
    ).toPandas()
    # every point matched exactly once (disjoint cover)
    assert len(out) == 5
    got = {(r["conv_id"], r["ts"].minute): r["iv_id"] for _, r in out.iterrows()}
    assert got == {("a", 0): 0, ("a", 7): 0, ("a", 12): 1, ("a", 30): 1, ("b", 3): 0}


def test_interval_join_bucket_equals_range(spark):
    from kkbox_churn_prediction_spark.operators.intervals import interval_join

    pts, iv = _points_intervals(spark)
    kw = dict(key="conv_id", ts_col="ts", start_col="valid_from", end_col="valid_to")
    a = sorted(map(tuple, interval_join(pts, iv, **kw).collect()))
    b = sorted(
        map(
            tuple,
            interval_join(
                pts, iv, strategy="bucket", bucket_seconds=300,
                horizon=_t(59), **kw,
            ).collect(),
        )
    )
    assert a == b


def test_interval_join_closed_sessions_roundtrip(spark):
    """Turns joined back to their own session spans recover session_id."""
    from kkbox_churn_prediction_spark.operators.intervals import (
        interval_join,
        session_intervals,
    )
    from kkbox_churn_prediction_spark.operators.sessionize import sessionize

    turns = spark.createDataFrame(
        [("c", i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), "t")
         for i, m in enumerate([0, 10, 20, 120, 125, 500])],
        ["conv_id", "turn_idx", "ts", "text"],
    )
    sess = sessionize(turns)
    spans = session_intervals(sess)
    joined = interval_join(
        turns, spans, key="conv_id", ts_col="ts",
        start_col="s_start", end_col="s_end", closed=True,
    ).toPandas()
    truth = sess.toPandas().set_index("turn_idx")["session_id"]
    assert len(joined) == 6
    for _, r in joined.iterrows():
        assert r["session_id"] == truth.loc[r["turn_idx"]]


def test_apply_cdc_snapshot_and_tombstones(spark):
    from datetime import datetime

    from kkbox_churn_prediction_spark.operators.scd import apply_cdc

    T = datetime
    rows = [
        (1, "I", 10.0, T(2024, 1, 1), 1), (1, "U", 20.0, T(2024, 1, 2), 2),
        (2, "I", 5.0, T(2024, 1, 1), 3), (2, "D", None, T(2024, 1, 3), 4),
        (3, "D", None, T(2024, 1, 1), 5), (3, "I", 7.0, T(2024, 1, 2), 6),  # re-created
        (4, "I", 1.0, T(2024, 1, 1), 7), (4, "U", 2.0, T(2024, 1, 1), 8),   # ts tie → event_id
    ]
    df = spark.createDataFrame(
        rows, "k long, op string, value double, ts timestamp, event_id long"
    )
    got = {r["k"]: r["value"]
           for r in apply_cdc(df, ["k"], "ts", "op", tiebreak_col="event_id").collect()}
    assert got == {1: 20.0, 3: 7.0, 4: 2.0}  # 2 tombstoned; 3 recreated after delete
    # plan: algebraic aggregate, no window sort of the change stream
    plan = apply_cdc(df, ["k"], "ts", "op", tiebreak_col="event_id")._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "max_by" in plan


def test_snapshot_diff_all_statuses(spark):
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.scd import snapshot_diff

    # window A = t in [0, 10), window B = t in [10, 20)
    rows = (
        [("gone", 1), ("gone", 2)]            # A only → removed
        + [("new", 15)]                        # B only → added
        + [("up", 3), ("up", 12), ("up", 13)]  # 1 → 2 → changed (+1)
        + [("same", 4), ("same", 14)]          # 1 → 1 → unchanged
        + [("out", 99)]                        # neither → dropped
    )
    df = spark.createDataFrame(rows, ["k", "t"])
    out = {
        r["status"]: r
        for r in snapshot_diff(
            df, "k",
            (F.col("t") >= 0) & (F.col("t") < 10),
            (F.col("t") >= 10) & (F.col("t") < 20),
        ).collect()
    }
    assert set(out) == {"added", "removed", "changed", "unchanged"}
    assert out["removed"]["n_entities"] == 1 and out["removed"]["total_delta"] == -2
    assert out["added"]["n_entities"] == 1 and out["added"]["total_delta"] == 1
    assert out["changed"]["n_entities"] == 1 and out["changed"]["total_delta"] == 1
    assert out["unchanged"]["n_entities"] == 1 and out["unchanged"]["total_delta"] == 0
    assert out["changed"]["avg_abs_delta"] == 1.0
