"""Round-3 continuation: Nelson-Aalen, sharp RDD, freshness audit,
compaction plan."""

from __future__ import annotations

import datetime

import pytest

from kkbox_churn_prediction_spark.operators.abtest import regression_discontinuity
from kkbox_churn_prediction_spark.operators.layout import compaction_plan
from kkbox_churn_prediction_spark.operators.profile import freshness_audit
from kkbox_churn_prediction_spark.operators.survival import nelson_aalen

TS = datetime.datetime


# ---------------------------------------------------------------- Nelson-Aalen
def _labels(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, cutoff_ts timestamp, duration_days int, observed int"
    )


def test_nelson_aalen_hand_computed(spark):
    t0 = TS(2024, 1, 1)
    # durations: 1 (event), 1 (event), 2 (censored), 3 (event)
    rows = [
        ("a", t0, 1, 1),
        ("b", t0, 1, 1),
        ("c", t0, 2, 0),
        ("d", t0, 3, 1),
    ]
    out = {r.t: r for r in nelson_aalen(_labels(spark, rows)).collect()}
    # t=1: n=4, d=2 -> H=0.5 ; t=2: n=2, d=0 -> H=0.5 ; t=3: n=1, d=1 -> H=1.5
    assert out[1].n_risk == 4 and out[1].n_event == 2
    assert out[1].cum_hazard == pytest.approx(0.5)
    assert out[2].cum_hazard == pytest.approx(0.5)
    assert out[3].n_risk == 1
    assert out[3].cum_hazard == pytest.approx(1.5)
    # variance: 2/16 at t=1, +0 at t=2, +1/1 at t=3
    assert out[3].hazard_var == pytest.approx(0.125 + 1.0)
    # FH survival = exp(-H), monotone nonincreasing
    assert out[1].fh_survival == pytest.approx(0.606531, abs=1e-6)
    assert out[1].fh_survival >= out[2].fh_survival >= out[3].fh_survival


def test_nelson_aalen_no_events_flat_hazard(spark):
    t0 = TS(2024, 1, 1)
    rows = [("a", t0, 5, 0), ("b", t0, 5, 0)]
    (r,) = nelson_aalen(_labels(spark, rows)).collect()
    assert r.cum_hazard == 0.0 and r.fh_survival == 1.0


# ------------------------------------------------------------------- sharp RDD
def _pts(spark, rows):
    return spark.createDataFrame(rows, "x double, y double")


def test_rdd_recovers_known_jump(spark):
    # y = 10 + 1·x left of 0; y = 30 + 2·x right of 0 (exact lines)
    rows = [(float(x), 10.0 + 1.0 * x) for x in range(-5, 0)]
    rows += [(float(x), 30.0 + 2.0 * x) for x in range(0, 5)]
    (r,) = regression_discontinuity(
        _pts(spark, rows), "x", "y", cutoff=0.0, bandwidth=10.0
    ).collect()
    assert r.n_l == 5 and r.n_r == 5
    assert r.intercept_left == pytest.approx(10.0)
    assert r.slope_left == pytest.approx(1.0)
    assert r.intercept_right == pytest.approx(30.0)
    assert r.slope_right == pytest.approx(2.0)
    assert r.rd_effect == pytest.approx(20.0)


def test_rdd_bandwidth_excludes_far_points(spark):
    rows = [(-1.0, 5.0), (-2.0, 4.0), (1.0, 9.0), (2.0, 10.0), (50.0, 999.0)]
    (r,) = regression_discontinuity(
        _pts(spark, rows), "x", "y", cutoff=0.0, bandwidth=3.0
    ).collect()
    assert r.n_l == 2 and r.n_r == 2  # the x=50 outlier is outside the window


def test_rdd_no_jump_when_line_continuous(spark):
    rows = [(float(x), 3.0 + 0.5 * x) for x in range(-6, 7)]
    (r,) = regression_discontinuity(
        _pts(spark, rows), "x", "y", cutoff=0.0, bandwidth=6.0
    ).collect()
    assert r.rd_effect == pytest.approx(0.0, abs=1e-9)
    assert r.slope_left == pytest.approx(0.5) and r.slope_right == pytest.approx(0.5)


# ------------------------------------------------------------- freshness audit
def _events(spark, rows):
    return spark.createDataFrame(rows, "src string, ts timestamp")


def test_freshness_lag_and_stale_flag(spark):
    hw = TS(2024, 3, 10, 12, 0, 0)  # global high-water mark (source a)
    rows = [
        ("a", hw),
        ("a", TS(2024, 3, 9)),
        ("b", TS(2024, 3, 10, 6, 0, 0)),  # 6h behind -> fresh
        ("c", TS(2024, 3, 7, 12, 0, 0)),  # 72h behind -> stale
    ]
    out = {r.src: r for r in freshness_audit(_events(spark, rows), "src", "ts").collect()}
    assert out["a"].lag_hours == 0.0 and out["a"].is_stale == 0
    assert out["b"].lag_hours == pytest.approx(6.0) and out["b"].is_stale == 0
    assert out["c"].lag_hours == pytest.approx(72.0) and out["c"].is_stale == 1
    assert out["a"].max_ts == hw and out["a"].n_rows == 2


def test_freshness_recent_window_is_calendar_days(spark):
    # global max day = Mar 10; trailing 7 days = Mar 4..Mar 10 inclusive
    rows = [
        ("a", TS(2024, 3, 10, 1)),
        ("a", TS(2024, 3, 4, 23)),   # inside (day Mar 4)
        ("a", TS(2024, 3, 3, 23)),   # outside
        ("b", TS(2024, 3, 1)),       # outside
    ]
    out = {r.src: r for r in freshness_audit(_events(spark, rows), "src", "ts").collect()}
    assert out["a"].rows_recent == 2
    assert out["b"].rows_recent == 0 and out["b"].n_rows == 1


# ------------------------------------------------------------- compaction plan
def _shards(spark, rows):
    return spark.createDataFrame(rows, "f string, bytes long")


def test_compaction_buckets_running_sum(spark):
    # sorted by bytes desc: 90, 80, 40, 30, 10 ; target 100
    rows = [("a", 90), ("b", 80), ("c", 40), ("d", 30), ("e", 10)]
    out = {
        r.f: r
        for r in compaction_plan(
            _shards(spark, rows), ["f"], "bytes", target_bytes=100
        ).collect()
    }
    # before-sums: a=0, b=90, c=170, d=210, e=240 -> buckets 0,0,1,2,2
    assert out["a"].bucket == 0 and out["b"].bucket == 0
    assert out["c"].bucket == 1
    assert out["d"].bucket == 2 and out["e"].bucket == 2
    assert out["a"].bucket_bytes == 170 and out["a"].bucket_files == 2
    assert out["d"].bucket_bytes == 40 and out["d"].bucket_files == 2


def test_compaction_every_shard_assigned_once(spark):
    rows = [(f"s{i}", 7 * (i + 1) % 50 + 1) for i in range(40)]
    df = compaction_plan(_shards(spark, rows), ["f"], "bytes", target_bytes=64)
    got = df.collect()
    assert len(got) == 40 and len({r.f for r in got}) == 40
    total = sum(r.bytes for r in got)
    assert total == sum(b for _, b in rows)
    # bucket ids are a dense-ish nonneg sequence starting at 0
    assert min(r.bucket for r in got) == 0


def test_compaction_deterministic_tiebreak(spark):
    rows = [("b", 50), ("a", 50), ("c", 50)]
    out1 = sorted(
        compaction_plan(_shards(spark, rows), ["f"], "bytes", 60).collect(),
        key=lambda r: r.f,
    )
    out2 = sorted(
        compaction_plan(_shards(spark, rows[::-1]), ["f"], "bytes", 60).collect(),
        key=lambda r: r.f,
    )
    assert [(r.f, r.bucket) for r in out1] == [(r.f, r.bucket) for r in out2]
