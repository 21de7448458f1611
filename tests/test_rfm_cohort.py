"""RFM quintile scoring and cohort retention."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd

from kkbox_churn_prediction_spark.operators.cohort import cohort_retention
from kkbox_churn_prediction_spark.operators.rfm import rfm_scores, rfm_table

# a Monday noon, so the derived cutoff is the NEXT Monday midnight
T0 = datetime(2024, 1, 1, 12, 0, 0)
CUTOFF = datetime(2024, 1, 8, 0, 0, 0)


class TestRFM:
    def _events(self, spark):
        rows = []
        # 10 users, user i has i+1 events, most recent i hours before
        # the cutoff, each worth 10*(i+1)
        for i in range(10):
            for j in range(i + 1):
                rows.append(
                    (i, CUTOFF - timedelta(hours=i + 1 + j), float(10 * (i + 1)))
                )
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["user_id", "ts", "value"])
        )

    def test_raw_trio(self, spark):
        out = {r["user_id"]: r for r in rfm_table(self._events(spark)).collect()}
        assert len(out) == 10
        r0 = out[0]
        assert abs(r0["recency_days"] - 1 / 24) < 1e-9
        assert r0["frequency"] == 1 and abs(r0["monetary"] - 10.0) < 1e-12
        r9 = out[9]
        assert r9["frequency"] == 10 and abs(r9["monetary"] - 1000.0) < 1e-12

    def test_scores_monotone_and_inverted(self, spark):
        scored = {r["user_id"]: r for r in rfm_scores(rfm_table(self._events(spark))).collect()}
        # user 0: most recent, least frequent, least monetary
        assert scored[0]["r_score"] == 5
        assert scored[0]["f_score"] == 1 and scored[0]["m_score"] == 1
        assert scored[0]["rfm_segment"] == 511
        # user 9: stalest, most frequent, biggest spender
        assert scored[9]["r_score"] == 1
        assert scored[9]["f_score"] == 5 and scored[9]["m_score"] == 5
        assert scored[9]["rfm_segment"] == 155
        for r in scored.values():
            assert 1 <= r["r_score"] <= 5 <= 5
            assert 1 <= r["f_score"] <= 5 and 1 <= r["m_score"] <= 5

    def test_lookback_excludes_old_events(self, spark):
        rows = [
            (1, CUTOFF - timedelta(days=1), 5.0),
            (1, CUTOFF - timedelta(days=40), 1000.0),  # outside 28d lookback
        ]
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["user_id", "ts", "value"]))
        out = rfm_table(df).collect()
        assert len(out) == 1
        assert out[0]["frequency"] == 1 and abs(out[0]["monetary"] - 5.0) < 1e-12


class TestCohort:
    def test_matrix(self, spark):
        def t(conv, week, role="user"):
            return (conv, 0, role, "x", None, T0 + timedelta(weeks=week))

        rows = [
            # cohort W0: a, b, c — a active W0+W1+W2, b active W0+W2, c only W0
            t("a", 0), t("a", 1), t("a", 2),
            t("b", 0), t("b", 2),
            t("c", 0),
            # cohort W1: d — active W1 only
            t("d", 1),
        ]
        pdf = pd.DataFrame(
            rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        )
        out = cohort_retention(spark.createDataFrame(pdf)).collect()
        m = {(r["cohort_week"] , r["age_weeks"]): r for r in out}
        w0 = min(k[0] for k in m)
        assert m[(w0, 0)]["n_active"] == 3 and m[(w0, 0)]["cohort_size"] == 3
        assert m[(w0, 1)]["n_active"] == 1
        assert abs(m[(w0, 1)]["retention"] - 1 / 3) < 1e-12
        assert m[(w0, 2)]["n_active"] == 2
        assert m[(w0 + 1, 0)]["n_active"] == 1
        # retention at age 0 is always 1.0
        assert all(abs(r["retention"] - 1.0) < 1e-12 for k, r in m.items() if k[1] == 0)

    def test_multiple_turns_one_week_count_once(self, spark):
        rows = [
            ("a", 0, "user", "x", None, T0),
            ("a", 1, "user", "x", None, T0 + timedelta(hours=2)),
        ]
        pdf = pd.DataFrame(
            rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        )
        out = cohort_retention(spark.createDataFrame(pdf)).collect()
        assert len(out) == 1 and out[0]["n_active"] == 1


class TestWinsorize:
    def test_clip_bounds_and_flags(self, spark):
        from kkbox_churn_prediction_spark.operators.winsorize import (
            winsorize,
            winsorize_audit,
        )

        vals = list(range(1, 101))  # 1..100
        df = spark.createDataFrame(
            pd.DataFrame({"event_id": range(100), "value": [float(v) for v in vals]})
        )
        out = winsorize(df, "value", 0.01, 0.99).collect()
        # exact interpolated p01/p99 of 1..100 are 1.99 and 99.01
        w = {r["event_id"]: r for r in out}
        assert w[0]["value_w"] == 1.99 and w[0]["clipped_low"]
        assert w[99]["value_w"] == 99.01 and w[99]["clipped_high"]
        mid = w[49]
        assert mid["value_w"] == mid["value"] and not mid["clipped_low"]
        audit = winsorize_audit(winsorize(df, "value", 0.01, 0.99), "value").collect()[0]
        assert audit["n"] == 100
        assert abs(audit["frac_clipped_low"] - 0.01) < 1e-12
        assert abs(audit["frac_clipped_high"] - 0.01) < 1e-12
        assert audit["mean_shift"] > 0 - 1e-12  # symmetric here, tiny

    def test_idempotent_on_clean_data(self, spark):
        from kkbox_churn_prediction_spark.operators.winsorize import winsorize

        df = spark.createDataFrame(
            pd.DataFrame({"event_id": range(10), "value": [5.0] * 10})
        )
        out = winsorize(df, "value").collect()
        assert all(r["value_w"] == 5.0 for r in out)
        assert not any(r["clipped_low"] or r["clipped_high"] for r in out)
