"""Hopping windows, Welch t-test, turn-taking."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

import pandas as pd
from pyspark.sql import functions as F

from kkbox_churn_prediction_spark.operators.abtest import welch_t_stats
from kkbox_churn_prediction_spark.operators.rhythm import turn_taking
from kkbox_churn_prediction_spark.operators.windows import (
    hopping_window_counts,
    tumbling_window_counts,
)

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _turns(spark, rows):
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    return spark.createDataFrame(pdf)


class TestHopping:
    def test_each_turn_in_ratio_windows(self, spark):
        # one turn at 00:30 with 2h/1h windows -> windows starting 23:00 and 00:00
        rows = [("a", 0, "user", "x", None, T0 + timedelta(minutes=30))]
        out = hopping_window_counts(_turns(spark, rows), 7200, 3600).collect()
        starts = sorted(r["window_start_us"] for r in out)
        base_us = int(T0.timestamp()) * 1_000_000
        assert starts == [base_us - 3_600_000_000, base_us]
        assert all(r["n_turns"] == 1 and r["n_convs"] == 1 for r in out)

    def test_totals_conserved(self, spark):
        rows = [
            ("a", i, "user", "x", None, T0 + timedelta(minutes=17 * i)) for i in range(20)
        ] + [
            ("b", i, "user", "x", None, T0 + timedelta(minutes=23 * i)) for i in range(10)
        ]
        out = hopping_window_counts(_turns(spark, rows), 7200, 3600).collect()
        # each of the 30 turns appears in exactly width/slide = 2 windows
        assert sum(r["n_turns"] for r in out) == 60

    def test_slide_equals_width_is_tumbling(self, spark):
        rows = [
            ("a", i, "user", "x", None, T0 + timedelta(minutes=40 * i)) for i in range(12)
        ]
        hop = hopping_window_counts(_turns(spark, rows), 3600, 3600)
        tot_hop = sum(r["n_turns"] for r in hop.collect())
        tum = tumbling_window_counts(_turns(spark, rows), 3600)
        tot_tum = sum(r["n_turns"] for r in tum.collect())
        assert tot_hop == tot_tum == 12


class TestWelch:
    def test_against_scipy_formulas(self, spark):
        import numpy as np

        a = [1.0, 2.0, 3.0, 4.0, 5.0]
        b = [2.0, 4.0, 6.0, 8.0]
        pdf = pd.DataFrame(
            {"m": a + b, "g": ["a"] * len(a) + ["b"] * len(b)}
        )
        r = welch_t_stats(
            spark.createDataFrame(pdf), F.col("m"), F.col("g")
        ).collect()[0]
        va, vb = np.var(a, ddof=1), np.var(b, ddof=1)
        se2 = va / len(a) + vb / len(b)
        t_exp = (np.mean(a) - np.mean(b)) / math.sqrt(se2)
        df_exp = se2**2 / (
            (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
        )
        assert abs(r["t_stat"] - t_exp) < 1e-12
        assert abs(r["welch_df"] - df_exp) < 1e-12
        assert r["n_a"] == 5 and r["n_b"] == 4

    def test_degenerate_variance(self, spark):
        pdf = pd.DataFrame({"m": [3.0, 3.0, 3.0, 3.0], "g": ["a", "a", "b", "b"]})
        r = welch_t_stats(spark.createDataFrame(pdf), F.col("m"), F.col("g")).collect()[0]
        assert r["t_stat"] == 0.0 and r["welch_df"] == 0.0 and r["cohens_d"] == 0.0


class TestTurnTaking:
    def test_alternation_extremes(self, spark):
        rows = [
            # a: perfect ping-pong (4 turns, 3 switches / 3 gaps)
            ("a", 0, "user", "x", None, T0),
            ("a", 1, "assistant", "x", None, T0 + timedelta(seconds=1)),
            ("a", 2, "user", "x", None, T0 + timedelta(seconds=2)),
            ("a", 3, "assistant", "x", None, T0 + timedelta(seconds=3)),
            # b: monologue
            ("b", 0, "user", "x", None, T0),
            ("b", 1, "user", "x", None, T0 + timedelta(seconds=1)),
            ("b", 2, "user", "x", None, T0 + timedelta(seconds=2)),
        ]
        got = {r["conv_id"]: r for r in turn_taking(_turns(spark, rows)).collect()}
        assert got["a"]["alternation_rate"] == 1.0
        assert abs(got["a"]["user_frac"] - 0.5) < 1e-12
        assert got["b"]["alternation_rate"] == 0.0
        assert got["b"]["user_frac"] == 1.0 and got["b"]["assistant_frac"] == 0.0

    def test_single_turn_conversation(self, spark):
        rows = [("a", 0, "user", "x", None, T0)]
        r = turn_taking(_turns(spark, rows)).collect()[0]
        assert r["n_turns"] == 1 and r["alternation_rate"] == 0.0
