"""Sharding, PII redaction, Count-Min sketch, ordered funnel."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd

from kkbox_churn_prediction_spark.operators.cms import cms_build, cms_estimate, cms_merge
from kkbox_churn_prediction_spark.operators.funnel import funnel_rollup, funnel_steps
from kkbox_churn_prediction_spark.operators.redact import redact_pii
from kkbox_churn_prediction_spark.operators.sharding import assign_shards, shard_profile

T0 = datetime(2024, 1, 1, 12, 0, 0)


def _docs(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )


class TestSharding:
    def test_deterministic_and_in_range(self, spark):
        docs = _docs(spark, [f"doc {i}" for i in range(200)])
        a = {r["doc_id"]: r["shard_id"] for r in assign_shards(docs, 8).collect()}
        b = {r["doc_id"]: r["shard_id"] for r in assign_shards(docs, 8).collect()}
        assert a == b
        assert all(0 <= s < 8 for s in a.values())
        assert len(set(a.values())) > 1  # actually spreads

    def test_profile_conserves_totals(self, spark):
        texts = ["one two three", "four five", "six"]
        prof = shard_profile(_docs(spark, texts), n_shards=4).collect()
        assert sum(r["n_docs"] for r in prof) == 3
        assert sum(r["n_tokens"] for r in prof) == 6
        assert sum(r["n_bytes"] for r in prof) == sum(len(t) for t in texts)


class TestRedact:
    def test_patterns_and_order(self, spark):
        df = _docs(
            spark,
            [
                "contact bob@example.com or 10.0.0.1 ref 123456 ok",
                "no pii here",
                "digits 42 and 7",
            ],
        )
        out = {r["doc_id"]: r for r in redact_pii(df).collect()}
        r0 = out[0]
        # email swallowed whole (its digits must NOT leak into <NUM>),
        # IP replaced before bare digit runs
        assert r0["redacted_text"] == "contact <EMAIL> or <IP> ref <NUM> ok"
        assert (r0["n_email"], r0["n_ip"]) == (1, 1)
        assert out[1]["n_pii_total"] == 0
        assert out[1]["redacted_text"] == "no pii here"
        # 42 matches the >=2-digit run, single 7 does not
        assert out[2]["redacted_text"] == "digits <NUM> and 7"
        assert out[2]["n_digit_run"] == 1

    def test_null_text(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [0], "text": [None]}).astype({"text": "object"})
        )
        r = redact_pii(df).collect()[0]
        assert r["redacted_text"] == "" and r["n_pii_total"] == 0


class TestCMS:
    def _events(self, spark):
        rows = []
        # skewed: key 'a' 50x, 'b' 10x, 'c' 3x across two days
        for i in range(50):
            rows.append(("a", T0 + timedelta(days=i % 2)))
        for i in range(10):
            rows.append(("b", T0 + timedelta(days=i % 2)))
        for i in range(3):
            rows.append(("c", T0))
        pdf = pd.DataFrame(rows, columns=["k", "ts"])
        pdf["day"] = pdf["ts"].dt.date
        return spark.createDataFrame(pdf[["k", "day"]])

    def test_never_underestimates(self, spark):
        ev = self._events(spark)
        daily = cms_build(ev, "k", "day", depth=4, width=8)
        probes = ev.select("k").distinct().withColumnRenamed("k", "k")
        est = {
            (r["bucket"], r["k"]): r["cms_count"]
            for r in cms_estimate(daily, probes, width=8, depth=4).collect()
        }
        exact = {
            (r["day"], r["k"]): r["c"]
            for r in ev.groupBy("day", "k").count().withColumnRenamed("count", "c").collect()
        }
        for key, true_cnt in exact.items():
            assert est[key] >= true_cnt

    def test_merge_equals_direct_build(self, spark):
        from pyspark.sql import functions as F

        ev = self._events(spark)
        daily = cms_build(ev, "k", "day", depth=4, width=8)
        merged = cms_merge(daily, regroup=F.lit("all"))
        direct = cms_build(ev.withColumn("day", F.lit("all")), "k", "day", depth=4, width=8)
        m = {(r["row_d"], r["slot"]): r["cnt"] for r in merged.collect()}
        d = {(r["row_d"], r["slot"]): r["cnt"] for r in direct.collect()}
        assert m == d

    def test_absent_key_estimates_small(self, spark):
        ev = self._events(spark)
        daily = cms_build(ev, "k", "day", depth=4, width=64)
        probes = spark.createDataFrame(pd.DataFrame({"k": ["zz_never_seen"]}))
        for r in cms_estimate(daily, probes, width=64, depth=4).collect():
            # wide sketch + 4 independent rows: the min over rows for an
            # absent key is almost surely a zero slot
            assert r["cms_count"] <= 3


class TestFunnel:
    def _turns(self, spark, rows):
        pdf = pd.DataFrame(
            rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        )
        return spark.createDataFrame(pdf)

    def test_order_matters(self, spark):
        rows = [
            # conv a: full ordered funnel
            ("a", 0, "system", "x", None, T0),
            ("a", 1, "user", "x", None, T0 + timedelta(seconds=10)),
            ("a", 2, "assistant", "x", None, T0 + timedelta(seconds=25)),
            # conv b: user BEFORE system -> step2 not reached
            ("b", 0, "user", "x", None, T0),
            ("b", 1, "system", "x", None, T0 + timedelta(seconds=5)),
            # conv c: no system at all
            ("c", 0, "user", "x", None, T0),
            ("c", 1, "assistant", "x", None, T0 + timedelta(seconds=1)),
        ]
        got = {r["conv_id"]: r for r in funnel_steps(self._turns(spark, rows)).collect()}
        a = got["a"]
        assert (a["reached_step1"], a["reached_step2"], a["reached_step3"]) == (1, 1, 1)
        assert abs(a["hop1_seconds"] - 10.0) < 1e-9
        assert abs(a["hop2_seconds"] - 15.0) < 1e-9
        b = got["b"]
        assert (b["reached_step1"], b["reached_step2"]) == (1, 0)
        assert b["hop1_seconds"] == -1.0
        c = got["c"]
        assert (c["reached_step1"], c["reached_step2"], c["reached_step3"]) == (0, 0, 0)

    def test_rollup_rates(self, spark):
        rows = [
            ("a", 0, "system", "x", None, T0),
            ("a", 1, "user", "x", None, T0 + timedelta(seconds=1)),
            ("b", 0, "system", "x", None, T0),
        ]
        r = funnel_rollup(funnel_steps(self._turns(spark, rows))).collect()[0]
        assert r["n_entities"] == 2 and r["n_step1"] == 2 and r["n_step2"] == 1
        assert abs(r["conv_step2"] - 0.5) < 1e-12
        assert r["conv_step3"] == 0.0


class TestKAnonymity:
    def test_small_cell_flagged(self, spark):
        rows = []
        # combo (user, None): 6 entities -> safe at k=5
        for i in range(6):
            rows.append((f"u{i}", 0, "user", "x", None, T0))
        # combo (tool, error): 2 entities -> at risk
        rows.append(("r1", 0, "tool", "x", "error", T0))
        rows.append(("r2", 0, "tool", "x", "error", T0))
        pdf = pd.DataFrame(
            rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        )
        from kkbox_churn_prediction_spark.operators.privacy import (
            k_anonymity_audit,
            k_anonymity_summary,
        )

        audit = {
            (r["role"], r["tool"]): r
            for r in k_anonymity_audit(
                spark.createDataFrame(pdf), ("role", "tool"), "conv_id", k=5
            ).collect()
        }
        assert not audit[("user", None)]["at_risk"]
        assert audit[("user", None)]["n_entities"] == 6
        assert audit[("tool", "error")]["at_risk"]
        s = k_anonymity_summary(
            k_anonymity_audit(
                spark.createDataFrame(pdf), ("role", "tool"), "conv_id", k=5
            )
        ).collect()[0]
        assert s["n_combos"] == 2 and s["n_risky_combos"] == 1
        assert s["rows_at_risk"] == 2 and s["dataset_k"] == 2

    def test_entity_counted_once_per_combo(self, spark):
        rows = [
            ("a", 0, "user", "x", None, T0),
            ("a", 1, "user", "y", None, T0 + timedelta(hours=1)),
        ]
        pdf = pd.DataFrame(
            rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        )
        from kkbox_churn_prediction_spark.operators.privacy import k_anonymity_audit

        r = k_anonymity_audit(
            spark.createDataFrame(pdf), ("role", "tool"), "conv_id", k=5
        ).collect()[0]
        assert r["n_entities"] == 1 and r["n_rows"] == 2

    def test_l_diversity_homogeneity_and_null_class(self, spark):
        rows = [
            # (user, day0): two distinct tools -> diverse at l=2
            ("a", 0, "user", "x", "search", T0),
            ("b", 0, "user", "x", "code", T0),
            # (tool, day0): 3 rows but ONE sensitive value -> homogeneous
            ("c", 0, "tool", "x", "error", T0),
            ("d", 0, "tool", "x", "error", T0),
            ("e", 0, "tool", "x", "error", T0),
            # (system, day0): NULL tool is its own sensitive class
            ("f", 0, "system", "x", None, T0),
            ("g", 0, "system", "x", "search", T0),
        ]
        pdf = pd.DataFrame(
            rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        )
        from kkbox_churn_prediction_spark.operators.privacy import l_diversity_audit

        out = {
            r["role"]: r
            for r in l_diversity_audit(
                spark.createDataFrame(pdf), ("role",), "tool", l=2
            ).collect()
        }
        assert out["user"]["n_sensitive"] == 2 and out["user"]["is_l_diverse"]
        # k-anonymity would pass this cell (3 rows); l-diversity catches it
        assert out["tool"]["n_sensitive"] == 1 and not out["tool"]["is_l_diverse"]
        assert out["tool"]["n_rows"] == 3
        assert out["system"]["n_sensitive"] == 2  # NULL counted as a class

    def test_t_closeness_skew_cell(self, spark):
        # Global tool distribution: 4×search, 4×code (50/50).
        # Cell 'user': 3×search + 1×code  -> TVD = |3/4-1/2|/... = 0.25
        # Cell 'tool': 1×search + 3×code  -> TVD = 0.25 (symmetric)
        # Both cells are l-diverse (2 tools) yet skewed vs global.
        rows = (
            [("a", 0, "user", "x", "search", T0)] * 3
            + [("b", 0, "user", "x", "code", T0)]
            + [("c", 0, "tool", "x", "search", T0)]
            + [("d", 0, "tool", "x", "code", T0)] * 3
        )
        pdf = pd.DataFrame(
            rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        )
        from kkbox_churn_prediction_spark.operators.privacy import t_closeness_audit

        out = {
            r["role"]: r
            for r in t_closeness_audit(
                spark.createDataFrame(pdf), ("role",), "tool", t=0.2
            ).collect()
        }
        # TVD = 0.5*(|0.75-0.5| + |0.25-0.5|) = 0.25 for both cells
        assert abs(out["user"]["tvd"] - 0.25) < 1e-12
        assert abs(out["tool"]["tvd"] - 0.25) < 1e-12
        assert out["user"]["at_risk"] and out["tool"]["at_risk"]
        assert out["user"]["n_rows"] == 4

    def test_t_closeness_missing_mass_and_null(self, spark):
        # Cell 'user' holds ONLY NULL-tool rows; global also has
        # 'search' rows elsewhere, so the cell pays the full missing
        # mass of 'search' plus the NULL-class surplus.
        rows = (
            [("a", 0, "user", "x", None, T0)] * 2
            + [("b", 0, "tool", "x", "search", T0)] * 2
        )
        pdf = pd.DataFrame(
            rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        )
        from kkbox_churn_prediction_spark.operators.privacy import t_closeness_audit

        out = {
            r["role"]: r
            for r in t_closeness_audit(
                spark.createDataFrame(pdf), ("role",), "tool", t=0.2
            ).collect()
        }
        # cell user: q = {NULL:1.0}; global p = {NULL:.5, search:.5}
        # TVD = 0.5*(|1-.5| + |0-.5|) = 0.5
        assert abs(out["user"]["tvd"] - 0.5) < 1e-12
        assert out["user"]["at_risk"]

    def test_t_closeness_matching_cell_is_safe(self, spark):
        # A cell that mirrors the global distribution has TVD 0.
        rows = (
            [("a", 0, "user", "x", "search", T0), ("a", 1, "user", "x", "code", T0)]
            + [("b", 0, "tool", "x", "search", T0), ("b", 1, "tool", "x", "code", T0)]
        )
        pdf = pd.DataFrame(
            rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        )
        from kkbox_churn_prediction_spark.operators.privacy import t_closeness_audit

        out = t_closeness_audit(
            spark.createDataFrame(pdf), ("role",), "tool", t=0.2
        ).collect()
        assert all(r["tvd"] == 0.0 and not r["at_risk"] for r in out)


def test_rule_router_first_match_wins(spark):
    from kkbox_churn_prediction_spark.operators.rules import apply_rules, rule_audit

    df = spark.createDataFrame(
        [(1, 150, 0.5), (2, 10, 0.05), (3, 10, 0.9), (4, 50, 0.1)],
        "id long, n long, rate double",
    )
    rules = [
        ("n >= 100", "power"),          # row 1 matches here AND below → first wins
        ("rate > 0.4", "hot"),
        ("n < 20", "small"),
    ]
    out = {r["id"]: r["bucket"] for r in apply_rules(df, rules, "other").collect()}
    assert out == {1: "power", 2: "small", 3: "hot", 4: "other"}
    audit = {r["bucket"]: r["n_rows"]
             for r in rule_audit(apply_rules(df, rules, "other")).collect()}
    assert audit == {"power": 1, "small": 1, "hot": 1, "other": 1}
    # empty rule table → everything defaults
    assert {r["bucket"] for r in apply_rules(df, [], "d").collect()} == {"d"}
    # pure projection: no exchange added by the router itself
    plan = apply_rules(df, rules, "other")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_mad_outliers_robust_to_the_outlier_itself(spark):
    from kkbox_churn_prediction_spark.operators.winsorize import mad_outliers

    rows = [("g", v) for v in [10, 11, 9, 10, 12, 10, 11, 1000]]  # one wild point
    rows += [("z", v) for v in [5, 5, 5, 5, 7]]                    # zero-MAD group
    df = spark.createDataFrame(rows, "g string, v long")
    out = {(r["g"], r["v"]): r for r in mad_outliers(df, "g", "v").collect()}
    # the 1000 is flagged; the inliers are not (mean/std would have
    # absorbed it: mean≈134, std≈349 → z(1000)≈2.5, under a 3σ rule)
    assert out[("g", 1000)]["is_outlier"] == 1
    assert all(out[("g", v)]["is_outlier"] == 0 for v in [9, 10, 11, 12])
    assert out[("g", 1000)]["group_median"] == 10.5
    # zero-MAD: only the deviant value flags
    assert out[("z", 7)]["is_outlier"] == 1 and out[("z", 5)]["is_outlier"] == 0
