"""Goldens for the relational operator inventory + streaming bridge."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
import pytest
from pyspark.sql import functions as F

from kkbox_churn_prediction_spark.operators.relational import (
    daily_engagement,
    last_value_before_cutoff,
    mode_per_group,
    pivot_role_counts,
    semi_join_tool_users,
    session_length_percentiles,
    topk_busiest,
    union_dedup_activity,
)
from kkbox_churn_prediction_spark.operators.sessionize import session_aggregates
from kkbox_churn_prediction_spark.sources.synth import to_spark

T0 = datetime(2024, 1, 1, 12, 0)


@pytest.fixture(scope="module")
def turns(spark):
    rows = []
    # convA: tools search×2, code×1; roles user/assistant alternating
    specs = [
        ("convA", ["search", "code", "search", None], ["user", "tool", "tool", "assistant"]),
        # convB: tie between browse and code (1 each) → smallest value wins
        ("convB", ["browse", "code", None], ["tool", "tool", "user"]),
        # convC: no tools at all
        ("convC", [None, None], ["user", "assistant"]),
    ]
    for conv, tools, roles in specs:
        for i, (tl, rl) in enumerate(zip(tools, roles)):
            rows.append(
                {
                    "conv_id": conv,
                    "turn_idx": i,
                    "role": rl,
                    "text": "x" * (i + 1),
                    "tool": tl,
                    "ts": T0 + timedelta(hours=i),
                }
            )
    return to_spark(spark, pd.DataFrame(rows))


def test_mode_deterministic_tiebreak(spark, turns):
    got = {r["conv_id"]: (r["mode_tool"], r["mode_tool_cnt"]) for r in mode_per_group(turns, "conv_id", "tool").collect()}
    assert got["convA"] == ("search", 2)
    assert got["convB"] == ("browse", 1)  # tie → lexicographically smallest
    assert "convC" not in got  # all-null groups drop (like SQL MODE over empty)


def test_last_value_before_cutoff(spark, turns):
    cutoffs = spark.createDataFrame(pd.DataFrame({"cutoff_ts": [T0 + timedelta(hours=2)]}))
    got = {r["conv_id"]: r["last_role"] for r in last_value_before_cutoff(turns, cutoffs, "role").collect()}
    # turns at hour 0,1 are < cutoff; hour-2 turn excluded (strict)
    assert got["convA"] == "tool" and got["convB"] == "tool" and got["convC"] == "assistant"


def test_pivot_and_daily_and_topk(spark, turns):
    piv = {r["conv_id"]: r.asDict() for r in pivot_role_counts(turns).collect()}
    assert piv["convA"]["n_tool"] == 2 and piv["convA"]["n_user"] == 1
    assert piv["convC"]["n_tool"] == 0

    daily = daily_engagement(turns).collect()
    assert len(daily) == 1 and daily[0]["n_turns"] == 9 and daily[0]["n_active_convs"] == 3

    top = topk_busiest(turns, k=2).collect()
    assert [r["conv_id"] for r in top] == ["convA", "convB"]


def test_unpivot_round_trips_pivot(spark, turns):
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.relational import unpivot_counts

    roles = ["user", "assistant", "system", "tool"]
    wide = pivot_role_counts(turns).select(
        "conv_id", *[F.col(f"n_{r}").alias(r) for r in roles]
    )
    long = unpivot_counts(wide, "conv_id", roles)
    # every (conv, role) cell present — zeros included (true melt)
    assert long.count() == wide.count() * len(roles)
    got = {(r["conv_id"], r["role"]): r["n"] for r in long.collect()}
    assert got[("convA", "tool")] == 2 and got[("convC", "tool")] == 0
    # round trip: re-pivoting the long form reproduces the wide counts
    back = {
        r["conv_id"]: r.asDict()
        for r in long.groupBy("conv_id").pivot("role", roles).sum("n").collect()
    }
    for r in wide.collect():
        assert all(back[r["conv_id"]][role] == r[role] for role in roles)
    # plan shape: the melt is an Expand node with no exchange of its own
    plan = long._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan
    assert plan.count("Exchange") == wide._jdf.queryExecution().executedPlan().toString().count("Exchange")


def test_semi_join_and_union_dedup(spark, turns):
    semi = {r["conv_id"] for r in semi_join_tool_users(turns).collect()}
    assert semi == {"convA", "convB"}

    ud = {r["conv_id"]: r["n_activity"] for r in union_dedup_activity(turns).collect()}
    # convA: user turn 0 + tool turns 1,2 (turn 1,2 not user; no overlap) = 3
    assert ud["convA"] == 3
    # convB: user turn 2 + tool turns 0,1 = 3; convC: 1 user turn
    assert ud["convB"] == 3 and ud["convC"] == 1


def test_session_percentiles(spark, turns):
    out = session_length_percentiles(session_aggregates(turns)).collect()[0]
    # every turn 1h apart (> 30min) → every turn its own session: 9 sessions of 1
    assert out["n_sessions"] == 9
    assert out["median_session_turns"] == 1.0


def test_streaming_session_aggs_matches_batch(spark, turns):
    """Memory-sink streaming run over the same rows: closed sessions
    must match the batch sessionizer (complete mode, watermark has
    passed all data)."""
    import tempfile

    from kkbox_churn_prediction_spark.streaming.sessions import streaming_session_aggs

    with tempfile.TemporaryDirectory() as d:
        turns.write.mode("overwrite").parquet(f"{d}/in")
        stream = spark.readStream.schema(turns.schema).parquet(f"{d}/in")
        q = (
            streaming_session_aggs(stream)
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("sess_out")
            .start()
        )
        q.processAllAvailable()
        got = spark.sql(
            "SELECT conv_id, count(*) AS n FROM sess_out GROUP BY conv_id"
        ).collect()
        q.stop()
    ns = {r["conv_id"]: r["n"] for r in got}
    batch = session_aggregates(turns).groupBy("conv_id").count().collect()
    want = {r["conv_id"]: r["count"] for r in batch}
    assert ns == want


def test_topk_per_group_ranks_and_limit_pushdown(spark, turns):
    from kkbox_churn_prediction_spark.operators.relational import topk_per_group

    daily = (
        turns.groupBy("conv_id", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = topk_per_group(daily, ["conv_id"], "n", k=1, tiebreak_cols=["day"])
    got = {r["conv_id"]: (r["n"], r["rank"]) for r in out.collect()}
    # one row per conversation, all rank 1, n = that conv's busiest day
    assert set(got) == {"convA", "convB", "convC"}
    assert all(rank == 1 for _, rank in got.values())
    # WindowGroupLimit: Spark pushes the k bound into the window sort
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
