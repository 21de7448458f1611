"""Property-based invariants (hypothesis) — beyond the reference's
test strategy (SURVEY §5: it has only example-based goldens).

Each property runs a small number of examples (a SparkSession
round-trip per example is expensive); every example is a whole
randomized table, so coverage per example is high. Deadlines are
disabled — Spark latency is not the property under test.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kkbox_churn_prediction_spark.sources.synth import to_spark

T0 = datetime(2024, 1, 1, 0, 0, 0)

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

gap_lists = st.lists(
    st.integers(min_value=0, max_value=7200), min_size=1, max_size=30
)


def _turns_pdf(gaps_by_conv: dict[str, list[int]]) -> pd.DataFrame:
    rows = []
    for conv, gaps in gaps_by_conv.items():
        t = T0
        for i, g in enumerate(gaps):
            t = t + timedelta(seconds=g)
            rows.append((conv, i, "user" if i % 2 else "assistant", "x" * (i % 7), None, t))
    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )


def _py_sessionize(gaps: list[int], gap_s: int = 1800) -> list[int]:
    """Single-process reference: session id per turn."""
    out, sid = [], 0
    for i, g in enumerate(gaps):
        if i > 0 and g > gap_s:
            sid += 1
        out.append(sid)
    return out


@given(gaps=st.lists(gap_lists, min_size=1, max_size=4))
@settings(**SETTINGS)
def test_sessionize_matches_python_reference(spark, gaps):
    from kkbox_churn_prediction_spark.operators.sessionize import sessionize

    by_conv = {f"c{i}": g for i, g in enumerate(gaps)}
    df = to_spark(spark, _turns_pdf(by_conv))
    got = {
        (r["conv_id"], r["turn_idx"]): r["session_id"]
        for r in sessionize(df).collect()
    }
    for conv, g in by_conv.items():
        want = _py_sessionize(g)
        for i, sid in enumerate(want):
            assert got[(conv, i)] == sid


@given(gaps=gap_lists, cutoff_offset=st.integers(min_value=0, max_value=100_000))
@settings(**SETTINGS)
def test_asof_join_never_leaks(spark, gaps, cutoff_offset):
    """No row surviving the as-of join may carry ts >= cutoff —
    for ANY turn layout and ANY cutoff position."""
    from kkbox_churn_prediction_spark.operators.asof import (
        asof_join_broadcast_cutoffs,
    )

    df = to_spark(spark, _turns_pdf({"c0": gaps}))
    cutoffs = spark.createDataFrame(
        [(T0 + timedelta(seconds=cutoff_offset),)], "cutoff_ts timestamp"
    )
    joined = asof_join_broadcast_cutoffs(df, cutoffs, lookback_days=None)
    from pyspark.sql import functions as F

    assert joined.where(F.col("ts") >= F.col("cutoff_ts")).count() == 0


@given(gaps=st.lists(gap_lists, min_size=1, max_size=3))
@settings(**SETTINGS)
def test_horizon_counts_monotone(spark, gaps):
    """A wider lookback can never see FEWER turns: cnt_1d <= cnt_3d
    <= cnt_7d at every (entity, cutoff)."""
    from kkbox_churn_prediction_spark.plans.backfill import backfill_features

    by_conv = {f"c{i}": g for i, g in enumerate(gaps)}
    df = to_spark(spark, _turns_pdf(by_conv))
    cutoffs = spark.createDataFrame(
        [(T0 + timedelta(days=1),), (T0 + timedelta(days=8),)],
        "cutoff_ts timestamp",
    )
    for r in backfill_features(df, cutoffs).collect():
        assert r["turn_cnt_1d"] <= r["turn_cnt_3d"] <= r["turn_cnt_7d"]
        assert r["user_turn_cnt_7d"] <= r["turn_cnt_7d"]
        assert r["distinct_tool_cnt_7d"] <= r["tool_call_cnt_7d"]


@given(gaps=gap_lists)
@settings(**SETTINGS)
def test_rolling_window_bounds(spark, gaps):
    """Trailing count is ≥1 (self), ≤ total turns, and equals the
    brute-force per-turn count."""
    from kkbox_churn_prediction_spark.operators.windows import rolling_interval_stats

    pdf = _turns_pdf({"c0": gaps})
    df = to_spark(spark, pdf)
    got = {
        r["turn_idx"]: r["n_turns_trailing"]
        for r in rolling_interval_stats(df, window_seconds=1800).collect()
    }
    ts = list(pdf["ts"])
    for i, t in enumerate(ts):
        want = sum(1 for u in ts if t - timedelta(seconds=1800) <= u <= t)
        assert got[i] == want


@given(gaps=gap_lists, chunk_seconds=st.sampled_from([600, 1800, 3600, 86400]))
@settings(**SETTINGS)
def test_chunked_sessionize_equals_single_pass(spark, gaps, chunk_seconds):
    """Chunk-and-stitch sessionization is invariant to the chunk
    width: for ANY gap sequence and chunk size, global session ids
    equal the single-window result (boundary merges, exact-gap
    boundaries, empty chunks all covered by the random gaps)."""
    from kkbox_churn_prediction_spark.operators.sessionize import (
        sessionize,
        sessionize_chunked,
    )

    df = to_spark(spark, _turns_pdf({"c0": gaps, "c1": gaps[::-1]}))
    single = {
        (r["conv_id"], r["turn_idx"]): r["session_id"]
        for r in sessionize(df).collect()
    }
    chunked = {
        (r["conv_id"], r["turn_idx"]): r["session_id"]
        for r in sessionize_chunked(df, chunk_seconds=chunk_seconds).collect()
    }
    assert chunked == single


rate_pairs = st.tuples(
    st.floats(min_value=0.0, max_value=1.0),
    st.floats(min_value=0.0, max_value=1.0),
).map(sorted)


@given(rates=rate_pairs)
@settings(**SETTINGS)
def test_property_sample_nesting(spark, rates):
    """For ANY r_lo <= r_hi with the same salt, the r_lo sample is a
    subset of the r_hi sample, and rates stay within binomial bounds."""
    from kkbox_churn_prediction_spark.operators.sampling import deterministic_sample

    lo, hi = rates
    from pyspark.sql import functions as F

    ids = spark.range(3000).select(F.col("id").alias("doc_id"))
    small = {r["doc_id"] for r in deterministic_sample(ids, "doc_id", lo).collect()}
    big = {r["doc_id"] for r in deterministic_sample(ids, "doc_id", hi).collect()}
    assert small <= big
    assert abs(len(big) / 3000 - hi) < 0.05


@given(toks=st.lists(st.integers(min_value=1, max_value=300), min_size=1, max_size=60),
       cap=st.integers(min_value=50, max_value=500))
@settings(**SETTINGS)
def test_property_packing_offsets(spark, toks, cap):
    """For ANY token lengths and capacity: offsets are the exact
    prefix sums within each shard and bins are their capacity
    buckets (no gaps, no overlaps)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.packing import pack_documents

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], "doc_id long, n_tokens long"
    )
    out = pack_documents(df, "n_tokens", capacity=cap, n_shards=3).toPandas()
    assert len(out) == len(toks)
    for _, g in out.groupby("shard"):
        g = g.sort_values("doc_id")
        expect = g["n_tokens"].cumsum().shift(fill_value=0)
        assert (g["offset"].to_numpy() == expect.to_numpy()).all()
        assert (g["pack_bin"] == g["offset"] // cap).all()


@given(seed=st.integers(min_value=0, max_value=10**6))
@settings(**SETTINGS)
def test_property_ece_matches_numpy(spark, seed):
    """ECE equals the reference numpy semantics for ANY prediction
    table, both bin closures."""
    import numpy as np

    from kkbox_churn_prediction_spark.operators.calibration import ece

    rng = np.random.default_rng(seed)
    n = int(rng.integers(50, 400))
    p = rng.uniform(0, 1, n)
    y = (rng.uniform(0, 1, n) < p).astype(int)
    df = spark.createDataFrame(
        [(float(p[i]), int(y[i])) for i in range(n)], "p double, y int"
    )
    edges = np.linspace(0, 1, 11)
    for closed in ("right", "left"):
        got = ece(df, "y", "p", n_bins=10, closed=closed).first()["ece"]
        ref, N = 0.0, n
        for b in range(10):
            if closed == "right":
                mask = (p > edges[b]) & (p <= edges[b + 1])
            else:
                mask = (np.digitize(p, edges) - 1) == b
            if mask.any():
                ref += (mask.sum() / N) * abs(y[mask].mean() - p[mask].mean())
        assert got == round(ref, 6) or abs(got - ref) < 2e-6


@given(seed=st.integers(min_value=0, max_value=10**6))
@settings(**SETTINGS)
def test_property_auc_matches_pairwise(spark, seed):
    """Tie-aware AUC equals the O(n^2) pairwise probability for ANY
    score distribution (coarse grid → heavy ties)."""
    import numpy as np

    from kkbox_churn_prediction_spark.operators.calibration import auc_ks_by_fold

    rng = np.random.default_rng(seed)
    n = int(rng.integers(40, 250))
    grid = int(rng.integers(3, 25))
    p = rng.integers(0, grid, n) / grid + 1e-3
    y = (rng.uniform(0, 1, n) < p).astype(int)
    if y.sum() in (0, n):  # need both classes
        y[0], y[-1] = 0, 1
    df = spark.createDataFrame(
        [(float(p[i]), int(y[i]), "f") for i in range(n)],
        "p double, y int, fold string",
    )
    r = auc_ks_by_fold(df, "fold", "y", "p").first()
    pos, neg = p[y == 1], p[y == 0]
    wins = (pos[:, None] > neg[None, :]).sum()
    ties = (pos[:, None] == neg[None, :]).sum()
    ref = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert abs(r["auc"] - ref) < 2e-6
