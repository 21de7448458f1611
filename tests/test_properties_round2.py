"""Property-based invariants for the round-2-continuation operators:
chunking coverage, SCD2 reconstruction, interval-join strategy
equality, resample mass conservation. Same discipline as
test_properties.py: few examples, each a whole randomized table."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

T0 = datetime(2024, 1, 1)

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**SETTINGS)
@given(
    toks=st.lists(st.integers(min_value=0, max_value=3000), min_size=1, max_size=20),
    chunk=st.integers(min_value=2, max_value=512),
    stride=st.integers(min_value=1, max_value=512),
)
def test_property_chunk_coverage(spark, toks, chunk, stride):
    """Every token position is covered by ≥1 chunk; starts step by
    stride; the final chunk never overruns n_tokens."""
    from kkbox_churn_prediction_spark.operators.chunking import chunk_documents

    df = spark.createDataFrame(list(enumerate(toks)), ["doc_id", "n_tokens"])
    out = chunk_documents(df, "n_tokens", chunk, stride).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, n in enumerate(toks):
        rows = sorted(by_doc[doc_id], key=lambda r: r["chunk_idx"])
        assert rows[0]["chunk_start"] == 0
        assert all(r["chunk_end"] <= max(n, chunk) for r in rows)
        # contiguous coverage when stride <= chunk; tail always reached
        covered = max(r["chunk_end"] for r in rows)
        assert covered == max(n, min(chunk, n)) or covered >= n
        if stride <= chunk and n > 0:
            # no gap between consecutive chunks
            for a, b in zip(rows, rows[1:]):
                assert b["chunk_start"] <= a["chunk_end"]


@settings(**SETTINGS)
@given(
    vals=st.lists(
        st.sampled_from(["x", "y", None]), min_size=1, max_size=40
    )
)
def test_property_scd2_reconstructs_stream(spark, vals):
    """Expanding the intervals back to per-row values reproduces the
    input exactly (lossless compression), including NULL runs."""
    from kkbox_churn_prediction_spark.operators.scd import scd2_intervals

    rows = [("k", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "key string, ord int, attr string")
    iv = scd2_intervals(df, "key", "ord", "attr").collect()
    # reconstruct
    rec = {}
    for r in sorted(iv, key=lambda r: r["run_idx"]):
        hi = r["to_ord"] if r["to_ord"] is not None else len(vals)
        for i in range(r["from_ord"], hi):
            rec[i] = r["attr"]
        assert r["n_rows"] == hi - r["from_ord"]
    assert [rec[i] for i in range(len(vals))] == vals


@settings(**SETTINGS)
@given(
    pts=st.lists(st.integers(min_value=0, max_value=2000), min_size=1, max_size=30),
    bounds=st.lists(st.integers(min_value=0, max_value=2000), min_size=2, max_size=8),
    bucket=st.sampled_from([60, 300, 900]),
)
def test_property_interval_join_strategies_agree(spark, pts, bounds, bucket):
    """bucket strategy ≡ range strategy for arbitrary disjoint
    intervals and points (including boundary hits)."""
    from kkbox_churn_prediction_spark.operators.intervals import interval_join

    edges = sorted(set(bounds))
    if len(edges) < 2:
        edges = [0, 1]
    ivs = [
        ("k", j, T0 + timedelta(seconds=a), T0 + timedelta(seconds=b))
        for j, (a, b) in enumerate(zip(edges, edges[1:]))
    ]
    points = spark.createDataFrame(
        [("k", i, T0 + timedelta(seconds=s)) for i, s in enumerate(pts)],
        ["key", "pid", "ts"],
    )
    intervals = spark.createDataFrame(ivs, ["key", "iv", "lo", "hi"])
    kw = dict(key="key", ts_col="ts", start_col="lo", end_col="hi")
    a = sorted(map(tuple, interval_join(points, intervals, **kw).collect()))
    b = sorted(
        map(
            tuple,
            interval_join(
                points, intervals, strategy="bucket", bucket_seconds=bucket, **kw
            ).collect(),
        )
    )
    assert a == b


@settings(**SETTINGS)
@given(
    days=st.lists(st.integers(min_value=1, max_value=25), min_size=1, max_size=25)
)
def test_property_resample_conserves_mass_and_density(spark, days):
    """Σ n_rows over the dense grid == input rows; grid is contiguous
    daily from min to max day."""
    from kkbox_churn_prediction_spark.operators.resample import resample_ffill

    rows = [("k", i, "v", datetime(2024, 1, d, 12)) for i, d in enumerate(days)]
    df = spark.createDataFrame(rows, ["key", "ord", "val", "ts"])
    out = resample_ffill(df, "key", "ts", "val", "ord").collect()
    assert sum(r["n_rows"] for r in out) == len(days)
    got_days = sorted(r["bucket_ts"].day for r in out)
    assert got_days == list(range(min(days), max(days) + 1))
