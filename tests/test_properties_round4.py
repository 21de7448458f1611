"""Property-based invariants for the late-round-2 additions: resize
geometry vs an independent integer reference, set-op partition law vs
Python sets, sweep-line peak concurrency vs a brute-force counter,
BM25 vs a plain-Python scorer. Same discipline as test_properties.py:
few examples, each a whole randomized table."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

import pandas as pd
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
    dims=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4000),
            st.integers(min_value=1, max_value=4000),
        ),
        min_size=1,
        max_size=12,
    ),
    target=st.tuples(
        st.integers(min_value=8, max_value=512),
        st.integers(min_value=8, max_value=512),
    ),
)
def test_property_resize_geometry(spark, dims, target):
    """Letterbox output always fits the box, one side binds, pads
    center, and aspect is preserved to integer truncation."""
    from kkbox_churn_prediction_spark.operators.multimodal import resize_plan

    tw, th = target
    fake = {i: (w, h, 1) for i, (w, h) in enumerate(dims)}
    # payload's first byte carries the index so decode_fn can look up
    # this example's randomized dims
    media = spark.createDataFrame(
        [(i, "image", bytes([i]), None, i) for i in range(len(dims))],
        "media_id long, kind string, payload binary, mime string, source_doc_id long",
    )

    def decode(p):
        return fake[p[0]]

    geo = {r["media_id"]: r for r in
           resize_plan(media, target_w=tw, target_h=th, decode_fn=decode).collect()}
    for i, (w, h) in enumerate(dims):
        r = geo[i]
        assert r["src_w"] == w and r["src_h"] == h
        assert 1 <= r["out_w"] <= tw and 1 <= r["out_h"] <= th
        assert r["out_w"] == tw or r["out_h"] == th
        assert r["pad_x"] == (tw - r["out_w"]) // 2
        assert r["pad_y"] == (th - r["out_h"]) // 2
        # integer aspect preservation
        if w * th >= h * tw:
            assert r["out_w"] == tw and r["out_h"] == max(1, (h * tw) // w)
        else:
            assert r["out_h"] == th and r["out_w"] == max(1, (w * th) // h)


@settings(**SETTINGS)
@given(
    left=st.lists(st.integers(min_value=0, max_value=30), max_size=40),
    right=st.lists(st.integers(min_value=0, max_value=30), max_size=40),
)
def test_property_set_ops_partition_law(spark, left, right):
    """set_op_entities is exactly the 3-way partition of the key
    union: left_only ∪ both ∪ right_only, disjoint, matching Python
    set algebra."""
    from kkbox_churn_prediction_spark.operators.relational import set_op_entities

    ldf = spark.createDataFrame([(x,) for x in left] or [(None,)], "k int").where(
        F.col("k").isNotNull()
    )
    rdf = spark.createDataFrame([(x,) for x in right] or [(None,)], "k int").where(
        F.col("k").isNotNull()
    )
    got: dict[str, set] = {"left_only": set(), "both": set(), "right_only": set()}
    for r in set_op_entities(ldf, rdf, "k").collect():
        got[r["set_op"]].add(r["k"])
    ls, rs = set(left), set(right)
    assert got["left_only"] == ls - rs
    assert got["both"] == ls & rs
    assert got["right_only"] == rs - ls


@settings(**SETTINGS)
@given(
    spans=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=200_000),  # start (s offset)
            st.integers(min_value=0, max_value=90_000),   # duration (s)
        ),
        min_size=1,
        max_size=25,
    )
)
def test_property_peak_concurrency_matches_bruteforce(spark, spans):
    """Two-phase prefix-sum peak equals a brute-force sweep over all
    boundary points (closed intervals, +1 before -1 at ties)."""
    from kkbox_churn_prediction_spark.operators.windows import DAY_US, peak_concurrency

    rows = [
        (f"c{i}", 0, T0 + timedelta(seconds=s), T0 + timedelta(seconds=s + d))
        for i, (s, d) in enumerate(spans)
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, session_id int, session_start timestamp, session_end timestamp",
    )
    got = {r["day_us"]: r["peak_concurrency"]
           for r in peak_concurrency(df.repartition(5)).collect()}

    # brute force: global ordered boundary walk
    pts = []
    for i, (s, d) in enumerate(spans):
        su = int((T0 + timedelta(seconds=s)).timestamp() * 1e6)
        eu = int((T0 + timedelta(seconds=s + d)).timestamp() * 1e6)
        pts.append((su, 1, i))
        pts.append((eu, -1, i))
    pts.sort(key=lambda p: (p[0], -p[1], p[2]))
    cum, exp = 0, {}
    for ts, delta, _ in pts:
        cum += delta
        day = (ts // DAY_US) * DAY_US
        exp[day] = max(exp.get(day, -(10 ** 9)), cum)
    assert got == exp


@settings(**SETTINGS)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["cat", "dog", "fish", "bird", "zebra"]),
            min_size=1,
            max_size=12,
        ),
        min_size=2,
        max_size=15,
    )
)
def test_property_bm25_matches_python(spark, docs):
    """Distributed BM25 equals the plain-Python scorer on arbitrary
    small corpora (same smoothing, same tie discipline)."""
    from kkbox_churn_prediction_spark.operators.textstats import bm25_scores

    terms, k1, b = ("cat", "dog"), 1.2, 0.75
    sdf = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["bm25"]
           for r in bm25_scores(sdf, terms, k=100, k1=k1, b=b).collect()}

    n = len(docs)
    avgdl = sum(len(t) for t in docs) / n
    exp = {}
    for i, toks in enumerate(docs):
        s, hit = 0.0, False
        for t in terms:
            tf = toks.count(t)
            if tf == 0:
                continue
            hit = True
            dfq = sum(1 for d in docs if t in d)
            idf = math.log((n - dfq + 0.5) / (dfq + 0.5) + 1.0)
            s += idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * len(toks) / avgdl)
            )
        if hit:
            exp[i] = round(s, 6)
    assert set(got) == set(exp)
    for i, v in exp.items():
        assert abs(got[i] - v) <= 1e-6
