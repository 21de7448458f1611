"""Quality classifier (VERDICT r3 task #5) vs an INDEPENDENT scalar
reference — the three-legged-verification discipline: the DuckDB
oracle shares the engine's expression shapes, so a from-scratch
pure-Python trainer (dict arithmetic, math.exp, half-up rounding) is
what catches a shared-engine bug (the ``bpe_apply_stats`` lesson)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

D = 16
Q = 1_000_000_000

TEXTS = [
    "alpha beta gamma delta epsilon zeta",
    "one two",
    "the quick brown fox jumps over the lazy dog again and again",
    "spark sql window join agg scan filter",
    "a b c d e f g h i j k l m n o p",
    "short",
    "repeat repeat repeat repeat repeat repeat repeat repeat",
    "mixed Case Words Should Lower fine here",
    "tiny doc",
    "data pipeline quality filter classifier training corpus tokens",
    "x y",
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do",
    "  spaced    out   words   here   ok  ",
    "one one two two three three four four five five six six",
    "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk",
    "final document with a reasonable number of plain words inside",
]


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def _label_col():
    from kkbox_churn_prediction_spark.functions.text import (
        normalize_text,
        tokens,
    )

    return F.size(tokens(normalize_text(F.col("text")))) >= 5


# ------------------------------------------------- scalar reference
def _rhu(x: float) -> float:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def _scalar_feats():
    out = []
    for i, t in enumerate(TEXTS):
        toks = " ".join(t.lower().strip().split()).split(" ")
        toks = [w for w in toks if w != ""]
        y = 1 if len(toks) >= 5 else 0
        cnt: dict[int, int] = {}
        for w in toks:
            j = int(hashlib.md5(w.encode()).hexdigest()[:12], 16) % D
            cnt[j] = cnt.get(j, 0) + 1
        feats = {j: min(c, 10) for j, c in cnt.items()}
        feats[D] = 1  # bias
        out.append((i, y, feats))
    return out


def _scalar_fit(n_iter=24, damp=0.1, ridge=1.0, h_floor=0.01):
    rows = _scalar_feats()
    wq = [0] * (D + 1)
    for _ in range(n_iter):
        G = [0] * (D + 1)
        H = [0] * (D + 1)
        for _i, y, feats in rows:
            zq = sum(x * wq[j] for j, x in feats.items())
            z = min(max(zq / Q, -30.0), 30.0)
            p = 1.0 / (1.0 + math.exp(-z))
            pq = int(_rhu(p * Q))
            hq = max(int(_rhu(p * (1.0 - p) * Q)), int(_rhu(h_floor * Q)))
            rq = y * Q - pq
            for j, x in feats.items():
                G[j] += x * rq
                H[j] += x * x * hq
        for j in range(D + 1):
            wq[j] += int(
                _rhu(damp * (float(G[j]) / (float(H[j]) + ridge * Q)) * Q)
            )
    weights = [_rhu(wq[j] / Q * 1e6) / 1e6 for j in range(D + 1)]
    support = [0] * (D + 1)
    n_pos = 0
    for _i, y, feats in rows:
        n_pos += y
        for j in feats:
            if j < D:
                support[j] += 1
    support[D] = len(rows)
    return weights, support, len(rows), n_pos


@pytest.fixture(scope="module")
def fitted(spark):
    from kkbox_churn_prediction_spark.operators.quality_model import (
        hashed_doc_features,
        quality_classifier_fit,
    )

    feats = hashed_doc_features(_docs(spark), _label_col())
    return feats, quality_classifier_fit(feats).collect()


def test_fit_matches_independent_scalar_trainer(fitted):
    _, rows = fitted
    weights, support, n_docs, n_pos = _scalar_fit()
    assert len(rows) == D + 1
    for r in rows:
        j = r["feature"]
        assert r["weight"] == pytest.approx(weights[j], abs=1e-9), j
        assert r["n_docs_with"] == support[j], j
        assert r["n_docs"] == n_docs and r["n_pos"] == n_pos


def test_empty_bucket_has_zero_weight_and_zero_support(spark):
    """A bucket no token ever hashes to must report n_docs_with = 0
    and keep its initial weight exactly 0 (ridge-only denominator,
    zero gradient)."""
    from kkbox_churn_prediction_spark.operators.quality_model import (
        hashed_doc_features,
        quality_classifier_fit,
    )

    docs = spark.createDataFrame(
        [(0, "alpha beta alpha"), (1, "alpha")], "doc_id long, text string"
    )
    rows = quality_classifier_fit(
        hashed_doc_features(docs, _label_col()), n_iter=4
    ).collect()
    empty = [r for r in rows if r["feature"] < D and r["n_docs_with"] == 0]
    # a two-word vocabulary covers at most two of the 16 buckets
    assert len(empty) >= D - 2
    assert all(r["weight"] == 0.0 for r in empty)


def test_score_is_sigmoid_of_published_weights(spark, fitted):
    from kkbox_churn_prediction_spark.operators.quality_model import (
        quality_classifier_fit,
        quality_classifier_score,
    )

    feats, rows = fitted
    fit_df = quality_classifier_fit(feats)
    scored = {r["doc_id"]: r for r in
              quality_classifier_score(feats, fit_df).collect()}
    w = {r["feature"]: int(_rhu(r["weight"] * Q)) for r in rows}
    for i, y, f in _scalar_feats():
        zq = sum(x * w[j] for j, x in f.items())
        p = 1.0 / (1.0 + math.exp(-min(max(zq / Q, -30.0), 30.0)))
        r = scored[i]
        assert r["y"] == y
        assert r["pred_pass"] == (1 if zq >= 0 else 0)
        assert r["quality_prob"] == pytest.approx(_rhu(p * 1e6) / 1e6, abs=1e-9)


def test_fit_is_deterministic_across_runs(spark):
    from kkbox_churn_prediction_spark.operators.quality_model import (
        hashed_doc_features,
        quality_classifier_fit,
    )

    feats = hashed_doc_features(_docs(spark), _label_col())
    a = quality_classifier_fit(feats, n_iter=6).collect()
    b = quality_classifier_fit(feats, n_iter=6).collect()
    assert list(map(tuple, a)) == list(map(tuple, b))


def test_fit_separates_the_rule_distillation_labels(spark):
    """On the real documents table the distilled classifier must beat
    the majority-class baseline — the point of training a smooth
    scorer from the Gopher rules."""
    import os

    sf = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf}/documents.parquet"):  # pragma: no cover
        pytest.skip("testdata missing")
    from kkbox_churn_prediction_spark.operators.quality_model import (
        hashed_doc_features,
        quality_classifier_fit,
        quality_classifier_score,
    )
    from kkbox_churn_prediction_spark.operators.textstats import (
        gopher_rule_flags,
    )

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    feats = hashed_doc_features(docs, gopher_rule_flags("text")["all"])
    scored = quality_classifier_score(feats, quality_classifier_fit(feats))
    agg = scored.agg(
        F.avg((F.col("y") == F.col("pred_pass")).cast("double")).alias("acc"),
        F.avg(F.col("y").cast("double")).alias("base"),
    ).collect()[0]
    assert agg["acc"] > max(agg["base"], 1.0 - agg["base"]) + 0.05


def test_fit_driver_replay_equals_distributed(spark):
    """The threshold-gated replay (one Arrow collect + int64
    scatter-sums) must reproduce the distributed checkpointed loop
    bit-for-bit, and the session replay budget conf must force the
    distributed path when set to 0."""
    from kkbox_churn_prediction_spark.operators.quality_model import (
        hashed_doc_features,
        quality_classifier_fit,
    )
    from kkbox_churn_prediction_spark.operators.replay import (
        DRIVER_REPLAY_CONF,
    )
    from kkbox_churn_prediction_spark.operators.textstats import (
        gopher_rule_flags,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    feats = hashed_doc_features(docs, gopher_rule_flags("text")["all"])
    d = quality_classifier_fit(feats, n_iter=8, mode="driver").collect()
    s = quality_classifier_fit(feats, n_iter=8, mode="distributed").collect()
    assert list(map(tuple, sorted(d))) == list(map(tuple, sorted(s)))
    spark.conf.set(DRIVER_REPLAY_CONF, "0")
    try:
        a = quality_classifier_fit(feats, n_iter=8)  # auto -> distributed
        plan = a._jdf.queryExecution().executedPlan().toString()
        # the distributed report joins the checkpointed weight table
        # to broadcast support/totals (support+totals are eagerly
        # checkpointed since the r5 unpersist fix, so HashAggregate
        # no longer appears in THIS plan); the driver replay is one
        # local relation with no joins at all
        assert "BroadcastExchange" in plan
        dplan = quality_classifier_fit(
            feats, n_iter=8, mode="driver"
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" not in dplan
        assert list(map(tuple, sorted(a.collect()))) == list(
            map(tuple, sorted(s))
        )
    finally:
        spark.conf.unset(DRIVER_REPLAY_CONF)
