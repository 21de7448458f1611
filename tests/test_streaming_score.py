"""Stream-static quality scoring (12th streaming gate): the batch
apply path and the stream-static scorer must agree per-document
exactly (the integer-grid contract), on clean text AND on the fuzz
seams (NULL / blank / vertical-tab / duplicate-token documents)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

TEXTS = [
    (0, "alpha beta gamma delta epsilon zeta"),
    (1, "one two"),
    (2, "the quick brown fox jumps over the lazy dog again and again"),
    (3, None),
    (4, ""),
    (5, "   \t \n  "),
    (6, "alpha\x0bbeta gamma"),
    (7, "repeat " * 40),  # x_cap clip engages (count 40 > 10)
    (8, "spark sql window join agg scan filter"),
    (9, "tiny"),
    (10, "lorem ipsum dolor sit amet consectetur adipiscing elit sed"),
    (11, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
]


def _docs(spark):
    return spark.createDataFrame(TEXTS, "doc_id long, text string")


def _label():
    from kkbox_churn_prediction_spark.functions.text import (
        normalize_text,
        tokens,
    )

    return F.size(tokens(normalize_text(F.col("text")))) >= 5


@pytest.fixture(scope="module")
def fitted(spark):
    from kkbox_churn_prediction_spark.operators.quality_model import (
        hashed_doc_features,
        quality_classifier_fit,
    )

    feats = hashed_doc_features(_docs(spark), _label())
    return quality_classifier_fit(feats).localCheckpoint(eager=True)


def test_batch_equality_with_apply(spark, fitted):
    """stream_quality_scores on a bounded batch frame == the batch
    quality_classifier_score of the same docs, row for row (the
    route column aside)."""
    from kkbox_churn_prediction_spark.operators.quality_model import (
        hashed_doc_features,
        quality_classifier_score,
    )
    from kkbox_churn_prediction_spark.streaming.score import (
        stream_quality_scores,
    )

    want = {
        r["doc_id"]: (r["y"], r["quality_prob"], r["pred_pass"])
        for r in quality_classifier_score(
            hashed_doc_features(_docs(spark), _label()), fitted
        ).collect()
    }
    got = stream_quality_scores(_docs(spark), fitted, _label()).collect()
    assert len(got) == len(TEXTS) == len(want)
    for r in got:
        y, p, pp = want[r["doc_id"]]
        assert (r["y"], r["quality_prob"], r["pred_pass"]) == (y, p, pp)
        assert r["route"] == ("keep" if pp == 1 else "drop")


def test_real_stream_matches_batch(spark, fitted, tmp_path):
    """File-source stream -> memory sink: the streamed scores equal
    the batch run of the same composition (stateless append mode —
    every row emits exactly once, no watermark needed)."""
    from kkbox_churn_prediction_spark.streaming.score import (
        stream_quality_scores,
    )

    src = str(tmp_path / "docs")
    _docs(spark).repartition(3).write.parquet(src)
    batch = spark.read.parquet(src)
    stream = spark.readStream.schema(batch.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        stream_quality_scores(stream, fitted, _label())
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_stream_quality")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["doc_id"]: (r["y"], r["quality_prob"], r["pred_pass"], r["route"])
        for r in spark.table("t_stream_quality").collect()
    }
    want = {
        r["doc_id"]: (r["y"], r["quality_prob"], r["pred_pass"], r["route"])
        for r in stream_quality_scores(batch, fitted, _label()).collect()
    }
    assert got == want
    assert len(got) == len(TEXTS)


def test_route_is_exact_sign(spark, fitted):
    """route/pred_pass key off the exact integer zq sign: every keep
    has quality_prob >= 0.5 and every drop < 0.5 (ties at zq == 0 go
    to keep by construction)."""
    from kkbox_churn_prediction_spark.streaming.score import (
        stream_quality_scores,
    )

    for r in stream_quality_scores(_docs(spark), fitted, _label()).collect():
        if r["route"] == "keep":
            assert r["pred_pass"] == 1 and r["quality_prob"] >= 0.5
        else:
            assert r["pred_pass"] == 0 and r["quality_prob"] < 0.5
