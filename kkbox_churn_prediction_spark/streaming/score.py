"""Stream-static quality scoring: the production corpus-ingest shape.

Train the quality classifier in BATCH over the curated corpus
(``operators.quality_model.quality_classifier_fit``), then score every
ARRIVING document on a live stream and route it keep/drop before it
ever lands in the corpus — fit batch, score stream. The fitted
(n_features+1)-row weight table is collapsed to ONE static row (a
feature→weight map) and stream-static-joined onto the document
stream: Structured Streaming re-plans the static side as a broadcast
per micro-batch, the join holds NO state (row-local enrichment, the
``enrich.py`` precedent), and the scoring itself is pure JVM array
expressions — stateless append mode, no watermark, no shuffle on the
stream side. At 10^12 docs/day the stream never exchanges: each
micro-batch is scan → broadcast-join(1 row) → project.

Exactness contract: the per-row bucket counts reproduce
``hashed_doc_features`` exactly — same ``stable_hash48 % D`` buckets,
same ``x_cap`` clip, same bias term — so a streamed document's
``(quality_prob, pred_pass)`` is byte-identical to the batch
``quality_classifier_score`` of the same document (pytest-asserted
and DuckDB-oracle-gated). ``pred_pass``/``route`` key off the EXACT
integer-grid score sign (``zq >= 0``), so the keep/drop decision is
deterministic cross-engine even where the 6dp probability rounds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kkbox_churn_prediction_spark.operators.quality_model import (
    _Q,
    _sigmoid_quant,
)


def stream_quality_scores(
    stream_docs: DataFrame,
    weights: DataFrame,
    label: Column,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_features: int = 16,
    x_cap: int = 10,
) -> DataFrame:
    """Score a (streaming or batch) document frame with a fitted
    weight table: ``(doc_id, y, quality_prob, pred_pass, route)``.

    ``weights`` is the long-format output of
    ``quality_classifier_fit`` (static, tiny). It is collapsed to one
    ``map<feature, wq>`` row — wq on the exact 1e-9 integer grid via
    the same ``round(weight·1e9)`` republication the batch scorer
    uses — and joined on a constant key (stream-static broadcast
    equi-join; a literal cross join is not accepted on a stream).

    Per row, entirely in JVM expressions:

    - ``js``: one hash bucket per token (``stable_hash48 % D``), NULL
      text coalesced to zero tokens (batch drops those rows at the
      explode; the bias term keeps the score defined either way);
    - ``zq = wq[D] + Σ_{j ∈ distinct(js)} min(count_j, x_cap)·wq[j]``
      — an exact integer sum on the grid, identical to the batch
      doc×bucket aggregation;
    - sigmoid + 6dp rounding via the shared ``_sigmoid_quant``.

    Works identically on a bounded batch frame (the oracle path).
    """
    D = int(n_features)
    from kkbox_churn_prediction_spark.functions.text import (
        normalize_text,
        stable_hash48,
        tokens,
    )

    wrow = (
        weights.select(
            F.col("feature").cast("bigint").alias("j"),
            F.round(F.col("weight") * F.lit(float(_Q)))
            .cast("long")
            .alias("wq"),
        )
        .groupBy(F.lit(1).alias("_k"))
        .agg(
            F.map_from_arrays(
                F.collect_list("j"), F.collect_list("wq")
            ).alias("_wmap")
        )
    )

    js = F.transform(
        F.coalesce(tokens(normalize_text(F.col(text_col))), F.array()),
        lambda t: F.pmod(stable_hash48(t), F.lit(D)),
    )
    scored = (
        stream_docs.select(
            F.col(id_col).alias("doc_id"),
            F.coalesce(label.cast("int"), F.lit(0)).alias("y"),
            js.alias("_js"),
            F.lit(1).alias("_k"),
        )
        .join(F.broadcast(wrow), "_k")
        .select(
            "doc_id",
            "y",
            (
                F.coalesce(
                    F.try_element_at(F.col("_wmap"), F.lit(D).cast("bigint")),
                    F.lit(0).cast("long"),
                )
                + F.aggregate(
                    F.array_distinct(F.col("_js")),
                    F.lit(0).cast("long"),
                    lambda acc, jj: acc
                    + F.least(
                        F.size(F.filter(F.col("_js"), lambda v: v == jj)),
                        F.lit(int(x_cap)),
                    ).cast("long")
                    * F.coalesce(
                        F.try_element_at(F.col("_wmap"), jj),
                        F.lit(0).cast("long"),
                    ),
                )
            ).alias("zq"),
        )
    )
    p, _, _ = _sigmoid_quant(F.col("zq"))
    return scored.select(
        "doc_id",
        "y",
        F.round(p, 6).alias("quality_prob"),
        (F.col("zq") >= 0).cast("int").alias("pred_pass"),
        F.when(F.col("zq") >= 0, F.lit("keep"))
        .otherwise(F.lit("drop"))
        .alias("route"),
    )
