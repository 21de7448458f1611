"""allclose gate: Spark backfill vs the independent pandas oracle at
every entity×cutoff (north rule: 'matching the reference's feature
vectors (allclose; zero temporal leakage) at each entity×timestamp')."""

from __future__ import annotations

from datetime import datetime

import pandas as pd
import pytest

from kkbox_churn_prediction_spark.oracle import assert_allclose_features, backfill_oracle
from kkbox_churn_prediction_spark.plans.backfill import backfill_features
from kkbox_churn_prediction_spark.sources.synth import (
    clean_turns,
    generate_transcripts,
    to_spark,
)

CUTOFFS = [pd.Timestamp(datetime(2024, 1, d)) for d in (8, 15, 22)]


def test_backfill_allclose_vs_pandas_oracle(spark):
    pdf = generate_transcripts(n_convs=40, mean_turns=25, seed=9, mega_conv=True)
    turns = clean_turns(to_spark(spark, pdf))
    cutoffs = spark.createDataFrame(pd.DataFrame({"cutoff_ts": CUTOFFS}))

    engine = backfill_features(turns, cutoffs).toPandas()
    oracle = backfill_oracle(pdf, CUTOFFS)
    assert_allclose_features(engine, oracle)


def test_allclose_gate_actually_fires(spark):
    pdf = generate_transcripts(n_convs=5, mean_turns=10, seed=2, mega_conv=False)
    turns = clean_turns(to_spark(spark, pdf))
    cutoffs = spark.createDataFrame(pd.DataFrame({"cutoff_ts": CUTOFFS[:1]}))
    engine = backfill_features(turns, cutoffs).toPandas()
    oracle = backfill_oracle(pdf, CUTOFFS[:1])
    corrupted = engine.copy()
    corrupted.loc[0, "turn_cnt_7d"] += 1
    with pytest.raises(AssertionError, match="turn_cnt_7d not allclose"):
        assert_allclose_features(corrupted, oracle)
