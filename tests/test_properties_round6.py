"""Property invariants for the continuation operators, on seeded
random data (deterministic — no flaky generation).

Each property is something the oracle compare can't check (it only
proves Spark == DuckDB on one dataset): structural truths that must
hold on ANY input.
"""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from kkbox_churn_prediction_spark.operators.association import spearman_corr
from kkbox_churn_prediction_spark.operators.components import (
    effective_sample_size,
)
from kkbox_churn_prediction_spark.operators.privacy import t_closeness_audit
from kkbox_churn_prediction_spark.operators.psi import ks_from_bins


def _random_bins(spark, seed, folds=("ref", "cur"), n=300, bins=8):
    rng = random.Random(seed)
    rows = [
        (rng.choice(folds), rng.randint(0, bins - 1)) for _ in range(n)
    ]
    return spark.createDataFrame(rows, "fold string, bin int")


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_ks_bounds_and_self_zero(spark, seed):
    df = _random_bins(spark, seed)
    r = ks_from_bins(df, "fold", "bin", "ref").collect()[0]
    assert 0.0 <= r["ks"] <= 1.0
    # a fold compared against an identical copy of itself scores 0
    ref_only = df.where(F.col("fold") == "ref")
    twin = ref_only.select(F.lit("twin").alias("fold"), "bin").unionAll(ref_only)
    z = ks_from_bins(twin, "fold", "bin", "ref").collect()[0]
    assert z["ks"] == 0.0


@pytest.mark.parametrize("seed", [1, 2])
def test_ks_partition_invariance(spark, seed):
    df = _random_bins(spark, seed)
    a = ks_from_bins(df.repartition(1), "fold", "bin", "ref").collect()[0]["ks"]
    b = ks_from_bins(df.repartition(7), "fold", "bin", "ref").collect()[0]["ks"]
    assert a == b


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_spearman_monotone_invariance_and_bounds(spark, seed):
    rng = random.Random(seed)
    rows = [(rng.randint(1, 50), rng.randint(1, 50)) for _ in range(200)]
    df = spark.createDataFrame(rows, "x long, y long")
    r = spearman_corr(df, "x", "y").collect()[0]["spearman"]
    assert -1.0 <= r <= 1.0
    # Spearman is rank-based: a strictly monotone transform of x
    # (x -> x^3 on positives) cannot change it
    cubed = df.select((F.col("x") * F.col("x") * F.col("x")).alias("x"), "y")
    r2 = spearman_corr(cubed, "x", "y").collect()[0]["spearman"]
    assert r == r2


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_tvd_bounds_and_single_cell_zero(spark, seed):
    import pandas as pd

    from datetime import datetime

    rng = random.Random(seed)
    t0 = datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (
            f"c{i}",
            0,
            rng.choice(["user", "assistant", "tool"]),
            "x",
            rng.choice(["search", "code", None]),
            t0,
        )
        for i in range(150)
    ]
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    df = spark.createDataFrame(pdf)
    out = t_closeness_audit(df, ("role",), "tool", t=0.2).collect()
    assert all(0.0 <= r["tvd"] <= 1.0 for r in out)
    # a single QI cell holding the WHOLE dataset has TVD exactly 0
    one = df.withColumn("role", F.lit("all"))
    z = t_closeness_audit(one, ("role",), "tool", t=0.2).collect()[0]
    assert z["tvd"] == 0.0 and not z["at_risk"]


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_ess_bounds(spark, seed):
    rng = random.Random(seed)
    rows = []
    doc = 0
    comp = 0
    while doc < 120:
        k = rng.randint(1, 6)
        for _ in range(k):
            rows.append((doc, comp, k))
            doc += 1
        comp += 1
    df = spark.createDataFrame(
        rows, "doc_id long, component long, cluster_size long"
    )
    r = effective_sample_size(df).collect()[0]
    # Cauchy-Schwarz bounds: C <= ESS <= N always (weights in (0,1]);
    # ESS = C exactly iff every cluster has the SAME size, ESS = N iff
    # all singletons
    assert r["n_clusters"] <= r["ess"] + 1e-9
    assert r["ess"] <= r["n_docs"] + 1e-9
    assert 0.0 < r["ess_ratio"] <= 1.0
