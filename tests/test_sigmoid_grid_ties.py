"""Targeted .5-grid-tie audit for the quality classifier's one
transcendental (ADVICE r4): the cross-engine fit contract rests on
JVM ``F.exp``, glibc ``math.exp`` and DuckDB ``exp`` agreeing through
the HALF_UP 1e-9 re-quantization of ``p = sigmoid(zq/1e9)``. A 1-ulp
disagreement only matters when ``p*1e9`` (or ``p*(1-p)*1e9``) lands
ON the .5 rounding boundary — so this test HUNTS the integer zq grid
for the values whose ``frac(p*1e9)`` is closest to .5 (deterministic
Weyl-sequence scan, 2M candidates) and asserts all three paths emit
identical pq/hq grids exactly there, plus on a dense |zq| ladder
covering the clamp boundary."""

from __future__ import annotations

import math

import numpy as np
import pytest

Q = 1_000_000_000
ZCLAMP = 30.0


def _rhu(v: np.ndarray) -> np.ndarray:
    return np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5))


def _py_quant(zqs):
    """The _quality_fit_driver replay path, element-for-element."""
    out = []
    for zq in zqs:
        z = min(max(zq / float(Q), -ZCLAMP), ZCLAMP)
        p = 1.0 / (1.0 + math.exp(-z))
        pq = int(_rhu(np.array([p * Q]))[0])
        hq = int(_rhu(np.array([p * (1.0 - p) * Q]))[0])
        out.append((pq, hq))
    return out


def _hunt_ties(n=2_000_000, keep=48):
    """Deterministic scan for zq whose p*1e9 fractional part is
    nearest .5 — the exact inputs where a 1-ulp exp() wobble could
    flip the HALF_UP rounding."""
    k = np.arange(n, dtype=np.int64)
    zq = (k * 2654435761) % (2 * 30 * Q) - 30 * Q  # Weyl coverage of ±30e9
    z = np.clip(zq / float(Q), -ZCLAMP, ZCLAMP)
    p = 1.0 / (1.0 + np.exp(-z))
    frac = np.abs((p * Q) % 1.0 - 0.5)
    idx = np.argsort(frac)[:keep]
    return sorted(int(v) for v in zq[idx])


@pytest.fixture(scope="module")
def tie_zqs():
    ladder = [0, 1, -1, 5, -5]
    ladder += [s * int(v) for v in (Q // 2, Q, 2 * Q, 29 * Q, 30 * Q,
                                    30 * Q + 7, 31 * Q) for s in (1, -1)]
    return sorted(set(_hunt_ties() + ladder))


def test_spark_matches_python_on_ties(spark, tie_zqs):
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.quality_model import (
        _sigmoid_quant,
    )

    df = spark.createDataFrame([(z,) for z in tie_zqs], "zq long")
    _, pq, hq = _sigmoid_quant(F.col("zq"))
    got = [
        (r["pq"], r["hq"])
        for r in df.select(pq.alias("pq"), hq.alias("hq"))
        .orderBy("zq")
        .collect()
    ]
    assert got == _py_quant(tie_zqs)


def test_duckdb_matches_python_on_ties(tie_zqs):
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE t(zq BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(z,) for z in tie_zqs])
    sig = (
        "1.0 / (1.0 + exp(-least(greatest("
        "CAST(zq AS DOUBLE) / 1000000000.0, -30.0), 30.0)))"
    )
    rows = con.execute(
        f"SELECT CAST(ROUND({sig} * 1000000000.0) AS BIGINT),"
        f"       CAST(ROUND({sig} * (1.0 - {sig}) * 1000000000.0) AS BIGINT)"
        f" FROM t ORDER BY zq"
    ).fetchall()
    assert [tuple(r) for r in rows] == _py_quant(tie_zqs)


def test_numpy_and_math_exp_agree_after_quantization(tie_zqs):
    """numpy's vectorized exp and glibc's scalar math.exp DO differ
    by 1 ulp on some inputs (measured on this image) — numpy is only
    the hunt's search tool, never a production sigmoid path — but
    even at the hunted near-.5 grid points the 1e-9 HALF_UP
    quantization must absorb the wobble: quantized pq/hq grids from
    the two exps must be identical."""
    z = np.clip(np.array(tie_zqs, dtype=np.int64) / float(Q), -ZCLAMP, ZCLAMP)
    p_np = 1.0 / (1.0 + np.exp(-z))
    pq_np = _rhu(p_np * Q).astype(np.int64)
    hq_np = _rhu(p_np * (1.0 - p_np) * Q).astype(np.int64)
    want = _py_quant(tie_zqs)
    assert [tuple(v) for v in zip(pq_np, hq_np)] == want
