"""MERGE-INTO equivalence for the fallback sink (VERDICT r2 task #8).

The Iceberg runtime is absent in this image, so upsert_features runs
its copy-on-write parquet path. These tests prove that path is
upsert-EQUIVALENT: the final table equals a true keyed MERGE
(DuckDB ``INSERT … ON CONFLICT DO UPDATE`` — the reference's own
upsert idiom, sql/02_create_core_tables.sql:107-117) on conflicting
keys, and re-applying a batch is a no-op (idempotent resume).
"""

from __future__ import annotations

import os

import duckdb
import pytest


BATCH1 = [("a", 1, 10.0), ("b", 1, 20.0), ("c", 2, 30.0)]
# b conflicts (new value wins), d is a fresh insert
BATCH2 = [("b", 9, 99.0), ("d", 3, 40.0)]
SCHEMA = "conv_id string, version int, score double"


def _apply(spark, path, *batches):
    from kkbox_churn_prediction_spark.sources.io import upsert_features

    for rows in batches:
        upsert_features(spark.createDataFrame(rows, SCHEMA), path, ("conv_id",))
    return {
        r["conv_id"]: (r["version"], r["score"])
        for r in spark.read.parquet(path).collect()
    }


def _duckdb_merge(*batches):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (conv_id VARCHAR PRIMARY KEY, version INT, score DOUBLE)"
    )
    for rows in batches:
        con.executemany(
            "INSERT INTO t VALUES (?, ?, ?) "
            "ON CONFLICT (conv_id) DO UPDATE SET "
            "version = EXCLUDED.version, score = EXCLUDED.score",
            rows,
        )
    return {k: (v, s) for k, v, s in con.execute("SELECT * FROM t").fetchall()}


def test_upsert_matches_true_merge_on_conflicting_keys(spark, tmp_path):
    path = os.path.join(tmp_path, "features")
    got = _apply(spark, path, BATCH1, BATCH2)
    want = _duckdb_merge(BATCH1, BATCH2)
    assert got == want
    assert got["b"] == (9, 99.0) and got["a"] == (1, 10.0) and "d" in got


def test_upsert_reapply_is_idempotent(spark, tmp_path):
    path = os.path.join(tmp_path, "features")
    once = _apply(spark, path, BATCH1, BATCH2)
    twice = _apply(spark, path, BATCH2)  # same batch again
    assert twice == once
    # and no staging/backup litter survives the swap
    assert not os.path.exists(path + ".__staging__")
    assert not os.path.exists(path + ".__old__")


def test_upsert_multi_column_key(spark, tmp_path):
    """Composite keys: conflict only when EVERY key column matches."""
    path = os.path.join(tmp_path, "features")
    b1 = [("a", 1, 10.0), ("a", 2, 20.0)]
    b2 = [("a", 2, 99.0), ("b", 1, 5.0)]
    from kkbox_churn_prediction_spark.sources.io import upsert_features

    for rows in (b1, b2):
        upsert_features(
            spark.createDataFrame(rows, SCHEMA), path, ("conv_id", "version")
        )
    got = {
        (r["conv_id"], r["version"]): r["score"]
        for r in spark.read.parquet(path).collect()
    }
    assert got == {("a", 1): 10.0, ("a", 2): 99.0, ("b", 1): 5.0}
