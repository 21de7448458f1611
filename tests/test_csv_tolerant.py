"""Error-tolerant CSV ingest (VERDICT #6; reference
``read_csv_auto(IGNORE_ERRORS=TRUE)``, ``src/labels.py:58-68``)."""

from __future__ import annotations

import pytest

CSV = """conv_id,turn_idx,ts
c1,0,2024-01-01T10:00:00
c1,not_an_int,2024-01-01T11:00:00
c2,0,2024-01-02T09:00:00
c2,1,definitely-not-a-timestamp
c3,0,2024-01-03T08:00:00
"""

SCHEMA = "conv_id string, turn_idx int, ts timestamp"


@pytest.fixture()
def csv_path(tmp_path):
    p = tmp_path / "turns.csv"
    p.write_text(CSV)
    return str(p)


def test_permissive_splits_clean_from_corrupt(spark, csv_path):
    from kkbox_churn_prediction_spark.sources.csv import read_csv_tolerant

    clean, corrupt = read_csv_tolerant(spark, csv_path, SCHEMA)
    assert clean.columns == ["conv_id", "turn_idx", "ts"]
    rows = {(r["conv_id"], r["turn_idx"]) for r in clean.collect()}
    assert rows == {("c1", 0), ("c2", 0), ("c3", 0)}
    bad = [r["_corrupt_record"] for r in corrupt.collect()]
    assert len(bad) == 2  # the dropped-row count, surfaced
    assert any("not_an_int" in b for b in bad)
    assert any("definitely-not-a-timestamp" in b for b in bad)


def test_dropmalformed_matches_reference_silent_drop(spark, csv_path):
    from kkbox_churn_prediction_spark.sources.csv import read_csv_tolerant

    clean, corrupt = read_csv_tolerant(spark, csv_path, SCHEMA, mode="DROPMALFORMED")
    # collect() (not count()) — CSV column pruning means a zero-column
    # count never parses, so malformed rows only drop from queries
    # that touch a column (documented caveat in sources/csv.py)
    assert len(clean.collect()) == 3
    assert corrupt.count() == 0


def test_clean_feeds_defensive_projection(spark, csv_path):
    """The CSV path composes with the same downstream null-drop /
    typed projection the parquet source uses (S1 contract)."""
    import pyspark.sql.functions as F

    from kkbox_churn_prediction_spark.sources.csv import read_csv_tolerant

    clean, _ = read_csv_tolerant(spark, csv_path, SCHEMA)
    projected = clean.where(
        F.col("conv_id").isNotNull() & F.col("ts").isNotNull()
    ).select("conv_id", "turn_idx", F.col("ts").cast("timestamp"))
    assert projected.count() == 3
    assert dict(projected.dtypes)["ts"] == "timestamp"


def test_bad_mode_rejected(spark, csv_path):
    from kkbox_churn_prediction_spark.sources.csv import read_csv_tolerant

    with pytest.raises(ValueError):
        read_csv_tolerant(spark, csv_path, SCHEMA, mode="FAILFAST")


def test_read_with_schema_defaults_tolerates_evolution(spark, tmp_path):
    """Old partitions lacking a column read as typed NULLs; extra
    columns drop; present columns cast to the expected type."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from kkbox_churn_prediction_spark.sources.events import read_with_schema_defaults

    old = spark.createDataFrame([(1, "a")], "id int, name string")   # no score yet
    new = spark.createDataFrame(
        [(2, "b", 9, "extra")], "id int, name string, score int, junk string"
    )
    old.write.mode("overwrite").parquet(f"{tmp_path}/p/part=0")
    new.write.mode("overwrite").parquet(f"{tmp_path}/p/part=1")
    expected = StructType(
        [
            StructField("id", LongType()),      # widened int -> long
            StructField("name", StringType()),
            StructField("score", LongType()),
        ]
    )
    got = read_with_schema_defaults(spark, f"{tmp_path}/p/part=*", expected)
    assert [f.name for f in got.schema.fields] == ["id", "name", "score"]
    assert dict(got.dtypes) == {"id": "bigint", "name": "string", "score": "bigint"}
    rows = {r["id"]: r for r in got.collect()}
    assert rows[1]["score"] is None and rows[2]["score"] == 9
    assert "junk" not in got.columns
