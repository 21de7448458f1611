"""Error-tolerant JSONL ingest: PERMISSIVE split + DROPMALFORMED."""

from __future__ import annotations

from kkbox_churn_prediction_spark.sources.jsonl import read_jsonl_tolerant

SCHEMA = "id bigint, text string, score double"

LINES = [
    '{"id": 1, "text": "ok one", "score": 0.5}',
    '{"id": 2, "text": "ok two", "score": 1.25}',
    '{"id": "not-a-number", "text": "bad id", "score": 1}',  # type error
    '{"id": 4, "text": "truncated',  # broken JSON
    "not json at all",
    '{"id": 6, "score": 2.0}',  # missing field -> valid, text null
]


def _write(tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(LINES) + "\n")
    return str(p)


def test_permissive_split_surfaces_corrupt_lines(spark, tmp_path):
    clean, corrupt = read_jsonl_tolerant(spark, _write(tmp_path), SCHEMA)
    ids = sorted(r.id for r in clean.collect())
    assert ids == [1, 2, 6]  # missing-field row is VALID (null text)
    bad = [r._corrupt_record for r in corrupt.collect()]
    assert len(bad) == 3
    assert any("not-a-number" in b for b in bad)
    assert any(b == "not json at all" for b in bad)
    # clean frame carries no corrupt column
    assert "_corrupt_record" not in clean.columns


def test_dropmalformed_is_silent(spark, tmp_path):
    clean, corrupt = read_jsonl_tolerant(
        spark, _write(tmp_path), SCHEMA, mode="DROPMALFORMED"
    )
    assert sorted(r.id for r in clean.select("id", "text").collect()) == [1, 2, 6]
    assert corrupt.count() == 0
