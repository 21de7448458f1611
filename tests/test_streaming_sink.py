"""Exactly-once streaming sink: real foreachBatch run, idempotent
replay, orphan-partial overwrite."""

from __future__ import annotations

import json
from datetime import datetime

import pandas as pd

from pyspark.sql import functions as F

from kkbox_churn_prediction_spark.sources.synth import to_spark


def _batch(spark, n0, n):
    pdf = pd.DataFrame(
        {
            "conv_id": [f"c{i}" for i in range(n0, n0 + n)],
            "turn_idx": [0] * n,
            "role": ["user"] * n,
            "text": ["x"] * n,
            "tool": [None] * n,
            "ts": [datetime(2024, 1, 1, 0, 0, 0)] * n,
        }
    )
    return to_spark(spark, pdf)


def test_streaming_sink_writes_and_replays_idempotently(spark, tmp_path):
    from kkbox_churn_prediction_spark.streaming.sink import manifest_foreach_batch

    src, out, ckpt = f"{tmp_path}/in", f"{tmp_path}/out", f"{tmp_path}/ckpt"
    _batch(spark, 0, 5).write.mode("overwrite").parquet(src)
    schema = _batch(spark, 0, 1).schema
    fn = manifest_foreach_batch(out, "ingest1")
    q = (
        spark.readStream.schema(schema).parquet(src)
        .writeStream.foreachBatch(fn)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    _batch(spark, 5, 3).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(f"{out}/batch=*")
    assert got.count() == 8
    # manifest carries one commit per batch + the run header
    lines = [json.loads(l) for l in open(f"{out}/_manifest.jsonl")]
    commits = [l for l in lines if l.get("kind") != "run"]
    assert sum(c["row_count"] for c in commits) == 8
    # REPLAY a committed batch id with DIFFERENT data → skipped
    replayed_id = int(commits[0]["partition_key"])
    fn(_batch(spark, 100, 50), replayed_id)
    assert spark.read.parquet(f"{out}/batch=*").count() == 8
    # an UNCOMMITTED partial dir gets overwritten, then committed
    import shutil
    new_id = max(int(c["partition_key"]) for c in commits) + 7
    (tmp_path / "out" / f"batch={new_id}").mkdir()
    fn(_batch(spark, 200, 2), new_id)
    assert spark.read.parquet(f"{out}/batch=*").count() == 10
