"""Benchmark harness — one JSON line for the driver.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]; forces full materialization with the noop
sink (no driver collect). Emits:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...},
   "sf": ..., "turns": N, "backfill_turns_per_sec": N,
   "bulk_backfill_turns_per_sec": N}

Measurement discipline: every query gets one warm run (plan
compilation, classloading, page cache), then the BEST of two timed
runs with a GC nudge in between — a single shared JVM accumulates
garbage across ~40 query plans, and without this the tail queries
absorb earlier queries' GC debt (observed 5-10× inflation on
sub-second queries).

``backfill_turns_per_sec`` at sf0.1 (100k turns) is fixed-overhead
dominated (~30 stages of scheduling around ~0.1s of compute); the
engine-throughput number comparable to the reference baseline
(BASELINE.md: ≈230k-680k rows/s) is ``bulk_backfill_turns_per_sec``,
measured on a deterministically generated 8M-turn table (cached
across rounds in /tmp). Scaling-efficiency evidence (local[8] vs
local[32]) is produced by ``tools/scaling_bench.py`` → BENCH.md.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BULK_DIR = "/tmp/bench_transcripts_8m"
BULK_CONVS = 160_000  # × ~50 avg turns ≈ 8M


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed_best(spark, df, reps: int = 2) -> float:
    materialize(df)  # warm
    best = float("inf")
    for _ in range(reps):
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        materialize(df)
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def bulk_backfill_rate(spark) -> tuple[int, float]:
    """Backfill throughput on the cached 8M-turn generated table."""
    from kkbox_churn_prediction_spark.plans.backfill import backfill_features
    from kkbox_churn_prediction_spark.sources.genbench import (
        generate_transcripts_distributed,
        weekly_cutoffs,
    )

    marker = os.path.join(BULK_DIR, "_SUCCESS")
    if not os.path.exists(marker):
        df = generate_transcripts_distributed(
            spark, n_convs=BULK_CONVS, avg_turns=50, partitions=64
        )
        df.write.mode("overwrite").parquet(BULK_DIR)
    turns = spark.read.parquet(BULK_DIR)
    n = turns.count()
    job = backfill_features(turns, weekly_cutoffs(turns))
    sec = timed_best(spark, job, reps=2)
    return n, round(n / sec, 1)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import __spark_entry__ as entry_mod
    from kkbox_churn_prediction_spark.session import get_spark

    spark = get_spark(app_name="bench", master=f"local[{cpus}]")

    turns = spark.read.parquet(f"{sf_dir}/events.parquet").count()

    qs = entry_mod.queries()
    timings: dict[str, float] = {}
    for name, fn in qs.items():
        timings[name] = timed_best(spark, fn(spark, sf_dir))

    bulk_turns, bulk_rate = bulk_backfill_rate(spark)

    total = round(sum(timings.values()), 3)
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "turns": turns,
        "backfill_turns_per_sec": round(turns / timings["asof_features"], 1),
        "bulk_turns": bulk_turns,
        "bulk_backfill_turns_per_sec": bulk_rate,
        "cpus": int(cpus),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
