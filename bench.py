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


def timed_best(spark, make_df, reps: int = 2) -> float:
    """``make_df`` is a zero-arg factory: construction runs INSIDE the
    timed region so queries that do driver-side work while building
    the plan (e.g. psi_quantile's exact-percentile edge collect) are
    charged for it rather than hiding it before the stopwatch."""
    materialize(make_df())  # warm
    best = float("inf")
    for _ in range(reps):
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        materialize(make_df())
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


_CLUSTER_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from kkbox_churn_prediction_spark.plans.backfill import backfill_features
from kkbox_churn_prediction_spark.sources.genbench import weekly_cutoffs

spark = (SparkSession.builder.master("local-cluster[8,4,6144]")
    .appName("bench_bulk")
    .config("spark.executor.memory", "6g")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
t = spark.read.parquet(sys.argv[1])
n = t.count()
job_df = backfill_features(t, weekly_cutoffs(t))
def job():
    job_df.write.format("noop").mode("overwrite").save()
job()
best = None
for _ in range(3):
    t0 = time.perf_counter(); job(); dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
print(json.dumps({{"turns": n, "sec": best}}))
"""


def bulk_backfill_rate(spark) -> tuple[int, float, str]:
    """Backfill throughput on the cached 8M-turn generated table.

    Preferred measurement: a subprocess running the job under
    ``local-cluster[8,4,6144]`` — 8 REAL executor JVMs × 4 cores, the
    multi-executor shape the engine targets, with per-executor GC
    (2-3× faster and far stabler than 32 threads sharing one heap —
    see BENCH.md). Falls back to in-process local[N] if cluster mode
    is unavailable.
    """
    import json as _json
    import subprocess
    import sys as _sys

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

    in_process = None
    try:
        # measure the in-process fallback FIRST (needs the live
        # session), then stop the session — a live parent JVM has
        # been observed to stall local-cluster child startup. A
        # failure here (e.g. OOM on a small host) must NOT abort the
        # bench: the cluster child below may still succeed.
        turns = spark.read.parquet(BULK_DIR)
        n = turns.count()
        sec = timed_best(
            spark, lambda: backfill_features(turns, weekly_cutoffs(turns)), reps=2
        )
        in_process = (n, round(n / sec, 1), "in-process")
    except Exception:
        in_process = None
    finally:
        spark.stop()

    repo = os.path.dirname(os.path.abspath(__file__))
    try:
        out = subprocess.run(
            [_sys.executable, "-c", _CLUSTER_CHILD.format(repo=repo), BULK_DIR],
            capture_output=True, text=True, timeout=420, check=True,
        )
        r = _json.loads(out.stdout.strip().splitlines()[-1])
        cluster = (r["turns"], round(r["turns"] / r["sec"], 1), "local-cluster[8,4]")
        if in_process is None or cluster[1] >= in_process[1]:
            return cluster
        return in_process
    except Exception:
        if in_process is not None:
            return in_process
        raise


def load_prev_bench() -> tuple[str, dict] | None:
    """Latest BENCH_r{N}.json in the repo root — the previous round's
    driver-recorded numbers, so this round's output can carry a
    per-query regression diff."""
    import glob

    repo = os.path.dirname(os.path.abspath(__file__))
    cands = sorted(
        glob.glob(os.path.join(repo, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"BENCH_r(\d+)", p).group(1)),
    )
    if not cands:
        return None
    path = cands[-1]
    try:
        with open(path) as f:
            data = json.load(f)
        # the driver wraps the bench line under "parsed" alongside its
        # own run metadata; unwrap to the actual metric record
        if "parsed" in data and isinstance(data["parsed"], dict):
            data = data["parsed"]
        return os.path.basename(path), data
    except Exception:
        return None


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
        timings[name] = timed_best(
            spark, lambda fn=fn: fn(spark, sf_dir)
        )

    bulk_turns, bulk_rate, bulk_mode = bulk_backfill_rate(spark)

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
        "bulk_mode": bulk_mode,
        "cpus": int(cpus),
    }
    prev = load_prev_bench()
    if prev is not None:
        prev_name, prev_json = prev
        prev_q = prev_json.get("queries", {})
        # per-query sec delta vs the previous round (negative = faster
        # now); only meaningful when sf matches — flagged otherwise
        shared = [q for q in timings if q in prev_q]
        out["delta_vs_prev"] = {
            "baseline": prev_name,
            "comparable_sf": prev_json.get("sf") == sf,
            "queries": {q: round(timings[q] - prev_q[q], 3) for q in shared},
            "new_queries": sorted(set(timings) - set(prev_q)),
            # like-for-like: totals over the shared query set only —
            # raw total_delta also counts queries added this round
            "comparable_total": round(sum(timings[q] for q in shared), 3),
            "prev_comparable_total": round(sum(prev_q[q] for q in shared), 3),
            "total_delta": round(total - prev_json.get("value", 0.0), 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
