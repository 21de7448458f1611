"""Scaling-efficiency evidence: same backfill at N and 4N cores.

BASELINE.json's north rule requires ≥0.8 throughput-scaling
efficiency from N to 4N executors. No real cluster exists in this
sandbox, so (per BASELINE.md) we run the IDENTICAL job at local[8]
and local[32] on the SAME input and report throughput at both plus
efficiency = (thr_4N / thr_N) / 4.

The input must be compute-bound, not overhead-bound (at sf0.1's 100k
rows both configs finish in scheduler-overhead time and efficiency is
meaningless), so the job runs over a deterministically generated
transcript table (default 4M turns, seeded hash-based — see
``sources.genbench``) written once to a shared parquet dir.

Each measurement runs in a fresh subprocess (fresh JVM) so the two
configurations don't share executor state. Writes BENCH.md.

Usage: python tools/scaling_bench.py [n_turns_millions] [reps]
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

GEN = r"""
import sys
sys.path.insert(0, {repo!r})
from kkbox_churn_prediction_spark.session import get_spark
from kkbox_churn_prediction_spark.sources.genbench import generate_transcripts_distributed

spark = get_spark(app_name="genbench", master="local[32]")
n_convs = int(sys.argv[1])
df = generate_transcripts_distributed(spark, n_convs=n_convs, avg_turns=50, partitions=64)
df.write.mode("overwrite").parquet(sys.argv[2])
print(spark.read.parquet(sys.argv[2]).count())
"""

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from kkbox_churn_prediction_spark.session import get_spark
from kkbox_churn_prediction_spark.plans.backfill import backfill_features
from kkbox_churn_prediction_spark.sources.genbench import weekly_cutoffs

cores = int(sys.argv[1]); data = sys.argv[2]; reps = int(sys.argv[3])
spark = get_spark(app_name=f"scale{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=cores * 2)
turns_df = spark.read.parquet(data)
turns = turns_df.count()
cutoffs = weekly_cutoffs(turns_df)

def job():
    backfill_features(turns_df, cutoffs).write.format("noop").mode("overwrite").save()

job()  # warm-up: JVM JIT + codegen cache
best = None
rep_times = []
for _ in range(reps):
    # settle GC debt from the previous rep before timing (same
    # steady-state discipline as bench.py: occasional ~130s
    # full-GC-thrash episodes otherwise dominate best-of-N)
    spark._jvm.System.gc()
    t0 = time.perf_counter(); job(); dt = time.perf_counter() - t0
    rep_times.append(dt)
    best = dt if best is None else min(best, dt)
print(json.dumps({{"cores": cores, "sec": best, "reps": rep_times, "turns": turns,
                   "turns_per_sec": turns / best}}))
"""


EXEC_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from kkbox_churn_prediction_spark.plans.backfill import backfill_features
from kkbox_churn_prediction_spark.sources.genbench import weekly_cutoffs

n_exec = int(sys.argv[1]); data = sys.argv[2]; reps = int(sys.argv[3])
cores_per = 4
# REAL separate executor JVMs (the north rule's 'N and 4N executors'):
# local-cluster launches one worker JVM per executor with its own
# heap, so GC and memory pressure are per-executor — exactly the
# multi-executor cluster shape, minus the network.
spark = (
    SparkSession.builder
    .master(f"local-cluster[{{n_exec}},{{cores_per}},8192]")
    .appName(f"execscale{{n_exec}}")
    .config("spark.executor.memory", "8g")
    .config("spark.sql.shuffle.partitions", str(n_exec * cores_per * 2))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")
turns_df = spark.read.parquet(data)
turns = turns_df.count()
cutoffs = weekly_cutoffs(turns_df)

def job():
    backfill_features(turns_df, cutoffs).write.format("noop").mode("overwrite").save()

job()  # warm-up
best = None
rep_times = []
for _ in range(reps):
    # same GC-settle discipline as the thread-mode CHILD: per-executor
    # JVMs make the settle cheaper, but the methodology must match so
    # the two modes' floors are comparable (driver-side gc only — the
    # executors GC independently under their own heaps)
    spark._jvm.System.gc()
    t0 = time.perf_counter(); job(); dt = time.perf_counter() - t0
    rep_times.append(dt)
    best = dt if best is None else min(best, dt)
print(json.dumps({{"executors": n_exec, "cores_per_executor": cores_per,
                   "sec": best, "reps": rep_times, "turns": turns,
                   "turns_per_sec": turns / best}}))
"""


def run_child(template: str, args: list[str], timeout: int = 3600) -> str:
    script = template.format(repo=str(REPO))
    out = subprocess.run(
        [sys.executable, "-c", script, *args],
        capture_output=True, text=True, timeout=timeout, check=True,
    )
    return out.stdout.strip().splitlines()[-1]


def main() -> None:
    """Usage: python tools/scaling_bench.py [millions] [reps] [N [4N]]

    Default N=4 vs 4N=16 at 64M turns: both configurations stay below
    the sandbox's measured contention knee (~16-20 threads in one JVM
    — see BENCH.md), so the ratio reflects the JOB's scalability, not
    the box's. Pass 8 32 to reproduce the saturated configuration.
    """
    executors_mode = "--executors" in sys.argv
    argv = [a for a in sys.argv if a != "--executors"]
    millions = float(argv[1]) if len(argv) > 1 else 64.0
    reps = int(argv[2]) if len(argv) > 2 else 3
    n = int(argv[3]) if len(argv) > 3 else 4
    n4 = int(argv[4]) if len(argv) > 4 else 4 * n
    n_convs = int(millions * 1_000_000 / 50)  # avg 50 turns/conv
    DATA = Path(f"/tmp/bench_transcripts_{millions:g}m")

    if not (DATA / "_SUCCESS").exists():
        count = run_child(GEN, [str(n_convs), str(DATA)])
        print(f"generated {count} turns at {DATA}")

    if executors_mode:
        # N vs 4N executor JVMs, 4 cores each (local-cluster); the
        # positional n/n4 args are EXECUTOR counts here (default 1, 4)
        n_exec = n if len(argv) > 3 else 1
        n4_exec = n4 if len(argv) > 4 else 4 * n_exec
        lo = json.loads(run_child(EXEC_CHILD, [str(n_exec), str(DATA), str(reps)]))
        hi = json.loads(run_child(EXEC_CHILD, [str(n4_exec), str(DATA), str(reps)]))
        eff = (hi["turns_per_sec"] / lo["turns_per_sec"]) / (n4_exec / n_exec)
        print(json.dumps({"mode": "executors", "n": lo, "four_n": hi,
                          "scaling_efficiency": round(eff, 3)}, indent=2))
        return

    lo = json.loads(run_child(CHILD, [str(n), str(DATA), str(reps)]))
    hi = json.loads(run_child(CHILD, [str(n4), str(DATA), str(reps)]))
    eff = (hi["turns_per_sec"] / lo["turns_per_sec"]) / (n4 / n)
    print(json.dumps({"n": lo, "four_n": hi, "scaling_efficiency": round(eff, 3)}, indent=2))


if __name__ == "__main__":
    main()
