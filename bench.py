"""Benchmark harness — one JSON line for the driver.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]; forces full materialization with the noop
sink (no driver collect). Emits ONE compact JSON line for the driver

  {"metric": "...", "value": N, "unit": "sec", "queries": {...50...},
   "n_queries": N, "sf": ..., "turns": N, "backfill_turns_per_sec": N,
   "bulk_backfill_turns_per_sec": N, "detail_file": "..."}

where ``queries`` carries the driver-core prefix (first 50 gates)
only; the full per-query timing + delta maps are written to
``BENCH_DETAIL_r{N}.json`` (round 2's full-map line overflowed the
driver's tail capture).

Measurement discipline: every query gets one warm run (plan
compilation, classloading, page cache), then timed runs with a GC
nudge first — a single shared JVM accumulates garbage across hundreds
of query plans, and without this the tail queries absorb earlier
queries' GC debt (observed 5-10× inflation on sub-second queries).
Every gate takes the BEST of two timed runs — a single-rep trim
inflated tail times >2× for zero wall-clock savings (GC pauses land
on the one run you kept).

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
    the plan (e.g. psi_quantile's exact-percentile edge collect, the
    fixed-point gates' checkpoint ladders) are charged for it rather
    than hiding it before the stopwatch.

    Adaptive reps: gates whose WARM run exceeds 5s take one timed run
    — GC-pause noise is absolute (~0.1-1s), so it distorts sub-second
    gates (where best-of-2 stays mandatory; a single-rep trim measured
    >2× tail inflation) but is lost in the noise floor of a 10s+
    iterative gate, and the skipped rep saves a full reconstruction of
    exactly the most expensive queries."""
    t0 = time.perf_counter()
    materialize(make_df())  # warm
    warm = time.perf_counter() - t0
    if warm > 5.0:
        reps = 1
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
    .config("spark.scheduler.minRegisteredResourcesRatio", "1.0")
    .config("spark.scheduler.maxRegisteredResourcesWaitingTime", "180s")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
# pre-warm OUTSIDE the timed region: wait for all 8 executor JVMs to
# register (a loaded host can take tens of seconds), then run the job
# twice — the first warm absorbs executor spin-up + classloading +
# parquet footer reads, the second is a clean plan-warm (VERDICT r3
# task #3: the timed region must see a fully-started cluster)
deadline = time.time() + 180
while time.time() < deadline:
    if spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() >= 9:
        break
    time.sleep(1)
t = spark.read.parquet(sys.argv[1])
n = t.count()
job_df = backfill_features(t, weekly_cutoffs(t))
def job():
    job_df.write.format("noop").mode("overwrite").save()
job()
job()
best = None
for _ in range(3):
    t0 = time.perf_counter(); job(); dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
print(json.dumps({{"turns": n, "sec": best}}))
"""


def bulk_backfill_rate(spark) -> tuple[int, float, str, float | None]:
    """Backfill throughput on the cached 8M-turn generated table →
    ``(turns, rate, mode, in_process_rate)``.

    Preferred measurement: a subprocess running the job under
    ``local-cluster[8,4,6144]`` — 8 REAL executor JVMs × 4 cores, the
    multi-executor shape the engine targets, with per-executor GC
    (2-3× faster and far stabler than 32 threads sharing one heap —
    see BENCH.md). The child pre-warms (waits for all executors, two
    warm runs) and gets one retry; whenever it succeeds ITS number is
    the headline and the in-process local[N] rate rides along as the
    fourth element. Only if both attempts fail does the mode fall
    back to ``"in-process"``.
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
    time.sleep(3)  # let the parent JVM's ports/threads actually die
    # two attempts: executor registration under a loaded host is the
    # observed flake (r3's official artifact fell back to in-process);
    # startup waits are now explicit in the child, and a clean retry
    # beats silently reporting the wrong execution shape
    last_exc: Exception | None = None
    for _attempt in range(2):
        try:
            out = subprocess.run(
                [_sys.executable, "-c", _CLUSTER_CHILD.format(repo=repo),
                 BULK_DIR],
                capture_output=True, text=True, timeout=720, check=True,
            )
            r = _json.loads(out.stdout.strip().splitlines()[-1])
            # the multi-JVM number IS the headline whenever the child
            # succeeds — it is the execution shape the engine targets;
            # the in-process rate rides along as a secondary field
            # (r3's "max of the two" rule let a load-depressed cluster
            # run lose to in-process and misreport the mode)
            return (
                r["turns"],
                round(r["turns"] / r["sec"], 1),
                "local-cluster[8,4]",
                in_process[1] if in_process else None,
            )
        except Exception as exc:  # diagnose fallbacks (stderr only)
            last_exc = exc
            detail = ""
            if isinstance(exc, subprocess.CalledProcessError):
                detail = (exc.stderr or "")[-500:]
            print(
                f"[bench] local-cluster child failed "
                f"(attempt {_attempt + 1}, {type(exc).__name__}): {detail}",
                file=_sys.stderr,
            )
    if in_process is not None:
        return (*in_process, None)
    raise last_exc


def prev_round_number() -> int:
    """Highest round N for which a DRIVER-written BENCH_r{N}.json
    exists (0 if none) — this run is N+1. Deliberately ignores the
    BENCH_DETAIL files this harness writes, so repeated local runs
    within a round keep targeting the same detail file."""
    import glob

    repo = os.path.dirname(os.path.abspath(__file__))
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(repo, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    return max(rounds, default=0)


def load_prev_bench() -> tuple[str, dict] | None:
    """Previous round's full per-query numbers for the regression
    diff. Newest round first; within a round prefer
    BENCH_DETAIL_r{N}.json (the full map this harness writes) over
    the driver's BENCH_r{N}.json tail capture, which carries only
    the compact summary (and in r2 was truncated to ``parsed: null``).
    """
    repo = os.path.dirname(os.path.abspath(__file__))
    for n in range(prev_round_number(), 0, -1):
        for tmpl in ("BENCH_DETAIL_r{:02d}.json", "BENCH_r{:02d}.json"):
            path = os.path.join(repo, tmpl.format(n))
            if not os.path.exists(path):
                continue
            try:
                with open(path) as f:
                    data = json.load(f)
                # the driver wraps the bench line under "parsed"
                # alongside its own run metadata
                if isinstance(data.get("parsed"), dict):
                    data = data["parsed"]
                if data.get("queries"):
                    return os.path.basename(path), data
            except Exception:
                continue
    return None


def _count_other_jvms() -> int:
    """Live java processes NOT belonging to this bench run (its own
    driver + local-cluster children are expected). A nonzero count
    means another Spark/pytest session shared the host — per-query
    timings then carry multi-second noise."""
    me = os.getpid()
    n = 0
    try:
        for pid in os.listdir("/proc"):
            if not pid.isdigit() or int(pid) == me:
                continue
            try:
                with open(f"/proc/{pid}/comm") as f:
                    comm = f.read().strip()
                if comm != "java":
                    continue
                with open(f"/proc/{pid}/stat") as f:
                    ppid = int(f.read().split()[3])
                # skip JVMs parented (transitively one level) to us
                if ppid == me:
                    continue
                n += 1
            except OSError:
                continue
    except OSError:
        return -1
    return n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # sample load BEFORE the bench loads the host itself (the first
    # r5 artifact sampled at the end and read 28.5 — its own bulk
    # child, not foreign load)
    load_start = round(os.getloadavg()[0], 2)
    jvms_start = _count_other_jvms()

    import __spark_entry__ as entry_mod
    from kkbox_churn_prediction_spark.session import get_spark

    spark = get_spark(app_name="bench", master=f"local[{cpus}]")

    turns = spark.read.parquet(f"{sf_dir}/events.parquet").count()

    qs = entry_mod.queries()
    timings: dict[str, float] = {}
    # warm + best-of-2 for EVERY gate: a single-rep trim was tried at
    # 284 gates and the tail times inflated >2× (one timed run eats
    # whatever GC pause lands on it — the exact failure the best-of-2
    # discipline exists to dodge; measured 225s → 509s best-sum on
    # the same tree) while saving no wall clock.
    for name, fn in qs.items():
        timings[name] = timed_best(
            spark, lambda fn=fn: fn(spark, sf_dir)
        )

    bulk_turns, bulk_rate, bulk_mode, bulk_in_proc = bulk_backfill_rate(spark)

    total = round(sum(timings.values()), 3)
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    this_round = prev_round_number() + 1

    # Round 2 lesson (VERDICT r2 task #1): one JSON line carrying all
    # 225 per-query timings + the full delta map overflowed the
    # driver's tail capture → BENCH_r02.json had ``parsed: null``.
    # The driver line now stays compact: timings for the driver-core
    # prefix (the same first-50 gates CORRECTNESS samples) plus
    # summary stats; the FULL per-query + delta maps go to
    # BENCH_DETAIL_r{N}.json in the repo root.
    core_names = list(timings)[:50]
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": {q: timings[q] for q in core_names},
        "n_queries": len(timings),
        "sf": sf,
        "turns": turns,
        "backfill_turns_per_sec": round(turns / timings["asof_features"], 1),
        "bulk_turns": bulk_turns,
        "bulk_backfill_turns_per_sec": bulk_rate,
        "bulk_mode": bulk_mode,
        "bulk_in_process_turns_per_sec": bulk_in_proc,
        "cpus": int(cpus),
        # self-describing host conditions (VERDICT r4: the r4 driver
        # artifact ran under load and its +1.9% read as a regression;
        # record 1-min load avg + live java processes so a loaded run
        # is identifiable from the artifact alone)
        "load_avg_1m": load_start,
        "other_jvms": jvms_start,
        "load_avg_end_1m": round(os.getloadavg()[0], 2),
        "detail_file": f"BENCH_DETAIL_r{this_round:02d}.json",
    }
    detail = dict(out)
    detail["queries"] = timings

    prev = load_prev_bench()
    if prev is not None:
        prev_name, prev_json = prev
        prev_q = prev_json.get("queries", {})
        # per-query sec delta vs the previous round (negative = faster
        # now); only meaningful when sf matches — flagged otherwise
        shared = [q for q in timings if q in prev_q]
        deltas = {q: round(timings[q] - prev_q[q], 3) for q in shared}
        comparable_total = round(sum(timings[q] for q in shared), 3)
        prev_comparable = round(sum(prev_q[q] for q in shared), 3)
        summary = {
            "baseline": prev_name,
            "comparable_sf": prev_json.get("sf") == sf,
            # like-for-like: totals over the shared query set only —
            # queries added this round are excluded from the delta
            "comparable_total": comparable_total,
            "prev_comparable_total": prev_comparable,
            # the ONE regression number: comparable-subset difference
            # (VERDICT r4: the old total−prev_value stat mixed in new
            # queries and read as a phantom +27s regression)
            "total_delta": round(comparable_total - prev_comparable, 3),
            "grand_total_delta": round(total - prev_json.get("value", 0.0), 3),
            "top_regressions": dict(
                sorted(deltas.items(), key=lambda kv: -kv[1])[:5]
            ),
            "n_new_queries": len(set(timings) - set(prev_q)),
        }
        out["delta_vs_prev"] = summary
        detail["delta_vs_prev"] = {
            **summary,
            "queries": deltas,
            "new_queries": sorted(set(timings) - set(prev_q)),
        }

    repo = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(repo, out["detail_file"]), "w") as f:
        json.dump(detail, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
