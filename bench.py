"""Benchmark harness — one JSON line for the driver.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]; forces full materialization with the noop
sink (no driver collect). Emits:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...},
   "sf": ..., "turns": N, "backfill_turns_per_sec": N}

Scaling-efficiency evidence (local[8] vs local[32]) is produced by
``tools/scaling_bench.py`` and recorded in BENCH.md.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


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
        # warm run first (plan compilation, classloading, page cache),
        # then time the steady-state execution
        materialize(fn(spark, sf_dir))
        t0 = time.perf_counter()
        materialize(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

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
        "cpus": int(cpus),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
