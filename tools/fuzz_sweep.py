"""FULL-registry differential fuzz sweep: every ``queries()`` gate vs
its DuckDB oracle on ADVERSARIAL generated tables.

The pytest net (``tests/test_fuzz_parity.py``) runs a 152-gate sample
per commit; this tool sweeps ALL gates — the r5 full-registry run
found nine bugs in gates the sample never covered (window tie-order
nondeterminism, NULL-policy seams, zero-norm vectors, blank-text
canonicalization, an ill-conditioned LOF rounding) plus seven more on
the degenerate table shape. Run it whenever the oracle corpus or a
shared text/window/NULL code path changes.

Usage:
    python tools/fuzz_sweep.py [--seed N] [--degenerate] [gate ...]

Generates the seeded fuzz tables into a temp dir (deterministic,
``tests/test_fuzz_parity.py::_gen_tables``), then runs the parity
compare for every gate (or the named subset). Prints one line per
discrepancy and a final ``DONE ok=<n>/<total>``; exit 1 on any
finding. Gates without oracles print NO-ORACLE (rows-only, informational).
"""

from __future__ import annotations

import argparse
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))
sys.path.insert(0, str(REPO / "tools"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--degenerate", action="store_true")
    ap.add_argument(
        "--empty",
        action="store_true",
        help="zero-row versions of every table (same schemas) — the "
        "empty-partition/empty-fold robustness sweep; engine and "
        "oracle must agree on every degenerate empty answer",
    )
    ap.add_argument("gates", nargs="*")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entry
    from parity import TABLES, normalize
    from test_fuzz_parity import _gen_tables

    from kkbox_churn_prediction_spark.session import get_spark

    out = Path(tempfile.mkdtemp(prefix="fuzz_sweep_"))
    _gen_tables(out, args.seed, args.degenerate)
    if args.empty:
        import pyarrow.parquet as pq

        for f in out.glob("*.parquet"):
            t = pq.read_table(f)
            pq.write_table(t.slice(0, 0), f)
    spark = get_spark(master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{out}/{t}.parquet'")
    qs, oracles = entry.queries(), entry.oracle_sql()
    gates = args.gates or list(qs)
    n_ok, n_bad = 0, 0
    for name in gates:
        try:
            sdf = qs[name](spark, str(out)).toPandas()
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            print(f"SPARK-ERR {name}: {str(e).splitlines()[0][:200]}", flush=True)
            n_bad += 1
            continue
        if name not in oracles:
            print(f"NO-ORACLE {name}: rows={len(sdf)}", flush=True)
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"ORACLE-ERR {name}: {str(e).splitlines()[0][:200]}", flush=True)
            n_bad += 1
            continue
        if len(sdf) != len(odf):
            print(f"ROWS {name}: {len(sdf)} vs {len(odf)}", flush=True)
            n_bad += 1
        elif sorted(sdf.columns) != sorted(odf.columns):
            print(f"COLS {name}: {sorted(sdf.columns)} vs {sorted(odf.columns)}",
                  flush=True)
            n_bad += 1
        else:
            a, b = normalize(sdf), normalize(odf)
            if not a.equals(b):
                neq = [c for c in a.columns if not a[c].equals(b[c])]
                print(f"VALUES {name}: {neq}", flush=True)
                n_bad += 1
            else:
                n_ok += 1
    print(f"DONE ok={n_ok}/{len(gates)} bad={n_bad} "
          f"(seed={args.seed}, degenerate={args.degenerate})")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
