"""Run the oracle-parity gate for a subset of queries (fast local
iteration before the full pytest run): ``python tools/parity_subset.py
name1 name2 ... [--sf DIR]``. Mirrors tests/test_oracle_parity.py."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_float_dtype(s):
            s = s.round(6)
        elif s.dtype == object:
            s = s.astype(str)
        out[c] = s
    nd = pd.DataFrame(out)
    return nd.sort_values(list(nd.columns)).reset_index(drop=True)


def main() -> None:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.001"
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        args = args[:i] + args[i + 2 :]

    import __spark_entry__ as e
    from kkbox_churn_prediction_spark.session import get_spark

    spark = get_spark(app_name="parity_subset", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    names = args or sorted(e.queries().keys())
    oracles = e.oracle_sql()
    failed = []
    for name in names:
        try:
            sdf = e.queries()[name](spark, sf).toPandas()
            if name not in oracles:
                ok = len(sdf) > 0
                print(f"{name}: rows-only {'OK' if ok else 'EMPTY'} ({len(sdf)} rows)")
                if not ok:
                    failed.append(name)
                continue
            odf = con.execute(oracles[name]).fetchdf()
            assert sorted(sdf.columns) == sorted(odf.columns), (
                f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}"
            )
            assert len(sdf) == len(odf), f"rows {len(sdf)} vs {len(odf)}"
            pd.testing.assert_frame_equal(
                _normalize(sdf), _normalize(odf), check_dtype=False
            )
            print(f"{name}: OK ({len(sdf)} rows)")
        except Exception as ex:  # noqa: BLE001
            failed.append(name)
            print(f"{name}: FAIL — {type(ex).__name__}: {str(ex)[:500]}")
    if failed:
        sys.exit(f"FAILED: {failed}")
    print("all OK")


if __name__ == "__main__":
    main()
