"""Self-hosted replica of the driver's correctness gate.

Every ``queries()`` entry runs on Spark AND its ``oracle_sql()`` on
DuckDB at sf0.001; row count, column set, and order-insensitive
values must match (the reference's oracle-comparison gate pattern,
``src/labels.py:167-200``: compute → compare → hard fail below
threshold; here the threshold is exact/allclose).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


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


def _query_names():
    import __spark_entry__ as e

    return sorted(e.queries().keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, duck, name):
    import __spark_entry__ as e

    sdf = e.queries()[name](spark, SF_DIR).toPandas()
    oracles = e.oracle_sql()
    if name not in oracles:
        assert len(sdf) > 0, f"{name}: rows-only check failed (empty result)"
        return
    odf = duck.execute(oracles[name]).fetchdf()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    a, b = _normalize(sdf), _normalize(odf)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert "conv_id" in df.columns
