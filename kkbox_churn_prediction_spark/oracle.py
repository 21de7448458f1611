"""Single-process pandas oracle for the flagship backfill.

The reference gates its labels against an independent oracle with a
hard threshold (``src/labels.py:167-200``: accuracy ≥ 0.99 or
ValueError). Our engine's analog (FIXTURES.md §C): every
entity×cutoff feature vector must be ``allclose`` to this completely
independent pandas re-implementation — no Spark, no SQL, plain
groupbys — so a systematic error shared by the Spark plan and the
DuckDB oracle SQL (both declarative) would still be caught.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

HORIZONS = (1, 3, 7)


def backfill_oracle(
    turns: pd.DataFrame,
    cutoffs: list[pd.Timestamp],
    horizons: tuple[int, ...] = HORIZONS,
) -> pd.DataFrame:
    """Feature matrix per (conv_id, cutoff_ts) — strictly-prior turns,
    lookback = max(horizons); must mirror plans.backfill semantics."""
    turns = turns.dropna(subset=["conv_id", "ts"]).copy()
    turns["text_len"] = turns["text"].fillna("").str.len().astype("int64")
    rows = []
    for conv_id, g in turns.groupby("conv_id"):
        for cutoff in cutoffs:
            lo = cutoff - pd.Timedelta(days=max(horizons))
            w = g[(g["ts"] < cutoff) & (g["ts"] >= lo)]
            row: dict = {"conv_id": conv_id, "cutoff_ts": cutoff}
            for k in horizons:
                wk = w[w["ts"] >= cutoff - pd.Timedelta(days=k)]
                row[f"turn_cnt_{k}d"] = len(wk)
                row[f"user_turn_cnt_{k}d"] = int((wk["role"] == "user").sum())
                row[f"tool_call_cnt_{k}d"] = int(wk["tool"].notna().sum())
                row[f"distinct_tool_cnt_{k}d"] = int(wk["tool"].dropna().nunique())
                row[f"text_len_sum_{k}d"] = int(wk["text_len"].sum())
                row[f"text_len_max_{k}d"] = int(wk["text_len"].max()) if len(wk) else 0
                # half-up rounding to match Spark/DuckDB ROUND (Python's
                # round() is banker's: round(196.15625,4) → .1562 not .1563)
                row[f"text_len_avg_{k}d"] = (
                    float(np.floor(float(wk["text_len"].mean()) * 1e4 + 0.5) / 1e4)
                    if len(wk)
                    else 0.0
                )
            row["micros_since_last_turn"] = (
                int((cutoff - w["ts"].max()).value // 1000) if len(w) else -1
            )
            rows.append(row)
    return pd.DataFrame(rows)


def assert_allclose_features(
    engine: pd.DataFrame, oracle: pd.DataFrame, rtol: float = 1e-9, atol: float = 1e-9
) -> None:
    """Hard gate at EVERY entity×cutoff (reference threshold-or-fail
    pattern). Raises AssertionError with the offending cells."""
    keys = ["conv_id", "cutoff_ts"]
    e = engine.sort_values(keys).reset_index(drop=True)
    o = oracle.sort_values(keys).reset_index(drop=True)
    if len(e) != len(o):
        raise AssertionError(f"row count {len(e)} != oracle {len(o)}")
    common = [c for c in o.columns if c in e.columns]
    for c in common:
        if c in keys:
            if not e[c].equals(o[c]):
                raise AssertionError(f"key column {c} differs")
            continue
        a, b = e[c].to_numpy(dtype="float64"), o[c].to_numpy(dtype="float64")
        bad = ~np.isclose(a, b, rtol=rtol, atol=atol)
        if bad.any():
            i = int(np.argmax(bad))
            raise AssertionError(
                f"{c} not allclose at {e.loc[i, 'conv_id']}×{e.loc[i, 'cutoff_ts']}: "
                f"engine={a[i]} oracle={b[i]} ({int(bad.sum())} cells total)"
            )
