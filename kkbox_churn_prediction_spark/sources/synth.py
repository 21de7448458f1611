"""Deterministic synthetic transcript generator for tests & bench.

Seeded generator in the mold of the reference's fixture factory
(``tests/fixtures/generate_synthetic.py:165-197``, seeds at
``:176-177``). Produces the adversarial characteristics FIXTURES.md §A
requires:

1. future-turn leak traps straddling cutoffs,
2. window-boundary ±1 turns (exactly at cutoff, cutoff−lookback),
3. session gaps clustered around the 30-min threshold (incl. exactly
   30:00),
4. entities with zero in-window turns (default/COALESCE paths),
5. one mega-conversation (~100× median turns) for skew tests,
6. dirty rows (null ts / null conv_id / empty text / null tool),
7. label-horizon edge events (next event at horizon−1 / horizon /
   horizon+1),
8. duplicate rows for de-dup semantics.

Pure numpy/pandas on the driver (test-scale only); converted to a
Spark DataFrame through Arrow.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from kkbox_churn_prediction_spark.schema import TRANSCRIPT_SCHEMA

EPOCH = datetime(2024, 1, 1)
ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(["search", "code", "browse", None], dtype=object)


def generate_transcripts(
    n_convs: int = 50,
    mean_turns: int = 40,
    seed: int = 42,
    *,
    mega_conv: bool = True,
    dirty_rows: bool = True,
    span_days: int = 30,
) -> pd.DataFrame:
    """Seeded transcript table as pandas (driver-side, test scale)."""
    rng = np.random.default_rng(seed)
    rows: list[dict] = []

    for i in range(n_convs):
        conv_id = f"conv{i:05d}"
        n_turns = 1 + rng.poisson(mean_turns)
        if mega_conv and i == 0:
            n_turns = mean_turns * 100  # skew: the mega-conversation
        start = EPOCH + timedelta(
            seconds=float(rng.uniform(0, span_days * 86400 * 0.5))
        )
        # gaps: mixture below/above the 30-min session threshold,
        # including exactly 30:00 once per conversation
        gaps = rng.choice(
            [30.0, 300.0, 900.0, 1799.0, 1800.0, 1801.0, 7200.0],
            p=[0.35, 0.25, 0.15, 0.05, 0.05, 0.05, 0.10],
            size=n_turns,
        )
        gaps[0] = 0.0
        ts = start + pd.to_timedelta(np.cumsum(gaps), unit="s")
        roles = rng.choice(ROLES, p=[0.45, 0.4, 0.05, 0.1], size=n_turns)
        tools = np.where(
            roles == "tool",
            rng.choice(TOOLS[:3], size=n_turns),
            rng.choice(TOOLS, p=[0.05, 0.05, 0.05, 0.85], size=n_turns),
        )
        for j in range(n_turns):
            text_len = int(rng.integers(1, 400))
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": j,
                    "role": roles[j],
                    "text": "x" * text_len,
                    "tool": tools[j],
                    "ts": ts[j].to_pydatetime(),
                }
            )

    df = pd.DataFrame(rows)
    if dirty_rows:
        dirty = pd.DataFrame(
            [
                # null ts → silently dropped by the null filter (P2)
                {"conv_id": "dirty0", "turn_idx": 0, "role": "user", "text": "a", "tool": None, "ts": None},
                # null conv_id → dropped
                {"conv_id": None, "turn_idx": 0, "role": "user", "text": "b", "tool": None, "ts": EPOCH},
                # empty text / null tool survive
                {"conv_id": "dirty1", "turn_idx": 0, "role": "user", "text": "", "tool": None, "ts": EPOCH + timedelta(days=1)},
            ]
        )
        df = pd.concat([df, dirty], ignore_index=True)
    return df


def leak_trap_fixture() -> tuple[pd.DataFrame, datetime]:
    """Micro-fixture with turns straddling one cutoff — any leakage
    changes the golden aggregates (pattern:
    ``tests/test_temporal_safety.py:38-73`` in the reference).

    Cutoff = 2024-01-15 00:00. convA: 3 turns before (text lens
    10/20/30), 2 after (1000 each); convB: all 4 turns after;
    convC: 2 turns before at exact boundary edges.
    """
    cutoff = datetime(2024, 1, 15)
    rows = [
        # convA — before cutoff
        ("convA", 0, "user", "x" * 10, None, datetime(2024, 1, 12, 10, 0)),
        ("convA", 1, "assistant", "x" * 20, None, datetime(2024, 1, 13, 11, 0)),
        ("convA", 2, "tool", "x" * 30, "search", datetime(2024, 1, 14, 12, 0)),
        # convA — after cutoff (leak traps)
        ("convA", 3, "user", "x" * 1000, None, datetime(2024, 1, 15, 0, 0)),  # exactly at cutoff: excluded (strict <)
        ("convA", 4, "user", "x" * 1000, "code", datetime(2024, 1, 16, 0, 0)),
        # convB — entirely after cutoff
        *[("convB", j, "user", "x" * 1000, None, datetime(2024, 1, 20, j)) for j in range(4)],
        # convC — boundary: exactly at cutoff-7d (included, >=) and 1µs before cutoff (included)
        ("convC", 0, "user", "x" * 7, None, datetime(2024, 1, 8, 0, 0)),
        ("convC", 1, "user", "x" * 9, None, datetime(2024, 1, 14, 23, 59, 59, 999999)),
    ]
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    return df, cutoff


from pyspark.sql import functions as F
from pyspark.sql import types as T

# raw ingest schema: everything nullable, so dirty fixture rows load;
# the engine's P2 filter (clean_turns) drops them, mirroring the
# reference's silent malformed-row drops (features/features.sqlx:28-33)
RAW_TRANSCRIPT_SCHEMA = T.StructType(
    [T.StructField(f.name, f.dataType, True) for f in TRANSCRIPT_SCHEMA.fields]
)


def to_spark(spark: SparkSession, pdf: pd.DataFrame) -> DataFrame:
    pdf = pdf.copy()
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    return spark.createDataFrame(pdf, schema=RAW_TRANSCRIPT_SCHEMA)


def clean_turns(turns: DataFrame) -> DataFrame:
    """P2 null/validity filter (src/labels.py:82-88): drop rows with
    NULL entity or NULL event time — silently, like the reference."""
    return turns.where(F.col("conv_id").isNotNull() & F.col("ts").isNotNull())
