"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship point-in-time backfill at sf0.001.
``queries()`` maps operator names → (spark, sf_dir) → DataFrame.
``oracle_sql()`` gives DuckDB-equivalent SQL per query.

The transcript table (conv_id, turn_idx, role, text, tool, ts) is
derived deterministically from ``events.parquet`` by the SAME mapping
in both engines — see ``sources/events.py`` and ``_CONV_CTE`` below.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"

# ---------------------------------------------------------------------------
# Shared DuckDB CTEs: transcript derivation + cutoff grid.
# MUST stay in lock-step with sources/events.py (Spark side).
# ---------------------------------------------------------------------------
_CONV_CTE = """
conversations AS (
    SELECT concat('c', user_id) AS conv_id,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INTEGER) AS turn_idx,
           CASE event_type WHEN 'signup' THEN 'system'
                           WHEN 'purchase' THEN 'assistant'
                           WHEN 'error' THEN 'tool'
                           ELSE 'user' END AS role,
           concat(event_type, ' ', props) AS text,
           CASE WHEN event_type IN ('purchase', 'error') THEN event_type END AS tool,
           ts
    FROM events
    WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
cutoffs AS (
    SELECT DISTINCT CAST(date_trunc('week', ts) AS TIMESTAMP) + INTERVAL 7 DAY AS cutoff_ts
    FROM events WHERE ts IS NOT NULL
)
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from kkbox_churn_prediction_spark.plans.backfill import backfill_from_events

    return backfill_from_events(spark, SF0001)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_asof_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kkbox_churn_prediction_spark.plans.backfill import backfill_from_events

    return backfill_from_events(spark, sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "asof_features": _q_asof_features,
    }


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

_ASOF_FEATURES_SQL = f"""
WITH {_CONV_CTE},
joined AS (
    SELECT c.conv_id, c.role, c.text, c.tool, c.ts, k.cutoff_ts
    FROM conversations c
    JOIN cutoffs k
      ON c.ts < k.cutoff_ts AND c.ts >= k.cutoff_ts - INTERVAL 7 DAY
),
feats AS (
    SELECT conv_id, cutoff_ts,
        {{conditional_aggs}},
        epoch_us(cutoff_ts) - MAX(epoch_us(ts)) AS micros_since_last_turn
    FROM joined
    GROUP BY conv_id, cutoff_ts
),
grid AS (
    SELECT e.conv_id, k.cutoff_ts
    FROM (SELECT DISTINCT conv_id FROM conversations) e
    CROSS JOIN cutoffs k
)
SELECT g.conv_id, g.cutoff_ts,
    {{final_coalesce}},
    COALESCE(f.micros_since_last_turn, -1) AS micros_since_last_turn
FROM grid g
LEFT JOIN feats f ON g.conv_id = f.conv_id AND g.cutoff_ts = f.cutoff_ts
"""


def _asof_oracle() -> str:
    horizons = (1, 3, 7)
    inside = "ts >= cutoff_ts - INTERVAL {k} DAY"
    families = [
        ("turn_cnt", "COUNT(CASE WHEN {inside} THEN 1 END)", "0"),
        ("user_turn_cnt", "COUNT(CASE WHEN ({inside}) AND role = 'user' THEN 1 END)", "0"),
        ("tool_call_cnt", "COUNT(CASE WHEN {inside} THEN tool END)", "0"),
        ("distinct_tool_cnt", "COUNT(DISTINCT CASE WHEN {inside} THEN tool END)", "0"),
        ("text_len_sum", "CAST(SUM(CASE WHEN {inside} THEN length(text) END) AS BIGINT)", "0"),
        ("text_len_max", "CAST(MAX(CASE WHEN {inside} THEN length(text) END) AS BIGINT)", "0"),
        ("text_len_avg", "ROUND(AVG(CASE WHEN {inside} THEN length(text) END), 4)", "0.0"),
    ]
    aggs, finals = [], []
    for name, tmpl, fill in families:
        for k in horizons:
            col = f"{name}_{k}d"
            aggs.append(tmpl.format(inside=inside.format(k=k)) + f" AS {col}")
            finals.append(f"COALESCE(f.{col}, {fill}) AS {col}")
    return _ASOF_FEATURES_SQL.format(
        conditional_aggs=",\n        ".join(aggs),
        final_coalesce=",\n    ".join(finals),
    )


def oracle_sql() -> dict[str, str]:
    return {
        "asof_features": _asof_oracle(),
    }
