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


def _q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kkbox_churn_prediction_spark.operators.sessionize import session_aggregates
    from kkbox_churn_prediction_spark.sources.events import conversations_from_events

    return session_aggregates(conversations_from_events(spark, sf_dir))


def _q_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kkbox_churn_prediction_spark.operators.lags import lag_lead_features
    from kkbox_churn_prediction_spark.sources.events import conversations_from_events

    return lag_lead_features(conversations_from_events(spark, sf_dir)).select(
        "conv_id",
        "turn_idx",
        "text_len",
        "prev_text_len_1",
        "next_text_len_1",
        "gap_micros_prev",
        "same_role_as_prev",
    )


def _q_turn_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kkbox_churn_prediction_spark.operators.labels import time_to_next_qualifying_turn
    from kkbox_churn_prediction_spark.sources.events import conversations_from_events

    return time_to_next_qualifying_turn(conversations_from_events(spark, sf_dir)).select(
        "conv_id", "turn_idx", "micros_to_next_qualifying"
    )


def _q_entity_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kkbox_churn_prediction_spark.operators.labels import entity_labels
    from kkbox_churn_prediction_spark.sources.events import (
        conversations_from_events,
        cutoffs_from_events,
    )

    return entity_labels(
        conversations_from_events(spark, sf_dir),
        cutoffs_from_events(spark, sf_dir),
        horizon_days=3,
    )


def _q_history_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kkbox_churn_prediction_spark.operators.history import history_lag_features
    from kkbox_churn_prediction_spark.sources.events import conversations_from_events

    return history_lag_features(conversations_from_events(spark, sf_dir), n_lags=2)


def _q_psi_text_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.psi import fixed_width_bins, psi_from_bins
    from kkbox_churn_prediction_spark.sources.events import conversations_from_events

    conv = conversations_from_events(spark, sf_dir)
    week_no = F.floor(F.unix_micros(F.date_trunc("week", F.col("ts"))) / F.lit(7 * 86400 * 1_000_000))
    binned = conv.select(
        F.when(week_no % 2 == 0, F.lit("even")).otherwise(F.lit("odd")).alias("fold"),
        fixed_width_bins(F.expr("CAST(length(text) AS BIGINT)"), 5.0, 10).alias("bin"),
    )
    return psi_from_bins(binned, "fold", "bin", ref_fold="even")


def _q_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kkbox_churn_prediction_spark.operators.asof import asof_join_broadcast_cutoffs
    from kkbox_churn_prediction_spark.operators.leakage import leakage_audit
    from kkbox_churn_prediction_spark.sources.events import (
        conversations_from_events,
        cutoffs_from_events,
    )

    joined = asof_join_broadcast_cutoffs(
        conversations_from_events(spark, sf_dir),
        cutoffs_from_events(spark, sf_dir),
        lookback_days=7,
    )
    return leakage_audit(joined)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "asof_features": _q_asof_features,
        "sessionize": _q_sessionize,
        "lag_lead": _q_lag_lead,
        "turn_labels": _q_turn_labels,
        "entity_labels": _q_entity_labels,
        "history_lags": _q_history_lags,
        "psi_text_len": _q_psi_text_len,
        "leakage_audit": _q_leakage_audit,
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


_SESSIONIZE_SQL = f"""
WITH {_CONV_CTE},
flagged AS (
    SELECT conv_id, role, text, ts, turn_idx,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                THEN 1 ELSE 0 END AS ns
    FROM conversations
    WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx)
),
sess AS (
    SELECT *, CAST(SUM(ns) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx
                                 ROWS UNBOUNDED PRECEDING) - 1 AS INTEGER) AS session_id
    FROM flagged
)
SELECT conv_id, session_id,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       COUNT(*) AS n_turns,
       CAST(SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT) AS n_user_turns,
       CAST(SUM(length(text)) AS BIGINT) AS text_len_sum,
       MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS duration_micros
FROM sess GROUP BY conv_id, session_id
"""

_LAG_LEAD_SQL = f"""
WITH {_CONV_CTE}
SELECT conv_id, turn_idx,
       CAST(length(text) AS BIGINT) AS text_len,
       COALESCE(lag(CAST(length(text) AS BIGINT), 1) OVER w, -1) AS prev_text_len_1,
       COALESCE(lead(CAST(length(text) AS BIGINT), 1) OVER w, -1) AS next_text_len_1,
       COALESCE(epoch_us(ts) - epoch_us(lag(ts, 1) OVER w), -1) AS gap_micros_prev,
       CASE WHEN lag(role, 1) OVER w IS NULL THEN -1
            WHEN lag(role, 1) OVER w = role THEN 1 ELSE 0 END AS same_role_as_prev
FROM conversations
WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx)
"""

_TURN_LABELS_SQL = f"""
WITH {_CONV_CTE}
SELECT conv_id, turn_idx,
       COALESCE(
         MIN(CASE WHEN role = 'user' THEN epoch_us(ts) END) OVER
           (PARTITION BY conv_id ORDER BY ts, turn_idx
            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
         - epoch_us(ts), -1) AS micros_to_next_qualifying
FROM conversations
"""

_ENTITY_LABELS_SQL = f"""
WITH {_CONV_CTE},
future AS (
    SELECT c.conv_id, k.cutoff_ts, MIN(epoch_us(c.ts)) AS next_us
    FROM conversations c
    JOIN cutoffs k
      ON c.ts > k.cutoff_ts AND c.ts <= k.cutoff_ts + INTERVAL 3 DAY
    WHERE c.role = 'user'
    GROUP BY c.conv_id, k.cutoff_ts
),
grid AS (
    SELECT e.conv_id, k.cutoff_ts
    FROM (SELECT DISTINCT conv_id FROM conversations) e CROSS JOIN cutoffs k
)
SELECT g.conv_id, g.cutoff_ts,
       CASE WHEN f.next_us IS NULL THEN 1 ELSE 0 END AS is_churn,
       COALESCE(f.next_us - epoch_us(g.cutoff_ts), -1) AS micros_to_next_qualifying
FROM grid g LEFT JOIN future f
  ON g.conv_id = f.conv_id AND g.cutoff_ts = f.cutoff_ts
"""

_HISTORY_LAGS_SQL = f"""
WITH {_CONV_CTE},
act AS (
    SELECT conv_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS week_start,
           COUNT(*) AS turn_cnt,
           CAST(SUM(length(text)) AS BIGINT) AS text_len_sum
    FROM conversations GROUP BY 1, 2
),
grid AS (
    SELECT e.conv_id, w.week_start
    FROM (SELECT DISTINCT conv_id FROM conversations) e
    CROSS JOIN (SELECT DISTINCT week_start FROM act) w
),
dense AS (
    SELECT g.conv_id, g.week_start,
           COALESCE(a.turn_cnt, 0) AS turn_cnt,
           COALESCE(a.text_len_sum, 0) AS text_len_sum,
           CAST(floor(epoch_us(g.week_start) / {7 * 86400 * 1_000_000}) AS BIGINT) AS week_no
    FROM grid g LEFT JOIN act a
      ON g.conv_id = a.conv_id AND g.week_start = a.week_start
)
SELECT conv_id, week_start, turn_cnt, text_len_sum,
       COALESCE(lag(turn_cnt, 1) OVER w, -1) AS turn_cnt_w1,
       COALESCE(lag(turn_cnt, 2) OVER w, -1) AS turn_cnt_w2,
       COALESCE(week_no - MAX(CASE WHEN turn_cnt > 0 THEN week_no END) OVER
                   (PARTITION BY conv_id ORDER BY week_start ROWS UNBOUNDED PRECEDING),
                 -1) AS weeks_since_last_active
FROM dense
WINDOW w AS (PARTITION BY conv_id ORDER BY week_start)
"""

_PSI_TEXT_LEN_SQL = f"""
WITH {_CONV_CTE},
binned AS (
    SELECT CASE WHEN CAST(floor(epoch_us(CAST(date_trunc('week', ts) AS TIMESTAMP))
                            / {7 * 86400 * 1_000_000}) AS BIGINT) % 2 = 0
                THEN 'even' ELSE 'odd' END AS fold,
           CAST(LEAST(GREATEST(floor(CAST(length(text) AS BIGINT) / 5.0), 0), 9) AS INTEGER) AS bin
    FROM conversations
),
counts AS (SELECT fold, bin, COUNT(*) AS n FROM binned GROUP BY 1, 2),
freqs AS (
    SELECT fold, bin, CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY fold) AS freq
    FROM counts
),
grid AS (
    SELECT f.fold, b.bin
    FROM (SELECT DISTINCT fold FROM counts WHERE fold <> 'even') f
    CROSS JOIN (SELECT DISTINCT bin FROM counts) b
),
terms AS (
    SELECT g.fold,
           GREATEST(COALESCE(c.freq, 0.0), 1e-6) AS a,
           GREATEST(COALESCE(r.freq, 0.0), 1e-6) AS e
    FROM grid g
    LEFT JOIN (SELECT * FROM freqs WHERE fold <> 'even') c
      ON g.fold = c.fold AND g.bin = c.bin
    LEFT JOIN (SELECT bin, freq FROM freqs WHERE fold = 'even') r
      ON g.bin = r.bin
)
SELECT fold, ROUND(SUM((a - e) * ln(a / e)), 6) AS psi
FROM terms GROUP BY fold
"""

_LEAKAGE_AUDIT_SQL = f"""
WITH {_CONV_CTE},
joined AS (
    SELECT c.ts, k.cutoff_ts
    FROM conversations c
    JOIN cutoffs k
      ON c.ts < k.cutoff_ts AND c.ts >= k.cutoff_ts - INTERVAL 7 DAY
)
SELECT cutoff_ts,
       CAST(SUM(CASE WHEN ts >= cutoff_ts THEN 1 ELSE 0 END) AS BIGINT) AS violation_cnt,
       COUNT(*) AS contributing_rows
FROM joined GROUP BY cutoff_ts
"""


def oracle_sql() -> dict[str, str]:
    return {
        "asof_features": _asof_oracle(),
        "sessionize": _SESSIONIZE_SQL,
        "lag_lead": _LAG_LEAD_SQL,
        "turn_labels": _TURN_LABELS_SQL,
        "entity_labels": _ENTITY_LABELS_SQL,
        "history_lags": _HISTORY_LAGS_SQL,
        "psi_text_len": _PSI_TEXT_LEN_SQL,
        "leakage_audit": _LEAKAGE_AUDIT_SQL,
    }
