"""Canonical schemas.

The engine's single input is a transcript table (``BASELINE.json
input_hint``): one row per conversation turn. Analog of the
reference's event tables (``sql/00_create_staging_tables.sql:20-43``,
``stg.transactions`` / ``stg.user_logs``): ``conv_id``≡``msno``,
``ts``≡event date, ``role``/``tool``≡categorical event attrs,
``length(text)``≡``total_secs`` measure.
"""

from __future__ import annotations

from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# entity × cutoff grid — the reference's label_index
# (features/features_comprehensive.sql:12-19): one row per
# (entity, cutoff timestamp); every feature is computed as-of it.
CUTOFF_GRID_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("cutoff_ts", T.TimestampType(), False),
    ]
)

# checkpoint manifest row — extends the reference's run manifest
# (src/runlog.py:17-26) to per-partition granularity for resumable
# backfills (north_rule).
MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("partition_key", T.StringType(), False),
        T.StructField("row_count", T.LongType(), False),
        T.StructField("input_fingerprint", T.LongType(), True),
        T.StructField("status", T.StringType(), False),
        T.StructField("completed_at", T.TimestampType(), True),
    ]
)
