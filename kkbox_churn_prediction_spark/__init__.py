"""PySpark-native point-in-time feature-engineering engine.

A from-scratch Spark engine reproducing the leak-safe as-of /
point-in-time feature semantics of the reference churn pipeline
(``robertlupo1997/kkbox-churn-prediction``) over tables of multi-turn
transcripts ``(conv_id, turn_idx, role, text, tool, ts)``.

Not a port: the reference executes DuckDB/Postgres SQL + pandas
(see ``/root/reference/src/backtest.py``); this engine declares
logical plans with the DataFrame API and lets Catalyst/AQE pick
physical strategies, dropping to Arrow-vectorized pandas UDFs only
where built-ins can't express the semantics.
"""

__version__ = "0.1.0"
