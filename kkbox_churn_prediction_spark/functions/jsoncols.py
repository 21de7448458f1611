"""Schema-on-read JSON column extraction (error-tolerant).

The transcript source carries semi-structured ``props`` JSON per
event; at ingest scale the engine must project typed fields out of it
WITHOUT a parse-validate pass or a Python loop — and malformed
payloads must degrade to NULL (the same drop-don't-crash semantics as
the tolerant CSV reader, SURVEY §1.2 / ``sources/csv.py``), never
fail the job.

Two JVM paths, both codegen'd, no UDF:

- :func:`json_field` — ``get_json_object`` for one path: cheapest for
   1-2 fields, returns NULL for malformed JSON or missing keys.
- :func:`json_struct` — ``from_json`` with an explicit DDL schema:
  one parse for MANY fields (get_json_object re-parses per call), in
  PERMISSIVE mode so malformed rows yield a NULL struct. Prefer this
  whenever ≥3 fields are extracted from the same column.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def json_field(col: Column, path: str, dtype: str = "string") -> Column:
    """Typed field at ``$.path`` — NULL for malformed JSON, missing
    key, or an uncastable value (cast follows SQL TRY semantics)."""
    return F.get_json_object(col, f"$.{path}").cast(dtype)


def json_struct(col: Column, ddl_schema: str) -> Column:
    """Parse once into a typed struct (PERMISSIVE: malformed → NULL
    struct). ``ddl_schema`` e.g. ``"k INT, tag STRING"``."""
    return F.from_json(col, ddl_schema)
