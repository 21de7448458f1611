"""PII scrubbing for training corpora (vectorized regex, JVM-side).

Standard pre-training hygiene: emails, long digit runs (account /
phone-number stand-ins), and IPv4 literals are replaced with typed
placeholder tokens, and per-doc match counts are kept so curation can
route PII-dense documents to quarantine instead of silently shipping
scrubbed husks.

Everything is ``regexp_replace`` / ``regexp_count`` — whole-stage
codegen, zero Python, embarrassingly parallel (no exchange at all).
Pattern dialect is the RE2-compatible subset (char classes, bounded
repetition) so the DuckDB oracle runs the IDENTICAL patterns.

Replacement order matters and is fixed: emails first (an email
contains digit runs), then IPs (dotted digit runs), then bare digit
runs — each later pattern sees the earlier pattern's placeholders.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4 = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"
# ≥2 digits: the transcript payload's numeric ids are short; real
# deployments raise this to {4,} (a parameter, same plan either way)
DIGIT_RUN = r"[0-9]{2,}"


def redacted_text(col: Column, digit_run: str = DIGIT_RUN) -> Column:
    step1 = F.regexp_replace(col, EMAIL, "<EMAIL>")
    step2 = F.regexp_replace(step1, IPV4, "<IP>")
    return F.regexp_replace(step2, digit_run, "<NUM>")


def redact_pii(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    digit_run: str = DIGIT_RUN,
) -> DataFrame:
    """Per doc: scrubbed text + per-pattern match counts + a total.

    Counts are measured on the ORIGINAL text (before any replacement)
    so they report what was present, not what a prior pattern left
    behind."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_email = F.regexp_count(t, F.lit(EMAIL))
    n_ip = F.regexp_count(t, F.lit(IPV4))
    n_num = F.regexp_count(t, F.lit(digit_run))
    return df.select(
        F.col(id_col),
        redacted_text(t, digit_run).alias("redacted_text"),
        n_email.cast("int").alias("n_email"),
        n_ip.cast("int").alias("n_ip"),
        n_num.cast("int").alias("n_digit_run"),
        (n_email + n_ip + n_num).cast("int").alias("n_pii_total"),
    )
