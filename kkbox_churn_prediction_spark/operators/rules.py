"""Declarative first-match rule router.

The reference buckets entities with an ordered CASE chain
(``sql/07_churn_risk_scoring.sql:9-16`` — Lost/High/Medium/Low churn
risk, first matching rule wins) and maps risk patterns to retention
actions from a declarative rules file (``rules.yaml:36-…``). The
engine generalizes both: a rule table ``[(predicate_sql, label), …]``
compiles to ONE ``when``-chain Column — pure whole-stage codegen,
zero exchange, evaluated in the same stage as whatever produced the
features. Rules stay data (auditable, diffable) instead of query
text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def compile_rules(rules: list[tuple[str, str]], default: str) -> Column:
    """Ordered (SQL predicate, label) pairs → a first-match-wins
    ``when`` chain ending in ``default``. Predicates are Spark SQL
    expressions over the input columns."""
    if not rules:
        return F.lit(default)
    chain: Column | None = None
    for pred, label in rules:
        cond = F.expr(pred)
        chain = F.when(cond, F.lit(label)) if chain is None else chain.when(
            cond, F.lit(label)
        )
    return chain.otherwise(F.lit(default))


def apply_rules(
    df: DataFrame,
    rules: list[tuple[str, str]],
    default: str,
    out_col: str = "bucket",
) -> DataFrame:
    """Attach the first-match rule label as ``out_col``. A projection
    only — the plan shape of the input is untouched."""
    return df.withColumn(out_col, compile_rules(rules, default))


def rule_audit(df: DataFrame, out_col: str = "bucket") -> DataFrame:
    """Per-bucket row counts (the release-audit companion: which rule
    fires how often). One tiny agg keyed by the label."""
    return df.groupBy(out_col).agg(F.count(F.lit(1)).alias("n_rows"))
