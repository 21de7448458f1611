"""Distributed deterministic transcript generator (bench scale).

``sources.synth`` builds adversarial micro-fixtures driver-side;
this module generates MILLIONS of turns distributed — pure column
expressions seeded by ``hash(conv, turn)``, no Python, no rand()
(deterministic across runs, partitionings, and resumes).

Shape mirrors FIXTURES.md §A: multi-turn conversations with role/tool
mixes, gaps straddling the 30-min session threshold, one
mega-conversation (~100× median turns) for skew, and per-entity start
offsets so cutoffs split conversations (leak-trap structure).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

EPOCH = "TIMESTAMP '2024-01-01 00:00:00'"


def generate_transcripts_distributed(
    spark: SparkSession,
    n_convs: int = 100_000,
    avg_turns: int = 50,
    *,
    mega_conv: bool = True,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """~``n_convs * avg_turns`` turns, schema = TRANSCRIPT_SCHEMA."""
    sc = F.lit(int(seed))
    convs = spark.range(n_convs, numPartitions=partitions)
    n_turns = F.pmod(F.hash(F.col("id"), sc), F.lit(2 * avg_turns - 10)) + F.lit(5)
    if mega_conv:
        n_turns = F.when(F.col("id") == 0, F.lit(avg_turns * 100)).otherwise(n_turns)
    convs = convs.select(
        F.concat(F.lit("conv"), F.lpad(F.col("id").cast("string"), 7, "0")).alias("conv_id"),
        F.col("id").alias("_cid"),
        F.explode(F.sequence(F.lit(0), n_turns - 1)).alias("turn_idx"),
    )
    h = F.hash(F.col("_cid"), F.col("turn_idx"), sc)
    # gaps 1..3600s → plenty of >1800s session splits; first turn
    # starts at a per-conv offset inside a 14-day window
    gap_s = F.pmod(h, F.lit(3600)) + F.lit(1)
    start_s = F.pmod(F.hash(F.col("_cid"), sc), F.lit(14 * 86400))
    w = Window.partitionBy("_cid").orderBy("turn_idx").rowsBetween(
        Window.unboundedPreceding, 0
    )
    offset_s = start_s + F.sum(gap_s).over(w)
    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("user"), F.lit("tool"), F.lit("system")),
        (F.pmod(h, F.lit(5)) + 1).cast("int"),
    )
    tool = F.when(
        role == "tool",
        F.element_at(
            F.array(F.lit("search"), F.lit("code"), F.lit("browse")),
            (F.pmod(F.abs(h), F.lit(3)) + 1).cast("int"),
        ),
    )
    text = F.repeat(F.lit("x"), (F.pmod(h, F.lit(395)) + 5).cast("int"))
    return convs.select(
        "conv_id",
        F.col("turn_idx").cast("int"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        (F.expr(EPOCH) + offset_s.cast("long") * F.expr("INTERVAL 1 SECOND")).alias("ts"),
    )


def weekly_cutoffs(turns: DataFrame) -> DataFrame:
    return (
        turns.select(
            (F.date_trunc("week", F.col("ts")) + F.expr("INTERVAL 7 DAYS")).alias("cutoff_ts")
        ).distinct()
    )
