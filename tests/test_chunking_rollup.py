"""Chunking (fixed-token windows w/ overlap) and ROLLUP grouping sets."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, n=200, parts=1):
    return spark.range(n).repartition(parts).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 53 + 7, 900)).alias("n_tokens"),  # 0..899
    )


def test_chunk_coverage_and_overlap(spark):
    from kkbox_churn_prediction_spark.operators.chunking import chunk_documents

    out = chunk_documents(_docs(spark), "n_tokens", chunk_size=256, stride=64).toPandas()
    docs = _docs(spark).toPandas().set_index("doc_id")["n_tokens"]
    for doc_id, g in out.groupby("doc_id"):
        n = int(docs.loc[doc_id])
        g = g.sort_values("chunk_idx").reset_index(drop=True)
        # chunk_idx is dense 0..k-1; starts step by stride
        assert list(g["chunk_idx"]) == list(range(len(g)))
        assert (g["chunk_start"] == g["chunk_idx"] * 64).all()
        # every end capped at n_tokens; last chunk covers the tail
        assert (g["chunk_end"] <= max(n, 256)).all()
        assert int(g["chunk_end"].max()) == max(n, min(256, n))
        # tail coverage: last start < n (or single chunk for short docs)
        if n > 256:
            assert int(g["chunk_start"].iloc[-1]) < n
            # the penultimate chunk must NOT already cover the tail
            if len(g) > 1:
                assert int(g["chunk_end"].iloc[-2]) < n
        else:
            assert len(g) == 1


def test_chunk_short_and_empty_docs_get_one_chunk(spark):
    from kkbox_churn_prediction_spark.operators.chunking import chunk_documents

    df = spark.createDataFrame(
        [("a", 0), ("b", 1), ("c", 256), ("d", 257)], ["doc_id", "n_tokens"]
    )
    out = {
        r["doc_id"]: r["n"]
        for r in chunk_documents(df, "n_tokens", 256, 64)
        .groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    assert out == {"a": 1, "b": 1, "c": 1, "d": 2}


def test_chunk_disjoint_tiling(spark):
    from kkbox_churn_prediction_spark.operators.chunking import chunk_documents

    df = spark.createDataFrame([("x", 1000)], ["doc_id", "n_tokens"])
    out = (
        chunk_documents(df, "n_tokens", 256, 256)
        .orderBy("chunk_idx")
        .toPandas()
    )
    # ceil(1000/256)=4 disjoint tiles, last truncated to 1000
    assert list(out["chunk_start"]) == [0, 256, 512, 768]
    assert list(out["chunk_end"]) == [256, 512, 768, 1000]
    assert int(out["chunk_tokens"].sum()) == 1000


def test_chunk_partition_invariant(spark):
    from kkbox_churn_prediction_spark.operators.chunking import chunk_documents

    a = sorted(map(tuple, chunk_documents(_docs(spark, parts=1), "n_tokens", 128, 32).collect()))
    b = sorted(map(tuple, chunk_documents(_docs(spark, parts=13), "n_tokens", 128, 32).collect()))
    assert a == b


def test_rollup_matches_manual_groupbys(spark):
    from kkbox_churn_prediction_spark.operators.relational import rollup_counts

    df = spark.createDataFrame(
        [("u", "a", 1), ("u", "b", 2), ("u", None, 4), ("v", "a", 8), ("v", None, 16)],
        ["role", "tool", "m"],
    )
    out = rollup_counts(df, ["role", "tool"], "m").toPandas()
    # detail rows (gid=0): genuine NULL tool kept distinct from subtotal
    detail = out[out["gid"] == 0]
    assert len(detail) == 5
    assert int(detail[detail["tool"].isna()]["measure_sum"].sum()) == 20
    # per-role subtotals (gid=1: tool rolled away)
    sub = out[out["gid"] == 1].set_index("role")["measure_sum"]
    assert int(sub["u"]) == 7 and int(sub["v"]) == 24
    # grand total (gid=3)
    grand = out[out["gid"] == 3]
    assert len(grand) == 1 and int(grand["measure_sum"].iloc[0]) == 31
    # row counts: 5 detail + 2 role subtotals + 1 grand = 8
    assert len(out) == 8


def test_rollup_single_expand_agg_plan(spark):
    """ROLLUP plans as ONE Expand + hash aggregate — a single scan,
    not len(keys)+1 separate GROUP BY jobs unioned."""
    from kkbox_churn_prediction_spark.operators.relational import rollup_counts

    df = spark.createDataFrame([("u", "a", 1)], ["role", "tool", "m"])
    plan = rollup_counts(df, ["role", "tool"], "m")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Expand") >= 1
    assert "Union" not in plan


def test_cube_adds_the_non_prefix_grouping_set(spark):
    from kkbox_churn_prediction_spark.operators.relational import cube_counts

    df = spark.createDataFrame(
        [("u", "a", 1), ("u", "b", 2), ("u", None, 4), ("v", "a", 8), ("v", None, 16)],
        ["role", "tool", "m"],
    )
    out = cube_counts(df, ["role", "tool"], "m").toPandas()
    # the set ROLLUP can't express: role rolled away, tool kept (gid=2)
    per_tool = out[out["gid"] == 2]
    by_tool = {(None if t != t else t): int(s)  # NaN-safe key
               for t, s in zip(per_tool["tool"], per_tool["measure_sum"])}
    assert by_tool["a"] == 9 and by_tool["b"] == 2 and by_tool[None] == 20
    # cube = rollup sets (8 rows) + per-tool sets (3) = 11
    assert len(out) == 11
    # single Expand + agg, no unioned GROUP BY jobs
    plan = cube_counts(df, ["role", "tool"], "m")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Expand") >= 1 and "Union" not in plan


def test_set_op_entities_partitions_the_key_space(spark):
    from kkbox_churn_prediction_spark.operators.relational import set_op_entities

    left = spark.createDataFrame([("a",), ("a",), ("b",), ("c",)], ["k"])
    right = spark.createDataFrame([("b",), ("c",), ("c",), ("d",)], ["k"])
    out = {(r["set_op"], r["k"]) for r in set_op_entities(left, right, "k").collect()}
    assert out == {
        ("left_only", "a"), ("both", "b"), ("both", "c"), ("right_only", "d"),
    }
