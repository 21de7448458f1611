"""Z-order layout: Morton correctness, locality, balanced layout."""

from __future__ import annotations

from pyspark.sql import functions as F


def _morton_ref(x: int, y: int) -> int:
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_matches_bitwise_reference(spark):
    from kkbox_churn_prediction_spark.operators.layout import zvalue16

    pts = [(x, y) for x in (0, 1, 2, 255, 4095, 65535) for y in (0, 1, 3, 64, 65535)]
    df = spark.createDataFrame(pts, ["x", "y"])
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zvalue16(F.col("x"), F.col("y")).alias("z")).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _morton_ref(x, y), (x, y)


def test_zvalue_clamps_out_of_range(spark):
    from kkbox_churn_prediction_spark.operators.layout import zvalue16

    df = spark.createDataFrame([(70000, -5)], ["x", "y"])
    z = df.select(zvalue16(F.col("x"), F.col("y")).alias("z")).first()["z"]
    assert z == _morton_ref(65535, 0)


def test_zorder_layout_improves_box_locality(spark):
    """Chunks of the z-sorted order touched by a small box query are
    fewer than under row-major (x-major) sort — the data-skipping
    effect file min/max stats would exploit."""
    from kkbox_churn_prediction_spark.operators.layout import zvalue16

    n = 64  # 64x64 grid
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    rows = grid.select("x", "y", zvalue16(F.col("x"), F.col("y")).alias("z")).collect()

    def chunks_touched(order_key, chunk=64):
        ordered = sorted(rows, key=order_key)
        touched = set()
        for i, r in enumerate(ordered):
            if 8 <= r["x"] < 16 and 8 <= r["y"] < 16:  # 8x8 box
                touched.add(i // chunk)
        return len(touched)

    z_touched = chunks_touched(lambda r: r["z"])
    rowmajor_touched = chunks_touched(lambda r: (r["x"], r["y"]))
    assert z_touched < rowmajor_touched
    # 8x8 box at an aligned corner is a handful of z-runs, not 8 stripes
    assert z_touched <= 4


def test_zorder_layout_partitions_sorted(spark):
    from kkbox_churn_prediction_spark.operators.layout import zorder_layout

    df = spark.range(1000).select(
        (F.col("id") % 37).alias("x"), (F.col("id") % 53).alias("y")
    )
    out = zorder_layout(df, "x", "y", partitions=4)

    def check(it):
        vals = [r["zval"] for r in it]
        assert vals == sorted(vals)
        return iter([len(vals)])

    sizes = out.rdd.mapPartitions(lambda it: check(it)).collect()
    assert sum(sizes) == 1000
    # range partitioner balances (no empty + no mega partition)
    assert max(sizes) < 1000
