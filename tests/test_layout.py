"""Z-order layout: the z-value math and — the actual point — that a
z-ordered parquet table skips most files for a 2-D box predicate while a
1-D-sorted layout cannot skip on the second dimension."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgis_gtfs_importer_spark.operators.layout import (
    interleave_bits,
    zorder_layout,
)


def test_interleave_bits_known_values(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (3, 5)], "x long, y long"
    )
    out = {
        (r.x, r.y): r.z
        for r in df.withColumn(
            "z", interleave_bits([F.col("x"), F.col("y")], bits=4)
        ).collect()
    }
    # x bits at even positions, y bits at odd
    assert out[(0, 0)] == 0
    assert out[(1, 0)] == 1
    assert out[(0, 1)] == 2
    assert out[(1, 1)] == 3
    # x=3 (0b11): bits 0,1 -> positions 0,2 = 0b101 (5)
    # y=5 (0b101): bits 0,2 -> positions 1,5 = 0b100010 (34)
    assert out[(3, 5)] == 5 | 34


def _files_read(spark, path, predicate):
    df = spark.read.parquet(path).filter(predicate)
    files = df.select(
        F.input_file_name().alias("f")
    ).distinct().count()
    return files


def test_zorder_prunes_2d_box_scan(spark, tmp_path):
    # 256x256 grid of points, one row each
    grid = spark.range(256 * 256).select(
        (F.col("id") % 256).alias("x"),
        (F.col("id") / 256).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    n_files = 64
    zorder_layout(grid, ["x", "y"], bits=8, n_files=n_files).write.parquet(
        zpath
    )
    # 1-D layout: range-partition + sort on x only
    (
        grid.repartitionByRange(n_files, "x")
        .sortWithinPartitions("x")
        .write.parquet(lpath)
    )

    box = (
        (F.col("x") >= 100) & (F.col("x") < 116)
        & (F.col("y") >= 40) & (F.col("y") < 56)
    )
    # correctness first: both layouts return the same 16x16 box
    assert spark.read.parquet(zpath).filter(box).count() == 256
    assert spark.read.parquet(lpath).filter(box).count() == 256

    z_files = _files_read(spark, zpath, box)
    l_files = _files_read(spark, lpath, box)
    # z-order: the box touches a handful of z-intervals; linear-x: every
    # file covering x in [100,116) contains ALL y values, but row-group
    # stats on x still prune the x range — the y dimension is what linear
    # cannot prune. The z layout must touch far fewer files than the
    # x-range width implies and strictly fewer than the linear layout.
    assert z_files < l_files, (z_files, l_files)
    assert z_files <= n_files // 8, f"z-order touched {z_files}/{n_files} files"
