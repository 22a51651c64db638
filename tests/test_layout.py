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


# ---------------------------------------------------------------------------
# Hilbert curve
# ---------------------------------------------------------------------------


def _xy2d_ref(order, x, y):
    """Pure-python xy2d (public Hilbert recurrence) as the oracle."""
    d = 0
    s = order // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = order - 1 - x
                y = order - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_bijection_and_unit_adjacency(spark):
    """The defining Hilbert property: d -> (x, y) is a bijection on the
    full grid and consecutive indices are ALWAYS grid-adjacent
    (Manhattan distance 1). Z-order fails the adjacency test at every
    power-of-two seam — this is exactly the locality Hilbert buys."""
    from postgis_gtfs_importer_spark.operators.layout import with_hilbert_index

    bits, n = 4, 16
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("x"),
        (F.col("id") / n).cast("long").alias("y"),
    )
    rows = with_hilbert_index(grid, "x", "y", bits=bits).collect()
    by_d = {r["hd"]: (r["x"], r["y"]) for r in rows}
    assert len(by_d) == n * n
    assert set(by_d) == set(range(n * n))
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = by_d[d], by_d[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, (d, by_d[d], by_d[d + 1])
    # and it matches the public reference recurrence value-for-value
    for r in rows:
        assert r["hd"] == _xy2d_ref(n, r["x"], r["y"])


def test_hilbert_column_form_matches_dataframe_form(spark):
    from postgis_gtfs_importer_spark.operators.layout import (
        hilbert_index,
        with_hilbert_index,
    )

    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
    )
    a = sorted(
        (r["x"], r["y"], r["hd"])
        for r in grid.withColumn(
            "hd", hilbert_index(F.col("x"), F.col("y"), bits=6)
        ).collect()
    )
    b = sorted(
        (r["x"], r["y"], r["hd"])
        for r in with_hilbert_index(grid, "x", "y", bits=6).collect()
    )
    assert a == b


def test_hilbert_buckets_tighter_than_zorder(spark):
    """For equal bucket counts on the full 256x256 grid, the summed
    per-bucket bounding-box area of Hilbert buckets must not exceed
    Z-order's — connected curve segments have no seam jumps."""
    from postgis_gtfs_importer_spark.operators.layout import with_hilbert_index

    grid = spark.range(256 * 256).select(
        (F.col("id") % 256).alias("x"),
        (F.col("id") / 256).cast("long").alias("y"),
    )

    def bucket_area(df, idx_col):
        spans = (
            df.groupBy(F.shiftright(idx_col, 8).alias("b"))
            .agg(
                ((F.max("x") - F.min("x") + 1)
                 * (F.max("y") - F.min("y") + 1)).alias("area")
            )
            .agg(F.sum("area").alias("s"))
            .collect()[0]["s"]
        )
        return spans

    h = bucket_area(
        with_hilbert_index(grid, "x", "y", bits=8), F.col("hd")
    )
    z = bucket_area(
        grid.withColumn(
            "z", interleave_bits([F.col("x"), F.col("y")], bits=8)
        ),
        F.col("z"),
    )
    assert h <= z, (h, z)
