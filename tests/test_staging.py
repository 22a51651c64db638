"""Staging sink (C17 materialization barrier): round-trip + compression."""

from __future__ import annotations

import os

from postgis_gtfs_importer_spark.sinks.staging import read_staged, stage_tables


def test_stage_and_read_roundtrip(spark, tmp_path):
    tables = {
        "a": spark.range(100).toDF("id"),
        "b": spark.createDataFrame([(1, "x"), (2, "y")], "k int, v string"),
    }
    staged = stage_tables(tables, str(tmp_path / "staging"))
    assert set(staged) == {"a", "b"}
    back = read_staged(spark, staged)
    assert back["a"].count() == 100
    assert sorted((r.k, r.v) for r in back["b"].collect()) == [(1, "x"), (2, "y")]
    # zstd parquet on disk (the reference's zstd buffer analog)
    files = os.listdir(staged["a"])
    assert any(f.endswith(".zstd.parquet") or f.endswith(".parquet") for f in files)
