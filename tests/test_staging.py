"""Staging sink (C17 materialization barrier): round-trip + compression."""

from __future__ import annotations

import os

from postgis_gtfs_importer_spark.sinks.staging import (
    read_staged,
    stage_tables,
    stage_tables_bucketed,
)


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


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """The SCALE.md claim, executed: same-key same-count bucketed tables
    join with zero Exchange in the physical plan."""
    st = spark.createDataFrame(
        [(f"T{i % 20}", i, f"S{i % 7}") for i in range(500)],
        "trip_id string, stop_sequence int, stop_id string",
    )
    trips = spark.createDataFrame(
        [(f"T{i}", f"R{i % 3}") for i in range(20)], "trip_id string, route_id string"
    )
    stage_tables_bucketed(
        spark,
        {"stop_times": st, "trips": trips},
        database="staging_test",
        location=str(tmp_path / "wh"),
        bucket_specs={"stop_times": ("trip_id", 4), "trips": ("trip_id", 4)},
    )
    try:
        a = spark.table("staging_test.stop_times")
        b = spark.table("staging_test.trips")
        # disable broadcast so the join would otherwise be a shuffled SMJ
        with_conf = spark.conf
        old = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = a.join(b, "trip_id")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert joined.count() == 500
        finally:
            with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP DATABASE IF EXISTS staging_test CASCADE")
