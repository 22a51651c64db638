"""Physical-plan shape assertions for the flagship paths — the
properties that keep the engine viable at 100 TB, pinned so a regression
shows up as a test failure rather than a silent slow-down:

  * C11 arrivals_departures: every join on the fact lineage is a
    broadcast hash join — no SortMergeJoin anywhere, i.e. the expanded
    view is a map-side pass over stop_times.
  * departures_at over parquet-backed stop_times: the departure-time
    window and stop filters reach the scan (PushedFilters), so the
    point query reads a slice, not the feed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from postgis_gtfs_importer_spark.operators.derivations import (
    arrivals_departures,
    departures_at,
)
from postgis_gtfs_importer_spark.plans.queries import _synthetic_gtfs

SF_DIR = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    df.count()  # let AQE finalize
    return df._jdf.queryExecution().executedPlan().toString()


def test_arrivals_departures_all_joins_broadcast(spark):
    tables = _synthetic_gtfs(spark, SF_DIR)
    plan = _executed_plan(arrivals_departures(tables))
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan


def test_departures_at_filters_reach_parquet_scan(spark, tmp_path):
    tables = _synthetic_gtfs(spark, SF_DIR)
    pq = str(tmp_path / "stop_times")
    tables["stop_times"].write.parquet(pq)
    tables["stop_times"] = spark.read.parquet(pq)
    df = departures_at(
        tables, stop_id=7, date="2024-03-31", t1_sec=5400, t2_sec=12600
    )
    plan = _executed_plan(df)
    scan = plan[plan.index("PushedFilters"):][:400]
    assert "IsNotNull(departure_time)" in scan
    assert "GreaterThanOrEqual(departure_time,5400)" in scan
    # Spark truncates long pushed-filter lists in toString — match the
    # visible prefix of the upper bound
    assert "LessThan(departure_time,1" in scan
    assert "SortMergeJoin" not in plan


def test_departures_at_prunes_columns(spark, tmp_path):
    """Column pruning: the stop_times scan must not read columns the
    query never touches (ReadSchema stays narrow)."""
    tables = _synthetic_gtfs(spark, SF_DIR)
    wide = tables["stop_times"].withColumn(
        "giant_payload", F.repeat(F.lit("x"), 100)
    )
    pq = str(tmp_path / "stop_times_wide")
    wide.write.parquet(pq)
    tables["stop_times"] = spark.read.parquet(pq)
    df = departures_at(
        tables, stop_id=7, date="2024-03-31", t1_sec=5400, t2_sec=12600
    ).select("trip_id", "departure_time")
    plan = _executed_plan(df)
    read_schema = plan[plan.index("ReadSchema"):][:300]
    assert "giant_payload" not in read_schema
