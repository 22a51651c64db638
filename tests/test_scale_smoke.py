"""Volume smoke of the C11 spine: a synthetic feed two orders of magnitude
above the fixture (1k trips × 15 stops × ~90 service days ≈ 1.3M expanded
stop events) through arrivals_departures — verifying the derivation
holds its plan shape (dimensions broadcast, one fact shuffle) and its
cardinality arithmetic at volume, not just on 11 fixture rows."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from postgis_gtfs_importer_spark.operators.derivations import (
    arrivals_departures,
    service_days,
)


@pytest.fixture(scope="module")
def big_feed(spark):
    n_trips, n_stops_per_trip = 1000, 15
    trips = spark.range(n_trips).select(
        F.concat(F.lit("T"), F.col("id")).alias("trip_id"),
        F.concat(F.lit("R"), (F.col("id") % 20)).alias("route_id"),
        F.when(F.col("id") % 2 == 0, "WD").otherwise("WE").alias("service_id"),
        F.lit(None).cast("string").alias("trip_headsign"),
        (F.col("id") % 2).cast("int").alias("direction_id"),
    )
    st = (
        spark.range(n_trips)
        .select(
            F.concat(F.lit("T"), F.col("id")).alias("trip_id"),
            F.col("id").alias("tid"),
            F.explode(F.sequence(F.lit(1), F.lit(n_stops_per_trip))).alias(
                "stop_sequence"
            ),
        )
        .select(
            "trip_id",
            "stop_sequence",
            F.concat(F.lit("S"), (F.col("tid") * 7 + F.col("stop_sequence")) % 500)
            .alias("stop_id"),
            (F.lit(5 * 3600) + F.col("tid") % 1200 * 60
             + F.col("stop_sequence") * 120).cast("int").alias("arrival_time"),
            (F.lit(5 * 3600) + F.col("tid") % 1200 * 60
             + F.col("stop_sequence") * 120 + 30).cast("int").alias("departure_time"),
        )
    )
    routes = spark.range(20).select(
        F.concat(F.lit("R"), F.col("id")).alias("route_id"),
        F.lit("A1").alias("agency_id"),
        F.concat(F.lit("Line "), F.col("id")).alias("route_short_name"),
        F.lit(3).cast("int").alias("route_type"),
    )
    agency = spark.createDataFrame(
        [("A1", "Metro", "Europe/Berlin")],
        "agency_id string, agency_name string, agency_timezone string",
    )
    cal = spark.createDataFrame(
        [
            ("WD", 1, 1, 1, 1, 1, 0, 0, dt.date(2024, 1, 1), dt.date(2024, 6, 30)),
            ("WE", 0, 0, 0, 0, 0, 1, 1, dt.date(2024, 1, 1), dt.date(2024, 6, 30)),
        ],
        "service_id string, monday int, tuesday int, wednesday int, thursday int,"
        " friday int, saturday int, sunday int, start_date date, end_date date",
    )
    return {
        "trips": trips, "stop_times": st, "routes": routes,
        "agency": agency, "calendar": cal,
    }


def test_arrivals_departures_at_volume(spark, big_feed):
    svc_days = {r.service_id: r.n for r in (
        service_days(big_feed).groupBy("service_id").agg(F.count("*").alias("n"))
    ).collect()}
    ad = arrivals_departures(big_feed)
    # cardinality = Σ trips(service) × stops_per_trip × days(service)
    expected = 500 * 15 * svc_days["WD"] + 500 * 15 * svc_days["WE"]
    assert ad.count() == expected
    assert expected > 1_000_000  # meaningfully above fixture scale
    plan = ad._jdf.queryExecution().executedPlan().toString()
    # the dimension joins must be broadcast — the fact side shuffles only
    # where semantics require
    assert "BroadcastHashJoin" in plan
    # spot-check one absolute timestamp (Berlin winter, UTC+1)
    row = (
        ad.filter((F.col("trip_id") == "T0") & (F.col("stop_sequence") == 1))
        .orderBy("date").first()
    )
    assert row.t_arrival == dt.datetime(2024, 1, 1, 4, 2)  # 05:02 local


def test_cap_per_stratum_plans_window_group_limit(spark):
    """The per-domain cap must plan as WindowGroupLimit (map-side partial
    top-k per stratum before the shuffle) — the property that keeps a
    hot domain from shipping its full row set to one reducer. A Spark
    upgrade or a formulation change that silently loses the rewrite
    shows up here, not at 100 TB."""
    from postgis_gtfs_importer_spark.operators.curation import cap_per_stratum

    df = spark.range(1000).selectExpr(
        "id AS doc_id", "CAST(id % 7 AS STRING) AS source", "id % 13 AS q"
    )
    out = cap_per_stratum(df, "source", "q", "doc_id", cap=3)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:2000]
