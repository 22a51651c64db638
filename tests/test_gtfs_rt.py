"""Stream-static join: GTFS-Realtime-shaped delays over the static
timetable (arrivals_departures from the fixture feed)."""

from __future__ import annotations

import datetime as dt

import pytest

from postgis_gtfs_importer_spark.operators.derivations import arrivals_departures
from postgis_gtfs_importer_spark.sources import gtfs_feed as GF
from postgis_gtfs_importer_spark.streaming import gtfs_rt as RT
from postgis_gtfs_importer_spark.streaming.events import run_to_memory

from .gtfs_fixtures import write_feed_dir


@pytest.fixture(scope="module")
def static_ad(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("feed_rt")
    write_feed_dir(str(d))
    return arrivals_departures(GF.read_feed(spark, str(d)))


def test_realtime_departures_stream_static_join(spark, static_ad, tmp_path):
    base = dt.datetime(2024, 1, 1, 8, 0, 0)
    updates = [
        # T1 stop_sequence 20 delayed 120s; duplicate update superseded by dedup
        ("T1", 20, 120, base, 1),
        ("T1", 20, 120, base + dt.timedelta(seconds=30), 2),
        # unknown trip: dropped by the inner join
        ("GHOST", 1, 999, base, 3),
    ]
    src = str(tmp_path / "updates")
    spark.createDataFrame(updates, RT.TRIP_UPDATE_SCHEMA).coalesce(1).write.parquet(src)

    stream = RT.stream_trip_updates(spark, src)
    joined = RT.realtime_departures(stream, static_ad)
    run_to_memory(joined, "rt_departures")

    rows = spark.table("rt_departures").collect()
    assert rows, "no realtime departures emitted"
    assert {r.trip_id for r in rows} == {"T1"}  # GHOST dropped
    for r in rows:
        assert r.delay_sec == 120
        assert (r.t_departure_rt - r.t_departure).total_seconds() == 120.0
    # one service date per scheduled day the trip runs; dedup kept ONE
    # update per (trip, stop_sequence)
    keys = [(r.trip_id, r.stop_sequence, r.date) for r in rows]
    assert len(keys) == len(set(keys))
