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
        # T1 stop_sequence 20 delayed 120s; EXACT resend (same content
        # incl. ts) suppressed by the content-keyed dedup
        ("T1", 20, 120, base, 1),
        ("T1", 20, 120, base, 2),
        # REVISION 5 min later: must flow through (first-wins keyed on
        # (trip, stop) would freeze the stale 120s for the whole
        # watermark horizon)
        ("T1", 20, 600, base + dt.timedelta(minutes=5), 4),
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
        assert r.delay_sec in (120, 600)
        assert (r.t_departure_rt - r.t_departure).total_seconds() == r.delay_sec
    # exact resend deduped: per (trip, stop, date) exactly the original
    # + the revision survive
    from collections import Counter

    per_key = Counter((r.trip_id, r.stop_sequence, r.date) for r in rows)
    assert set(per_key.values()) == {2}
    # latest-wins is the SERVING policy: winner per key by (ts) must be
    # the 600s revision for every service date
    latest = {}
    for r in rows:
        k = (r.trip_id, r.stop_sequence, r.date)
        if k not in latest or r.ts > latest[k].ts:
            latest[k] = r
    assert all(r.delay_sec == 600 for r in latest.values())
