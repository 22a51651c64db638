"""Stream-static join: GTFS-Realtime-shaped delays over the static
timetable (arrivals_departures from the fixture feed)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

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


@pytest.fixture(scope="module")
def static_feed(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("feed_rt2")
    write_feed_dir(str(d))
    return GF.read_feed(spark, str(d))


def test_vehicle_positions_enriched(spark, static_feed, tmp_path):
    base = dt.datetime(2024, 1, 1, 8, 0, 0)
    fixes = [
        # V1 on T1: exact resend (identical content+ts) suppressed
        ("V1", "T1", 52.50, 13.40, 90.0, 8.3, 10, "IN_TRANSIT_TO", base, 1),
        ("V1", "T1", 52.50, 13.40, 90.0, 8.3, 10, "IN_TRANSIT_TO", base, 2),
        # V1 MOVED 1 min later: must flow through
        ("V1", "T1", 52.51, 13.41, 91.0, 8.0, 10, "STOPPED_AT",
         base + dt.timedelta(minutes=1), 3),
        # V1 turned IN PLACE 2 min later: identical position/status/ts
        # pattern except bearing — bearing is part of the fix content,
        # so this must flow through (ADVICE r10: key includes bearing
        # and speed_mps)
        ("V1", "T1", 52.51, 13.41, 135.0, 8.0, 10, "STOPPED_AT",
         base + dt.timedelta(minutes=2), 4),
        ("V1", "T1", 52.51, 13.41, 135.0, 8.0, 10, "STOPPED_AT",
         base + dt.timedelta(minutes=2), 5),  # and its resend is not
        # vehicle on a trip the snapshot doesn't know: dropped by the
        # inner enrichment join
        ("V9", "GHOST", 0.0, 0.0, 0.0, 0.0, 1, "STOPPED_AT", base, 6),
    ]
    src = str(tmp_path / "vp")
    spark.createDataFrame(
        fixes, RT.VEHICLE_POSITION_SCHEMA
    ).coalesce(1).write.parquet(src)

    stream = RT.stream_vehicle_positions(spark, src)
    joined = RT.vehicle_positions_enriched(
        stream, static_feed["trips"], static_feed["routes"]
    )
    run_to_memory(joined, "rt_vehicles")

    rows = spark.table("rt_vehicles").collect()
    assert {r.vehicle_id for r in rows} == {"V1"}  # GHOST dropped
    # resends suppressed; movement AND the bearing-only turn kept
    assert len(rows) == 3
    assert sorted(r.bearing for r in rows) == [90.0, 91.0, 135.0]
    assert {r.current_status for r in rows} == {
        "IN_TRANSIT_TO", "STOPPED_AT"
    }
    for r in rows:
        assert r.route_id == "R1"
        assert r.route_short_name is not None
        assert r.current_status in RT.VEHICLE_STATUSES


def test_alerts_for_departures_entity_and_period(spark, static_ad, tmp_path):
    ad = static_ad
    # pick a real scheduled departure to anchor the active period
    anchor = ad.orderBy("t_departure").limit(1).collect()[0]
    t0 = anchor.t_departure
    far_future = t0 + dt.timedelta(days=3650)
    stamp = dt.datetime(2024, 1, 1, 0, 0, 0)
    alerts = [
        # route-scoped, open-ended period (NULL active_end): matches
        # every R1 departure from t0 on
        ("A1", "R1", None, t0, None, "CONSTRUCTION", "DETOUR",
         "WARNING", "R1 detour", stamp, 1),
        # exact resend suppressed
        ("A1", "R1", None, t0, None, "CONSTRUCTION", "DETOUR",
         "WARNING", "R1 detour", stamp, 2),
        # stop-scoped, window that CLOSES before any departure:
        # matches nothing
        ("A2", None, anchor.stop_id, t0 - dt.timedelta(days=2),
         t0 - dt.timedelta(days=1), "WEATHER", "NO_SERVICE",
         "SEVERE", "closed", stamp, 3),
        # route+stop-scoped entity: narrower scope — only the anchor
        # stop's departures on R1
        ("A3", "R1", anchor.stop_id, t0, far_future, "ACCIDENT",
         "SIGNIFICANT_DELAYS", "WARNING", "slow", stamp, 4),
    ]
    src = str(tmp_path / "alerts")
    spark.createDataFrame(alerts, RT.ALERT_SCHEMA).coalesce(1).write.parquet(
        src
    )

    stream = RT.stream_alerts(spark, src)
    joined = RT.alerts_for_departures(stream, ad)
    run_to_memory(joined, "rt_alerts")

    rows = spark.table("rt_alerts").collect()
    by_alert = {}
    for r in rows:
        by_alert.setdefault(r.alert_id, []).append(r)
    # A2's window closed before the first departure
    assert set(by_alert) == {"A1", "A3"}
    # A1 (route-scoped, open-ended) hits every R1 departure >= t0
    expected_a1 = ad.filter(
        (F.col("route_id") == "R1") & (F.col("t_departure") >= t0)
    ).count()
    assert len(by_alert["A1"]) == expected_a1
    assert all(r.route_id == "R1" for r in by_alert["A1"])
    # A3 (route+stop entity) only hits the anchor stop on R1
    assert all(
        r.stop_id == anchor.stop_id and r.route_id == "R1"
        for r in by_alert["A3"]
    )
    assert len(by_alert["A3"]) < expected_a1


def test_cancellation_tombstones_and_board(spark, static_ad, tmp_path):
    """VERDICT r10 item 4 'done' bar: a CANCELED trip's departures
    vanish from the board, a SKIPPED stop's single row vanishes,
    everything else flows — via the tombstone stream + batch-side
    anti-join subtraction."""
    ad = static_ad
    # pick two real trips with scheduled departures
    trips = [r.trip_id for r in ad.select("trip_id").distinct().orderBy("trip_id").collect()]
    assert len(trips) >= 2
    t_cancel, t_skip = trips[0], trips[1]
    skip_anchor = (
        ad.filter(F.col("trip_id") == t_skip)
        .orderBy("date", "stop_sequence")
        .limit(1)
        .collect()[0]
    )
    stamp = dt.datetime(2024, 1, 1, 0, 0, 0)
    updates = [
        # whole trip canceled, all service dates (start_date NULL)
        (t_cancel, None, None, "CANCELED", None, None, None, None,
         stamp, 1),
        # exact resend suppressed
        (t_cancel, None, None, "CANCELED", None, None, None, None,
         stamp, 2),
        # one stop skipped on t_skip (all dates)
        (t_skip, skip_anchor.stop_sequence, None, "SCHEDULED", "SKIPPED",
         None, None, None, stamp, 3),
        # a plain delay revision: NOT a tombstone
        (t_skip, skip_anchor.stop_sequence, 120, "SCHEDULED", "SCHEDULED",
         None, None, None, stamp, 4),
        # canceled unknown trip: no schedule row, nothing to retract
        ("GHOST", None, None, "CANCELED", None, None, None, None,
         stamp, 5),
    ]
    src = str(tmp_path / "tu_full")
    spark.createDataFrame(
        updates, RT.TRIP_UPDATE_FULL_SCHEMA
    ).coalesce(1).write.parquet(src)

    stream = RT.stream_trip_updates_full(spark, src)
    tombs = RT.cancellation_tombstones(stream, ad)
    run_to_memory(tombs, "rt_tombstones")
    trows = spark.table("rt_tombstones").collect()

    n_cancel_sched = ad.filter(F.col("trip_id") == t_cancel).count()
    cancel_tombs = [r for r in trows if r.reason == "CANCELED"]
    skip_tombs = [r for r in trows if r.reason == "SKIPPED"]
    # every scheduled row of the canceled trip tombstoned exactly once
    # (resend suppressed upstream)
    assert len(cancel_tombs) == n_cancel_sched
    assert {r.trip_id for r in cancel_tombs} == {t_cancel}
    # the skipped stop: one tombstone per service date of that stop row
    n_skip_dates = ad.filter(
        (F.col("trip_id") == t_skip)
        & (F.col("stop_sequence") == skip_anchor.stop_sequence)
    ).count()
    assert len(skip_tombs) == n_skip_dates
    assert {(r.trip_id, r.stop_sequence) for r in skip_tombs} == {
        (t_skip, skip_anchor.stop_sequence)
    }

    # the board: schedule minus exactly those rows
    tomb_df = spark.table("rt_tombstones")
    board = RT.apply_departure_tombstones(ad, tomb_df)
    n_all = ad.count()
    assert board.count() == n_all - n_cancel_sched - n_skip_dates
    assert board.filter(F.col("trip_id") == t_cancel).count() == 0
    assert board.filter(
        (F.col("trip_id") == t_skip)
        & (F.col("stop_sequence") == skip_anchor.stop_sequence)
    ).count() == 0
    # everything else flows: the skip trip's OTHER stops intact
    assert (
        board.filter(F.col("trip_id") == t_skip).count()
        == ad.filter(F.col("trip_id") == t_skip).count() - n_skip_dates
    )
    # idempotent under duplicate tombstones
    board2 = RT.apply_departure_tombstones(
        ad, tomb_df.unionByName(tomb_df)
    )
    assert board2.count() == board.count()


def test_cancellation_start_date_scopes_to_one_service_date(
    spark, static_ad, tmp_path
):
    """A cancellation carrying start_date retracts ONLY that service
    date's departures (narrower scope, alerts discipline)."""
    ad = static_ad
    t0 = ad.orderBy("trip_id", "date").limit(1).collect()[0]
    dates = [
        r.date
        for r in ad.filter(F.col("trip_id") == t0.trip_id)
        .select("date").distinct().orderBy("date").collect()
    ]
    if len(dates) < 2:
        pytest.skip("fixture trip has a single service date")
    target = dates[0]
    stamp = dt.datetime(2024, 1, 1, 0, 0, 0)
    updates = [
        (t0.trip_id, None, None, "CANCELED", None, target, None, None,
         stamp, 1),
    ]
    src = str(tmp_path / "tu_dated")
    spark.createDataFrame(
        updates, RT.TRIP_UPDATE_FULL_SCHEMA
    ).coalesce(1).write.parquet(src)
    tombs = RT.cancellation_tombstones(
        RT.stream_trip_updates_full(spark, src), ad
    )
    run_to_memory(tombs, "rt_tombstones_dated")
    trows = spark.table("rt_tombstones_dated").collect()
    assert trows and {r.date for r in trows} == {target}
    assert len(trows) == ad.filter(
        (F.col("trip_id") == t0.trip_id) & (F.col("date") == target)
    ).count()


def test_added_trip_rows_and_full_board(spark, static_ad, tmp_path):
    """The third TripDescriptor relationship: an ADDED trip's
    boardable rows (absolute times, no schedule join) appear on the
    full board; its SKIPPED stop does not; the board composes
    schedule - tombstones + added in one pass."""
    ad = static_ad
    t_cancel = ad.select("trip_id").distinct().orderBy("trip_id").limit(1).collect()[0].trip_id
    stamp = dt.datetime(2024, 1, 1, 0, 0, 0)
    dep1 = dt.datetime(2024, 1, 2, 9, 0, 0)
    dep2 = dt.datetime(2024, 1, 2, 9, 10, 0)
    svc = dt.date(2024, 1, 2)
    updates = [
        # an ADDED trip with two boardable stops + one skipped stop
        ("EXTRA1", 1, None, "ADDED", None, svc, "S1", dep1, stamp, 1),
        ("EXTRA1", 2, None, "ADDED", "SKIPPED", svc, "S2",
         dep2, stamp, 2),
        ("EXTRA1", 3, None, "ADDED", None, svc, "S3", dep2, stamp, 3),
        # resend of a boardable row: suppressed upstream
        ("EXTRA1", 1, None, "ADDED", None, svc, "S1", dep1, stamp, 4),
        # an ADDED row missing its absolute time: not boardable
        ("EXTRA2", 1, None, "ADDED", None, svc, "S9", None, stamp, 5),
        # and a cancellation, to prove the three-way composition
        (t_cancel, None, None, "CANCELED", None, None, None, None,
         stamp, 6),
    ]
    src = str(tmp_path / "tu_added")
    spark.createDataFrame(
        updates, RT.TRIP_UPDATE_FULL_SCHEMA
    ).coalesce(1).write.parquet(src)

    stream = RT.stream_trip_updates_full(spark, src)
    run_to_memory(RT.added_trip_departures(stream), "rt_added")
    run_to_memory(RT.cancellation_tombstones(stream, ad), "rt_tombs_b")
    added = spark.table("rt_added")
    arows = added.collect()
    # stops 1 and 3 boardable; the SKIPPED stop 2, the time-less
    # EXTRA2 row, and the resend are not
    assert sorted((r.trip_id, r.stop_sequence) for r in arows) == [
        ("EXTRA1", 1), ("EXTRA1", 3)
    ]
    assert all(r.reason == "ADDED" and r.date == svc for r in arows)

    board = RT.full_departures_board(
        ad, spark.table("rt_tombs_b"), added
    )
    n_cancel = ad.filter(F.col("trip_id") == t_cancel).count()
    assert board.count() == ad.count() - n_cancel + 2
    assert board.filter(F.col("trip_id") == t_cancel).count() == 0
    extra = board.filter(F.col("trip_id") == "EXTRA1").collect()
    assert sorted(r.stop_sequence for r in extra) == [1, 3]
    assert all(r.source == "ADDED" and r.route_id is None for r in extra)
    # schedule rows keep their metadata and say so
    assert board.filter(
        (F.col("source") == "SCHEDULE") & F.col("route_id").isNotNull()
    ).count() == ad.count() - n_cancel
    # idempotent under duplicated added rows
    board2 = RT.full_departures_board(
        ad, spark.table("rt_tombs_b"), added.unionByName(added)
    )
    assert board2.count() == board.count()
