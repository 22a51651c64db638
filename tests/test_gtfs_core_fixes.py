"""Regression pins for the GTFS-core adversarial-review findings
(derivations, cleaning, catalog): each test reproduces the feed shape
that crashed, silently corrupted, or destroyed valid data before the
fix."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from postgis_gtfs_importer_spark.operators import cleaning as CL
from postgis_gtfs_importer_spark.operators import derivations as DV
from postgis_gtfs_importer_spark.sources import gtfs_feed as GF

from .gtfs_fixtures import write_feed_dir


@pytest.fixture(scope="module")
def feed(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("feed-fixes")
    write_feed_dir(str(d))
    return GF.read_feed(spark, str(d))


def test_frequencies_degenerate_window_skipped_not_crash(spark, feed):
    """start_time >= end_time must contribute zero departures, not abort
    the job with 'Illegal sequence boundaries'."""
    fr = spark.createDataFrame(
        [
            ("T1", 28800, 28800, 600, 0),  # start == end: zero-length
            ("T2", 30000, 29000, 600, 0),  # start > end: inverted
            ("T3", 28800, 30000, 600, 0),  # normal: 2 departures
        ],
        "trip_id string, start_time int, end_time int,"
        " headway_secs int, exact_times int",
    )
    t = dict(feed)
    t["frequencies"] = fr
    out = DV.frequencies_expanded(t)
    got = {
        r.trip_id: r.n
        for r in out.groupBy("trip_id").agg(F.count("*").alias("n")).collect()
    }
    assert got == {"T3": 2}


def test_single_agency_feed_omitted_agency_id_gets_real_timezone(spark, feed):
    """GTFS allows routes.agency_id omitted when agency.txt has exactly
    one agency; the absolute timestamps must then use that agency's
    timezone, not silently fall back to UTC."""
    t = dict(feed)
    t["agency"] = t["agency"].filter(F.col("agency_id") == "A1")
    t["routes"] = t["routes"].withColumn(
        "agency_id", F.lit(None).cast("string")
    )
    ad = DV.arrivals_departures(t)
    row = (
        ad.filter(
            (F.col("trip_id") == "T1") & (F.col("stop_sequence") == 10)
        )
        .select("date", "arrival_time", "t_arrival", "agency_name")
        .orderBy("date")
        .limit(1)
        .collect()[0]
    )
    # The absolute instant must be shifted from the naive-UTC reading by
    # the agency's Europe/Berlin offset on that date (UTC+1 or UTC+2)
    from datetime import datetime, timedelta, timezone
    from zoneinfo import ZoneInfo

    wall = datetime(
        row.date.year, row.date.month, row.date.day, tzinfo=timezone.utc
    ) + timedelta(seconds=int(row.arrival_time))
    local_naive = datetime(
        row.date.year, row.date.month, row.date.day
    ) + timedelta(seconds=int(row.arrival_time))
    expected_off = ZoneInfo("Europe/Berlin").utcoffset(local_naive)
    got = row.t_arrival.replace(tzinfo=timezone.utc)
    assert (wall - got) == expected_off and expected_off.total_seconds() != 0
    assert row.agency_name == "Metro"


def test_multi_agency_null_agency_id_stays_null(spark, feed):
    """With MORE than one agency an omitted agency_id is genuinely
    unresolvable — no silent single-agency fill."""
    t = dict(feed)
    t["routes"] = t["routes"].withColumn(
        "agency_id", F.lit(None).cast("string")
    )
    ad = DV.arrivals_departures(t)
    assert ad.filter(F.col("agency_name").isNotNull()).count() == 0


def test_empty_feed_info_does_not_wipe_tables(spark, feed):
    """A header-only feed_info.txt (0 rows) used to crossJoin every
    translatable table against an empty relation — tables vanished."""
    t = dict(feed)
    t["feed_info"] = t["feed_info"].limit(0)
    out = DV.apply_feed_translations(t, "en")
    assert out["stops"].count() == feed["stops"].count()
    assert out["routes"].count() == feed["routes"].count()


def test_fuzzy_stop_pairs_berlin_east_west_pair_found(spark):
    """Two stops ~90 m apart east-west at lat 52.5: the unscaled lon
    cell is only radius*cos(52.5) = 61 m wide, so the pair could land 2
    cells apart and miss the 3x3 probe. cos-scaled cells must find it."""
    rows = []
    # a dense row of stops along a parallel so some pair straddles an
    # unscaled cell boundary regardless of phase
    for i in range(40):
        rows.append((f"P{i}", f"Stop {i}", 52.5, 13.30 + i * 0.00120))
        rows.append((f"Q{i}", f"Stop {i}", 52.5, 13.30 + i * 0.00120 + 0.00125))
    stops = spark.createDataFrame(
        rows, "stop_id string, stop_name string, stop_lat double, stop_lon double"
    )
    out = CL.fuzzy_stop_pairs({"stops": stops}, radius_m=100.0, name_jaccard=0.5)
    got = {(r.id_a, r.id_b) for r in out.collect()}
    # every (P_i, Q_i) twin is ~85 m apart with identical names: ALL must
    # be found (false negatives were the bug)
    for i in range(40):
        pair = tuple(sorted((f"P{i}", f"Q{i}")))
        assert pair in got, f"missing in-radius pair {pair}"


def test_delete_orphans_keeps_live_station_entrances_and_pathways(spark, feed):
    """Entrances (location_type 2) never appear in stop_times but belong
    to live stations; the orphan pass must not delete them (and must
    therefore keep the pathways that reference them)."""
    t = dict(feed)
    stops = t["stops"]
    extra = spark.createDataFrame(
        [("S1ent", "Hbf Eingang Nord", 52.5253, 13.3689, 2, "S1")],
        "stop_id string, stop_name string, stop_lat double,"
        " stop_lon double, location_type int, parent_station string",
    )
    t["stops"] = stops.unionByName(extra, allowMissingColumns=True)
    t["pathways"] = spark.createDataFrame(
        [("PW1", "S1ent", "S1a", 1, 1)],
        "pathway_id string, from_stop_id string, to_stop_id string,"
        " pathway_mode int, is_bidirectional int",
    )
    out = CL.delete_orphans(t)
    kept_stops = {r.stop_id for r in out["stops"].select("stop_id").collect()}
    assert "S1ent" in kept_stops  # entrance of a live station survives
    assert out["pathways"].count() == 1  # ...and so does its pathway


def test_minimize_services_zero_date_service_keeps_fk(spark, feed):
    """A service whose dates are all cancelled must survive as an
    all-zero calendar row (zero active dates, FK intact) instead of
    vanishing and leaving trips dangling."""
    t = dict(feed)
    # cancel every date of service WK: drop its type-1 additions, then
    # emit a type-2 removal for each remaining materialized date
    dates = CL.materialized_service_dates(t)
    wd = dates.filter(F.col("service_id") == "WK").select(
        "service_id", "date", F.lit(2).alias("exception_type")
    )
    t["calendar_dates"] = t["calendar_dates"].filter(
        ~((F.col("service_id") == "WK") & (F.col("exception_type") == 1))
    ).unionByName(wd)
    out = CL.minimize_services(t)
    cal_ids = {r.service_id for r in out["calendar"].select("service_id").collect()}
    assert "WK" in cal_ids
    # and it must materialize to ZERO dates (round-trip preserved)
    re_dates = CL.materialized_service_dates(out)
    assert re_dates.filter(F.col("service_id") == "WK").count() == 0


def test_local_catalog_same_second_imports_deterministic(spark, tmp_path):
    """Two imports recorded in the same second: latest_import must be the
    lexicographically-greatest db_name (the PsqlCatalog tiebreaker), not
    whichever row the engine happens to return first."""
    from postgis_gtfs_importer_spark.catalog import ImportRecord, LocalCatalog

    cat = LocalCatalog(spark, str(tmp_path))
    cat.ensure_bookkeeping()
    cat.begin_exclusive()
    cat.record_import(ImportRecord("gtfs_2024_01_aaaaaa", 1700000000, "dA"))
    cat.record_import(ImportRecord("gtfs_2024_01_bbbbbb", 1700000000, "dB"))
    cat.commit()
    latest = cat.latest_import("gtfs_")
    assert latest.db_name == "gtfs_2024_01_bbbbbb"


def test_local_catalog_hook_drop_table_removes_parquet(spark, tmp_path):
    """A postprocessing hook DROPping a table must remove its parquet dir
    from the snapshot — open_latest may not keep serving it."""
    from postgis_gtfs_importer_spark.catalog import LocalCatalog

    cat = LocalCatalog(spark, str(tmp_path))
    db = "gtfs_2024_01_cccccc"
    base = os.path.join(str(tmp_path), db)
    os.makedirs(base, exist_ok=True)
    spark.range(5).selectExpr("id AS a").write.parquet(
        os.path.join(base, "keepme")
    )
    spark.range(3).selectExpr("id AS b").write.parquet(
        os.path.join(base, "dropme")
    )
    cat.execute_sql(db, "DROP TABLE dropme")
    assert os.path.isdir(os.path.join(base, "keepme"))
    assert not os.path.isdir(os.path.join(base, "dropme"))
