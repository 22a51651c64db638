"""Atomicity / idempotence property tests of the publish state machine
(SURVEY §5.4): skip-gate, retention GC, orphan recovery, fail-fast lock,
dangling-pointer reconciliation, DSN pointer file — the import.js semantics
over the LocalCatalog backend."""

from __future__ import annotations

import os
import sqlite3

import pytest

from postgis_gtfs_importer_spark.catalog import (
    BOOKKEEPING_TABLE,
    ImportLockedError,
    ImportRecord,
    LocalCatalog,
)
from postgis_gtfs_importer_spark.plans.publish import (
    format_db_name,
    import_gtfs_atomically,
)
from postgis_gtfs_importer_spark.plans.pipeline import run_import

from .gtfs_fixtures import HOOK_SQL_CREATE, HOOK_SQL_MUTATE, write_feed_zip

PREFIX = "gtfs_"


def tiny_tables(spark, _db_name):
    return {"t": spark.range(3).toDF("id")}


def make_clock(start: int = 1_700_000_000):
    """Monotonic fake unix clock so minted names sort deterministically."""
    state = {"t": start}

    def now():
        state["t"] += 60
        return state["t"]

    return now


@pytest.fixture()
def catalog(spark, tmp_path):
    cat = LocalCatalog(spark, str(tmp_path / "snapshots"))
    yield cat
    cat.close()


def publish(spark, catalog, digest, **kw):
    kw.setdefault("now", make_clock())
    return import_gtfs_atomically(
        spark,
        catalog,
        db_prefix=PREFIX,
        feed_digest=digest,
        build_tables=tiny_tables,
        **kw,
    )


def test_first_import_publishes_and_records(spark, catalog):
    res = publish(spark, catalog, "aaaaaa")
    assert not res.import_skipped and res.new_import is not None
    db = res.new_import["db_name"]
    assert db.startswith(PREFIX) and db.endswith("_aaaaaa")
    assert catalog.list_databases(PREFIX) == [db]
    recs = catalog.list_recorded_imports(PREFIX)
    assert [r.db_name for r in recs] == [db]
    assert catalog.read_table(db, "t").count() == 3
    assert res.import_duration_ms > 0


def test_unchanged_digest_skips(spark, catalog):
    clock = make_clock()
    first = publish(spark, catalog, "aaaaaa", now=clock)
    second = publish(spark, catalog, "aaaaaa", now=clock)
    assert second.import_skipped and second.new_import is None
    # nothing new was minted (A6, import.js:235-239)
    assert catalog.list_databases(PREFIX) == [first.new_import["db_name"]]


def test_retention_keeps_two_and_gcs_the_rest(spark, catalog):
    clock = make_clock()
    r1 = publish(spark, catalog, "aaaaaa", now=clock)
    r2 = publish(spark, catalog, "bbbbbb", now=clock)
    r3 = publish(spark, catalog, "cccccc", now=clock)
    dbs = catalog.list_databases(PREFIX)
    # the 3rd run retained [r2, r1] while importing r3 (keep-2 policy,
    # import.js:71-73) — r1's drop happens on the NEXT cycle
    assert r3.retained_databases == [
        r2.new_import["db_name"],
        r1.new_import["db_name"],
    ]
    r4 = publish(spark, catalog, "dddddd", now=clock)
    assert r1.new_import["db_name"] in r4.deleted_databases
    dbs = catalog.list_databases(PREFIX)
    assert r1.new_import["db_name"] not in dbs
    # bookkeeping row of the dropped snapshot deleted too (A16)
    recorded = {r.db_name for r in catalog.list_recorded_imports(PREFIX)}
    assert r1.new_import["db_name"] not in recorded


def test_failed_import_rolls_back_and_is_gcd_next_run(spark, catalog):
    clock = make_clock()

    def boom(spark_, db_name):
        raise RuntimeError("mid-import crash")

    with pytest.raises(RuntimeError, match="mid-import crash"):
        import_gtfs_atomically(
            spark, catalog, db_prefix=PREFIX, feed_digest="aaaaaa",
            build_tables=boom, now=clock,
        )
    # the half-built snapshot exists, but no pointer was published
    orphans = catalog.list_databases(PREFIX)
    assert len(orphans) == 1
    assert catalog.list_recorded_imports(PREFIX) == []
    # next successful run GCs the orphan (import.js:115-117, README.md:19)
    res = publish(spark, catalog, "bbbbbb", now=clock)
    assert orphans[0] in res.deleted_databases
    assert orphans[0] not in catalog.list_databases(PREFIX)


def test_concurrent_import_fails_fast(spark, catalog, tmp_path):
    # a second writer holding the meta lock → NOWAIT failure (A17)
    blocker = sqlite3.connect(str(tmp_path / "snapshots" / "meta.sqlite"))
    catalog.ensure_bookkeeping()
    blocker.execute("BEGIN IMMEDIATE")
    try:
        with pytest.raises(ImportLockedError):
            publish(spark, catalog, "aaaaaa")
    finally:
        blocker.rollback()
        blocker.close()
    # lock released → import proceeds
    assert publish(spark, catalog, "aaaaaa").new_import is not None


def test_dangling_pointer_warned_and_spliced(spark, catalog, caplog):
    clock = make_clock()
    r1 = publish(spark, catalog, "aaaaaa", now=clock)
    db = r1.new_import["db_name"]
    catalog.drop_database(db)  # simulate external deletion
    with caplog.at_level("WARNING"):
        r2 = publish(spark, catalog, "bbbbbb", now=clock)
    assert any("no physical database" in m for m in caplog.messages)
    # the dangling name was never "retained" (import.js:149-163)
    assert db not in r2.retained_databases
    assert r2.new_import is not None


def test_dangling_latest_does_not_skip(spark, catalog, caplog):
    # latest recorded has digest X but its DB is gone → a new import of X
    # must NOT be skipped into pointing at nothing
    clock = make_clock()
    r1 = publish(spark, catalog, "aaaaaa", now=clock)
    catalog.drop_database(r1.new_import["db_name"])
    r2 = publish(spark, catalog, "aaaaaa", now=clock)
    assert not r2.import_skipped and r2.new_import is not None


def test_dsn_file_written_on_publish(spark, catalog, tmp_path):
    dsn = tmp_path / "dsn.txt"
    res = publish(spark, catalog, "aaaaaa", dsn_file_path=str(dsn))
    content = dsn.read_text()
    assert content.startswith("gtfs=")
    assert res.new_import["db_name"] in content


def test_open_latest_follows_pointer(spark, catalog):
    clock = make_clock()
    with pytest.raises(LookupError):
        catalog.open_latest(PREFIX)
    publish(spark, catalog, "aaaaaa", now=clock)
    r2 = publish(spark, catalog, "bbbbbb", now=clock)
    tables = catalog.open_latest(PREFIX)
    assert set(tables) == {"t"} and tables["t"].count() == 3
    assert catalog.latest_import(PREFIX).db_name == r2.new_import["db_name"]


def test_consumer_story_publish_then_query(spark, tmp_path):
    """The reference's end-state, end to end: import a feed atomically,
    follow the published pointer, query the snapshot — what a PostGIS
    consumer does via the DSN file, done engine-side via open_latest +
    the spark.sql surface."""
    from pyspark.sql import functions as F

    from postgis_gtfs_importer_spark.sources.tables import register_gtfs_views

    zip_path = write_feed_zip(str(tmp_path / "gtfs.zip"))
    cat = LocalCatalog(spark, str(tmp_path / "snapshots"))
    try:
        res = run_import(
            spark, cat, db_prefix=PREFIX,
            zip_path=zip_path, extract_dir=str(tmp_path / "x"),
        )
        assert res.new_import is not None
        snapshot = cat.open_latest(PREFIX)
        assert {"stops", "trips", "arrivals_departures"} <= set(snapshot)
        register_gtfs_views(snapshot)
        out = spark.sql(
            """
            SELECT date, count(*) AS n_departures
            FROM arrivals_departures
            WHERE stop_id = 'S2' AND departure_time BETWEEN 8*3600 AND 9*3600
            GROUP BY date ORDER BY date
            """
        ).collect()
        assert out and all(r.n_departures >= 1 for r in out)
        # partition pruning reaches the consumer's scan too
        q = snapshot["arrivals_departures"].filter(F.col("date") == out[0].date)
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan
    finally:
        cat.close()


def test_partitioned_snapshot_prunes(spark, catalog, tmp_path):
    """Date-partitioned snapshot tables prune at planning time: a date
    predicate must reach the scan as a PartitionFilter, not a row filter."""
    import datetime as dt

    from pyspark.sql import functions as F

    rows = [
        (f"T{i}", dt.date(2024, 1, 1 + i % 5), i) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "trip_id string, date date, x long")
    catalog.ensure_bookkeeping()
    catalog.create_database("gtfs_part_test")
    catalog.write_tables(
        "gtfs_part_test", {"arrivals_departures": df},
        partition_by={"arrivals_departures": ["date"]},
    )
    back = catalog.read_table("gtfs_part_test", "arrivals_departures")
    q = back.filter(F.col("date") == dt.date(2024, 1, 3))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "2024-01-03" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    assert q.count() == 20


def test_format_db_name_parity():
    # {prefix}{unix_ts}_{digest} (index.js:55-62)
    assert format_db_name("gtfs_", 1700000000, "ab12cd") == "gtfs_1700000000_ab12cd"


# ---------------------------------------------------------------------------
# full pipeline end-to-end over the fixture feed zip
# ---------------------------------------------------------------------------

def test_run_import_end_to_end(spark, tmp_path):
    zip_path = write_feed_zip(str(tmp_path / "gtfs.zip"))
    cat = LocalCatalog(spark, str(tmp_path / "snapshots"))
    try:
        res = run_import(
            spark,
            cat,
            db_prefix=PREFIX,
            zip_path=zip_path,
            extract_dir=str(tmp_path / "extracted"),
        )
        assert res.new_import is not None
        db = res.new_import["db_name"]
        # base + derived + metadata tables all published
        stops = cat.read_table(db, "stops")
        assert stops.count() > 0
        ad = cat.read_table(db, "arrivals_departures")
        assert ad.count() > 0
        meta = cat.read_table(db, "import_metadata").collect()[0]
        assert meta.feed_digest == res.new_import["feed_digest"]

        # same zip again → skip (idempotence, SURVEY §5.4)
        res2 = run_import(
            spark,
            cat,
            db_prefix=PREFIX,
            zip_path=zip_path,
            extract_dir=str(tmp_path / "extracted"),
        )
        assert res2.import_skipped

        # postprocessing.d content participates in the digest (A5) AND
        # its .sql hooks run against the snapshot, single transaction,
        # with created tables exported back (A23)
        ppd = tmp_path / "postprocessing.d"
        ppd.mkdir()
        # shared fixture: the SAME text also runs through live psql -1
        # in tests/test_pg_live.py (hook-SQL dialect parity, A23)
        (ppd / "01-route-counts.sql").write_text(HOOK_SQL_CREATE)
        (ppd / ".hidden.sql").write_text("THIS WOULD FAIL")  # dotfiles skipped
        res3 = run_import(
            spark,
            cat,
            db_prefix=PREFIX,
            zip_path=zip_path,
            extract_dir=str(tmp_path / "extracted"),
            postprocessing_dir=str(ppd),
        )
        assert not res3.import_skipped and res3.new_import is not None
        counts = cat.read_table(res3.new_import["db_name"], "route_trip_counts")
        assert counts.count() > 0

        # hooks may also MUTATE existing tables (documented reference use
        # of postprocessing.d) — the UPDATE must be visible in the
        # published snapshot, and partitioned tables must keep their
        # hive layout through the re-export
        (ppd / "01-route-counts.sql").unlink()
        (ppd / "02-mutate.sql").write_text(HOOK_SQL_MUTATE)
        res4 = run_import(
            spark,
            cat,
            db_prefix=PREFIX,
            zip_path=zip_path,
            extract_dir=str(tmp_path / "extracted"),
            postprocessing_dir=str(ppd),
        )
        assert not res4.import_skipped and res4.new_import is not None
        db4 = res4.new_import["db_name"]
        stops4 = cat.read_table(db4, "stops")
        assert stops4.filter(stops4.stop_name != "RENAMED").count() == 0
        ad_dir = os.path.join(cat.root, db4, "arrivals_departures")
        assert any(e.startswith("date=") for e in os.listdir(ad_dir)), (
            "partition layout lost in postprocessing re-export"
        )
        assert cat.read_table(db4, "arrivals_departures").count() > 0
    finally:
        cat.close()
