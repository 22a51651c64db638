"""Regression pins for the streaming/sinks/sources review findings."""

from __future__ import annotations

import datetime as dt
import os
import zipfile

from pyspark.sql import functions as F

from postgis_gtfs_importer_spark.sources import gtfs_feed as GF


def test_extract_feed_hoists_nested_zip(tmp_path):
    """Feeds zipped under a subdirectory ('gtfs/stops.txt') must extract
    to a usable feed, not a silently EMPTY one."""
    z = str(tmp_path / "nested.zip")
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("gtfs/stops.txt", "stop_id,stop_name\nS1,A\n")
        zf.writestr("gtfs/trips.txt", "trip_id,route_id,service_id\nT1,R1,W\n")
        zf.writestr("gtfs/readme.md", "not a table")
    out = str(tmp_path / "x")
    names = GF.extract_feed(z, out)
    assert names == ["stops", "trips"]
    assert os.path.exists(os.path.join(out, "stops.txt"))


def test_extract_feed_flat_zip_unchanged(tmp_path):
    z = str(tmp_path / "flat.zip")
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("stops.txt", "stop_id\nS1\n")
    out = str(tmp_path / "y")
    assert GF.extract_feed(z, out) == ["stops"]


def test_read_feed_skips_zero_byte_file(spark, tmp_path):
    """Zero-byte optional files (real feeds ship them) read as absent,
    not as a bare StopIteration crash."""
    d = tmp_path / "feed"
    d.mkdir()
    (d / "stops.txt").write_text("stop_id,stop_name\nS1,A\n")
    (d / "frequencies.txt").write_text("")
    tables = GF.read_feed(spark, str(d))
    assert "stops" in tables and "frequencies" not in tables


def test_synth_feed_frequencies_anatomy():
    """Exactly min(100, n_trips) frequency rows at every scale — the
    earlier loop emitted 2 rows at scale=1.0 and MORE at smaller scales
    than larger ones."""
    from postgis_gtfs_importer_spark.sources.synth_feed import synth_feed_files

    for scale, expect in ((1.0, 100), (0.1, 100), (0.002, 20)):
        files = synth_feed_files(scale=scale)
        n = len(files["frequencies.txt"].strip().splitlines()) - 1
        assert n == expect, f"scale={scale}: {n} rows"


def test_sessionize_stream_extends_start_backwards(spark, tmp_path):
    """A within-watermark event EARLIER than the open session's start
    must extend the start (batch-twin min(ts) semantics) — the
    append-only form froze the first-seen start."""
    from postgis_gtfs_importer_spark.operators.sessions import sessionize
    from postgis_gtfs_importer_spark.streaming.events import (
        run_to_memory,
        sessionize_stream,
    )

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    # file 0 (first micro-batch): 12:00; file 1 (second): 11:58 — only
    # 2 min late, far inside the 30-min watermark, same session (gap 30m)
    d = tmp_path / "events"
    d.mkdir()
    rows0 = [(1, base, "click", 0.0, 100)]
    rows1 = [(1, base - dt.timedelta(minutes=2), "view", 0.0, 101),
             # a much later event to push the watermark past the close
             (2, base + dt.timedelta(hours=3), "click", 0.0, 102)]
    schema = "user_id long, ts timestamp, event_type string, value double, event_id long"
    spark.createDataFrame(rows0, schema).coalesce(1).write.parquet(str(d / "f0"))
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(str(d / "f1"))

    stream = (
        spark.readStream.schema(schema.replace(", ", ",  "))
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "*"))
    )
    out = sessionize_stream(stream, gap_sec=1800, watermark_delay="30 minutes")
    run_to_memory(out, "sess_backfill", state_partitions=2)
    got = {
        (r.user_id): (r.session_start_epoch, r.session_end_epoch, r.n_events)
        for r in spark.table("sess_backfill").collect()
        if r.user_id == 1
    }
    start = int(base.replace(tzinfo=dt.timezone.utc).timestamp()) - 120
    end = int(base.replace(tzinfo=dt.timezone.utc).timestamp())
    # batch twin agrees by construction: min(ts) starts the session
    assert got.get(1) is not None, "user 1 session never closed"
    assert got[1] == (start, end, 2), got
