"""Streaming twins vs their batch oracles: windowed stats and stateful
sessionization over a bounded file stream (Trigger.AvailableNow), plus the
poll-loop wrapper's digest-gated idempotence."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from postgis_gtfs_importer_spark.catalog import LocalCatalog
from postgis_gtfs_importer_spark.operators.sessions import sessionize
from postgis_gtfs_importer_spark.streaming import events as SE
from postgis_gtfs_importer_spark.streaming.feed_poll import poll_and_import

from .gtfs_fixtures import write_feed_zip


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    """A small deterministic event table written as a file-stream source."""
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    eid = 0
    for user in range(5):
        t = base + dt.timedelta(minutes=user)
        for session in range(3):
            for i in range(4):  # 4 events, 5 min apart => one session
                rows.append((eid, user, f"type{eid % 3}", t, "1.0", "{}"))
                eid += 1
                t += dt.timedelta(minutes=5)
            t += dt.timedelta(hours=2)  # gap > 30 min => next session
    df = spark.createDataFrame(rows, SE.EVENT_SCHEMA)
    d = str(tmp_path_factory.mktemp("events_stream"))
    df.coalesce(2).write.mode("overwrite").parquet(d)
    return d


def test_windowed_stats_matches_batch(spark, event_dir):
    stream = SE.stream_events(spark, event_dir)
    SE.run_to_memory(
        SE.windowed_stats_stream(stream, "1 hour", "30 minutes"),
        "win_stats",
    )
    got = {
        (r.window_start, r.event_type): r.n_events
        for r in spark.table("win_stats").collect()
    }
    batch = (
        spark.read.parquet(event_dir)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("ws"), "event_type", "n")
    )
    expected = {(r.ws, r.event_type): r.n for r in batch.collect()}
    # append mode emits only watermark-closed windows: everything emitted
    # must match the batch result exactly; open windows may be held back
    assert got, "no windows emitted"
    for k, v in got.items():
        assert expected[k] == v, k
    held_back = set(expected) - set(got)
    max_ws = max(ws for ws, _ in expected)
    assert all(ws == max_ws for ws, _ in held_back), "only the last window may be open"


def test_sessionize_stream_matches_batch(spark, event_dir):
    stream = SE.stream_events(spark, event_dir)
    SE.run_to_memory(
        SE.sessionize_stream(stream, gap_sec=1800, watermark_delay="30 minutes"),
        "sessions_stream",
    )
    got = {
        (r.user_id, r.session_start_epoch): (r.session_end_epoch, r.n_events)
        for r in spark.table("sessions_stream").collect()
    }
    batch = sessionize(spark.read.parquet(event_dir), gap_sec=1800)
    expected = {
        (r.user_id, int(r.session_start.timestamp())): (
            int(r.session_end.timestamp()),
            r.n_events,
        )
        for r in batch.collect()
    }
    assert got, "no sessions emitted"
    # every emitted session must equal its batch twin
    for k, v in got.items():
        assert expected[k] == v, k
    # at most the final (still-open) session per user may be unemitted
    missing = set(expected) - set(got)
    last_start = {}
    for (u, s) in expected:
        last_start[u] = max(last_start.get(u, 0), s)
    assert all(s == last_start[u] for u, s in missing), missing


def test_dedup_stream_first_per_key(spark, event_dir):
    stream = SE.stream_events(spark, event_dir)
    SE.run_to_memory(
        SE.dedup_stream(stream, ["user_id", "event_type"]), "dedup_stream"
    )
    out = spark.table("dedup_stream").collect()
    keys = [(r.user_id, r.event_type) for r in out]
    assert len(keys) == len(set(keys))  # exactly one row per key
    batch_keys = {
        (r.user_id, r.event_type)
        for r in spark.read.parquet(event_dir).select("user_id", "event_type").distinct().collect()
    }
    assert set(keys) == batch_keys


def test_poll_loop_digest_gate(spark, tmp_path):
    zip_path = write_feed_zip(str(tmp_path / "gtfs.zip"))
    cat = LocalCatalog(spark, str(tmp_path / "snap"))
    slept = []
    try:
        results = poll_and_import(
            spark,
            cat,
            interval_sec=60,
            max_cycles=3,
            sleep=slept.append,
            db_prefix="gtfs_",
            zip_path=zip_path,
            extract_dir=str(tmp_path / "x"),
        )
    finally:
        cat.close()
    assert len(results) == 3
    assert results[0].new_import is not None
    assert results[1].import_skipped and results[2].import_skipped
    assert slept == [60, 60]

def test_watermark_drops_late_data(spark, tmp_path):
    """Late-data semantics (SURVEY §2 streaming): an event arriving
    micro-batches later with event time hours behind the watermark is
    DROPPED — numRowsDroppedByWatermark records it and its window never
    materializes — while watermark-closed on-time windows emit exactly.

    Note the file source needs THREE phases here: with
    Trigger.AvailableNow the watermark advanced by batch N only takes
    effect for filtering in batch N+2 (it is computed at commit and
    applied at next plan), so the late file must not be the immediate
    successor of the watermark-advancing file."""
    import os
    import time

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    d = str(tmp_path / "late_stream")
    os.makedirs(d)

    def write(rows, mode):
        spark.createDataFrame(rows, SE.EVENT_SCHEMA).coalesce(1).write.mode(
            mode
        ).parquet(d)

    # phase 1: on-time event at 00:15 + an event at 10:00 that will push
    # the watermark to 09:30
    write(
        [
            (0, 0, "typeA", base + dt.timedelta(minutes=15), "1.0", "{}"),
            (2, 0, "typeA", base + dt.timedelta(hours=10), "1.0", "{}"),
        ],
        "overwrite",
    )
    time.sleep(1.1)  # distinct mtimes: the file source batches by them
    # phase 2: on-time filler so the 09:30 watermark becomes effective
    write([(5, 0, "typeA", base + dt.timedelta(hours=10, minutes=5), "1.0", "{}")],
          "append")
    time.sleep(1.1)
    # phase 3: the late event — 05:00, hours behind the 09:30 watermark
    write([(3, 0, "typeA", base + dt.timedelta(hours=5), "1.0", "{}")], "append")

    stream = SE.stream_events(spark, d, max_files_per_trigger=1)
    q = SE.run_to_memory(
        SE.windowed_stats_stream(stream, "1 hour", "30 minutes"),
        "late_stats",
    )
    got = {
        r.window_start: r.n_events for r in spark.table("late_stats").collect()
    }
    # the on-time 00:00 window closed and emitted exactly once
    assert got.get(base) == 1
    # the late event's 05:00 window would be closed too (06:00 < 09:30) —
    # its ABSENCE proves the row was dropped, not merely held back…
    assert base + dt.timedelta(hours=5) not in got
    # …and the state operator accounted for the drop explicitly
    dropped = sum(
        o.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for o in p.get("stateOperators", [])
    )
    assert dropped == 1


def test_stream_testdata_events_matches_batch_instants(spark):
    """The streaming loader over the REAL driver parquet (sf0.001) sees the
    exact instants the batch loader sees — the r2 regression was here: the
    file stores Timestamp(MICROS, tz-naive) and the stream schema declared
    long nanos, collapsing every ts 1000x toward 1970. Pin the contract:
    same row count, identical (event_id, epoch-micros) multiset."""
    from postgis_gtfs_importer_spark.sources.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    batch = load_table(spark, sf_dir, "events").select(
        "event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    stream = SE.stream_testdata_events(spark, sf_dir).select(
        "event_id", F.unix_micros("ts").alias("us")
    )
    SE.run_to_memory(stream, "real_events_stream")
    streamed = spark.table("real_events_stream")
    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).isEmpty()
    # and the instants are sane: every event inside the generator's window
    lo = streamed.agg(F.min("us")).first()[0]
    assert lo > 1_500_000_000 * 1_000_000  # after 2017, not near 1970


def test_merge_stream_into_upserts_and_replays_idempotently(spark, tmp_path):
    """foreachBatch MERGE sink: two micro-batches of row-level changes
    fold into a parquet target; replaying the stream from scratch over
    the same files converges to the same target (checkpoint batch-ids +
    merge idempotence = the exactly-once story)."""
    import os

    from postgis_gtfs_importer_spark.streaming.merge_sink import (
        merge_stream_into,
    )

    src_dir = str(tmp_path / "changes")
    tgt_dir = str(tmp_path / "target")
    os.makedirs(src_dir)
    schema = "pk long, val string, seq long"

    def write_batch(rows, mode):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            mode
        ).parquet(src_dir)

    write_batch([(1, "a", 1), (2, "b", 1)], "overwrite")

    def read_target():
        try:
            return spark.read.parquet(tgt_dir)
        except Exception:
            return None

    def write_target(df, batch_id):
        # rewrite-to-temp then swap would be the production move; for the
        # test a plain overwrite after materializing is enough
        rows = df.collect()
        spark.createDataFrame(rows, df.schema).write.mode(
            "overwrite"
        ).parquet(tgt_dir)

    def drain():
        ev = spark.readStream.schema(schema).parquet(src_dir)
        q = merge_stream_into(
            ev, read_target, write_target, pk_cols=["pk"],
            order_col="seq", query_name="ms1",
        )
        q.awaitTermination()

    drain()
    import time
    time.sleep(1.1)
    write_batch([(2, "B2", 2), (3, "c", 2)], "append")  # update + insert
    drain()

    got = {(r.pk, r.val) for r in spark.read.parquet(tgt_dir).collect()}
    assert got == {(1, "a"), (2, "B2"), (3, "c")}

    # a replay may fold BOTH files into one batch: pk=2 then has seq 1
    # and 2 in the same batch and order_col must pick seq=2

    # full replay over the same files (fresh checkpoint-less query):
    # target must converge to the same state, not duplicate
    drain()
    got2 = {(r.pk, r.val) for r in spark.read.parquet(tgt_dir).collect()}
    assert got2 == got


def test_sessionize_rocksdb_state_store_matches_hdfs(spark, event_dir):
    """Same stateful query under both state-store backends (VERDICT r3
    item 7): the HDFS-backed default holds state in executor heap; the
    RocksDB provider is what a production deployment runs (state spills
    to local disk, heap holds a block cache). Results must be backend-
    independent, and the RocksDB drain must actually report its provider
    in the query progress (proof it ran, not silently fell back)."""
    stream = SE.stream_events(spark, event_dir)
    q = SE.run_to_memory(
        SE.sessionize_stream(stream, gap_sec=1800, watermark_delay="30 minutes"),
        "sessions_rocksdb",
        state_store="rocksdb",
    )
    # provider actually engaged for this query: RocksDB publishes its own
    # customMetrics (rocksdbCommit*, rocksdbGet*, ...) in every progress
    # event; the HDFS provider publishes none of them
    rocks_metrics = {
        k
        for p in q.recentProgress
        for o in p.get("stateOperators", [])
        for k in (o.get("customMetrics") or {})
        if k.startswith("rocksdb")
    }
    assert rocks_metrics, (
        "no rocksdb* custom metrics in progress — provider did not engage"
    )
    got = {
        (r.user_id, r.session_start_epoch): (r.session_end_epoch, r.n_events)
        for r in spark.table("sessions_rocksdb").collect()
    }
    SE.run_to_memory(
        SE.sessionize_stream(stream, gap_sec=1800, watermark_delay="30 minutes"),
        "sessions_hdfs",
        state_store="hdfs",
    )
    hdfs = {
        (r.user_id, r.session_start_epoch): (r.session_end_epoch, r.n_events)
        for r in spark.table("sessions_hdfs").collect()
    }
    assert got == hdfs and got, "state-store backends disagree"
    # session conf restored (query-scoped override only)
    assert (
        spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass",
            "unset",
        )
        == "unset"
        or "RocksDB"
        not in spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    )


def test_session_window_merges_across_microbatches(spark, tmp_path):
    """The part the single-file driver entry cannot exercise: a session
    whose events arrive in DIFFERENT micro-batches must merge inside
    the session-window state store. Events for each user alternate
    between two files; maxFilesPerTrigger=1 forces two micro-batches,
    so every session's odd/even events meet only in state. Final
    complete-mode state must equal the batch session_window result."""
    rows = []
    base = dt.datetime(2024, 3, 1, 8, 0, 0)
    for u in range(5):
        for i in range(6):
            # 10-min steps: one 30-min-gap session per user
            rows.append((u * 100 + i, base + dt.timedelta(minutes=10 * i), u))
        # a second session well past the gap
        rows.append((u * 100 + 50, base + dt.timedelta(hours=5), u))
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id"])
    # the file stream source lists only top-level files: materialize each
    # chunk as a plain file under src/, not a .parquet output directory
    import glob as _glob
    import shutil as _shutil

    src = str(tmp_path / "ssw_src")
    (tmp_path / "ssw_src").mkdir()
    for tag, cond in (("a", 0), ("b", 1)):
        out = str(tmp_path / f"ssw_tmp_{tag}")
        df.filter(F.col("event_id") % 2 == cond).coalesce(1).write.parquet(out)
        part = _glob.glob(out + "/part-*.parquet")[0]
        _shutil.copy(part, f"{src}/{tag}.parquet")

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = stream.groupBy(
        F.session_window(F.col("ts"), "30 minutes"), F.col("user_id")
    ).agg(F.count("*").alias("n"))
    q = SE.run_to_memory(agg, "ssw_merge", output_mode="complete",
                         state_partitions=4)
    assert len(q.recentProgress) >= 2  # really ran multiple micro-batches
    got = {
        (r["user_id"], r["session_window"]["start"], r["session_window"]["end"], r["n"])
        for r in spark.table("ssw_merge").collect()
    }
    expect = {
        (r["user_id"], r["session_window"]["start"], r["session_window"]["end"], r["n"])
        for r in df.groupBy(
            F.session_window(F.col("ts"), "30 minutes"), F.col("user_id")
        ).agg(F.count("*").alias("n")).collect()
    }
    assert got == expect
    # and the merge really fused split sessions: 2 sessions per user
    assert len(got) == 10


def test_hll_dashboard_merges_across_microbatches(spark, tmp_path):
    """Per-micro-batch HLL sketches merged as dashboard state must
    equal the direct whole-input sketch — register max-linearity across
    REAL trigger boundaries (4 files, maxFilesPerTrigger=1), including
    users whose events straddle batches."""
    import glob as _glob
    import shutil as _shutil

    from postgis_gtfs_importer_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )
    from postgis_gtfs_importer_spark.streaming.events import (
        drain_hll_dashboard,
    )

    rows = [(i, i % 97, "t%d" % (i % 3)) for i in range(2000)]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "event_type"])
    src = tmp_path / "hll_src"
    src.mkdir()
    for part in range(4):
        out = str(tmp_path / f"hll_tmp_{part}")
        df.filter(F.col("event_id") % 4 == part).coalesce(1).write.parquet(out)
        _shutil.copy(
            _glob.glob(out + "/part-*.parquet")[0], str(src / f"{part}.parquet")
        )

    stream = (
        spark.readStream.schema("event_id long, user_id long, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    acc, q = drain_hll_dashboard(stream, ["event_type"], "user_id", p=6)
    assert len(q.recentProgress) >= 4  # really sketched per trigger
    regs = spark.createDataFrame(
        acc, "event_type string, bucket long, register long"
    )
    got = {
        (r["event_type"], r["hll_est"])
        for r in hll_estimate(
            hll_merge(regs, ["event_type"]), ["event_type"], p=6
        ).collect()
    }
    direct = {
        (r["event_type"], r["hll_est"])
        for r in hll_estimate(
            hll_merge(
                hll_registers(df, ["event_type"], "user_id", p=6),
                ["event_type"],
            ),
            ["event_type"],
            p=6,
        ).collect()
    }
    assert got == direct


def test_transform_with_state_running_totals_or_probe(spark, tmp_path):
    """transformWithState (Spark 4 arbitrary-state API): per-user running
    totals replayed over a 3-file stream must equal the batch aggregate
    — state carried across REAL micro-batch boundaries. Skips with the
    recorded import-probe evidence when the protobuf runtime dependency
    is absent (streaming/stateful.py ENVIRONMENT GATE)."""
    import pytest

    from postgis_gtfs_importer_spark.streaming.stateful import (
        final_totals,
        running_totals_stream,
        tws_available,
    )

    ok, evidence = tws_available()
    if not ok:
        pytest.skip(
            "transformWithState runtime dependency missing — probe "
            f"evidence: {evidence}"
        )

    from pyspark.sql import functions as F

    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # 3 files -> 3 micro-batches with maxFilesPerTrigger=1
    for i in range(3):
        src.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(str(tmp_path / "stream"))
    ev = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "stream"))
    )
    from postgis_gtfs_importer_spark.streaming.events import run_to_memory

    tot = running_totals_stream(ev)
    run_to_memory(
        tot, "tws_rt", output_mode="update",
        state_partitions=4, state_store="rocksdb",
    )
    got = {
        r.user_id: (r.n_events, r.sum_cents)
        for r in final_totals(spark.table("tws_rt")).collect()
    }
    batch = src.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("s"),
    )
    want = {r.user_id: (r.n, r.s) for r in batch.collect()}
    assert got == want


def test_sessionize_restart_from_checkpoint_carries_state(spark, tmp_path):
    """Checkpoint-recovery contract (the production restart path the
    single-run tests cannot exercise): a stateful sessionization query
    is stopped after half its input and RESTARTED against the same
    checkpoint + file sink. One session deliberately SPANS the restart
    boundary — its first 3 events arrive before the stop, its last 2
    after — so the final output is only correct if BOTH recoveries
    work: source offsets (run 2 must not reprocess run 1's files; its
    numInputRows is pinned) and the state store (the open session must
    merge across the restart instead of splitting in two). The parquet
    sink's _spark_metadata commit log makes the union of both runs
    exactly-once; the final read must equal the batch sessionize twin."""
    import glob as _glob
    import shutil as _shutil

    from postgis_gtfs_importer_spark.operators.sessions import sessionize

    base = dt.datetime(2024, 6, 1, 8, 0, 0)

    def ev(eid, uid, t):
        return (eid, uid, f"type{eid % 3}", t, "1.0", "{}")

    eid = 0
    file_rows: dict[str, list] = {"a": [], "b": [], "c": [], "d": [], "e": []}
    # file a (run 1): users 0-3, one closed session each (4 events, 5 min)
    for u in range(4):
        for i in range(4):
            file_rows["a"].append(
                ev(eid, u, base + dt.timedelta(minutes=u + 5 * i))
            )
            eid += 1
    # file b (run 1): user 9's session OPENS — 3 events ending base+100min
    for m in (90, 95, 100):
        file_rows["b"].append(ev(eid, 9, base + dt.timedelta(minutes=m)))
        eid += 1
    # file c (run 2): user 9 CONTINUES (15-min gap < 30-min session gap),
    # plus a second closed session per user 0-3 five hours later
    for m in (115, 120):
        file_rows["c"].append(ev(eid, 9, base + dt.timedelta(minutes=m)))
        eid += 1
    for u in range(4):
        for i in range(4):
            file_rows["c"].append(
                ev(eid, u, base + dt.timedelta(hours=5, minutes=u + 5 * i))
            )
            eid += 1
    # files d, e (run 2): watermark flushes — two far-future events so the
    # final micro-batch runs with the watermark already past every real
    # session's end + gap, firing the event-time timeouts
    file_rows["d"].append(ev(eid, 99, base + dt.timedelta(days=2)))
    eid += 1
    file_rows["e"].append(ev(eid, 99, base + dt.timedelta(days=2, hours=1)))
    eid += 1

    src = tmp_path / "restart_src"
    src.mkdir()

    def publish(tag):
        out = str(tmp_path / f"restart_tmp_{tag}")
        spark.createDataFrame(file_rows[tag], SE.EVENT_SCHEMA).coalesce(
            1
        ).write.parquet(out)
        part = _glob.glob(out + "/part-*.parquet")[0]
        _shutil.copy(part, str(src / f"{tag}.parquet"))

    out_dir = str(tmp_path / "restart_out")
    ckpt = str(tmp_path / "restart_ckpt")

    def run_once():
        stream = SE.stream_events(spark, str(src), max_files_per_trigger=1)
        q = (
            SE.sessionize_stream(stream, gap_sec=1800,
                                 watermark_delay="30 minutes")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sum(p["numInputRows"] for p in q.recentProgress)

    # state-partition count is pinned into the checkpoint at first start
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        for tag in ("a", "b"):
            publish(tag)
        n_run1 = run_once()
        assert n_run1 == len(file_rows["a"]) + len(file_rows["b"])
        # user 9's session is OPEN in state — it must NOT be in the sink
        emitted_run1 = spark.read.parquet(out_dir)
        assert emitted_run1.filter(F.col("user_id") == 9).count() == 0

        for tag in ("c", "d", "e"):
            publish(tag)
        n_run2 = run_once()
        # offset recovery: ONLY the new files were read after the restart
        assert n_run2 == sum(len(file_rows[t]) for t in ("c", "d", "e"))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)

    got = {
        (r.user_id, r.session_start_epoch, r.session_end_epoch, r.n_events)
        for r in spark.read.parquet(out_dir)
        .filter(F.col("user_id") < 50)
        .collect()
    }
    real = [r for t in ("a", "b", "c") for r in file_rows[t]]
    batch = sessionize(
        spark.createDataFrame(real, SE.EVENT_SCHEMA), gap_sec=1800
    )
    want = {
        (
            r.user_id,
            int(r.session_start.timestamp()),
            int(r.session_end.timestamp()),
            r.n_events,
        )
        for r in batch.collect()
    }
    assert got == want
    # the boundary-spanning session really merged: ONE 5-event session
    u9 = [g for g in got if g[0] == 9]
    assert len(u9) == 1 and u9[0][3] == 5


def test_stream_testdata_tables_directory_shape(spark, tmp_path):
    """Physical-shape invariance of the testdata stream loaders: the
    driver fixture ships each table as a single parquet FILE, but every
    Spark/Hive writer produces a DIRECTORY of part files — the shape a
    production sf_dir has. The glob-filter loader this replaces matched
    only the file shape and returned a SILENTLY EMPTY stream on the
    directory shape (pathGlobFilter matches leaf names; part-*.parquet
    never equals events.parquet). Both shapes must stream identical
    rows, and an absent table must raise instead of streaming nothing."""
    sf = "/root/testdata/sf0.001"
    d = tmp_path / "dir-shape"
    d.mkdir()
    for t in ("events", "documents"):
        spark.read.parquet(f"{sf}/{t}.parquet").repartition(3).write.parquet(
            str(d / f"{t}.parquet")
        )

    for loader, key in (
        (SE.stream_testdata_events, "event_id"),
        (SE.stream_testdata_documents, "doc_id"),
    ):
        got = {}
        for tag, src in (("file", sf), ("dir", str(d))):
            name = f"shape_{key}_{tag}"
            q = (
                loader(spark, src)
                .writeStream.format("memory")
                .queryName(name)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            got[tag] = {r[key] for r in spark.table(name).select(key).collect()}
        assert got["file"] == got["dir"] and got["file"], loader.__name__

    with pytest.raises(ValueError, match="stream source not found"):
        SE.stream_testdata_events(spark, str(tmp_path / "nowhere"))


def test_stream_shape_probe_without_gateway(tmp_path):
    """_is_directory's Spark-Connect fallback (no py4j gateway): local
    paths probe via os.path, remote schemes default to the directory
    form, absent paths raise the loud contract."""
    from postgis_gtfs_importer_spark.streaming.events import _is_directory

    class _NoGateway:
        @property
        def _jvm(self):
            raise RuntimeError("connect session: no gateway")

        @property
        def _jsc(self):
            raise RuntimeError("connect session: no gateway")

    s = _NoGateway()
    f = tmp_path / "x.parquet"
    f.write_text("x")
    assert _is_directory(s, str(tmp_path)) is True
    assert _is_directory(s, str(f)) is False
    assert _is_directory(s, f"file://{f}") is False
    assert _is_directory(s, "s3a://bucket/table.parquet") is True
    with pytest.raises(ValueError, match="stream source not found"):
        _is_directory(s, str(tmp_path / "missing"))
