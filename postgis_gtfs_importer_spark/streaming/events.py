"""Structured Streaming twins of the batch event operators.

The reference is a batch job re-run periodically (README.md:3) — SURVEY
§2.D records "no streaming operators" as a parity non-goal, and §7 Phase 5
plans streaming as the continuous-ingest extension. These are the
Spark-idiomatic versions of the same semantics:

  * ``stream_events``        — file-source readStream with the declared
    schema (schema inference is disabled on streams at scale for a
    reason: one schema change shouldn't re-plan a fleet).
  * ``windowed_stats_stream``— the C15 stats family over event-time
    tumbling windows with a watermark bounding state (late rows beyond
    the delay are dropped deterministically).
  * ``sessionize_stream``    — the operators.sessions definition kept
    incremental with per-user state in ``applyInPandasWithState``:
    sessions close by event-time timeout when the watermark passes
    session_end + gap. State per key is O(1) (one open session), so a
    1000-executor cluster holds billions of users without spill.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("ts", TimestampType()),
        StructField("value", StringType()),
        StructField("props", StringType()),
    ]
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_epoch", LongType()),
        StructField("session_end_epoch", LongType()),
        StructField("n_events", LongType()),
    ]
)

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_epoch", LongType()),
        StructField("end_epoch", LongType()),
        StructField("n_events", LongType()),
    ]
)


def stream_events(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source event stream with an explicit schema."""
    reader = spark.readStream.schema(schema or EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def windowed_stats_stream(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """C15 stats over event-time tumbling windows, state bounded by the
    watermark. Append-mode emits a window only once it can no longer
    change — the streaming analog of the batch group-by's finality."""
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window_duration).alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def sessionize_stream(
    events: DataFrame,
    gap_sec: int = 1800,
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Incremental gap-sessionization — applyInPandasWithState.

    Same session definition as operators.sessions.sessionize: a session
    closes when no event for gap_sec. Each user's state is its single
    open session; closed sessions are emitted either when a later event
    proves the gap, or when the event-time timeout fires (watermark >
    session_end + gap). Late events behind the watermark are dropped by
    the watermark, so emissions are final.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int]] = []

        if state.hasTimedOut:
            if state.exists:
                s, e, n = state.get
                closed.append((s, e, n))
                state.remove()
        else:
            rows = pd.concat(list(pdfs))
            epochs = sorted(
                int(t.value // 1_000_000_000) for t in rows["ts"]
            )
            # Sessionize this batch's events, then merge the resulting
            # intervals with the open-session interval as a PEER —
            # interval arithmetic, not append-only: a within-watermark
            # event EARLIER than the open session's start must extend
            # the start backwards (min), exactly as the batch twin's
            # min(ts) does, and may even bridge two intervals into one.
            # (The open session's interior is continuously active — it
            # was built by chaining events <= gap apart — so
            # within-gap-of-interval merging is exact, not a heuristic.
            # The earlier append-only form kept cur's start frozen and
            # diverged from batch sessionize on out-of-order batches.)
            batch_sessions: list[tuple[int, int, int]] = []
            for ep in epochs:
                if not batch_sessions or ep - batch_sessions[-1][1] > gap_sec:
                    batch_sessions.append((ep, ep, 1))
                else:
                    s, e, n = batch_sessions[-1]
                    batch_sessions[-1] = (s, max(e, ep), n + 1)
            intervals = batch_sessions + (
                [state.get] if state.exists else []
            )
            intervals.sort()
            merged: list[tuple[int, int, int]] = []
            for s, e, n in intervals:
                if merged and s - merged[-1][1] <= gap_sec:
                    ms, me, mn = merged[-1]
                    merged[-1] = (ms, max(me, e), mn + n)
                else:
                    merged.append((s, e, n))
            # only the LAST interval can still grow; earlier ones are
            # separated from it by > gap and new events are never older
            # than the watermark, which already passed them
            closed.extend(merged[:-1])
            cur = merged[-1] if merged else None
            if cur is not None:
                state.update(cur)
                # close the open session once the watermark passes its
                # end + gap (timestamps are ms in the state API)
                state.setTimeoutTimestamp((cur[1] + gap_sec) * 1000)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": pd.Series([user_id] * len(closed), dtype="int64"),
                    "session_start_epoch": pd.Series([c[0] for c in closed], dtype="int64"),
                    "session_end_epoch": pd.Series([c[1] for c in closed], dtype="int64"),
                    "n_events": pd.Series([c[2] for c in closed], dtype="int64"),
                }
            )

    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def dedup_stream(
    events: DataFrame,
    key_cols: list[str] | None = None,
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Streaming exact dedup — the corpus-dedup operator kept incremental.

    ``dropDuplicatesWithinWatermark`` keeps the first row per key and
    bounds the dedup state by the watermark (keys older than the delay
    are evicted — exact within the watermark horizon, which is the only
    tractable contract for an unbounded stream). The batch twin is
    ``dedup_exact`` / ``dropDuplicates``; a content-hash fingerprint
    column (functions.text.fingerprint) as the key gives streaming
    document dedup.
    """
    keys = key_cols or ["user_id", "event_type"]
    return events.withWatermark("ts", watermark_delay).dropDuplicatesWithinWatermark(
        keys
    )


#: Progress metrics of the most recent ``run_to_memory`` drain — the bench
#: harness reads these after a registry streaming query returns its batch
#: DataFrame (the query object itself is not surfaced through the registry
#: signature). Keys: numRowsDroppedByWatermark, stateRows, inputRows.
LAST_RUN_METRICS: dict[str, int] = {}


#: Provider classes selectable via run_to_memory(state_store=...). The
#: HDFS-backed default keeps every state row in executor heap — fine for
#: bounded test drains, an OOM at production state sizes; RocksDB spills
#: state to local disk with an in-heap block cache, the provider a
#: 1000-executor deployment should run (same conf knob there:
#: spark.sql.streaming.stateStore.providerClass).
STATE_STORE_PROVIDERS = {
    "hdfs": (
        "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider"
    ),
    "rocksdb": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
}


def run_to_memory(
    stream: DataFrame,
    query_name: str,
    output_mode: str = "append",
    state_partitions: int | None = None,
    state_store: str | None = None,
):
    """Drain a bounded stream (Trigger.AvailableNow) into an in-memory
    table for inspection/testing; blocks until exhausted. Returns the
    (terminated) query so callers can read progress metrics, e.g.
    numRowsDroppedByWatermark.

    ``state_partitions`` sizes ``spark.sql.shuffle.partitions`` for THIS
    query only (set before start, restored after): stateful operators pay
    a state-store commit per partition per micro-batch, so a bounded
    drain of ~10^5 rows at 32 partitions spends 4-5x longer in store
    commits than in work (measured: interval join 14.4s -> 3.1s at 8).
    The streaming checkpoint pins the count at first start, which is why
    it must be chosen per query volume, not inherited from the session —
    an unbounded production stream sizes it to sustained rate instead.

    ``state_store`` selects the state-store backend for THIS query
    ("hdfs" | "rocksdb", see STATE_STORE_PROVIDERS; None inherits the
    session). Like the partition count, the provider is pinned into the
    checkpoint at first start — choose it up front.
    """
    spark = stream.sparkSession
    provider_conf = "spark.sql.streaming.stateStore.providerClass"
    progress_conf = "spark.sql.streaming.numRecentProgressUpdates"
    old = spark.conf.get("spark.sql.shuffle.partitions")
    old_provider = spark.conf.get(provider_conf, None)
    old_progress = spark.conf.get(progress_conf, None)
    # recentProgress is a ring buffer (default 100 entries): a drain with
    # more micro-batches than that would silently UNDERCOUNT the summed
    # metrics below. Bounded drains are test/bench sized, so a generous
    # cap keeps every batch's progress.
    spark.conf.set(progress_conf, "100000")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    if state_store is not None:
        spark.conf.set(provider_conf, STATE_STORE_PROVIDERS[state_store])
    try:
        q = (
            stream.writeStream.format("memory")
            .queryName(query_name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", old)
        if state_store is not None:
            if old_provider is None:
                spark.conf.unset(provider_conf)
            else:
                spark.conf.set(provider_conf, old_provider)
        if old_progress is None:
            spark.conf.unset(progress_conf)
        else:
            spark.conf.set(progress_conf, old_progress)
    LAST_RUN_METRICS.clear()
    LAST_RUN_METRICS.update(
        {
            "numRowsDroppedByWatermark": sum(
                o.get("numRowsDroppedByWatermark", 0)
                for p in q.recentProgress
                for o in p.get("stateOperators", [])
            ),
            "stateRows": max(
                (
                    o.get("numRowsTotal", 0)
                    for p in q.recentProgress
                    for o in p.get("stateOperators", [])
                ),
                default=0,
            ),
            "inputRows": sum(
                int(p.get("numInputRows", 0)) for p in q.recentProgress
            ),
        }
    )
    return q


TESTDATA_EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampNTZType()),  # parquet Timestamp(MICROS, tz-naive)
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def _stream_table(spark: SparkSession, sf_dir: str, table: str, schema):
    """File-source readStream over ``{sf_dir}/{table}.parquet`` in EITHER
    physical shape the name can take:

    - a single parquet FILE (the driver's testdata fixture shape) — the
      file stream source rejects a plain file path, so stream ``sf_dir``
      with a ``pathGlobFilter`` selecting just that name;
    - a DIRECTORY of part files (the shape every Spark/Hive/Iceberg
      writer produces — i.e. the 100 TB production shape) — stream the
      directory itself. The glob-filter form is WRONG here:
      ``pathGlobFilter`` matches leaf file names, ``part-*.parquet``
      never equals ``events.parquet``, and the source returns a
      SILENTLY EMPTY stream (caught by the round-5 directory-shape
      differential sweep).

    The shape probe goes through the Hadoop FileSystem API, so it works
    for any scheme the source can read (local, HDFS, s3a), and an absent
    table raises loudly instead of inheriting the empty-glob silence.
    """
    path = f"{sf_dir}/{table}.parquet"
    reader = spark.readStream.schema(schema)
    if _is_directory(spark, path):
        return reader.parquet(path)
    return reader.option("pathGlobFilter", f"{table}.parquet").parquet(sf_dir)


def _is_directory(spark: SparkSession, path: str) -> bool:
    """Shape probe behind ``_stream_table``; raises on an absent path.

    Primary: the Hadoop FileSystem API via the py4j gateway — works for
    any scheme the source can read. Spark Connect sessions have no
    ``_jvm`` gateway, so local paths fall back to ``os.path``; remote
    schemes under Connect default to the directory form (the production
    layout — a single remote file is the fixture-only shape), where an
    absent path still fails loudly at stream start.
    """
    try:
        jvm, jsc = spark._jvm, spark._jsc
    except Exception:
        jvm = None
    if jvm is not None:
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(jsc.hadoopConfiguration())
        if not fs.exists(jpath):
            raise ValueError(f"stream source not found: {path}")
        return fs.getFileStatus(jpath).isDirectory()
    import os

    local = path[7:] if path.startswith("file://") else path
    if "://" not in local:
        if not os.path.exists(local):
            raise ValueError(f"stream source not found: {path}")
        return os.path.isdir(local)
    return True


def stream_testdata_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the driver's events.parquet.

    The file stores ts as parquet Timestamp(MICROS, isAdjustedToUTC=false):
    declare it TIMESTAMP_NTZ (exactly what the batch reader infers —
    sources.tables.load_table and this loader see the same instants) and
    cast to TIMESTAMP for the streaming machinery (watermarks, window(),
    the state API's epoch-ms timeouts all operate on instants). The
    session timezone is pinned to UTC first, so the NTZ->TIMESTAMP cast is
    identity on the naive value and results stay oracle-comparable
    regardless of the caller session's zone.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw = _stream_table(spark, sf_dir, "events", TESTDATA_EVENT_SCHEMA)
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    window_sec: int = 3600,
    watermark_delay: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream inner join within an event-time interval.

    The attribution join: for every left event (e.g. a click), all right
    events (e.g. purchases) by the same key with
    ``left.ts <= right.ts <= left.ts + window_sec``. Both sides carry a
    watermark and the join condition carries the time bound, so Spark
    derives a state-eviction horizon for BOTH buffers — without it a
    stream-stream join holds every row forever. State per side is
    O(rate × (window + delay)), independent of stream age: the only
    formulation that survives an unbounded stream on a 1000-executor
    cluster. Batch oracle: the plain interval theta-join (same predicate
    on the static table).

    Column names are suffixed _l/_r to keep the joined schema unambiguous.

    Returns (key, event_id_l, event_id_r, ts_l, ts_r, gap_sec).
    """
    l = left.withWatermark("ts", watermark_delay).select(
        F.col(key).alias("k_l"),
        F.col("event_id").alias("event_id_l"),
        F.col("ts").alias("ts_l"),
    )
    r = right.withWatermark("ts", watermark_delay).select(
        F.col(key).alias("k_r"),
        F.col("event_id").alias("event_id_r"),
        F.col("ts").alias("ts_r"),
    )
    joined = l.join(
        r,
        (F.col("k_l") == F.col("k_r"))
        & (F.col("ts_r") >= F.col("ts_l"))
        & (F.col("ts_r") <= F.col("ts_l") + F.expr(f"INTERVAL {window_sec} SECONDS")),
        how,
    )
    return joined.select(
        F.col("k_l").alias(key),
        "event_id_l",
        "event_id_r",
        F.unix_timestamp("ts_l").alias("ts_l_epoch"),
        F.unix_timestamp("ts_r").alias("ts_r_epoch"),
        (F.unix_timestamp("ts_r") - F.unix_timestamp("ts_l")).alias("gap_sec"),
    )


TESTDATA_DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def stream_testdata_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the driver's documents.parquet — the live half of
    the batch==stream corpus-curation contract (see
    plans/queries.py::streaming_corpus_gate_query). Shape-agnostic via
    ``_stream_table``: single-file fixture or part-file directory."""
    return _stream_table(spark, sf_dir, "documents", TESTDATA_DOC_SCHEMA)


def drain_hll_dashboard(
    stream: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 6,
):
    """Streaming distinct-count dashboard state: each micro-batch is
    sketched independently (``hll_registers`` — constant-size state per
    group) inside ``foreachBatch`` and the register rows accumulate on
    the driver; callers merge + estimate after the drain. The pattern a
    live dashboard runs unbounded: per-trigger partial sketches merged
    into serving state, never a re-scan of history — correctness rests
    on register max-linearity (merge(sketch(A), sketch(B)) ==
    sketch(A ∪ B)), which tests/test_streaming.py pins across REAL
    micro-batch boundaries. Returns (rows, terminated_query).
    """
    from ..operators.sketches import hll_registers

    acc: list = []

    def fb(batch: DataFrame, _bid: int) -> None:
        regs = hll_registers(batch, group_cols, value_col, p=p)
        acc.extend(regs.collect())  # <= m rows per group: sketch-sized

    q = (
        stream.writeStream.foreachBatch(fb)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return acc, q
