"""GTFS-Realtime-shaped streaming: live delays over the static timetable.

The reference imports only static GTFS Schedule (SURVEY §2.D: no
streaming); GTFS-Realtime is the natural continuous companion — trip
updates (delays) arriving as events. The Spark-idiomatic treatment is a
STREAM-STATIC JOIN: the static side (the published arrivals_departures
snapshot) is a plain DataFrame re-read per micro-batch, the stream side
carries (trip_id, delay, event time) — no state beyond the dedup
watermark, and the static side picks up a new snapshot on the next batch
after a pointer flip (the blue/green design composes with streaming for
free).

Schema mirrors the public GTFS-Realtime TripUpdate/StopTimeEvent shape
(trip_id, stop_sequence, delay seconds, timestamp) flattened to columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TRIP_UPDATE_SCHEMA = StructType(
    [
        StructField("trip_id", StringType()),
        StructField("stop_sequence", IntegerType()),
        StructField("delay_sec", IntegerType()),
        StructField("ts", TimestampType()),
        StructField("update_id", LongType()),
    ]
)


def stream_trip_updates(
    spark: SparkSession, path: str, watermark_delay: str = "10 minutes"
) -> DataFrame:
    """File-source TripUpdate stream with EXACT-RESEND suppression:
    feeds re-send identical updates every poll, so duplicates are keyed
    on the full update content (trip, stop, delay, ts). REVISED updates
    (a new delay estimate, or the same estimate re-stamped) flow
    through — ``dropDuplicatesWithinWatermark`` keeps the FIRST row per
    key, so keying on (trip, stop) alone would freeze the first
    estimate for the whole watermark horizon, the opposite of what a
    delay board needs. Latest-wins resolution belongs to the SERVING
    layer: the foreachBatch MERGE sink (streaming/merge_sink) with
    winner-per-pk = max(ts, update_id), where it also covers revisions
    that arrive in different micro-batches."""
    raw = spark.readStream.schema(TRIP_UPDATE_SCHEMA).parquet(path)
    return raw.withWatermark("ts", watermark_delay).dropDuplicatesWithinWatermark(
        ["trip_id", "stop_sequence", "delay_sec", "ts"]
    )


def realtime_departures(
    updates: DataFrame, arrivals_departures: DataFrame
) -> DataFrame:
    """Stream-static join: live delay applied to the scheduled timetable.

    The static side is the C11 arrivals_departures relation (from the
    published snapshot); each micro-batch joins the incoming updates
    against it — broadcast or shuffled per Catalyst's choice, no
    streaming state involved. Emits one row per UPDATE enriched with
    its schedule (inner join: an update for an unknown trip/stop has no
    schedule to enrich). An update whose optional delay field is absent
    coalesces to 0 — GTFS-RT's "on time unless stated". The full
    departures BOARD (every scheduled row, updated or not) is a serving
    view: static LEFT JOIN the merged update state, built in
    foreachBatch/the MERGE sink where both sides are batch relations —
    a stream-left outer join cannot emit static rows that never had a
    stream match.
    """
    static_side = arrivals_departures.select(
        "trip_id",
        "stop_sequence",
        "stop_id",
        "date",
        "departure_time",
        "t_departure",
    )
    return (
        updates.join(static_side, ["trip_id", "stop_sequence"], "inner")
        .withColumn(
            "t_departure_rt",
            F.col("t_departure")
            + F.make_dt_interval(secs=F.coalesce("delay_sec", F.lit(0))),
        )
        .select(
            "trip_id",
            "stop_sequence",
            "stop_id",
            "date",
            "departure_time",
            "t_departure",
            "delay_sec",
            "t_departure_rt",
            "ts",
        )
    )
