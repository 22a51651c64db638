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

Schemas mirror the three public GTFS-Realtime feed types flattened to
columns: TripUpdate/StopTimeEvent (trip_id, stop_sequence, delay
seconds, timestamp), VehiclePosition (vehicle + trip descriptors,
position, current status), and Alert (one row per informed entity,
active period, cause/effect/severity) — the full surface a transit
consumer polls, each with the same exact-resend suppression and
stream-static join against the published snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DateType,
    DoubleType,
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


VEHICLE_POSITION_SCHEMA = StructType(
    [
        StructField("vehicle_id", StringType()),
        StructField("trip_id", StringType()),
        StructField("lat", DoubleType()),
        StructField("lon", DoubleType()),
        StructField("bearing", DoubleType()),
        StructField("speed_mps", DoubleType()),
        StructField("current_stop_sequence", IntegerType()),
        StructField("current_status", StringType()),
        StructField("ts", TimestampType()),
        StructField("update_id", LongType()),
    ]
)

#: GTFS-Realtime VehicleStopStatus enum, flattened to strings the way a
#: JSON feed mirror publishes them.
VEHICLE_STATUSES = ("INCOMING_AT", "STOPPED_AT", "IN_TRANSIT_TO")


def stream_vehicle_positions(
    spark: SparkSession, path: str, watermark_delay: str = "10 minutes"
) -> DataFrame:
    """File-source VehiclePositions stream — the second public GTFS-RT
    feed type (after TripUpdates) a transit consumer subscribes to.
    Same EXACT-RESEND suppression as :func:`stream_trip_updates`: the
    feed republishes every vehicle's last known position each poll
    cycle, so duplicates key on the FULL fix content (vehicle, trip,
    lat/lon, bearing, speed, stop_sequence, status, ts); a MOVED
    vehicle (any of those fields changed — including a turn in place
    that only alters bearing — or the same fix re-stamped with a new
    ts) flows through. Keying on vehicle_id alone would freeze each
    vehicle's first fix for the watermark horizon; update_id stays OUT
    of the key precisely so that pure resends (new envelope id, same
    content) are suppressed. Latest-fix-per-vehicle is the SERVING
    layer's job (MERGE sink, winner = max(ts, update_id)), exactly the
    TripUpdate split.
    """
    raw = spark.readStream.schema(VEHICLE_POSITION_SCHEMA).parquet(path)
    return raw.withWatermark(
        "ts", watermark_delay
    ).dropDuplicatesWithinWatermark(
        ["vehicle_id", "trip_id", "lat", "lon", "bearing", "speed_mps",
         "current_stop_sequence", "current_status", "ts"]
    )


def vehicle_positions_enriched(
    positions: DataFrame, trips: DataFrame, routes: DataFrame
) -> DataFrame:
    """Stream-static join: each vehicle fix enriched with its trip's
    route metadata from the PUBLISHED snapshot (trips ⋈ routes re-read
    per micro-batch, so a blue/green pointer flip is picked up on the
    next batch — the TripUpdate design). Inner join on trip_id: a fix
    for a trip the published snapshot doesn't know has nothing to
    enrich (it surfaces through the unjoined raw stream, not here).
    No streaming state beyond the dedup watermark; the static side is
    dimension-sized, so Catalyst broadcasts it per batch.
    """
    static_side = trips.select(
        "trip_id", "route_id", "service_id", "trip_headsign", "direction_id"
    ).join(
        routes.select("route_id", "route_short_name", "route_type"),
        "route_id",
    )
    return positions.join(static_side, "trip_id", "inner").select(
        "vehicle_id",
        "trip_id",
        "route_id",
        "route_short_name",
        "route_type",
        "trip_headsign",
        "direction_id",
        "lat",
        "lon",
        "bearing",
        "speed_mps",
        "current_stop_sequence",
        "current_status",
        "ts",
    )


ALERT_SCHEMA = StructType(
    [
        StructField("alert_id", StringType()),
        StructField("route_id", StringType()),
        StructField("stop_id", StringType()),
        StructField("active_start", TimestampType()),
        StructField("active_end", TimestampType()),
        StructField("cause", StringType()),
        StructField("effect", StringType()),
        StructField("severity", StringType()),
        StructField("header_text", StringType()),
        StructField("ts", TimestampType()),
        StructField("update_id", LongType()),
    ]
)


def stream_alerts(
    spark: SparkSession, path: str, watermark_delay: str = "10 minutes"
) -> DataFrame:
    """File-source service Alerts stream — the third public GTFS-RT
    feed type. One row per (alert, informed entity): an alert naming
    two routes arrives as two rows sharing alert_id, the flattened
    form of the protobuf's repeated informed_entity (either route_id
    or stop_id set, or both for a route+stop-scoped entity).
    Exact-resend suppression keys on (alert_id, entity, active period,
    ts): feeds republish the full active-alert set each poll, while a
    REVISED alert (extended active_end, re-stamped ts) must flow
    through — the TripUpdate first-wins-per-content discipline.
    """
    raw = spark.readStream.schema(ALERT_SCHEMA).parquet(path)
    return raw.withWatermark(
        "ts", watermark_delay
    ).dropDuplicatesWithinWatermark(
        ["alert_id", "route_id", "stop_id",
         "active_start", "active_end", "ts"]
    )


def alerts_for_departures(
    alerts: DataFrame, arrivals_departures: DataFrame
) -> DataFrame:
    """Stream-static interval join: every scheduled departure affected
    by an incoming alert — matched when the alert's informed entity
    names the departure's route OR stop, and the scheduled departure
    instant falls inside [active_start, active_end) (a NULL
    active_end is open-ended, per the GTFS-RT spec's "until further
    notice").

    The entity disjunction is split into two equi-joins (route-scoped
    ∪ stop-scoped) rather than one OR-join: an OR predicate would
    force a nested-loop over stream x static, while each arm keys on
    its entity column and lets Catalyst broadcast the static side per
    batch. An entity row naming BOTH route and stop matches only
    departures satisfying both (the narrower scope, spec semantics) —
    the route arm requires the stop to agree when present, and the
    stop arm handles stop-only entities, so no (route, stop) pair is
    emitted twice. Deduplication across GENUINELY overlapping separate
    entities of one alert (e.g. route R1 and stop S1 rows both
    matching the same departure) is the serving layer's distinct.
    """
    static_side = arrivals_departures.select(
        "trip_id",
        "route_id",
        "stop_id",
        "stop_sequence",
        "date",
        "departure_time",
        "t_departure",
    )
    in_window = (F.col("t_departure") >= F.col("active_start")) & (
        F.col("active_end").isNull()
        | (F.col("t_departure") < F.col("active_end"))
    )
    out_cols = [
        "alert_id", "cause", "effect", "severity", "header_text",
        "trip_id", "route_id", "stop_id", "stop_sequence", "date",
        "departure_time", "t_departure", "ts",
    ]
    route_arm = (
        alerts.filter(F.col("route_id").isNotNull())
        .withColumnRenamed("stop_id", "_alert_stop")
        .join(static_side, "route_id", "inner")
        .filter(
            F.col("_alert_stop").isNull()
            | (F.col("_alert_stop") == F.col("stop_id"))
        )
        .filter(in_window)
        .select(*out_cols)
    )
    stop_arm = (
        alerts.filter(
            F.col("route_id").isNull() & F.col("stop_id").isNotNull()
        )
        .drop("route_id")
        .join(static_side, "stop_id", "inner")
        .filter(in_window)
        .select(*out_cols)
    )
    return route_arm.unionByName(stop_arm)


#: TripUpdate rows carrying the spec's schedule_relationship pair
#: (trip-level and per-stop_time_update), flattened like the other
#: feed mirrors: a trip-level CANCELED arrives as ONE row with
#: stop_sequence NULL; a SKIPPED stop_time_update as one row naming
#: its stop_sequence. start_date scopes the cancellation to a single
#: service date when the feed sets the trip descriptor's start_date
#: (NULL = every service date of the trip, the alerts narrower-scope
#: discipline applied to cancellations).
TRIP_UPDATE_FULL_SCHEMA = StructType(
    [
        StructField("trip_id", StringType()),
        StructField("stop_sequence", IntegerType()),
        StructField("delay_sec", IntegerType()),
        StructField("trip_sched_rel", StringType()),
        StructField("stop_sched_rel", StringType()),
        StructField("start_date", DateType()),
        # ADDED-trip stop_time_updates carry ABSOLUTE times and stop
        # ids (there is no schedule row to apply a delay to); NULL on
        # SCHEDULED/CANCELED rows
        StructField("stop_id", StringType()),
        StructField("t_departure", TimestampType()),
        StructField("ts", TimestampType()),
        StructField("update_id", LongType()),
    ]
)

#: GTFS-Realtime TripDescriptor.ScheduleRelationship /
#: StopTimeUpdate.ScheduleRelationship values a consumer acts on here.
TRIP_CANCELED = "CANCELED"
TRIP_ADDED = "ADDED"
STOP_SKIPPED = "SKIPPED"


def stream_trip_updates_full(
    spark: SparkSession, path: str, watermark_delay: str = "10 minutes"
) -> DataFrame:
    """File-source TripUpdate stream INCLUDING schedule_relationship —
    the :func:`stream_trip_updates` surface extended with the spec
    fields an arrivals board must subtract (VERDICT r10 item 4): a
    CANCELED trip and a SKIPPED stop_time_update are *negative*
    information the delay-only schema cannot carry. Same exact-resend
    suppression, keyed on the full content (the relationship fields
    and start_date are content: a feed flipping a trip from SCHEDULED
    to CANCELED re-sends the same trip/ts with changed relationship,
    and that revision MUST flow through); update_id stays out of the
    key so pure envelope resends are suppressed."""
    raw = spark.readStream.schema(TRIP_UPDATE_FULL_SCHEMA).parquet(path)
    return raw.withWatermark(
        "ts", watermark_delay
    ).dropDuplicatesWithinWatermark(
        ["trip_id", "stop_sequence", "delay_sec",
         "trip_sched_rel", "stop_sched_rel", "start_date",
         "stop_id", "t_departure", "ts"]
    )


def cancellation_tombstones(
    updates: DataFrame, arrivals_departures: DataFrame
) -> DataFrame:
    """Stream-static join producing one TOMBSTONE row per published
    departure a TripUpdate retracts — the realtime-MINUS-schedule
    half of the diff view the reference's consumers (arrivals boards
    fed from the C11 relation, gtfs-via-postgres
    arrivals_departures) need once realtime exists: a trip-level
    CANCELED retracts EVERY scheduled row of the trip (on its
    start_date when given, else all service dates), a SKIPPED
    stop_time_update retracts exactly its (trip, stop_sequence) row.

    Two equi-join arms on the same narrower-scope pattern as
    :func:`alerts_for_departures` — the trip arm keys on trip_id
    alone and fans out to the trip's schedule rows, the skip arm keys
    on (trip_id, stop_sequence); each joins the static side
    per-batch (Catalyst broadcasts the stream side or shuffles, its
    choice), no OR predicate, no streaming state beyond the source
    dedup. A SKIPPED row inside a trip that is ALSO canceled emits
    its tombstone twice across the two arms — retraction is
    idempotent (the board subtraction is an anti-join), so no dedup
    is spent on it.

    Returns (trip_id, stop_sequence, stop_id, date, t_departure,
    reason, ts): ``reason`` is TRIP_CANCELED or STOP_SKIPPED, ``ts``
    the update's event time (watermark-compatible for downstream
    windowed sinks)."""
    static_side = arrivals_departures.select(
        "trip_id", "stop_sequence", "stop_id", "date", "t_departure"
    )
    date_scope = F.col("start_date").isNull() | (
        F.col("start_date") == F.col("date")
    )
    out = [
        "trip_id", "stop_sequence", "stop_id", "date", "t_departure",
        "reason", "ts",
    ]
    trip_arm = (
        updates.filter(F.col("trip_sched_rel") == TRIP_CANCELED)
        .select(
            "trip_id", "start_date", "ts",
            F.lit(TRIP_CANCELED).alias("reason"),
        )
        .join(static_side, "trip_id", "inner")
        .filter(date_scope)
        .select(*out)
    )
    skip_arm = (
        updates.filter(
            (F.col("stop_sched_rel") == STOP_SKIPPED)
            & F.col("stop_sequence").isNotNull()
        )
        .select(
            "trip_id", "stop_sequence", "start_date", "ts",
            F.lit(STOP_SKIPPED).alias("reason"),
        )
        .join(static_side, ["trip_id", "stop_sequence"], "inner")
        .filter(date_scope)
        .select(*out)
    )
    return trip_arm.unionByName(skip_arm)


def apply_departure_tombstones(
    arrivals_departures: DataFrame, tombstones: DataFrame
) -> DataFrame:
    """The departures BOARD after retraction: schedule MINUS the
    tombstoned (trip, stop_sequence, date) rows — one LEFT ANTI join,
    idempotent under duplicate tombstones. Both sides are BATCH
    relations by design: like realtime_departures' full-board note,
    the subtraction runs in the serving layer (foreachBatch / the
    MERGE sink's table), because a static-minus-stream anti-join is
    not expressible stream-side — the stream can only ADD retraction
    facts, the board applies them. At scale the tombstone side is
    incident-sized (canceled trips, skipped stops), so Catalyst
    broadcasts it against the schedule fact."""
    keys = tombstones.select(
        "trip_id", "stop_sequence", "date"
    ).dropDuplicates()
    return arrivals_departures.join(
        keys, ["trip_id", "stop_sequence", "date"], "left_anti"
    )


def added_trip_departures(updates: DataFrame) -> DataFrame:
    """Board rows for ADDED trips — the third TripDescriptor
    relationship a consumer acts on (SCHEDULED: apply delay, CANCELED:
    retract, ADDED: a trip with NO schedule row at all, its
    stop_time_updates carrying absolute times). Pure stream-side
    projection — there is nothing static to join: the published
    snapshot by definition does not know the trip. Rows must name a
    stop_sequence, a stop_id and an absolute t_departure to be
    boardable; a SKIPPED stop_time_update inside an added trip is
    dropped here directly (no tombstone machinery needed — the trip
    has no schedule rows to subtract from). ``date`` is the trip
    descriptor's start_date when given, else the departure's own UTC
    date — the service-date convention of the C11 relation.

    Returns (trip_id, stop_sequence, stop_id, date, t_departure,
    reason, ts) — the tombstone shape with reason=ADDED, so board
    assembly (:func:`full_departures_board`) treats retractions and
    additions as one diff stream."""
    return (
        updates.filter(
            (F.col("trip_sched_rel") == TRIP_ADDED)
            & F.col("stop_sequence").isNotNull()
            & F.col("stop_id").isNotNull()
            & F.col("t_departure").isNotNull()
            & (
                F.col("stop_sched_rel").isNull()
                | (F.col("stop_sched_rel") != STOP_SKIPPED)
            )
        )
        .select(
            "trip_id",
            "stop_sequence",
            "stop_id",
            F.coalesce(
                F.col("start_date"), F.to_date("t_departure")
            ).alias("date"),
            "t_departure",
            F.lit(TRIP_ADDED).alias("reason"),
            "ts",
        )
    )


def full_departures_board(
    arrivals_departures: DataFrame,
    tombstones: DataFrame,
    added: DataFrame,
) -> DataFrame:
    """The complete realtime diff view over the published schedule:
    schedule MINUS canceled/skipped rows PLUS added-trip rows — what
    the reference's arrivals-board consumers (gtfs-via-postgres
    arrivals_departures, /root/reference/readme.md's PostgREST
    surface) would serve once realtime exists. Batch-side like
    :func:`apply_departure_tombstones` and for the same reason (the
    board is serving state; streams contribute diff FACTS). Added
    rows carry no static metadata (route, headsign — the snapshot
    does not know the trip), so schedule-only columns are NULL on
    them and ``source`` says which side each row came from.
    Idempotent under duplicate tombstones AND duplicate added rows
    (additions are distinct'd on the board key, latest-ts wins is
    the MERGE sink's job upstream)."""
    kept = apply_departure_tombstones(arrivals_departures, tombstones)
    add_rows = (
        added.select(
            "trip_id", "stop_sequence", "stop_id", "date", "t_departure"
        )
        .dropDuplicates(["trip_id", "stop_sequence", "date"])
        .withColumn("source", F.lit(TRIP_ADDED))
    )
    return kept.withColumn("source", F.lit("SCHEDULE")).unionByName(
        add_rows, allowMissingColumns=True
    )
