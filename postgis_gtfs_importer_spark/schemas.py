"""GTFS Schedule table schemas.

One StructType per GTFS file, matching the column sets gtfs-to-sql loads
(invocation /root/reference/import.sh:124-132; the reference imports every
``*.txt`` in the feed, import.sh:130). Types follow SURVEY.md §1.2:

  * times stay raw strings in the RAW schemas (``HH:MM:SS`` with HH ≥ 24)
    and become IntegerType seconds in the TYPED view (functions.gtfs_time);
  * dates arrive ``yyyyMMdd`` strings → DateType on cast;
  * enums stay IntegerType codes;
  * trips.shape_id is nullable with no FK (``--trips-without-shape-id``,
    /root/reference/import.sh:125).

RAW schemas are all-string (CSV as-landed, PERMISSIVE with a
``_corrupt_record`` column to mirror gtfsclean's tolerant re-parse, B1 at
/root/reference/import.sh:50-52); the typed cast specs drive C2.
"""

from __future__ import annotations

from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

# Column name -> target Spark type ("secs" = GTFS time to int seconds,
# "date" = yyyyMMdd to DateType). Everything else: string.
GTFS_FILES: dict[str, dict[str, str]] = {
    "agency": {
        "agency_id": "string",
        "agency_name": "string",
        "agency_url": "string",
        "agency_timezone": "string",
        "agency_lang": "lang",
        "agency_phone": "string",
        "agency_fare_url": "string",
        "agency_email": "string",
    },
    "stops": {
        "stop_id": "string",
        "stop_code": "string",
        "stop_name": "string",
        "stop_desc": "string",
        "stop_lat": "double",
        "stop_lon": "double",
        "location_type": "int",
        "parent_station": "string",
        "wheelchair_boarding": "int",
        "platform_code": "string",
        "zone_id": "string",
        "stop_url": "string",
        "stop_timezone": "string",
        "level_id": "string",
    },
    "routes": {
        "route_id": "string",
        "agency_id": "string",
        "route_short_name": "string",
        "route_long_name": "string",
        "route_desc": "string",
        "route_type": "int",
        "route_color": "string",
        "route_text_color": "string",
        "route_url": "string",
        "route_sort_order": "int",
        "continuous_pickup": "int",
        "continuous_drop_off": "int",
    },
    "trips": {
        "route_id": "string",
        "service_id": "string",
        "trip_id": "string",
        "trip_headsign": "string",
        "direction_id": "int",
        "block_id": "string",
        "shape_id": "string",  # nullable, no FK (C5)
        "wheelchair_accessible": "int",
        "bikes_allowed": "int",
    },
    "stop_times": {
        "trip_id": "string",
        "arrival_time": "secs",
        "departure_time": "secs",
        "stop_id": "string",
        "stop_sequence": "int",
        "stop_headsign": "string",
        "pickup_type": "int",
        "drop_off_type": "int",
        "shape_dist_traveled": "double",
        "timepoint": "int",
        "continuous_pickup": "int",
        "continuous_drop_off": "int",
    },
    "calendar": {
        "service_id": "string",
        "monday": "int",
        "tuesday": "int",
        "wednesday": "int",
        "thursday": "int",
        "friday": "int",
        "saturday": "int",
        "sunday": "int",
        "start_date": "date",
        "end_date": "date",
    },
    "calendar_dates": {
        "service_id": "string",
        "date": "date",
        "exception_type": "int",
    },
    "shapes": {
        "shape_id": "string",
        "shape_pt_lat": "double",
        "shape_pt_lon": "double",
        "shape_pt_sequence": "int",
        "shape_dist_traveled": "double",
    },
    "frequencies": {
        "trip_id": "string",
        "start_time": "secs",
        "end_time": "secs",
        "headway_secs": "int",
        "exact_times": "int",
    },
    "transfers": {
        "from_stop_id": "string",
        "to_stop_id": "string",
        "transfer_type": "int",
        "min_transfer_time": "int",
    },
    "feed_info": {
        "feed_publisher_name": "string",
        "feed_publisher_url": "string",
        "feed_lang": "lang",
        "feed_start_date": "date",
        "feed_end_date": "date",
        "feed_version": "string",
        "default_lang": "lang",
        "feed_contact_email": "string",
        "feed_contact_url": "string",
    },
    "translations": {
        "table_name": "string",
        "field_name": "string",
        "language": "lang",
        "translation": "string",
        "record_id": "string",
        "record_sub_id": "string",
        "field_value": "string",
    },
    "pathways": {
        "pathway_id": "string",
        "from_stop_id": "string",
        "to_stop_id": "string",
        "pathway_mode": "int",
        "is_bidirectional": "int",
        "length": "double",
        "traversal_time": "int",
        "stair_count": "int",
        "max_slope": "double",
        "min_width": "double",
    },
    "levels": {
        "level_id": "string",
        "level_index": "double",
        "level_name": "string",
    },
    "attributions": {
        "attribution_id": "string",
        "agency_id": "string",
        "route_id": "string",
        "trip_id": "string",
        "organization_name": "string",
        "is_producer": "int",
        "is_operator": "int",
        "is_authority": "int",
        "attribution_url": "string",
        "attribution_email": "string",
    },
}

# Required (NOT NULL per spec) columns per file — drives B3 drop-errors.
REQUIRED: dict[str, list[str]] = {
    "agency": ["agency_name", "agency_url", "agency_timezone"],
    "stops": ["stop_id"],
    "routes": ["route_id", "route_type"],
    "trips": ["route_id", "service_id", "trip_id"],
    "stop_times": ["trip_id", "stop_id", "stop_sequence"],
    "calendar": ["service_id", "start_date", "end_date"],
    "calendar_dates": ["service_id", "date", "exception_type"],
    "shapes": ["shape_id", "shape_pt_lat", "shape_pt_lon", "shape_pt_sequence"],
    "frequencies": ["trip_id", "start_time", "end_time", "headway_secs"],
    "transfers": ["from_stop_id", "to_stop_id", "transfer_type"],
    "feed_info": ["feed_publisher_name", "feed_publisher_url", "feed_lang"],
    "translations": ["table_name", "field_name", "language", "translation"],
    "pathways": ["pathway_id", "from_stop_id", "to_stop_id", "pathway_mode", "is_bidirectional"],
    "levels": ["level_id", "level_index"],
    "attributions": ["organization_name"],
}

# Legal enum code sets — drives B2 default-on-errors / B3 drop policy.
ENUM_DOMAINS: dict[tuple[str, str], tuple[set[int], int | None]] = {
    # (file, column) -> (legal codes, default when invalid; None = null)
    ("routes", "route_type"): ({0, 1, 2, 3, 4, 5, 6, 7, 11, 12}, 3),
    ("stops", "location_type"): ({0, 1, 2, 3, 4}, 0),
    ("stops", "wheelchair_boarding"): ({0, 1, 2}, 0),
    ("stop_times", "pickup_type"): ({0, 1, 2, 3}, 0),
    ("stop_times", "drop_off_type"): ({0, 1, 2, 3}, 0),
    ("stop_times", "timepoint"): ({0, 1}, 1),
    ("trips", "direction_id"): ({0, 1}, None),
    ("trips", "wheelchair_accessible"): ({0, 1, 2}, 0),
    ("trips", "bikes_allowed"): ({0, 1, 2}, 0),
    ("calendar_dates", "exception_type"): ({1, 2}, None),
    ("frequencies", "exact_times"): ({0, 1}, 0),
    ("transfers", "transfer_type"): ({0, 1, 2, 3}, 0),
    ("pathways", "pathway_mode"): ({1, 2, 3, 4, 5, 6, 7}, 1),
    ("pathways", "is_bidirectional"): ({0, 1}, 0),
}


def raw_schema(name: str) -> T.StructType:
    """All-string CSV schema + _corrupt_record (PERMISSIVE parse, B1)."""
    fields = [T.StructField(c, T.StringType(), True) for c in GTFS_FILES[name]]
    fields.append(T.StructField(CORRUPT_COL, T.StringType(), True))
    return T.StructType(fields)


def typed_schema(name: str) -> T.StructType:
    """Post-cast schema (C2/C3 applied)."""
    spark_type = {
        "string": T.StringType(),
        "lang": T.StringType(),
        "int": T.IntegerType(),
        "double": T.DoubleType(),
        "date": T.DateType(),
        "secs": T.IntegerType(),
    }
    return T.StructType(
        [T.StructField(c, spark_type[t], True) for c, t in GTFS_FILES[name].items()]
    )
