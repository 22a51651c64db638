"""GTFS time / date parsing helpers.

GTFS times are ``HH:MM:SS`` **with HH legally ≥ 24** (a 25:10:00 departure
belongs to the previous service day) — so they must NOT be parsed with
``to_timestamp``. Parity: gtfs-via-postgres stores these as intervals
(invocation /root/reference/import.sh:124); we store integer
seconds-since-service-midnight (SURVEY.md §1.2) and derive absolute
timestamps as service_date + seconds, interpreted in the agency timezone.

All helpers are pure column expressions — JVM-side, whole-stage codegen,
no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def gtfs_time_to_secs(col: Column | str) -> Column:
    """'25:10:00' -> 90600 (int seconds past service-day midnight).

    Malformed values yield NULL (try_cast semantics) so the cleaning layer's
    default-on-errors / drop-errors policies (SURVEY.md §2.B2/B3) can act.
    """
    c = _c(col)
    parts = F.split(c, ":")
    ok = c.rlike(r"^\d{1,3}:[0-5]\d:[0-5]\d$")
    secs = (
        parts.getItem(0).cast("int") * 3600
        + parts.getItem(1).cast("int") * 60
        + parts.getItem(2).cast("int")
    )
    return F.when(ok, secs).otherwise(F.lit(None).cast("int"))


def secs_to_gtfs_time(col: Column | str) -> Column:
    """90600 -> '25:10:00' (inverse of gtfs_time_to_secs, for writes)."""
    c = _c(col)
    return F.concat_ws(
        ":",
        F.lpad((c / 3600).cast("int").cast("string"), 2, "0"),
        F.lpad(((c % 3600) / 60).cast("int").cast("string"), 2, "0"),
        F.lpad((c % 60).cast("string"), 2, "0"),
    )


def gtfs_date(col: Column | str) -> Column:
    """'20240115' -> DATE. Invalid -> NULL."""
    return F.to_date(_c(col), "yyyyMMdd")


def absolute_timestamp(date_col: Column | str, secs_col: Column | str, tz_col: Column | str) -> Column:
    """service_date + seconds, interpreted in the agency timezone, as UTC.

    gtfs-via-postgres semantics (``(date + time_interval) AT TIME ZONE
    agency_timezone``, the arrivals_departures view generated at
    /root/reference/import.sh:124): calendar wall-clock addition, then a
    PostgreSQL-rules conversion to an instant. >24h times roll into the
    next wall day; in a DST gap both engines shift forward. The one
    divergence is the ambiguous fall-back hour: java.time resolves to the
    EARLIER instant (pre-transition offset) while PostgreSQL/ICU resolve
    to the LATER one (post-transition offset) — so after the base
    ``to_utc_timestamp`` we probe ``+1h`` and ``+30m`` (half-hour DST
    zones, e.g. Australia/Lord_Howe) candidates and keep the later
    instant iff it maps back to the same wall time. Pure column
    expressions, whole-stage codegen, no UDF; verified against the DuckDB
    oracle on both 2024 Europe/Berlin transitions (Q:
    arrivals_departures_abs).
    """
    tz = _c(tz_col)
    local = F.timestamp_add("SECOND", _c(secs_col), F.to_timestamp(_c(date_col)))
    u1 = F.to_utc_timestamp(local, tz)
    u_hour = F.timestamp_add("HOUR", F.lit(1), u1)
    u_half = F.timestamp_add("MINUTE", F.lit(30), u1)
    return (
        F.when(F.from_utc_timestamp(u_hour, tz) == local, u_hour)
        .when(F.from_utc_timestamp(u_half, tz) == local, u_half)
        .otherwise(u1)
    )
