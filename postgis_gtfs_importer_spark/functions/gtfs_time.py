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

    Correctly handles >24h times across DST transitions: the local wall time
    is computed from the service-day midnight in the agency tz, then
    converted to UTC (gtfs-via-postgres arrivals_departures semantics,
    SURVEY.md §2.C11).
    """
    local = F.timestamp_add("SECOND", _c(secs_col), F.to_timestamp(_c(date_col)))
    return F.to_utc_timestamp(local, _c(tz_col))
