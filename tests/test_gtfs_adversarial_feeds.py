"""Degraded-feed sweep: the full GTFS pipeline (read → clean → every
derivation) must SURVIVE the feed shapes real agencies actually publish,
degraded systematically rather than one anecdote at a time:

  * required files only           — every optional .txt absent
  * header-only optional files    — present, zero data rows
  * blank optional columns        — present, every optional cell empty
  * UTF-8 BOM + CRLF everywhere   — the canonical Windows-export artifact
  * calendar_dates-only service   — no calendar.txt (Swiss-style feeds)

Entries may return empty frames; they may not crash. The sibling sweep
for the analytics registry is tests/test_empty_input_sweep.py; this one
covers the GTFS-domain surface the registry reaches only through
fixture feeds. (Reference front-line: gtfsclean tolerant parsing,
/root/reference/import.sh:50-52.)
"""

from __future__ import annotations

import csv
import io

import pytest

from postgis_gtfs_importer_spark.operators import cleaning as CL
from postgis_gtfs_importer_spark.operators import derivations as DV
from postgis_gtfs_importer_spark.sources import gtfs_feed as GF

from .gtfs_fixtures import FEED_FILES, write_feed_dir

REQUIRED_FILES = {
    "agency.txt", "stops.txt", "routes.txt", "trips.txt",
    "stop_times.txt", "calendar.txt",
}

# Columns kept (non-blank) in the blank-optionals variant: the GTFS
# required/conditionally-required core each file needs to stay loadable.
KEEP_COLS = {
    "agency.txt": {"agency_id", "agency_name", "agency_url", "agency_timezone"},
    "stops.txt": {"stop_id", "stop_name", "stop_lat", "stop_lon"},
    "routes.txt": {"route_id", "agency_id", "route_short_name", "route_type"},
    "trips.txt": {"route_id", "service_id", "trip_id"},
    "stop_times.txt": {
        "trip_id", "arrival_time", "departure_time", "stop_id", "stop_sequence",
    },
    "calendar.txt": None,        # all required
    "calendar_dates.txt": None,  # all required
    "shapes.txt": {"shape_id", "shape_pt_lat", "shape_pt_lon", "shape_pt_sequence"},
    "frequencies.txt": {"trip_id", "start_time", "end_time", "headway_secs"},
    "transfers.txt": {"from_stop_id", "to_stop_id", "transfer_type"},
    "feed_info.txt": {"feed_publisher_name", "feed_publisher_url", "feed_lang"},
    "translations.txt": {"table_name", "field_name", "language", "translation"},
    "pathways.txt": {
        "pathway_id", "from_stop_id", "to_stop_id", "pathway_mode",
        "is_bidirectional",
    },
    "levels.txt": {"level_id", "level_index"},
    "attributions.txt": {"organization_name"},
}


def _blank_optionals(content: str, keep: set[str] | None) -> str:
    if keep is None:
        return content
    rows = list(csv.reader(io.StringIO(content)))
    header = rows[0]
    out = io.StringIO()
    w = csv.writer(out, lineterminator="\n")
    w.writerow(header)
    for r in rows[1:]:
        w.writerow([v if header[i] in keep else "" for i, v in enumerate(r)])
    return out.getvalue()


def _variants() -> dict[str, dict[str, str]]:
    header_only = {
        k: (v if k in REQUIRED_FILES else v.split("\n", 1)[0] + "\n")
        for k, v in FEED_FILES.items()
    }
    blank = {k: _blank_optionals(v, KEEP_COLS[k]) for k, v in FEED_FILES.items()}
    bom_crlf = {
        k: "﻿" + v.replace("\n", "\r\n") for k, v in FEED_FILES.items()
    }
    # Service purely via calendar_dates: WKX already is; add WK and DST.
    cal_dates_only = {k: v for k, v in FEED_FILES.items() if k != "calendar.txt"}
    cal_dates_only["calendar_dates.txt"] = (
        FEED_FILES["calendar_dates.txt"]
        + "".join(
            f"WK,{d},1\n"
            for d in ["20240101", "20240102", "20240104", "20240105",
                      "20240106", "20240108"]
        )
        + "DST,20240330,1\nDST,20240331,1\n"
    )
    return {
        "required_only": {
            k: v for k, v in FEED_FILES.items() if k in REQUIRED_FILES
        },
        "header_only_optionals": header_only,
        "blank_optionals": blank,
        "bom_crlf": bom_crlf,
        "calendar_dates_only": cal_dates_only,
    }


VARIANTS = _variants()


@pytest.mark.parametrize("variant", sorted(VARIANTS))
def test_pipeline_survives_degraded_feed(spark, tmp_path, variant):
    d = write_feed_dir(str(tmp_path / variant), VARIANTS[variant])
    feed = GF.read_feed(spark, d)
    # the required core must have parsed as data, not corrupt records
    assert feed["stops"].filter(feed["stops"].stop_id.isNotNull()).count() > 0
    assert feed["trips"].count() > 0
    cleaned = CL.clean_feed(feed)
    for fn in (
        CL.validation_report,
        DV.service_days,
        DV.arrivals_departures,
        DV.connections,
        DV.shapes_aggregated,
        DV.shapes_wkt,
        DV.frequencies_expanded,
        DV.stats_by_route_date,
        DV.stats_by_agency_route_stop_hour,
        DV.active_trips_by_hour,
    ):
        assert fn(cleaned).count() >= 0, fn.__name__
    translated = DV.apply_feed_translations(cleaned, "en")
    assert translated["stops"].count() >= 0
    # service must exist in every variant (all keep a service definition)
    assert DV.service_days(cleaned).count() > 0


def test_no_service_definition_raises(spark, tmp_path):
    """calendar.txt AND calendar_dates.txt absent → loud structural
    error, not an opaque crash or a silently empty snapshot."""
    files = {
        k: v
        for k, v in FEED_FILES.items()
        if k not in ("calendar.txt", "calendar_dates.txt")
    }
    d = write_feed_dir(str(tmp_path / "nosvc"), files)
    feed = GF.read_feed(spark, d)
    with pytest.raises(ValueError, match="defines no service"):
        DV.service_days(feed)
    with pytest.raises(ValueError, match="defines no service"):
        DV.arrivals_departures(feed)
