"""Deterministic synthetic GTFS feed generator — benchmark-scale input.

The reference's headline operation is the import itself (importDurationMs,
/root/reference/import.js:267-277); benchmarking it needs a feed whose
volume is sf0.1-class, not the 11-row fixture. This generator writes a
spec-shaped feed (same columns tests/gtfs_fixtures.py uses, i.e. what
sources.gtfs_feed.read_feed parses) with volume knobs, fully
deterministic (pure arithmetic, no RNG) so the composite feed digest is
stable across runs — which also lets the bench demonstrate the A6 gate:
re-importing the same synthetic feed must be a digest-gated no-op.

Scale anatomy at scale=1.0 (the bench default):
    5 agencies, 100 routes, 10 services over a 14-day window,
    2,000 stops, 5,000 trips x 25 stop_times = 125,000 stop_times,
    300 shapes x 150 points = 45,000 shape rows, 100 frequency rows.
The dominant derived relation, arrivals_departures (C11), expands to
~1.7M rows — stop_times x service days — which is what makes the bench
measure real expansion + write cost rather than per-run overhead.
"""

from __future__ import annotations

import os
import zipfile


def _hms(sec: int) -> str:
    """Seconds-past-service-midnight -> HH:MM:SS, HH may exceed 24."""
    return f"{sec // 3600:02d}:{sec % 3600 // 60:02d}:{sec % 60:02d}"


def synth_feed_files(scale: float = 1.0) -> dict[str, str]:
    """Build the feed as {filename: csv_text}; all volumes scale linearly
    except the service window (fixed 14 days — the expansion multiplier
    belongs to time, not feed size)."""
    n_agencies = 5
    n_routes = max(5, int(100 * scale))
    n_services = 10
    n_stops = max(50, int(2000 * scale))
    n_trips = max(20, int(5000 * scale))
    stops_per_trip = 25
    n_shapes = max(5, int(300 * scale))
    shape_pts = 150

    agency = ["agency_id,agency_name,agency_url,agency_timezone,agency_lang,agency_phone"]
    for a in range(n_agencies):
        agency.append(
            f"A{a},Agency {a},https://a{a}.example,Europe/Berlin,de,030-{a}"
        )

    routes = ["route_id,agency_id,route_short_name,route_long_name,route_type,route_color,route_text_color"]
    for r in range(n_routes):
        routes.append(
            f"R{r},A{r % n_agencies},L{r},Line {r} Express,{(r % 5) or 3},0000FF,FFFFFF"
        )

    stops = ["stop_id,stop_code,stop_name,stop_lat,stop_lon,location_type,parent_station,wheelchair_boarding,platform_code"]
    for s in range(n_stops):
        lat = 52.3 + (s % 500) * 0.0008
        lon = 13.1 + (s // 500) * 0.0008 + (s % 17) * 0.00003
        stops.append(
            f"S{s},C{s},Stop {s},{lat:.6f},{lon:.6f},0,,{s % 3},"
        )

    # weekly patterns: service k runs on days where bit k of a rolling
    # pattern is set; all cover the same 14-day window
    calendar = ["service_id,monday,tuesday,wednesday,thursday,friday,saturday,sunday,start_date,end_date"]
    for k in range(n_services):
        days = ",".join("1" if (k + d) % 3 != 0 else "0" for d in range(7))
        calendar.append(f"SV{k},{days},20240101,20240114")
    caldates = ["service_id,date,exception_type"]
    for k in range(0, n_services, 2):  # a removed day + an added day each
        caldates.append(f"SV{k},2024010{1 + k % 9},2")
        caldates.append(f"SV{k},2024011{k % 5},1")

    trips = ["route_id,service_id,trip_id,trip_headsign,direction_id,block_id,shape_id,wheelchair_accessible,bikes_allowed"]
    stop_times = ["trip_id,arrival_time,departure_time,stop_id,stop_sequence,stop_headsign,pickup_type,drop_off_type,shape_dist_traveled,timepoint"]
    for t in range(n_trips):
        shape = f"SH{t % n_shapes}" if t % 11 != 0 else ""  # C5 nullable FK
        trips.append(
            f"R{t % n_routes},SV{t % n_services},T{t},Head {t % 40},{t % 2},,{shape},1,1"
        )
        # one late trip in ~40 crosses midnight (>24h times, C3)
        start = (23 * 3600 + 1800) if t % 40 == 0 else (4 * 3600 + (t % 1200) * 60)
        for i in range(stops_per_trip):
            arr = start + i * 120
            dep = arr + (30 if i % 4 == 0 else 0)
            stop = (t * 7 + i * 13) % n_stops
            stop_times.append(
                f"T{t},{_hms(arr)},{_hms(dep)},S{stop},{i + 1},,0,0,{i * 0.4:.1f},1"
            )

    shapes = ["shape_id,shape_pt_lat,shape_pt_lon,shape_pt_sequence,shape_dist_traveled"]
    for sh in range(n_shapes):
        for p in range(shape_pts):
            lat = 52.3 + ((sh * 31 + p) % 700) * 0.0006
            lon = 13.1 + ((sh * 17 + p * 3) % 700) * 0.0006
            shapes.append(f"SH{sh},{lat:.6f},{lon:.6f},{p + 1},{p * 0.1:.1f}")

    freqs = ["trip_id,start_time,end_time,headway_secs,exact_times"]
    # exactly min(100, n_trips) rows spread evenly over the trip range —
    # an earlier form conflated the row-count cap with the range STOP
    # (range(0, min(n_trips, 100*scale), n_trips//100)), emitting 2 rows
    # at scale=1.0 and MORE rows at smaller scales than larger ones,
    # invalidating the documented feed anatomy
    step = max(1, n_trips // 100)
    for i in range(min(100, n_trips)):
        t = i * step
        freqs.append(f"T{t},06:00:00,09:00:00,{600 + (t % 4) * 300},0")

    feed_info = [
        "feed_publisher_name,feed_publisher_url,feed_lang,feed_start_date,feed_end_date,feed_version",
        "Synthetic Bench Feed,https://bench.example,de,20240101,20240114,v1",
    ]

    return {
        "agency.txt": "\n".join(agency) + "\n",
        "routes.txt": "\n".join(routes) + "\n",
        "stops.txt": "\n".join(stops) + "\n",
        "calendar.txt": "\n".join(calendar) + "\n",
        "calendar_dates.txt": "\n".join(caldates) + "\n",
        "trips.txt": "\n".join(trips) + "\n",
        "stop_times.txt": "\n".join(stop_times) + "\n",
        "shapes.txt": "\n".join(shapes) + "\n",
        "frequencies.txt": "\n".join(freqs) + "\n",
        "feed_info.txt": "\n".join(feed_info) + "\n",
    }


def write_synth_feed_zip(zip_path: str, scale: float = 1.0) -> str:
    """Write the synthetic feed as a GTFS zip; returns the path."""
    os.makedirs(os.path.dirname(zip_path) or ".", exist_ok=True)
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
        for fname, content in synth_feed_files(scale).items():
            z.writestr(fname, content)
    return zip_path
