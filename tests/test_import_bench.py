"""The end-to-end import benchmark path (bench.py's import_e2e stage):
synthetic feed generation, the full pipeline run, and the A6 skip-gate —
at toy scale so CI covers exactly what the bench times at sf0.1 scale."""

from __future__ import annotations

import zipfile

import pytest

from postgis_gtfs_importer_spark.plans.import_bench import (
    pg_server_available,
    run_import_bench,
)
from postgis_gtfs_importer_spark.sources.synth_feed import (
    synth_feed_files,
    write_synth_feed_zip,
)


def test_synth_feed_is_deterministic_and_spec_shaped(tmp_path):
    a = synth_feed_files(0.02)
    b = synth_feed_files(0.02)
    assert a == b  # byte-identical -> stable composite digest (A6 gate)
    assert set(a) >= {
        "agency.txt", "routes.txt", "stops.txt", "calendar.txt",
        "calendar_dates.txt", "trips.txt", "stop_times.txt", "shapes.txt",
        "frequencies.txt", "feed_info.txt",
    }
    # volume scales: stop_times dominates, 25 per trip
    n_trips = len(a["trips.txt"].strip().splitlines()) - 1
    n_st = len(a["stop_times.txt"].strip().splitlines()) - 1
    assert n_st == n_trips * 25
    p = write_synth_feed_zip(str(tmp_path / "f.zip"), 0.02)
    with zipfile.ZipFile(p) as z:
        assert "stop_times.txt" in z.namelist()


def test_run_import_bench_local_backend(spark, tmp_path):
    out = run_import_bench(spark, str(tmp_path), scale=0.02, backend="local")
    assert out["backend"] == "local"
    assert out["total_sec"] > 0 and out["import_duration_ms"] > 0
    # the digest-gated no-op ran and is orders of magnitude cheaper than
    # the import (the reference's dominant fast path, import.js:235-239)
    assert 0 <= out["skipped_rerun_sec"] < out["total_sec"] / 10
    assert out["stop_times_rows"] > 0
    # C10/C11 expansion really happened: arrivals >> stop_times
    assert out["arrivals_rows"] > out["stop_times_rows"]
    assert out["db_name"].startswith("bench_")


@pytest.mark.skipif(not pg_server_available(), reason="no live PG server")
def test_run_import_bench_psql_backend(spark, tmp_path):
    """The sink the bench actually uses on this box: scratch PG + COPY."""
    out = run_import_bench(spark, str(tmp_path), scale=0.01, backend="psql")
    assert out["backend"] == "psql"
    assert out["arrivals_rows"] > out["stop_times_rows"] > 0
