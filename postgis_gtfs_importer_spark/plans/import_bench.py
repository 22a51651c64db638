"""End-to-end import benchmark — the reference's headline operation.

The reference self-times its one real job (importDurationMs,
/root/reference/import.js:267-277; logged in seconds at import.js:277);
our A24 mirrors the instrumentation but the query bench never exercised
it. This module runs the WHOLE pipeline — synthetic sf0.1-class feed zip
-> unzip -> typed read (C1-C5) -> gtfsclean family (B1-B17) ->
derivations incl. the ~1.7M-row arrivals_departures expansion (C10-C16)
-> atomic publish (A6-A19) — against a real backend and reports the
wall time bench.py folds into the compact driver line as `import_e2e`.

Backend selection mirrors the deployment reality: a throwaway live
PostgreSQL server (initdb + pg_ctl on a unix socket — COPY bulk load,
the reference's actual sink) when server binaries are present, else the
LocalCatalog parquet twin. The backend used is recorded in the detail
payload so numbers are never silently compared across sinks.
"""

from __future__ import annotations

import contextlib
import os
import shutil
import subprocess
import tempfile
import time

from pyspark.sql import SparkSession

PG_BINDIR = "/usr/lib/postgresql/15/bin"
PG_PORT = 54401  # distinct from tests' 54399 so bench and CI never collide


def pg_server_available() -> bool:
    """Live-PG feature probe: psql + server binaries + a postgres OS user
    (initdb refuses to run as root)."""
    return (
        shutil.which("psql") is not None
        and shutil.which("runuser") is not None
        and subprocess.run(
            ["runuser", "-u", "postgres", "--", "true"], capture_output=True
        ).returncode
        == 0
        and subprocess.run(
            [f"{PG_BINDIR}/pg_ctl", "--version"], capture_output=True
        ).returncode
        == 0
    )


@contextlib.contextmanager
def scratch_pg_server(port: int = PG_PORT):
    """A disposable PostgreSQL server on a unix socket; yields the
    connection kwargs PsqlCatalog takes. Same two-step dance the live
    test suite uses: the socket dir must be enterable by the postgres OS
    user, and shutdown is immediate-mode (the data dir is garbage)."""
    base = tempfile.mkdtemp(prefix="pgbench-", dir="/tmp")
    data = os.path.join(base, "data")
    subprocess.run(["chmod", "777", base], check=True)
    try:
        subprocess.run(
            ["runuser", "-u", "postgres", "--", f"{PG_BINDIR}/initdb",
             "-D", data, "--auth-local=trust", "--no-sync", "-U", "postgres"],
            check=True, capture_output=True,
        )
        subprocess.run(
            ["runuser", "-u", "postgres", "--", f"{PG_BINDIR}/pg_ctl",
             "-D", data,
             "-o", f"-k {base} -p {port} -c listen_addresses='' -F",
             "-l", os.path.join(base, "log"), "start"],
            check=True, capture_output=True,
        )
        yield {"host": base, "port": port, "user": "postgres"}
    finally:
        subprocess.run(
            ["runuser", "-u", "postgres", "--", f"{PG_BINDIR}/pg_ctl",
             "-D", data, "-m", "immediate", "stop"],
            capture_output=True,
        )
        shutil.rmtree(base, ignore_errors=True)


def run_import_bench(
    spark: SparkSession,
    workdir: str,
    scale: float = 1.0,
    backend: str = "auto",
) -> dict:
    """One timed end-to-end import of the synthetic feed.

    Returns {total_sec, import_duration_ms, backend, arrivals_rows,
    stop_times_rows, skipped_rerun_sec}: total_sec is the run_import wall
    time (the reference's importDurationMs scope — download excluded,
    there is none); skipped_rerun_sec times the A6 digest-gated no-op
    re-import, the reference's dominant fast path.
    """
    from ..catalog import LocalCatalog
    from ..sources.synth_feed import write_synth_feed_zip
    from .pipeline import run_import

    zip_path = os.path.join(workdir, "synth_feed.zip")
    extract_dir = os.path.join(workdir, "feed")
    write_synth_feed_zip(zip_path, scale)

    use_pg = backend == "psql" or (backend == "auto" and pg_server_available())
    ctx = scratch_pg_server() if use_pg else contextlib.nullcontext(None)
    with ctx as pg:
        if pg is not None:
            from ..catalog import PsqlCatalog

            catalog = PsqlCatalog(spark, **pg)
            used = "psql"
        else:
            catalog = LocalCatalog(spark, os.path.join(workdir, "snapshots"))
            used = "local"
        try:
            kwargs = dict(
                db_prefix="bench_",
                zip_path=zip_path,
                extract_dir=extract_dir,
            )
            t0 = time.monotonic()
            result = run_import(spark, catalog, **kwargs)
            total = time.monotonic() - t0
            assert result.new_import is not None, "import did not publish"

            t1 = time.monotonic()
            rerun = run_import(spark, catalog, **kwargs)
            skipped_sec = time.monotonic() - t1
            assert rerun.import_skipped, "digest gate failed to skip rerun"

            db = result.new_import["db_name"]
            tables = catalog.open_latest("bench_")
            arrivals = tables["arrivals_departures"].count()
            stop_times = tables["stop_times"].count()
        finally:
            with contextlib.suppress(Exception):
                for d in catalog.list_databases("bench_"):
                    catalog.drop_database(d)
            with contextlib.suppress(Exception):
                catalog.close()
    return {
        "total_sec": round(total, 3),
        "import_duration_ms": round(result.import_duration_ms or 0.0, 1),
        "skipped_rerun_sec": round(skipped_sec, 4),
        "backend": used,
        "db_name": db,
        "arrivals_rows": arrivals,
        "stop_times_rows": stop_times,
    }
