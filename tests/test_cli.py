"""A25 env-contract CLI: required envs validated before anything starts."""

from __future__ import annotations

import os
import subprocess
import sys


def test_cli_exits_on_missing_env():
    env = {k: v for k, v in os.environ.items() if not k.startswith("GTFS")}
    env.pop("PGHOST", None)
    proc = subprocess.run(
        [sys.executable, "-m", "postgis_gtfs_importer_spark"],
        capture_output=True,
        text=True,
        env=env,
        cwd="/root/repo",
        timeout=60,
    )
    assert proc.returncode == 1
    assert "GTFS_DOWNLOAD_URL" in proc.stderr


def test_cli_exits_on_missing_dsn_credentials(tmp_path):
    """PATH_TO_DSN_FILE without POSTGREST_USER/POSTGREST_PASSWORD must
    fail fast (import.js:295-304) — before any Spark/download work."""
    env = {k: v for k, v in os.environ.items() if not k.startswith("GTFS")}
    env.pop("PGHOST", None)
    env.pop("POSTGREST_USER", None)
    env.pop("POSTGREST_PASSWORD", None)
    env.update(
        GTFS_DOWNLOAD_URL="http://example.invalid/feed.zip",
        GTFS_DOWNLOAD_USER_AGENT="test",
        GTFS_IMPORTER_DB_PREFIX="p",
        PATH_TO_DSN_FILE=str(tmp_path / "dsn"),
    )
    proc = subprocess.run(
        [sys.executable, "-m", "postgis_gtfs_importer_spark"],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=60,
    )
    assert proc.returncode == 1
    assert "POSTGREST_USER" in proc.stderr


def test_cli_end_to_end_local_backend(tmp_path):
    """Full CLI run over a file:// feed: env contract honored, '_'
    appended to the prefix (importer.js:24), snapshot published to the
    LocalCatalog root, result line printed."""
    from .gtfs_fixtures import write_feed_zip

    feed = write_feed_zip(str(tmp_path / "served.zip"))
    env = {k: v for k, v in os.environ.items() if not k.startswith("GTFS")}
    env.pop("PGHOST", None)
    env.update(
        GTFS_DOWNLOAD_URL=f"file://{feed}",
        GTFS_DOWNLOAD_USER_AGENT="test-agent",
        GTFS_IMPORTER_DB_PREFIX="clie2e",  # no underscore: CLI appends it
        GTFS_TMP_DIR=str(tmp_path / "work"),
        GTFS_SNAPSHOT_ROOT=str(tmp_path / "snaps"),
    )
    proc = subprocess.run(
        [sys.executable, "-m", "postgis_gtfs_importer_spark"],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    snaps = os.listdir(tmp_path / "snaps")
    dbs = [d for d in snaps if d.startswith("clie2e_")]
    assert len(dbs) == 1  # the '_' suffix rule produced clie2e_<ts>_<digest>
    parts = dbs[0].split("_")
    assert len(parts) == 3 and parts[1].isdigit() and len(parts[2]) == 6
    assert "ImportResult" in proc.stdout


def test_log_level_env_contract():
    """C20 quiet/verbose: GTFS_IMPORTER_VERBOSE=false is the reference's
    quiet mode (gtfs-to-sql --silent / psql --quiet, import.sh:117-122);
    SPARK_GRAFT_LOG_LEVEL is the explicit override."""
    from postgis_gtfs_importer_spark.session import log_level_from_env

    assert log_level_from_env({}) == "WARN"
    assert log_level_from_env({"GTFS_IMPORTER_VERBOSE": "false"}) == "ERROR"
    assert log_level_from_env({"GTFS_IMPORTER_VERBOSE": "true"}) == "WARN"
    assert log_level_from_env(
        {"SPARK_GRAFT_LOG_LEVEL": "info", "GTFS_IMPORTER_VERBOSE": "false"}
    ) == "INFO"
