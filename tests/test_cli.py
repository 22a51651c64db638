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
