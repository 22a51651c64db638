"""SparkSession factory.

Local-mode defaults tuned for the test/bench harness (local[N] on one JVM);
the same builder settings are what we would ship for a real cluster, minus
the ``master`` override: AQE on (runtime re-planning, skew-join splitting,
partition coalescing), UTC session timezone (required for DuckDB-oracle
comparison — DuckDB timestamps are UTC-naive), Arrow enabled for the few
Pandas-UDF operators.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def log_level_from_env(env: dict | None = None) -> str:
    """C20 quiet/verbose parity (reference: gtfs-to-sql --silent / psql
    --quiet, import.sh:117-122; verbose flag import.js:59-62).

    ``GTFS_IMPORTER_VERBOSE=false`` maps to ERROR (the reference's quiet
    mode), anything else to the WARN default; ``SPARK_GRAFT_LOG_LEVEL``
    overrides both for debugging (e.g. INFO to watch AQE re-plans).
    """
    e = os.environ if env is None else env
    explicit = e.get("SPARK_GRAFT_LOG_LEVEL")
    if explicit:
        return explicit.upper()
    if e.get("GTFS_IMPORTER_VERBOSE", "").lower() == "false":
        return "ERROR"
    return "WARN"


def get_spark(
    app_name: str = "postgis-gtfs-importer-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # One shuffle partition per core locally. On a real cluster this is
        # overridden upward (or left to AQE coalescing from a high initial
        # value) — see docs/SCALE.md.
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Local-bench parquet files are single-digit-MB; the 128MB default
        # would scan each as ONE partition, idling every other core. At
        # cluster scale (multi-GB files) the default is correct — this is
        # a small-input override, not a scale setting.
        .config("spark.sql.files.maxPartitionBytes", str(1 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(64 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel(log_level_from_env())
    return spark
