"""The end-to-end import pipeline — importer.js/import.sh re-expressed.

``run_import`` = download (timed, A1/A24) → unzip (A2) → digest gate +
atomic publish (plans.publish) with the default build stage:

    read_feed (C1-C5 typed scans)
    → clean_feed (the gtfsclean B-family)
    → base tables + derived views (C10-C16)
    → one-row import metadata (C7)

The build stage is injectable (the ``$GTFS_IMPORT_SCRIPT`` seam,
/root/reference/import.js:64): pass ``build_tables`` to bring your own
transform. A ``preprocess`` hook mirrors preprocess.sh
(/root/reference/import.sh:32-35) — it sees the extracted feed dir before
cleaning.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..functions.digests import composite_feed_digest
from ..operators.cleaning import CleaningConfig, clean_feed
from ..operators import derivations as DV
from ..sinks.postgis import import_metadata_row
from ..sources.gtfs_feed import download_feed, extract_feed, read_feed
from .publish import ImportResult, import_gtfs_atomically


def build_gtfs_tables(
    spark: SparkSession,
    feed_dir: str,
    cleaning: CleaningConfig | None = None,
    with_derivations: bool = True,
    skip_cleaning: bool = False,
) -> dict[str, DataFrame]:
    """The default import.sh-equivalent build stage.

    ``skip_cleaning`` is the GTFSTIDY_BEFORE_IMPORT=false path
    (import.sh:38): raw typed tables go straight to derivation.
    """
    tables = read_feed(spark, feed_dir)
    if not skip_cleaning:
        tables = clean_feed(tables, cleaning)
    if with_derivations:
        derived: dict[str, DataFrame] = {
            "service_days": DV.service_days(tables),
        }
        if "stop_times" in tables and "trips" in tables and "routes" in tables:
            derived["arrivals_departures"] = DV.arrivals_departures(tables)
            derived["connections"] = DV.connections(tables)
        if "shapes" in tables:
            derived["shapes_aggregated"] = DV.shapes_wkt(tables)
        if "frequencies" in tables:
            derived["frequencies_expanded"] = DV.frequencies_expanded(tables)
        tables = {**tables, **derived}
    return tables


def run_import(
    spark: SparkSession,
    catalog,
    *,
    db_prefix: str,
    download_url: str | None = None,
    zip_path: str,
    extract_dir: str,
    user_agent: str = "postgis-gtfs-importer-spark",
    preprocess: Callable[[str], None] | None = None,
    postprocessing_dir: str | None = None,
    cleaning: CleaningConfig | None = None,
    skip_cleaning: bool = False,
    dsn_file_path: str | None = None,
    **publish_kwargs,
) -> ImportResult:
    """One full cycle: (download) → unzip → preprocess → atomic publish."""
    download_ms = None
    if download_url is not None:
        t0 = time.monotonic()
        download_feed(download_url, zip_path, user_agent=user_agent)
        download_ms = (time.monotonic() - t0) * 1000

    feed_digest = composite_feed_digest(zip_path, postprocessing_dir)

    def build(spark_: SparkSession, _db_name: str) -> dict[str, DataFrame]:
        extract_feed(zip_path, extract_dir)
        if preprocess is not None:  # A23 pre-hook (import.sh:32-35)
            preprocess(extract_dir)
        tables = build_gtfs_tables(
            spark_, extract_dir, cleaning, skip_cleaning=skip_cleaning
        )
        rec = import_metadata_row(
            spark_, feed_digest, int(time.time())
        )
        return {**tables, "import_metadata": rec}

    # date-sliced relations partition by date so consumer date predicates
    # prune at planning time (overridable via publish_kwargs)
    publish_kwargs.setdefault(
        "partition_by", {"arrivals_departures": ["date"]}
    )
    result = import_gtfs_atomically(
        spark,
        catalog,
        db_prefix=db_prefix,
        feed_digest=feed_digest,
        build_tables=build,
        postprocessing_dir=postprocessing_dir,
        dsn_file_path=dsn_file_path,
        **publish_kwargs,
    )
    result.download_duration_ms = download_ms
    return result
