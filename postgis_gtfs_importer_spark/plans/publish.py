"""Atomic, idempotent publish — the reference's import state machine.

``import_gtfs_atomically`` re-expresses ``importGtfsAtomically``
(/root/reference/import.js:38-318) over a pluggable ``Catalog`` backend:

    ensure bookkeeping table                      (A8)
    BEGIN + LOCK … EXCLUSIVE NOWAIT               (A17/A18)
    scan recorded imports + existing databases    (A9/A10/A11)
    reconcile dangling pointers (warn + splice)   (A12)
    retention top-k → set-difference GC           (A13/A14, + A16 rows)
    composite digest of feed ⊕ postprocessing.d   (A3-A5)
    digest gate: unchanged → importSkipped        (A6)
    mint snapshot name prefix+ts+digest           (A7)
    CREATE DATABASE (out-of-transaction)          (A19)
    run the import pipeline into the snapshot     (import.sh analog)
    postprocessing hooks (.sql / callables)       (A23)
    record successful import                      (A15)
    DSN pointer-file write                        (A22)
    COMMIT — the atomic pointer flip; on error ROLLBACK and leave the
    half-built snapshot for next-run GC           (import.js:310-316)

Timing instrumentation (A24) mirrors downloadDurationMs/importDurationMs
(import.js:83-90). The import pipeline itself is injectable (the
``$GTFS_IMPORT_SCRIPT`` seam, import.js:64 / SURVEY §3.2): any callable
``(spark, db_name) -> dict[str, DataFrame]``.
"""

from __future__ import annotations

import logging
import os
import subprocess
import time
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..functions.digests import composite_feed_digest
from ..catalog import ImportRecord

log = logging.getLogger(__name__)

RetentionPolicy = Callable[[Sequence[ImportRecord], Sequence[str]], list[str]]


def default_retention(
    recorded: Sequence[ImportRecord], all_dbs: Sequence[str]
) -> list[str]:
    """Keep the 2 most recent successful imports (A13, import.js:71-73).

    ``recorded`` arrives sorted desc by imported_at (A9), so top-k is a
    prefix. Injectable, like the reference's ``determineDbsToRetain``.
    """
    return [r.db_name for r in recorded[:2]]


def format_db_name(prefix: str, imported_at: int, feed_digest: str) -> str:
    """A7 snapshot-name mint: ``{prefix}{unix_ts}_{digest}``
    (index.js:55-62)."""
    return f"{prefix}{imported_at}_{feed_digest}"


@dataclass
class ImportResult:
    """The structured result object (A24, import.js:83-90)."""

    download_duration_ms: float | None = None
    import_duration_ms: float | None = None
    deleted_databases: list[str] = field(default_factory=list)
    retained_databases: list[str] = field(default_factory=list)
    import_skipped: bool = False
    new_import: dict | None = None


def write_dsn_file(
    path: str, entry_name: str, info: dict[str, str], user: str | None = None,
    password: str | None = None,
) -> None:
    """A22: write the PgBouncer-style pointer file consumers read
    (import.js:289-308). The password never reaches the log output."""
    kv = dict(info)
    if user:
        kv["user"] = user
    if password:
        kv["password"] = password
    line = f"{entry_name}=" + " ".join(f"{k}={v}" for k, v in kv.items())
    with open(path, "w") as f:
        f.write(line + "\n")
    redacted = {**kv, **({"password": "***"} if password else {})}
    log.info("wrote DSN file %s: %s=%s", path, entry_name, redacted)


def _run_postprocessing_files(catalog, db_name: str, hook_dir: str | None) -> None:
    """A23 file hooks (import.sh:134-148): every non-dotfile in the hook
    dir, sorted by name — ``.sql`` runs against the snapshot in a single
    transaction (psql -1 -v ON_ERROR_STOP=1 parity), anything else is
    executed with the snapshot reference as argv[1]. Hook contents are
    part of the feed digest (A5), so editing a hook re-triggers import.
    """
    if not hook_dir or not os.path.isdir(hook_dir):
        return
    for fname in sorted(os.listdir(hook_dir)):
        if fname.startswith("."):
            continue
        path = os.path.join(hook_dir, fname)
        if not os.path.isfile(path):
            continue
        if fname.endswith(".sql"):
            with open(path) as f:
                catalog.execute_sql(db_name, f.read())
        else:
            info = catalog.connection_info(db_name)
            ref = info.get("path") or info.get("dbname") or db_name
            subprocess.run([path, ref], check=True)


def import_gtfs_atomically(
    spark: SparkSession,
    catalog,
    *,
    db_prefix: str,
    zip_path: str | None = None,
    feed_digest: str | None = None,
    build_tables: Callable[[SparkSession, str], dict[str, DataFrame]],
    postprocessing_dir: str | None = None,
    post_hooks: Sequence[Callable[[dict[str, DataFrame]], dict[str, DataFrame] | None]] = (),
    determine_dbs_to_retain: RetentionPolicy = default_retention,
    partition_by: dict[str, list[str]] | None = None,
    continue_on_failure_deleting_old_db: bool = False,
    dsn_file_path: str | None = None,
    dsn_entry_name: str = "gtfs",
    dsn_user: str | None = None,
    dsn_password: str | None = None,
    now: Callable[[], int] = lambda: int(time.time()),
) -> ImportResult:
    """Run one atomic import cycle. See module docstring for the states.

    ``db_prefix`` must end with ``_`` (the CLI appends it, importer.js:24).
    Either ``zip_path`` (digested with postprocessing_dir, A5) or a
    precomputed ``feed_digest`` identifies the feed version.
    """
    assert db_prefix.endswith("_"), "db prefix must end with '_'"
    result = ImportResult()

    if feed_digest is None:
        assert zip_path is not None, "need zip_path or feed_digest"
        feed_digest = composite_feed_digest(zip_path, postprocessing_dir)

    catalog.ensure_bookkeeping()
    catalog.begin_exclusive()  # A17/A18 — raises ImportLockedError if held
    try:
        # A9/A10: bookkeeping + physical scans
        recorded = catalog.list_recorded_imports(db_prefix)
        all_dbs = catalog.list_databases(db_prefix)

        # A12: reconcile — dangling pointers are warned about and spliced
        # out so retention never "retains" a DB that doesn't exist
        # (import.js:149-158).
        dangling = [r for r in recorded if r.db_name not in set(all_dbs)]
        for r in dangling:
            log.warning(
                "bookkeeping row %s has no physical database — ignoring", r.db_name
            )
        recorded = [r for r in recorded if r.db_name not in {d.db_name for d in dangling}]

        # A13: retention policy (validated like import.js:161-163)
        retain = determine_dbs_to_retain(recorded, all_dbs)
        unknown = set(retain) - set(all_dbs)
        assert not unknown, f"retention policy returned non-existing DBs: {unknown}"
        result.retained_databases = list(retain)

        # A14: set-difference GC, per-item failure policy
        # (import.js:166-197); also deletes the bookkeeping row (A16).
        recorded_names = {r.db_name for r in recorded}
        for db in all_dbs:
            if db in retain:
                continue
            try:
                catalog.drop_database(db)
            except Exception:
                if not continue_on_failure_deleting_old_db:
                    raise
                log.warning("failed to drop %s — continuing", db, exc_info=True)
                continue
            if db in recorded_names:
                catalog.remove_import_record(db)
            result.deleted_databases.append(db)

        # A6: the change-detection gate — latest import unchanged → no-op
        prev = recorded[0] if recorded else None
        if prev is not None and prev.feed_digest == feed_digest:
            log.info("feed digest %s unchanged — skipping import", feed_digest)
            result.import_skipped = True
            catalog.commit()
            return result

        # A7 + A19: mint + create the snapshot outside the transaction
        imported_at = now()
        db_name = format_db_name(db_prefix, imported_at, feed_digest)
        catalog.create_database(db_name)

        # the import.sh analog: build + write, failing before the flip
        t0 = time.monotonic()
        tables = build_tables(spark, db_name)
        for hook in post_hooks:  # A23 Python-plugin stages
            replaced = hook(tables)
            if replaced is not None:
                tables = replaced
        catalog.write_tables(db_name, tables, partition_by=partition_by)
        _run_postprocessing_files(catalog, db_name, postprocessing_dir)
        result.import_duration_ms = (time.monotonic() - t0) * 1000

        # A15: record; A22: repoint consumers — both inside the txn
        catalog.record_import(ImportRecord(db_name, imported_at, feed_digest))
        if dsn_file_path:
            write_dsn_file(
                dsn_file_path,
                dsn_entry_name,
                catalog.connection_info(db_name),
                user=dsn_user,
                password=dsn_password,
            )

        catalog.commit()  # the atomic pointer flip (import.js:310-311)
        result.new_import = {
            "db_name": db_name,
            "imported_at": imported_at,
            "feed_digest": feed_digest,
        }
        return result
    except Exception:
        # ROLLBACK leaves the half-built snapshot for next-run GC
        # (import.js:312-316, README.md:19)
        catalog.rollback()
        raise
