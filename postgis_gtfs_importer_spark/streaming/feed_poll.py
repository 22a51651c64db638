"""Continuous re-import — the reference's periodic batch job as a loop.

The reference runs as a cron-style container re-invocation ("periodically
changing GTFS feed", /root/reference/README.md:3); idempotence comes from
the digest gate, not from any scheduler state. This wrapper keeps exactly
that contract: each tick is one full atomic import cycle whose no-op path
costs a conditional download + one file hash + two catalog scans
(SURVEY §4 "content-addressed short-circuit").

This is deliberately NOT a Structured Streaming job: the unit of work is
"a whole feed version", arriving minutes-to-days apart — micro-batch
machinery adds state and failure modes without adding parallelism (the
inner pipeline is already cluster-parallel). Structured Streaming enters
where per-event data exists (streaming.events for GTFS-Realtime-shaped
feeds).
"""

from __future__ import annotations

import logging
import time
from collections.abc import Callable

from pyspark.sql import SparkSession

from ..plans.pipeline import run_import
from ..plans.publish import ImportResult

log = logging.getLogger(__name__)


def poll_and_import(
    spark: SparkSession,
    catalog,
    *,
    interval_sec: float,
    max_cycles: int | None = None,
    on_result: Callable[[ImportResult], None] | None = None,
    sleep: Callable[[float], None] = time.sleep,
    **run_import_kwargs,
) -> list[ImportResult]:
    """Run ``run_import`` every ``interval_sec`` until ``max_cycles``.

    Failures of a single cycle are logged and retried next tick (the
    half-built snapshot is GC'd by the next successful cycle — the
    reference's crash-recovery story, import.js:115-117).
    """
    results: list[ImportResult] = []
    cycle = 0
    while max_cycles is None or cycle < max_cycles:
        cycle += 1
        try:
            res = run_import(spark, catalog, **run_import_kwargs)
            results.append(res)
            if on_result is not None:
                on_result(res)
        except Exception:
            log.exception("import cycle %d failed — retrying next tick", cycle)
        if max_cycles is not None and cycle >= max_cycles:
            break
        sleep(interval_sec)
    return results
