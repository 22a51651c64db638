"""Oracle parity under ONE maximally-adversarial engine config — every
axis that changes physical plans or data paths without changing
semantics, combined so a single 169-query sweep buys all the diversity:

  * 5 shuffle partitions   — different reduce-side accumulation order
  * AQE off                — different physical plans than every other run
  * broadcast joins off    — every dimension join becomes sort-merge
    (the broadcast()/plain-join equivalence claimed per entry)
  * non-vectorized parquet — the row-based decode path (the NTZ class)
  * 256 KB max split size  — many tiny scan partitions
  * 7-record Arrow batches — every mapInPandas partition arrives as
    MANY tiny pandas batches, so any operator that silently assumed
    one-batch-per-partition (per-batch state, cross-batch dedup,
    header rows) diverges; applyInPandas groups stay whole by
    contract, so this isolates the mapInPandas boundary class
    (probed separately at batch=1 over the 10 pandas-UDF-backed
    entries in round 5 — all green)
  * forced buffer spills    — window / sort-merge-join / session-window /
    cartesian row buffers spill to disk after 32 in-memory rows, so the
    UnsafeExternalSorter spill-write/merge-read path carries real data
    through every window frame and SMJ (with broadcast off, that is
    EVERY join). The axis provably bites: a probe run with an invalid
    spill-reader buffer size errored in exactly 21 of the 169 queries —
    those are the ones whose buffers actually spilled — and the valid
    run is 169/169 green. Thresholds are moderate (32/64, not 2/8)
    because an UnboundedFollowing window frame re-opens one ~1 MB
    spill reader PER FILE PER ROW; at 8-row spills that is an
    allocation storm that OOMs the driver — an artifact of the config,
    not an operator defect (root-caused in round 5)

The exact-integer / partition-invariance discipline every entry claims
means results must be config-invariant; this is the permanent guard for
the sweep class that validated it (the cross-SF variant caught the
session_window oracle boundary bug at sf0.1 — tests/test_review_fixes).
One-off axes run per round via the verify-skill recipe: whole-stage
codegen off (interpreted eval), ANSI off, shifted system TZ — all
169/169 green in rounds 5 AND 6 (re-run combined: ansi=false +
codegen.wholeStage=false, 169/0 at sf0.001; TZ=America/New_York
system-zone shift, 169/0 at sf0.001)."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.sweep

from postgis_gtfs_importer_spark.plans import queries as Q

from .oracle_utils import compare, duckdb_conn

SF_DIR = "/root/testdata/sf0.001"

ORACLES = Q.oracle_sql()
NAMES = sorted(ORACLES)

_ADVERSARIAL = {
    "spark.sql.shuffle.partitions": "5",
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.parquet.enableVectorizedReader": "false",
    "spark.sql.files.maxPartitionBytes": "262144",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "7",
    "spark.sql.windowExec.buffer.spill.threshold": "64",
    "spark.sql.windowExec.buffer.in.memory.threshold": "32",
    "spark.sql.sortMergeJoinExec.buffer.spill.threshold": "64",
    "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold": "32",
    "spark.sql.sessionWindow.buffer.spill.threshold": "64",
    "spark.sql.sessionWindow.buffer.in.memory.threshold": "32",
    "spark.sql.cartesianProductExec.buffer.spill.threshold": "64",
    "spark.sql.cartesianProductExec.buffer.in.memory.threshold": "32",
}


@pytest.fixture(scope="module")
def duck():
    con = duckdb_conn(SF_DIR)
    yield con
    con.close()


@pytest.fixture(scope="module")
def adversarial_spark(spark):
    saved = {k: spark.conf.get(k, None) for k in _ADVERSARIAL}
    for k, v in _ADVERSARIAL.items():
        spark.conf.set(k, v)
    # CacheManager entries PHYSICALLY PLAN at persist() registration
    # time: an operator persist() from an earlier suite in this pytest
    # process (plan hygiene walks the same registry) caches a plan
    # compiled under the NORMAL config (vectorized parquet ->
    # ColumnarToRow codegen); canonical-plan substitution then splices
    # it into this module's queries, where the non-vectorized runtime
    # reader feeds UnsafeRows into batch-expecting codegen — an
    # order-dependent ClassCastException (bit twice in r10 guard
    # combos; neardup_incremental was the reproducer because its
    # persist() relations live until GC by design). A mid-session conf
    # toggle invalidates every cached physical plan, so clear the
    # cache at BOTH boundary crossings — production sessions never
    # toggle physical conf midstream, tests must pay the flush.
    spark.catalog.clearCache()
    try:
        yield spark
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        spark.catalog.clearCache()


@pytest.mark.parametrize("name", NAMES)
def test_query_invariant_under_adversarial_config(
    adversarial_spark, duck, name
):
    spark_df = Q.queries()[name](adversarial_spark, SF_DIR)
    oracle_df = duck.execute(ORACLES[name]).df()
    problems = compare(spark_df, oracle_df)
    assert not problems, f"{name}: " + "; ".join(problems)
