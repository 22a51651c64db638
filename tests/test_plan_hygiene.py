"""Structural scale guards over EVERY registry plan: the failure modes
that are invisible at sf0.001 and fatal at 100 TB.

  * CartesianProduct — an unconditioned join that went quadratic.
  * BroadcastNestedLoopJoin — tolerable only for deliberate 1-row/
    tiny-literal cross joins (whitelisted per query); anything else is
    an O(n*m) plan hiding behind a broadcast.
  * BatchEvalPython — a row-at-a-time Python UDF in the hot path
    (Arrow-batched ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas
    are the sanctioned Python escapes).

Plans are INSPECTED, not executed (queryExecution().executedPlan forces
physical planning only), so the whole 93-entry sweep costs seconds."""

from __future__ import annotations

import pytest

from postgis_gtfs_importer_spark.plans import queries as Q

SF_DIR = "/root/testdata/sf0.001"

#: queries whose plan legitimately contains a broadcast nested-loop:
#: deliberate cross joins of ONE-ROW or tiny-constant frames (quantile
#: probes, corpus-count scalars) — cost is |left| * O(1).
BNLJ_OK = {
    "hist_quantiles",        # totals (1/group) x quantile literals (3 rows)
    "value_quantiles",       # same shape
    "lexical_rarity",        # n_docs scalar (1 row)
    "hll_merge_shards",      # merged register table x 1-row shard count
    "bm25_topk",             # corpus stats scalar (N, avgdl — 1 row)
    "pmi_bigrams",           # total-pairs scalar (1 row)
    "tfidf_distinctive",     # n_docs scalar (1 row)
    "balanced_mixture",      # per-stratum rate thresholds (|strata| rows)
    "embedding_topk",        # brute-force baseline: tiny probe set x corpus
                             # (the DELIBERATE linear scan the ANN variants
                             # exist to beat)
    "ann_int8_topk",         # same deliberate probe-broadcast linear scan,
                             # over the int8-quantized index
    "ann_ivf_topk",          # probe-cell ids x queries (both tiny)
    "translations_feedwide", # feed_info default-lang row (1 row) x tables
    "trend_by_type",         # corpus-epoch scalar (1 row) x events
    "knn_label_vote",        # 20-query probe broadcast x held-out corpus
                             # (the deliberate int8 linear scan)
    "ann_recall_at_k",       # int8 + float probe broadcasts (10 queries)
                             # x corpus — the measurement query runs BOTH
                             # deliberate baselines
    "tvd_drift",             # 1-row global (min,max,mid) bounds x events
    "triangle_count",        # final assembly: three 1-ROW scalar frames
                             # (n_nodes x n_edges x n_triangles) cross-
                             # joined into the single output row
    "association_rules",     # 1-row total-order-count scalar x rules
    "peak_concurrency",      # 1-row interval-count scalar x 1-row peak
    "eigenvector_centrality",# final iterate: checkpointed matvec x the
                             # 1-ROW max normalizer (the raw-checkpoint
                             # form leaves this cross join visible in
                             # the returned plan; it was hidden inside
                             # the per-iterate checkpoint before)
    "hits_trade",            # same: two checkpointed half-step aggs x
                             # their 1-row max scalars
    "departures_at_station", # 1-row single-agency (count, name, tz)
                             # aggregate x fact — the omitted-agency_id
                             # timezone fill (arrivals_departures)
    "rrf_fusion",            # inherits both producers' whitelisted
                             # shapes: bm25's 1-row corpus-stats scalar
                             # + the deliberate 1-probe broadcast
                             # linear scan (embedding_topk class); the
                             # fusion join itself is an equi SMJ
    "decayed_counts",        # 1-row anchor (global max ts) x events —
                             # the trend_by_type scalar pattern
    "calibration_bins",      # 1-row global (min,max) score bounds x
                             # the scored relation — the tvd_drift
                             # scalar pattern
    "vocab_coverage",        # 1-row grand-total scalar x the
                             # vocabulary-sized ranked relation
    "dsir_resample",         # 1-row (nq x np) gram-total scalars x the
                             # B-row bucket ratio table — the bm25
                             # corpus-stats pattern; the corpus-side
                             # joins are equi broadcast-hash on the
                             # bucket key
    "kmv_set_overlap",       # |sets| x |sets| inequality pair join over
                             # the DISTINCT set ids (sketch-sized by
                             # construction — the deliberate pairwise
                             # stage; every corpus-touching stage is
                             # the kmv_sketch window)
    "psi_drift",             # 1-row global (min,max) bounds + 1-row
                             # grand-total scalars x the fact / the
                             # per-group rows — the tvd_drift /
                             # vocab_coverage scalar pattern
                             # (lexical_rarity's n_docs pattern)
    "trigram_backoff_lm",    # 1-row train-token-total scalar (N of the
                             # unigram backoff level) x the vocab-sized
                             # unigram table — the bm25 corpus-stats
                             # pattern; all corpus-touching joins are
                             # equi joins on n-gram keys
    "rbo_overlap",           # inherits ann_recall_at_k's shape: BOTH
                             # deliberate 10-probe broadcast linear
                             # scans (int8 + exact float baselines);
                             # the RBO join itself is query-keyed equi
}

STREAMING = {
    "streaming_windowed_stats", "streaming_sessionize",
    "streaming_interval_join", "streaming_interval_join_outer",
    "streaming_dedup", "streaming_enrich",
}

#: queries whose plan legitimately contains an unbounded-FOLLOWING
#: window frame (the round-7 spill-OOM class — see docs/SCALE.md,
#: "window-frame spill rule"): allowed ONLY over provably-small
#: relations.
FOLLOWING_FRAME_OK = {
    "pareto_customers",  # skyline_2d's strictly-greater-x range frame
                         # runs over the per-partition-Pareto-prefiltered
                         # local-front union — deliberately small, and
                         # the operator documents that boundary
}

REGISTRY = Q.queries()


@pytest.mark.parametrize(
    "name", sorted(n for n in REGISTRY if n not in STREAMING)
)
def test_plan_has_no_scale_killers(spark, name):
    df = REGISTRY[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if name not in BNLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: nested-loop join (whitelist it only for a deliberate"
            f" tiny cross join)\n{plan[:2000]}"
        )
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF in the plan"
    )
    if name not in FOLLOWING_FRAME_OK:
        # Only frames ANCHORED at/after the current row with an
        # unbounded-following end are the O(n^2)-re-scan class
        # (UnboundedFollowingWindowFunctionFrame). Whole-partition
        # frames (unboundedpreceding..unboundedfollowing — what an
        # orderBy-less window prints) are evaluated in ONE accumulation
        # pass per partition and are fine.
        import re as _re

        offenders = [
            m.group(0)
            for m in _re.finditer(
                r"specifiedwindowframe\(\w+Frame, ([^,]+),"
                r" unboundedfollowing\$\(\)\)",
                plan,
            )
            if m.group(1) != "unboundedpreceding$()"
        ]
        assert not offenders, (
            f"{name}: unbounded-FOLLOWING window frame anchored at the"
            f" current row — Spark re-scans the partition buffer per row"
            f" (O(n^2); reopens every spill file per re-scan once spilled"
            f" — the round-7 JVM-OOM class). Invert the sort and use a"
            f" running last(ignorenulls) frame instead; see docs/SCALE.md"
            f" 'window-frame spill rule'. Frames: {offenders}"
        )


def _file_scans(df) -> list[str]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return [l for l in plan.splitlines() if "FileScan parquet" in l]


def test_scan_pushdown_and_column_pruning(spark):
    """Representative scans must show Catalyst doing its two free-at-scale
    jobs: predicate pushdown into the parquet reader and column pruning
    (ReadSchema = referenced columns only). A 100 TB scan that reads the
    text column to count rows, or re-filters post-scan what the reader
    could skip, is the regression this pins."""
    reg = Q.queries()

    # pricing_summary: the shipdate predicate reaches PushedFilters and
    # the wide lineitem table is pruned to the 7 referenced columns
    scans = _file_scans(reg["pricing_summary"](spark, SF_DIR))
    li = [s for s in scans if "lineitem" in s]
    assert li and "LessThanOrEqual(l_shipdate" in li[0], li
    assert "l_comment" not in li[0] and "l_orderkey" not in li[0]

    # corpus_report aggregates metadata — the payload column must NOT be
    # read (the difference between scanning 3 columns and 100 TB of text)
    scans = _file_scans(reg["corpus_report"](spark, SF_DIR))
    doc = [s for s in scans if "documents" in s]
    assert doc and "text" not in doc[0].split("Location")[0], doc

    # retention_cohorts: events pruned to (ts, user_id) — no props/value
    scans = _file_scans(reg["retention_cohorts"](spark, SF_DIR))
    ev = [s for s in scans if "events" in s]
    assert ev, "no events scan found"
    head = ev[0].split("Location")[0]
    assert "props" not in head and "value" not in head, ev[0]
