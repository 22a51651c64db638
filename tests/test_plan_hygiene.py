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
    "ann_ivf_topk",          # probe-cell ids x queries (both tiny)
    "translations_feedwide", # feed_info default-lang row (1 row) x tables
}

STREAMING = {
    "streaming_windowed_stats", "streaming_sessionize",
    "streaming_interval_join", "streaming_dedup", "streaming_enrich",
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
