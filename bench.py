#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
compact JSON line the driver can capture from the stdout tail:

    {"metric": "headline_query_suite_total", "value": total_cold_sec,
     "unit": "sec", "queries": {name: cold_sec}, "total_warm": sec,
     "sf": ..., "detail": "BENCH_DETAIL.json"}

Round-2 lesson: the final line previously carried per-query warm timings
AND exchange counts, outgrew the driver's ~2 KB tail capture, and the
round recorded no headline number at all ("parsed": null). The full
cold/warm/exchange/row/watermark detail now goes to BENCH_DETAIL.json
(plus a $SPARK_GRAFT_ROUND-stamped copy when that env var is set); the
stdout line stays minimal.

Methodology: each query runs once cold (end-to-end, the number compared
against BASELINE.md) and once warm (codegen/scan caches hot — the
steady-state figure). "exchanges" counts shuffle Exchange operators in
the AQE-final physical plan: a stable plan-shape fingerprint that
surfaces a regression adding a shuffle even when timing noise hides it.
Streaming queries also record numRowsDroppedByWatermark / state rows from
the drained run (streaming.events.LAST_RUN_METRICS) so stateful-operator
cost is measured on CORRECT results, not collapsed-timestamp artifacts.
"""

from __future__ import annotations

import json
import os
import re
import time

from postgis_gtfs_importer_spark.plans import queries as Q
from postgis_gtfs_importer_spark.session import get_spark

# Headline queries: the relational spine + the heaviest LLM-pipeline ops
# + the C11/C15 flagship derivations (DST-proof absolute timestamps).
HEADLINE = [
    "pricing_summary",
    "revenue_by_nation",
    "service_days",
    "connections",
    "shapes_aggregated",
    "stats_by_type_day",
    "retention_topk",
    "dedup_exact",
    "text_quality",
    "lang_id",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "embedding_topk",
    "embedding_cosine_pairs",
    "sessionize",
    "multimodal_features",
    "token_topk",
    "arrivals_departures_abs",
    "stats_agency_route_stop_hour",
    "active_trips_by_hour",
    "decontaminate",
    "ngram_jaccard_capped",
    "repetition_profile",
    "hash_split",
    "streaming_windowed_stats",
    "asof_join",
    "range_join",
    "pack_sequences",
    "small_quantity_revenue",
    "streaming_sessionize",
    "dedup_incremental",
    "chunk_documents",
    "inverted_index",
    "semantic_dedup",
    "streaming_interval_join",
    "stops_radius_pairs",
    "nearest_stops",
    "shape_lengths",
    "kmv_distinct_users",
    "hll_distinct_users",
    "snapshot_diff",
    "classifier_scores",
    "source_cap",
    "pmi_bigrams",
    "bm25_topk",
    "streaming_dedup",
    "streaming_enrich",
    "scd2_apply",
    "cms_token_counts",
    "hll_merge_shards",
    "zorder_hist",
    "negative_samples",
    "priority_sample",
    "hist_quantiles",
    "market_share",
    "top_returners",
    "corpus_report",
    # round-4 additions
    "funnel_conversion",
    "retention_cohorts",
    "stats_route_date",
    "lexical_rarity",
    "neardup_incremental",
    "event_transitions",
    "bloom_membership",
    "hopping_window_stats",
    "min_cost_supplier",
    "excess_shippers",
    "fuzzy_title_pairs",
    "trend_by_type",
    # TPC-H-22 completion
    "shipping_priority",
    "revenue_forecast",
    "product_type_profit",
    "important_parts",
    "priority_shipment_buckets",
    "customer_order_distribution",
    "promo_revenue_share",
    "top_supplier",
    "supplier_part_counts",
    "bulk_customers",
    "disjunctive_revenue",
    "dormant_customers",
    "bigram_lm_scores",
    "bpe_merges",
    "ann_int8_topk",
    "audio_features",
    "streaming_interval_join_outer",
    "quality_gate",
    "video_features",
    # continuation-block additions
    "line_dedup",
    "pagerank_trade",
    "pareto_customers",
    "events_json_stats",
    "score_quantile_norm",
    "hilbert_hist",
    "temperature_sample",
    "mad_outliers",
    "table_profile",
    "session_window_native",
    "entity_resolution",
    "locf_resample",
    "revenue_pivot",
    "streaming_corpus_gate",
    "eigenvector_centrality",
    "split_leakage_audit",
    "benford_audit",
    "wow_change",
    "streaming_session_window",
    "unpivot_roundtrip",
    "streaming_hll_dashboard",
    "robust_scale",
    # round-5 additions
    "bpe_encode",
    "prefix_filter_jaccard",
    "triangle_count",
    "tvd_drift",
    "revenue_cube",
    "knn_label_vote",
    "ann_recall_at_k",
    "skew_salted_join",
    "topk_parts_per_nation",
    "zorder_pruning_stats",
    "asof_join_forward",
    "ntile_buckets",
    "equidepth_hist",
    "time_rollup",
    "corr_components",
    "first_touch_attribution",
    "variant_extract_stats",
    "item_similarity",
    "association_rules",
    "peak_concurrency",
    "weekday_seasonality",
    "kcore_membership",
    "grouping_sets_mix",
    "percent_rank_native",
    "global_rank_distributed",
    "sssp_trade",
    "phrase_search",
    "ols_trend",
    "greedy_set_cover",
    # round-7 additions (coverage tail; CORE_30 stays frozen)
    "interval_union",
    "interpolate_resample",
    "skipgram_pairs",
    "oov_rate",
    "winsorized_stats",
    "hits_trade",
    "time_weighted_avg",
    "asof_join_nearest",
    "dup_ngram_coverage",
    "cusum_changepoints",
    # round-8 additions
    "kmeans_lloyd",
    "weighted_sample_aes",
    # round-8 wave 2
    "label_propagation",
    "rrf_fusion",
    "mmr_select",
    "decayed_counts",
    # round-8 wave 3
    "containment_pairs",
    "degree_assortativity",
    "poisson_bootstrap_ci",
    # round-8 wave 4
    "local_clustering",
    "calibration_bins",
    # round-8 wave 5
    "headway_stats",
    # round-8 wave 6
    "vocab_coverage",
    "knn_graph",
    # round-8 wave 7
    "path_mining",
    # round-9 additions (coverage tail; CORE_30 stays frozen)
    # (decontaminate was already a headline entry; its r9 upgrade is
    # timed under the existing slot)
    "dsir_resample",
    "gopher_quality_gate",
    "adamic_adar",
    "simplified_silhouette",
    "embedding_drift",
    "rate_spikes",
    "hard_negatives",
    "ktruss",
    "dedup_spans",
    "ccnet_buckets",
    "token_budget_mix",
    "bpe_fertility",
    "trip_overtaking",
    "closeness_centrality",
    "kmv_set_overlap",
    "mixture_concentration",
    "canonical_by_quality",
    "psi_drift",
    "ab_lift_ci",
    # r10 additions
    "trigram_backoff_lm",
    "compaction_plan",
    "key_skew_profile",
    "rendezvous_assign",
    "rbo_overlap",
    # r11 additions
    "quantile_sketch",
]

#: The ONLY queries named in the stdout line's "queries" map — the
#: suite's historically heaviest, as regression canaries. Everything
#: else lives in BENCH_DETAIL.json (cold/warm/exchanges/rows + deltas);
#: the driver's ~2 KB stdout tail capture budgets the final line to
#: <500 bytes (VERDICT r4 item 4 — the omit-list approach kept growing
#: back toward the limit with every added family).
STDOUT_KEEP = {
    "pricing_summary",
    "arrivals_departures_abs",
    "minhash_lsh_pairs",
    "ngram_jaccard_capped",
    "embedding_cosine_pairs",
    "streaming_sessionize",
    "line_dedup",
    "import_e2e",  # reported separately, listed for completeness
}

#: The FROZEN 30-query timed core (VERDICT r5 item 6): `core_warm_sum`
#: over exactly this list is the tracked headline number, immune to
#: suite growth (total_warm kept creeping up purely from added
#: coverage). Selection rule, applied ONCE at the r5 close and then
#: frozen: the 30 warmest queries of BENCH_DETAIL_r5 (heaviest =
#: most regression-sensitive); r5 backfill value over this list =
#: 70.60 s warm at sf0.1. Do NOT re-derive per round — the point is a
#: constant denominator; additions go to the rotating tail.
CORE_30 = [
    "sssp_trade",
    "pagerank_trade",
    "prefix_filter_jaccard",
    "streaming_sessionize",
    "eigenvector_centrality",
    "triangle_count",
    "embedding_cosine_pairs",
    "streaming_interval_join",
    "item_similarity",
    "entity_resolution",
    "simhash_pairs",
    "association_rules",
    "streaming_interval_join_outer",
    "minhash_lsh_pairs",
    "split_leakage_audit",
    "neardup_incremental",
    "ngram_jaccard_pairs",
    "bpe_merges",
    "greedy_set_cover",
    "ngram_jaccard_capped",
    "min_cost_supplier",
    "bulk_customers",
    "revenue_cube",
    "market_share",
    "excess_shippers",
    "small_quantity_revenue",
    "shipping_priority",
    "topk_parts_per_nation",
    "bigram_lm_scores",
    "bm25_topk",
]

STREAMING_QUERIES = {
    "streaming_corpus_gate",
    "streaming_hll_dashboard",
    "streaming_session_window",
    "streaming_windowed_stats",
    "streaming_sessionize",
    "streaming_interval_join",
    "streaming_interval_join_outer",
    "streaming_dedup",
    "streaming_enrich",
}


def _exchanges(df) -> int:
    """Shuffle count in the executed (AQE-final) physical plan."""
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
        return sum(
            1
            for line in plan.splitlines()
            if "Exchange" in line and "ReusedExchange" not in line
        )
    except Exception:
        return -1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(app_name="bench")
    registry = Q.queries()

    # Warm the JVM paths the suite exercises (codegen compiler, parquet
    # reader init, shuffle machinery) with a trivial throwaway job, so the
    # first measured query pays its own cost, not session startup. The
    # cold-timed queries themselves still run exactly once, cold.
    spark.range(10_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    timings: dict[str, float] = {}
    detail: dict[str, dict] = {}
    total = 0.0
    total_warm = 0.0
    for name in HEADLINE:
        fn = registry[name]
        t0 = time.monotonic()
        try:
            df = fn(spark, sf_dir)
            n = df.count()
        except Exception as e:  # one bad query must not lose the JSON line
            print(f"# {name}: FAILED {type(e).__name__}: {e}", flush=True)
            timings[name] = -1.0
            detail[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
            continue
        dt = time.monotonic() - t0
        # 1 decimal in the stdout line (3 decimals in BENCH_DETAIL.json):
        # the driver's tail capture is ~2 KB and every byte of the final
        # line counts — see the guard before print().
        if name in STDOUT_KEEP:
            timings[name] = round(dt, 1)
        total += dt
        d: dict = {"cold": round(dt, 3), "rows": n, "exchanges": _exchanges(df)}
        if name in STREAMING_QUERIES:
            from postgis_gtfs_importer_spark.streaming.events import (
                LAST_RUN_METRICS,
            )

            d["stream"] = dict(LAST_RUN_METRICS)
        t1 = time.monotonic()
        fn(spark, sf_dir).count()  # steady state: codegen cache hot
        dt_w = time.monotonic() - t1
        d["warm"] = round(dt_w, 3)
        total_warm += dt_w
        detail[name] = d
        print(
            f"# {name}: {dt:.3f}s cold / {dt_w:.3f}s warm"
            f" ({n} rows, {d['exchanges']} exchanges)",
            flush=True,
        )

    # The reference's headline operation: one END-TO-END import (synthetic
    # feed -> clean -> derive -> atomic publish into live PG or the
    # LocalCatalog twin) — importDurationMs parity (import.js:267-277).
    # Reported top-level (NOT folded into the query-suite totals: it is a
    # pipeline metric, and keeping `value` = query suite keeps the number
    # comparable across rounds).
    import tempfile

    from postgis_gtfs_importer_spark.plans.import_bench import run_import_bench

    import_e2e = None
    try:
        with tempfile.TemporaryDirectory(prefix="import-e2e-") as wd:
            imp = run_import_bench(spark, wd, scale=(sf or 0.1) * 10)
        import_e2e = imp["total_sec"]
        detail["import_e2e"] = imp
        print(
            f"# import_e2e: {imp['total_sec']:.3f}s ({imp['backend']} backend,"
            f" {imp['arrivals_rows']} arrivals rows,"
            f" skip-rerun {imp['skipped_rerun_sec']:.3f}s)",
            flush=True,
        )
    except Exception as e:  # the bench line must survive a backend failure
        print(f"# import_e2e: FAILED {type(e).__name__}: {e}", flush=True)
        detail["import_e2e"] = {"error": f"{type(e).__name__}: {e}"[:300]}

    # Same noise adjudication the query suite gets (VERDICT r9 item 4 —
    # the 28.2 vs 37.5 s import_e2e drift was pure ambient load, shown
    # only by off-artifact quiet-path reruns): when the measured total
    # regresses >1.3x against the previous artifact, rerun once in
    # isolation and record `retime_total_sec` so the artifact carries
    # the adjudication itself.
    try:
        prev_imp = None
        with open(os.path.join(os.path.dirname(__file__) or ".",
                               "BENCH_DETAIL.json")) as f:
            prev_imp = json.load(f).get("queries", {}).get(
                "import_e2e", {}
            ).get("total_sec")
    except (OSError, ValueError):
        pass
    if (
        import_e2e is not None
        and prev_imp
        and import_e2e > 1.3 * prev_imp
    ):
        try:
            with tempfile.TemporaryDirectory(prefix="import-rt-") as wd:
                imp_rt = run_import_bench(spark, wd, scale=(sf or 0.1) * 10)
            detail["import_e2e"]["retime_total_sec"] = imp_rt["total_sec"]
            print(
                f"# import_e2e retime: {imp_rt['total_sec']:.3f}s"
                f" (prev {prev_imp:.3f}s)",
                flush=True,
            )
        except Exception as e:
            print(f"# import_e2e retime FAILED: {e}", flush=True)

    # sf1-class import (VERDICT r5 item 8): one decade up from the
    # standing run (~11.5M arrivals vs ~1.15M) to pin COPY-sink
    # throughput scaling. Env-gated — it adds minutes, so it runs when
    # explicitly requested (SPARK_GRAFT_IMPORT_X10=1), not per-round;
    # the recorded evidence lives in PARITY.md + SURVEY §8.
    if os.environ.get("SPARK_GRAFT_IMPORT_X10"):
        try:
            with tempfile.TemporaryDirectory(prefix="import-x10-") as wd:
                imp10 = run_import_bench(spark, wd, scale=(sf or 0.1) * 100)
            detail["import_e2e_x10"] = imp10
            rps = imp10["arrivals_rows"] / max(imp10["total_sec"], 1e-9)
            print(
                f"# import_e2e_x10: {imp10['total_sec']:.3f}s"
                f" ({imp10['backend']} backend,"
                f" {imp10['arrivals_rows']} arrivals rows, {rps:,.0f} rows/s)",
                flush=True,
            )
        except Exception as e:
            print(f"# import_e2e_x10: FAILED {type(e).__name__}: {e}", flush=True)
            detail["import_e2e_x10"] = {"error": f"{type(e).__name__}: {e}"[:300]}

    # sf1-class scale smoke (VERDICT r4 item 6): the heavy near-dup path
    # on a 50k-doc synthetic corpus with a deliberately hot key (one
    # line verbatim in EVERY document, sources/synth.py) — recorded here
    # so the per-round artifact carries the above-sf0.1 wall-clock and
    # the skew-split evidence, not just the correctness-suite timings.
    # Not folded into the query-suite totals (different input).
    try:
        from pyspark.sql import functions as SF

        from postgis_gtfs_importer_spark.operators.dedup import (
            minhash_lsh_pairs,
            ngram_jaccard_pairs_capped,
        )
        from postgis_gtfs_importer_spark.operators.lines import line_dedup
        from postgis_gtfs_importer_spark.sources.synth import (
            synth_skewed_corpus,
        )

        n_docs = 50_000
        smoke: dict = {"n_docs": n_docs}
        # hot-line corpus (boilerplate in EVERY doc, 4x) for line dedup.
        # Skew thresholds scaled to this input (the defaults trigger at
        # 256 MB partitions — proportionate at 100 TB, unreachable at
        # 50k docs), so the recorded skew_split reflects the plan
        # behavior the thresholds are FOR, at this size.
        skew_confs = {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
                "16KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        }
        saved_confs = {k: spark.conf.get(k, None) for k in skew_confs}
        corpus_hot = synth_skewed_corpus(spark, n_docs)
        try:
            for k, v in skew_confs.items():
                spark.conf.set(k, v)
            t0 = time.monotonic()
            ld_agg = line_dedup(corpus_hot).agg(
                SF.sum("dropped_lines").alias("dropped"), SF.count("*")
            )
            ld_agg.collect()
            smoke["line_dedup_sec"] = round(time.monotonic() - t0, 3)
            smoke["line_dedup_skew_split"] = (
                "skew=true"
                in ld_agg._jdf.queryExecution().executedPlan().toString()
            )
        finally:
            for k, v in saved_confs.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
        # twin-pair corpus (36-token shared phrase per doc pair, no
        # boilerplate — a real pipeline runs MinHash after line-level
        # boilerplate removal) for the similarity family: twins land
        # above the 0.5 threshold, non-twins near zero — pair volume
        # stays linear in n_docs. (The hot-shingle cap behavior itself
        # is pinned by test_capped_jaccard_skew_split_and_hot_only_semantics.)
        corpus_pairs = synth_skewed_corpus(
            spark, n_docs, hot_repeats=0, filler_tokens=12, phrase_tokens=36
        )
        t0 = time.monotonic()
        mh = minhash_lsh_pairs(
            corpus_pairs, id_col="doc_id", text_col="text",
            num_hashes=32, bands=8, threshold=0.5, seed=42,
        )
        smoke["minhash_pairs"] = mh.count()
        smoke["minhash_sec"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        nj = ngram_jaccard_pairs_capped(
            corpus_pairs.withColumn("blk", SF.lit("B")),
            "doc_id", "text", "blk", 3, 0.5, max_df=1000,
        )
        smoke["jaccard_capped_pairs"] = nj.count()
        smoke["jaccard_capped_sec"] = round(time.monotonic() - t0, 3)
        detail["scale_smoke_sf1"] = smoke
        print(f"# scale_smoke_sf1: {smoke}", flush=True)
    except Exception as e:
        print(f"# scale_smoke_sf1: FAILED {type(e).__name__}: {e}", flush=True)
        detail["scale_smoke_sf1"] = {"error": f"{type(e).__name__}: {e}"[:300]}

    # graph-family scale smoke: the iterative/combinatorial graph
    # operators on a 100k-node hub+path graph — maximal degree skew
    # (one hub owns half the edge endpoints, the celebrity-node shape)
    # with ANALYTIC invariants: exactly n-2 triangles (the fans
    # (0,i,i+1)) and every node at distance 1 through the hub. The
    # linearity bound itself is pinned by
    # tests/test_scale_smoke.py::test_graph_family_skew_and_linearity;
    # this block records the above-sf0.1 wall-clock per round.
    try:
        from pyspark.sql import functions as SF

        from postgis_gtfs_importer_spark.operators.graph import (
            sssp,
            triangle_count,
        )

        n = 100_000
        gsmoke: dict = {"n_nodes": n}
        hub = spark.range(1, n).select(
            SF.lit(0).cast("long").alias("a"), SF.col("id").alias("b")
        )
        path = spark.range(1, n - 1).select(
            SF.col("id").alias("a"), (SF.col("id") + 1).alias("b")
        )
        g = hub.unionByName(path)
        t0 = time.monotonic()
        tri = triangle_count(g).collect()[0]
        gsmoke["triangle_sec"] = round(time.monotonic() - t0, 3)
        assert tri.n_triangles == n - 2, tri
        gsmoke["triangles"] = tri.n_triangles
        und = g.select(
            SF.col("a").alias("src"),
            SF.col("b").alias("dst"),
            SF.when(SF.col("a") == 0, SF.lit(1)).otherwise(SF.lit(10)).alias("w"),
        )
        directed = und.unionByName(
            und.select(SF.col("dst").alias("src"), SF.col("src").alias("dst"), "w")
        )
        t0 = time.monotonic()
        sp = sssp(directed, max_rounds=6).agg(
            SF.count("*").alias("nodes"), SF.sum("dist").alias("total")
        ).collect()[0]
        gsmoke["sssp_sec"] = round(time.monotonic() - t0, 3)
        assert (sp.nodes, sp.total) == (n, n - 1), sp
        # the two L-infinity-normalized iterative families (VERDICT r7
        # item 8): on the hub graph the celebrity node must pin the
        # normalizer at EXACTLY 1e6 on every relevant side — the
        # integer-normalization invariant at 100k-node volume, recorded
        # next to triangles/sssp each round (linearity is pinned in
        # tests/test_scale_smoke.py).
        from postgis_gtfs_importer_spark.operators.graph import (
            eigenvector_centrality,
            hits,
        )

        t0 = time.monotonic()
        ev = {r.node: r.v for r in eigenvector_centrality(
            directed.select("src", "dst", "w"), iterations=3
        ).orderBy(SF.desc("v"), SF.asc("node")).limit(3).collect()}
        gsmoke["eigenvector_sec"] = round(time.monotonic() - t0, 3)
        assert ev[0] == 1_000_000, ev  # hub owns the L-inf normalizer
        assert all(v < 1_000_000 for nd, v in ev.items() if nd != 0), ev
        t0 = time.monotonic()
        ht = hits(g.select(SF.col("a").alias("hub"),
                           SF.col("b").alias("auth")), iterations=2)
        mx = {r.side: r.mx for r in ht.groupBy("side")
              .agg(SF.max("score").alias("mx")).collect()}
        hub_top = [r.node for r in ht.filter(
            (SF.col("side") == "hub") & (SF.col("score") == 1_000_000)
        ).collect()]
        gsmoke["hits_sec"] = round(time.monotonic() - t0, 3)
        assert mx == {"hub": 1_000_000, "auth": 1_000_000}, mx
        assert hub_top == [0], hub_top  # the celebrity node, uniquely
        # label propagation (round-8 wave 2, the seventh iterative
        # family) on the same skewed graph: the hub's label floods the
        # whole component in round 1 (every node's plurality neighbor
        # label is the hub's), so after 4 semi-synchronous rounds the
        # graph must be ONE community — the analytic invariant at
        # 100k-node volume under celebrity-node skew.
        from postgis_gtfs_importer_spark.operators.graph import (
            label_propagation,
        )

        t0 = time.monotonic()
        lpa = label_propagation(directed.select("src", "dst"), iterations=4)
        n_comm = lpa.select("community").distinct().count()
        gsmoke["lpa_sec"] = round(time.monotonic() - t0, 3)
        assert n_comm == 1, n_comm
        gsmoke["lpa_communities"] = n_comm
        detail["scale_smoke_graph"] = gsmoke
        print(f"# scale_smoke_graph: {gsmoke}", flush=True)
    except Exception as e:
        print(f"# scale_smoke_graph: FAILED {type(e).__name__}: {e}", flush=True)
        detail["scale_smoke_graph"] = {"error": f"{type(e).__name__}: {e}"[:300]}

    # ANN-family scale smoke: IVF top-10 on a 160k-vector
    # planted-cluster corpus (deterministic one-hot cluster directions,
    # tests/test_scale_smoke.py::_clustered_embeddings) with recall
    # measured against exact brute-force ground truth — the third
    # heavy-family wall-clock record next to near-dup and graph. The
    # recall/balance/linearity bounds themselves are pinned by
    # test_ann_family_recall_and_linearity.
    try:
        from pyspark.sql import functions as SF

        from postgis_gtfs_importer_spark.operators.similarity import (
            brute_force_topk_matmul,
            ivf_topk,
        )

        n_vec, dim, n_cl = 160_000, 16, 16
        asmoke: dict = {"n_vectors": n_vec}
        jseq = SF.sequence(SF.lit(0), SF.lit(dim - 1))
        corpus = spark.range(n_vec).select(
            SF.col("id").alias("vec_id"),
            SF.transform(
                jseq,
                lambda jj: SF.when(
                    jj.cast("bigint") == SF.col("id") % n_cl, SF.lit(1.0)
                ).otherwise(SF.lit(0.0))
                + ((SF.col("id") * 7 + jj) % 11 - 5).cast("double") / 500.0,
            ).alias("embedding"),
        )
        aqueries = corpus.filter(
            (SF.col("vec_id") >= 1000) & (SF.col("vec_id") < 1020)
        )
        t0 = time.monotonic()
        ivf = {
            (r.q_id, r.vec_id)
            for r in ivf_topk(
                corpus, aqueries, k=10, n_centroids=n_cl, nprobe=4
            ).collect()
        }
        asmoke["ivf_sec"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        truth = {
            (r.q_id, r.vec_id)
            for r in brute_force_topk_matmul(corpus, aqueries, k=10).collect()
        }
        asmoke["brute_sec"] = round(time.monotonic() - t0, 3)
        asmoke["recall_at_10"] = round(len(ivf & truth) / len(truth), 4)
        detail["scale_smoke_ann"] = asmoke
        print(f"# scale_smoke_ann: {asmoke}", flush=True)
    except Exception as e:
        print(f"# scale_smoke_ann: FAILED {type(e).__name__}: {e}", flush=True)
        detail["scale_smoke_ann"] = {"error": f"{type(e).__name__}: {e}"[:300]}

    # k-means-family scale smoke (round 8): train the Lloyd loop on a
    # 40k-vector planted-cluster corpus (same construction as the ANN
    # smoke; seeds 0..15 land one per planted cluster by id % 16) and
    # assert EXACT recovery: 16 surviving centroids with perfectly
    # balanced membership — the analytic-invariant discipline of the
    # graph smokes applied to the sixth iterative family.
    try:
        from pyspark.sql import functions as SF

        from postgis_gtfs_importer_spark.operators.clustering import (
            kmeans_lloyd,
        )

        n_vec, dim, k = 40_000, 16, 16
        ksmoke: dict = {"n_vectors": n_vec, "k": k}
        jseq = SF.sequence(SF.lit(0), SF.lit(dim - 1))
        corpus = spark.range(n_vec).select(
            SF.col("id").alias("vec_id"),
            SF.transform(
                jseq,
                lambda jj: SF.when(
                    jj.cast("bigint") == SF.col("id") % k, SF.lit(1.0)
                ).otherwise(SF.lit(0.0))
                + ((SF.col("id") * 7 + jj) % 11 - 5).cast("double") / 500.0,
            ).alias("embedding"),
        )
        t0 = time.monotonic()
        sizes = {
            r.cid: r.n_members
            for r in kmeans_lloyd(corpus, k=k, iterations=2)
            .select("cid", "n_members").distinct().collect()
        }
        ksmoke["kmeans_sec"] = round(time.monotonic() - t0, 3)
        assert len(sizes) == k and set(sizes.values()) == {n_vec // k}, sizes
        ksmoke["balanced_clusters"] = len(sizes)
        detail["scale_smoke_kmeans"] = ksmoke
        print(f"# scale_smoke_kmeans: {ksmoke}", flush=True)
    except Exception as e:
        print(f"# scale_smoke_kmeans: FAILED {type(e).__name__}: {e}", flush=True)
        detail["scale_smoke_kmeans"] = {"error": f"{type(e).__name__}: {e}"[:300]}

    # knn-graph scale smoke (VERDICT r8 item 6): the IVF-blocked bulk
    # kNN graph on the SAME 160k-vector planted-cluster corpus the ANN
    # smoke uses, with recall measured against exact brute-force truth
    # for a 20-vector sample — wall + recall recorded per round next to
    # ivf_sec. n_centroids=400 ~ sqrt(160k), the documented cell-sizing
    # rule, so per-cell quadratic work totals ~N^1.5.
    try:
        from pyspark.sql import functions as SF

        from postgis_gtfs_importer_spark.operators.similarity import (
            brute_force_topk,
            knn_graph,
        )

        n_vec, dim, n_cl = 160_000, 16, 16
        nsmoke: dict = {"n_vectors": n_vec}
        jseq = SF.sequence(SF.lit(0), SF.lit(dim - 1))
        corpus = spark.range(n_vec).select(
            SF.col("id").alias("vec_id"),
            SF.transform(
                jseq,
                lambda jj: SF.when(
                    jj.cast("bigint") == SF.col("id") % n_cl, SF.lit(1.0)
                ).otherwise(SF.lit(0.0))
                + ((SF.col("id") * 7 + jj) % 11 - 5).cast("double") / 500.0,
            ).alias("embedding"),
        )
        t0 = time.monotonic()
        sample_ids = set(range(1000, 1020))
        g = knn_graph(corpus, k=10, n_centroids=400)
        by_vec: dict = {}
        for r in g.filter(SF.col("vec_id").isin(*sample_ids)).collect():
            by_vec.setdefault(r.vec_id, set()).add(r.nbr_id)
        nsmoke["knn_graph_sec"] = round(time.monotonic() - t0, 3)
        sample = corpus.filter(SF.col("vec_id").isin(*sample_ids))
        truth: dict = {}
        for r in brute_force_topk(corpus, sample, k=10).collect():
            truth.setdefault(r.q_id, set()).add(r.vec_id)
        hits_n = sum(len(by_vec.get(v, set()) & s) for v, s in truth.items())
        # NOT `total`: that name is main()'s suite cold-time accumulator,
        # and shadowing it here froze the stdout headline `value` at
        # exactly 200 (20 sample ids x k=10) for rounds 9-11 (VERDICT r11
        # item 1). The guard before the final print() now pins the
        # invariant mechanically.
        truth_n = sum(len(s) for s in truth.values())
        nsmoke["knn_graph_recall_at_10"] = round(hits_n / truth_n, 4)
        detail["scale_smoke_knn_graph"] = nsmoke
        print(f"# scale_smoke_knn_graph: {nsmoke}", flush=True)
    except Exception as e:
        print(f"# scale_smoke_knn_graph: FAILED {type(e).__name__}: {e}",
              flush=True)
        detail["scale_smoke_knn_graph"] = {
            "error": f"{type(e).__name__}: {e}"[:300]
        }

    # session-path scale smoke (VERDICT r8 item 6): path_mining over a
    # 198k-user synthetic event stream with an ANALYTIC invariant —
    # each user emits a 3-event session (a,b,c one minute apart), a
    # 2-hour gap, then a 2-event session (d,e): the ONLY 3-gram is
    # 'a > b > c', exactly once per user; any cross-gap or cross-user
    # leakage would surface as extra paths or inflated counts.
    try:
        from pyspark.sql import functions as SF

        from postgis_gtfs_importer_spark.operators.sessions import (
            path_mining,
        )

        n_users = 198_000
        psmoke: dict = {"n_users": n_users}
        base = SF.to_timestamp(SF.lit("2024-01-01 12:00:00"))
        offs = [(0, "a"), (60, "b"), (120, "c"), (7320, "d"), (7380, "e")]
        ev = spark.range(n_users).select(
            SF.col("id").alias("user_id"),
            SF.explode(
                SF.array(
                    *[
                        SF.struct(
                            SF.lit(o).alias("off"), SF.lit(t).alias("ty")
                        )
                        for o, t in offs
                    ]
                )
            ).alias("e"),
        ).select(
            "user_id",
            (base + SF.make_interval(secs=SF.col("e.off"))).alias("ts"),
            SF.col("e.ty").alias("event_type"),
            SF.concat_ws("-", "user_id", "e.off").alias("event_id"),
        )
        t0 = time.monotonic()
        paths = {
            r["path"]: r["n"]
            for r in path_mining(ev, n=3, k=5, gap_sec=1800).collect()
        }
        psmoke["path_mining_sec"] = round(time.monotonic() - t0, 3)
        assert paths == {"a > b > c": n_users}, dict(list(paths.items())[:3])
        psmoke["paths_ok"] = True
        detail["scale_smoke_path_mining"] = psmoke
        print(f"# scale_smoke_path_mining: {psmoke}", flush=True)
    except Exception as e:
        print(f"# scale_smoke_path_mining: FAILED {type(e).__name__}: {e}",
              flush=True)
        detail["scale_smoke_path_mining"] = {
            "error": f"{type(e).__name__}: {e}"[:300]
        }

    # Cross-round comparability (VERDICT r4 item 7): read the PREVIOUS
    # run's detail file BEFORE overwriting it and record per-query warm
    # deltas, so cold-vs-warm artifacts (e.g. r4's staged-fact
    # arrivals_departures_abs "regression") are self-explaining in the
    # artifact itself instead of needing judge adjudication.
    here = os.path.dirname(__file__) or "."
    prev_queries: dict = {}
    prev_path = os.path.join(here, "BENCH_DETAIL.json")
    try:
        with open(prev_path) as f:
            prev_queries = json.load(f).get("queries", {})
    except (OSError, ValueError):
        pass
    common = 0
    prev_warm_sum = now_warm_sum = 0.0
    regressed_2x: list[str] = []
    for name, d in detail.items():
        pw = prev_queries.get(name, {}).get("warm")
        if pw is None or "warm" not in d:
            continue
        common += 1
        prev_warm_sum += pw
        now_warm_sum += d["warm"]
        d["prev_warm"] = pw
        d["delta_warm"] = round(d["warm"] - pw, 3)
        if d["warm"] > 2 * pw and d["warm"] - pw > 0.5:
            regressed_2x.append(name)
    # Machine-visible noise adjudication (VERDICT r7 item 2): the r7
    # driver run flagged 3 sub-2s queries whose code paths hadn't
    # changed — external load bursts during the suite run. Re-time each
    # flagged query IN ISOLATION at the end of the run (the suite's own
    # memory/GC churn has settled) and let the re-time adjudicate:
    # still >2x prev -> keep the flag; back inside the band -> record
    # `retime_warm` in the detail row and move the name to
    # `retimed_ok`, so the artifact itself carries the adjudication
    # instead of SURVEY prose the driver can't see.
    retimed_ok: list[str] = []
    still_regressed: list[str] = []
    for name in sorted(regressed_2x)[:8]:  # bound the extra wall-clock
        pw = prev_queries[name]["warm"]
        try:
            t0 = time.monotonic()
            registry[name](spark, sf_dir).count()
            rt = time.monotonic() - t0
        except Exception as e:
            # record WHY the retime failed — a silently swallowed
            # exception here looked identical to "still slow" in the
            # artifact (r11: two retimes threw, indistinguishable from
            # genuine regressions until rerun in isolation)
            detail[name]["retime_error"] = f"{type(e).__name__}: {e}"[:300]
            still_regressed.append(name)
            continue
        detail[name]["retime_warm"] = round(rt, 3)
        if rt > 2 * pw and rt - pw > 0.5:
            still_regressed.append(name)
        else:
            retimed_ok.append(name)
    still_regressed += sorted(regressed_2x)[8:]
    regressed_2x = still_regressed
    delta_vs_prev = {
        "common": common,
        "prev_warm_sum": round(prev_warm_sum, 2),
        "now_warm_sum": round(now_warm_sum, 2),
        "n_regressed_2x": len(regressed_2x),
        # names capped at 5 for the stdout budget; the full per-query
        # prev_warm/delta_warm columns live in BENCH_DETAIL.json
        "regressed_2x": sorted(regressed_2x)[:5],
        # flagged by the in-suite timing but re-timed back inside the
        # band in isolation — adjudicated measurement noise (names in
        # BENCH_DETAIL only; the stdout line carries just the count,
        # see the slim copy below)
        "retimed_ok": retimed_ok,
    }
    delta_stdout = {
        k: v for k, v in delta_vs_prev.items() if k != "retimed_ok"
    }
    delta_stdout["n_retimed_ok"] = len(retimed_ok)

    # frozen-core headline (VERDICT r5 item 6): comparable across rounds
    # because the denominator never grows with the suite
    core_now = [
        detail[n]["warm"]
        for n in CORE_30
        if isinstance(detail.get(n), dict) and "warm" in detail[n]
    ]
    core_prev = [
        prev_queries[n]["warm"]
        for n in CORE_30
        if isinstance(prev_queries.get(n), dict) and "warm" in prev_queries[n]
    ]
    core = {
        "core_warm_sum": round(sum(core_now), 2),
        "core_n": len(core_now),  # must be 30; fewer means a core query died
        "core_warm_sum_prev": (
            round(sum(core_prev), 2) if len(core_prev) == len(CORE_30) else None
        ),
    }

    # Headline-integrity guard (VERDICT r11 item 1): the stdout `value`
    # must be the sum of the per-query cold timings — a later block
    # reusing the accumulator name (the r9 `total = sum(...)` recall
    # denominator) silently corrupted it for three rounds. Each recorded
    # cold is rounded to 3 decimals, so allow that rounding slack.
    cold_sum = sum(
        v["cold"] for v in detail.values()
        if isinstance(v, dict) and "cold" in v and "warm" in v
    )
    assert abs(total - cold_sum) < 0.001 * len(detail) + 1e-6, (
        f"suite cold accumulator ({total:.3f}) != sum of per-query colds "
        f"({cold_sum:.3f}) — a local variable is shadowing `total` again"
    )

    detail_paths = ["BENCH_DETAIL.json"]
    rnd = os.environ.get("SPARK_GRAFT_ROUND")
    if rnd:
        detail_paths.append(f"BENCH_DETAIL_r{rnd}.json")
    payload = {
        "sf": sf,
        "total_cold": round(total, 3),
        "total_warm": round(total_warm, 3),
        "delta_vs_prev": delta_vs_prev,
        **core,
        "queries": detail,
    }
    for p in detail_paths:
        with open(os.path.join(here, p), "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)

    line = json.dumps(
        {
            "metric": "headline_query_suite_total",
            "value": round(total, 2),
            "unit": "sec",
            "queries": timings,
            # timed queries only — the smoke/import blocks share the
            # detail dict but are not suite queries
            "n_queries": sum(
                1 for v in detail.values()
                if isinstance(v, dict) and "warm" in v
            ),
            "total_warm": round(total_warm, 2),
            **core,
            "import_e2e": import_e2e,
            "delta_vs_prev": delta_stdout,
            "sf": sf,
            "detail": detail_paths[-1],
        },
        separators=(",", ":"),
    )
    # The driver captures only the ~2 KB stdout tail (round-2 "parsed:
    # null" failure mode). The stdout line now names only STDOUT_KEEP
    # canaries + summary fields, so the budget holds at any suite size;
    # fail LOUDLY here — and in tests/test_units.py::test_bench_line_budget
    # before that — rather than silently shipping a truncated line.
    assert len(line) < 800, (
        f"bench stdout line is {len(line)} bytes (>= 800): trim STDOUT_KEEP "
        "or delta_vs_prev['regressed_2x'] before the driver truncates it"
    )
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
