#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed once to warm (plan compilation + page cache shared
across the suite via the JVM) — no: executed exactly once, timed
end-to-end including the action (count/collect of a bounded result),
mirroring how the driver compares against BASELINE.md.
"""

from __future__ import annotations

import json
import os
import re
import time

from postgis_gtfs_importer_spark.plans import queries as Q
from postgis_gtfs_importer_spark.session import get_spark

# Headline queries: the relational spine + the heaviest LLM-pipeline ops.
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
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(app_name="bench")
    registry = Q.queries()

    # Warm the JVM paths the suite exercises (codegen compiler, parquet
    # reader init, shuffle machinery) with a trivial throwaway job, so the
    # first measured query pays its own cost, not session startup. The
    # benchmarked queries themselves still run exactly once, cold.
    spark.range(10_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = registry[name]
        t0 = time.monotonic()
        try:
            df = fn(spark, sf_dir)
            n = df.count()
        except Exception as e:  # one bad query must not lose the JSON line
            print(f"# {name}: FAILED {type(e).__name__}: {e}", flush=True)
            timings[name] = -1.0
            continue
        dt = time.monotonic() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.3f}s ({n} rows)", flush=True)

    print(
        json.dumps(
            {
                "metric": "headline_query_suite_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
