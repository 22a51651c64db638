"""Round-12 isolation harness: fresh-process per-query timing, plan
dump, and job/exchange counts.

Usage:
  python plans/r12/measure.py <query> [--runs N] [--plan OUT.txt] [--cold-only]

Methodology (OPTIMIZATION_r11.md): the driver's count() action, median
of N warm runs after one cold run, job count from statusTracker —
deterministic evidence alongside wall time (the host has +-40% timing
noise; job counts do not lie).
"""
from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--plan", default=None)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from postgis_gtfs_importer_spark.plans import queries as Q
    from postgis_gtfs_importer_spark.session import get_spark

    spark = get_spark(app_name=f"measure-{args.query}")
    sc = spark.sparkContext
    fn = Q.queries()[args.query]
    # session warm-up (bench.py parity)
    spark.range(10_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(args.sf, "region.parquet")).count()

    if args.plan:
        df = fn(spark, args.sf)
        with open(args.plan, "w") as f:
            f.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")))
        print(f"plan -> {args.plan}")

    times, jobs = [], []
    for i in range(args.runs + 1):
        j0 = sc.statusTracker().getJobIdsForGroup(None)
        sc.setJobDescription(f"measure:{args.query}:run{i}")
        t0 = time.monotonic()
        n = fn(spark, args.sf).count()
        dt = time.monotonic() - t0
        j1 = sc.statusTracker().getJobIdsForGroup(None)
        tag = "cold" if i == 0 else "warm"
        nj = len(set(j1) - set(j0))
        print(f"run{i} ({tag}): {dt:.3f}s rows={n} jobs={nj}", flush=True)
        if i > 0:
            times.append(dt)
            jobs.append(nj)
    print(
        f"RESULT {args.query}: warm_median={statistics.median(times):.3f}s"
        f" (n={len(times)}) jobs={jobs[-1]}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
