"""Distributed global ranking without a single-task window.

``rank() over (order by ...)`` with no partition key funnels the whole
relation through ONE window task (Spark logs "No Partition Defined for
Window operation" — the same trap sweep.py documents for prefix sums
and skyline.py for dominance). That is tolerable for the native-pin
registry entries that rank small AGGREGATED relations
(ntile_buckets / percent_rank_native), and fatal for ranking a fact.

``global_rank`` is the scalable two-phase form:

  1. ``repartitionByRange`` on the order key — Spark's range
     partitioner samples the key distribution and assigns contiguous
     key ranges to partitions; EQUAL keys land in one partition, which
     is what keeps tie groups intact for rank() semantics.
  2. per-partition local ``rank()`` (parallel — each partition windows
     only its own rows) plus a partition-size offset cascade: sizes by
     ``spark_partition_id()``, cumulated with a window over the
     #partitions-sized table (tiny), broadcast-joined back.

Global rank = partition offset + local rank. Integer addition makes the
split exact; the sampled partition boundaries are nondeterministic
across runs but the RESULT is invariant (rank is a pure function of
the key order). The registry entry's oracle is the NATIVE rank()
window, so the green row proves the two-phase form equals the
single-task definition on real data — the same verification pattern as
peak_concurrency's prefix sum.

Reference scope: extension family (no ranking surface in the
reference); the scalable twin of the native-window rank pins
(Q: ntile_buckets / percent_rank_native), which tolerate the
single-task window only because they rank small aggregated
relations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order_cols: list[str | Column],
    rank_col: str = "rnk",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``rank_col`` = SQL rank() (ties share, gaps after) in
    ``order_cols`` order, with no data-sized single-task stage."""
    from .dedup import materialize

    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # MATERIALIZE the range-partitioned relation before deriving both
    # the per-partition sizes and the probe side from it: the range
    # exchange SAMPLES its boundaries nondeterministically, so two
    # separately-executed instances of this subplan could disagree on
    # which partition a row landed in — the offsets would then describe
    # partitions the probe side never saw (silently wrong ranks).
    # ReusedExchange happens to rescue the un-cut plan today, but the
    # repo's own materialize() contract says aliased self-reads must
    # not rely on that.
    ranged = materialize(
        df.repartitionByRange(parts, *order_cols).withColumn(
            "_pid", F.spark_partition_id()
        )
    )
    sizes = ranged.groupBy("_pid").agg(F.count("*").alias("_n"))
    w_off = Window.orderBy("_pid")
    offsets = sizes.select(
        "_pid", (F.sum("_n").over(w_off) - F.col("_n")).alias("_off")
    )
    w_local = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        ranged.join(F.broadcast(offsets), "_pid")
        .withColumn(
            rank_col,
            (F.col("_off") + F.rank().over(w_local)).cast("long"),
        )
        .drop("_pid", "_off")
    )
