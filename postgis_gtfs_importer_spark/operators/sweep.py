"""Sweep-line primitives: distributed running prefix sums.

The classic concurrency question — "how many sessions were open at the
busiest instant?" — is a sweep: sort the +1/-1 boundary deltas by time
and take the maximum of the running sum. The naive Spark form is
``sum(delta) over (order by t rows unbounded preceding)`` — an
UNPARTITIONED window, which funnels every row through one task (the
same single-task trap the skyline operator documents).

``running_prefix_sum`` is the two-phase distributed form:

  1. bucket rows by ``t div bucket_width`` and compute each bucket's
     delta TOTAL with one hash aggregate (map-side combined);
  2. cascade bucket totals into per-bucket STARTING OFFSETS with a
     window over the bucket table — single-task, but its input is
     ``#buckets`` rows (thousands), not the data;
  3. join the offsets back (broadcast) and window WITHIN each bucket
     (partitioned by bucket — parallel) so each row's running value is
     ``bucket_offset + within-bucket prefix``.

Exactness: integer deltas, integer sums — associativity makes the
two-phase split algebraically identical to the global scan, which is
precisely what the driver oracle (the naive unpartitioned window form)
verifies on real data. Tie handling is delegated to the caller's
``order_cols`` (e.g. process -1 before +1 at equal t for half-open
intervals).

Reference scope: the reference is a batch ETL with no windowed
analytics surface (SURVEY §2.D); this module belongs to the
large-scale analytics extension family, the running-total /
concurrency shapes an event pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def running_prefix_sum(
    df: DataFrame,
    t_col: str,
    delta_col: str,
    bucket_width: int,
    extra_order: list[str | Column] | None = None,
) -> DataFrame:
    """Add ``running`` = prefix sum of ``delta_col`` in
    (t, *extra_order) order, computed with NO global single-task pass
    over the data (see module docstring). ``t_col`` must be integral.
    """
    # The integral-div expr references only the FIXED internal alias,
    # never the caller's column name — a parser-hostile t_col (backtick,
    # quote) cannot break or redirect the expression (the
    # profile_columns identifier-injection class).
    with_b = (
        df.withColumn("_t_long", F.col(t_col).cast("long"))
        .withColumn("_bkt", F.expr(f"_t_long div {int(bucket_width)}"))
        .drop("_t_long")
    )
    totals = with_b.groupBy("_bkt").agg(
        F.sum(delta_col).cast("long").alias("_tot")
    )
    offsets = totals.select(
        "_bkt",
        (F.sum("_tot").over(Window.orderBy("_bkt")) - F.col("_tot")).alias(
            "_off"
        ),
    )
    order = [F.col(t_col), *(extra_order or [])]
    w_in = (
        Window.partitionBy("_bkt")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        with_b.join(F.broadcast(offsets), "_bkt")
        .withColumn(
            "running",
            (F.col("_off") + F.sum(delta_col).over(w_in)).cast("long"),
        )
        .drop("_bkt", "_off")
    )


def max_concurrency(
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    bucket_width: int = 86_400,
) -> DataFrame:
    """Peak concurrency over half-open [start, end) integer intervals:
    one row (n_intervals, peak, peak_at) — ``peak_at`` the EARLIEST
    instant the peak is reached (deterministic). Ends sort before
    starts at equal t (delta ascending), the half-open convention."""
    starts = intervals.select(
        F.col(start_col).cast("long").alias("t"), F.lit(1).alias("delta")
    )
    ends = intervals.select(
        F.col(end_col).cast("long").alias("t"), F.lit(-1).alias("delta")
    )
    deltas = starts.unionByName(ends)
    run = running_prefix_sum(
        deltas, "t", "delta", bucket_width, extra_order=[F.col("delta")]
    )
    n_row = intervals.agg(F.count("*").cast("long").alias("n_intervals"))
    peak = run.agg(
        F.max(F.struct(F.col("running"), (-F.col("t")).alias("neg_t"))).alias(
            "m"
        )
    ).select(
        # Empty input: the max-struct aggregate yields one all-NULL row;
        # the legitimate "no intervals" answer is peak 0 (peak_at stays
        # NULL — there is no instant to name).
        F.coalesce(F.col("m.running"), F.lit(0)).cast("long").alias("peak"),
        (-F.col("m.neg_t")).cast("long").alias("peak_at"),
    )
    return F.broadcast(n_row).crossJoin(peak).select(
        "n_intervals", "peak", "peak_at"
    )
