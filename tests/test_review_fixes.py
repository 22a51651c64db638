"""Regression pins for the round-5 adversarial-review findings: each
test reproduces the input class that broke (or silently degraded) the
operator before the fix."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_tvd_drift_zero_half_group_is_null_not_crash(spark):
    """A group living entirely in one half of the span has nothing to
    compare against: tvd_ppm must be NULL — the unguarded integer div
    raised DIVIDE_BY_ZERO under Spark 4's default ANSI mode and aborted
    the whole query."""
    from postgis_gtfs_importer_spark.operators.profiling import tvd_drift

    rows = [
        ("steady", 1.0, "2024-01-01 00:00:00"),
        ("steady", 2.0, "2024-01-10 00:00:00"),
        ("steady", 3.0, "2024-01-20 00:00:00"),
        ("steady", 4.0, "2024-01-30 00:00:00"),
        # introduced late: every event at/after the global midpoint
        ("late", 5.0, "2024-01-25 00:00:00"),
        ("late", 6.0, "2024-01-29 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "event_type string, value double, ts string")
    out = {r.event_type: r for r in tvd_drift(df, "event_type", "value", "ts").collect()}
    assert out["late"].n_ref == 0 and out["late"].tvd_ppm is None
    assert out["steady"].tvd_ppm is not None


def test_tvd_drift_null_values_excluded_not_top_bucketed(spark):
    """NULL values used to ride floor(NULL)=NULL through F.least into
    the TOP bucket (least skips NULLs) — counted as maximal
    observations. They must be excluded."""
    from postgis_gtfs_importer_spark.operators.profiling import tvd_drift

    base = [
        ("a", 1.0, "2024-01-01 00:00:00"),
        ("a", 10.0, "2024-01-02 00:00:00"),
        ("a", 1.0, "2024-01-20 00:00:00"),
        ("a", 10.0, "2024-01-21 00:00:00"),
    ]
    nulls = [("a", None, "2024-01-20 12:00:00")] * 5
    d0 = spark.createDataFrame(base, "event_type string, value double, ts string")
    d1 = spark.createDataFrame(
        base + nulls, "event_type string, value double, ts string"
    )
    r0 = tvd_drift(d0, "event_type", "value", "ts").collect()[0]
    r1 = tvd_drift(d1, "event_type", "value", "ts").collect()[0]
    # NULL rows change neither the counts nor the distance
    assert (r0.n_ref, r0.n_cur, r0.tvd_ppm) == (r1.n_ref, r1.n_cur, r1.tvd_ppm)


def test_max_concurrency_empty_input_peak_zero(spark):
    from postgis_gtfs_importer_spark.operators.sweep import max_concurrency

    df = spark.createDataFrame([], "s long, e long")
    r = max_concurrency(df, "s", "e").collect()[0]
    assert (r.n_intervals, r.peak, r.peak_at) == (0, 0, None)


def test_asof_join_forward_rejects_value_col_collision(spark):
    from postgis_gtfs_importer_spark.operators.temporal import (
        asof_join,
        asof_join_forward,
    )

    left = spark.createDataFrame([(1, 10, 99)], "k long, ts long, v long")
    right = spark.createDataFrame([(1, 12, 7)], "k long, ts long, v long")
    with pytest.raises(ValueError, match="collide"):
        asof_join_forward(left, right, ["k"], "ts", ["v"])
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, ["k"], "ts", ["v"])


def test_skyline_constant_y_prefilter_bounded(spark):
    """Constant y defeated the old `y >= cummax` keep-rule (100% kept ->
    single-task funnel re-opened). The exact staircase keeps one row
    per partition here, and the global front is the max-x row only."""
    from postgis_gtfs_importer_spark.operators.skyline import (
        _local_front,
        skyline_2d,
    )

    df = spark.createDataFrame(
        [(i, 5) for i in range(2000)], "x long, y long"
    ).repartition(8)
    assert _local_front(df, "x", "y").count() <= 8
    assert [(r.x, r.y) for r in skyline_2d(df, "x", "y").collect()] == [(1999, 5)]


def test_skyline_keeps_duplicate_front_points(spark):
    from postgis_gtfs_importer_spark.operators.skyline import skyline_2d

    df = spark.createDataFrame(
        [(9, 5), (9, 5), (3, 5), (9, 4), (2, 7)], "x long, y long"
    )
    got = sorted((r.x, r.y) for r in skyline_2d(df, "x", "y").collect())
    assert got == [(2, 7), (9, 5), (9, 5)]


def test_kcore_raises_on_insufficient_bound(spark):
    """A 13-node path with k=2 peels one node per round from each end;
    max_rounds=2 cannot reach the (empty) fixpoint and must raise
    instead of returning a partially-peeled core."""
    from postgis_gtfs_importer_spark.operators.graph import kcore

    edges = [(i, i + 1) for i in range(12)]
    df = spark.createDataFrame(edges, "a long, b long")
    with pytest.raises(RuntimeError, match="fixpoint"):
        kcore(df, k=2, max_rounds=2)
    # ...and the same input converges fine with an adequate bound
    out = kcore(df, k=2, max_rounds=10)
    assert out.filter(F.col("in_core")).count() == 0


def test_segment_lines_hostile_column_name(spark):
    """Column names are no longer interpolated into expr strings."""
    from postgis_gtfs_importer_spark.operators.lines import segment_lines

    df = spark.createDataFrame(
        [(1, "a b c d e")], "id long, `weird col` string"
    ).withColumnRenamed("weird col", "weird-col")
    out = segment_lines(df, id_col="id", text_col="weird-col", tokens_per_line=2)
    assert [(r.line_no, r.line) for r in out.orderBy("line_no").collect()] == [
        (0, "a b"),
        (1, "c d"),
        (2, "e"),
    ]


def test_running_prefix_sum_hostile_column_name(spark):
    from postgis_gtfs_importer_spark.operators.sweep import running_prefix_sum

    df = spark.createDataFrame([(1, 1), (2, 1), (3, -1)], "id long, d long")
    df = df.withColumnRenamed("id", "t col")
    out = running_prefix_sum(df, "t col", "d", bucket_width=2)
    assert [r.running for r in out.orderBy("t col").collect()] == [1, 2, 1]


def test_session_window_oracle_boundary_is_microsecond_precise(spark):
    """sf0.1 sweep finding: the session_window_native oracle compared
    SECOND-floored epochs while Spark's native session_window merges on
    full-precision timestamps — a pair with true diff 1799.34s but
    floored diff exactly 1800 split in the oracle, merged in the
    engine. Pin the class on a crafted fixture: floored diff == 1800
    with true diff just under the gap must be ONE session; true diff
    exactly at the gap must be TWO ([start, end) end-exclusive)."""
    import duckdb
    import pandas as pd

    rows = [
        # user 1: 10.9 -> 1810.1: true diff 1799.2s (< 1800, merge);
        # floor diff 1810 - 10 = 1800 (the buggy oracle split here)
        (1, 1, pd.Timestamp("2024-01-01 00:00:10.900000")),
        (2, 1, pd.Timestamp("2024-01-01 00:30:10.100000")),
        # user 2: exactly 1800.0s apart: still merges (end-INCLUSIVE)
        (3, 2, pd.Timestamp("2024-01-01 00:00:10.500000")),
        (4, 2, pd.Timestamp("2024-01-01 00:30:10.500000")),
        # user 3: 1 microsecond past the gap: splits
        (5, 3, pd.Timestamp("2024-01-01 00:00:10.500000")),
        (6, 3, pd.Timestamp("2024-01-01 00:30:10.500001")),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts"])
    df = spark.createDataFrame(pdf)
    got = {
        (r.user_id, r.n): r["cnt"]
        for r in df.groupBy(
            F.session_window(F.col("ts"), "30 minutes"), "user_id"
        )
        .agg(F.count("*").alias("cnt"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("cnt").alias("cnt"))
        .collect()
    }
    assert got == {(1, 1): 2, (2, 1): 2, (3, 2): 2}, got

    # the FIXED oracle arithmetic agrees on both users
    con = duckdb.connect()
    con.register("events", pdf)
    sessions = con.execute(
        """
        WITH flagged AS (
          SELECT user_id, ts,
                 CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                           - epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP))
                           > 1800000000
                      THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id
                       ORDER BY CAST(ts AS TIMESTAMP), event_id)
        )
        SELECT user_id, 1 + sum(is_new) AS n_sessions
        FROM flagged GROUP BY user_id
        """
    ).df()
    oracle = {int(r.user_id): int(r.n_sessions) for _, r in sessions.iterrows()}
    assert oracle == {1: 1, 2: 1, 3: 2}, oracle
