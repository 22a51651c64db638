"""Unit tests for operators/temporal.py::asof_join."""

from __future__ import annotations

from postgis_gtfs_importer_spark.operators.temporal import asof_join


def _run(spark, left_rows, right_rows):
    left = spark.createDataFrame(left_rows, "k string, ts long, ev string")
    right = spark.createDataFrame(right_rows, "k string, ts long, v double")
    return {
        (r.k, r.ts): (r.v, r.asof_ts)
        for r in asof_join(
            left, right, on=["k"], ts_col="ts", value_cols=["v"]
        ).collect()
    }


def test_asof_backward_match_ties_and_misses(spark):
    out = _run(
        spark,
        left_rows=[
            ("a", 5, "x"),   # after r@3 -> 30.0
            ("a", 3, "y"),   # tie with r@3 -> matches (>=)
            ("a", 1, "z"),   # before any right -> NULL
            ("b", 9, "w"),   # key with no right rows at all -> NULL
        ],
        right_rows=[("a", 3, 30.0), ("a", 6, 60.0), ("c", 1, 10.0)],
    )
    assert out[("a", 5)] == (30.0, 3)
    assert out[("a", 3)] == (30.0, 3)
    assert out[("a", 1)] == (None, None)
    assert out[("b", 9)] == (None, None)


def test_asof_latest_wins_not_first(spark):
    out = _run(
        spark,
        left_rows=[("a", 100, "x")],
        right_rows=[("a", 1, 1.0), ("a", 50, 2.0), ("a", 99, 3.0)],
    )
    assert out[("a", 100)] == (3.0, 99)


def test_asof_join_is_single_shuffle(spark):
    left = spark.createDataFrame([("a", 5, "x")], "k string, ts long, ev string")
    right = spark.createDataFrame([("a", 3, 1.0)], "k string, ts long, v double")
    plan = (
        asof_join(left, right, on=["k"], ts_col="ts", value_cols=["v"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    n_exchanges = sum(
        1 for line in plan.splitlines()
        if "Exchange" in line and "ReusedExchange" not in line
    )
    assert n_exchanges == 1, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
