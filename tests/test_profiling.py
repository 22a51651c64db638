"""profile_columns: single-scan ANALYZE-style stats (nulls, exact
distincts, min/max canonicalization)."""

from __future__ import annotations

from postgis_gtfs_importer_spark.operators.profiling import profile_columns


def test_profile_columns_nulls_distincts_minmax(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (2, "y"), (None, "y")],
        "a int, b string",
    )
    prof = {r["col_name"]: r for r in profile_columns(df, ["a", "b"]).collect()}
    a, b = prof["a"], prof["b"]
    assert a["n_rows"] == 4 and a["n_nulls"] == 1 and a["n_distinct"] == 2
    assert (a["min_str"], a["max_str"]) == ("1", "2")
    assert b["n_nulls"] == 1 and b["n_distinct"] == 2
    assert (b["min_str"], b["max_str"]) == ("x", "y")


def test_profile_is_single_scan(spark):
    """The plan must contain exactly one scan of the input — the whole
    point of the Expand-based multi-distinct aggregate."""
    df = spark.range(100).selectExpr("id AS a", "id % 7 AS b", "id % 3 AS c")
    plan = profile_columns(df, ["a", "b", "c"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range (0, 100") == 1
