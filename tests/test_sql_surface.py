"""The spark.sql surface: registered views + SQL equivalence with the
DataFrame plans (SURVEY §2.D — the engine exposes SQL-on-DataFrames even
though the reference delegates all querying to PostgreSQL)."""

from __future__ import annotations

from postgis_gtfs_importer_spark.sources.gtfs_feed import read_feed
from postgis_gtfs_importer_spark.sources.tables import (
    register_gtfs_views,
    register_views,
)

from .gtfs_fixtures import write_feed_dir

SF_DIR = "/root/testdata/sf0.001"


def test_sql_over_testdata_views(spark):
    register_views(spark, SF_DIR)
    df = spark.sql(
        """
        SELECT n.n_name, count(*) AS n_orders
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """
    )
    rows = df.collect()
    assert len(rows) > 0 and all(r.n_orders > 0 for r in rows)


def test_sql_over_gtfs_feed(spark, tmp_path):
    feed = read_feed(spark, write_feed_dir(str(tmp_path / "feed")))
    register_gtfs_views(feed)
    out = spark.sql(
        """
        SELECT t.route_id, count(*) AS n_stop_times
        FROM stop_times st JOIN trips t ON st.trip_id = t.trip_id
        GROUP BY t.route_id ORDER BY t.route_id
        """
    ).collect()
    assert {r.route_id for r in out} >= {"R1", "R3"}


def _plan(spark, name: str) -> str:
    from postgis_gtfs_importer_spark.plans import queries as Q

    df = Q.queries()[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q19_disjunction_keeps_hash_join(spark):
    """The TPC-H Q19 stress: the common equi-key (p_partkey=l_partkey)
    must be extracted from UNDER the OR-of-ANDs so the join stays
    hash-based — a nested-loop fallback here is the quadratic plan the
    query exists to catch."""
    plan = _plan(spark, "disjunctive_revenue")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan  # broadcast or shuffled — either is keyed


def test_q6_filters_reach_the_scan(spark):
    """The TPC-H Q6 stress: all three range predicates (shipdate,
    discount, quantity) must reach the parquet scan as pushed filters —
    a post-scan-only filter reads the whole fact at 100 TB."""
    plan = _plan(spark, "revenue_forecast")
    scan = next(
        block
        for block in plan.split("\n\n")
        if "PushedFilters" in block and "lineitem" in block
    )
    pushed = scan.split("PushedFilters:")[1].split("]")[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed to the lineitem scan"


def test_q11_total_subquery_not_recomputed_per_row(spark):
    """The TPC-H Q11 stress: the global-total scalar subquery must be
    planned ONCE (a Subquery/ReusedExchange over the same aggregate),
    never as a correlated per-row re-aggregation."""
    plan = _plan(spark, "important_parts")
    assert "Subquery" in plan or "ReusedExchange" in plan
    assert "CartesianProduct" not in plan


def test_q18_semi_join_against_grouped_fact(spark):
    """The TPC-H Q18 stress: the IN-subquery over the grouped fact must
    plan as a semi join (or an aggregated build side), not re-scan
    lineitem per outer row."""
    plan = _plan(spark, "bulk_customers")
    assert "LeftSemi" in plan or "SemiJoin" in plan
    assert "TakeOrderedAndProject" in plan  # top-100, no global sort
