"""The r2 root-cause class, pinned: every ts-sensitive registry query
must return oracle-identical results when the DRIVER'S session runs in a
non-UTC timezone. The external driver builds its own SparkSession and
owes us nothing about its zone; sources.tables.load_table pins
spark.sql.session.timeZone=UTC at load time, which is what these tests
prove — by running the same queries through a session whose default zone
is America/New_York (DST-shifting, half the year -4, half -5)."""

from __future__ import annotations

import pytest

from postgis_gtfs_importer_spark.plans import queries as Q

from .oracle_utils import compare, duckdb_conn

SF_DIR = "/root/testdata/sf0.01"

#: The ts-heavy batch queries (events table instants -> epochs) plus one
#: streaming drain; a regression in the UTC pin breaks these first.
TS_SENSITIVE = [
    "sessionize",
    "rolling_user_activity",
    "asof_join",
    "range_join",
    "streaming_windowed_stats",
    "hist_quantiles",
    # round-4 event-sequence family (unix_timestamp over the NTZ ts)
    "funnel_conversion",
    "retention_cohorts",
    "event_transitions",
    "hopping_window_stats",  # window() over the cast NTZ->timestamp
    "trend_by_type",         # epoch-anchored regression x axis
    # TPC-H-22 completions: TIMESTAMP literals against the parquet
    # instants, instant->DATE casts in output, EXTRACT(year) grouping —
    # every one shifts if the session zone leaks into literal parsing
    "shipping_priority",
    "revenue_forecast",
    "product_type_profit",
    "priority_shipment_buckets",
    "promo_revenue_share",
    "top_supplier",
    "bulk_customers",
    "dormant_customers",
    # watermark arithmetic under a non-UTC session
    "streaming_interval_join_outer",
]


@pytest.fixture(scope="module")
def ny_spark(spark):
    """A sibling session (shared JVM, separate conf) in a non-UTC zone —
    models the external driver's session, which we do not control."""
    s = spark.newSession()
    s.conf.set("spark.sql.session.timeZone", "America/New_York")
    yield s


@pytest.fixture(scope="module")
def duck():
    con = duckdb_conn(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", TS_SENSITIVE)
def test_query_is_timezone_robust(ny_spark, duck, name):
    spark_df = Q.queries()[name](ny_spark, SF_DIR)
    oracle_df = duck.execute(Q.oracle_sql()[name]).df()
    problems = compare(spark_df, oracle_df)
    assert not problems, f"{name} under America/New_York: " + "; ".join(
        problems
    )
