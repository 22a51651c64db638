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
