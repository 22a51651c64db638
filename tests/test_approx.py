"""Approximate aggregates — the sketch-based scale path next to the exact
operators. Sketches are not oracle-replayable (engine-specific state), so
they are verified against the exact answers with their documented error
bounds instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from postgis_gtfs_importer_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_approx_count_distinct_within_rsd(spark):
    e = load_table(spark, SF_DIR, "events")
    row = e.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.05).alias("approx"),
    ).first()
    assert abs(row.approx - row.exact) / row.exact <= 0.15  # 3x rsd guard


def test_percentile_approx_close_to_exact(spark):
    e = load_table(spark, SF_DIR, "events")
    row = e.agg(
        F.percentile("value", F.lit(0.5)).alias("exact"),
        F.percentile_approx("value", F.lit(0.5), F.lit(10000)).alias("approx"),
    ).first()
    spread = e.agg(
        (F.max("value") - F.min("value")).alias("range")
    ).first().range
    assert abs(row.approx - row.exact) <= 0.02 * spread
