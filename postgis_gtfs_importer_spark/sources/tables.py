"""Parquet table catalog for the driver-generated testdata.

``load_tables`` is the single entry point the queries/bench harness uses:
one ``spark.read.parquet`` per table so Catalyst gets per-table pushdown and
column pruning (ReadSchema in .explain shows only referenced columns).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS), which Spark's reader
        # rejects unless this (runtime-settable) legacy conf is on. Set it
        # here, not only in our session factory: the external driver
        # builds its own SparkSession and would otherwise fail with
        # PARQUET_TYPE_ILLEGAL on every events-based query.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # events.ts is parquet TIMESTAMP(NANOS): read as long nanos
    # (spark.sql.legacy.parquet.nanosAsLong) and truncate to microseconds —
    # the same precision DuckDB's TIMESTAMP cast uses.
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose the testdata tables to ``spark.sql`` as temp views.

    The reference has no query API of its own — queries run against
    PostGIS, planned by PostgreSQL (SURVEY §2.D). Our engine exposes the
    same SQL-shaped surface natively: any oracle SQL in plans.queries is
    (modulo DuckDB/Spark dialect) runnable via ``spark.sql`` after this.
    """
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def register_gtfs_views(tables: dict[str, DataFrame]) -> None:
    """Expose a GTFS feed's tables (sources.gtfs_feed.read_feed output,
    or a published snapshot's tables) to ``spark.sql``."""
    for name, df in tables.items():
        df.createOrReplaceTempView(name)


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition when the input has too few partitions for
    the available cores.

    Expression-heavy per-row operators (shingling, hashing, regex
    analysis) on small compressed inputs otherwise run single-threaded:
    a 600KB parquet file is one scan partition but expands to seconds of
    CPU. The tiny shuffle is far cheaper than idling the cluster. No-op
    when the source is already well-partitioned (the 100 TB case).
    """
    from ..session import default_parallelism

    target = min_partitions or default_parallelism()
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
