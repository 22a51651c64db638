"""Degenerate-input tripwire: EVERY registry entry must execute against
fully EMPTY tables without raising.

The class this guards: tvd_drift shipped with an unguarded integer
division that raised DIVIDE_BY_ZERO under Spark 4's default ANSI mode
the moment a group had no rows in one half of the span, and pagerank
divided by a zero node count driver-side. Aggregates over nothing,
divisions by zero-counts, max-of-empty structs, and min-of-no-nodes all
concentrate on the empty relation, so one sweep covers the family. An
entry may legitimately return zero rows here; it may not crash."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.sweep

from postgis_gtfs_importer_spark.plans import queries as Q

SRC = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

REGISTRY = Q.queries()


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    """The full testdata schema with ZERO rows in every table."""
    d = tmp_path_factory.mktemp("empty-sf")
    for t in TABLES:
        spark.read.parquet(f"{SRC}/{t}.parquet").limit(0).write.mode(
            "overwrite"
        ).parquet(str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_registry_entry_survives_empty_tables(spark, empty_sf_dir, name):
    df = REGISTRY[name](spark, empty_sf_dir)
    assert df.count() >= 0


@pytest.fixture(scope="module")
def one_row_sf_dir(spark, tmp_path_factory):
    """The full testdata schema with exactly ONE row per table — the
    other degenerate concentration point: single-element percentiles
    and medians, lag()/lead() windows with no second row, stddev/
    variance of one observation, self-joins with no partner, rank
    denominators of (n-1) = 0."""
    d = tmp_path_factory.mktemp("one-row-sf")
    for t in TABLES:
        spark.read.parquet(f"{SRC}/{t}.parquet").limit(1).write.mode(
            "overwrite"
        ).parquet(str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_registry_entry_survives_one_row_tables(spark, one_row_sf_dir, name):
    df = REGISTRY[name](spark, one_row_sf_dir)
    assert df.count() >= 0


@pytest.fixture(scope="module")
def nulled_sf_dir(spark, tmp_path_factory):
    """The full testdata schema with every OPTIONAL payload column
    nulled — the realistic failed-upstream shape (extraction produced
    no text, the encoder returned no embedding, an event carried no
    value/props). Keys, timestamps, and the relational TPC-H columns
    (NOT NULL by spec) stay. Entries may return empty; they may not
    crash — the class this catches is bytes(None)/len(None) kernels
    and NULL-group aggregations, previously found one family at a
    time."""
    from pyspark.sql import functions as F

    null_cols = {
        "documents": ["text", "lang", "source"],
        "embeddings": ["embedding"],
        "events": ["value", "props"],
    }
    d = tmp_path_factory.mktemp("nulled-sf")
    for t in TABLES:
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        for c in null_cols.get(t, []):
            df = df.withColumn(
                c, F.lit(None).cast(dict(df.dtypes)[c])
            )
        df.write.mode("overwrite").parquet(str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_registry_entry_survives_nulled_payloads(spark, nulled_sf_dir, name):
    df = REGISTRY[name](spark, nulled_sf_dir)
    assert df.count() >= 0
