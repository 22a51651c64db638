"""Physical-layout invariance: every registry entry must produce
IDENTICAL values whether a table is a single parquet FILE (the driver's
testdata fixture shape) or a DIRECTORY of part files (the shape every
Spark/Hive/Iceberg writer produces — the only shape that exists at
100 TB).

The class this guards: the streaming testdata loaders selected their
table with ``pathGlobFilter='<table>.parquet'``, which matches leaf file
names only — on a directory-shaped table nothing matched and the source
returned a SILENTLY EMPTY stream, so all seven streaming entries
"succeeded" with zero rows (round-5 directory-shape differential
sweep). Batch reads go through ``spark.read.parquet`` which handles
both shapes, but nothing enforced that for future sources; this sweep
does, value-level, for all 169 entries.

Multi-part directories (``repartition(3)``) also randomize scan/task
order, so this doubles as a partition-order-invariance check on the
fixture data itself.
"""

from __future__ import annotations

import duckdb
import pytest

pytestmark = pytest.mark.sweep

from postgis_gtfs_importer_spark.plans import queries as Q

from .oracle_utils import compare

SRC = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

ORACLES = Q.oracle_sql()
NAMES = sorted(ORACLES)


@pytest.fixture(scope="module")
def dir_sf(spark, tmp_path_factory):
    """sf0.001 rewritten with every table as a 3-part directory."""
    d = tmp_path_factory.mktemp("dir-shape-sf")
    for t in TABLES:
        spark.read.parquet(f"{SRC}/{t}.parquet").repartition(3).write.parquet(
            str(d / f"{t}.parquet")
        )
    return str(d)


@pytest.fixture(scope="module")
def duck(dir_sf):
    """DuckDB views over the SAME directory-shaped tables, so the oracle
    half of the comparison reads the identical physical layout."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{dir_sf}/{t}.parquet/*.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", NAMES)
def test_query_invariant_under_directory_shape(spark, dir_sf, duck, name):
    spark_df = Q.queries()[name](spark, dir_sf)
    oracle_df = duck.execute(ORACLES[name]).df()
    problems = compare(spark_df, oracle_df)
    assert not problems, f"{name}: " + "; ".join(problems)


#: Hive partition column per table (string-typed so DuckDB's
#: hive_partitioning=1 re-derives the identical values Spark does).
_HIVE_PART = {
    "events": "event_type",
    "documents": "lang",
    "orders": "o_orderpriority",
}


@pytest.fixture(scope="module")
def hive_sf(spark, tmp_path_factory):
    """sf0.001 with three tables rewritten hive-partitioned
    (``partitionBy``) — the layout production writers actually produce:
    the partition column lives in DIRECTORY NAMES, not in the files, so
    this exercises partition discovery/reconstruction on the Spark side
    and ``hive_partitioning=1`` on the oracle side. This sweep caught
    the double-sum summation-order flip in revenue_by_nation (a
    different scan order moved the rounded cent) that motivated the
    per-row integer-quantization hardening of the money sums."""
    d = tmp_path_factory.mktemp("hive-shape-sf")
    for t in TABLES:
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        w = df.write
        if t in _HIVE_PART:
            w = w.partitionBy(_HIVE_PART[t])
        w.parquet(str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def hive_duck(hive_sf):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{hive_sf}/{t}.parquet/**/*.parquet', "
            f"hive_partitioning=1)"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", NAMES)
def test_query_invariant_under_hive_partitioning(spark, hive_sf, hive_duck, name):
    spark_df = Q.queries()[name](spark, hive_sf)
    oracle_df = hive_duck.execute(ORACLES[name]).df()
    problems = compare(spark_df, oracle_df)
    assert not problems, f"{name}: " + "; ".join(problems)
