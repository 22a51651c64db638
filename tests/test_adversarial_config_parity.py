"""Oracle parity under an ADVERSARIAL engine config — 5 shuffle
partitions (different reduce-side accumulation order and scan split)
and AQE off (different physical plans than every other run). The
exact-integer / partition-invariance discipline every entry claims
means results must be config-invariant; this is the permanent guard
for the sweep class that validated it (the cross-SF variant of the
same sweep caught the session_window oracle boundary bug at sf0.1 —
see tests/test_review_fixes.py; run it per round via the recipe in
.claude/skills/verify/SKILL.md)."""

from __future__ import annotations

import pytest

from postgis_gtfs_importer_spark.plans import queries as Q

from .oracle_utils import compare, duckdb_conn

SF_DIR = "/root/testdata/sf0.001"

ORACLES = Q.oracle_sql()
NAMES = sorted(ORACLES)

_ADVERSARIAL = {
    "spark.sql.shuffle.partitions": "5",
    "spark.sql.adaptive.enabled": "false",
}


@pytest.fixture(scope="module")
def duck():
    con = duckdb_conn(SF_DIR)
    yield con
    con.close()


@pytest.fixture(scope="module")
def adversarial_spark(spark):
    saved = {k: spark.conf.get(k, None) for k in _ADVERSARIAL}
    for k, v in _ADVERSARIAL.items():
        spark.conf.set(k, v)
    try:
        yield spark
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@pytest.mark.parametrize("name", NAMES)
def test_query_invariant_under_adversarial_config(
    adversarial_spark, duck, name
):
    spark_df = Q.queries()[name](adversarial_spark, SF_DIR)
    oracle_df = duck.execute(ORACLES[name]).df()
    problems = compare(spark_df, oracle_df)
    assert not problems, f"{name}: " + "; ".join(problems)
