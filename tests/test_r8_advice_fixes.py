"""Round-8 ADVICE regression pins (all four r7 ADVICE items).

1. winsorized_stats validates lo_pct/hi_pct up front: an out-of-range
   or inverted percentile used to make the rank never match, yield a
   NULL cut, and greatest/least's NULL-skipping then silently
   UNclamped that side.
2. asof_join_nearest reserves its scratch columns _b/_n: an input
   carrying either name used to die later with an ambiguous-reference
   AnalysisException instead of the documented loud ValueError.
3. skipgram_pairs no longer accepts the unused id_col parameter (doc
   identity is implicit — pairs never cross a row's token array).
4. cusum_changepoints docstring names the truncating (toward-zero)
   integer mean, matching what Spark div / DuckDB // actually compute.
"""

from __future__ import annotations

import inspect

import pytest

from postgis_gtfs_importer_spark.operators.indexing import skipgram_pairs
from postgis_gtfs_importer_spark.operators.profiling import cusum_changepoints
from postgis_gtfs_importer_spark.operators.scoring import winsorized_stats
from postgis_gtfs_importer_spark.operators.temporal import asof_join_nearest


@pytest.mark.parametrize(
    "lo,hi",
    [(-1, 95), (5, 101), (60, 40), (101, 102)],
)
def test_winsorized_stats_rejects_bad_percentiles(spark, lo, hi):
    df = spark.createDataFrame([(1, "g", 10)], "id long, g string, v long")
    with pytest.raises(ValueError, match="lo_pct <= hi_pct <= 100"):
        winsorized_stats(df, "v", "g", "id", lo_pct=lo, hi_pct=hi)


def test_winsorized_stats_accepts_boundary_percentiles(spark):
    """0/100 are legal (identity clamp) and must not raise."""
    df = spark.createDataFrame(
        [(1, "g", 10), (2, "g", 20)], "id long, g string, v long"
    )
    row = winsorized_stats(df, "v", "g", "id", lo_pct=0, hi_pct=100).collect()[0]
    assert row.sum_winsorized == 30 and row.n == 2


@pytest.mark.parametrize("bad", ["_b", "_n"])
def test_asof_nearest_rejects_scratch_column_names(spark, bad):
    left = spark.createDataFrame(
        [("k", 5, 1)], f"k string, ts long, {bad} long"
    )
    right = spark.createDataFrame([("k", 4, 7)], "k string, ts long, v long")
    with pytest.raises(ValueError, match="reserved internal column"):
        asof_join_nearest(left, right, ["k"], "ts", ["v"])
    right_bad = spark.createDataFrame(
        [("k", 4, 7)], f"k string, ts long, {bad} long"
    )
    with pytest.raises(ValueError, match="reserved internal column"):
        asof_join_nearest(right, right_bad, ["k"], "ts", [bad])


def test_asof_nearest_still_accepts_clean_inputs(spark):
    left = spark.createDataFrame([("k", 5)], "k string, ts long")
    right = spark.createDataFrame([("k", 4, 7)], "k string, ts long, v long")
    row = asof_join_nearest(left, right, ["k"], "ts", ["v"]).collect()[0]
    assert row.v == 7 and row.asof_ts == 4


def test_skipgram_pairs_has_no_id_col_param():
    assert "id_col" not in inspect.signature(skipgram_pairs).parameters


def test_cusum_docstring_names_truncating_mean():
    doc = cusum_changepoints.__doc__
    assert "truncat" in doc and "integer-floor" not in doc
