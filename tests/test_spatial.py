"""Unit tests for the spatial operator family (grid-cell-blocked
proximity) on crafted inputs; oracle-parity tests cover the fixture
path. The brute-force comparisons here check the BLOCKING's exactness
(every qualifying pair found, none duplicated), not just the distance
math."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from postgis_gtfs_importer_spark.operators.spatial import (
    EARTH_RADIUS_M,
    haversine_meters,
    knn_join,
    radius_pairs,
    shape_length,
)


def _hav(lat1, lon1, lat2, lon2):
    dlat = math.radians(lat2 - lat1) / 2
    dlon = math.radians(lon2 - lon1) / 2
    a = (
        math.sin(dlat) ** 2
        + math.cos(math.radians(lat1))
        * math.cos(math.radians(lat2))
        * math.sin(dlon) ** 2
    )
    return 2 * EARTH_RADIUS_M * math.asin(math.sqrt(a))


def _pts(spark, rows):
    return spark.createDataFrame(rows, "stop_id long, lat double, lon double")


def test_haversine_known_values(spark):
    df = spark.range(1).select(
        haversine_meters(F.lit(0.0), F.lit(0.0), F.lit(1.0), F.lit(0.0)).alias("m"),
        haversine_meters(F.lit(52.52), F.lit(13.405), F.lit(52.52), F.lit(13.405)).alias("z"),
    )
    row = df.collect()[0]
    # one degree of latitude on the mean-radius sphere
    assert row.m == pytest.approx(math.pi * EARTH_RADIUS_M / 180, rel=1e-12)
    assert row.z == 0.0


# a layout that straddles cell boundaries on purpose: clusters at the
# corner of four cells, isolated points, and an exact-boundary pair
_LAYOUT = [
    (1, 0.01, 0.01),
    (2, -0.01, 0.01),   # ~2.2 km from 1, different cell (cell_deg=1)
    (3, 0.01, -0.01),
    (4, -0.01, -0.01),
    (5, 10.0, 10.0),    # isolated
    (6, 10.0, 10.5),    # ~55 km from 5, same cell row
    (7, -45.0, 170.0),
    (8, 30.0, 0.95),    # near cell edge
    (9, 30.0, 1.05),    # across the edge from 8 (~9.6 km at lat 30)
]


def test_radius_pairs_matches_brute_force_across_cells(spark):
    radius = 60_000.0
    out = radius_pairs(
        _pts(spark, _LAYOUT), radius_m=radius, cell_deg=1.0, max_abs_lat=45.0
    ).collect()
    got = {(r.id_a, r.id_b): r.dist_m for r in out}
    expect = {}
    for i, (ia, lat_a, lon_a) in enumerate(_LAYOUT):
        for ib, lat_b, lon_b in _LAYOUT[i + 1 :]:
            d = math.floor(_hav(lat_a, lon_a, lat_b, lon_b) + 0.5)
            if d <= radius:
                expect[(min(ia, ib), max(ia, ib))] = d
    assert got == expect
    assert (8, 9) in got  # the cross-cell-edge pair was not missed
    assert len(out) == len(got)  # no duplicate emissions


def test_radius_pairs_rejects_contract_violation(spark):
    with pytest.raises(ValueError, match="exactness contract"):
        radius_pairs(
            _pts(spark, _LAYOUT), radius_m=500_000, cell_deg=1.0, max_abs_lat=60.0
        )


def test_knn_join_matches_brute_force_and_breaks_ties_by_id(spark):
    corpus = _pts(spark, _LAYOUT)
    queries = spark.createDataFrame(
        [(100, 0.0, 0.0), (200, 10.0, 10.2), (300, 80.0, 80.0)],
        "q_id long, lat double, lon double",
    )
    out = knn_join(
        queries, corpus, k=3, radius_m=100_000, cell_deg=2.0,
        q_id_col="q_id", max_abs_lat=45.0,
    ).collect()
    got = {(r.q_id, r.rn): (r.stop_id, r.dist_m) for r in out}
    # q=100 is equidistant from 1..4: ties resolved by ascending stop_id
    assert [got[(100, i)][0] for i in (1, 2, 3)] == [1, 2, 3]
    d = {r.stop_id: r.dist_m for r in out if r.q_id == 100}
    assert len(set(d.values())) == 1  # genuinely tied, meter-quantized
    # q=200 sees 5 and 6 only (7 is far); nearest first (0.2 deg < 0.3 deg)
    assert [got[(200, i)][0] for i in (1, 2)] == [5, 6]
    assert (200, 3) not in got
    # q=300 has no stop within the radius
    assert not [r for r in out if r.q_id == 300]


def test_knn_join_broadcasts_query_side(spark):
    corpus = _pts(spark, _LAYOUT)
    queries = spark.createDataFrame(
        [(1, 0.0, 0.0)], "q_id long, lat double, lon double"
    )
    df = knn_join(queries, corpus, k=2, radius_m=50_000, cell_deg=1.0)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_shape_length_sums_segments_in_order(spark):
    rows = [
        (1, 1, 0.0, 0.0), (1, 3, 0.0, 2.0), (1, 2, 0.0, 1.0),  # out of order
        (2, 1, 45.0, 45.0),                                     # single point
    ]
    df = spark.createDataFrame(rows, "shape_id long, seq int, lat double, lon double")
    out = {r.shape_id: r for r in shape_length(df).collect()}
    # ordered by seq: (0,0)->(0,1)->(0,2), two 1-degree equator segments
    seg = math.floor(_hav(0, 0, 0, 1) * 1000 + 0.5)
    assert out[1].n_points == 3
    assert out[1].length_mm == 2 * seg
    assert out[2].n_points == 1
    assert out[2].length_mm == 0
