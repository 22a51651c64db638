"""Round-8 wave-4 operators: local_clustering, calibration_bins —
contracts on hand-computed fixtures."""

from __future__ import annotations

import pytest

from postgis_gtfs_importer_spark.operators.graph import local_clustering
from postgis_gtfs_importer_spark.operators.scoring import calibration_bins


def test_lcc_triangle_with_pendant(spark):
    # triangle 1-2-3 plus pendant edge 3-4:
    #   nodes 1,2: deg 2, tri 1 -> lcc = 2*1/(2*1) = 1.0
    #   node 3:    deg 3, tri 1 -> lcc = 2*1/(3*2) = 1/3
    #   node 4:    deg 1 -> no wedge -> NULL
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "a long, b long"
    )
    rows = local_clustering(edges, k=10).collect()
    got = {r["node"]: (r["deg"], r["tri"], r["lcc_e6"]) for r in rows}
    assert got[1] == (2, 1, 1_000_000)
    assert got[2] == (2, 1, 1_000_000)
    assert got[3] == (3, 1, 333_333)
    assert got[4] == (1, 0, None)
    # ordering: lcc desc nulls last, tri desc, node asc
    assert [r["node"] for r in rows] == [1, 2, 3, 4]


def test_lcc_every_corner_credited_once(spark):
    # K4: every node deg 3, sits in 3 of the 4 triangles -> lcc = 1.0
    edges = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(a + 1, 4)],
        "a long, b long",
    )
    rows = local_clustering(edges, k=10).collect()
    assert len(rows) == 4
    for r in rows:
        assert (r["deg"], r["tri"], r["lcc_e6"]) == (3, 3, 1_000_000)


def test_lcc_top_k_bound(spark):
    edges = spark.createDataFrame(
        [(a, b) for a in range(6) for b in range(a + 1, 6)],
        "a long, b long",
    )
    assert local_clustering(edges, k=3).count() == 3


def _scored(spark, rows):
    return spark.createDataFrame(rows, "score_e3 long, pos long")


def test_calibration_perfectly_calibrated_fixture(spark):
    # scores 0..99, positive iff score >= 50: the top 5 bins are 100%
    # positive, the bottom 5 are 0% — bin width (99-0+1)*1/10 = 10.
    rows = [(s, 1 if s >= 50 else 0) for s in range(100)]
    got = {
        r["bin"]: (r["n_docs"], r["mean_score_e3"], r["pos_rate_e6"])
        for r in calibration_bins(
            _scored(spark, rows), "score_e3", "pos", bins=10
        ).collect()
    }
    assert len(got) == 10
    for b in range(10):
        n, mean, rate = got[b]
        assert n == 10
        assert mean == b * 10 + 4  # truncating mean of b*10 .. b*10+9
        assert rate == (1_000_000 if b >= 5 else 0)


def test_calibration_null_policy_and_validation(spark):
    rows = [(10, 1), (None, 1), (20, None)]
    got = calibration_bins(
        _scored(spark, rows), "score_e3", "pos", bins=2
    ).collect()
    assert len(got) == 1 and got[0]["n_docs"] == 1
    with pytest.raises(ValueError, match="bins"):
        calibration_bins(_scored(spark, rows), "score_e3", "pos", bins=0)


def test_calibration_negative_scores_and_single_bin(spark):
    # all-negative scores: binning uses the observed range, means
    # truncate toward zero identically to the oracle's // semantics
    rows = [(-10, 0), (-5, 1), (-1, 1)]
    got = calibration_bins(
        _scored(spark, rows), "score_e3", "pos", bins=1
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert r["bin"] == 0 and r["n_docs"] == 3
    assert r["mean_score_e3"] == -5  # (-16) div 3 truncates toward zero
    assert r["pos_rate_e6"] == 666_666


def test_headway_stats_contract(spark):
    import datetime as dt

    from postgis_gtfs_importer_spark.operators.derivations import (
        headway_stats,
    )

    d1, d2 = dt.date(2024, 3, 1), dt.date(2024, 3, 2)
    t = lambda day, h, m: dt.datetime(2024, 3, day, h, m)
    rows = [
        # route 1 stop 10 day 1: 10:00, 10:30, 10:45 -> gaps 1800, 900
        (1, 10, d1, t(1, 10, 0)),
        (1, 10, d1, t(1, 10, 30)),
        (1, 10, d1, t(1, 10, 45)),
        # same key day 2: single departure -> contributes NO gap, and
        # the overnight jump must NOT appear as a gap (dates partition)
        (1, 10, d2, t(2, 9, 0)),
        # route 2: single departure only -> NULL gap stats
        (2, 10, d1, t(1, 8, 0)),
        # NULL departure -> excluded entirely
        (1, 10, d1, None),
    ]
    ad = spark.createDataFrame(
        rows, "route_id long, stop_id long, date date, t_departure timestamp"
    )
    got = {
        (r["route_id"], r["stop_id"]): r
        for r in headway_stats(ad).collect()
    }
    r1 = got[(1, 10)]
    assert r1["n_departures"] == 4 and r1["n_gaps"] == 2
    assert (r1["min_gap_sec"], r1["max_gap_sec"]) == (900, 1800)
    assert r1["mean_gap_sec"] == 1350
    r2 = got[(2, 10)]
    assert r2["n_departures"] == 1 and r2["n_gaps"] == 0
    assert r2["min_gap_sec"] is None and r2["mean_gap_sec"] is None
