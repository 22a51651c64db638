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


def test_vocab_coverage_contract(spark):
    from postgis_gtfs_importer_spark.operators.indexing import vocab_coverage

    # 10 'a', 5 'b', 3 'c', 1 'd', 1 'e' -> total 20.
    #   50% (10): vocab 1 (cum 10); 75% (15): vocab 2 (cum 15);
    #   90% (18): vocab 3 (cum 18); 99% (19.8 -> cum*100 >= 1980):
    #   cum 19 at rank 4 is 1900 < 1980 -> rank 5 (cum 20).
    text = " ".join(["a"] * 10 + ["b"] * 5 + ["c"] * 3 + ["d", "e"])
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {
        r["coverage_pct"]: (r["vocab_size"], r["covered_tokens"])
        for r in vocab_coverage(df).collect()
    }
    assert got == {50: (1, 10), 75: (2, 15), 90: (3, 18), 99: (5, 20)}


def test_vocab_coverage_two_phase_matches_native_window(spark):
    # the two-phase prefix must equal the single-window definition on
    # a many-bucket vocabulary (ties across bucket boundaries included)
    import random

    rng = random.Random(7)
    words = []
    for i in range(300):
        words += [f"w{i}"] * rng.randint(1, 40)
    rng.shuffle(words)
    docs = [
        (i, " ".join(words[i * 100:(i + 1) * 100]))
        for i in range(len(words) // 100 + 1)
    ]
    from postgis_gtfs_importer_spark.operators.indexing import vocab_coverage

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["coverage_pct"]: (r["vocab_size"], r["covered_tokens"])
        for r in vocab_coverage(df, bucket_width=3).collect()
    }
    # native single-window replay on the driver
    from collections import Counter

    cnt = Counter(w for _, t in docs for w in t.split() if w)
    total = sum(cnt.values())
    items = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    for p in (50, 75, 90, 99):
        cum = 0
        for r, (tok, f) in enumerate(items, start=1):
            cum += f
            if cum * 100 >= p * total:
                assert got[p] == (r, cum), (p, got[p], (r, cum))
                break


def test_reserved_name_guards_round8(spark):
    """The r7 ADVICE reserved-name discipline, applied to the round-8
    continuation operators: internal scratch names on INPUTS fail
    loudly up front, not with a late AnalysisException or silent
    duplicate columns."""
    import datetime as dt

    import pytest as _pytest

    from postgis_gtfs_importer_spark.operators.scoring import (
        poisson_bootstrap_ci,
    )
    from postgis_gtfs_importer_spark.operators.temporal import (
        half_life_decay,
    )

    ev = spark.createDataFrame(
        [(1, "e", dt.datetime(2024, 1, 1), 1.0, 5)],
        "user_id long, event_type string, ts timestamp, value double,"
        " _anchor long",
    )
    with _pytest.raises(ValueError, match="_anchor"):
        half_life_decay(ev, key_cols=["user_id"])
    ev2 = spark.createDataFrame(
        [(1, "e", 1.0)], "n_rows long, event_type string, value double"
    )
    with _pytest.raises(ValueError, match="n_rows"):
        poisson_bootstrap_ci(
            ev2, group_cols=["n_rows"], value_col="value",
            id_col="event_type",
        )


def test_local_clustering_ignores_extra_input_columns(spark):
    from postgis_gtfs_importer_spark.operators.graph import local_clustering

    edges = spark.createDataFrame(
        [(1, 2, 99), (1, 3, 99), (2, 3, 99)], "a long, b long, deg long"
    )
    rows = local_clustering(edges, k=10).collect()
    assert {(r["node"], r["lcc_e6"]) for r in rows} == {
        (1, 1_000_000), (2, 1_000_000), (3, 1_000_000)
    }


def test_knn_graph_contract_and_recall(spark):
    """knn_graph: (a) within a planted cluster the neighbors are the
    cluster mates (exact per-cell top-k), (b) recall vs the unblocked
    brute-force graph is measured and high on cluster-structured data
    (the SemDeDup premise: near-duplicates share a cell)."""
    import math

    from postgis_gtfs_importer_spark.operators.similarity import (
        brute_force_topk,
        knn_graph,
    )

    # 4 tight clusters of 10 vectors around orthogonal-ish anchors.
    # Ids INTERLEAVE clusters (id % 4 == cluster) so the sampled
    # quantizer (the n_centroids smallest ids) picks one centroid per
    # cluster — the seeding contract _centroid_table documents.
    rows = []
    for j in range(10):
        for c in range(4):
            base = [0.0] * 8
            base[c * 2] = 1.0
            base[c * 2 + 1] = 0.01 * j  # tiny within-cluster spread
            rows.append((j * 4 + c, base))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    g = knn_graph(emb, k=3, n_centroids=4).collect()
    by_vec = {}
    for r in g:
        by_vec.setdefault(r["vec_id"], []).append(r["nbr_id"])
    assert len(by_vec) == 40
    for v, nbrs in by_vec.items():
        assert len(nbrs) == 3
        # neighbors come from the same planted cluster
        assert all(n % 4 == v % 4 for n in nbrs), (v, nbrs)
    # recall vs unblocked brute force over the same corpus
    bf = brute_force_topk(emb, emb, k=3).collect()
    truth = {}
    for r in bf:
        truth.setdefault(r["q_id"], set()).add(r["vec_id"])
    hits = sum(
        len(set(by_vec[v]) & truth[v]) for v in truth
    )
    total = sum(len(s) for s in truth.values())
    assert hits / total >= 0.95, (hits, total)


def test_path_mining_contract(spark):
    import datetime as dt

    from postgis_gtfs_importer_spark.operators.sessions import path_mining

    t0 = dt.datetime(2024, 1, 1, 12, 0)
    m = lambda i: t0 + dt.timedelta(minutes=i)
    rows = [
        # user 1 session A: a -> b -> c -> b  (paths: a>b>c, b>c>b)
        (1, m(0), "a", 1), (1, m(1), "b", 2), (1, m(2), "c", 3),
        (1, m(3), "b", 4),
        # gap > 30 min: session B: a -> b -> c again (a>b>c counted 2x)
        (1, m(60), "a", 5), (1, m(61), "b", 6), (1, m(62), "c", 7),
        # user 2: two events only -> no 3-gram
        (2, m(0), "x", 8), (2, m(1), "y", 9),
        # NULLs excluded
        (None, m(0), "a", 10), (1, None, "a", 11), (1, m(5), None, 12),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )
    got = {r["path"]: r["n"] for r in path_mining(ev, n=3, k=10).collect()}
    assert got == {"a > b > c": 2, "b > c > b": 1}
    # the session boundary is load-bearing: without it the cross-gap
    # 3-grams (c>b>a, b>a>b) would appear
    assert "b > a > b" not in got and "c > b > a" not in got
    import pytest as _pytest

    with _pytest.raises(ValueError, match="n >= 2"):
        path_mining(ev, n=1)


def test_path_mining_tie_and_ordering_determinism(spark):
    import datetime as dt

    from postgis_gtfs_importer_spark.operators.sessions import path_mining

    t0 = dt.datetime(2024, 1, 1)
    # same-timestamp events: event_id breaks the order deterministically
    rows = [
        (1, t0, "b", 2), (1, t0, "a", 1), (1, t0, "c", 3),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )
    a = path_mining(ev, n=3, k=5).collect()
    b = path_mining(ev, n=3, k=5).collect()
    assert a == b
    assert [r["path"] for r in a] == ["a > b > c"]
