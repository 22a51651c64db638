"""Unit tests for the continuation-block operator families: line-level
dedup (operators/lines.py), exact-integer PageRank (operators/graph.py),
2-D skyline (operators/skyline.py), quantile normalization
(operators/scoring.py). Value-level parity vs DuckDB is covered by the
registry entries in tests/test_oracle_parity.py; these pin the operator
semantics on hand-built frames where the expected answer is derivable
by eye or by brute force."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from postgis_gtfs_importer_spark.operators.graph import SCALE, pagerank
from postgis_gtfs_importer_spark.operators.lines import line_dedup, segment_lines
from postgis_gtfs_importer_spark.operators.scoring import quantile_normalize
from postgis_gtfs_importer_spark.operators.skyline import skyline_2d

# ---------------------------------------------------------------------------
# line_dedup
# ---------------------------------------------------------------------------


def test_segment_lines_widths(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x")], ["doc_id", "text"]
    )
    rows = {
        (r["doc_id"], r["line_no"]): r["line"]
        for r in segment_lines(df, tokens_per_line=2).collect()
    }
    assert rows == {
        (1, 0): "a b",
        (1, 1): "c d",
        (1, 2): "e",  # short tail line is kept, not padded/dropped
        (2, 0): "x",
    }


def test_line_dedup_first_occurrence_wins(spark):
    # line "a b" occurs in docs 1 and 3; doc 1 line 0 is the first
    # occurrence (min (doc_id, line_no)), every other copy drops.
    df = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "c d a b"),  # both its lines are dups of doc 1's
            (3, "a b x y"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in line_dedup(df, tokens_per_line=2).collect()
    }
    assert out[1]["kept_lines"] == 2 and out[1]["dropped_lines"] == 0
    assert out[1]["kept_text"] == "a b\nc d"
    assert out[2]["kept_lines"] == 0 and out[2]["dropped_lines"] == 2
    assert out[2]["kept_text"] == ""
    assert out[3]["kept_lines"] == 1 and out[3]["dropped_lines"] == 1
    assert out[3]["kept_text"] == "x y"


def test_line_dedup_intra_document_duplicates_drop_too(spark):
    df = spark.createDataFrame([(7, "p q p q p q")], ["doc_id", "text"])
    row = line_dedup(df, tokens_per_line=2).collect()[0]
    assert row["n_lines"] == 3
    assert row["kept_lines"] == 1
    assert row["kept_text"] == "p q"


# ---------------------------------------------------------------------------
# pagerank
# ---------------------------------------------------------------------------


def test_pagerank_symmetric_two_cycle(spark):
    # A <-> B: perfectly symmetric, every iteration keeps both ranks at
    # the closed-form fixed point base + 17/20 * (SCALE/2) exactly.
    e = spark.createDataFrame([(0, 1), (1, 0)], ["src", "dst"])
    ranks = {r["node"]: r["rank_s"] for r in pagerank(e, iterations=3).collect()}
    base = (3 * SCALE) // (20 * 2)
    expected = base + (17 * (SCALE // 2)) // 20
    assert ranks == {0: expected, 1: expected}


def test_pagerank_star_center_dominates(spark):
    # 4 leaves all pointing at the hub (and back): hub must outrank
    # every leaf, leaves are symmetric so identical.
    edges = [(i, 0) for i in range(1, 5)] + [(0, i) for i in range(1, 5)]
    e = spark.createDataFrame(edges, ["src", "dst"])
    ranks = {r["node"]: r["rank_s"] for r in pagerank(e, iterations=4).collect()}
    hub, leaves = ranks[0], [ranks[i] for i in range(1, 5)]
    assert len(set(leaves)) == 1
    assert hub > leaves[0]
    # mass conservation up to integer-division loss: each of the
    # |E| contributions and |V| updates floors away < 1 unit of SCALE
    total = hub + sum(leaves)
    assert abs(total - SCALE) < 100 * len(edges)


def test_pagerank_deterministic_across_partitionings(spark):
    random.seed(11)
    edges = list({(random.randrange(20), random.randrange(20)) for _ in range(80)})
    # ensure no dangling nodes: every node that appears gets a self-loop
    nodes = {n for e in edges for n in e}
    edges += [(n, n) for n in nodes]
    a = spark.createDataFrame(edges, ["src", "dst"]).repartition(1)
    b = spark.createDataFrame(edges, ["src", "dst"]).repartition(13)
    ra = sorted((r["node"], r["rank_s"]) for r in pagerank(a, iterations=4).collect())
    rb = sorted((r["node"], r["rank_s"]) for r in pagerank(b, iterations=4).collect())
    assert ra == rb  # exact integer arithmetic: partitioning-independent


# ---------------------------------------------------------------------------
# skyline_2d
# ---------------------------------------------------------------------------


def _brute_skyline(points):
    out = []
    for p in points:
        dominated = any(
            q[0] >= p[0] and q[1] >= p[1] and (q[0] > p[0] or q[1] > p[1])
            for q in points
        )
        if not dominated:
            out.append(p)
    return sorted(out)


def test_skyline_matches_bruteforce_with_ties(spark):
    random.seed(7)
    pts = [(random.randrange(10), random.randrange(10)) for _ in range(200)]
    df = spark.createDataFrame(pts, ["x", "y"])
    got = sorted((r["x"], r["y"]) for r in skyline_2d(df, "x", "y").collect())
    assert got == _brute_skyline(pts)


def test_skyline_keeps_duplicate_frontier_points(spark):
    df = spark.createDataFrame(
        [(5, 5), (5, 5), (1, 9), (9, 1), (4, 4)], ["x", "y"]
    )
    got = sorted((r["x"], r["y"]) for r in skyline_2d(df, "x", "y").collect())
    # (4,4) dominated by (5,5); both (5,5) copies survive (no strict
    # improvement between identical points)
    assert got == [(1, 9), (5, 5), (5, 5), (9, 1)]


# ---------------------------------------------------------------------------
# quantile_normalize
# ---------------------------------------------------------------------------


def test_quantile_normalize_ties_and_bounds(spark):
    df = spark.createDataFrame(
        [("en", 10), ("en", 10), ("en", 20), ("en", 30), ("de", 99)],
        ["lang", "score"],
    )
    out = {
        (r["lang"], r["score"], r["pr_e6"])
        for r in quantile_normalize(df, "score", "lang").collect()
    }
    # n=4 in 'en': ranks 1,1,3,4 -> ppm 0, 0, 666666, 1000000
    assert ("en", 10, 0) in out
    assert ("en", 20, 666666) in out
    assert ("en", 30, 1_000_000) in out
    # singleton stratum normalizes to 0, not NULL/divide-by-zero
    assert ("de", 99, 0) in out


# ---------------------------------------------------------------------------
# eigenvector_centrality
# ---------------------------------------------------------------------------


def test_eigcen_symmetric_pair_and_star(spark):
    from postgis_gtfs_importer_spark.operators.graph import (
        eigenvector_centrality,
    )

    # two symmetric nodes: both stay at the L-inf ceiling 1e6
    e = spark.createDataFrame([(0, 1, 3), (1, 0, 3)], ["src", "dst", "w"])
    v = {r["node"]: r["v"] for r in eigenvector_centrality(e, 4).collect()}
    assert v == {0: 1_000_000, 1: 1_000_000}

    # star: hub has max centrality (1e6), leaves are equal and strictly
    # smaller (leaf gets w*hub, hub gets 4*w*leaf -> hub is the max)
    edges = [(0, i, 1) for i in range(1, 5)] + [(i, 0, 1) for i in range(1, 5)]
    e2 = spark.createDataFrame(edges, ["src", "dst", "w"])
    v2 = {r["node"]: r["v"] for r in eigenvector_centrality(e2, 5).collect()}
    assert v2[0] == 1_000_000
    leaves = [v2[i] for i in range(1, 5)]
    assert len(set(leaves)) == 1 and leaves[0] < 1_000_000


def test_eigcen_partitioning_invariance(spark):
    from postgis_gtfs_importer_spark.operators.graph import (
        eigenvector_centrality,
    )

    random.seed(23)
    base = list({(random.randrange(12), random.randrange(12)) for _ in range(40)})
    sym = list({*base, *[(b, a) for a, b in base]})
    rows = [(a, b, (a + b) % 5 + 1) for a, b in sym]
    a = spark.createDataFrame(rows, ["src", "dst", "w"]).repartition(1)
    b = spark.createDataFrame(rows, ["src", "dst", "w"]).repartition(11)
    ra = sorted((r["node"], r["v"]) for r in eigenvector_centrality(a, 5).collect())
    rb = sorted((r["node"], r["v"]) for r in eigenvector_centrality(b, 5).collect())
    assert ra == rb
