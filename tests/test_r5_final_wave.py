"""Round-5 final-wave operator units: weighted SSSP (vs exact Dijkstra),
positional phrase search (overlap + edge cases), greedy max-coverage
(vs a reference greedy trace), and the OLS-trend rational components."""

from __future__ import annotations

import heapq
import random

import pytest
from pyspark.sql import functions as F

from postgis_gtfs_importer_spark.operators.coverage import greedy_set_cover
from postgis_gtfs_importer_spark.operators.graph import sssp
from postgis_gtfs_importer_spark.operators.phrases import phrase_match


# ---------------------------------------------------------------------------
# sssp
# ---------------------------------------------------------------------------


def _dijkstra(edges, source):
    adj: dict[int, list[tuple[int, int]]] = {}
    nodes = set()
    for s, d, w in edges:
        adj.setdefault(s, []).append((d, w))
        nodes.add(s)
        nodes.add(d)
    dist = {source: 0}
    pq = [(0, source)]
    while pq:
        du, u = heapq.heappop(pq)
        if du > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, []):
            nd = du + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return {n: dist.get(n, -1) for n in nodes}


def test_sssp_known_graph(spark):
    # 0→1 (5), 0→2 (1), 2→1 (1), 1→3 (1): shortest 0→1 is 2 via 2,
    # node 4→0 only, so 4 is unreachable from 0
    edges = [(0, 1, 5), (0, 2, 1), (2, 1, 1), (1, 3, 1), (4, 0, 7)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    out = {r.node: (r.dist, r.reached) for r in sssp(df, source=0).collect()}
    assert out[0] == (0, True)
    assert out[1] == (2, True)
    assert out[2] == (1, True)
    assert out[3] == (3, True)
    assert out[4] == (-1, False)


def test_sssp_matches_dijkstra_random(spark):
    random.seed(41)
    nodes = list(range(35))
    edges = sorted(
        {
            (a, b)
            for a in nodes
            for b in nodes
            if a != b and random.random() < 0.08
        }
    )
    weighted = [(a, b, random.randint(1, 9)) for a, b in edges]
    want = _dijkstra(weighted, source=0)
    df = spark.createDataFrame(weighted, "src long, dst long, w long")
    got = {
        r.node: r.dist
        for r in sssp(df, source=0, max_rounds=len(nodes)).collect()
    }
    assert got == want


def test_sssp_default_source_is_min_node(spark):
    edges = [(7, 9, 2), (9, 11, 3)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    out = {r.node: r.dist for r in sssp(df).collect()}
    assert out[7] == 0 and out[9] == 2 and out[11] == 5


def test_sssp_registry_graph_converges_and_is_exact(spark):
    """The sssp_trade oracle unrolls 12 relaxation rounds; prove the
    sf0.01 graph's TRUE shortest paths (exact Dijkstra on the collected
    edge list — 19k edges, trivially driver-sized for a test) equal the
    engine's 12-round result, which simultaneously certifies
    convergence within the pinned bound and value correctness. The
    graph comes from the SAME builder the registry query uses
    (queries.sssp_trade_edges), so this certificate cannot drift from
    the shipped graph."""
    from postgis_gtfs_importer_spark.plans.queries import sssp_trade_edges

    both = sssp_trade_edges(spark, "/root/testdata/sf0.01")
    rows = [(r.src, r.dst, r.w) for r in both.collect()]
    source = min(min(s for s, _, _ in rows), min(d for _, d, _ in rows))
    want = _dijkstra(rows, source)
    got = {r.node: r.dist for r in sssp(both, max_rounds=12).collect()}
    assert got == want


# ---------------------------------------------------------------------------
# phrase_match
# ---------------------------------------------------------------------------


def test_phrase_match_counts_overlapping_occurrences(spark):
    # 'a b a b a' contains 'a b a' at token positions 1 and 3
    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "a b c"), (3, "")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in phrase_match(df, ["a", "b", "a"]).collect()
    }
    assert out == {1: (2, 1)}


def test_phrase_match_case_and_position(spark):
    df = spark.createDataFrame(
        [(1, "X fast JOIN y Fast join"), (2, "fast x join")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in phrase_match(df, ["fast", "join"]).collect()
    }
    # doc 1 matches at 1-based token positions 2 and 5; doc 2 never
    assert out == {1: (2, 2)}


def test_phrase_match_rejects_single_token(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        phrase_match(df, ["a"])


# ---------------------------------------------------------------------------
# greedy_set_cover
# ---------------------------------------------------------------------------


def _greedy_trace(items, k):
    byset: dict[int, set[str]] = {}
    for i, e in items:
        byset.setdefault(i, set()).add(e)
    covered: set[str] = set()
    trace = []
    for r in range(1, k + 1):
        best_id, best_gain = None, 0
        for i in sorted(byset):
            gain = len(byset[i] - covered)
            if gain > best_gain:
                best_id, best_gain = i, gain
        if best_id is None:
            break
        trace.append((r, best_id, best_gain))
        covered |= byset[best_id]
    return trace


def test_set_cover_known_instance(spark):
    items = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "b"), (2, "c"), (2, "d"), (2, "e"),
        (3, "a"), (3, "f"),
    ]
    df = spark.createDataFrame(items, "id long, elem string")
    got = [
        (r["round"], r.id, r.gain)
        for r in greedy_set_cover(df, k=3).orderBy("round").collect()
    ]
    # greedy: 2 covers 4, then 3 adds {a,f}=2, then 1 adds nothing -> stop
    assert got == [(1, 2, 4), (2, 3, 2)]


def test_set_cover_matches_reference_greedy_random(spark):
    random.seed(23)
    elems = [f"e{i}" for i in range(60)]
    items = sorted(
        {
            (i, random.choice(elems))
            for i in range(25)
            for _ in range(random.randint(3, 15))
        }
    )
    df = spark.createDataFrame(items, "id long, elem string")
    got = [
        (r["round"], r.id, r.gain)
        for r in greedy_set_cover(df, k=6).orderBy("round").collect()
    ]
    assert got == _greedy_trace(items, 6)


def test_set_cover_dedups_input_pairs(spark):
    items = [(1, "a"), (1, "a"), (2, "a"), (2, "b")]
    df = spark.createDataFrame(items, "id long, elem string")
    got = [
        (r["round"], r.id, r.gain)
        for r in greedy_set_cover(df, k=2).orderBy("round").collect()
    ]
    assert got == [(1, 2, 2)]


# ---------------------------------------------------------------------------
# ols_trend components
# ---------------------------------------------------------------------------


def test_ols_components_exact_fraction(spark):
    from fractions import Fraction

    from postgis_gtfs_importer_spark.plans.queries import ols_trend_query

    out = {
        r.event_type: r
        for r in ols_trend_query(spark, "/root/testdata/sf0.001").collect()
    }
    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    rows = e.select("event_type", "ts", "value").collect()
    groups: dict[str, list[tuple[int, int]]] = {}
    import calendar
    import math

    for r in rows:
        ts = r.ts
        # session pins UTC, so naive timestamps are UTC wall-clock
        us = calendar.timegm(ts.timetuple()) * 1_000_000 + ts.microsecond
        x = us // 86_400_000_000 - 19723
        y = math.floor(r.value * 100 + 0.5)
        groups.setdefault(r.event_type, []).append((x, y))
    for et, pts in groups.items():
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        got = out[et]
        assert got.n == n
        assert got.slope_num == n * sxy - sx * sy
        assert got.slope_den == n * sxx - sx * sx
        assert got.intercept_num == sy * sxx - sx * sxy
        if got.slope_den == 0:
            # single-distinct-x group: num is 0 too -> declared flat
            assert got.slope_num == 0 and got.trend == "flat"
        else:
            slope = Fraction(got.slope_num, got.slope_den)
            assert (
                got.trend == "rising"
                if slope > 0
                else got.trend == ("flat" if slope == 0 else "falling")
            )
