"""Hypothesis property suites for the round-5 primitives.

Deterministic pure-Python references face the Spark operators on
randomized inputs — the same strategy the BPE / minimization / media
round-trip suites use. One shared SparkSession (conftest), small
max_examples: each example costs Spark jobs.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def _deltas(draw):
    n = draw(st.integers(min_value=1, max_value=120))
    return [
        (
            draw(st.integers(min_value=0, max_value=300)),
            draw(st.sampled_from([-3, -1, 1, 2])),
        )
        for _ in range(n)
    ]


@given(rows=_deltas(), width=st.sampled_from([7, 32, 1000]))
@settings(**_SETTINGS)
def test_prefix_sum_property(spark, rows, width):
    """Two-phase distributed prefix sum == sequential scan, for any
    delta sequence and any bucket width (including width > span: one
    bucket, and tiny widths: one row per bucket)."""
    from postgis_gtfs_importer_spark.operators.sweep import running_prefix_sum

    df = spark.createDataFrame(rows, "t long, delta long")
    got = sorted(
        (r.t, r.delta, r.running)
        for r in running_prefix_sum(
            df, "t", "delta", width, extra_order=[F.col("delta")]
        ).collect()
    )
    acc, want = 0, []
    for t, d in sorted(rows):
        acc += d
        want.append((t, d, acc))
    assert got == sorted(want)


@st.composite
def _graph(draw):
    n = draw(st.integers(min_value=2, max_value=25))
    density = draw(st.floats(min_value=0.05, max_value=0.5))
    edges = set()
    for a in range(n):
        for b in range(a + 1, n):
            if draw(st.floats(min_value=0, max_value=1)) < density:
                edges.add((a, b))
    return sorted(edges)


@given(edges=_graph(), k=st.integers(min_value=1, max_value=4))
@settings(**_SETTINGS)
def test_kcore_property(spark, edges, k):
    from postgis_gtfs_importer_spark.operators.graph import kcore

    if not edges:
        return
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    live = set(adj)
    while True:
        drop = {x for x in live if len(adj[x] & live) < k}
        if not drop:
            break
        live -= drop
    df = spark.createDataFrame(edges, "a long, b long")
    out = {r.node: (r.in_core, r.core_deg) for r in kcore(df, k=k, max_rounds=30).collect()}
    assert {x for x, (f, _) in out.items() if f} == live
    for x in live:
        assert out[x][1] == len(adj[x] & live)


@given(edges=_graph())
@settings(**_SETTINGS)
def test_triangle_property(spark, edges):
    from postgis_gtfs_importer_spark.operators.graph import triangle_count

    if not edges:
        return
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    brute = sum(
        1
        for a in adj
        for b in adj[a]
        for c in adj[b]
        if a < b < c and c in adj[a]
    )
    df = spark.createDataFrame(edges, "a long, b long")
    r = triangle_count(df).collect()[0]
    assert (r.n_edges, r.n_triangles) == (len(edges), brute)


@given(
    vals=st.lists(
        st.integers(min_value=-50, max_value=50), min_size=1, max_size=200
    ),
    parts=st.sampled_from([2, 5, 16]),
)
@settings(**_SETTINGS)
def test_global_rank_property(spark, vals, parts):
    """Two-phase distributed rank == sequential rank definition (ties
    share, gaps after) for any value multiset and partition count."""
    from postgis_gtfs_importer_spark.operators.ranking import global_rank

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = {
        r.id: r.rnk
        for r in global_rank(
            df, [F.asc("v")], num_partitions=parts
        ).collect()
    }
    svals = sorted(vals)
    want = {i: 1 + svals.index(v) for i, v in rows}  # rank = 1 + #strictly-less
    # index() finds the FIRST occurrence in the sorted list == count of
    # strictly smaller values
    assert got == want


@st.composite
def _weighted_digraph(draw):
    n = draw(st.integers(min_value=2, max_value=20))
    density = draw(st.floats(min_value=0.05, max_value=0.5))
    edges = []
    for a in range(n):
        for b in range(n):
            if a != b and draw(st.floats(min_value=0, max_value=1)) < density:
                edges.append((a, b, draw(st.integers(min_value=1, max_value=9))))
    return edges or [(0, 1, 1)]


@given(edges=_weighted_digraph())
@settings(**_SETTINGS)
def test_sssp_property(spark, edges):
    """Bellman-Ford DataFrame loop == exact Dijkstra for any weighted
    digraph (including unreachable nodes -> dist=-1), with max_rounds
    at the |V| worst case so convergence is structural, not assumed."""
    from tests.test_r5_final_wave import _dijkstra

    from postgis_gtfs_importer_spark.operators.graph import sssp

    nodes = {x for e in edges for x in e[:2]}
    source = min(nodes)
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {
        r.node: r.dist
        for r in sssp(df, source=source, max_rounds=len(nodes)).collect()
    }
    assert got == _dijkstra(edges, source)


@st.composite
def _setcover_items(draw):
    n_sets = draw(st.integers(min_value=1, max_value=12))
    n_elems = draw(st.integers(min_value=1, max_value=20))
    items = set()
    for i in range(n_sets):
        size = draw(st.integers(min_value=0, max_value=6))
        for _ in range(size):
            items.add((i, f"e{draw(st.integers(min_value=0, max_value=n_elems))}"))
    return sorted(items) or [(0, "e0")]


@given(items=_setcover_items(), k=st.integers(min_value=1, max_value=5))
@settings(**_SETTINGS)
def test_set_cover_property(spark, items, k):
    """Distributed greedy max-coverage trace == the sequential reference
    greedy (same gain-then-id tie-break), for any set system and any k,
    including early exhaustion."""
    from tests.test_r5_final_wave import _greedy_trace

    from postgis_gtfs_importer_spark.operators.coverage import greedy_set_cover

    df = spark.createDataFrame(items, "id long, elem string")
    got = [
        (r["round"], r.id, r.gain)
        for r in greedy_set_cover(df, k=k).orderBy("round").collect()
    ]
    assert got == _greedy_trace(items, k)


@st.composite
def _phrase_corpus(draw):
    vocab = ["a", "b", "c"]
    n_docs = draw(st.integers(min_value=1, max_value=8))
    docs = []
    for i in range(n_docs):
        n_toks = draw(st.integers(min_value=0, max_value=25))
        docs.append(
            (i, " ".join(draw(st.sampled_from(vocab)) for _ in range(n_toks)))
        )
    phrase_len = draw(st.integers(min_value=2, max_value=3))
    phrase = [draw(st.sampled_from(vocab)) for _ in range(phrase_len)]
    return docs, phrase


@given(cp=_phrase_corpus())
@settings(**_SETTINGS)
def test_phrase_match_property(spark, cp):
    """Positional-index phrase join == naive sliding-window scan for any
    corpus over a tiny alphabet (maximal overlap pressure: phrases like
    'a a' self-overlap, which the join must count at every position)."""
    from postgis_gtfs_importer_spark.operators.phrases import phrase_match

    docs, phrase = cp
    want = {}
    for i, text in docs:
        toks = text.split()
        hits = [
            p
            for p in range(len(toks) - len(phrase) + 1)
            if toks[p : p + len(phrase)] == phrase
        ]
        if hits:
            want[i] = (len(hits), hits[0] + 1)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in phrase_match(df, phrase).collect()
    }
    assert got == want
