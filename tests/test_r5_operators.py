"""Round-5 operator units: prefix-filtered set-similarity join,
degree-oriented triangle counting, TVD drift, skyline local-front
prefilter invariance, BPE pinned-merge consistency."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from postgis_gtfs_importer_spark.operators.graph import (
    part_cooccurrence_edges,
    triangle_count,
)
from postgis_gtfs_importer_spark.operators.profiling import tvd_drift
from postgis_gtfs_importer_spark.operators.setjoin import prefix_filter_jaccard
from postgis_gtfs_importer_spark.operators.skyline import skyline_2d


# ---------------------------------------------------------------------------
# prefix_filter_jaccard
# ---------------------------------------------------------------------------


def _shingles(text: str, n: int = 3) -> set[str]:
    t = text.lower().split()
    return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}


def _brute_pairs(rows, tau_num, tau_den, n=3):
    sets = {i: _shingles(t, n) for i, t in rows}
    out = {}
    for a in sorted(sets):
        for b in sorted(sets):
            if a >= b:
                continue
            inter = len(sets[a] & sets[b])
            uni = len(sets[a] | sets[b])
            if uni and inter * tau_den >= uni * tau_num:
                out[(a, b)] = (inter, uni)
    return out


@pytest.fixture(scope="module")
def phrase_corpus(spark):
    random.seed(13)
    rows = []
    vocab = [f"w{i}" for i in range(40)]
    for i in range(60):
        base = " ".join(random.choices(vocab, k=12))
        rows.append((2 * i, base + f" uniq{i}a uniq{i}b"))
        # twin shares the 12-token base -> high shingle overlap
        rows.append((2 * i + 1, base + f" uniq{i}c uniq{i}d"))
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


def test_prefix_filter_matches_bruteforce(spark, phrase_corpus):
    """Lossless-filter property on a corpus with real twins AND shared
    vocabulary noise: output == definitional quadratic join."""
    rows, df = phrase_corpus
    got = {
        (r.id_a, r.id_b): (r.inter, r.union_sz)
        for r in prefix_filter_jaccard(df, tau_num=1, tau_den=2).collect()
    }
    assert got == _brute_pairs(rows, 1, 2)
    assert got, "fixture must produce matching pairs"


def test_prefix_filter_partitioning_invariant(spark, phrase_corpus):
    rows, df = phrase_corpus
    a = prefix_filter_jaccard(df.repartition(1), tau_num=2, tau_den=3)
    b = prefix_filter_jaccard(df.repartition(17, "doc_id"), tau_num=2, tau_den=3)
    ka = sorted((r.id_a, r.id_b, r.jaccard_e6) for r in a.collect())
    kb = sorted((r.id_a, r.id_b, r.jaccard_e6) for r in b.collect())
    assert ka == kb


def test_prefix_filter_tau_one_means_identical_sets(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "a b c d e"),          # identical shingle set as 1
            (3, "a b c d e f"),        # superset -> jaccard < 1
        ],
        "doc_id long, text string",
    )
    got = {(r.id_a, r.id_b) for r in
           prefix_filter_jaccard(df, tau_num=1, tau_den=1).collect()}
    assert got == {(1, 2)}


def test_prefix_filter_rejects_bad_tau(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        prefix_filter_jaccard(df, tau_num=0, tau_den=2)
    with pytest.raises(ValueError):
        prefix_filter_jaccard(df, tau_num=3, tau_den=2)


# ---------------------------------------------------------------------------
# triangle_count
# ---------------------------------------------------------------------------


def _edges_df(spark, edges):
    return spark.createDataFrame(sorted(set(edges)), "a long, b long")


def test_triangle_count_known_graphs(spark):
    # K4: C(4,3) = 4 triangles
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    r = triangle_count(_edges_df(spark, k4)).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (4, 6, 4)
    # star: no triangles
    star = [(0, i) for i in range(1, 6)]
    r = triangle_count(_edges_df(spark, star)).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (6, 5, 0)
    # two triangles sharing an edge: (0,1,2) and (0,1,3)
    bowtie = [(0, 1), (0, 2), (1, 2), (0, 3), (1, 3)]
    r = triangle_count(_edges_df(spark, bowtie)).collect()[0]
    assert r.n_triangles == 2


def test_triangle_count_matches_bruteforce_random(spark):
    random.seed(5)
    nodes = list(range(30))
    edges = {
        (a, b)
        for a in nodes
        for b in nodes
        if a < b and random.random() < 0.2
    }
    adj = {n: set() for n in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    brute = sum(
        1
        for a in nodes
        for b in adj[a]
        for c in adj[b]
        if a < b < c and c in adj[a]
    )
    r = triangle_count(_edges_df(spark, edges)).collect()[0]
    assert r.n_triangles == brute


def test_part_cooccurrence_edges_bounded_and_symmetric_free(spark):
    li = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 10), (2, 11), (2, 12), (3, 13)],
        "l_orderkey long, l_partkey long",
    )
    got = sorted((r.a, r.b) for r in part_cooccurrence_edges(li).collect())
    # order 1: {10,11} -> (10,11); order 2: {11,12} -> (11,12); order 3:
    # single part, no edge; duplicates collapsed, a < b always
    assert got == [(10, 11), (11, 12)]


# ---------------------------------------------------------------------------
# tvd_drift
# ---------------------------------------------------------------------------


def _drift_df(spark, rows):
    return spark.createDataFrame(
        [(g, float(v), t) for g, v, t in rows],
        "grp string, value double, ts timestamp",
    )


def test_tvd_drift_identical_halves_zero(spark):
    import datetime as dt

    rows = []
    for half in (0, 12):
        for i in range(50):
            rows.append(("a", i % 10, dt.datetime(2024, 1, 1, half, i % 60)))
    out = tvd_drift(_drift_df(spark, rows), "grp", "value", "ts").collect()
    assert len(out) == 1 and out[0].tvd_ppm == 0
    assert out[0].n_ref == 50 and out[0].n_cur == 50


def test_tvd_drift_disjoint_supports_full(spark):
    import datetime as dt

    rows = []
    for i in range(40):  # ref: all values low
        rows.append(("a", 0.0, dt.datetime(2024, 1, 1, 0, i % 60)))
    for i in range(40):  # cur: all values high
        rows.append(("a", 100.0, dt.datetime(2024, 1, 1, 23, i % 60)))
    out = tvd_drift(_drift_df(spark, rows), "grp", "value", "ts").collect()
    assert out[0].tvd_ppm == 1_000_000  # total separation


def test_tvd_drift_partitioning_invariant(spark):
    import datetime as dt

    random.seed(3)
    rows = [
        (random.choice("ab"), random.random() * 50,
         dt.datetime(2024, 1, 1) + dt.timedelta(minutes=random.randrange(2000)))
        for _ in range(500)
    ]
    df = _drift_df(spark, rows)
    a = sorted(map(tuple, tvd_drift(df.coalesce(1), "grp", "value", "ts").collect()))
    b = sorted(map(tuple, tvd_drift(df.repartition(13), "grp", "value", "ts").collect()))
    assert a == b


# ---------------------------------------------------------------------------
# skyline local-front prefilter
# ---------------------------------------------------------------------------


def test_skyline_partitioning_invariant_through_prefilter(spark):
    """The per-partition local-front prefilter must be lossless under
    ANY partition layout (a global-front point is on every subset's
    front)."""
    random.seed(11)
    pts = [(random.randrange(50), random.randrange(50)) for _ in range(500)]
    df = spark.createDataFrame(pts, ["x", "y"])
    expected = sorted(
        (r.x, r.y) for r in skyline_2d(df.coalesce(1), "x", "y").collect()
    )
    for parts in (3, 17):
        got = sorted(
            (r.x, r.y)
            for r in skyline_2d(df.repartition(parts), "x", "y").collect()
        )
        assert got == expected


def test_skyline_plan_has_local_front_before_global_window(spark):
    df = spark.range(1000).selectExpr("id % 37 AS x", "id % 53 AS y")
    out = skyline_2d(df, "x", "y")
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the Arrow-batched local pass must sit below the single-task window
    assert "MapInPandas" in plan
    assert "Window" in plan


# ---------------------------------------------------------------------------
# BPE pinned merges (testdata-drift canary)
# ---------------------------------------------------------------------------


def test_pinned_merges_match_reference_trainer_on_sf001():
    """PINNED_MERGES_12 (the bpe_encode registry input) must equal what
    the pure-Python reference trainer learns on the sf0.01 corpus — so
    a regenerated/drifted testdata set fails HERE, loudly, instead of
    silently shipping a stale pin. (Encode correctness itself does not
    depend on which corpus trained the list: the oracle replays the
    same pin.)"""
    import duckdb

    from postgis_gtfs_importer_spark.operators.bpe import (
        PINNED_MERGES_12,
        bpe_reference,
    )

    con = duckdb.connect()
    texts = [
        r[0]
        for r in con.execute(
            "SELECT text FROM read_parquet("
            "'/root/testdata/sf0.01/documents.parquet')"
        ).fetchall()
    ]
    learned = [(lhs, rhs) for lhs, rhs, _ in bpe_reference(texts, 12)]
    assert learned == PINNED_MERGES_12


# ---------------------------------------------------------------------------
# sweep-line distributed prefix sum
# ---------------------------------------------------------------------------


def test_running_prefix_sum_equals_global_scan(spark):
    from pyspark.sql import Window

    from postgis_gtfs_importer_spark.operators.sweep import running_prefix_sum

    random.seed(17)
    rows = [(random.randrange(10_000), random.choice([-2, -1, 1, 3]))
            for _ in range(5_000)]
    df = spark.createDataFrame(rows, "t long, delta long")
    got = running_prefix_sum(
        df, "t", "delta", bucket_width=500, extra_order=[F.col("delta")]
    )
    naive = df.withColumn(
        "running",
        F.sum("delta").over(
            Window.orderBy("t", "delta").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    # compare as multisets of (t, delta, running): equal-key ties make
    # row identity ambiguous, but the VALUE multiset must match
    a = sorted((r.t, r.delta, r.running) for r in got.collect())
    b = sorted((r.t, r.delta, r.running) for r in naive.collect())
    assert a == b


def test_running_prefix_sum_no_global_single_task_window(spark):
    from postgis_gtfs_importer_spark.operators.sweep import running_prefix_sum

    df = spark.range(1000).selectExpr("id AS t", "1 AS delta")
    out = running_prefix_sum(df, "t", "delta", bucket_width=100)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the data-sized window must be partitioned by bucket; the only
    # unpartitioned window runs over the bucket TOTALS (tiny)
    import re

    windows = [l for l in plan.splitlines() if "Window" in l and "windowspecdefinition" in l]
    assert any("_bkt" in w for w in windows), plan[:2000]


def test_max_concurrency_known_intervals(spark):
    from postgis_gtfs_importer_spark.operators.sweep import max_concurrency

    iv = spark.createDataFrame(
        [(0, 10), (5, 15), (9, 12), (20, 25), (24, 30), (10, 11)],
        "s long, e long",
    )
    r = max_concurrency(iv, "s", "e", bucket_width=7).collect()[0]
    # overlap sweep: [9,10) has {0-10, 5-15, 9-12} = 3; at 10 the first
    # ends (half-open) as 10-11 starts -> still 3; earliest peak at 9
    assert (r.n_intervals, r.peak, r.peak_at) == (6, 3, 9)


def test_max_concurrency_half_open_no_touch_overlap(spark):
    from postgis_gtfs_importer_spark.operators.sweep import max_concurrency

    iv = spark.createDataFrame([(0, 5), (5, 10)], "s long, e long")
    r = max_concurrency(iv, "s", "e", bucket_width=3).collect()[0]
    assert r.peak == 1  # [0,5) and [5,10) never overlap


# ---------------------------------------------------------------------------
# k-core
# ---------------------------------------------------------------------------


def test_kcore_known_graph(spark):
    from postgis_gtfs_importer_spark.operators.graph import kcore

    # path 0-1-2-3 hanging off a K4 {3,4,5,6}: 2-core peels the path
    # in a 3-round cascade (0, then 1, then 2), keeps the K4
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (3, 5), (3, 6),
             (4, 5), (4, 6), (5, 6)]
    df = spark.createDataFrame(edges, "a long, b long")
    out = {r.node: (r.in_core, r.core_deg) for r in kcore(df, k=2).collect()}
    assert {n for n, (f, _) in out.items() if f} == {3, 4, 5, 6}
    assert out[3] == (True, 3) and out[0] == (False, 0)


def test_kcore_matches_bruteforce_random(spark):
    from postgis_gtfs_importer_spark.operators.graph import kcore

    random.seed(9)
    nodes = list(range(40))
    edges = sorted({(a, b) for a in nodes for b in nodes
                    if a < b and random.random() < 0.08})
    adj = {n: set() for n in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    k = 2
    live = {n for n in nodes if adj[n]}
    while True:
        drop = {n for n in live if len(adj[n] & live) < k}
        if not drop:
            break
        live -= drop
    df = spark.createDataFrame(edges, "a long, b long")
    out = {r.node: r.in_core for r in kcore(df, k=k).collect()}
    got_core = {n for n, f in out.items() if f}
    assert got_core == live
    # every node that ever had an edge is reported
    assert set(out) == {n for n in nodes if adj[n]}


def test_kcore_registry_fixpoint_within_bound(spark):
    """The oracle unrolls 10 peel rounds; assert the sf0.01 data
    actually converges within that bound (an 11th peel would remove
    nothing) so the pinned round count is evidence, not hope."""
    from pyspark.sql import functions as F

    from postgis_gtfs_importer_spark.operators.graph import kcore

    o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    lo = F.least(F.col("o_custkey") * 2, F.col("l_suppkey") * 2 + 1)
    hi = F.greatest(F.col("o_custkey") * 2, F.col("l_suppkey") * 2 + 1)
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(lo.alias("a"), hi.alias("b"))
        .filter((F.col("a") * 7919 + F.col("b") * 104729) % 15 == 0)
        .dropDuplicates(["a", "b"])
    )
    r10 = kcore(edges, k=4, max_rounds=10)
    r11 = kcore(edges, k=4, max_rounds=11)
    a = sorted(map(tuple, r10.collect()))
    b = sorted(map(tuple, r11.collect()))
    assert a == b, "peel did NOT converge within the oracle's 10 rounds"
