"""Round-8 second-wave operators: label_propagation, rrf_fuse,
mmr_select, half_life_decay — semantics pinned on hand-computed
fixtures (the oracle-parity test covers real-data value equality; these
pin the CONTRACTS: tie-breaks, NULL policy, oscillation-freedom,
negative-similarity handling, saturation, validation)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgis_gtfs_importer_spark.operators.graph import label_propagation
from postgis_gtfs_importer_spark.operators.retrieval import (
    mmr_select,
    rank_topk_list,
    rrf_fuse,
)
from postgis_gtfs_importer_spark.operators.temporal import half_life_decay

RRF_SCALE = 1_000_000_000_000


def _mirror(pairs):
    out = []
    for a, b in pairs:
        out.append((a, b))
        out.append((b, a))
    return out


# ---------------------------------------------------------------- LPA


def test_lpa_two_components_get_two_communities(spark):
    # two disjoint bipartite cliques: evens {0,2} x odds {1,3} and
    # {10,12} x {11,13}. LPA must NOT merge across components.
    edges = spark.createDataFrame(
        _mirror([(0, 1), (0, 3), (2, 1), (2, 3),
                 (10, 11), (10, 13), (12, 11), (12, 13)]),
        "src long, dst long",
    )
    got = {
        r["node"]: r["community"]
        for r in label_propagation(edges, iterations=4).collect()
    }
    assert len(got) == 8
    comm_a = {got[n] for n in (0, 1, 2, 3)}
    comm_b = {got[n] for n in (10, 11, 12, 13)}
    assert len(comm_a) == 1 and len(comm_b) == 1, (comm_a, comm_b)
    assert comm_a != comm_b


def test_lpa_semi_synchronous_is_oscillation_free(spark):
    # K_{2,2}: fully synchronous LPA 2-cycles forever (both sides swap).
    # The semi-synchronous schedule must instead be STABLE: the labels
    # after 4 rounds equal the labels after 6 (a 2-cycle would differ).
    edges = spark.createDataFrame(
        _mirror([(0, 1), (0, 3), (2, 1), (2, 3)]), "src long, dst long"
    )
    l4 = {
        r["node"]: r["community"]
        for r in label_propagation(edges, iterations=4).collect()
    }
    l6 = {
        r["node"]: r["community"]
        for r in label_propagation(edges, iterations=6).collect()
    }
    assert l4 == l6
    assert len(set(l4.values())) == 1  # one clique -> one community


def test_lpa_tiebreak_is_smallest_label(spark):
    # node 1 sees labels {0, 2} once each -> tie -> smallest label (0)
    # wins (count DESC, label ASC). One round updates odds only.
    edges = spark.createDataFrame(
        _mirror([(0, 1), (2, 1)]), "src long, dst long"
    )
    got = {
        r["node"]: r["community"]
        for r in label_propagation(edges, iterations=1).collect()
    }
    assert got[1] == 0
    # evens were not active in round 1 -> keep their own labels
    assert got[0] == 0 and got[2] == 2


def test_lpa_sort_merge_fallback_bit_parity(spark):
    edges = spark.createDataFrame(
        _mirror([(0, 1), (0, 3), (2, 1), (4, 1), (4, 3), (10, 11)]),
        "src long, dst long",
    )
    a = {
        (r["node"], r["community"])
        for r in label_propagation(edges, iterations=4).collect()
    }
    b = {
        (r["node"], r["community"])
        for r in label_propagation(
            edges, iterations=4, broadcast_state=False
        ).collect()
    }
    assert a == b


def test_lpa_empty_graph(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    assert label_propagation(edges, iterations=2).count() == 0


# ---------------------------------------------------------------- RRF


def _ranked(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, rank long")


def test_rrf_exact_contributions_and_order(spark):
    a = _ranked(spark, [(1, 1), (2, 2), (3, 3)])
    b = _ranked(spark, [(2, 1), (3, 2), (4, 3)])
    got = {
        r["doc_id"]: (r["rank_a"], r["rank_b"], r["rrf_s"])
        for r in rrf_fuse(a, b, k=10).collect()
    }
    c = lambda r: RRF_SCALE // (60 + r)
    assert got[1] == (1, None, c(1))
    assert got[2] == (2, 1, c(2) + c(1))
    assert got[3] == (3, 2, c(3) + c(2))
    assert got[4] == (None, 3, c(3))
    # doc 2 fuses highest: rank 2 + rank 1 beats doc 1's single rank 1
    top = rrf_fuse(a, b, k=1).collect()[0]
    assert top["doc_id"] == 2


def test_rrf_tie_breaks_on_id(spark):
    # docs 7 and 8 get identical fused scores -> k=1 keeps the smaller id
    a = _ranked(spark, [(7, 1), (8, 2)])
    b = _ranked(spark, [(8, 1), (7, 2)])
    top = rrf_fuse(a, b, k=1).collect()
    assert [r["doc_id"] for r in top] == [7]


def test_rrf_null_ids_excluded(spark):
    a = _ranked(spark, [(None, 1), (5, 2)])
    b = _ranked(spark, [(5, 1)])
    rows = rrf_fuse(a, b, k=10).collect()
    assert [r["doc_id"] for r in rows] == [5]


def test_rank_topk_list_orders_and_is_long(spark):
    df = spark.createDataFrame(
        [(1, 50), (2, 70), (3, 70)], "doc_id long, score long"
    )
    got = {
        r["doc_id"]: r["rank"]
        for r in rank_topk_list(
            df, [F.desc("score"), F.asc("doc_id")]
        ).collect()
    }
    assert got == {2: 1, 3: 2, 1: 3}


# ---------------------------------------------------------------- MMR


def _pool(spark, rows):
    # rows: (id, vec, rel_e6)
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, rel_e6 long"
    )


def test_mmr_prefers_diverse_over_redundant(spark):
    # 3D so relevance (cos to the probe [1,0,0]) and redundancy (cos to
    # the picked set) can DIFFER: a wins round 1 (rel .95); b nearly
    # duplicates a (rel .947, sim(a,b) = cos(.01) ≈ .99995); c is less
    # relevant (rel .6) but diverse (sim(a,c) = .57). λ=0.5: round 2
    # must pick the diverse c although pure relevance would pick b.
    import math

    th = math.atan2(0.3122498999199199, 0.95)
    a = [0.95, 0.3122498999199199, 0.0]
    b = [math.cos(th + 0.01), math.sin(th + 0.01), 0.0]
    c = [0.6, 0.0, 0.8]
    rel = lambda v: int(round(v[0], 6) * 1e6)  # cos to probe [1,0,0]
    assert rel(b) > rel(c)  # pure relevance WOULD rank b before c
    pool = _pool(
        spark, [(1, a, rel(a)), (2, b, rel(b)), (3, c, rel(c))]
    )
    picks = mmr_select(pool, k=3, lam_num=5, lam_den=10).collect()
    assert [r["id"] for r in picks] == [1, 3, 2]
    # round-1 pick reports the empty-set redundancy of zero
    assert picks[0]["red_e6"] == 0 and picks[0]["mmr_s"] == 5 * picks[0]["rel_e6"]


def test_mmr_negative_similarity_is_not_clamped(spark):
    # candidate 2 is ANTI-similar to pick 1 (cos = -1): its redundancy
    # must go negative (boosting its MMR), not clamp at 0.
    pool = _pool(
        spark,
        [(1, [1.0, 0.0], 1_000_000), (2, [-1.0, 0.0], -1_000_000)],
    )
    picks = {r["round"]: r for r in mmr_select(pool, k=2).collect()}
    assert picks[2]["id"] == 2
    assert picks[2]["red_e6"] == -1_000_000
    assert picks[2]["mmr_s"] == 7 * -1_000_000 - 3 * -1_000_000


def test_mmr_stops_early_and_validates(spark):
    pool = _pool(spark, [(1, [1.0, 0.0], 500_000)])
    assert mmr_select(pool, k=5).count() == 1
    with pytest.raises(ValueError, match="lam_num"):
        mmr_select(pool, k=1, lam_num=11, lam_den=10)
    with pytest.raises(ValueError, match="lam_num"):
        mmr_select(pool, k=1, lam_num=0)


def test_mmr_literal_and_broadcast_paths_agree(spark, monkeypatch):
    """The r12 dim guard (MMR_LITERAL_DIM_MAX): above the threshold the
    redundancy update re-reads the picked row and broadcasts it instead
    of embedding a dim-wide literal array in the plan. Both paths must
    be BIT-identical — force the broadcast path by shrinking the
    threshold and compare full greedy traces."""
    from postgis_gtfs_importer_spark.operators import retrieval as R

    import math

    th = math.atan2(0.3122498999199199, 0.95)
    a = [0.95, 0.3122498999199199, 0.0]
    b = [math.cos(th + 0.01), math.sin(th + 0.01), 0.0]
    c = [0.6, 0.0, 0.8]
    rel = lambda v: int(round(v[0], 6) * 1e6)
    pool = _pool(spark, [(1, a, rel(a)), (2, b, rel(b)), (3, c, rel(c))])
    lit_trace = [
        tuple(r) for r in mmr_select(pool, k=3, lam_num=5, lam_den=10).collect()
    ]
    monkeypatch.setattr(R, "MMR_LITERAL_DIM_MAX", 0)  # every vec is "wide"
    bc_trace = [
        tuple(r)
        for r in R.mmr_select(pool, k=3, lam_num=5, lam_den=10).collect()
    ]
    assert bc_trace == lit_trace
    # NULL vector elements propagate identically through both paths
    pool2 = _pool(
        spark,
        [(1, [1.0, 0.0], 900_000), (2, [None, 1.0], 100_000)],
    )
    monkeypatch.setattr(R, "MMR_LITERAL_DIM_MAX", 256)
    t1 = [tuple(r) for r in R.mmr_select(pool2, k=2).collect()]
    monkeypatch.setattr(R, "MMR_LITERAL_DIM_MAX", 0)
    t2 = [tuple(r) for r in R.mmr_select(pool2, k=2).collect()]
    assert t1 == t2


def test_mmr_null_rows_excluded(spark):
    pool = _pool(
        spark,
        [
            (1, [1.0, 0.0], 900_000),
            (None, [1.0, 0.0], 999_999),
            (3, None, 999_999),
            (4, [0.5, 0.5], None),
        ],
    )
    picks = mmr_select(pool, k=4).collect()
    assert [r["id"] for r in picks] == [1]


# ------------------------------------------------------- half-life decay


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, value double"
    )


def test_half_life_decay_exact_weights_and_saturation(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    wk = dt.timedelta(weeks=1)
    rows = [
        (1, "click", t0, 2.0),            # newest: age 0 -> w = 2^20
        (1, "click", t0 - wk, 4.0),       # 1 week  -> w = 2^19
        (1, "click", t0 - 25 * wk, 8.0),  # saturates -> w = 1
    ]
    got = half_life_decay(
        _events(spark, rows), key_cols=["user_id", "event_type"],
        value_col="value",
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_events"] == 3
    assert r["decayed_count_s"] == (1 << 20) + (1 << 19) + 1
    assert r["decayed_value_s"] == 200 * (1 << 20) + 400 * (1 << 19) + 800


def test_half_life_decay_null_policy(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, "click", t0, 2.0),
        (1, "click", t0, None),   # counts, no value contribution
        (None, "click", t0, 9.0),  # NULL key -> excluded
        (1, None, t0, 9.0),        # NULL key -> excluded
        (1, "click", None, 9.0),   # NULL ts -> excluded
    ]
    got = half_life_decay(
        _events(spark, rows), key_cols=["user_id", "event_type"],
        value_col="value",
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_events"] == 2
    assert r["decayed_count_s"] == 2 * (1 << 20)
    assert r["decayed_value_s"] == 200 * (1 << 20)


def test_half_life_decay_validates(spark):
    ev = _events(spark, [])
    with pytest.raises(ValueError, match="max_buckets"):
        half_life_decay(ev, key_cols=["user_id"], max_buckets=63)
    with pytest.raises(ValueError, match="unit_seconds"):
        half_life_decay(ev, key_cols=["user_id"], unit_seconds=0)
