"""Round-12 optimization pins.

1. ktruss count-only support state (VERDICT r11 item 3): the operator
   maintains per-edge support COUNTS plus a cumulative destroyed-triangle
   set instead of per-edge partner lists. The subtle hazard is
   double-destruction bookkeeping — a triangle losing edges in two
   DIFFERENT rounds must decrement its surviving edges exactly once (the
   partner-list form got this for free; the count form tracks it with an
   anti-join against prior rounds' destroyed sets). Pinned here against a
   brute-force recompute-per-round reference over graphs with multi-round
   cascades and shared triangles.

2. Identity-round claims (VERDICT r11 item 10): sssp and
   closeness_centrality probe for convergence at HALF cadence, so they
   may run one round past the fixpoint. The optimization is sound only
   while a converged state is a FIXED POINT of the round body (empty
   frontier -> identical frame). Pinned by comparing outputs across
   max_rounds values straddling convergence — a future edit that makes
   the skipped probe semantic (e.g. a round body that mutates converged
   state) fails these.
"""
from __future__ import annotations

from collections import Counter
from itertools import combinations


def _ref_ktruss(edges, k, max_rounds):
    """Brute-force reference: recompute every edge's triangle support on
    the CURRENT surviving graph each round, peel support < k-2, stop at
    the fixpoint or max_rounds; return {edge: support in its final
    round's input graph} for survivors — the operator's contract."""
    min_sup = k - 2
    cur = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    out = {}
    for rnd in range(1, max_rounds + 1):
        nbrs = {}
        for a, b in cur:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
        sup = Counter()
        for v in nbrs:
            for a, b in combinations(sorted(nbrs[v]), 2):
                if v < a and (a, b) in cur:
                    for e in ((v, a), (v, b), (a, b)):
                        sup[e] += 1
        out = {e: sup[e] for e in cur if sup[e] >= min_sup}
        removed = cur - set(out)
        if not removed or rnd == max_rounds:
            return out
        cur = set(out)
    return out


def _cascade_graph():
    """Deterministic graph with a multi-round cascade in which several
    triangles lose edges in DIFFERENT rounds (the double-destruction
    case) plus a stable K5 core that must keep exact supports."""
    k5 = list(combinations(range(100, 105), 2))
    # triangle chain hanging off the core: peels over multiple rounds
    chain = [
        (1, 2), (1, 3), (2, 3),
        (2, 4), (3, 4),
        (3, 5), (4, 5),
        (4, 100), (5, 100),
        # extra triangles sharing edges with the chain so that one
        # triangle's edges go in different rounds
        (2, 6), (3, 6),
        (3, 7), (4, 7),
    ]
    # a small dense-ish pseudo-random block (deterministic arithmetic,
    # no RNG) wired into the chain
    rand = [
        (10 + (i * 7) % 9, 10 + (i * i + 3 * i) % 9)
        for i in range(40)
    ]
    rand = [(min(a, b), max(a, b)) for a, b in rand if a != b]
    bridge = [(1, 10), (2, 11), (3, 12)]
    # canonical a < b throughout (the operator treats rows as undirected
    # edges but does not canonicalize; the registry feed is canonical)
    return sorted({(min(a, b), max(a, b)) for a, b in k5 + chain + rand + bridge})


def test_ktruss_matches_bruteforce_multiround_cascade(spark):
    from postgis_gtfs_importer_spark.operators.graph import ktruss

    edges = _cascade_graph()
    df = spark.createDataFrame(edges, "a long, b long")
    for k in (3, 4, 5):
        for rounds in (1, 2, 3, 10):
            got = {
                (r["a"], r["b"]): r["support"]
                for r in ktruss(df, k=k, max_rounds=rounds).collect()
            }
            want = _ref_ktruss(edges, k, rounds)
            assert got == want, (k, rounds)


def test_ktruss_triangle_destroyed_across_two_rounds_decrements_once(spark):
    """Targeted double-destruction shape: triangle T={1,2,3} loses
    (1,2) in round 1 and (1,3) in round 2 while (2,3) survives — the
    count form must not subtract T from (2,3) twice."""
    from postgis_gtfs_importer_spark.operators.graph import ktruss

    t = [(1, 2), (1, 3), (2, 3)]
    # (1,3) gets a second triangle via 5; 5's other edges are braced by
    # a K4 so they survive; (2,3) sits in a K4 of its own
    support_13 = [(1, 5), (3, 5)]
    brace_5 = list(combinations([1, 5, 8, 9], 2)) + list(
        combinations([3, 5, 11, 12], 2)
    )
    brace_23 = list(combinations([2, 3, 21, 22], 2))
    edges = sorted(set(
        (min(a, b), max(a, b))
        for a, b in t + support_13 + brace_5 + brace_23
    ))
    df = spark.createDataFrame(edges, "a long, b long")
    for rounds in (2, 3, 6):
        got = {
            (r["a"], r["b"]): r["support"]
            for r in ktruss(df, k=4, max_rounds=rounds).collect()
        }
        assert got == _ref_ktruss(edges, 4, rounds), rounds


def test_sssp_identity_round_past_fixpoint(spark):
    """sssp's half-cadence probe can run one relaxation round past
    convergence; the output must be bit-identical for any max_rounds at
    or beyond the diameter (converged state is a fixed point)."""
    from postgis_gtfs_importer_spark.operators.graph import sssp

    # path 1-2-3-4-5 with a shortcut and an unreachable island (7,8):
    # converges after 4 relaxation rounds
    edges = spark.createDataFrame(
        [
            (1, 2, 1), (2, 3, 2), (3, 4, 1), (4, 5, 3),
            (1, 3, 5), (7, 8, 1),
        ],
        "src long, dst long, w long",
    )

    def run(rounds):
        return sorted(
            map(
                tuple,
                sssp(
                    edges, source=1, max_rounds=rounds,
                    src_col="src", dst_col="dst", weight_col="w",
                ).collect(),
            )
        )

    converged = run(4)
    for rounds in (5, 6, 9):
        assert run(rounds) == converged, rounds


def test_closeness_identity_round_past_fixpoint(spark):
    """closeness_centrality's frontier-empty probe fires on even rounds
    only; BFS completing on an odd round costs one identity round whose
    state must be unchanged — outputs identical for any max_rounds >=
    the BFS diameter from the sampled sources."""
    from postgis_gtfs_importer_spark.operators.graph import (
        closeness_centrality,
    )

    # path graph 1-2-3-4-5-6: from sources {1, 2} BFS completes in 5
    # rounds (odd — the probe only notices at round 6)
    path = [(i, i + 1) for i in range(1, 6)]
    edges = spark.createDataFrame(path, "a long, b long")

    def run(rounds):
        return sorted(
            map(
                tuple,
                closeness_centrality(
                    edges, k_sources=2, max_rounds=rounds
                ).collect(),
            )
        )

    converged = run(5)
    for rounds in (6, 7, 10):
        assert run(rounds) == converged, rounds
