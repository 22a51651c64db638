"""Round-8 additions: Lloyd k-means training loop + A-ES weighted
sampling without replacement (VERDICT r7 item 4).

The oracle-parity gate (tests/test_oracle_parity.py) already
value-compares both registry entries against DuckDB at sf0.01; these
tests pin the operator-level SEMANTICS the parity hash can't localize:
convergence behavior, tiebreaks, exclusion policies, and the exact
inclusion law of A-ES versus its priority_sample sibling.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from postgis_gtfs_importer_spark.operators.clustering import (
    COORD_SCALE,
    kmeans_inertia,
    kmeans_lloyd,
    quantize_points,
)
from postgis_gtfs_importer_spark.operators.curation import (
    priority_sample,
    weighted_sample_aes,
)


def _vec_df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )


def test_kmeans_separable_clusters_recovered(spark):
    # two tight blobs around (0,0) and (10,10); seeds = ids 0,1 — one
    # from each blob (id 0 at the origin blob, id 1 at the far blob)
    rows = [
        (0, (0.0, 0.1)), (2, (0.1, 0.0)), (4, (-0.1, 0.1)),
        (1, (10.0, 10.1)), (3, (10.1, 10.0)), (5, (9.9, 9.9)),
    ]
    out = kmeans_lloyd(
        _vec_df(spark, rows), k=2, iterations=3
    ).collect()
    got = {(r.cid, r.dim): r.c_q for r in out}
    sizes = {r.cid: r.n_members for r in out}
    assert sizes == {0: 3, 1: 3}
    # centroid 0 = mean of blob A (truncating integer mean of quantized
    # coords): dim0 mean of (0, .1, -.1)*1e6 = 0; dim1 = (100000+0-
    # -? ) compute: (.1, 0, .1) -> (100000+0+100000)//3 = 66666
    assert got[(0, 0)] == 0 and got[(0, 1)] == 66666
    assert got[(1, 0)] == (10_000_000 + 10_100_000 + 9_900_000) // 3
    assert got[(1, 1)] == (10_100_000 + 10_000_000 + 9_900_000) // 3


def test_kmeans_assignment_tiebreak_smallest_cid(spark):
    # a point exactly equidistant from both seeds joins the SMALLER cid
    rows = [(0, (0.0,)), (1, (2.0,)), (2, (1.0,))]
    out = kmeans_lloyd(_vec_df(spark, rows), k=2, iterations=1).collect()
    sizes = {r.cid: r.n_members for r in out}
    assert sizes == {0: 2, 1: 1}  # id 2 tied -> cid 0


def test_kmeans_empty_cluster_drops(spark):
    # both seeds sit in one blob; after one update every point is
    # nearer centroid 0 (tiebreak), so centroid 1 loses all members and
    # disappears from the next codebook — documented, not hidden
    rows = [(0, (0.0,)), (1, (0.0,)), (2, (0.0,)), (3, (0.0,))]
    out = kmeans_lloyd(_vec_df(spark, rows), k=2, iterations=2).collect()
    assert {r.cid for r in out} == {0}
    assert all(r.n_members == 4 for r in out)


def test_kmeans_validates_arguments(spark):
    df = _vec_df(spark, [(0, (0.0,))])
    with pytest.raises(ValueError, match="k >= 1"):
        kmeans_lloyd(df, k=0)
    with pytest.raises(ValueError, match="iterations >= 1"):
        kmeans_lloyd(df, iterations=0)


def test_kmeans_inertia_improves_with_training(spark):
    # inertia of the trained codebook must not exceed the seed
    # codebook's (Lloyd monotonicity, preserved by the integer
    # quantization up to the documented sub-quantum truncation — on
    # this spread-out data the improvement is orders of magnitude)
    rows = [(i, (float(i % 7), float((3 * i) % 5))) for i in range(40)]
    df = _vec_df(spark, rows)
    trained = kmeans_lloyd(df, k=3, iterations=3)
    seeds = (
        quantize_points(df, "vec_id", "embedding", COORD_SCALE)
        .filter(F.col("id") < 3)
        .select(F.col("id").alias("cid"), "dim", F.col("q").alias("c_q"))
    )
    i_trained = kmeans_inertia(df, trained).collect()[0]
    i_seeds = kmeans_inertia(df, seeds).collect()[0]
    assert i_trained.n_points == 40 and i_seeds.n_points == 40
    assert i_trained.inertia < i_seeds.inertia


def test_aes_rank_bounds_and_exclusions(spark):
    df = spark.createDataFrame(
        [(i, "s", float(i % 5)) for i in range(1, 40)]
        + [(100, "s", None), (101, "s", -2.0)],
        "k long, s string, w double",
    )
    out = weighted_sample_aes(df, "k", "w", k=10, stratum_col="s").collect()
    assert len(out) == 10
    assert sorted(r.rank for r in out) == list(range(1, 11))
    kept = {r.k for r in out}
    assert 100 not in kept and 101 not in kept  # NULL / nonpositive w
    assert all(r.k % 5 != 0 for r in out)  # zero-weight rows excluded


def test_aes_is_deterministic_and_weight_sensitive(spark):
    df = spark.createDataFrame(
        [(i, 1.0 if i else 1e9) for i in range(200)], "k long, w double"
    )
    a = {r.k for r in weighted_sample_aes(df, "k", "w", k=5).collect()}
    b = {r.k for r in weighted_sample_aes(df, "k", "w", k=5).collect()}
    assert a == b  # pure function of (keys, weights, salt)
    # weight 1e9 vs 1: P(miss) ~ (per-key exp keys); the e9-weighted
    # row's key is ~1e9 x smaller than any unit-weight key — it must
    # head the sample
    ranked = weighted_sample_aes(df, "k", "w", k=5).collect()
    assert min(ranked, key=lambda r: r.rank).k == 0


def test_aes_matches_manual_exponential_keys(spark):
    """The selected set equals a driver-side replay of -ln(u)/w over
    the same md5-uniforms — the inclusion law is the A-ES one, not
    priority sampling's u/w (the two orderings demonstrably differ on
    this data)."""
    import hashlib

    rows = [(i, float(1 + (i * 7) % 13)) for i in range(1, 60)]
    df = spark.createDataFrame(rows, "k long, w double")

    def u_of(key: int, salt: str) -> float:
        h = int(hashlib.md5(f"{salt}{key}".encode()).hexdigest()[:15], 16)
        return (h + 1) / float(2**60)

    aes_key = {k: -math.log(u_of(k, "aes")) / w for k, w in rows}
    want = [k for k, _ in sorted(rows, key=lambda r: (aes_key[r[0]], r[0]))][:8]
    got = [
        r.k
        for r in weighted_sample_aes(df, "k", "w", k=8)
        .orderBy("rank")
        .collect()
    ]
    assert got == want
    pri = {
        r.k
        for r in priority_sample(df, "k", "w", k=8, salt="aes").collect()
    }
    assert pri != set(want)  # the exact law differs from u/w here


@pytest.mark.parametrize("bad", ["_ek", "rank"])
def test_aes_rejects_reserved_column_names(spark, bad):
    df = spark.createDataFrame(
        [(1, 2.0, 3)], f"k long, w double, {bad} long"
    )
    with pytest.raises(ValueError, match="reserved column names"):
        weighted_sample_aes(df, "k", "w", k=1)


def test_kmeans_broadcast_state_off_same_result(spark):
    """The sort-merge fallback (broadcast_state=False, for |V| beyond
    executor memory) must be plan-only: bit-identical codebook."""
    rows = [(i, (float(i % 7), float((3 * i) % 5), float(i % 3))) for i in range(60)]
    df = _vec_df(spark, rows)
    on = {(r.cid, r.dim): (r.c_q, r.n_members)
          for r in kmeans_lloyd(df, k=3, iterations=2).collect()}
    off = {(r.cid, r.dim): (r.c_q, r.n_members)
           for r in kmeans_lloyd(df, k=3, iterations=2,
                                 broadcast_state=False).collect()}
    assert on == off and len(on) == 9


def test_kmeans_inertia_monotone_in_iterations(spark):
    """Lloyd monotonicity, the loop's core invariant: the objective is
    non-increasing iteration over iteration. Exact for real-valued
    Lloyd; the truncating integer mean can perturb a centroid by <1
    quantum per dimension, so allow that documented slack (dims *
    (quantum/2)^2 * n is far below 1 distance unit at COORD_SCALE on
    this data — assert plain non-increase)."""
    rows = [
        (i, ((i * 13 % 97) / 10.0, (i * 29 % 83) / 10.0, (i * 7 % 71) / 10.0))
        for i in range(120)
    ]
    df = _vec_df(spark, rows)
    inertias = []
    for t in (1, 2, 3, 4):
        cb = kmeans_lloyd(df, k=4, iterations=t)
        inertias.append(kmeans_inertia(df, cb).collect()[0].inertia)
    assert all(b <= a for a, b in zip(inertias, inertias[1:])), inertias
