"""Distributed PCA (operators/linalg.py): exact covariance identity,
bit-exact k-step power-iteration contract vs an integer numpy replica,
gap-dependent accuracy on a planted direction, determinism and
partitioning-invariance, and the DuckDB oracle replay of the full
chain (staged for r12 registration — the window is full this round)."""

from __future__ import annotations

import numpy as np
import pytest

# opt-in by default (staged, unregistered feature family (no runtime surface until a build round registers it)) — SPARK_GRAFT_FULL_TESTS=1 runs it
pytestmark = pytest.mark.sweep
from pyspark.sql import functions as F

from postgis_gtfs_importer_spark.operators.linalg import (
    PCA_SCALE_E6,
    embedding_covariance_e12,
    pca_top_component,
)


def _planted(n=400, d=16, seed=7, strength=6.0):
    """Deterministic anisotropic cloud: isotropic noise + a planted
    dominant direction (eigengap well under 0.5)."""
    rng = np.random.default_rng(seed)
    u = rng.normal(size=d)
    u /= np.linalg.norm(u)
    X = rng.normal(size=(n, d)) + strength * rng.normal(size=(n, 1)) * u
    return X, u


def _df(spark, X):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>",
    )


def _numpy_replica(X, iters):
    """EXACT integer replica (python-int arithmetic end to end: the
    covariance sums exceed 2^53, so float64 matmul drifts by ulps —
    the very class the operator exists to exclude). Division is
    trunc-toward-zero, matching Spark/DuckDB ``%`` dividend-sign
    semantics (python ``%`` floors — different for negatives)."""
    Q = np.floor(X * 1e6 + 0.5).astype(np.int64).astype(object)
    n = Q.shape[0]
    C = n * (Q.T @ Q) - np.outer(Q.sum(axis=0), Q.sum(axis=0))

    def tdiv(q, m):
        return -((-q) // m) if q < 0 else q // m

    v = np.array([PCA_SCALE_E6] * X.shape[1], dtype=object)
    for _ in range(iters):
        u = C @ v
        m = max(abs(int(x)) for x in u)
        v = np.array(
            [tdiv(int(x) * PCA_SCALE_E6, m) for x in u], dtype=object
        )
    # canonical sign: largest |v| (lowest index on ties) positive
    a = int(np.argmax([abs(int(x)) for x in v]))
    if v[a] < 0:
        v = -v
    return C, v


def test_covariance_matches_exact_integer_identity(spark):
    X, _ = _planted(n=60, d=5)
    cov = embedding_covariance_e12(_df(spark, X), "embedding").collect()
    C, _ = _numpy_replica(X, 1)
    got = {(r.i, r.j): int(r.c) for r in cov}
    assert len(got) == 25
    for (i, j), c in got.items():
        assert c == int(round(C[i, j])), (i, j)
    # symmetry emitted, diagonal once
    assert all((j, i) in got for (i, j) in got)


def test_power_iteration_contract_bit_equal_to_replica(spark):
    """THE contract: the k-step fixed-point iterate, bit-equal."""
    X, _ = _planted(n=200, d=8)
    for iters in (1, 3, 8):
        got = {
            r.i: r.loading_e6
            for r in pca_top_component(_df(spark, X), iters=iters).collect()
        }
        _, v = _numpy_replica(X, iters)
        assert [got[i] for i in range(8)] == [int(x) for x in v], iters


def test_accuracy_under_real_eigengap(spark):
    X, u = _planted(n=400, d=16, strength=6.0)
    out = pca_top_component(_df(spark, X), iters=8).collect()
    v = np.array(
        [r.loading_e6 for r in sorted(out, key=lambda r: r.i)], dtype=float
    )
    cos = abs(v @ u) / (np.linalg.norm(v) * np.linalg.norm(u))
    assert cos > 0.99, cos
    assert int(np.abs(v).max()) == PCA_SCALE_E6  # final rescale pins max


def test_partitioning_and_order_invariance(spark):
    X, _ = _planted(n=150, d=6)
    df = _df(spark, X)
    a = pca_top_component(df, iters=5).collect()
    b = pca_top_component(
        df.orderBy(F.desc("vec_id")).repartition(13), iters=5
    ).collect()
    assert sorted((r.i, r.loading_e6) for r in a) == sorted(
        (r.i, r.loading_e6) for r in b
    )


def test_null_vectors_excluded(spark):
    X, _ = _planted(n=50, d=4)
    df = _df(spark, X).unionByName(
        spark.sql(
            "SELECT CAST(999 AS LONG) vec_id,"
            " CAST(NULL AS ARRAY<DOUBLE>) embedding"
        )
    )
    cov = embedding_covariance_e12(df, "embedding")
    assert cov.agg(F.max("n")).collect()[0][0] == 50


def test_duckdb_oracle_replays_full_chain(spark, tmp_path):
    """The r12-staged oracle: quantize -> integer covariance ->
    unrolled fixed-point iterations -> canonical sign, in DuckDB SQL,
    value-equal to the Spark operator."""
    duckdb = pytest.importorskip("duckdb")
    X, _ = _planted(n=120, d=6)
    df = _df(spark, X)
    p = str(tmp_path / "emb.parquet")
    df.coalesce(1).write.parquet(p)
    iters = 4
    got = sorted(
        (r.i, r.loading_e6)
        for r in pca_top_component(df, iters=iters).collect()
    )
    con = duckdb.connect()
    step = """
    , u{K} AS (
        SELECT c.i, sum(c.c * v.v) AS u
        FROM cov c JOIN v{P} v ON c.j = v.i GROUP BY c.i
    ), m{K} AS (SELECT max(abs(u)) AS m FROM u{K})
    , v{K} AS (
        SELECT i, (q - q % m) // m AS v
        FROM (SELECT i, CAST(u * 1000000 AS HUGEINT) AS q, m
              FROM u{K}, m{K})
    )
    """
    chain = "".join(
        step.format(K=k, P=k - 1 if k > 1 else "0") for k in range(1, iters + 1)
    )
    sql = f"""
    WITH q AS (
      SELECT row_number() OVER () AS rid,
             list_transform(embedding,
               x -> CAST(floor(x * 1e6 + 0.5) AS HUGEINT)) AS qv
      FROM read_parquet('{p}/*.parquet') WHERE embedding IS NOT NULL
    ),
    el AS (
      SELECT rid, i - 1 AS i, qv[i] AS x
      FROM q, unnest(range(1, len(qv) + 1)) t(i)
    ),
    sums AS (SELECT i, sum(x) AS s, count(*) AS n FROM el GROUP BY i),
    pp AS (
      SELECT a.i AS i, b.i AS j, sum(a.x * b.x) AS spp
      FROM el a JOIN el b ON a.rid = b.rid
      GROUP BY a.i, b.i
    ),
    cov AS (
      SELECT p.i, p.j, (sa.n * p.spp - sa.s * sb.s) AS c
      FROM pp p JOIN sums sa ON p.i = sa.i JOIN sums sb ON p.j = sb.i
    ),
    v0 AS (SELECT DISTINCT i, CAST(1000000 AS HUGEINT) AS v FROM cov)
    {chain}
    , final AS (SELECT i, v FROM v{iters})
    , anchor AS (
      SELECT CASE WHEN v < 0 THEN -1 ELSE 1 END AS flip
      FROM final ORDER BY abs(v) DESC, i ASC LIMIT 1
    )
    SELECT f.i, CAST(f.v * a.flip AS BIGINT) AS loading_e6
    FROM final f, anchor a ORDER BY f.i
    """
    want = [tuple(r) for r in con.execute(sql).fetchall()]
    assert got == [(int(i), int(v)) for i, v in want]
