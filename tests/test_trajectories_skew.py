"""Trajectory similarity (Hausdorff top-k over C13 polylines) and
skew-mitigation utilities (equality with unsalted plans)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgis_gtfs_importer_spark.operators.skew import (
    salted_join,
    salted_two_stage_agg,
)
from postgis_gtfs_importer_spark.operators.trajectories import similar_shapes_topk
from postgis_gtfs_importer_spark.sources import gtfs_feed as GF

from .gtfs_fixtures import write_feed_dir


@pytest.fixture(scope="module")
def feed(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("feed_traj")
    write_feed_dir(str(d))
    return GF.read_feed(spark, str(d))


def test_similar_shapes_identical_geometry_first(feed):
    topk = similar_shapes_topk(feed, k=2)
    best = {
        r.shape_id: (r.other_shape_id, r.hausdorff_deg)
        for r in topk.filter(F.col("rn") == 1).collect()
    }
    # SH1 and SH2 are geometrically identical -> mutual best match, dist 0
    assert best["SH1"] == ("SH2", 0.0)
    assert best["SH2"] == ("SH1", 0.0)


def test_matmul_topk_matches_fold_topk(spark):
    """The GEMM scoring path agrees with the oracle-checked fold path:
    identical neighbor sets, scores within float tolerance."""
    from postgis_gtfs_importer_spark.operators.similarity import (
        brute_force_topk,
        brute_force_topk_matmul,
    )
    from postgis_gtfs_importer_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    fold = brute_force_topk(emb, q, k=5)
    gemm = brute_force_topk_matmul(emb, q, k=5)
    f = {(r.q_id, r.vec_id): r.score for r in fold.collect()}
    g = {(r.q_id, r.vec_id): r.score for r in gemm.collect()}
    assert set(f) == set(g)
    assert all(abs(f[k_] - g[k_]) <= 2e-6 for k_ in f)


def test_salted_join_equals_plain_join(spark):
    large = spark.createDataFrame(
        [(i % 3, i) for i in range(300)], "k int, v int"  # key skew: 3 keys
    )
    small = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], "k int, name string")
    plain = {(r.k, r.v, r.name) for r in large.join(small, "k").collect()}
    salted = {(r.k, r.v, r.name) for r in salted_join(large, small, "k").collect()}
    assert salted == plain


def test_salted_two_stage_agg_equals_plain(spark):
    df = spark.createDataFrame(
        [(i % 2, i) for i in range(1000)], "k int, v long"
    )
    plain = {
        (r.k, r.total, r.mx)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("total"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r.k, r.total, r.mx)
        for r in salted_two_stage_agg(
            df, ["k"], {"total": F.sum("v"), "mx": F.max("v")}
        ).collect()
    }
    assert salted == plain
