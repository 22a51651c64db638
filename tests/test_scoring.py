"""Unit tests for the hashing-trick linear scorer: hand-computable
scores via a crafted weight table, featurization correctness, and the
broadcast plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgis_gtfs_importer_spark.operators.scoring import (
    hashed_features,
    linear_weights,
    score_documents,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bucket_of(spark, tok, dims):
    from postgis_gtfs_importer_spark.operators.scoring import h32

    return (
        spark.range(1)
        .select((h32(F.lit(tok)) % dims).alias("b"))
        .collect()[0]
        .b
    )


def test_hashed_features_counts_tf(spark):
    d = _docs(spark, [(1, "cat cat dog"), (2, "dog")])
    dims = 64
    cat, dog = _bucket_of(spark, "cat", dims), _bucket_of(spark, "dog", dims)
    out = {(r.id, r.bucket): r.tf for r in
           hashed_features(d, dims=dims).collect()}
    if cat != dog:
        assert out[(1, cat)] == 2 and out[(1, dog)] == 1
    else:  # hash collision: both tokens share the bucket
        assert out[(1, cat)] == 3
    assert out[(2, dog)] == 1


def test_score_matches_hand_sum(spark):
    dims = 32
    d = _docs(spark, [(1, "x y x"), (2, "z")])
    w = linear_weights(spark, dims=dims)
    wmap = {r.bucket: r.w_e3 for r in w.collect()}
    out = {r.id: r for r in score_documents(d, w, dims=dims).collect()}
    bx, by, bz = (_bucket_of(spark, t, dims) for t in "xyz")
    assert out[1].score_e3 == 2 * wmap[bx] + wmap[by]
    assert out[1].n_tokens == 3
    assert out[2].score_e3 == wmap[bz]
    assert out[2].label == (1 if wmap[bz] >= 0 else 0)


def test_threshold_controls_label(spark):
    d = _docs(spark, [(1, "alpha beta gamma")])
    w = linear_weights(spark, dims=128)
    lo = score_documents(d, w, dims=128, threshold_e3=-(10**9)).collect()[0]
    hi = score_documents(d, w, dims=128, threshold_e3=10**9).collect()[0]
    assert (lo.label, hi.label) == (1, 0)


def test_weights_bounded_and_deterministic(spark):
    a = linear_weights(spark, dims=256).collect()
    b = linear_weights(spark, dims=256).collect()
    assert sorted((r.bucket, r.w_e3) for r in a) == sorted(
        (r.bucket, r.w_e3) for r in b
    )
    assert all(-1000 <= r.w_e3 <= 1000 for r in a)


def test_scoring_plan_broadcasts_weights(spark):
    d = _docs(spark, [(i, f"tok{i} tok{i+1}") for i in range(50)])
    df = score_documents(d, linear_weights(spark, dims=64), dims=64)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_compression_ratio_matches_direct_zlib(spark):
    import zlib

    from postgis_gtfs_importer_spark.operators.scoring import (
        compression_ratio,
    )

    rows = [
        (1, "spam " * 200),                      # boilerplate: tiny ratio
        (2, "the quick brown fox jumps over the lazy dog near the bank"),
        (3, ""),                                  # empty: 1e6 by convention
        (4, "ab" * 5 + "Zq9!kX#mW@vL$pR%"),       # short high-entropy tail
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in compression_ratio(df).collect()}
    for i, t in rows:
        b = t.encode("utf-8")
        assert out[i].n_bytes == len(b)
        if b:
            c = len(zlib.compress(b, 6))
            assert out[i].n_compressed == c
            assert out[i].ratio_e6 == (c * 1_000_000 + len(b) // 2) // len(b)
    assert out[3].ratio_e6 == 1_000_000
    # the signal orders boilerplate far below prose
    assert out[1].ratio_e6 < out[2].ratio_e6 // 4
    # plan: one Arrow-batched python stage, no shuffle
    plan = compression_ratio(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "MapInPandas" in plan


def test_mad_outliers_flags_far_tail_only(spark):
    from postgis_gtfs_importer_spark.operators.scoring import mad_outliers

    rows = [("a", i, v) for i, v in enumerate([10, 10, 12, 14, 14, 1000])]
    rows += [("b", i, v) for i, v in enumerate([5, 6, 7])]
    df = spark.createDataFrame(rows, ["grp", "rid", "val"])
    out = {
        (r["grp"], r["rid"]): (r["med"], r["mad"], r["is_outlier"])
        for r in mad_outliers(df, "val", "grp", "rid", k=2).collect()
    }
    # group a: sorted [10,10,12,14,14,1000], lower median idx (6+1)//2=3
    # -> med=12; devs [2,2,0,2,2,988] sorted [0,2,2,2,2,988] -> MAD=2
    # outlier iff dev > 4: only the 1000 row
    assert out[("a", 5)] == (12, 2, True)
    assert all(not v[2] for k, v in out.items() if k != ("a", 5))
    # group b: med=6, MAD=1, no deviation exceeds 2
    assert out[("b", 0)] == (6, 1, False)


def test_robust_scale_quartiles_and_null_iqr(spark):
    from postgis_gtfs_importer_spark.operators.scoring import robust_scale

    rows = [("a", i, v) for i, v in enumerate([10, 20, 30, 40])]
    rows += [("b", i, 7) for i in range(3)]  # constant group: IQR 0
    df = spark.createDataFrame(rows, ["grp", "rid", "val"])
    out = {
        (r["grp"], r["rid"]): (r["med"], r["iqr"], r["scaled_ppm"])
        for r in robust_scale(df, "val", "grp", "rid").collect()
    }
    # group a: n=4 -> med rank (4+1)//2=2 -> 20; q1 rank 1 -> 10;
    # q3 rank (12+3)//4=3 -> 30; IQR=20
    assert out[("a", 0)] == (20, 20, -500_000)
    assert out[("a", 3)] == (20, 20, 1_000_000)
    # constant group: honest NULL, not fake 0
    assert out[("b", 0)] == (7, 0, None)
