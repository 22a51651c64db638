"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline: broadcast the (small) query
set against the corpus — a map-side cross product with zero shuffle except
the final per-query top-k. The LSH variant buckets both sides by a
random-hyperplane sketch so only same-bucket candidates are scored — the
100 TB path (shuffle on bucket ids, not all-pairs).

All vector math is JVM-side higher-order functions (functions.vectors);
no Python in the scoring loop.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vectors as V


def fixed_planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (replayable in the SQL oracle)."""
    rng = np.random.RandomState(seed)
    return [[float(x) for x in rng.randn(dim)] for _ in range(n_planes)]


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query. Output: q_id, vec_id, score, rn.

    Ordering ties are broken on rounded score then candidate id so results
    are fully deterministic (and oracle-comparable).
    """
    q = queries.select(
        F.col(id_col).alias("q_id"),
        V.double_array(F.col(vec_col)).alias("q_emb"),
        V.l2_norm(F.col(vec_col)).alias("q_nrm"),
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        V.double_array(F.col(vec_col)).alias("emb"),
        V.l2_norm(F.col(vec_col)).alias("nrm"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
        # norms AND the double widening precomputed per row (same
        # expressions → bit-identical to inline cosine); the per-pair
        # work is one fold + one division
        .withColumn(
            "score",
            F.round(
                V.dot_double(F.col("q_emb"), F.col("emb"))
                / (F.col("q_nrm") * F.col("nrm")),
                6,
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "vec_id", "score", "rn")
    )


def brute_force_topk_matmul(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k via batched numpy matmul — the wide-dim path.

    Same contract as brute_force_topk; the scoring kernel is a
    mapInPandas stage doing one (batch × dim) · (dim × n_queries) GEMM
    per Arrow batch instead of per-row expression folds — at dim ≥ a few
    hundred this wins by the BLAS factor. Scores can differ from the
    fold version in the last ulp (pairwise vs sequential summation), so
    this variant is NOT oracle-registered; equivalence to the exact
    operator is asserted with a tolerance in tests. The driver-visible
    oracle-checked op remains brute_force_topk.
    """
    import numpy as np
    import pandas as pd

    q_rows = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_emb")
    ).collect()
    # ids keep their source dtype (object array): forcing int64 crashed
    # on the string ids the GTFS side of the codebase uses, while the
    # fold variant handled them fine — "same contract" must include the
    # id type
    q_ids = np.array([r.q_id for r in q_rows], dtype=object)
    Q = np.array([r.q_emb for r in q_rows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("emb"))

    def score(batches):
        for pdf in batches:
            M = np.array(list(pdf["emb"]), dtype=np.float64)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            S = Mn @ Qn.T  # (batch, n_queries)
            n_rows = len(pdf)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), len(q_ids)),
                    "q_id": np.tile(q_ids, n_rows),
                    "score": np.round(S.reshape(-1), 6),
                }
            )

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    id_type = corpus.schema[id_col].dataType
    scored = c.mapInPandas(
        score,
        StructType(
            [
                StructField("vec_id", id_type),
                StructField("q_id", id_type),
                StructField("score", DoubleType()),
            ]
        ),
    ).filter(F.col("vec_id") != F.col("q_id"))
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "vec_id", "score", "rn")
    )


def cosine_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-blocked (the scale path).

    Exact cosine is computed only for same-bucket pairs — the all-pairs
    O(n²) shuffle becomes a per-bucket self-join keyed on the sketch.
    Recall < 1 by construction (cross-bucket near-dups are missed); raise
    recall with fewer planes (bigger buckets) or multi-probe. Output is
    deterministic and oracle-replayable: id_a < id_b, score rounded e6.
    """
    planes = fixed_planes(dim, n_planes, seed)
    # norms precomputed ONCE per row, not per candidate pair; the
    # float->double widening is FUSED into the pair fold (r12,
    # V.dot_cast): one lambda layer per pair instead of three, while
    # the checkpointed/broadcast side relation stays float-narrow
    # (guide §2.3). Same expressions → bit-identical doubles → the
    # oracle comparison is unaffected.
    side = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("emb"),
        V.l2_norm(F.col(vec_col)).alias("nrm"),
        V.hyperplane_sketch(F.col(vec_col), planes).alias("bucket"),
    )
    from ..operators.dedup import materialize

    side = materialize(side)  # self-join: compute sketches/norms once
    a, b = side.alias("a"), side.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .withColumn(
            "score_e6",
            F.floor(
                V.dot_cast(F.col("a.emb"), F.col("b.emb"))
                / (F.col("a.nrm") * F.col("b.nrm"))
                * F.lit(1e6)
                + F.lit(0.5)
            ).cast("long"),
        )
        .filter(F.col("score_e6") >= int(threshold * 1e6))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            "score_e6",
        )
    )


def kmeans_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
) -> DataFrame:
    """Trained coarse quantizer for :func:`ivf_topk` — pyspark.ml KMeans
    over the corpus, returned in the (cid, cemb, cnrm) shape ivf_topk
    probes. Trained centroids tighten the inverted lists (higher recall
    at the same nprobe) at the cost of a training pass and of
    determinism — the oracle-registered IVF variant stays sampled; this
    is the production path (recall measured in
    tests/test_approx.py::test_ivf_kmeans_recall_beats_sampled).

    The model (n_centroids × dim doubles) is driver-side by nature —
    that is the IVF design, not a collect() smell: at 100 TB the corpus
    stays distributed; only the centroid table (KBs) is broadcast.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = corpus.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_centroids, seed=seed, maxIter=max_iter).fit(feat)
    rows = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    cent = corpus.sparkSession.createDataFrame(
        rows, "cid long, cemb array<double>"
    )
    return cent.select(
        "cid", "cemb", V.l2_norm(F.col("cemb")).alias("cnrm")
    )


def _centroid_table(
    corpus: DataFrame,
    n_centroids: int,
    id_col: str,
    vec_col: str,
    centroids: DataFrame | None,
) -> DataFrame:
    """Deterministic sampled quantizer unless a trained one is passed:
    the ``n_centroids`` smallest-id corpus vectors (TakeOrderedAndProject
    — a distributed top-k, one-time build cost). An earlier
    ``id < n_centroids`` filter assumed DENSE INTEGER ids from 0: a
    corpus whose ids start at 10_000 (or string ids, which implicit-cast
    the comparison to NULL) yielded an EMPTY centroid table and every
    downstream operator silently returned zero rows. For dense 0-based
    ids the two forms select identical centroids."""
    if centroids is not None:
        return centroids
    return corpus.orderBy(F.col(id_col)).limit(n_centroids).select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("cemb"),
        V.l2_norm(F.col(vec_col)).alias("cnrm"),
    )


def _assign(side: DataFrame, cent) -> DataFrame:
    """Map-side argmax-cosine assignment: corpus × broadcast centroids →
    (vec_id, emb, nrm, cid). No corpus shuffle."""
    sim_to_cent = V.dot(F.col("emb"), F.col("cemb")) / (
        F.col("nrm") * F.col("cnrm")
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.desc("csim"), F.asc("cid")
    )
    return (
        side.join(cent, F.lit(True))
        .withColumn("csim", F.round(sim_to_cent, 6))
        .withColumn("crn", F.row_number().over(w_assign))
        .filter(F.col("crn") == 1)
        .select("vec_id", "emb", "nrm", "cid")
    )


def assign_to_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """The IVF inverted-list assignment on its own — (vec_id, cid) —
    for list-balance inspection and as the build stage of a persisted
    IVF index (at 100 TB the assignment is written once, bucketed by
    cid, and reused across query batches)."""
    cent = F.broadcast(
        _centroid_table(corpus, n_centroids, id_col, vec_col, centroids)
    )
    side = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("emb"),
        V.l2_norm(F.col(vec_col)).alias("nrm"),
    )
    return _assign(side, cent).select("vec_id", "cid")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-flat ANN: coarse quantizer → inverted lists → probe-and-score.

    The default centroids are SAMPLED (the first ``n_centroids`` corpus
    vectors) rather than k-means-trained, which keeps the operator fully
    deterministic and oracle-replayable; pass
    ``centroids=kmeans_centroids(corpus, …)`` for the trained production
    quantizer — one input DataFrame changes, not the plan. Plan shape (the
    part that matters at 100 TB):

      * assignment: corpus × broadcast(centroids) → argmax cosine — a
        map-side pass, no corpus shuffle;
      * the corpus is then effectively partitioned by centroid id (the
        inverted lists);
      * each query probes its ``nprobe`` nearest centroids and scores
        exact cosine only against those lists — the scored fraction is
        ~nprobe/n_centroids of the corpus.
    """
    from ..operators.dedup import materialize

    cent = F.broadcast(
        materialize(_centroid_table(corpus, n_centroids, id_col, vec_col, centroids))
    )
    # arrays stay float-narrow through the checkpoint and the cid join;
    # the probe-pair scoring below fuses the float->double widening into
    # its fold (r12, V.dot_cast)
    side = materialize(
        corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("emb"),
            V.l2_norm(F.col(vec_col)).alias("nrm"),
        )
    )
    assigned = _assign(side, cent)
    # Probes use the QUERIES' OWN embeddings — an earlier form looked
    # the query vectors up in the corpus by id, which silently returned
    # EMPTY results for external query sets (ids absent from the corpus)
    # and, worse, scored with the corpus's embedding whenever an
    # external id collided with a corpus id. For the common
    # queries-drawn-from-corpus case the two are identical.
    probes = (
        queries.select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("q_emb"),
            V.l2_norm(F.col(vec_col)).alias("q_nrm"),
        )
        .join(cent, F.lit(True))
        .withColumn(
            "csim",
            F.round(
                V.dot(F.col("q_emb"), F.col("cemb"))
                / (F.col("q_nrm") * F.col("cnrm")),
                6,
            ),
        )
        .withColumn(
            "crn",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(F.desc("csim"), F.asc("cid"))
            ),
        )
        .filter(F.col("crn") <= nprobe)
        .select("q_id", "q_emb", "q_nrm", "cid")
    )
    scored = (
        probes.join(assigned, "cid")
        .filter(F.col("vec_id") != F.col("q_id"))
        .withColumn(
            "score",
            F.round(
                V.dot_cast(F.col("q_emb"), F.col("emb"))
                / (F.col("q_nrm") * F.col("nrm")),
                6,
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "cid", "vec_id", "score", "rn")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: score only candidates sharing the
    hyperplane-sign bucket with the query. Recall < 1 by design; raise
    n_planes bands or probe neighboring buckets for higher recall.
    """
    planes = fixed_planes(dim, n_planes, seed)
    q = queries.select(
        F.col(id_col).alias("q_id"),
        V.double_array(F.col(vec_col)).alias("q_emb"),
        V.l2_norm(F.col(vec_col)).alias("q_nrm"),
        V.hyperplane_sketch(F.col(vec_col), planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        V.double_array(F.col(vec_col)).alias("emb"),
        V.l2_norm(F.col(vec_col)).alias("nrm"),
        V.hyperplane_sketch(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), ["bucket"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .withColumn(
            "score",
            F.round(
                V.dot_double(F.col("q_emb"), F.col("emb"))
                / (F.col("q_nrm") * F.col("nrm")),
                6,
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "bucket", "vec_id", "score", "rn")
    )


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> None:
    """Persist the IVF index: inverted lists as cid-partitioned parquet.

    The build-once/query-many shape of production ANN at scale: the
    expensive pass (assignment of every corpus vector to its nearest
    centroid) is written out partitioned by centroid id, so every later
    query batch reads ONLY the ~nprobe/n_centroids fraction of the index
    it probes — directory-level partition pruning, visible as
    PartitionFilters in the scan (tests/test_approx.py pins it). The
    centroid table (KBs) is stored alongside the lists.
    """
    from ..operators.dedup import materialize

    cent = materialize(
        _centroid_table(corpus, n_centroids, id_col, vec_col, centroids)
    )
    side = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("emb"),
        V.l2_norm(F.col(vec_col)).alias("nrm"),
    )
    assigned = _assign(side, F.broadcast(cent))
    assigned.write.mode("overwrite").partitionBy("cid").parquet(f"{path}/lists")
    cent.write.mode("overwrite").parquet(f"{path}/centroids")


def query_ivf_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k over a persisted IVF index, reading only the probed lists.

    Probe ranking replicates :func:`ivf_topk` exactly (round-6 cosine,
    cid tiebreak), so results are identical to the in-memory operator on
    the same corpus/quantizer. The probed centroid ids (a bounded,
    <= n_centroids-element set) are collected driver-side to build the
    ``cid IN (...)`` scan filter — that collect is the partition-pruning
    mechanism, not a data-path smell: it moves KBs so the scan skips
    (n_centroids - |probes|)/n_centroids of the index on disk.
    """
    cent = F.broadcast(spark.read.parquet(f"{path}/centroids"))
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_emb"),
        V.l2_norm(F.col(vec_col)).alias("q_nrm"),
    )
    probes = (
        q.join(cent, F.lit(True))
        .withColumn(
            "csim",
            F.round(
                V.dot(F.col("q_emb"), F.col("cemb"))
                / (F.col("q_nrm") * F.col("cnrm")),
                6,
            ),
        )
        .withColumn(
            "crn",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(F.desc("csim"), F.asc("cid"))
            ),
        )
        .filter(F.col("crn") <= nprobe)
        .select("q_id", "q_emb", "q_nrm", "cid")
    )
    probe_cids = [r.cid for r in probes.select("cid").distinct().collect()]
    lists = spark.read.parquet(f"{path}/lists").filter(
        F.col("cid").isin(probe_cids)
    )
    scored = (
        probes.join(lists.withColumnRenamed("cid", "cid_l"),
                    F.col("cid") == F.col("cid_l"))
        .drop("cid_l")
        .filter(F.col("vec_id") != F.col("q_id"))
        .withColumn(
            "score",
            F.round(
                V.dot(F.col("q_emb"), F.col("emb"))
                / (F.col("q_nrm") * F.col("nrm")),
                6,
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "cid", "vec_id", "score", "rn")
    )


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.5,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication over an embedding column.

    Cluster the corpus with the coarse quantizer (argmax-cosine against
    broadcast centroids — the IVF assignment pass), then within each
    cluster mark a vector as a duplicate when a lower-id vector in the
    same cluster has cosine >= threshold (min-id canonical-representative
    election, the same B6 id-stability rule as exact dedup). Keeping only
    ``is_dup = 0`` rows is the SemDeDup pruning pass ("Semantic
    deduplication removes ~50% of web data with minimal quality loss",
    Abbas et al. 2023 — public arXiv:2303.09540).

    Plan shape at 100 TB: assignment is a map-side broadcast pass (no
    corpus shuffle); the quadratic cosine work is confined within
    clusters — one shuffle keyed on ``cid``, candidate volume
    sum(|cluster|²) instead of |corpus|². More centroids → smaller
    clusters → less pair work but lower recall, the SemDeDup knob. The
    cluster self-join mirrors cosine_dup_pairs' bucket self-join; the
    deterministic sampled quantizer keeps it oracle-replayable (pass
    ``centroids=kmeans_centroids(...)`` for the production quantizer).

    Returns (vec_id, cid, is_dup) — is_dup as 0/1 BIGINT.
    """
    from ..operators.dedup import materialize

    cent = F.broadcast(
        materialize(
            _centroid_table(corpus, n_centroids, id_col, vec_col, centroids)
        )
    )
    side = materialize(
        corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("emb"),
            V.l2_norm(F.col(vec_col)).alias("nrm"),
        )
    )
    assigned = materialize(_assign(side, cent))
    # the cluster self-join shuffles both projections by cid, so the
    # arrays stay float-narrow through the exchange and the widening is
    # fused into the pair fold (r12, V.dot_cast — the knn_graph trade)
    a = assigned.select(
        F.col("vec_id").alias("id_a"),
        F.col("emb").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
        "cid",
    )
    b = assigned.select(
        F.col("vec_id").alias("id_b"),
        F.col("emb").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
        "cid",
    )
    score_e6 = F.floor(
        V.dot_cast(F.col("emb_a"), F.col("emb_b"))
        / (F.col("nrm_a") * F.col("nrm_b"))
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("long")
    dups = (
        a.join(b, ["cid"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("score_e6", score_e6)
        .filter(F.col("score_e6") >= int(threshold * 1e6))
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    return (
        assigned.select("vec_id", "cid")
        .join(dups.withColumn("is_dup", F.lit(1)), "vec_id", "left")
        .select(
            "vec_id",
            "cid",
            F.coalesce(F.col("is_dup"), F.lit(0)).cast("long").alias("is_dup"),
        )
    )


def int8_quantize(
    corpus: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 quantization of an embedding column —
    the memory-bandwidth move of a production ANN index: ~4x smaller
    than float32, integer dot products downstream.

    q_i = floor(x_i * 127 / max|x| + 0.5), the zero vector quantizing to
    zeros. Every arithmetic step is an identical IEEE op chain on
    float32-exact doubles in Spark and DuckDB, so the quantized integers
    — and everything computed from them — match bit-for-bit across
    engines. Output: (id, qvec array<long>, maxabs double).
    """
    xd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    maxabs = F.array_max(F.transform(xd, lambda x: F.abs(x)))
    out = corpus.select(
        F.col(id_col).alias("id"), xd.alias("_xd"), maxabs.alias("maxabs")
    )
    q = F.when(
        F.col("maxabs") > 0,
        F.transform(
            F.col("_xd"),
            lambda x: F.floor(
                x * F.lit(127.0) / F.col("maxabs") + F.lit(0.5)
            ).cast("long"),
        ),
    ).otherwise(F.transform(F.col("_xd"), lambda x: F.lit(0).cast("long")))
    return out.select("id", q.alias("qvec"), "maxabs")


def int8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k nearest neighbors over the int8-quantized index by the
    EXACT INTEGER dot of the per-vector max-normalized codes — output
    (q_id, vec_id, qdot, rn).

    Metric, stated precisely: quantization divides each vector by its
    own max|x|, so qdot ≈ 127² · dot(x_q/‖x_q‖∞, x_c/‖x_c‖∞) — the dot
    of L∞-NORMALIZED vectors, a scale-invariant ranking (per-corpus-
    vector magnitude cancels) that tracks cosine, NOT the raw
    unnormalized dot (a corpus vector's maxabs rescales its score; two
    vectors with equal direction-codes tie regardless of magnitude).
    That is the deliberate trade for keeping the ranking key an exact
    BIGINT end to end — no float enters, so reducer accumulation order,
    SIMD regrouping, cluster topology can never reorder results between
    runs (a float cosine's last-ulp ties can and do). How faithfully
    the metric recovers the float-cosine neighborhood is MEASURED, not
    assumed: tests/test_approx.py (recall@10) and the ann_recall_at_k
    registry entry. Same plan shape as brute_force_topk: the (tiny)
    quantized query set broadcasts against the quantized corpus — zero
    shuffles except the per-query top-k; at scale the same quantized
    relation feeds the IVF/LSH blockers.
    """
    qz = int8_quantize(queries, id_col, vec_col).select(
        F.col("id").alias("q_id"), F.col("qvec").alias("q_q")
    )
    cz = int8_quantize(corpus, id_col, vec_col).select(
        F.col("id").alias("vec_id"), F.col("qvec").alias("c_q")
    )
    dot = F.aggregate(
        F.zip_with(F.col("q_q"), F.col("c_q"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = cz.join(F.broadcast(qz), F.col("vec_id") != F.col("q_id")).select(
        "q_id", "vec_id", dot.alias("qdot")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("qdot"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "vec_id", "qdot", "rn")
    )


def knn_graph(
    corpus: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Bulk k-nearest-neighbor GRAPH over the whole corpus, IVF-blocked:
    every vector is assigned map-side to its nearest centroid (the
    deterministic sampled quantizer unless a trained one is passed —
    the ivf_topk machinery), then each cell computes its EXACT pairwise
    cosine top-k locally. This is the all-vectors sibling of ivf_topk's
    query-time search and the precursor both SemDeDup (cluster, then
    dedup within cluster) and kNN-based clustering/agreement checks
    consume — the blocked construction is the standard answer to the
    O(n²) all-pairs wall.

    Approximation contract (same as SemDeDup): neighbors are found
    WITHIN the own cell only; a vector's true neighbor sitting across
    a centroid boundary is missed. The oracle replays the identical
    assignment + per-cell top-k, so the green row proves the blocked
    computation against its own definition; recall vs the unblocked
    graph is a measured property (tests), not a parity claim.

    Scale: the assignment is a map-side broadcast scan (no corpus
    shuffle); the self-join shuffles the corpus ONCE keyed by cell.
    Size ``n_centroids`` ~ sqrt(N) so cells stay ~sqrt(N)-sized and
    the per-cell quadratic work totals ~N^1.5 bounded per task; a hot
    cell is AQE's skew-join case and the signal to retrain/split the
    quantizer (list balance via assign_to_centroids). Ties break on
    (score DESC, neighbor id ASC); output (vec_id, nbr_id, score, rn),
    rn <= k.
    """
    from .dedup import materialize

    cent = F.broadcast(
        _centroid_table(corpus, n_centroids, id_col, vec_col, centroids)
    )
    side = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("emb"),
        V.l2_norm(F.col(vec_col)).alias("nrm"),
    )
    assigned = materialize(_assign(side, cent))
    # the cell join shuffles BOTH projections by cid (sort-merge at
    # scale), so the arrays stay float-narrow through the exchange and
    # the float->double widening is fused into the pair fold (r12,
    # V.dot_cast — one lambda layer per pair instead of three, half
    # the exchange bytes of a pre-widened projection).
    a = assigned.select(
        F.col("cid"),
        F.col("vec_id"),
        F.col("emb").alias("a_emb"),
        F.col("nrm").alias("a_nrm"),
    )
    b = assigned.select(
        F.col("cid"),
        F.col("vec_id").alias("nbr_id"),
        F.col("emb").alias("b_emb"),
        F.col("nrm").alias("b_nrm"),
    )
    pairs = a.join(b, "cid").filter(F.col("vec_id") != F.col("nbr_id"))
    scored = pairs.withColumn(
        "score",
        F.round(
            V.dot_cast(F.col("a_emb"), F.col("b_emb"))
            / (F.col("a_nrm") * F.col("b_nrm")),
            6,
        ),
    )
    # Window by (cid, vec_id), not vec_id alone (r11, guide §2.4):
    # the argmin assignment puts each vec_id in exactly ONE cell, so
    # the grouping is identical — but the cell join's hash(cid) output
    # partitioning already satisfies the (cid, vec_id) clustering, and
    # the top-k needs only a local sort instead of re-shuffling the
    # full scored pair explosion by vec_id (the largest exchange in
    # the plan at scale; under a broadcast cell join the partitioning
    # is unknown either way and the exchange cost is unchanged).
    w = Window.partitionBy("cid", "vec_id").orderBy(
        F.desc("score"), F.asc("nbr_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= int(k))
        .select("vec_id", "nbr_id", "score", F.col("rn").cast("long").alias("rn"))
    )


def embedding_drift(
    df: DataFrame,
    slice_col: str,
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Slice-wise embedding-distribution drift — the vector analog of
    ``profiling.tvd_drift``'s categorical check: per slice (a source,
    a time bucket, a label), how far has the slice's CENTROID moved
    from the global centroid? The embedding-pipeline health question
    behind re-embedding decisions and source-mix audits: a slice whose
    centroid points away from the corpus (low cosine) or sits far from
    it (high shift) is distributionally distinct.

    Per slice: ``n_vecs``, ``cos_to_global_e6`` (cosine between the
    slice centroid and the global centroid, e6 fixed-point; NULL when
    either centroid is the zero vector), and ``shift_d2`` (exact BIGINT
    squared L2 distance between the two centroids, in quantized-
    coordinate units). Centroids are truncating integer means of
    once-quantized coordinates (the kmeans_lloyd discipline), so both
    engines derive identical integer centroids; the cosine is one
    IEEE-deterministic double expression over exact BIGINTs (the
    norm product exceeds BIGINT range, so it is computed as
    ``sqrt(double(na2) * double(nb2))`` — both factors < 2^53, every
    step identically rounded in identical order in the SQL twin).

    Scale shape: one map-side quantize+explode, ONE (slice, dim)-keyed
    map-side-combined sum (output rows = slices x dims, tiny), the
    global centroid re-aggregated from per-slice sums (dims rows) and
    broadcast back, one slice-keyed sum over dim-bounded groups. The
    corpus is scanned once and never joins anything corpus-sized.
    Rows with a NULL slice or NULL vector are excluded up front (the
    sketch-family discipline). Ragged vectors are the caller's schema
    bug: n_vecs reports the MAX per-dim observation count.
    """
    # inline quantize with the slice column carried through the
    # explode — rejoining quantize_points' (id, dim, q) output back to
    # the slice would cost a corpus-sized id-keyed join for nothing
    pts = (
        df.filter(
            F.col(slice_col).isNotNull() & F.col(vec_col).isNotNull()
        )
        .select(
            F.col(slice_col).alias("_sl"),
            F.posexplode(F.col(vec_col)).alias("dim", "_x"),
        )
        .select(
            "_sl",
            F.col("dim").cast("long").alias("dim"),
            F.floor(
                F.col("_x").cast("double") * F.lit(float(scale)) + F.lit(0.5)
            )
            .cast("long")
            .alias("q"),
        )
    )
    persl = pts.groupBy("_sl", "dim").agg(
        F.sum("q").alias("_sq"), F.count("*").cast("long").alias("_n")
    )
    sc = persl.select(
        "_sl", "dim", F.expr("_sq div _n").alias("_c"), "_n"
    )
    gc = (
        persl.groupBy("dim")
        .agg(F.expr("sum(_sq) div sum(_n)").alias("_g"))
    )
    j = sc.join(F.broadcast(gc), "dim")
    agg = j.groupBy("_sl").agg(
        F.max("_n").alias("n_vecs"),
        F.sum(F.col("_c") * F.col("_g")).alias("_dot"),
        F.sum(F.col("_c") * F.col("_c")).alias("_na2"),
        F.sum(F.col("_g") * F.col("_g")).alias("_nb2"),
        F.sum(
            (F.col("_c") - F.col("_g")) * (F.col("_c") - F.col("_g"))
        ).alias("shift_d2"),
    )
    cos = F.when(
        (F.col("_na2") > 0) & (F.col("_nb2") > 0),
        F.floor(
            F.col("_dot").cast("double")
            / F.sqrt(F.col("_na2").cast("double") * F.col("_nb2").cast("double"))
            * F.lit(1_000_000.0)
            + F.lit(0.5)
        ).cast("long"),
    )
    return agg.select(
        F.col("_sl").alias(slice_col),
        "n_vecs",
        cos.alias("cos_to_global_e6"),
        F.col("shift_d2").cast("long").alias("shift_d2"),
    )


def hard_negatives(
    corpus: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: the pairs that
    are NEAR in embedding space but carry DIFFERENT labels — exactly
    the negatives a contrastive/metric-learning objective learns most
    from (easy negatives are already far; these are the boundary
    cases). Built as :func:`knn_graph` (IVF-blocked exact per-cell
    top-k) filtered to label disagreement.

    Returns (vec_id, label, nbr_id, nbr_label, score, rn) for every
    graph edge whose endpoint labels differ. ``rn`` is the neighbor's
    rank in the FULL kNN graph, so gaps in rn per vec_id are
    themselves a signal: rank-1 hard negatives sit closer than any
    same-label neighbor (likely label noise — the knn_label_vote
    complement), rank-5 ones are ordinary boundary pairs.

    Scale: inherits knn_graph's ONE cell-keyed corpus shuffle; the two
    label attachments are plain id-keyed hash joins of the k·N-row
    graph against the N-row label relation (uniform keys, no skew).
    Rows with a NULL label are excluded up front — an unlabeled vector
    can be neither a positive nor a negative.
    """
    labeled = corpus.filter(F.col(label_col).isNotNull())
    g = knn_graph(
        labeled, k=k, n_centroids=n_centroids,
        id_col=id_col, vec_col=vec_col,
    )
    lab = labeled.select(
        F.col(id_col).cast("long").alias("_lid"),
        F.col(label_col).alias("_lbl"),
    )
    return (
        g.join(
            lab.select(
                F.col("_lid").alias("vec_id"), F.col("_lbl").alias("label")
            ),
            "vec_id",
        )
        .join(
            lab.select(
                F.col("_lid").alias("nbr_id"),
                F.col("_lbl").alias("nbr_label"),
            ),
            "nbr_id",
        )
        .filter(F.col("label") != F.col("nbr_label"))
        .select("vec_id", "label", "nbr_id", "nbr_label", "score", "rn")
    )


def rbo_overlap(
    a: DataFrame,
    b: DataFrame,
    k: int = 10,
    p: float = 0.9,
    q_col: str = "q_id",
    item_col: str = "vec_id",
    rank_col: str = "rn",
) -> DataFrame:
    """Truncated rank-biased overlap (Webber et al. 2010) between two
    rankings per query — THE ranking-agreement measure for indefinite
    lists: recall@k (ann_recall_at_k) only checks set membership at
    depth k, while RBO weights agreement at depth d by ``p^(d-1)``,
    so two indexes with identical recall@10 but different head order
    score differently — exactly what a reranker/index rollout gate
    needs. ``RBO_k = (1-p) * sum_{d=1..k} p^(d-1) * |A_d ∩ B_d| / d``
    with ``A_d`` the depth-d prefix (the truncated/min form: no
    extrapolation residual — a GATE compares like against like, and
    the truncation is the same for every candidate).

    Cross-engine determinism: the overlap counts are integers from
    prefix intersections, and the float part is an EXPLICIT
    left-associated chain built at plan time — ``p`` powers by
    repeated multiplication and the depth terms summed in ascending-d
    order, each step one IEEE multiply/add that DuckDB replays in the
    identical sequence (the order-pinned-fold discipline of
    mixture_concentration, unrolled because k is a plan constant).
    ``rbo_e6 = floor(rbo * 1e6 + 0.5)``.

    Scale: rankings are k-bounded per query by construction, so the
    groupBy collects k-element arrays (never corpus-sized state), the
    join is query-keyed, and the prefix intersections are O(k^2)
    column arithmetic per row with k a small plan constant. Returns
    (q_col, n_a, n_b, rbo_e6) for queries present in BOTH rankings.
    """
    if not 0.0 < p < 1.0:
        raise ValueError(f"rbo_overlap needs 0 < p < 1, got {p}")
    if int(k) < 1:
        raise ValueError(f"rbo_overlap needs k >= 1, got {k}")

    def ranked_items(df: DataFrame, out: str) -> DataFrame:
        return (
            df.select(
                F.col(q_col).alias("_q"),
                F.struct(
                    F.col(rank_col).alias("r"), F.col(item_col).alias("i")
                ).alias("_s"),
            )
            .groupBy("_q")
            .agg(
                F.slice(
                    F.transform(
                        F.array_sort(F.collect_list("_s")),
                        lambda s: s["i"],
                    ),
                    1,
                    int(k),
                ).alias(out)
            )
        )

    joined = ranked_items(a, "_a").join(ranked_items(b, "_b"), "_q")
    acc = None
    pw = 1.0
    for d in range(1, int(k) + 1):
        ov = F.size(
            F.array_intersect(
                F.slice("_a", 1, d), F.slice("_b", 1, d)
            )
        ).cast("double")
        term = F.lit(pw) * ov / F.lit(float(d))
        acc = term if acc is None else acc + term
        pw = pw * p
    rbo = F.lit(1.0 - p) * acc
    return joined.select(
        F.col("_q").alias(q_col),
        F.size("_a").cast("long").alias("n_a"),
        F.size("_b").cast("long").alias("n_b"),
        F.floor(rbo * F.lit(1e6) + F.lit(0.5)).cast("long").alias("rbo_e6"),
    )
