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
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_emb")
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("emb"))
    scored = (
        c.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
        .withColumn("score", F.round(V.cosine(F.col("q_emb"), F.col("emb")), 6))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "vec_id", "score", "rn")
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
        F.col(vec_col).alias("q_emb"),
        V.hyperplane_sketch(F.col(vec_col), planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("emb"),
        V.hyperplane_sketch(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), ["bucket"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .withColumn("score", F.round(V.cosine(F.col("q_emb"), F.col("emb")), 6))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "bucket", "vec_id", "score", "rn")
    )
