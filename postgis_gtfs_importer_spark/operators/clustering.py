"""Lloyd k-means training loop — the sixth iterative family.

The ANN family (operators/similarity.py) ships an IVF index whose
quantizer SAMPLES centroids deterministically but never iterates
(``ivf_topk``'s coarse quantizer); this module adds the actual
training loop: synchronous Lloyd iterations (assign every point to its
nearest centroid, recompute each centroid as its cluster mean), the
k-means step every embedding-curation pipeline runs before IVF/PQ
indexing, SemDeDup-style cluster pruning, or diversity balancing.

Exactness discipline (the pagerank/hits/sssp/kcore/eigenvector
pattern): coordinates quantize once to BIGINTs, squared distances are
exact integer sums, the argmin tiebreaks on the smallest centroid id,
and the centroid update is the truncating integer mean (``sum div
count`` — Spark's ``div`` and DuckDB's ``//`` both truncate toward
zero), so every iteration is bit-replayable by an unrolled-CTE SQL
oracle on any engine. No RNG anywhere: the seed centroids are the k
smallest point ids.

Scale shape per iteration (the only shapes Lloyd admits):
  * assignment — points ⋈ broadcast(centroids) on the dimension key
    (centroids are k·dim rows, broadcast ALWAYS; a shuffled join here
    would hash-partition the corpus on a 64-value key — maximal skew),
    then one map-side-combinable sum to (id, cid) and an id-keyed
    argmin that reuses the points' id partitioning;
  * update — assignment joined back to points on id (broadcastable
    while |assignment| fits, flag-gated like pagerank's
    ``broadcast_state``), then a (cid, dim)-keyed mean whose partial
    aggregate collapses each task to k·dim rows before the shuffle.
Centroids are k·dim rows — eagerly localCheckpoint'ed each round so
the lineage stays one-iteration deep (the pagerank lesson: a lazy
checkpoint truncates nothing).

Reference analog: the reference has no ML surface (it is an ETL
pipeline, /root/reference/import.sh); this family belongs to the
mandated LLM-data-pipeline surface next to similarity.py's IVF/LSH
(whose quantizer it trains).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed-point scale for coordinate quantization: 1e6 keeps unit-norm
#: embedding coordinates to ~6 significant digits while squared
#: distances stay far inside BIGINT (64 dims · (2·1e6)² ≈ 2.6e14).
COORD_SCALE = 1_000_000


def quantize_points(
    df: DataFrame, id_col: str, vec_col: str, scale: int = COORD_SCALE
) -> DataFrame:
    """Explode (id, vector) rows to exact-integer (id, dim, q) triples.

    ``floor(x * scale + 0.5)`` on the double-widened coordinate — the
    registry's fixed_point discipline — evaluates identically in every
    IEEE engine, so the quantized points are THE shared ground truth
    both the Spark loop and the SQL oracle iterate on. NULL vectors are
    excluded up front (no observation, the sketch-family policy).
    """
    return (
        df.filter(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col).cast("long").alias("id"),
            F.posexplode(F.col(vec_col)).alias("dim", "_x"),
        )
        .select(
            "id",
            F.col("dim").cast("long").alias("dim"),
            F.floor(F.col("_x").cast("double") * F.lit(float(scale)) + F.lit(0.5))
            .cast("long")
            .alias("q"),
        )
    )


def kmeans_lloyd(
    points: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iterations: int = 3,
    scale: int = COORD_SCALE,
    broadcast_state: bool = True,
) -> DataFrame:
    """Exact-integer Lloyd k-means: ``iterations`` synchronous rounds
    from the k smallest-id points as seeds.

    Returns the trained codebook as (cid, dim, c_q, n_members) rows —
    k·dim rows, ``c_q`` the quantized centroid coordinate after the
    final update and ``n_members`` the size of the assignment that
    produced it. A centroid that loses every member simply disappears
    from that round's update (both engines drop empty groups — the
    deterministic twin of the usual re-seed heuristic, documented
    rather than hidden).

    Vectors are assumed fixed-dimension (the embeddings-table
    contract); a ragged vector is not rejected — its missing
    dimensions simply contribute no distance terms and no update
    observations, which skews its assignment — so enforce the schema
    upstream if ragged data is possible. NULL vectors are excluded
    (no observation); an empty input returns an empty codebook.

    ``broadcast_state=True`` broadcasts the |V|-sized assignment into
    the update join (right while points ≫ assignment rows per
    executor, i.e. dim ≫ 1); set it False to fall back to a sort-merge
    join on the id-prepartitioned points. Centroids are ALWAYS
    broadcast — see the module docstring.

    The driver collects exactly k seed ids via TakeOrdered (a k-row
    probe, the pagerank-convergence class of collect) — never the data.
    """
    if k < 1:
        raise ValueError(f"kmeans_lloyd requires k >= 1, got {k}")
    if iterations < 1:
        raise ValueError(
            f"kmeans_lloyd requires iterations >= 1, got {iterations}"
        )
    # broadcast-state path (default): EAGER localCheckpoint, no
    # repartition — the id-keyed repartition only buys co-location for
    # the sort-merge fallback, and a persist() keeps the full
    # quantize/explode subtree in every iteration's analysis pass (the
    # graph._pin planning-cost lesson: per-round PLANNING dominates
    # iterative wall time; sssp measured 7.2 -> 4.4 s from the same
    # change). The non-broadcast path keeps repartition+persist so
    # InMemoryRelation preserves the id partitioning for the SMJ.
    pts = quantize_points(points, id_col, vec_col, scale)
    if broadcast_state:
        pts = pts.localCheckpoint(eager=True)
    else:
        pts = pts.repartition("id").persist()
    try:
        hint = F.broadcast if broadcast_state else (lambda df: df)
        seed_ids = [
            r.id
            for r in pts.select("id").distinct().orderBy("id").limit(k).collect()
        ]
        seeds = points.sparkSession.createDataFrame(
            [(int(v), i) for i, v in enumerate(seed_ids)], "id long, cid long"
        )
        cent = (
            pts.join(F.broadcast(seeds), "id")
            .select("cid", "dim", F.col("q").alias("c"))
            .localCheckpoint(eager=True)
        )
        assign = None
        for _ in range(int(iterations)):
            d2 = (
                pts.join(F.broadcast(cent), "dim")
                .groupBy("id", "cid")
                .agg(
                    F.sum((F.col("q") - F.col("c")) * (F.col("q") - F.col("c")))
                    .alias("d2")
                )
            )
            assign = d2.groupBy("id").agg(
                F.min(F.struct("d2", "cid")).getField("cid").alias("cid")
            )
            cent = (
                pts.join(hint(assign), "id")
                .groupBy("cid", "dim")
                .agg(F.expr("sum(q) div count(*)").cast("long").alias("c"))
                .localCheckpoint(eager=True)
            )
        sizes = assign.groupBy("cid").agg(
            F.count("*").cast("long").alias("n_members")
        )
        return (
            cent.join(F.broadcast(sizes), "cid")
            .select(
                F.col("cid").cast("long").alias("cid"),
                F.col("dim").cast("long").alias("dim"),
                F.col("c").alias("c_q"),
                "n_members",
            )
        )
    finally:
        if not broadcast_state:
            pts.unpersist()


def kmeans_inertia(
    points: DataFrame,
    codebook: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = COORD_SCALE,
) -> DataFrame:
    """Total within-cluster squared distance of ``points`` against a
    trained (cid, dim, c_q, …) codebook — the k-means objective, as a
    1-row (n_points, inertia) frame for convergence/elbow tracking.

    Same assignment shape as the training loop (broadcast codebook,
    exact integers), no state: usable to score a HELD-OUT split against
    a codebook trained elsewhere.
    """
    pts = quantize_points(points, id_col, vec_col, scale)
    d2 = (
        pts.join(F.broadcast(codebook.select("cid", "dim", F.col("c_q").alias("c"))), "dim")
        .groupBy("id", "cid")
        .agg(
            F.sum((F.col("q") - F.col("c")) * (F.col("q") - F.col("c"))).alias("d2")
        )
    )
    best = d2.groupBy("id").agg(F.min("d2").alias("d2"))
    return best.agg(
        F.count("*").cast("long").alias("n_points"),
        F.sum("d2").cast("long").alias("inertia"),
    )


def simplified_silhouette(
    points: DataFrame,
    codebook: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = COORD_SCALE,
) -> DataFrame:
    """Per-cluster simplified silhouette (Hruschka et al. 2004) against
    a trained codebook — the cluster-QUALITY companion of
    :func:`kmeans_inertia`'s objective value: for each point,
    ``a`` = squared distance to its own (nearest) centroid, ``b`` = to
    the second-nearest, ``s = (b - a) / max(a, b)`` in [0, 1] — high
    mean s = tight, well-separated cluster; near 0 = boundary mush.
    The centroid-based simplification is the published variant that
    SCALES: the full silhouette needs all pairwise point distances
    (quadratic); this needs one broadcast-codebook pass, exactly the
    assignment plan.

    Distances are the exact-integer quantized d² of the training loop
    (same argmin, same cid tiebreak, so "own centroid" here IS the
    training assignment); the ratio is e6 fixed-point via one
    IEEE-deterministic double division of two exact BIGINTs (identical
    operand order in the SQL twin), and per-cluster means are
    truncating integer divisions of exact sums. A point equidistant at
    0 from two centroids scores 0 (max(a,b)=0 guard).

    Scale shape: points ⋈ broadcast(codebook) on the dim key (never
    shuffled — the kmeans rule), one map-side-combined (id, cid)
    distance sum, one id-keyed aggregate whose per-id collect is
    bounded by k (the two smallest (d², cid) structs are sliced from a
    k-length sorted array), one k-bounded cid aggregate. Requires >= 2
    centroids — with one, ``b`` does not exist and the result is empty
    (documented, not a fake score).

    Returns (cid, n_points, silhouette_e6), one row per non-empty
    cluster.
    """
    pts = quantize_points(points, id_col, vec_col, scale)
    d2 = (
        pts.join(
            F.broadcast(
                codebook.select("cid", "dim", F.col("c_q").alias("_c"))
            ),
            "dim",
        )
        .groupBy("id", "cid")
        .agg(
            F.sum(
                (F.col("q") - F.col("_c")) * (F.col("q") - F.col("_c"))
            ).alias("_d2")
        )
    )
    two = d2.groupBy("id").agg(
        F.slice(
            F.array_sort(F.collect_list(F.struct("_d2", "cid"))), 1, 2
        ).alias("_t")
    )
    per = two.filter(F.size("_t") == 2).select(
        "id",
        F.col("_t")[0]["cid"].alias("cid"),
        F.col("_t")[0]["_d2"].alias("_a2"),
        F.col("_t")[1]["_d2"].alias("_b2"),
    )
    g = F.greatest(F.col("_a2"), F.col("_b2"))
    s = (
        F.when(
            g > 0,
            F.floor(
                (F.col("_b2") - F.col("_a2")).cast("double")
                / g.cast("double")
                * F.lit(1_000_000.0)
                + F.lit(0.5)
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
    )
    return (
        per.withColumn("_s", s)
        .groupBy("cid")
        .agg(
            F.count("*").cast("long").alias("n_points"),
            F.expr("sum(_s) div count(*)").alias("silhouette_e6"),
        )
    )
