"""Trajectory similarity over shape polylines (SURVEY §7 Phase 5).

Top-k similar shapes via discrete Hausdorff distance — the
trajectory-similarity extension over the C13 aggregated polylines
(cf. PAPERS.md: REPOSE ICDE 2021 / top-k trajectory similarity EDBT 2020;
this is the exact-scoring core those systems accelerate with pruning).

Plan shape: polylines aggregate once (C13), pairs come from a candidate
generator — by default a coarse spatial blocker (rounded centroid cell,
so only nearby shapes pair up; the 100 TB guard against the all-pairs
cross join) — and the Hausdorff kernel is an Arrow-batched pandas UDF
over the point arrays (per-pair imperative geometry, the documented slow
path used only after blocking).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


@pandas_udf(DoubleType())
def _hausdorff(
    lat_a: pd.Series, lon_a: pd.Series, lat_b: pd.Series, lon_b: pd.Series
) -> pd.Series:
    """Symmetric discrete Hausdorff distance (degrees) between polylines.

    RAW coordinate-space Euclidean per point pair — no geodesic math and
    no longitude wrap: a pair straddling ±180 scores ~360° apart even
    though geographically adjacent (the blocker pairs them; rank their
    distance with a seam-aware kernel if near-seam similarity matters).
    """
    import numpy as np

    out = []
    for la, oa, lb, ob in zip(lat_a, lon_a, lat_b, lon_b):
        A = np.column_stack([np.asarray(la), np.asarray(oa)])
        B = np.column_stack([np.asarray(lb), np.asarray(ob)])
        # pairwise distance matrix |A| x |B| (polylines are short after
        # B7 simplification; the blocker bounds how many pairs exist)
        d = np.sqrt(((A[:, None, :] - B[None, :, :]) ** 2).sum(-1))
        out.append(float(max(d.min(axis=1).max(), d.min(axis=0).max())))
    return pd.Series(out)


def _polylines(tables: dict[str, DataFrame]) -> DataFrame:
    from .derivations import shapes_aggregated

    agg = shapes_aggregated(tables)
    return agg.select(
        "shape_id",
        F.transform("points", lambda p: p["lat"]).alias("lat"),
        F.transform("points", lambda p: p["lon"]).alias("lon"),
        F.aggregate("points", F.lit(0.0), lambda a, p: a + p["lat"])
        .alias("__lat_sum"),
        F.aggregate("points", F.lit(0.0), lambda a, p: a + p["lon"])
        .alias("__lon_sum"),
        F.size("points").alias("__n"),
    ).select(
        "shape_id",
        "lat",
        "lon",
        (F.col("__lat_sum") / F.col("__n")).alias("c_lat"),
        (F.col("__lon_sum") / F.col("__n")).alias("c_lon"),
    )


def similar_shapes_topk(
    tables: dict[str, DataFrame],
    k: int = 3,
    cell_deg: float = 0.5,
) -> DataFrame:
    """Top-k most similar shapes per shape (smallest Hausdorff distance).

    Candidates are blocked by centroid cell (shapes whose centroids fall
    in the same ``cell_deg`` grid cell, all 9 neighbor cells probed via
    the 3×3 offset explode) — equi-join on cell ids, never a full cross
    join. The longitude cell axis is normalized onto the antimeridian
    wrap ring (spatial._wrap_x — the r6 radius_pairs lesson): centroids
    at lon +179.9 and -179.9 are neighbors, so near-seam Fiji/Chatham
    shapes pair up. KNOWN LIMIT: a shape whose polyline CROSSES ±180
    averages its raw longitudes to a meaningless mid-Pacific-antipode
    centroid and blocks into the wrong cell — centroid blocking is a
    recall heuristic there; split such shapes at the seam upstream if
    they matter. Output: shape_id, other_shape_id, hausdorff_deg, rn.
    """
    from .dedup import materialize
    from .spatial import _lon_cells, _wrap_x

    _, n_ring = _lon_cells(cell_deg)
    if n_ring < 3:
        raise ValueError(
            f"cell_deg={cell_deg} leaves only {n_ring} longitude cells;"
            " the 3x3 probe needs >= 3 on the wrap ring"
        )
    pl = materialize(_polylines(tables))
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    # side a probes its own + 8 neighbor cells; side b sits in its cell
    a = (
        pl.withColumn("o", F.explode(offsets))
        .select(
            F.col("shape_id").alias("id_a"),
            F.col("lat").alias("lat_a"),
            F.col("lon").alias("lon_a"),
            (F.floor(F.col("c_lat") / cell_deg) + F.col("o.dx")).alias("cx"),
            _wrap_x(
                F.floor(F.col("c_lon") / cell_deg).cast("long") + F.col("o.dy"),
                cell_deg,
            ).cast("long").alias("cy"),
        )
    )
    b = pl.select(
        F.col("shape_id").alias("id_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        F.floor(F.col("c_lat") / cell_deg).alias("cx"),
        _wrap_x(
            F.floor(F.col("c_lon") / cell_deg).cast("long"), cell_deg
        ).cast("long").alias("cy"),
    )
    pairs = a.join(b, ["cx", "cy"]).filter(F.col("id_a") != F.col("id_b"))
    scored = pairs.withColumn(
        "hausdorff_deg",
        _hausdorff("lat_a", "lon_a", "lat_b", "lon_b"),
    )
    w = Window.partitionBy("id_a").orderBy(F.asc("hausdorff_deg"), F.asc("id_b"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            F.col("id_a").alias("shape_id"),
            F.col("id_b").alias("other_shape_id"),
            "hausdorff_deg",
            "rn",
        )
    )
