"""Spatial operators — the PostGIS surface of the reference, Spark-first.

The reference's snapshot schema is PostGIS: stops carry a point geometry
with a GIST index (gtfs-via-postgres DDL, invoked at
/root/reference/import.sh:119-124), and the canonical consumer queries
are proximity lookups (nearest stops to a point, stops near stops,
route-shape lengths). PostGIS answers them with an R-tree; a 1000-executor
cluster answers them with *grid-cell blocking*: assign every point to a
``cell_deg``-sized lat/lon cell, then turn every proximity predicate into
an equi-join on cell ids — the only join shape that scales (a distance
theta-join is a BroadcastNestedLoopJoin at any size).

Exactness contract (not approximate): for a radius-``r`` predicate the
blocking is EXACT whenever one cell covers ``r`` in both axes at every
latitude of the data, i.e.::

    cell_deg >= r / 111_320 / cos(radians(max_abs_lat))

because then two points within ``r`` are never more than one cell apart
and the 3x3 neighborhood probe finds every qualifying pair. Callers pass
``cell_deg``; helpers raise if the contract is violated for the stated
``max_abs_lat``.

Determinism contract (shared with plans/queries.py): every distance is
quantized to integer meters (``floor(x + 0.5)``) BEFORE any filter,
ordering or sum. Cross-engine libm drift in sin/cos/asin is ~1e-16
relative (~1e-9 m at continental scale), so meter-quantized values are
bit-identical between Spark and DuckDB; sums aggregate the quantized
integers (millimeters for shape segments), never raw doubles, so
aggregation order cannot perturb the result.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: IUGG mean earth radius; same constant in the DuckDB oracle twins.
EARTH_RADIUS_M = 6371008.8

#: meters per degree of latitude (and of longitude at the equator).
M_PER_DEG = 111_320.0


def haversine_meters(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in meters as a pure column expression.

    2R*asin(sqrt(sin^2(dlat/2) + cos(lat1)cos(lat2)sin^2(dlon/2))) — all
    JVM intrinsics inside whole-stage codegen; squares are explicit
    multiplications (pow() may route through exp/ln on some engines).
    SQL twin: the same expression with DuckDB's radians/sin/cos/asin.
    """
    dlat = F.radians(lat2 - lat1) / 2.0
    dlon = F.radians(lon2 - lon1) / 2.0
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.sin(dlon)
        * F.sin(dlon)
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def haversine_meters_int(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Meter-quantized haversine (BIGINT) — what filters/orders consume."""
    return F.floor(
        haversine_meters(lat1, lon1, lat2, lon2) + F.lit(0.5)
    ).cast("long")


def _check_cell(cell_deg: float, radius_m: float, max_abs_lat: float) -> None:
    need = radius_m / M_PER_DEG / math.cos(math.radians(max_abs_lat))
    if cell_deg < need:
        raise ValueError(
            f"cell_deg={cell_deg} breaks the exactness contract for "
            f"radius={radius_m} m at |lat|<={max_abs_lat}: need >= {need:.4f}"
        )


def _lon_cells(cell_deg: float) -> tuple[int, int]:
    """(xmin, n_cells) covering lon [-180, 180) — the wrap ring."""
    xmin = math.floor(-180.0 / cell_deg)
    xmax_excl = math.ceil(180.0 / cell_deg)
    return xmin, xmax_excl - xmin


def _wrap_x(col, cell_deg: float):
    """Normalize a longitude cell index onto the wrap ring (antimeridian
    adjacency: the cell at lon +179.9 and the cell at lon -179.9 are
    NEIGHBORS; without the wrap, a 3x3 probe never crosses ±180 and
    in-radius pairs straddling it were silently missing — despite the
    documented exactness contract). Double-mod form because Spark's %
    follows the dividend's sign."""
    xmin, n = _lon_cells(cell_deg)
    return ((col - F.lit(xmin)) % n + n) % n + F.lit(xmin)


def with_cell(
    df: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_deg: float = 1.0,
) -> DataFrame:
    """Add grid cell coordinates (cell_x, cell_y) — the blocking key.

    ``floor(coord / cell_deg)`` — one exact-rounded IEEE division per
    axis, identical on every engine. cell_x is normalized onto the
    longitude wrap ring (see _wrap_x) so lon == +180.0 shares the seam
    cell with -180.0.
    """
    return df.withColumn(
        "cell_x",
        _wrap_x(
            F.floor(F.col(lon_col) / F.lit(cell_deg)).cast("long"), cell_deg
        ).cast("long"),
    ).withColumn(
        "cell_y", F.floor(F.col(lat_col) / F.lit(cell_deg)).cast("long")
    )


def _probe_cells(df: DataFrame, cell_deg: float) -> DataFrame:
    """Explode each row into its 3x3 cell neighborhood (px, py), with
    the longitude axis wrapped at the antimeridian (see _wrap_x).

    9x expansion of (id, coords, cells) — tens of bytes per row, never
    the payload; the price of turning a distance predicate into an
    equi-join.
    """
    _, n_ring = _lon_cells(cell_deg)
    if n_ring < 3:
        # with < 3 cells on the wrap ring the -1/0/+1 probe offsets
        # alias onto each other, and the "each pair produced exactly
        # once" contract (radius_pairs) silently breaks with duplicates
        raise ValueError(
            f"cell_deg={cell_deg} leaves only {n_ring} longitude cells;"
            " the 3x3 probe needs >= 3 on the wrap ring"
        )
    offsets = F.array(*[F.lit(i) for i in (-1, 0, 1)])
    return (
        df.withColumn("_dx", F.explode(offsets))
        .withColumn("_dy", F.explode(offsets))
        .withColumn(
            "px", _wrap_x(F.col("cell_x") + F.col("_dx"), cell_deg).cast("long")
        )
        .withColumn("py", F.col("cell_y") + F.col("_dy"))
        .drop("_dx", "_dy")
    )


def radius_pairs(
    points: DataFrame,
    radius_m: float,
    cell_deg: float,
    id_col: str = "stop_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_abs_lat: float = 60.0,
) -> DataFrame:
    """All pairs of points within ``radius_m`` of each other (id_a < id_b).

    The duplicate-stop detector: PostGIS answers it with
    ``ST_DWithin`` + GIST; here the 3x3 neighborhood probe of side A
    equi-joins side B's home cell, so each qualifying pair is produced
    exactly once (B lives in one cell; A probes that cell once) — no
    post-hoc distinct. Exact for ``cell_deg`` within the contract.

    Plan at 100 TB: one shuffle of 9x(id, coords, cell) rows keyed on
    the composite cell id; per-cell join fan-out is bounded by local
    point density, never corpus size. Same family as the LSH band
    self-join (operators/dedup.py) — blocking key changes, shape
    doesn't. The input is materialized once (self-join lineage cut).

    Returns (id_a, id_b, dist_m).
    """
    from .dedup import materialize

    _check_cell(cell_deg, radius_m, max_abs_lat)
    cells = materialize(
        with_cell(
            points.select(
                F.col(id_col).alias("_id"),
                F.col(lat_col).alias("_lat"),
                F.col(lon_col).alias("_lon"),
            ),
            "_lat",
            "_lon",
            cell_deg,
        )
    )
    a = _probe_cells(cells, cell_deg).select(
        F.col("_id").alias("id_a"),
        F.col("_lat").alias("lat_a"),
        F.col("_lon").alias("lon_a"),
        "px",
        "py",
    )
    b = cells.select(
        F.col("_id").alias("id_b"),
        F.col("_lat").alias("lat_b"),
        F.col("_lon").alias("lon_b"),
        F.col("cell_x").alias("bx"),
        F.col("cell_y").alias("by"),
    )
    dist = haversine_meters_int(
        F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")
    )
    return (
        a.join(b, (F.col("px") == F.col("bx")) & (F.col("py") == F.col("by")))
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist_m", dist)
        .filter(F.col("dist_m") <= int(radius_m))
        .select("id_a", "id_b", "dist_m")
    )


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    radius_m: float,
    cell_deg: float,
    q_id_col: str = "q_id",
    id_col: str = "stop_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_abs_lat: float = 60.0,
) -> DataFrame:
    """k nearest corpus points to each query point, within ``radius_m``.

    The "nearest stops to here" lookup. The radius bound is what makes
    grid blocking exact AND what PostGIS consumers actually ask
    (``ST_DWithin`` + ``ORDER BY <-> LIMIT k``); an unbounded kNN would
    need expanding-ring probes.

    Plan: the query side (small) explodes into its 3x3 probe cells and
    BROADCASTS to the corpus's home cells — the corpus never shuffles
    for candidate generation, mirroring brute_force_topk's broadcast
    contract (operators/similarity.py). Only candidates (bounded by
    density x 9 cells) reach the per-query top-k window. Ordering is
    (dist_m, id): meter-quantized then id — fully deterministic ranking.

    Returns (q_id, stop_id, dist_m, rn) with rn <= k.
    """
    _check_cell(cell_deg, radius_m, max_abs_lat)
    q = _probe_cells(
        with_cell(
            queries.select(
                F.col(q_id_col).alias("q_id"),
                F.col(lat_col).alias("q_lat"),
                F.col(lon_col).alias("q_lon"),
            ),
            "q_lat",
            "q_lon",
            cell_deg,
        ),
        cell_deg,
    ).select("q_id", "q_lat", "q_lon", "px", "py")
    c = with_cell(
        corpus.select(
            F.col(id_col).alias("c_id"),
            F.col(lat_col).alias("c_lat"),
            F.col(lon_col).alias("c_lon"),
        ),
        "c_lat",
        "c_lon",
        cell_deg,
    )
    dist = haversine_meters_int(
        F.col("q_lat"), F.col("q_lon"), F.col("c_lat"), F.col("c_lon")
    )
    cand = (
        c.join(
            F.broadcast(q),
            (F.col("px") == F.col("cell_x")) & (F.col("py") == F.col("cell_y")),
        )
        .withColumn("dist_m", dist)
        .filter(F.col("dist_m") <= int(radius_m))
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("dist_m"), F.asc("c_id"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", F.col("c_id").alias(id_col), "dist_m", "rn")
    )


def shape_length(
    shape_points: DataFrame,
    shape_col: str = "shape_id",
    seq_col: str | list[str] = "seq",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Polyline length per shape: sum of consecutive-vertex distances.

    The gtfs-via-postgres shapes surface reduced to its queryable core
    (ST_Length of the aggregated LineString). One window shuffle keyed
    on shape_id orders the vertices; each segment is quantized to
    integer MILLIMETERS before the sum, so the per-shape total is an
    exact integer aggregation — engine- and order-independent (a raw
    double sum would depend on partitioning).

    ``seq_col`` may be a list: when the sequence number alone is not a
    key (GTFS shapes.txt tolerates duplicate shape_pt_sequence values),
    callers append value tiebreakers (e.g. ["seq", "lat", "lon"]) so the
    traversal order — and therefore the sum — is a pure function of the
    data, not of partitioning.

    Returns (shape_id, n_points, length_mm).
    """
    seq_cols = [seq_col] if isinstance(seq_col, str) else list(seq_col)
    w = Window.partitionBy(shape_col).orderBy(*[F.asc(c) for c in seq_cols])
    seg_mm = F.floor(
        haversine_meters(
            F.lag(F.col(lat_col)).over(w),
            F.lag(F.col(lon_col)).over(w),
            F.col(lat_col),
            F.col(lon_col),
        )
        * F.lit(1000.0)
        + F.lit(0.5)
    ).cast("long")
    return (
        shape_points.withColumn("_seg_mm", seg_mm)
        .groupBy(F.col(shape_col).alias("shape_id"))
        .agg(
            F.count("*").cast("long").alias("n_points"),
            F.coalesce(F.sum("_seg_mm"), F.lit(0)).cast("long").alias("length_mm"),
        )
    )
