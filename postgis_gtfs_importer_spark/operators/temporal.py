"""Temporal join operators Spark's built-ins don't provide directly.

As-of (point-in-time) join — every left row picks the latest right row
with ``right.ts <= left.ts`` per key — is the backbone of feature
backfills, rates-at-event-time lookups, and GTFS-RT state alignment
(streaming/gtfs_rt.py holds the stream-static variant). Spark has no
ASOF JOIN; the naive theta-join (``l.k = r.k AND l.ts >= r.ts`` + window
to keep the max) materializes every (left, earlier-right) pair — at
100 TB that is a quadratic blowup per key before the filter.

``asof_join`` uses the union-then-window formulation instead: tag both
inputs, union them, sort each key's single merged timeline once, and
carry the last seen right values forward with ``last(..., ignorenulls)``.
Cost: ONE shuffle (the per-key window sort) over left+right rows — linear,
skew-bounded by the hottest key, identical to what a merge-join engine
does, expressed entirely in DataFrame built-ins (codegen'd window, no
UDF). DuckDB's native ASOF JOIN replays it as the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: internal column names the union-then-window machinery materializes;
#: user columns with these names would be silently shadowed
_ASOF_INTERNAL = ("_pack", "_side", "_f")


def _validate_asof_cols(
    fn_name: str,
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    value_cols: list[str],
    extra_reserved: tuple[str, ...] = (),
) -> None:
    """Shared up-front validation for both as-of directions.

    Beyond the left-collision check (the frame would fill a left column
    from the left row itself), the packed-struct fill has two
    representation constraints that must fail LOUDLY rather than
    corrupt: the struct's timestamp field is literally named ``_r_ts``
    (a value column with that name would collide inside the struct),
    and values are read back by dotted ``_f.<name>`` paths (a dot in a
    value column name breaks the extraction). Internal scratch names
    are rejected on either input for the same reason.
    """
    clash = sorted(set(value_cols) & (set(left.columns) - set(on)))
    if clash:
        raise ValueError(
            f"{fn_name} value_cols collide with left columns: {clash}"
            f" — rename them on one side first (the window would fill"
            f" from the left row itself)"
        )
    bad = sorted(c for c in value_cols if "." in c or "`" in c or c == "_r_ts")
    if bad:
        raise ValueError(
            f"{fn_name} value_cols {bad} unsupported: '_r_ts' collides"
            f" with the packed timestamp field and dots/backticks break"
            f" the struct-field extraction — rename them first"
        )
    internal = sorted(
        (set(_ASOF_INTERNAL) | set(extra_reserved))
        & (set(left.columns) | set(right.columns))
    )
    if internal:
        raise ValueError(
            f"{fn_name} inputs carry reserved internal column names"
            f" {internal} — rename them first"
        )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    value_cols: list[str],
    asof_ts_col: str = "asof_ts",
) -> DataFrame:
    """Backward as-of left join: latest right values at-or-before left ts.

    ``left`` and ``right`` must share the key columns ``on`` and the
    (numeric or timestamp) order column ``ts_col``; ``value_cols`` are
    carried from right to left (names must not collide with left's).
    Left rows with no earlier right row get NULLs — ASOF LEFT JOIN
    semantics, ties at equal ts match (>=).

    Right rows with duplicate (key, ts) must be reduced beforehand (the
    operator asserts nothing about which would win; dedup is the
    caller's statement of intent).

    NULL right VALUES are carried faithfully: the fill tracks the last
    right ROW (one struct of ts + values filled with a single
    last(ignorenulls) pass), so a matched row whose value is NULL
    yields NULL — not the previous non-null value with an asof_ts
    pointing at the newer row, the inconsistent pair a per-column
    ignorenulls fill produces. Matches DuckDB's native ASOF JOIN.
    """
    _validate_asof_cols("asof_join", left, right, on, value_cols)
    l_tagged = left.withColumn("_side", F.lit(1))
    r_tagged = (
        right.select(*on, ts_col, *value_cols)
        .withColumn("_side", F.lit(0))
        .withColumn(
            "_pack",
            F.struct(
                F.col(ts_col).alias("_r_ts"),
                *[F.col(c) for c in value_cols],
            ),
        )
        .drop(*value_cols)
    )
    merged = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    # right rows sort before left rows at equal ts => >= match semantics
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # ONE ignorenulls fill of the packed right row: _pack is non-null
    # exactly for right rows, so row presence (not value non-null-ness)
    # drives the fill, and ts + values always come from the SAME row
    filled = merged.select(
        "*", F.last(F.col("_pack"), ignorenulls=True).over(w).alias("_f")
    )
    out_cols = [c for c in left.columns] + [
        F.col(f"_f.{c}").alias(c) for c in value_cols
    ] + [F.col("_f._r_ts").alias(asof_ts_col)]
    return filled.filter(F.col("_side") == 1).select(*out_cols)


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    keys: list[str] | None = None,
) -> DataFrame:
    """Point-in-interval join ([lo, hi) containment) as a bucketed equi-join.

    Spark plans ``p.ts >= i.lo AND p.ts < i.hi`` as a broadcast nested
    loop / cartesian — quadratic, the plan that dies at scale. The
    binned formulation: quantize the axis into buckets of
    ``bucket_width``; each interval is exploded to the buckets it
    overlaps (O(len/width + 1) rows), each point lands in exactly one
    bucket; an equi-join on the bucket (+ optional keys) produces
    candidates and the exact containment predicate filters them. A point
    matches a candidate interval through exactly one bucket (its own),
    so no dedup is needed.

    Pick ``bucket_width`` near the typical interval length: explosion
    stays O(1) per interval and each candidate has a ~50% hit rate.
    Shuffle is keyed on (bucket, keys) — uniform when points are; hot
    buckets (burst traffic) are AQE's skew-join case or a salting
    candidate (operators/skew.py).
    """
    b = F.lit(int(bucket_width))
    pts = points.withColumn("_b", F.floor(F.col(point_col) / b).cast("long"))
    # degenerate intervals (hi <= lo) match nothing, but Spark's
    # sequence() DESCENDS when stop < start — a reversed [lo, hi) pair
    # would explode a spurious bucket range proportional to the gap.
    # Drop them before the explode.
    intervals = intervals.filter(F.col(hi_col) > F.col(lo_col))
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / b).cast("long"),
                F.floor((F.col(hi_col) - 1) / b).cast("long"),
            )
        ),
    )
    join_keys = ["_b", *(keys or [])]
    return (
        pts.join(iv, join_keys)
        .filter((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col)))
        .drop("_b")
    )


def locf_resample(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    step_sec: int = 3600,
) -> DataFrame:
    """Regularize an irregular time series: per key, build the complete
    ``step_sec`` grid spanning the key's observed range and fill empty
    steps by last-observation-carried-forward.

    The resample/gap-fill every time-series feature pipeline needs
    before windowed models (a missing hour must mean "unchanged", not
    "absent"). Three stages, all shuffling only on the key:

    1. bucket: each observation maps to step ``floor(epoch(ts)) div
       step_sec``; within a (key, step) the LAST observation wins,
       selected as ``max(struct(ts, id, value))`` — an exact,
       deterministic element (id breaks ts ties), aggregated with
       map-side partial combine.
    2. grid: per key, ``sequence(min_step, max_step)`` exploded
       map-side from a two-number row — the dense axis never shuffles
       as raw events.
    3. fill: left-join grid to buckets (same key partitioning), then
       ``last(value, ignorenulls=True)`` over the step order — one
       window pass.

    Returns ``(key, step, value, is_observed)``; the first grid step
    holds the key's min event by construction, and is observed UNLESS
    that earliest bucket's winning observation carries a NULL value —
    then the NULL-as-absent rule below applies and the first step is
    ``is_observed=false`` with a NULL (nothing earlier to carry).

    Documented semantics, both engines alike: a NULL-valued observation
    is treated as ABSENT (the fill carries the prior non-null value
    through it and ``is_observed`` is false) — LOCF regularizes toward
    "last USABLE value". Step buckets use truncating integer division
    on both engines (Spark ``div`` == DuckDB ``//``); pre-1970
    timestamps bucket consistently cross-engine, just not
    calendar-aligned around epoch 0.
    """
    k, t, v = key_col, ts_col, value_col
    step = F.expr(f"unix_timestamp({t}) div {int(step_sec)}")
    obs = (
        df.withColumn("_step", step)
        .groupBy(k, "_step")
        .agg(
            F.max(F.struct(F.col(t), F.col(id_col), F.col(v))).alias("_last")
        )
        .select(k, "_step", F.col("_last")[v].alias("_obs"))
    )
    spans = obs.groupBy(k).agg(
        F.min("_step").alias("_lo"), F.max("_step").alias("_hi")
    )
    grid = spans.select(
        k, F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("_step")
    )
    w = (
        Window.partitionBy(k)
        .orderBy("_step")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(obs, [k, "_step"], "left")
        .select(
            F.col(k),
            F.col("_step").alias("step"),
            F.last("_obs", ignorenulls=True).over(w).alias("value"),
            F.col("_obs").isNotNull().alias("is_observed"),
        )
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    value_cols: list[str],
    asof_ts_col: str = "asof_ts",
) -> DataFrame:
    """Forward as-of left join: EARLIEST right values at-or-after left
    ts — the mirror of :func:`asof_join` (same union-then-window single
    shuffle, direction flipped by REVERSING the sort and keeping a
    running last(ignorenulls) frame — see the in-code note on why the
    naive currentRow..unboundedFollowing frame is a spill hazard).
    Ties at equal ts match (<=): left rows order before right rows at
    the same timestamp in the forward sense, so the suffix frame
    includes them. The "next scheduled event / next price revision"
    lookup of a timeline pipeline.

    ``value_cols`` must not collide with left's columns: the
    currentRow-anchored frame would fill a left-side column from the
    left row ITSELF (while asof_ts still came from the next right row —
    an inconsistent pair), so the collision is rejected up front.
    NULL right values are carried faithfully via the same packed-struct
    fill as :func:`asof_join`."""
    _validate_asof_cols("asof_join_forward", left, right, on, value_cols)
    l_tagged = left.withColumn("_side", F.lit(0))
    r_tagged = (
        right.select(*on, ts_col, *value_cols)
        .withColumn("_side", F.lit(1))
        .withColumn(
            "_pack",
            F.struct(
                F.col(ts_col).alias("_r_ts"),
                *[F.col(c) for c in value_cols],
            ),
        )
        .drop(*value_cols)
    )
    merged = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    # REVERSED-sort running frame, not currentRow..unboundedFollowing:
    # first(non-null) ahead of the current row equals last(non-null) up
    # to it under the inverted order. Spark evaluates running
    # (unboundedPreceding..currentRow) frames streamingly, while
    # unbounded-FOLLOWING frames re-scan the partition buffer from the
    # current row for EVERY row — O(n^2) reads once the buffer spills,
    # and each re-scan reopens every spill file (the forced-32-row-spill
    # CI guard turned that into a JVM heap OOM on the dense-grid sibling
    # interpolate_resample; same class here, fixed the same way).
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).desc(), F.col("_side").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.select(
        "*", F.last(F.col("_pack"), ignorenulls=True).over(w).alias("_f")
    )
    out_cols = [c for c in left.columns] + [
        F.col(f"_f.{c}").alias(c) for c in value_cols
    ] + [F.col("_f._r_ts").alias(asof_ts_col)]
    return filled.filter(F.col("_side") == 0).select(*out_cols)


def interval_union(
    df: DataFrame,
    key_col: str,
    lo_col: str,
    hi_col: str,
) -> DataFrame:
    """Merge overlapping/adjacent half-open intervals per key into
    maximal disjoint islands — the coverage primitive behind "total
    active time", uptime/SLA windows, and interval-set compaction
    before a range join.

    Classic gaps-and-islands, but over ARBITRARY intervals rather than
    gap-separated points (session_window cannot express it: an
    interval's reach is its own ``hi``, not a fixed gap after it).
    Two window passes over one per-key sort, then one aggregate — a
    single shuffle on the key, no self-join, no explode:

    1. island boundary: an interval starts a new island iff its ``lo``
       exceeds the running ``max(hi)`` of all EARLIER intervals (order
       ``lo, hi`` — ties can never split an island since equal ``lo``
       always overlaps). Adjacent intervals ([1,5), [5,9)) merge: the
       half-open union is contiguous.
    2. island id: running sum of the boundary flags (same sort reused —
       Spark plans both windows in one Window node over one exchange).
    3. per-island aggregate: min(lo), max(hi), count — map-side partial
       on (key, island).

    Degenerate intervals (``hi <= lo``, empty by half-open convention)
    are dropped up front — mirroring range_join_bucketed's guard.

    Returns (key, lo, hi, n_merged) — the merged islands. Deterministic
    for any tie order: island membership depends only on the interval
    SET. Scales on key cardinality; a single hot key serializes its own
    sort only (the window is per-key), the layout every engine shares
    for this problem.
    """
    k = key_col
    iv = df.filter(F.col(hi_col) > F.col(lo_col))
    w_prev = (
        Window.partitionBy(k)
        .orderBy(F.col(lo_col), F.col(hi_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(k)
        .orderBy(F.col("_lo"), F.col("_hi"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = iv.select(
        F.col(k),
        F.col(lo_col).alias("_lo"),
        F.col(hi_col).alias("_hi"),
        F.when(
            F.max(F.col(hi_col)).over(w_prev) >= F.col(lo_col), F.lit(0)
        ).otherwise(F.lit(1)).alias("_new"),
    )
    islands = flagged.select(
        F.col(k), "_lo", "_hi", F.sum("_new").over(w_run).alias("_island")
    )
    return (
        islands.groupBy(k, "_island")
        .agg(
            F.min("_lo").alias("lo"),
            F.max("_hi").alias("hi"),
            F.count("*").cast("long").alias("n_merged"),
        )
        .select(k, "lo", "hi", "n_merged")
    )


def interpolate_resample(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    step_sec: int = 3600,
) -> DataFrame:
    """Linear-interpolation gap fill on the regular grid — the
    companion to :func:`locf_resample` for quantities that move
    continuously between observations (gauge readings, prices) rather
    than holding (state flags).

    Same three-stage shape as LOCF (per-bucket exact winner, exploded
    dense grid, windowed fill — every shuffle on the key only), but the
    fill carries BOTH neighbors: the previous and next observed (step,
    value) ride as two packed structs (last/first over one per-key
    sort; struct presence — not value non-nullness — drives the fill,
    the asof_join lesson), and an unobserved step interpolates

        v = pv + (nv - pv) * (step - ps) / (ns - ps)

    left-associatively in IEEE doubles — one fixed op chain, so DuckDB
    replays it bit-for-bit; the result is reported as ``value_e6``
    (floor(v * 1e6 + 0.5), BIGINT) so the hashed surface is integer.
    Steps before the first / after the last observation have no
    bracket and yield NULL (no extrapolation). A NULL-valued
    observation is ABSENT here (locf_resample's documented policy):
    interpolation runs between its non-null neighbors and
    ``is_observed`` is false for its step.

    Returns (key, step, value_e6, is_observed).
    """
    k, t, v = key_col, ts_col, value_col
    step = F.expr(f"unix_timestamp({t}) div {int(step_sec)}")
    obs = (
        df.withColumn("_step", step)
        .groupBy(k, "_step")
        .agg(
            F.max(F.struct(F.col(t), F.col(id_col), F.col(v))).alias("_last")
        )
        .select(k, "_step", F.col("_last")[v].alias("_obs"))
    )
    spans = obs.groupBy(k).agg(
        F.min("_step").alias("_lo"), F.max("_step").alias("_hi")
    )
    grid = spans.select(
        k, F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("_step")
    )
    joined = grid.join(obs, [k, "_step"], "left").select(
        F.col(k),
        F.col("_step"),
        F.col("_obs"),
        F.when(
            F.col("_obs").isNotNull(),
            F.struct(F.col("_step").alias("s"), F.col("_obs").alias("v")),
        ).alias("_sv"),
    )
    w_prev = (
        Window.partitionBy(k)
        .orderBy("_step")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # The next-observation fill runs over the REVERSED step order as a
    # running frame (see asof_join_forward): an unbounded-FOLLOWING
    # frame re-scans the buffer per row — on this operator's DENSE
    # per-key grid (span/step rows per key) the forced-spill CI guard
    # drove that into a JVM heap OOM (spill reader per re-scan).
    # last(non-null) over the inverted sort is the same value,
    # evaluated streamingly.
    w_next = (
        Window.partitionBy(k)
        .orderBy(F.col("_step").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    br = joined.select(
        F.col(k),
        F.col("_step"),
        F.col("_obs"),
        F.last("_sv", ignorenulls=True).over(w_prev).alias("_p"),
        F.last("_sv", ignorenulls=True).over(w_next).alias("_n"),
    )
    interp = (
        F.col("_p.v")
        + (F.col("_n.v") - F.col("_p.v"))
        * (F.col("_step") - F.col("_p.s"))
        / (F.col("_n.s") - F.col("_p.s"))
    )
    val = F.when(F.col("_obs").isNotNull(), F.col("_obs")).otherwise(
        F.when(
            F.col("_p").isNotNull()
            & F.col("_n").isNotNull()
            & (F.col("_n.s") > F.col("_p.s")),
            interp,
        )
    )
    return br.select(
        F.col(k),
        F.col("_step").alias("step"),
        F.floor(val * F.lit(1e6) + F.lit(0.5)).cast("long").alias("value_e6"),
        F.col("_obs").isNotNull().alias("is_observed"),
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Time-weighted average per key over irregular observations — the
    TWAP/telemetry primitive a plain ``avg`` gets WRONG on irregular
    sampling (a value that held for 6 hours must weigh 360× one that
    held a minute; plain avg weighs them equally).

    Each observation carries its value until the NEXT observation of
    the same key (the last one carries nothing — no extrapolation
    beyond the observed span, matching interpolate_resample's edge
    policy). ``ts_col`` must be integral (epoch seconds/micros — the
    caller picks the resolution) and ``value_col`` integral (quantize
    first): the weighted numerator Σ v·Δt is then an exact associative
    BIGINT sum — engine- and partition-order-free. Keep
    max|v| · span < 2^63 (holds for cent-quantized values over
    second-resolution years by two orders of magnitude).

    One shuffle on the key: a lead() window over the per-key sort, then
    the group aggregate (map-side combine). Returns
    (key, twa = num div dur, num, dur, n_obs); keys with a single
    observation (zero span) report NULL twa with dur 0 — honestly
    unaveraged, not a fake point estimate.

    Duplicate (key, ts) rows are the caller's contract to resolve
    (zero-width segments contribute nothing but make the lead order
    within the tie arbitrary between their values — harmless for the
    sum only if values match; reduce first).
    """
    k = key_col
    w = Window.partitionBy(k).orderBy(F.col(ts_col))
    seg = df.select(
        F.col(k),
        F.col(value_col).cast("long").alias("_v"),
        (F.lead(F.col(ts_col)).over(w) - F.col(ts_col))
        .cast("long")
        .alias("_dt"),
    )
    agg = seg.groupBy(k).agg(
        F.sum(F.col("_v") * F.col("_dt")).cast("long").alias("num"),
        F.sum("_dt").cast("long").alias("dur"),
        F.count("*").cast("long").alias("n_obs"),
    )
    return agg.select(
        F.col(k),
        F.expr("CASE WHEN dur > 0 THEN num div dur END").alias("twa"),
        F.coalesce("num", F.lit(0)).alias("num"),
        F.coalesce("dur", F.lit(0)).alias("dur"),
        "n_obs",
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    value_cols: list[str],
    asof_ts_col: str = "asof_ts",
) -> DataFrame:
    """Nearest-in-time as-of join: each left row takes the right row
    with the SMALLEST |Δts| per key, ties broken toward the earlier
    (at-or-before) row — the sensor-alignment join when the best
    reading may sit on either side of the event.

    One union-then-window pass carries BOTH candidates: the
    at-or-before right row via last(ignorenulls) over the preceding
    frame and the strictly-after row via first(ignorenulls) over the
    following frame — the SAME per-key sort feeds both frames, so
    Spark plans one exchange+sort with two window frames: the cost of
    ONE as-of join buys both directions. An equal-ts right row sorts
    before the left row (backward's >= tie rule), is seen only by the
    preceding frame, and wins at distance 0 — the forward frame then
    starts strictly after, so the two candidates can never be the same
    row. The winner is picked per row by exact |Δ| comparison on the
    packed structs (row presence drives the fill — the asof_join
    contract — so NULL right values are carried faithfully from
    whichever row wins).

    ``ts_col`` must be numeric (epoch units) so |Δ| is integer
    arithmetic. Same validation contract as asof_join.
    """
    # asof_join_nearest additionally materializes _b/_n (the two fill
    # directions) as scratch columns; without reserving them an input
    # carrying either name dies later with an ambiguous-reference
    # AnalysisException instead of this loud ValueError (r7 ADVICE).
    _validate_asof_cols(
        "asof_join_nearest", left, right, on, value_cols,
        extra_reserved=("_b", "_n"),
    )
    l_tagged = left.withColumn("_side", F.lit(1))
    r_tagged = (
        right.select(*on, ts_col, *value_cols)
        .withColumn("_side", F.lit(0))
        .withColumn(
            "_pack",
            F.struct(
                F.col(ts_col).alias("_r_ts"),
                *[F.col(c) for c in value_cols],
            ),
        )
        .drop(*value_cols)
    )
    merged = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    order = [F.col(ts_col), F.col("_side")]
    w_back = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Reversed-sort running frame for the forward candidate (the
    # asof_join_forward spill-safety rationale): same value as
    # first(non-null) over currentRow..unboundedFollowing, evaluated
    # streamingly instead of re-scanning the buffer per row.
    w_fwd = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).desc(), F.col("_side").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.select(
        "*",
        F.last(F.col("_pack"), ignorenulls=True).over(w_back).alias("_b"),
        F.last(F.col("_pack"), ignorenulls=True).over(w_fwd).alias("_n"),
    )
    d_back = F.abs(F.col(ts_col) - F.col("_b._r_ts"))
    d_fwd = F.abs(F.col("_n._r_ts") - F.col(ts_col))
    pick = (
        F.when(F.col("_b").isNull(), F.col("_n"))
        .when(F.col("_n").isNull(), F.col("_b"))
        .when(d_fwd < d_back, F.col("_n"))
        .otherwise(F.col("_b"))  # ties -> earlier row
    )
    chosen = filled.withColumn("_f", pick)
    out_cols = [c for c in left.columns] + [
        F.col(f"_f.{c}").alias(c) for c in value_cols
    ] + [F.col("_f._r_ts").alias(asof_ts_col)]
    return chosen.filter(F.col("_side") == 1).select(*out_cols)


def half_life_decay(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str | None = None,
    unit_seconds: int = 604_800,
    max_buckets: int = 20,
    value_digits: int = 2,
) -> DataFrame:
    """Recency-weighted (half-life-decayed) engagement per key — the
    aggregation sibling of ``time_weighted_avg`` (TWAP weights by
    DURATION; this weights by AGE): every event contributes
    ``2^(-age_buckets)`` of its weight, where ``age_buckets`` is whole
    ``unit_seconds`` units (default: weeks) before the NEWEST event in
    the input. The standard recency feature for ranking/user models,
    usually approximated in floats; here it is EXACT.

    Exactness trick: half-life weights are powers of two, so scaling by
    ``2^max_buckets`` makes every contribution the integer
    ``1 << (max_buckets - min(age, max_buckets))`` — binary-exact in
    any engine, exactly summable in any order (float ``exp(-λt)`` decay
    is neither). Events older than ``max_buckets`` units saturate at
    weight 1 (i.e. 2^-max_buckets of the newest event's weight — below
    that the contribution is sub-resolution noise by construction).

    Returns one row per key: ``n_events``, ``decayed_count_s`` (sum of
    scaled weights; divide by 2^max_buckets for the decayed count) and,
    when ``value_col`` is given, ``decayed_value_s`` (sum of
    fixed-point values × scaled weights). Overflow bound:
    2^max_buckets=2^20 × value ≤ 1e8 cents × rows ≤ 1e9 stays well
    under 2^63 at any realistic shard size; at 100 TB the aggregate is
    ONE map-side-combined shuffle on the key, and the anchor (global
    max timestamp) is a 1-row broadcast — the trend_by_type scalar
    pattern, whitelisted in plan hygiene.

    NULL policy (the sketch-family discipline, pinned in tests): rows
    with a NULL key or NULL timestamp are EXCLUDED up front — an
    unattributable or undatable event has no decay age; a NULL
    ``value_col`` contributes to the count sums but not the value sum
    (Spark and DuckDB both skip NULL products in SUM).
    """
    if int(max_buckets) < 0 or int(max_buckets) > 62:
        raise ValueError(
            f"half_life_decay needs 0 <= max_buckets <= 62, got"
            f" {max_buckets} (the scaled weight is a shifted BIGINT)"
        )
    if int(unit_seconds) <= 0:
        raise ValueError(
            f"half_life_decay needs unit_seconds > 0, got {unit_seconds}"
        )
    if "_anchor" in events.columns:
        # the asof-family lesson (r7 ADVICE): the anchor cross join
        # would make every _anchor reference ambiguous — fail loudly
        # up front, not with a late AnalysisException
        raise ValueError(
            "half_life_decay input carries the reserved column name"
            " '_anchor' — rename it first (it is the internal"
            " max-timestamp scalar)"
        )
    keep = F.col(ts_col).isNotNull()
    for c in key_cols:
        keep = keep & F.col(c).isNotNull()
    ev = events.filter(keep)
    anchor = ev.agg(
        F.max(F.unix_timestamp(F.col(ts_col))).alias("_anchor")
    )
    age_sql = (
        f"((_anchor - unix_timestamp({ts_col})) div {int(unit_seconds)})"
    )
    # shiftleft on an INT literal wraps at shift >= 31 (shift count is
    # taken mod 32) — the weight must be shifted AS a BIGINT so the
    # full validated range max_buckets <= 62 is exact (r8 ADVICE).
    w = F.expr(
        f"shiftleft(cast(1 as bigint), cast({int(max_buckets)}"
        f" - least({age_sql}, {int(max_buckets)}) as int))"
    )
    agg_cols = [
        F.count("*").alias("n_events"),
        F.sum(w).alias("decayed_count_s"),
    ]
    if value_col is not None:
        v_c = F.floor(
            F.col(value_col) * (10 ** int(value_digits)) + F.lit(0.5)
        ).cast("long")
        agg_cols.append(F.sum(v_c * w).alias("decayed_value_s"))
    return (
        ev.crossJoin(F.broadcast(anchor))
        .groupBy(*[F.col(c) for c in key_cols])
        .agg(*agg_cols)
    )


def rate_spikes(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    bucket_seconds: int = 3600,
    window_buckets: int = 24,
    factor_num: int = 3,
    factor_den: int = 1,
    min_baseline: int = 1,
) -> DataFrame:
    """Per-key rate-spike (burst) detection over a DENSE bucket grid —
    the thresholded-rate reading of Kleinberg's burst model that
    monitoring pipelines actually deploy: bucket each key's events
    into ``bucket_seconds`` bins, and flag a bucket whose count exceeds
    ``factor`` x its trailing ``window_buckets``-bucket mean. The
    corpus question: which sources/users/event types suddenly surged
    (scraper bursts, incident spikes, campaign launches)?

    Correctness hinge — the grid must be DENSE: a trailing mean over
    only the buckets that HAPPEN to contain events ignores the zeros
    and inflates the baseline, silently suppressing every spike after
    a quiet period. The per-key [min, max] bucket span is exploded
    from a ``sequence`` (the locf/interpolate_resample grid trick) and
    missing buckets coalesce to 0.

    Exactness: "n exceeds factor x the trailing mean" is the
    all-integer cross-multiplication ``n * factor_den * w_actual >
    factor_num * trailing_sum`` (``trailing_sum`` spans exactly
    ``w_actual`` preceding grid buckets — fewer than window_buckets
    only at the key's head) — no float boundary anywhere. Buckets with
    ``trailing_sum < min_baseline`` (cold start, dead key) are not
    flagged: a 0 -> 1 transition is not a 3x surge.

    Scale shape: one (key, bucket)-keyed map-side-combined count; the
    grid explode is bounded by span/bucket per key (a years-long key at
    hourly buckets is ~10k rows — data, not a plan hazard); ONE key-
    keyed window sort serves the trailing frame. Rows with NULL key or
    ts are excluded up front. Returns only the flagged buckets:
    (*key_cols, bucket_start_epoch, n_events, trailing_sum, w_actual).
    """
    if int(bucket_seconds) <= 0 or int(window_buckets) < 1:
        raise ValueError(
            f"rate_spikes needs bucket_seconds > 0 and window_buckets >= 1,"
            f" got {bucket_seconds}, {window_buckets}"
        )
    if int(factor_num) <= 0 or int(factor_den) <= 0:
        raise ValueError(
            f"rate_spikes needs a positive factor ratio, got"
            f" {factor_num}/{factor_den}"
        )
    keep = F.col(ts_col).isNotNull()
    for c in key_cols:
        keep = keep & F.col(c).isNotNull()
    # unix_timestamp can be negative pre-1970: use floor-division
    # semantics explicitly so bucket edges are stable either side of 0
    step = F.floor(
        F.unix_timestamp(F.col(ts_col)).cast("double")
        / F.lit(float(bucket_seconds))
    ).cast("long")
    counts = (
        events.filter(keep)
        .groupBy(*[F.col(c) for c in key_cols], step.alias("_step"))
        .agg(F.count("*").cast("long").alias("_n"))
    )
    span = counts.groupBy(*key_cols).agg(
        F.min("_step").alias("_lo"), F.max("_step").alias("_hi")
    )
    grid = span.select(
        *key_cols, F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("_step")
    )
    dense = grid.join(counts, [*key_cols, "_step"], "left").select(
        *key_cols, "_step", F.coalesce("_n", F.lit(0)).cast("long").alias("_n")
    )
    w = (
        Window.partitionBy(*[F.col(c) for c in key_cols])
        .orderBy("_step")
        .rowsBetween(-int(window_buckets), -1)
    )
    trailed = dense.select(
        *key_cols,
        "_step",
        "_n",
        F.coalesce(F.sum("_n").over(w), F.lit(0)).cast("long").alias(
            "trailing_sum"
        ),
        F.count("*").over(w).cast("long").alias("w_actual"),
    )
    spike = (
        (F.col("w_actual") >= 1)
        & (F.col("trailing_sum") >= int(min_baseline))
        & (
            F.col("_n") * F.lit(int(factor_den)) * F.col("w_actual")
            > F.lit(int(factor_num)) * F.col("trailing_sum")
        )
    )
    return trailed.filter(spike).select(
        *key_cols,
        (F.col("_step") * int(bucket_seconds)).alias("bucket_start_epoch"),
        F.col("_n").alias("n_events"),
        "trailing_sum",
        "w_actual",
    )
