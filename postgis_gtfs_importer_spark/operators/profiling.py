"""Single-pass table profiling (ANALYZE-style column statistics).

The reference's publish path relies on engine-maintained statistics
(PostgreSQL ANALYZE after load, gtfs-via-postgres index builds); a
Spark-native engine surfaces the same information as a first-class
operator: per-column row count, null count, exact distinct count, and
min/max — the inputs to join planning, file layout decisions, and data
quality monitoring.

Scale design: ONE scan. All columns' aggregates are computed in a single
``agg`` over the table — Spark plans multiple distinct aggregates with
one Expand + two-stage hash aggregation (rows multiply by the column
count map-side, never a second table read), which at 100 TB beats
per-column scans by the column count. The wide one-row result is then
melted to one row per column with an array-of-structs explode built
from typed Column expressions (identifier-injection-proof) —
driver-scale, free.
Min/max are canonicalized to strings AFTER aggregation so one schema
fits every column type (dates/ints/strings; floats are profiled by
range only where string forms are engine-stable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Profile ``cols`` in one scan: returns one row per column with
    ``(col_name, n_rows, n_nulls, n_distinct, min_str, max_str)``.
    Distinct counts are exact (null excluded, SQL semantics); min/max
    are cast to string post-aggregation.
    """
    # Aliases are POSITIONAL (__rows_0, __rows_1, ...) and the melt is
    # built from typed Column expressions (array of structs + explode),
    # so a profiled column whose name contains spaces, quotes, hyphens
    # or any other SQL-hostile character never reaches a parsed
    # expression string — only F.col(), which takes names literally.
    aggs = []
    for i, c in enumerate(cols):
        col = df[c]
        aggs += [
            F.count("*").alias(f"__rows_{i}"),
            F.sum(col.isNull().cast("long")).alias(f"__nulls_{i}"),
            F.countDistinct(col).alias(f"__dist_{i}"),
            F.min(col).cast("string").alias(f"__min_{i}"),
            F.max(col).cast("string").alias(f"__max_{i}"),
        ]
    wide = df.agg(*aggs)
    melted = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"__rows_{i}").cast("long").alias("n_rows"),
                F.col(f"__nulls_{i}").cast("long").alias("n_nulls"),
                F.col(f"__dist_{i}").cast("long").alias("n_distinct"),
                F.col(f"__min_{i}").alias("min_str"),
                F.col(f"__max_{i}").alias("max_str"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return wide.select(F.explode(melted).alias("p")).select("p.*")


def tvd_drift(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ts_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Distribution-drift monitor: total-variation distance between the
    reference window (first half of the observed time span) and the
    current window (second half), per group, over ``n_buckets``
    equal-width value buckets.

    The PSI/KL family needs ln() — transcendental, so the last ulp can
    differ across engines and break exact verification; TVD
    ( sum_b |p_ref(b) - p_cur(b)| / 2 ) carries the same "how much did
    the distribution move" signal and is computable in EXACT integer
    arithmetic by cross-multiplying the two sample sizes:

        tvd_ppm = (sum_b |c_ref_b * n_cur - c_cur_b * n_ref|) * 1e6
                  div (2 * n_ref * n_cur)

    (exact while n_ref * n_cur * 1e6 < 2^63 — fine to ~3e6 rows/side;
    beyond that move the numerator to DECIMAL(38,0)).

    One pass over the fact: global (min, max, mid-timestamp) come from a
    single 1-row aggregate (broadcast), bucketing is a map-side
    expression, and ONE (group, bucket) aggregate feeds the per-group
    roll-up — buckets empty on both sides contribute zero so no axis
    densification is needed. Output: (group, n_ref, n_cur, tvd_ppm).
    """
    g, v, ts = F.col(group_col), F.col(value_col), F.col(ts_col)
    # Drift is defined over rows with an OBSERVED (value, ts): a NULL
    # value would otherwise ride floor(NULL)=NULL through F.least into
    # the TOP bucket (least skips NULLs) — misattributed as a maximal
    # observation instead of excluded.
    df = df.filter(v.isNotNull() & ts.isNotNull())
    bounds = df.agg(
        F.min(v).alias("vmin"),
        F.max(v).alias("vmax"),
        F.min(F.unix_micros(ts.cast("timestamp"))).alias("t0"),
        F.max(F.unix_micros(ts.cast("timestamp"))).alias("t1"),
    )
    mid = F.expr("t0 + (t1 - t0) div 2")
    with_b = df.crossJoin(F.broadcast(bounds)).select(
        g.alias("grp"),
        # Degenerate span (vmax == vmin — a constant value column, or a
        # single observed row) puts everything in bucket 0: the guarded
        # division otherwise raises DIVIDE_BY_ZERO under ANSI mode
        # (found by the 1-row input sweep; the empty-input sweep cannot
        # see it because no row ever evaluates the expression there).
        F.when(
            F.col("vmax") > F.col("vmin"),
            F.least(
                F.floor(
                    (v - F.col("vmin"))
                    * F.lit(float(n_buckets))
                    / (F.col("vmax") - F.col("vmin"))
                ),
                F.lit(n_buckets - 1),
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("bucket"),
        (F.unix_micros(ts.cast("timestamp")) < mid).alias("is_ref"),
    )
    per_bucket = with_b.groupBy("grp", "bucket").agg(
        F.sum(F.col("is_ref").cast("long")).alias("c_ref"),
        F.sum((~F.col("is_ref")).cast("long")).alias("c_cur"),
    )
    totals = per_bucket.groupBy("grp").agg(
        F.sum("c_ref").alias("n_ref"), F.sum("c_cur").alias("n_cur")
    )
    return (
        per_bucket.join(totals, "grp")
        .groupBy("grp", "n_ref", "n_cur")
        .agg(
            F.sum(
                F.abs(
                    F.col("c_ref") * F.col("n_cur")
                    - F.col("c_cur") * F.col("n_ref")
                )
            ).alias("num")
        )
        .select(
            F.col("grp").alias(group_col),
            F.col("n_ref").cast("long").alias("n_ref"),
            F.col("n_cur").cast("long").alias("n_cur"),
            # A group entirely inside one half has nothing to compare
            # against: tvd is UNDEFINED (NULL), not a crash — the
            # unguarded div raised DIVIDE_BY_ZERO under Spark 4's
            # default ANSI mode and aborted the whole query.
            F.when(
                (F.col("n_ref") > 0) & (F.col("n_cur") > 0),
                F.expr("(num * 1000000) div (2 * n_ref * n_cur)"),
            )
            .cast("long")
            .alias("tvd_ppm"),
        )
    )


def cusum_changepoints(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Per-key CUSUM level-shift detection over an irregular event
    series — the classic change-point statistic (Page's cumulative
    sum): against the key's own mean, the maximum upward excursion
    S+ = max_i (cs_i − min(0, min_{j≤i} cs_j)) and downward excursion
    S− = max_i (max(0, max_{j≤i} cs_j) − cs_i) of the centered
    cumulative sum cs, plus WHERE each peak first occurs. A drifting
    metric (deploy regression, sensor bias, seasonality break) shows a
    large one-sided excursion; a stable one stays near zero. This is
    the monitoring companion to tvd_drift (distribution change between
    two snapshots) — CUSUM localizes WHEN a single series broke.

    The recursive textbook form S_i = max(0, S_{i-1} + x_i − μ) is not
    window-expressible, but its closed form above is: one cumulative
    sum and a running min/max over the SAME per-key sort. Exactness:
    values quantize to e6 BIGINTs per row (the money-sum discipline),
    μ is the truncating integer mean (sum div n — Spark's div and
    DuckDB's // both truncate toward zero, not floor; deterministic,
    bias < 1 quantum), so cs and both excursions are exact integers any engine
    reproduces bit-for-bit. Order is (epoch_us, id) — total and
    engine-free.

    One shuffle on the key: every window (whole-partition stats, the
    running frames, the partition max) shares the one exchange+sort,
    and the final per-key aggregate reuses that partitioning. NULL
    value/ts observations are EXCLUDED up front (the sketch-family
    policy); a key with all-NULL observations disappears.

    Returns (key, n_obs, mean_e6, max_up_e6, max_down_e6,
    peak_up_us, peak_down_us) — peaks are the EARLIEST (ts, id) where
    the maximal excursion is attained.
    """
    from pyspark.sql import Window

    base = df.filter(
        F.col(value_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(key_col).alias("_k"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
        F.col(id_col).alias("_i"),
        F.floor(F.col(value_col) * F.lit(1e6) + F.lit(0.5))
        .cast("long")
        .alias("_v"),
    )
    wk = Window.partitionBy("_k")
    run = (
        Window.partitionBy("_k")
        .orderBy("_us", "_i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    mu = base.select(
        "*", F.expr("sum(_v) OVER (PARTITION BY _k) div count(*) OVER (PARTITION BY _k)").alias("_mu")
    )
    cs = mu.select("*", F.sum(F.col("_v") - F.col("_mu")).over(run).alias("_cs"))
    dev = cs.select(
        "*",
        (F.col("_cs") - F.least(F.min("_cs").over(run), F.lit(0))).alias("_up"),
        (F.greatest(F.max("_cs").over(run), F.lit(0)) - F.col("_cs")).alias("_dn"),
    )
    peaked = dev.select(
        "*",
        F.max("_up").over(wk).alias("_mup"),
        F.max("_dn").over(wk).alias("_mdn"),
    )
    return (
        peaked.groupBy("_k")
        .agg(
            F.count("*").cast("long").alias("n_obs"),
            F.max("_mu").cast("long").alias("mean_e6"),
            F.max("_up").cast("long").alias("max_up_e6"),
            F.max("_dn").cast("long").alias("max_down_e6"),
            F.min(
                F.when(F.col("_up") == F.col("_mup"), F.struct("_us", "_i"))
            )["_us"].alias("peak_up_us"),
            F.min(
                F.when(F.col("_dn") == F.col("_mdn"), F.struct("_us", "_i"))
            )["_us"].alias("peak_down_us"),
        )
        .select(
            F.col("_k").alias(key_col),
            "n_obs",
            "mean_e6",
            "max_up_e6",
            "max_down_e6",
            "peak_up_us",
            "peak_down_us",
        )
    )


def mixture_concentration(
    df: DataFrame,
    group_col: str,
    category_col: str,
) -> DataFrame:
    """Per-group mixture-concentration report over a categorical
    column — Shannon entropy and the Herfindahl-Hirschman index of the
    category shares — the corpus-health dashboard numbers behind "is
    split X's source mix collapsing?" (entropy falling, HHI rising =
    one source taking over; tvd_drift answers the *pairwise* version,
    this is the single-distribution summary).

    Determinism discipline (the zero-float-sum-aggregates rule):
    - HHI is all-integer: shares quantize to ``p = c*1e6 div n``
      (documented quantization, exact in both engines) and
      ``hhi_e6 = sum(p^2) div 1e6`` folds over the SORTED category
      list — BIGINT arithmetic, order pinned, bound c < 9.2e12 rows
      per (group, category).
    - Entropy needs ln, so it cannot be integer — instead the float
      work is ORDER-PINNED: ``sum(c·ln c)`` is a left fold seeded 0.0
      over the category-sorted list (both engines run the identical
      IEEE op sequence — an unordered SUM() would round differently
      per partitioning), then one fixed op chain
      ``(ln n - scl/n)·1e6 + 0.5, floor``.

    Scale: one (group, category) count aggregate (map-side combined),
    one group-keyed collect whose list is bounded by the category
    cardinality (a mixture report over an unbounded category domain is
    the caller's modeling bug). NULL group/category rows are excluded.
    Returns (group, n_rows, n_categories, entropy_e6, hhi_e6);
    single-category groups report entropy 0 and HHI ~1e6 exactly.
    """
    per = (
        df.filter(
            F.col(group_col).isNotNull() & F.col(category_col).isNotNull()
        )
        .groupBy(group_col, category_col)
        .agg(F.count("*").cast("long").alias("_c"))
    )
    agg = per.groupBy(group_col).agg(
        F.sum("_c").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_categories"),
        F.array_sort(
            F.collect_list(F.struct(F.col(category_col).alias("s"), "_c"))
        ).alias("_l"),
    )
    scl = F.aggregate(
        F.transform(
            "_l",
            lambda x: x["_c"].cast("double")
            * F.log(x["_c"].cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nd = F.col("n_rows").cast("double")
    ent = F.floor(
        (F.log(nd) - scl / nd) * F.lit(1_000_000.0) + F.lit(0.5)
    ).cast("long")
    hhi = F.expr(
        "aggregate(transform(_l,"
        " x -> (x._c * 1000000L div n_rows)"
        " * (x._c * 1000000L div n_rows)),"
        " 0L, (acc, x) -> acc + x) div 1000000"
    ).cast("long")
    return agg.select(
        group_col,
        "n_rows",
        "n_categories",
        ent.alias("entropy_e6"),
        hhi.alias("hhi_e6"),
    )


def psi_drift(
    df: DataFrame,
    group_col: str,
    value_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Population Stability Index per group vs the global distribution
    — THE production drift metric of scoring/risk pipelines:
    ``PSI = sum_b (p_b - q_b) * ln(p_b / q_b)`` over ``n_buckets``
    equal-width value buckets (group = actual, global = expected;
    < 0.1 stable, 0.1-0.25 shifting, > 0.25 action). tvd_drift's
    docstring names why this family was deferred — ln() is
    transcendental — and mixture_concentration's order-pinned-fold
    discipline is what makes it verifiable now: every float op runs in
    the SAME order in both engines (bucket-sorted left fold seeded
    0.0), with each ln fed one IEEE division of exact BIGINTs.

    Buckets are Laplace-smoothed (+1 per bucket) so empty cells never
    hit ln(0) — the standard PSI practice — which requires the DENSE
    bucket spine: all ``n_buckets`` buckets per group participate,
    present or not (a per-group sequence explode, n_buckets rows per
    group). Bounds come from ONE 1-row global (min, max) broadcast
    (the tvd_drift scalar pattern); a degenerate span (constant value)
    puts everything in bucket 0 on both sides — PSI 0, not a crash.

    Scale: one (group, bucket) map-side-combined count, the global
    re-aggregated from the per-group counts (n_buckets rows,
    broadcast), one group-keyed collect bounded by n_buckets. NULL
    group/value rows are excluded up front. Returns
    (group, n_rows, psi_e6).
    """
    if int(n_buckets) < 2:
        raise ValueError(f"psi_drift needs n_buckets >= 2, got {n_buckets}")
    b = int(n_buckets)
    g, v = F.col(group_col), F.col(value_col)
    df = df.filter(v.isNotNull() & g.isNotNull())
    bounds = df.agg(F.min(v).alias("_vmin"), F.max(v).alias("_vmax"))
    bucket = F.when(
        F.col("_vmax") > F.col("_vmin"),
        F.least(
            F.lit(b - 1),
            F.floor(
                (v - F.col("_vmin"))
                * F.lit(float(b))
                / (F.col("_vmax") - F.col("_vmin"))
            ),
        ),
    ).otherwise(F.lit(0)).cast("long")
    counts = (
        df.crossJoin(F.broadcast(bounds))
        .groupBy(g.alias("_g"), bucket.alias("_b"))
        .agg(F.count("*").cast("long").alias("_cs"))
    )
    gcounts = counts.groupBy("_b").agg(F.sum("_cs").alias("_cg"))
    gtotal = gcounts.agg(F.sum("_cg").cast("long").alias("_ng"))
    spine = (
        counts.select("_g")
        .distinct()
        .select("_g", F.explode(F.sequence(F.lit(0), F.lit(b - 1))).alias("_b"))
        .select("_g", F.col("_b").cast("long").alias("_b"))
    )
    dense = (
        spine.join(counts, ["_g", "_b"], "left")
        .join(F.broadcast(gcounts), "_b", "left")
        .select(
            "_g",
            "_b",
            F.coalesce("_cs", F.lit(0)).cast("long").alias("_cs"),
            F.coalesce("_cg", F.lit(0)).cast("long").alias("_cg"),
        )
    )
    per = dense.groupBy("_g").agg(
        F.sum("_cs").cast("long").alias("n_rows"),
        F.array_sort(
            F.collect_list(F.struct("_b", "_cs", "_cg"))
        ).alias("_l"),
    ).crossJoin(F.broadcast(gtotal))
    nsb = (F.col("n_rows") + F.lit(b)).cast("double")
    ngb = (F.col("_ng") + F.lit(b)).cast("double")

    def term(x):
        p = (x["_cs"] + F.lit(1)).cast("double") / nsb
        q = (x["_cg"] + F.lit(1)).cast("double") / ngb
        return (p - q) * F.log(p / q)

    psi = F.aggregate(
        F.transform("_l", term), F.lit(0.0), lambda acc, x: acc + x
    )
    return per.select(
        F.col("_g").alias(group_col),
        "n_rows",
        F.floor(psi * F.lit(1_000_000.0) + F.lit(0.5)).cast("long").alias(
            "psi_e6"
        ),
    )


def key_skew_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Join/groupBy-key skew diagnosis in ONE pass: for each candidate
    key column, the exact concentration stats that predict whether a
    shuffle on that key survives 100 TB — distinct key count, the
    heaviest key and its share, and the Herfindahl concentration
    (HHI = Σ share², 1e6-scaled: ~0 = uniform, 1e6 = one key owns
    everything). The pre-flight check before choosing a join key,
    bucketing column, or salting strategy (AQE's skew split reacts at
    runtime; this measures BEFORE the job).

    Unlike :func:`mixture_concentration` (per-group collect over a
    CATEGORY-bounded list), key cardinality is unbounded (a join key
    can hold 10^9 distincts), so nothing is ever collected: the
    columns melt map-side to (col_name, value) pairs (positional
    struct literals — a SQL-hostile column name never reaches a parsed
    string, the profile_columns discipline), ONE shuffle aggregates
    (col_name, value) counts, and the per-column reduction is a
    map-side-combinable aggregate over key-count-sized input. No sort,
    no window, no collect — the Gini coefficient is deliberately NOT
    offered (it needs a global frequency rank, a key-count-sized
    sort); HHI + max-share carry the same signal sort-free.

    Exactness: counts are BIGINTs; Σc² runs in DECIMAL(38,0) (two
    hot keys of 10^13 rows would overflow a BIGINT square) and
    ``hhi_e6 = (Σc² * 1e6) div n²`` / ``max_share_e6 = (max_c * 1e6)
    div n`` are pure integer floor-divisions — no doubles anywhere,
    bit-identical across engines and partitionings. ``top_key`` ties
    break toward the lexicographically LARGEST key (max over a
    (count, key) struct).

    NULLs are excluded from key stats (SQL grouping semantics would
    make them a key; a join drops them) and reported as ``n_nulls``;
    ``n_nonnull`` is the share denominator. Values are compared as
    strings (the melt must union heterogeneous column types).

    Returns one row per profiled column: (col_name, n_nonnull,
    n_nulls, n_keys, max_freq, max_share_e6, hhi_e6, top_key).
    """
    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        df[c].cast("string").alias("v"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select("p.col_name", "p.v")
    counts = (
        melted.filter(F.col("v").isNotNull())
        .groupBy("col_name", "v")
        .agg(F.count("*").cast("long").alias("c"))
    )
    nulls = (
        melted.filter(F.col("v").isNull())
        .groupBy("col_name")
        .agg(F.count("*").cast("long").alias("n_nulls"))
    )
    per_col = counts.groupBy("col_name").agg(
        F.sum("c").cast("long").alias("n_nonnull"),
        F.count("*").cast("long").alias("n_keys"),
        F.max("c").cast("long").alias("max_freq"),
        F.sum(
            F.col("c").cast("decimal(19,0)") * F.col("c").cast("decimal(19,0)")
        ).cast("decimal(38,0)").alias("_sumsq"),
        F.max(F.struct(F.col("c"), F.col("v"))).alias("_top"),
    )
    # floor-division done EXACTLY: BIGINT div where the numerator fits
    # (max_freq * 1e6 needs max_freq <= 9.2e12), and for the DECIMAL
    # numerator the (q - q % d) / d identity — Spark's plain decimal
    # division ROUNDS the quotient at the result scale (HALF_UP),
    # which can bump a just-below-integer quotient past DuckDB's exact
    # // floor; subtracting the remainder first makes the division
    # exact-integral, immune to scale rounding.
    return (
        per_col.join(nulls, "col_name", "left")
        .withColumn(
            "_q", (F.col("_sumsq") * F.lit(1_000_000)).cast("decimal(38,0)")
        )
        .withColumn(
            "_d",
            (
                F.col("n_nonnull").cast("decimal(19,0)")
                * F.col("n_nonnull").cast("decimal(19,0)")
            ).cast("decimal(38,0)"),
        )
        .select(
            "col_name",
            "n_nonnull",
            F.coalesce("n_nulls", F.lit(0)).cast("long").alias("n_nulls"),
            "n_keys",
            "max_freq",
            F.expr("(max_freq * 1000000L) div n_nonnull")
            .cast("long")
            .alias("max_share_e6"),
            F.expr("CAST((_q - _q % _d) / _d AS BIGINT)").alias("hhi_e6"),
            F.col("_top.v").alias("top_key"),
        )
    )
