"""Distinct-counting sketches — KMV and HyperLogLog, deterministic.

``approx_count_distinct`` exists in Spark, but its HLL++ register layout
is engine-private: the result can't be oracle-checked, merged outside
Spark, or persisted for reuse by another system. These operators build
the sketches RELATIONALLY from an md5-derived 60-bit key, so:

  * every intermediate (keys, registers) is a plain DataFrame — the
    sketch state itself is queryable, persistable, and mergeable with
    ``max``/``min`` aggregates (union two corpora's registers and re-max:
    that IS the HLL merge);
  * DuckDB replays the whole computation bit-for-bit (the driver's
    correctness gate), because the hash, the bucket split, the rank and
    the single IEEE division of the estimator are all exact expressions
    shared by both engines.

At 100 TB the point of a sketch is shuffle volume: exact
``count(DISTINCT user_id)`` shuffles every distinct (group, value) pair;
KMV shuffles at most ``k`` 8-byte keys per group AFTER a map-side
partial top-k, HLL shuffles at most ``m = 2^p`` 1-byte-wide registers
per group after a map-side partial max — both constant-size per group,
both one shuffle. The estimator error is the textbook bound
(~1/sqrt(k), ~1.04/sqrt(m)); tests assert it against exact counts.

Determinism notes: the 60-bit key is ``conv(substr(md5(v),1,15),16,10)``
(DuckDB twin: ``CAST(('0x' || substr(md5(v),1,15)) AS BIGINT)``) — same
idiom as MinHash (operators/dedup.py). The HLL estimate's only float op
is one division of two exactly-shared values; fixed-point rounding after
a single IEEE op is engine-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: 60-bit key space: 15 hex digits of md5.
KEY_BITS = 60
KEY_SPACE = float(2**KEY_BITS)


def h60(col: Column | str) -> Column:
    """60-bit uniform key from md5 — cross-engine deterministic."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def kmv_sketch(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = 64
) -> DataFrame:
    """K-minimum-values sketch state per group: the k smallest keys.

    Distinct (group, key) → per-group ascending row_number → keep k.
    The distinct aggregate is the map-side combine (duplicate values
    collapse before the shuffle); the window moves at most the distinct
    keys. Persist this to merge later: union + re-rank is the KMV merge.

    NULL policy (all four sketch families alike): NULL values are
    EXCLUDED explicitly, same contract as fixed_histogram. Without the
    filter a NULL key diverges ACROSS ENGINES — Spark ranks NULLS FIRST
    in an ascending window (consuming a top-k slot and shifting a real
    key out) while DuckDB ranks them LAST; in HLL a NULL forms a
    phantom register row that corrupts the m - n_buckets term; in
    CMS/Bloom Spark's concat() nulls the whole preimage while DuckDB's
    concat() SKIPS null arguments. A NULL has no place in a
    distinct/frequency/membership domain; count it separately.

    Returns (group..., h, rn), rn <= k.
    """
    keys = (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, h60(value_col).alias("h"))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy(F.asc("h"))
    return keys.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )


def kmv_distinct(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = 64
) -> DataFrame:
    """KMV distinct-count estimate per group.

    With fewer than k keys the sketch is exhaustive and the answer exact;
    otherwise est = (k-1) * 2^60 / kth_min — the classic KMV estimator,
    computed as ONE IEEE division of two exactly-shared numbers then
    fixed-point rounded (engine-identical).

    Returns (group..., n_keys, kth, est_distinct).
    """
    agg = kmv_sketch(df, group_cols, value_col, k).groupBy(
        *group_cols
    ).agg(
        F.count("*").cast("long").alias("n_keys"),
        F.max("h").alias("kth"),
    )
    est = F.floor(
        F.lit(float(k - 1) * KEY_SPACE) / F.col("kth").cast("double")
        + F.lit(0.5)
    ).cast("long")
    return agg.withColumn(
        "est_distinct",
        F.when(F.col("n_keys") < k, F.col("n_keys")).otherwise(est),
    )


def hll_registers(
    df: DataFrame, group_cols: list[str], value_col: str, p: int = 6
) -> DataFrame:
    """HLL register table per group: (group..., bucket, register).

    bucket = top ``p`` bits of the 60-bit key; register = max over the
    bucket's keys of (position of the highest set bit of the remaining
    ``w = 60 - p`` bits, counted from the top, + 1) — i.e.
    ``w - bit_length(rem) + 1``, with all-zero rem → ``w + 1``.
    bit_length is ``length(conv(rem, 10, 2))`` (DuckDB:
    ``length(format('{:b}', rem))``) — exact string/integer ops, no log2.

    The groupBy(max) is partial-aggregated map-side, so the shuffle
    carries <= 2^p rows per group per input partition. Registers are
    mergeable state: union + re-max = HLL merge.
    """
    w_bits = KEY_BITS - p
    rem_mod = 2**w_bits
    h = h60(value_col)
    bucket = F.expr(f"_h div {rem_mod}").cast("long")
    rem = F.col("_h") % F.lit(rem_mod)
    bitlen = F.length(F.conv(F.col("_rem"), 10, 2))
    rank = F.when(F.col("_rem") == 0, F.lit(w_bits + 1)).otherwise(
        F.lit(w_bits) - bitlen + 1
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, h.alias("_h"))
        .withColumn("bucket", bucket)
        .withColumn("_rem", rem)
        .withColumn("_rank", rank)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("_rank").cast("long").alias("register"))
    )


def hll_alpha(m: int) -> float:
    """Standard HLL bias constant for m >= 64."""
    return 0.7213 / (1.0 + 1.079 / m)


def hll_merge(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge HLL register tables: union the inputs beforehand, then this
    re-max per (group, bucket). Register state is max-linear, so merging
    per-shard sketches is EXACTLY equivalent to sketching the union —
    the property that lets 1000 executors sketch independently and roll
    up without touching raw data again (pinned by the hll_merge_shards
    registry query against a direct-global oracle)."""
    return registers.groupBy(*group_cols, "bucket").agg(
        F.max("register").cast("long").alias("register")
    )


def hll_estimate(
    registers: DataFrame, group_cols: list[str], p: int = 6
) -> DataFrame:
    """Raw-HLL estimate from a register table (see hll_distinct for the
    arithmetic contract). Returns (group..., n_buckets, z_scaled,
    hll_est)."""
    m = 2**p
    w_bits = KEY_BITS - p
    scale = w_bits + 1
    z = registers.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n_buckets"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {scale} - register)"))
        .cast("long")
        .alias("_zp"),
    )
    z_scaled = (
        F.col("_zp") + (F.lit(m) - F.col("n_buckets")) * F.lit(2**scale)
    ).cast("long")
    num = hll_alpha(m) * m * m * float(2**scale)
    est = F.floor(
        F.lit(num) / F.col("z_scaled").cast("double") + F.lit(0.5)
    ).cast("long")
    return (
        z.withColumn("z_scaled", z_scaled)
        .withColumn("hll_est", est)
        .select(*group_cols, "n_buckets", "z_scaled", "hll_est")
    )


def hll_distinct(
    df: DataFrame, group_cols: list[str], value_col: str, p: int = 6
) -> DataFrame:
    """Raw HyperLogLog estimate per group (no small-range correction —
    the raw estimator keeps the arithmetic exact; callers needing the
    linear-counting regime should use kmv_distinct, which is exact
    there by construction).

    Z is accumulated in EXACT integer arithmetic at scale 2^(w+1):
    each register contributes ``1 << (w + 1 - register)`` and each of
    the ``m - n`` absent buckets contributes ``2^(w+1)``; the sum fits
    a BIGINT (m * 2^(w+1) = 2^(p+w+1) = 2^61). The estimate is then one
    IEEE division, fixed-point rounded.

    Returns (group..., n_buckets, z_scaled, hll_est).
    """
    return hll_estimate(
        hll_registers(df, group_cols, value_col, p), group_cols, p
    )


def cms_counters(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """Count-Min sketch counter table: (row, bucket, counter).

    The frequency complement of the KMV/HLL distinct sketches: ``depth``
    independent hash rows x ``width`` counters, each cell the count of
    items hashing into it. Hashes are md5-derived per row
    (``md5(salt || row || value)``), so the sketch is cross-engine
    deterministic and the DuckDB oracle replays it exactly.

    The sketch state is a plain DataFrame of at most depth x width rows
    REGARDLESS of corpus size — the groupBy is partial-aggregated
    map-side, so the shuffle carries <= depth x width rows per input
    partition while exact per-value counting would shuffle every
    distinct value. Union two corpora's counter tables and re-sum:
    that IS the CMS merge (counters are linear).

    Hash domains are fully separated: the preimage is
    ``salt || '|' || row || '|' || value``, so no (salt, row) pair can
    collide with another configuration's (e.g. salt='cms' row=11 vs
    salt='cms1' row=1 — ambiguous without the first separator).
    """
    rows = F.explode(
        F.array(*[F.lit(r) for r in range(depth)])
    ).alias("row")
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(salt),
                        F.lit("|"),
                        F.col("row").cast("string"),
                        F.lit("|"),
                        F.col("_v"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % width
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(F.col(value_col).cast("string").alias("_v"))
        .select("_v", rows)
        .withColumn("bucket", bucket)
        .groupBy("row", "bucket")
        .agg(F.count("*").cast("long").alias("counter"))
    )


def cms_estimate(
    df: DataFrame,
    probe: DataFrame,
    value_col: str,
    probe_col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """Point-query the Count-Min sketch: est(v) = min over rows of the
    counter at that row's bucket for v. Estimates never undercount
    (est >= true count); overcount is bounded by ~2N/width per row,
    driven to the min across ``depth`` independent rows.

    The probe side re-derives its buckets with the same md5 arithmetic
    and joins the counter table on (row, bucket) — the counter table is
    sketch-sized, so the join broadcasts; the corpus itself is touched
    only to build the counters.

    Returns (probe_col, est_count).
    """
    counters = cms_counters(df, value_col, depth, width, salt)
    rows = F.explode(
        F.array(*[F.lit(r) for r in range(depth)])
    ).alias("row")
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(salt),
                        F.lit("|"),
                        F.col("row").cast("string"),
                        F.lit("|"),
                        F.col("_p"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % width
    )
    probes = (
        probe.filter(F.col(probe_col).isNotNull())
        .select(F.col(probe_col).cast("string").alias("_p"))
        .distinct()
        .select("_p", rows)
        .withColumn("bucket", bucket)
    )
    return (
        probes.join(F.broadcast(counters), ["row", "bucket"], "left")
        .groupBy("_p")
        .agg(F.min(F.coalesce(F.col("counter"), F.lit(0))).cast("long").alias("est_count"))
        .select(F.col("_p").alias(probe_col), "est_count")
    )


def fixed_histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 256,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Fixed-range histogram sketch: (group..., bin, n) — the mergeable
    quantile/distribution state. bin = clamp(floor((v - lo) * bins /
    (hi - lo))) into [0, bins); out-of-range values clamp to the edge
    bins, so no NUMERIC value is dropped silently.

    NULL policy: NULL values are EXCLUDED explicitly. (Without the
    filter they would silently clamp into bin 0: floor(NULL) is NULL and
    greatest()/least() skip NULL operands in both Spark and DuckDB, so
    the lo-edge clamp would swallow them.) Callers needing a NULL count
    should aggregate it separately — a NULL has no place on a value axis.

    Like the CMS/HLL states: at most ``bins`` rows per group regardless
    of input size (map-side partial aggregation), counts are linear
    (union + re-sum = merge), and the bin arithmetic is one fixed IEEE
    chain both engines evaluate identically. The fixed [lo, hi) range is
    the honest contract for streaming/mergeable use — data-dependent
    bounds would make two shards' sketches unmergeable.
    """
    g = list(group_cols or [])
    raw = (
        (F.col(value_col).cast("double") - F.lit(float(lo)))
        * F.lit(float(bins))
        / F.lit(float(hi) - float(lo))
    )
    b = F.least(
        F.greatest(F.floor(raw).cast("long"), F.lit(0).cast("long")),
        F.lit(bins - 1).cast("long"),
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*g, b.alias("bin"))
        .groupBy(*g, "bin")
        .agg(F.count("*").cast("long").alias("n"))
    )


def histogram_quantile_bins(
    hist: DataFrame,
    qs: list[float],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Quantile estimates from a histogram sketch: for each q, the first
    bin whose cumulative count reaches ``ceil(q * N)`` (the type-1 /
    lower-quantile convention, all-integer once the threshold is fixed —
    no interpolation floats to drift). Resolution is the bin width; at
    256 bins that is <0.4% of the range, the classic accuracy/state
    trade every mergeable quantile sketch makes.

    Returns (group..., q_e3, bin, cum, total).
    """
    g = list(group_cols or [])
    w = (
        Window.partitionBy(*g).orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("n").over(w))
    totals = cum.groupBy(*g).agg(F.max("cum").alias("total"))
    qdf = F.broadcast(
        totals.sparkSession.createDataFrame(
            [(int(round(q * 1000)),) for q in qs], "q_e3 long"
        )
    )
    joined = (
        cum.join(totals, g) if g else cum.crossJoin(F.broadcast(totals))
    ).crossJoin(qdf)
    thresh = F.ceil(F.col("q_e3") * F.col("total") / F.lit(1000.0)).cast("long")
    return (
        joined.filter(F.col("cum") >= thresh)
        .groupBy(*g, "q_e3", "total")
        .agg(F.min("bin").cast("long").alias("bin"))
        .join(
            cum.select(*g, F.col("bin").alias("bin"), "cum"),
            [*g, "bin"],
        )
        .select(*g, "q_e3", "bin", F.col("cum").cast("long").alias("cum"), "total")
    )


def bloom_bits(
    df: DataFrame,
    value_col: str,
    m_bits: int = 8192,
    k_hashes: int = 4,
    salt: str = "bloom",
) -> DataFrame:
    """Bloom-filter state as a DataFrame: the set bit positions.

    The membership complement of the KMV/HLL/CMS family: ``k_hashes``
    md5-derived positions per value (domain-separated like the CMS:
    ``salt|row|value``), DISTINCT — at most ``m_bits`` rows regardless
    of input size, shuffled with map-side partial distinct. Union two
    corpora's bit tables and re-distinct: that IS the Bloom merge (bit
    OR). Returns (bit BIGINT) rows.
    """
    rows = F.explode(F.array(*[F.lit(r) for r in range(k_hashes)])).alias("row")
    bit = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(salt),
                        F.lit("|"),
                        F.col("row").cast("string"),
                        F.lit("|"),
                        F.col("_v"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % m_bits
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(F.col(value_col).cast("string").alias("_v"))
        .select("_v", rows)
        .select(bit.alias("bit"))
        .distinct()
    )


def bloom_probe(
    bits: DataFrame,
    probe: DataFrame,
    probe_col: str,
    m_bits: int = 8192,
    k_hashes: int = 4,
    salt: str = "bloom",
) -> DataFrame:
    """Membership query against a Bloom bit table: present iff ALL k
    positions are set. No false negatives ever; false-positive rate
    ~(1 - e^{-kn/m})^k — with deterministic md5 positions the SAME
    probes produce the SAME verdicts in every engine, which is what
    makes an approximate structure exactly oracle-checkable.

    The bit table is at most m_bits rows, so the probe join broadcasts;
    the corpus is touched only to build the bits. Returns
    (probe_col, n_hits, maybe_present BIGINT 0/1).
    """
    rows = F.explode(F.array(*[F.lit(r) for r in range(k_hashes)])).alias("row")
    bit = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(salt),
                        F.lit("|"),
                        F.col("row").cast("string"),
                        F.lit("|"),
                        F.col("_p"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % m_bits
    )
    probes = (
        probe.filter(F.col(probe_col).isNotNull())
        .select(F.col(probe_col).cast("string").alias("_p"))
        .distinct()
        .select("_p", rows)
        .withColumn("bit", bit)
    )
    hit = F.when(F.col("bit_set").isNotNull(), 1).otherwise(0)
    return (
        probes.join(
            F.broadcast(bits.withColumn("bit_set", F.lit(1))), ["bit"], "left"
        )
        .groupBy("_p")
        .agg(F.sum(hit).cast("long").alias("n_hits"))
        .select(
            F.col("_p").alias(probe_col),
            "n_hits",
            (F.col("n_hits") == k_hashes).cast("long").alias("maybe_present"),
        )
    )


def kmv_set_overlap(
    df: DataFrame, set_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """Pairwise set-OVERLAP estimates from KMV sketches (Beyer et al.
    2007) — the sketch family's set-operation completion: union +
    re-rank is the KMV merge (hll_merge_shards proves the union case);
    this adds INTERSECTION and Jaccard, the estimates audience-overlap
    / segment-similarity questions need without shuffling (setA x
    setB) pairs.

    For every pair of sets (a < b): build each set's k-min sketch,
    take K = the k smallest keys of the sketch UNION, count
    ``m = |K ∩ sketch(A) ∩ sketch(B)|``; then ``jaccard ≈ m / |K|``,
    ``|A ∪ B|`` from K's own kth-min estimator, and ``|A ∩ B| ≈
    jaccard × |A ∪ B|``. EXACT when both sets hold < k distinct keys
    (the sketches are exhaustive — pinned in tests); otherwise the
    published epsilon ~ 1/sqrt(k). All arithmetic is the documented
    KMV discipline: md5-derived 60-bit keys, ONE shared IEEE division
    for the union estimate, integer div for the ratios.

    Scale: the corpus is scanned ONCE (map-side distinct + per-set
    k-row window — the kmv_sketch shape); everything after operates on
    k-row-per-set sketch tables, so the pairwise stage is
    |sets|² × k rows — sketch-sized by construction, never
    corpus-sized. NULL values excluded (the sketch-family policy).

    Returns (set_a, set_b, n_union_keys, est_union, n_both,
    jaccard_e6, est_intersection) for each unordered pair.
    """
    sk = kmv_sketch(df, [set_col], value_col, k).select(
        F.col(set_col).alias("_s"), "h"
    )
    sets = sk.select("_s").distinct()
    pairs = (
        sets.select(F.col("_s").alias("set_a"))
        .join(
            sets.select(F.col("_s").alias("set_b")),
            F.col("set_a") < F.col("set_b"),
        )
    )
    ka = pairs.join(
        sk.select(F.col("_s").alias("set_a"), "h"), "set_a"
    ).select("set_a", "set_b", "h")
    kb = pairs.join(
        sk.select(F.col("_s").alias("set_b"), "h"), "set_b"
    ).select("set_a", "set_b", "h")
    union_keys = ka.union(kb).distinct()
    w = Window.partitionBy("set_a", "set_b").orderBy(F.asc("h"))
    topk = union_keys.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    flagged = (
        topk.join(
            ka.withColumn("_ina", F.lit(1)).select("set_a", "set_b", "h", "_ina"),
            ["set_a", "set_b", "h"],
            "left",
        )
        .join(
            kb.withColumn("_inb", F.lit(1)).select("set_a", "set_b", "h", "_inb"),
            ["set_a", "set_b", "h"],
            "left",
        )
    )
    agg = flagged.groupBy("set_a", "set_b").agg(
        F.count("*").cast("long").alias("n_union_keys"),
        F.max("h").alias("_kth"),
        F.sum(
            F.when(
                F.col("_ina").isNotNull() & F.col("_inb").isNotNull(),
                F.lit(1),
            ).otherwise(F.lit(0))
        ).cast("long").alias("n_both"),
    )
    est_union = F.when(
        F.col("n_union_keys") < k, F.col("n_union_keys")
    ).otherwise(
        F.floor(
            F.lit(float(k - 1) * KEY_SPACE) / F.col("_kth").cast("double")
            + F.lit(0.5)
        ).cast("long")
    )
    return (
        agg.withColumn("est_union", est_union)
        .select(
            "set_a", "set_b", "n_union_keys", "est_union", "n_both",
            F.expr("n_both * 1000000 div n_union_keys").alias("jaccard_e6"),
            F.expr("(n_both * est_union) div n_union_keys").alias(
                "est_intersection"
            ),
        )
    )


#: Pre-filter oversampling factor for the bottom-k quantile sample:
#: when a group holds n rows, only rows whose key falls in the lowest
#: OVERSAMPLE*k/n fraction of the key space survive to the ranking
#: shuffle. The true bottom-k is a subset of the survivors unless
#: fewer than k of the n keys land below the threshold — a binomial
#: with mean OVERSAMPLE*k, so the miss probability is Chernoff-bounded
#: by exp(-((OVERSAMPLE-1)^2 / (2*OVERSAMPLE)) * k) ~ exp(-3k) at 8:
#: ~e^-768 at the default k, zero in any universe. Cross-engine parity
#: is UNCONDITIONAL either way: the oracle applies the identical
#: threshold, so both engines see the same survivor set even in the
#: impossible underflow case.
QS_OVERSAMPLE = 8


def quantile_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    id_cols: list[str],
    k: int = 256,
) -> DataFrame:
    """Mergeable quantile sketch per group — a hash-coordinated
    BOTTOM-K row sample (the KMV discipline pointed at ranks instead
    of distincts): keep the k rows whose 60-bit md5 key over the row's
    unique identity is smallest, carrying the value alongside. The k
    retained rows are a uniform without-replacement sample of the
    group, so the r-th smallest retained value estimates the r/k
    quantile with the textbook sampling error O(sqrt(q(1-q)/k)); with
    fewer than k rows the sketch is exhaustive and every quantile
    EXACT (the KMV grace).

    Why this and not KLL/t-digest (VERDICT r10 item 3 weighed both):
    their compactions are randomized (KLL coin flips) or
    order-dependent (t-digest centroid merging), so two engines — or
    two runs — cannot replay the same state, and shard-then-merge is
    only rank-error-equivalent, never bit-equal. The bottom-k sample
    is the member of the mergeable-quantile family that satisfies this
    repo's two non-negotiables, at the price of O(1/eps^2) instead of
    KLL's O((1/eps)log^1.5(1/eps)) space for rank error eps:

      * EXACT merge algebra: bottom-k(A union B) ==
        bottom-k(bottom-k(A) union bottom-k(B)) — set identity, no
        error introduced by merging, any grouping, any order
        (:func:`quantile_sketch_merge`; property-tested
        shard-then-merge == global BIT-EQUAL).
      * bit-identical DuckDB replay: the key is the repo-standard
        ``h60`` (conv/substr/md5), selection and ranking are integer,
        and the estimator returns a STORED value untouched by
        arithmetic — nothing floats, nothing drifts.

    Scale shape: one narrow map-side count per group, one broadcast
    threshold join, then the ranking window sees ~OVERSAMPLE*k rows
    per group instead of the group (the pre-filter is what makes this
    a sketch operationally, not just statistically — without it the
    rank shuffle carries the whole table the way exact quantiles do).
    State is at most k rows per group; persist it, union shards, and
    re-rank to merge.

    ``id_cols`` must identify rows uniquely (the TESTDATA contract) —
    hashing the VALUE would collapse duplicates and sample the
    distinct-value distribution instead of the data distribution.
    NULL policy: rows with a NULL value or NULL id component are
    EXCLUDED (same contract and cross-engine rationale as the other
    sketch families).

    Returns state rows (group..., h, v, rn), rn <= k.
    """
    ids = F.concat_ws("|", *[F.col(c).cast("string") for c in id_cols])
    keyed = df.filter(
        F.col(value_col).isNotNull()
        & F.expr(" AND ".join(f"{c} IS NOT NULL" for c in id_cols))
    ).select(
        *group_cols,
        h60(ids).alias("h"),
        F.col(value_col).alias("v"),
    )
    counts = keyed.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("_n")
    )
    cap = QS_OVERSAMPLE * int(k)
    #: exact double: KEY_SPACE * cap is a power of two times a small
    #: integer; the one IEEE division below is the only float op and
    #: its operands are exactly shared with the oracle
    t_num = F.lit(float(KEY_SPACE) * cap)
    survivors = keyed.join(counts, list(group_cols)).filter(
        (F.col("_n") <= F.lit(cap))
        | (
            F.col("h")
            <= F.floor(t_num / F.col("_n").cast("double")).cast("long")
        )
    )
    w = Window.partitionBy(*group_cols).orderBy(F.asc("h"), F.asc("v"))
    return (
        survivors.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(*group_cols, "h", "v", "rn")
    )


def quantile_sketch_merge(
    states: DataFrame, group_cols: list[str], k: int = 256
) -> DataFrame:
    """Merge unioned sketch states: re-rank by key, keep the bottom k —
    the exact KMV merge algebra applied to the row sample. Input is
    the union of per-shard :func:`quantile_sketch` outputs over
    DISJOINT shards (the same row contributing twice would double its
    sample weight, exactly as in KMV). Associative and
    grouping-independent as a set identity; the property test pins
    shard-then-merge == global bit-for-bit."""
    w = Window.partitionBy(*group_cols).orderBy(F.asc("h"), F.asc("v"))
    return (
        states.select(*group_cols, "h", "v")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def quantile_sketch_quantiles(
    state: DataFrame,
    group_cols: list[str],
    qs_e6: list[int],
) -> DataFrame:
    """Quantile estimates from sketch state: for each requested
    ``q_e6`` (quantile * 1e6), the sample value at rank
    ``max(1, ceil(q * s))`` of the value-sorted sample of size s — the
    type-1/lower convention shared with histogram_quantile_bins, with
    the ceiling computed in EXACT integer arithmetic
    ``(q_e6 * s + 999999) div 1e6``. The returned value is a stored
    input value, untouched by arithmetic — bit-identical cross-engine
    by construction.

    Returns (group..., q_e6, est), one row per group per requested q.
    """
    qs_lit = ", ".join(
        str(int(q)) + "L" for q in qs_e6
    )
    picked = (
        state.groupBy(*group_cols)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("v"), F.col("h")))
            ).alias("_sv")
        )
        .select(
            *group_cols,
            F.explode(
                F.expr(
                    f"transform(array({qs_lit}), q -> struct("
                    " q AS q_e6,"
                    " element_at(_sv, CAST(greatest(1L,"
                    "   (q * size(_sv) + 999999) DIV 1000000) AS INT)).v"
                    " AS est))"
                )
            ).alias("_q"),
        )
    )
    return picked.select(*group_cols, "_q.q_e6", "_q.est")
