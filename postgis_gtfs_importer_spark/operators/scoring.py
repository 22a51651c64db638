"""Model scoring — the hashing-trick linear classifier, Spark-first.

A trained quality classifier (fastText-style linear model over hashed
bag-of-words) is the standard corpus-filtering step between heuristics
(functions/text.py quality scores) and an LLM judge. At 100 TB the only
viable plan is: featurize map-side, broadcast the weight vector, reduce
per document — the corpus never shuffles for the model, only the
(doc, score) aggregate exchanges. That plan is exactly what these
operators produce; swap ``linear_weights``' deterministic fixture for a
trained coefficient table (same (bucket, w_e3) schema, e.g. exported
from pyspark.ml LogisticRegression) for production.

Weights are integers (fixed-point 1e-3), so scores are exact BIGINT sums
— aggregation-order-independent and bit-replayable by DuckDB: the
whole scoring pass is oracle-checked, which no opaque model binary
would allow. Feature hashing uses the 32-bit md5-prefix idiom shared
with MinHash (operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def h32(col: Column | str) -> Column:
    """32-bit bucket key from md5 — cross-engine deterministic
    (DuckDB twin: CAST(('0x' || substr(md5(v), 1, 8)) AS BIGINT))."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def hashed_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dims: int = 1024,
) -> DataFrame:
    """Hashing-trick featurization: token → md5 bucket in [0, dims).

    Map-side only (explode + hash + modulo inside codegen); the
    (id, bucket, tf) aggregate is the first shuffle and is
    partial-aggregated before it. Empty documents yield no rows.

    Returns (id, bucket, tf).
    """
    from .dedup import token_rows

    toks = token_rows(df, id_col, text_col)
    return (
        toks.withColumn("bucket", h32("tok") % dims)
        .groupBy("id", "bucket")
        .agg(F.count("*").cast("long").alias("tf"))
    )


def linear_weights(
    spark: SparkSession, dims: int = 1024, seed: str = "w"
) -> DataFrame:
    """Deterministic integer weight table (bucket, w_e3), w_e3 in
    [-1000, 1000] — the replayable stand-in for trained coefficients.
    Tiny (dims rows): always broadcast."""
    return spark.range(dims).select(
        F.col("id").alias("bucket"),
        (
            h32(F.concat(F.lit(seed + ":"), F.col("id").cast("string")))
            % 2001
            - 1000
        ).alias("w_e3"),
    )


def score_documents(
    df: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dims: int = 1024,
    threshold_e3: int = 0,
) -> DataFrame:
    """Linear score per document: sum over token occurrences of the
    token bucket's weight (= Σ_b tf_b · w_b), plus a keep/drop label.

    Plan: tokens hash map-side, the weight table broadcasts, and ONE
    shuffle (keyed on the doc id, partial-summed map-side) produces the
    scores. Integer arithmetic end to end. Documents with no tokens
    produce no row (same contract as hashed_features).

    Returns (id, n_tokens, score_e3, label).
    """
    from .dedup import token_rows

    toks = token_rows(df, id_col, text_col).withColumn(
        "bucket", h32("tok") % dims
    )
    scored = (
        toks.join(F.broadcast(weights), "bucket")
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("w_e3").cast("long").alias("score_e3"),
        )
    )
    return scored.withColumn(
        "label",
        F.when(F.col("score_e3") >= threshold_e3, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long"),
    )


COMPRESSION_SCHEMA = "doc_id long, n_bytes long, n_compressed long, ratio_e6 long"


def compression_ratio(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio — the classic repetitiveness
    signal (Gopher/RefinedWeb-style): highly compressible text is
    boilerplate, templating or token loops; incompressible text is
    usually either high-entropy junk or natural prose, disambiguated by
    pairing with the LM-fluency score. ratio_e6 =
    floor(n_compressed * 1e6 / n_bytes + 0.5); empty documents report
    ratio 1e6 (uncompressible by convention) so they gate on length,
    not here.

    An Arrow-batched mapInPandas kernel (stdlib zlib, one DEFLATE pass
    per doc — the hot loop is C): Python is genuinely required, so it
    rides the sanctioned batch path; bytes stay partition-local and the
    output is metadata-only. No SQL oracle exists (DuckDB has no zlib);
    the exactness check is the direct-zlib comparison in
    tests/test_scoring.py — deterministic for a pinned zlib, which is
    the per-container reality a production fleet pins anyway.
    """
    from collections.abc import Iterator

    import pandas as pd

    id_c, txt = id_col, text_col

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in batches:
            raw = [
                (t if isinstance(t, str) else "").encode("utf-8")
                for t in pdf[txt]
            ]
            comp = [len(zlib.compress(b, level)) for b in raw]
            n = [len(b) for b in raw]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_c].astype("int64"),
                    "n_bytes": n,
                    "n_compressed": comp,
                    "ratio_e6": [
                        (c * 1_000_000 + (b // 2)) // b if b else 1_000_000
                        for c, b in zip(comp, n)
                    ],
                }
            )

    return df.select(id_c, txt).mapInPandas(score, COMPRESSION_SCHEMA)


def quantile_normalize(
    df: DataFrame,
    score_col: str,
    stratum_col: str | None = None,
    out_col: str = "pr_e6",
) -> DataFrame:
    """Quantile-normalize a score within each stratum: percent-rank in
    parts-per-million, computed entirely in integers.

    Heterogeneous quality scorers (LM perplexity, classifier logits,
    compression ratio) live on incomparable scales; mixing corpora by
    score requires mapping each to its within-stratum quantile first
    (the CCNet/RefinedWeb "percentile bucket" trick). percent_rank()
    itself is a float division; here the identical quantity is
    ``((rank - 1) * 1_000_000) div (n - 1)`` — BIGINT-exact, so Spark
    and the DuckDB oracle agree bit-for-bit, and ties (same score, same
    stratum) receive the same normalized value by construction (rank(),
    not row_number()). Single-row strata normalize to 0.

    One window shuffle on the stratum key. The UNSTRATIFIED path
    (stratum_col=None) routes through operators/ranking.py::global_rank:
    a no-key Window.partitionBy() funnels the whole table through ONE
    task — exactly the trap global_rank (range partition + offset
    cascade) exists to avoid; its green driver row proves the two-phase
    rank equals the single-task definition. The per-stratum path keeps
    the plain window (strata are the parallelism).
    """
    if stratum_col is None:
        from .ranking import global_rank

        from pyspark.sql import functions as _F

        ranked = global_rank(df, [F.col(score_col)], rank_col="_rk")
        n_row = _F.broadcast(
            df.agg(F.count("*").cast("long").alias("_n"))
        )
        return (
            ranked.crossJoin(n_row)
            .withColumn(
                out_col,
                F.expr(
                    "case when _n > 1"
                    " then ((_rk - 1) * 1000000) div (_n - 1)"
                    " else 0 end"
                ).cast("long"),
            )
            .drop("_rk", "_n")
        )
    w = Window.partitionBy(stratum_col).orderBy(F.col(score_col))
    w_all = Window.partitionBy(stratum_col)
    return (
        df.withColumn("_rk", F.rank().over(w).cast("long"))
        .withColumn("_n", F.count("*").over(w_all).cast("long"))
        .withColumn(
            out_col,
            F.expr(
                "case when _n > 1"
                " then ((_rk - 1) * 1000000) div (_n - 1)"
                " else 0 end"
            ).cast("long"),
        )
        .drop("_rk", "_n")
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
    k: int = 3,
) -> DataFrame:
    """Robust per-group outlier flagging via median absolute deviation,
    computed entirely in integers.

    Mean/stddev gates break on the very outliers they hunt (a single
    10^9 value drags the mean); median ± k·MAD does not. ``value_col``
    must be integral (quantize floats to cents/micros first — the same
    discipline as fixed_point()). The median is the LOWER median,
    selected by rank: the value at row (n+1) div 2 in (value, id) order
    — an exact, engine-identical element of the data, no interpolation,
    no float percentile boundary. MAD is the lower median of
    |v - median| the same way. A row is an outlier iff
    |v - med| > k * MAD — all BIGINT comparisons.

    Plan: two window passes over the group key (median, then deviation
    median) plus a broadcast join of the per-group stats back to the
    rows; the table shuffles on the group key once per pass, stats are
    group-count-sized. Returns input + med, mad, is_outlier.
    """
    v = F.col(value_col).cast("long")

    def lower_median(frame: DataFrame, col: str, out: str) -> DataFrame:
        w = Window.partitionBy(group_col).orderBy(F.col(col), F.col(id_col))
        wg = Window.partitionBy(group_col)
        return (
            frame.withColumn("_rn", F.row_number().over(w))
            .withColumn("_n", F.count("*").over(wg))
            .filter(F.col("_rn") == F.expr("(_n + 1) div 2"))
            .select(group_col, F.col(col).cast("long").alias(out))
        )

    meds = lower_median(df.select(group_col, id_col, v.alias("_v")), "_v", "med")
    with_med = df.withColumn("_v", v).join(F.broadcast(meds), group_col)
    devs = with_med.withColumn("_dev", F.abs(F.col("_v") - F.col("med")))
    mads = lower_median(
        devs.select(group_col, id_col, F.col("_dev").alias("_d")), "_d", "mad"
    )
    return (
        devs.join(F.broadcast(mads), group_col)
        .withColumn("is_outlier", (F.col("_dev") > F.lit(int(k)) * F.col("mad")))
        .drop("_v", "_dev")
    )


def robust_scale(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
) -> DataFrame:
    """Robust per-group scaling: (v - median) normalized by the IQR,
    in exact integer ppm — the outlier-immune cousin of z-scoring
    (mean/stddev move with the outliers; median/IQR do not), and the
    third member of the robust-statistics family with quantile_normalize
    and mad_outliers.

    The quartiles are rank-SELECTED elements (rank ceil(n/4) and
    ceil(3n/4) in (value, id) order) — actual data values, no
    interpolation, so both engines pick identical BIGINTs. Output
    ``scaled_ppm = ((v - med) * 1_000_000) div IQR`` (NULL when the IQR
    is 0 — a constant-middle group has no scale, reported honestly
    rather than as 0). One window pass computes all three quantile
    ranks; per-group stats broadcast back.
    """
    v = F.col(value_col).cast("long")
    w = Window.partitionBy(group_col).orderBy(v, F.col(id_col))
    wg = Window.partitionBy(group_col)
    ranked = (
        df.withColumn("_v", v)
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(wg))
    )
    stats = (
        ranked.groupBy(group_col)
        .agg(
            F.max(
                F.when(F.col("_rn") == F.expr("(_n + 1) div 2"), F.col("_v"))
            ).alias("med"),
            F.max(
                F.when(F.col("_rn") == F.expr("(_n + 3) div 4"), F.col("_v"))
            ).alias("q1"),
            F.max(
                F.when(F.col("_rn") == F.expr("(3 * _n + 3) div 4"), F.col("_v"))
            ).alias("q3"),
        )
    )
    return (
        df.withColumn("_v", v)
        .join(F.broadcast(stats), group_col)
        .withColumn("iqr", (F.col("q3") - F.col("q1")).cast("long"))
        .withColumn(
            "scaled_ppm",
            F.when(
                F.col("iqr") > 0,
                F.expr("((_v - med) * 1000000) div iqr"),
            ).cast("long"),
        )
        .drop("_v", "q1", "q3")
    )


def winsorized_stats(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
    lo_pct: int = 5,
    hi_pct: int = 95,
) -> DataFrame:
    """Winsorized per-group aggregates: values are clamped to the exact
    rank-selected [p_lo, p_hi] cut points before summing — the
    tail-robust mean/sum every metrics pipeline wants when a handful of
    absurd values (bot sessions, parse glitches) would otherwise own
    the average. Completes the robust-statistics family
    (quantile_normalize / mad_outliers / robust_scale).

    Cut points are ACTUAL data elements picked by integer rank in
    (value, id) order — rank ceil(n·p/100), clamped to [1, n] — no
    interpolation, no float percentile boundary, so both engines select
    identical BIGINTs (``value_col`` must be integral; quantize floats
    first). One window pass computes both ranks; the group-count-sized
    cut table broadcasts back; the clamped sum is an associative BIGINT
    aggregate with map-side combine. Two shuffles on the group key
    total — the same plan at any scale.

    NULL observations are EXCLUDED up front (the sketch-family policy:
    a NULL is no observation) — they neither count toward n nor
    participate in cut selection. Without the filter a NULL sorts
    first, can be rank-selected as a NULL cut, and greatest/least's
    NULL-skipping then silently UNclamps that side — an
    engine-dependent footgun, not a policy. A group that is entirely
    NULL disappears from the output.

    Returns one row per group:
    (group, n, lo_cut, hi_cut, sum_winsorized, n_clamped_lo,
    n_clamped_hi).
    """
    if not (0 <= lo_pct <= hi_pct <= 100):
        # Fail loudly (r7 ADVICE): an out-of-range or inverted percentile
        # makes the rank never match, the cut comes back NULL, and
        # greatest/least's NULL-skipping silently UNclamps that side —
        # the same footgun the NULL-observation filter above closes for
        # bad data must not stay open for bad arguments.
        raise ValueError(
            f"winsorized_stats requires 0 <= lo_pct <= hi_pct <= 100,"
            f" got lo_pct={lo_pct!r} hi_pct={hi_pct!r}"
        )
    v = F.col(value_col).cast("long")
    base = df.filter(F.col(value_col).isNotNull())
    w = Window.partitionBy(group_col).orderBy(v, F.col(id_col))
    wg = Window.partitionBy(group_col)
    ranked = (
        base.withColumn("_v", v)
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(wg))
    )
    k_lo = f"greatest(1L, ({int(lo_pct)} * _n + 99) div 100)"
    k_hi = f"greatest(1L, ({int(hi_pct)} * _n + 99) div 100)"
    cuts = ranked.groupBy(group_col).agg(
        F.max(F.when(F.col("_rn") == F.expr(k_lo), F.col("_v"))).alias("lo_cut"),
        F.max(F.when(F.col("_rn") == F.expr(k_hi), F.col("_v"))).alias("hi_cut"),
        F.max("_n").cast("long").alias("n"),
    )
    clamped = base.withColumn("_v", v).join(F.broadcast(cuts), group_col)
    return clamped.groupBy(group_col).agg(
        F.max("n").alias("n"),
        F.max("lo_cut").alias("lo_cut"),
        F.max("hi_cut").alias("hi_cut"),
        F.sum(F.greatest(F.least(F.col("_v"), F.col("hi_cut")), F.col("lo_cut")))
        .cast("long")
        .alias("sum_winsorized"),
        F.sum(F.when(F.col("_v") < F.col("lo_cut"), 1).otherwise(0))
        .cast("long")
        .alias("n_clamped_lo"),
        F.sum(F.when(F.col("_v") > F.col("hi_cut"), 1).otherwise(0))
        .cast("long")
        .alias("n_clamped_hi"),
    )


#: Cumulative Poisson(1) probabilities P(X <= k), k = 0..6: the inverse-
#: CDF thresholds for deterministic Poisson resample weights. Fixed
#: decimal literals so every engine parses the identical doubles; mass
#: beyond k=7 is ~1e-5 and is folded into the top bucket.
POISSON1_CDF = (
    0.36787944117144233,
    0.7357588823428846,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
)


def poisson_bootstrap_ci(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    id_col: str,
    b: int = 16,
    value_digits: int = 2,
    salt: str = "pb",
) -> DataFrame:
    """Deterministic Poisson bootstrap: per-group uncertainty for the
    mean without a second pass or a row blow-up — THE bootstrap that
    scales (Chamandy et al. 2012, "Estimating uncertainty for massive
    data streams": resampling n-of-n with replacement is impossible
    when no node sees all n, but per-row independent Poisson(1) counts
    approximate multinomial resample weights to O(1/n)).

    Determinism: resample r gives row i the weight
    ``k = Poisson1_invCDF(u(salt, r, i))`` with u the md5-uniform of
    (salt, r, id) — the A-ES recipe (curation.weighted_sample_aes), so
    every engine replays the identical resamples; the CDF thresholds
    are fixed decimal literals (no transcendental evaluated at
    runtime). Values are fixed-point cents; every resample mean is a
    truncating integer division — the whole trace is exact.

    Scale shape — the reason this form and not explode×B: the B
    resamples become 2·B extra AGGREGATE COLUMNS (Σk_r, Σv·k_r) in the
    ONE map-side-combined groupBy, so the input is scanned once and
    nothing is replicated B-fold through a shuffle; the per-group
    resample means are then an in-row array sort over B values. At
    100 TB with B=16 this costs one exchange of |groups|·33 longs.

    Returns per group: ``n_rows``, ``mean_c`` (full-sample truncating
    mean), ``n_boot`` (resamples with ≥1 sampled row), and the exact
    rank-selected resample means ``boot_lo_c`` (2nd smallest),
    ``boot_med_c`` (lower median), ``boot_hi_c`` (2nd largest) — at
    B=16 approximately the 10th/50th/90th percentiles of the sampling
    distribution. Rows with a NULL group key, NULL id, or NULL value
    are EXCLUDED up front (a NULL value would hit Σv·k but not Σk,
    silently biasing every resample mean — the fail-loudly discipline).
    """
    if int(b) < 2:
        raise ValueError(f"poisson_bootstrap_ci needs b >= 2, got {b}")
    reserved = {
        "n_rows", "n_boot", "mean_c", "boot_lo_c", "boot_med_c",
        "boot_hi_c",
    } & set(group_cols)
    if reserved:
        # a group key named like an output aggregate would silently
        # produce duplicate columns (the asof-family lesson: loud
        # ValueError, not a downstream surprise)
        raise ValueError(
            f"poisson_bootstrap_ci group_cols collide with output"
            f" column names {sorted(reserved)} — rename them first"
        )
    from .sketches import KEY_SPACE

    keep = F.col(id_col).isNotNull() & F.col(value_col).isNotNull()
    for c in group_cols:
        keep = keep & F.col(c).isNotNull()
    vc = F.floor(
        F.col(value_col) * (10 ** int(value_digits)) + F.lit(0.5)
    ).cast("long")

    def weight(r: int) -> Column:
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        # every seed component separated: with no
                        # salt/r separator, ('pb1', id='5:x') and
                        # ('pb15', id='x') would hash identically,
                        # aliasing weights across resamples (r8 ADVICE)
                        F.lit(f"{salt}:{r}:"), F.col(id_col).cast("string")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        u = (h + F.lit(1).cast("long")).cast("double") / F.lit(KEY_SPACE)
        k = F.when(u < F.lit(POISSON1_CDF[0]), F.lit(0))
        for i in range(1, len(POISSON1_CDF)):
            k = k.when(u < F.lit(POISSON1_CDF[i]), F.lit(i))
        return k.otherwise(F.lit(len(POISSON1_CDF))).cast("long")

    # Pre-project each resample weight ONCE per row (r11): inside the
    # aggregate the md5-uniform weight expression appeared twice per
    # resample (sum(w) and sum(v*w)) — 2·B copies of a large md5+CDF
    # expression tree that Catalyst re-analyzes per query and the
    # executor re-evaluates per row (aggregate subexpression
    # elimination does not span aggregate functions). One projection
    # evaluates each weight once and the aggregate references plain
    # columns; results are bit-identical.
    proj = df.filter(keep).select(
        *[F.col(c) for c in group_cols],
        vc.alias("__pbv"),
        *[weight(r).alias(f"__pbw{r}") for r in range(int(b))],
    )
    aggs = [
        F.count("*").alias("n_rows"),
        F.sum("__pbv").alias("_sv"),
    ]
    for r in range(int(b)):
        w = F.col(f"__pbw{r}")
        aggs.append(F.sum(w).alias(f"_sk{r}"))
        aggs.append(F.sum(F.col("__pbv") * w).alias(f"_svk{r}"))
    g = proj.groupBy(*[F.col(c) for c in group_cols]).agg(*aggs)

    means = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.expr(f"case when _sk{r} > 0 then _svk{r} div _sk{r} end")
                    for r in range(int(b))
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    g = g.withColumn("_ms", means).withColumn(
        "_nb", F.size("_ms").cast("int")
    )
    return g.filter(F.col("_nb") >= 1).select(
        *group_cols,
        "n_rows",
        F.expr("_sv div n_rows").alias("mean_c"),
        F.col("_nb").cast("long").alias("n_boot"),
        F.element_at("_ms", F.least(F.lit(2), F.col("_nb"))).alias(
            "boot_lo_c"
        ),
        F.element_at(
            "_ms", F.expr("(_nb + 1) div 2").cast("int")
        ).alias("boot_med_c"),
        F.element_at(
            "_ms", F.greatest(F.col("_nb") - 1, F.lit(1))
        ).alias("boot_hi_c"),
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    pos_col: str,
    bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins for a scored, labeled relation: does a
    classifier's score track the observed positive rate? The standard
    ML-eval companion to score_documents (whose scores feed corpus
    keep/drop gates — a miscalibrated gate silently shifts the corpus
    mixture).

    ``bins`` equal-WIDTH buckets over the observed integer score range
    [min, max] — equal-width (not quantile) because the bounds are a
    1-row broadcast (the tvd_drift scalar pattern) and the binning
    stays a pure map-side expression; quantile binning would need a
    global rank pass. All arithmetic is integer: bucket =
    least(bins−1, (score−lo)·bins div (hi−lo+1)), per-bin mean a
    truncating division, positive rate e6 fixed-point. Returns
    (bin, n_docs, mean_score_e3, pos_rate_e6) — one exchange for the
    grouped aggregate.

    Rows with a NULL score or NULL label are EXCLUDED up front (a NULL
    label would count in n_docs but not the positive sum, silently
    deflating the observed rate).
    """
    if int(bins) < 1:
        raise ValueError(f"calibration_bins needs bins >= 1, got {bins}")
    src = df.filter(
        F.col(score_col).isNotNull() & F.col(pos_col).isNotNull()
    ).select(
        F.col(score_col).cast("long").alias("_s"),
        F.col(pos_col).cast("long").alias("_p"),
    )
    bounds = src.agg(F.min("_s").alias("_lo"), F.max("_s").alias("_hi"))
    binned = src.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.lit(int(bins) - 1),
            F.expr(f"((_s - _lo) * {int(bins)}) div greatest(_hi - _lo + 1, 1)"),
        ).cast("long").alias("bin"),
        "_s",
        "_p",
    )
    return binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.expr("sum(_s) div count(*)").cast("long").alias("mean_score_e3"),
        F.expr("(sum(_p) * 1000000) div count(*)")
        .cast("long")
        .alias("pos_rate_e6"),
    )


def poisson_weight(salt: str, r: int, id_col: str) -> Column:
    """Deterministic Poisson(1) resample weight for row ``id_col`` in
    resample ``r`` — the poisson_bootstrap_ci construction exposed for
    composition (ab_lift_ci shares it): md5-uniform from the
    separated-component seed ``{salt}:{r}:{id}``, inverted through the
    Poisson(1) CDF ladder. Every engine replays identical weights.
    """
    from .sketches import KEY_SPACE

    h = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit(f"{salt}:{r}:"), F.col(id_col).cast("string"))
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(1).cast("long")).cast("double") / F.lit(KEY_SPACE)
    k = F.when(u < F.lit(POISSON1_CDF[0]), F.lit(0))
    for i in range(1, len(POISSON1_CDF)):
        k = k.when(u < F.lit(POISSON1_CDF[i]), F.lit(i))
    return k.otherwise(F.lit(len(POISSON1_CDF))).cast("long")


def ab_lift_ci(
    df: DataFrame,
    variant_col: str,
    value_col: str,
    id_col: str,
    control: str,
    treatment: str,
    b: int = 16,
    value_digits: int = 2,
    salt: str = "ab",
) -> DataFrame:
    """A/B mean-lift with a deterministic Poisson-bootstrap CI — the
    experiment-analysis primitive on top of poisson_bootstrap_ci's
    machinery: ``diff = mean(treatment) - mean(control)`` in exact
    cents, plus the B-resample distribution of that difference
    (Chamandy et al. 2012 — per-row Poisson(1) weights make the
    bootstrap a single streaming aggregate; the SAME row keeps the
    SAME weight in both arms' sums per resample, which is exactly the
    paired-replay discipline that makes resample diffs comparable).

    ONE map-side-combined single-row aggregate over the whole fact:
    per resample r and per arm, ``sum(w_r)`` and ``sum(v·w_r)`` as
    CASE-guarded columns (4·B + 4 aggregate columns, no row blow-up —
    the poisson_bootstrap_ci shape doubled). Resample diffs are exact
    integer-cent differences of truncating-division means, rank-
    selected from the in-row sorted array (lo ≈ p10, med, hi ≈ p90 at
    B=16). Rows with a NULL variant/value/id are excluded; rows in
    OTHER variants are excluded by construction (an A/B/n test runs
    one call per comparison). If either arm is empty the diff and CI
    are NULL — visible, not fabricated.

    Returns ONE row: (n_control, n_treatment, mean_control_c,
    mean_treatment_c, diff_c, n_boot, boot_lo_c, boot_med_c,
    boot_hi_c).
    """
    if int(b) < 2:
        raise ValueError(f"ab_lift_ci needs b >= 2, got {b}")
    keep = (
        F.col(id_col).isNotNull()
        & F.col(value_col).isNotNull()
        & F.col(variant_col).isin(control, treatment)
    )
    vc = F.floor(
        F.col(value_col) * (10 ** int(value_digits)) + F.lit(0.5)
    ).cast("long")
    # Pre-project each resample weight ONCE per row (r11, the
    # poisson_bootstrap_ci rationale doubled: the arm-guarded aggregate
    # held FOUR copies of the md5+CDF weight tree per resample —
    # sum(w)/sum(v·w) × both arms. Catalyst planning on the 4·B-copy
    # tree was measured at ~1.9 s of the query's 1.9 s warm time at
    # sf0.1 — the whole query was planning. One projection per row,
    # plain column refs in the aggregate, bit-identical results.)
    is_t = F.col(variant_col) == treatment
    proj = df.filter(keep).select(
        is_t.alias("__abt"),
        vc.alias("__abv"),
        *[
            poisson_weight(salt, r, id_col).alias(f"__abw{r}")
            for r in range(int(b))
        ],
    )
    is_t = F.col("__abt")
    vc = F.col("__abv")
    aggs = [
        F.sum(F.when(~is_t, 1).otherwise(0)).cast("long").alias("n_control"),
        F.sum(F.when(is_t, 1).otherwise(0)).cast("long").alias(
            "n_treatment"
        ),
        F.sum(F.when(~is_t, vc)).alias("_svc"),
        F.sum(F.when(is_t, vc)).alias("_svt"),
    ]
    for r in range(int(b)):
        w = F.col(f"__abw{r}")
        aggs.append(F.sum(F.when(~is_t, w)).alias(f"_skc{r}"))
        aggs.append(F.sum(F.when(~is_t, vc * w)).alias(f"_svkc{r}"))
        aggs.append(F.sum(F.when(is_t, w)).alias(f"_skt{r}"))
        aggs.append(F.sum(F.when(is_t, vc * w)).alias(f"_svkt{r}"))
    g = proj.agg(*aggs)
    diffs = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.expr(
                        f"case when _skt{r} > 0 and _skc{r} > 0 then"
                        f" (_svkt{r} div _skt{r}) - (_svkc{r} div _skc{r})"
                        f" end"
                    )
                    for r in range(int(b))
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    g = g.withColumn("_ds", diffs).withColumn(
        "_nb", F.size("_ds").cast("int")
    )
    mean_c = F.expr("case when n_control > 0 then _svc div n_control end")
    mean_t = F.expr(
        "case when n_treatment > 0 then _svt div n_treatment end"
    )
    sel = lambda idx: F.when(  # noqa: E731 — local rank selector
        F.col("_nb") >= 1, F.element_at("_ds", idx)
    )
    return g.select(
        "n_control",
        "n_treatment",
        mean_c.alias("mean_control_c"),
        mean_t.alias("mean_treatment_c"),
        (mean_t - mean_c).alias("diff_c"),
        F.col("_nb").cast("long").alias("n_boot"),
        sel(F.least(F.lit(2), F.col("_nb"))).alias("boot_lo_c"),
        sel(F.expr("(_nb + 1) div 2").cast("int")).alias("boot_med_c"),
        sel(F.greatest(F.col("_nb") - 1, F.lit(1))).alias("boot_hi_c"),
    )
