"""Corpus-curation operators for training-data pipelines.

Deterministic hash splits/sampling, benchmark decontamination, repetition
scoring, and PII redaction — the operations a 100 TB pretraining-data
pipeline runs after cleaning (BASELINE.json "north_star"; they extend the
reference's cleaning family, gtfsclean flags at
/root/reference/import.sh:38-111, to corpus scale).

Scale design, shared across the family:
- Split/sample assignment is a pure column expression over a key hash —
  no shuffle, no RNG state, reproducible under retries/re-partitioning
  (Spark's ``df.sample`` is seed+partition dependent; a content hash is
  not). The same expression evaluates identically in the DuckDB oracle.
- Decontamination joins the corpus against the *benchmark* shingle index,
  which is broadcast: benchmarks are KBs-to-MBs while the corpus is TBs,
  so the corpus never shuffles — the classic build-small-probe-large
  asymmetry.
- Repetition stats are per-row higher-order array functions (JVM-side,
  codegen) — embarrassingly parallel, zero shuffles.
- PII redaction is a chain of ``regexp_replace`` column expressions kept
  RE2-compatible (no lookarounds/backrefs) so the identical pattern runs
  in Spark (Java regex), DuckDB, and PostgreSQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import shingle_rows

# ---------------------------------------------------------------------------
# Deterministic hash bucketing (split + sample assignment)
# ---------------------------------------------------------------------------

#: Number of buckets the key hash is reduced into. 10_000 gives 0.01%
#: granularity for split weights/sampling rates while keeping the bucket
#: in safe BIGINT range on every engine.
HASH_BUCKETS = 10_000


def hash_bucket(key: Column | str, salt: str = "", buckets: int = HASH_BUCKETS) -> Column:
    """Stable bucket in [0, buckets) from md5 of the (salted) key string.

    First 8 hex chars of md5 -> 32-bit int -> modulo. md5 of an identical
    string is identical in Spark, DuckDB and PostgreSQL, so assignment is
    engine-portable and immune to partitioning/ordering — the property
    ``df.sample``/``rand(seed)`` do NOT have. SQL twin:
    ``CAST('0x' || substr(md5(<salt> || CAST(key AS VARCHAR)), 1, 8) AS BIGINT) % buckets``.
    """
    key_c = key if isinstance(key, Column) else F.col(key)
    keyed = F.concat(F.lit(salt), key_c.cast("string"))
    return (
        F.conv(F.substring(F.md5(keyed), 1, 8), 16, 10).cast("long") % buckets
    )


def hash_bucket_sql(key_sql: str, salt: str = "", buckets: int = HASH_BUCKETS) -> str:
    """The DuckDB/ANSI twin of :func:`hash_bucket` (same bits, same bucket)."""
    return (
        f"CAST('0x' || substr(md5('{salt}' || CAST({key_sql} AS VARCHAR)), 1, 8)"
        f" AS BIGINT) % {buckets}"
    )


def assign_split(
    key: Column | str,
    weights: dict[str, float],
    salt: str = "split",
) -> Column:
    """Deterministic train/val/test(/...) assignment from split weights.

    ``weights`` maps split name -> fraction (must sum to ~1; the last
    split absorbs rounding). Assignment is by cumulative threshold over
    :func:`hash_bucket`, so a document's split never changes when the
    corpus grows, is re-partitioned, or is re-read — the invariant that
    makes incremental 100 TB pipelines possible (re-runs never leak val
    docs into train).
    """
    bucket = hash_bucket(key, salt=salt)
    names = list(weights)
    expr: Column | None = None
    acc = 0.0
    for name in names[:-1]:
        acc += weights[name]
        cond = bucket < int(round(acc * HASH_BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def assign_split_sql(key_sql: str, weights: dict[str, float], salt: str = "split") -> str:
    """SQL twin of :func:`assign_split` (identical thresholds)."""
    bucket = hash_bucket_sql(key_sql, salt=salt)
    names = list(weights)
    parts = []
    acc = 0.0
    for name in names[:-1]:
        acc += weights[name]
        parts.append(f"WHEN ({bucket}) < {int(round(acc * HASH_BUCKETS))} THEN '{name}'")
    if not parts:
        return f"'{names[-1]}'"
    return "CASE " + " ".join(parts) + f" ELSE '{names[-1]}' END"


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    salt: str = "sample",
) -> DataFrame:
    """Keep each row with its stratum's rate, deterministically by key hash.

    The rebalancing pass of corpus curation (downsample overrepresented
    strata, keep rare ones whole). Pure filter — no shuffle, no RNG; the
    kept set is a function of (key, salt) only, so re-runs and unions of
    incremental batches agree. Rates are quantized to 1/HASH_BUCKETS.
    """
    rate_expr: Column = F.lit(default_rate)
    for stratum, rate in rates.items():
        rate_expr = F.when(F.col(stratum_col) == stratum, F.lit(rate)).otherwise(
            rate_expr
        )
    threshold = F.round(rate_expr * HASH_BUCKETS).cast("long")
    return df.filter(hash_bucket(key_col, salt=salt) < threshold)


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------

def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    min_shared: int = 1,
    drop_ppm: int = 0,
) -> DataFrame:
    """Benchmark decontamination with contaminated-token accounting —
    the GPT-3 appendix-C procedure (Brown et al. 2020: remove training
    documents sharing a 13-gram with any eval example; Dolma ships the
    same pass) upgraded from a boolean flag to per-document damage
    measurement, so the drop threshold is a POLICY knob instead of a
    hardcoded rule.

    For every corpus doc sharing >= ``min_shared`` word n-grams with
    the benchmark, returns ``(id, n_tok, n_shared_ngrams, n_bench_docs,
    contaminated_tok, contam_ppm, drop_doc)``: ``contaminated_tok`` is
    the size of the UNION of token spans covered by shared n-grams
    (each hit at start s covers [s, s+n) — overlapping hits never
    double-count, the dup_ngram_coverage span discipline via
    :func:`..temporal.interval_union`), ``contam_ppm`` the exact BIGINT
    token fraction, and ``drop_doc`` the gate: at the default
    ``drop_ppm == 0`` it is ``contaminated_tok > 0`` (ANY contaminated
    token drops — the Brown et al. rule, exact even for docs whose
    contamination truncates below 1 ppm, i.e. n_tok > 1e6 *
    contaminated_tok); for ``drop_ppm > 0`` it is ``contam_ppm >
    drop_ppm`` (loosen it to keep long docs brushing a short eval
    answer). Apply with ``corpus.join(out.filter("drop_doc"), id,
    "left_anti")`` — clean docs are absent by construction (fraction
    0).

    Scale: the benchmark shingle index is tiny (benchmarks are MBs) and
    is **broadcast**, so the TB-scale corpus side never shuffles for
    the join; corpus n-grams+positions are MAP-SIDE array expressions
    (the pmi/skipgram slice trick — nothing materializes corpus-wide);
    the only exchanges key on doc id (uniform — no skew): the per-doc
    count aggregate and the interval-union window sort. A HOT benchmark
    n-gram ("the answer is") multiplies nothing — hit rows are bounded
    by corpus gram positions x matching bench DOCS, and the bench-doc
    factor is capped by the benchmark itself. The hits relation feeds
    two branches and is deliberately recomputed, not checkpointed: its
    upstream is a narrow scan+explode+broadcast-join (the measured
    dup_ngram_coverage negative result — checkpointing the exploded
    relation costs more than recomputing it).
    """
    if int(n) < 1:
        raise ValueError(f"decontaminate needs n >= 1, got {n}")
    from ..functions import text as TX
    from .temporal import interval_union

    toks = corpus.select(
        F.col(id_col).alias("_id"),
        TX.lower_ws_tokens_nonempty(F.col(text_col)).alias("_t"),
    )
    starts = F.when(
        F.size("_t") >= n, F.sequence(F.lit(1), F.size("_t") - (n - 1))
    ).otherwise(F.expr("array()").cast("array<int>"))
    grams = toks.select(
        "_id",
        F.explode(
            F.transform(
                starts,
                lambda s: F.struct(
                    s.alias("s"),
                    F.concat_ws(" ", F.slice("_t", s, n)).alias("g"),
                ),
            )
        ).alias("_p"),
    ).select(
        "_id",
        F.col("_p.s").cast("long").alias("_s"),
        F.col("_p.g").alias("_g"),
    )
    bench_sh = shingle_rows(benchmark, id_col, text_col, n=n).select(
        F.col("id").alias("_bid"), F.col("shingle").alias("_g")
    )
    hits = grams.join(F.broadcast(bench_sh), "_g")
    counts = (
        hits.groupBy("_id")
        .agg(
            F.count_distinct("_g").alias("n_shared_ngrams"),
            F.count_distinct("_bid").alias("n_bench_docs"),
        )
        .filter(F.col("n_shared_ngrams") >= int(min_shared))
    )
    spans = hits.select(
        "_id", F.col("_s").alias("_lo"), (F.col("_s") + n).alias("_hi")
    )
    cov = (
        interval_union(spans, "_id", "_lo", "_hi")
        .groupBy("_id")
        .agg(
            F.sum(F.col("hi") - F.col("lo")).cast("long").alias(
                "contaminated_tok"
            )
        )
    )
    ntok = toks.select("_id", F.size("_t").cast("long").alias("n_tok"))
    return (
        counts.join(cov, "_id")
        .join(ntok, "_id")
        .select(
            F.col("_id").alias(id_col),
            "n_tok",
            "n_shared_ngrams",
            "n_bench_docs",
            "contaminated_tok",
            # a contaminated doc holds >= 1 full n-gram, so n_tok >= n > 0
            F.expr("contaminated_tok * 1000000L div n_tok").alias(
                "contam_ppm"
            ),
        )
        .withColumn(
            "drop_doc",
            # drop_ppm == 0 means ANY contaminated token: gate on the raw
            # token count, not the ppm, which truncates to 0 for docs with
            # n_tok > 1e6 * contaminated_tok (sub-ppm contamination would
            # otherwise survive the default gate).
            F.col("contaminated_tok") > F.lit(0)
            if int(drop_ppm) == 0
            else F.col("contam_ppm") > F.lit(int(drop_ppm)),
        )
    )


# ---------------------------------------------------------------------------
# Repetition / boilerplate scoring
# ---------------------------------------------------------------------------

def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Per-document n-gram repetition profile (boilerplate/loop detector).

    For word n-grams of each doc: total count, distinct count, the
    duplicate ratio ``1 - distinct/total`` (scaled e6), and the highest
    single n-gram multiplicity. High dup ratio = generated/boilerplate
    text — a standard quality-filter signal.

    All four are per-row array expressions (``transform``/``filter``/
    ``array_distinct`` over the token array): JVM-side, zero shuffles,
    linear scan parallelism. The per-distinct-gram count is O(g^2) in the
    *document's own* gram count — bounded by doc length, independent of
    corpus size, so it scales to any corpus. Docs shorter than n words
    report zeros.
    """
    # NULL text must take the empty branch too: length(trim(NULL)) is
    # NULL (falsy), so without the coalesce a NULL doc slid into the
    # otherwise-branch and came out as ONE phantom empty n-gram
    # (n_ngrams=1) instead of the documented zeros — corrupting
    # downstream quality thresholds.
    txt = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.when(
        F.length(F.trim(txt)) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(txt), r"\s+"))
    n_positions = F.size(toks) - (n - 1)
    # sequence(1, 0) is DESCENDING in Spark — short docs must take the
    # empty-array branch, not the sequence.
    grams = F.when(
        n_positions <= 0, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_positions, F.lit(1))),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]
            ),
        )
    )
    g = F.col("_grams")
    distinct = F.array_distinct(g)
    max_mult = F.when(F.size(g) == 0, F.lit(0)).otherwise(
        F.array_max(
            F.transform(distinct, lambda d: F.size(F.filter(g, lambda x: x == d)))
        )
    )
    dup_ratio_e6 = F.when(F.size(g) == 0, F.lit(0).cast("long")).otherwise(
        F.floor(
            (1.0 - F.size(distinct) / F.size(g)) * F.lit(1_000_000.0) + F.lit(0.5)
        ).cast("long")
    )
    return (
        df.withColumn("_grams", grams)
        .select(
            id_col,
            F.size(g).alias("n_ngrams"),
            F.size(distinct).alias("n_distinct"),
            dup_ratio_e6.alias("dup_ratio_e6"),
            max_mult.alias("max_multiplicity"),
        )
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

#: RE2-compatible patterns (no lookarounds) — identical semantics in Spark
#: (Java regex), DuckDB and PostgreSQL. Deliberately precise-over-recall:
#: a redaction operator must never corrupt non-PII text.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}(-[0-9]{3,4})?"
IPV4_PATTERN = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"


def pii_counts(col: Column | str) -> tuple[Column, Column, Column]:
    """(n_emails, n_phones, n_ips) match counts for a text column."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.size(F.regexp_extract_all(c, F.lit(EMAIL_PATTERN), 0)),
        F.size(F.regexp_extract_all(c, F.lit(PHONE_PATTERN), 0)),
        F.size(F.regexp_extract_all(c, F.lit(IPV4_PATTERN), 0)),
    )


def redact_pii(col: Column | str) -> Column:
    """Replace emails/phones/IPv4s with typed placeholder tokens.

    Order matters and is fixed (email -> phone -> ip) so the output is
    deterministic; placeholders contain no PII-pattern characters, so the
    chain is idempotent: redact(redact(x)) == redact(x).
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.regexp_replace(c, EMAIL_PATTERN, "[EMAIL]")
    out = F.regexp_replace(out, PHONE_PATTERN, "[PHONE]")
    return F.regexp_replace(out, IPV4_PATTERN, "[IP]")


# ---------------------------------------------------------------------------
# Sequence packing (context-window layout for training)
# ---------------------------------------------------------------------------

def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    capacity: int,
    n_shards: int = 1,
    salt: str = "pack",
) -> DataFrame:
    """Token-stream packing: lay documents end-to-end into fixed-capacity
    context windows (the GPT-style concat-then-split layout).

    Each document is assigned a shard (md5 bucket of its id), ordered
    deterministically within the shard, and given its token offset in
    the shard's concatenated stream via a windowed running sum. From the
    offset, the window span is pure arithmetic:
    ``window_first = start_off // capacity``,
    ``window_last = (start_off + n_tokens - 1) // capacity`` — documents
    may span windows, exactly like production sequence packing.

    Scale: the ONLY shuffle is the per-shard window (partitionBy shard,
    orderBy id). Sharding first is the point — a single global running
    sum would serialize the corpus through one task, while per-shard
    packing is embarrassingly parallel and still deterministic (shard
    and order are both content-addressed, so re-runs and incremental
    unions produce identical layouts per shard). Empty documents are
    excluded (they occupy no tokens).
    """
    shard = hash_bucket(id_col, salt=salt, buckets=n_shards)
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy(id_col)
    t = F.col(tokens_col).cast("long")
    return (
        df.filter(F.col(tokens_col) > 0)
        .withColumn("shard", shard)
        .withColumn("end_off", F.sum(t).over(w))
        .select(
            id_col,
            "shard",
            F.col(tokens_col).alias("n_tokens"),
            (F.col("end_off") - t).alias("start_off"),
            F.floor((F.col("end_off") - t) / capacity).cast("long").alias("window_first"),
            F.floor((F.col("end_off") - 1) / capacity).cast("long").alias("window_last"),
        )
    )


def balanced_mixture(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    salt: str = "mix",
) -> DataFrame:
    """Downsample every stratum to the size of the smallest (uniform
    mixture) — sampling rates derived FROM the data, then applied as a
    deterministic hash filter.

    The domain-mixing step of corpus assembly: unlike
    :func:`stratified_sample` (rates given by the caller), the rate here
    is ``min_stratum_count / stratum_count``, computed by a tiny
    aggregate, broadcast back as per-stratum thresholds, and applied as
    the same md5-bucket filter. Two-phase plan: one count aggregate
    (map-side partials), then a broadcast join + filter over the corpus
    — the corpus itself never shuffles. Thresholds quantize with
    ``floor(x + 0.5)`` so the SQL oracle replays them bit-identically.
    """
    counts = df.groupBy(stratum_col).agg(F.count("*").alias("_cnt"))
    mn = counts.agg(F.min("_cnt").alias("_mn"))
    thresholds = counts.crossJoin(F.broadcast(mn)).select(
        stratum_col,
        F.floor(F.col("_mn") * HASH_BUCKETS / F.col("_cnt") + F.lit(0.5))
        .cast("long")
        .alias("_thr"),
    )
    return (
        df.join(F.broadcast(thresholds), stratum_col)
        .filter(hash_bucket(key_col, salt=salt) < F.col("_thr"))
        .drop("_thr")
    )


def cap_per_stratum(
    df: DataFrame,
    stratum_col: str,
    order_col: str,
    id_col: str,
    cap: int,
) -> DataFrame:
    """Frequency capping: keep at most ``cap`` rows per stratum,
    preferring the highest ``order_col`` (quality score, length, …) with
    the id as deterministic tiebreak — the per-domain cap every
    web-scale corpus applies so no single site dominates training data.

    Expressed as the rank<=k window because that is the form Spark's
    optimizer rewrites with WindowGroupLimit (3.5+): each map task keeps
    only its local top-``cap`` per stratum BEFORE the shuffle, so a
    stratum with a billion rows ships ~cap × n_tasks rows, not a billion
    — the hot-domain skew never reaches one reducer. Contrast a
    collect_list-then-slice formulation, which materializes the whole
    stratum on one executor (the skew-killer build_inverted_index also
    avoids).

    Returns the input columns plus ``rank`` (1-based within stratum).
    """
    w = Window.partitionBy(stratum_col).orderBy(
        F.desc(order_col), F.asc(id_col)
    )
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= cap)
        .withColumn("rank", F.col("rank").cast("long"))
    )


def negative_samples(
    df: DataFrame,
    id_col: str,
    k: int = 4,
    buckets: int = 1024,
    salt: str = "neg",
) -> DataFrame:
    """Deterministic negative sampling: k pseudo-random partners per
    anchor (contrastive-training negatives), stable under re-runs and
    corpus growth within a bucket count.

    Scheme: every row hashes into one of ``buckets`` md5-buckets; each
    bucket elects a representative (min (h, id) — deterministic); anchor
    ``a`` takes the representatives of buckets ``(b(a)+1) .. (b(a)+k)``
    mod ``buckets`` as its negatives, dropping self-matches. Uniformity
    comes from md5; determinism from the arithmetic — no RNG, no seed
    plumbing, the same pairs on every engine (the DuckDB oracle replays
    them exactly).

    Plan shape at 100 TB: NO global rank (the usual row_number-over-
    everything formulation serializes the corpus through one partition);
    the representative election is one bucket-keyed aggregate whose
    output is ``buckets`` rows — broadcast to the anchors, which
    therefore never shuffle. Cost: one map-side-combined aggregate + one
    broadcast join + a k-wide explode.

    Size ``buckets`` well below the corpus row count: an anchor whose
    offset bucket happens to be EMPTY yields no negative for that offset
    (each anchor gets UP TO k). At corpus scale every bucket is
    populated and the count is exactly k (minus rare self-matches); the
    contract degrades gracefully, never wrongly, on small inputs.

    Returns (id, offset, neg_id), offset in 1..k.
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 15),
        16, 10,
    ).cast("long")
    hashed = df.select(F.col(id_col).alias("id"), h.alias("_h")).withColumn(
        "_b", F.col("_h") % buckets
    )
    reps = (
        hashed.groupBy("_b")
        .agg(F.min(F.struct("_h", "id")).alias("_m"))
        .select(F.col("_b").alias("_rb"), F.col("_m.id").alias("neg_id"))
    )
    anchors = hashed.withColumn(
        "offset", F.explode(F.array(*[F.lit(j) for j in range(1, k + 1)]))
    ).withColumn("_nb", (F.col("_b") + F.col("offset")) % buckets)
    return (
        anchors.join(F.broadcast(reps), F.col("_nb") == F.col("_rb"))
        .filter(F.col("neg_id") != F.col("id"))
        .select("id", F.col("offset").cast("long").alias("offset"), "neg_id")
    )


def priority_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    stratum_col: str | None = None,
    salt: str = "pri",
) -> DataFrame:
    """Weighted sampling without replacement, deterministic: keep the k
    rows with the smallest priority ``u / w`` per stratum, where ``u`` is
    the key's md5-uniform in (0, 1] and ``w`` the row weight — sequential
    Poisson (priority) sampling (Ohlsson 1998): inclusion probability is
    ~proportional to weight, and the chosen set is a pure function of
    (keys, weights, salt): re-runs, re-partitioning, and engine choice
    cannot move it. The priority is ONE IEEE division of two exactly
    shared doubles, so the DuckDB oracle replays the exact sample.

    Same WindowGroupLimit shape as cap_per_stratum: map tasks keep their
    local top-k per stratum before the shuffle, so a billion-row stratum
    ships ~k rows per task. Weights must be positive; nonpositive rows
    are excluded (documented, not silent: they get priority NULL and
    fall out of the rank).

    Returns input columns + ``rank`` (1-based within stratum).

    Inputs carrying the scratch name ``_pri`` or the output name
    ``rank`` are rejected loudly — the same guard its exact sibling
    :func:`weighted_sample_aes` ships with (silent shadowing corrupts;
    a late AnalysisException misleads).
    """
    reserved = {"_pri", "rank"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"priority_sample input carries reserved column names"
            f" {sorted(reserved)} — rename them first ('_pri' is the"
            f" internal priority key, 'rank' is the output column)"
        )
    from .sketches import KEY_SPACE

    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(1).cast("long")).cast("double") / F.lit(KEY_SPACE)
    pri = F.when(
        F.col(weight_col) > 0, u / F.col(weight_col).cast("double")
    )
    parts = [stratum_col] if stratum_col else []
    w = Window.partitionBy(*parts).orderBy(
        F.asc_nulls_last("_pri"), F.asc(key_col)
    )
    return (
        df.withColumn("_pri", pri)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .filter(F.col("_pri").isNotNull())
        .drop("_pri")
        .withColumn("rank", F.col("rank").cast("long"))
    )


def percentile_gate(
    df: DataFrame,
    score_col: str,
    stratum_col: str,
    id_col: str,
    keep_num: int = 1,
    keep_den: int = 4,
) -> DataFrame:
    """RELATIVE quality gate: keep the top ``keep_num/keep_den`` fraction
    of each stratum by score — the percentile-threshold curation stage
    (cf. cap_per_stratum, which is an ABSOLUTE top-k: caps protect
    against domination, percentiles normalize quality across strata of
    very different sizes).

    The threshold is all-integer: row r (ranked by score desc, id asc —
    fully deterministic) survives iff ``(r - 1) * keep_den <
    keep_num * n`` where n is the stratum size, which is exactly
    ``r <= ceil(n * keep_num / keep_den)`` with no float boundary to
    disagree on. One stratum-keyed shuffle serves both windows (rank and
    count share the partitioning); no WindowGroupLimit applies — the cut
    depends on n, unknown until the stratum is assembled — so a hot
    stratum DOES ship its rows to one reducer task: if a stratum can
    exceed a task's memory, pre-split it with a salt and take the union
    of per-salt gates (the frac is scale-free, unlike a top-k).

    Returns the surviving rows plus (rank, stratum_size).
    """
    w = Window.partitionBy(stratum_col).orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    wn = Window.partitionBy(stratum_col)
    ranked = df.withColumn("rank", F.row_number().over(w)).withColumn(
        "stratum_size", F.count("*").over(wn).cast("long")
    )
    return ranked.filter(
        (F.col("rank") - 1) * F.lit(keep_den)
        < F.lit(keep_num) * F.col("stratum_size")
    ).withColumn("rank", F.col("rank").cast("long"))


def temperature_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    scale: float = 8.0,
    salt: str = "temp",
) -> DataFrame:
    """Temperature-based mixture sampling at alpha = 1/2: keep each
    stratum with probability min(1, scale / sqrt(count_s)), so surviving
    counts go as ~scale·sqrt(count_s) — the multilingual/domain
    rebalancing trick (mBERT/XLM-R alpha-sampling) that upweights rare
    strata relative to proportional sampling without flattening to
    uniform (that extreme is :func:`balanced_mixture`).

    alpha is pinned to 1/2 because sqrt is the one power IEEE 754
    requires to be correctly rounded: the per-stratum rate — computed
    from exact integer counts — is the same double in Spark, DuckDB and
    any other compliant engine, so the hash-threshold filter replays
    exactly. An arbitrary alpha would route through pow(), whose last
    ulp is libm-dependent, silently breaking cross-engine replay at
    threshold boundaries.

    Same two-phase plan as balanced_mixture: tiny count aggregate,
    broadcast thresholds, deterministic md5-bucket filter — the corpus
    never shuffles. SQL twin of the threshold:
    ``least(BUCKETS, floor(scale * BUCKETS / sqrt(cnt)))``.
    """
    counts = df.groupBy(stratum_col).agg(F.count("*").alias("_cnt"))
    thresholds = counts.select(
        stratum_col,
        F.least(
            F.lit(HASH_BUCKETS).cast("long"),
            F.floor(
                F.lit(float(scale)) * HASH_BUCKETS
                / F.sqrt(F.col("_cnt").cast("double"))
            ).cast("long"),
        ).alias("_thr"),
    )
    return (
        df.join(F.broadcast(thresholds), stratum_col)
        .filter(hash_bucket(key_col, salt=salt) < F.col("_thr"))
        .drop("_thr")
    )


def weighted_sample_aes(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    stratum_col: str | None = None,
    salt: str = "aes",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, exact inclusion law:
    keep the k rows with the smallest exponential key ``-ln(u) / w``
    per stratum (u the key's md5-uniform in (0, 1], w the row weight)
    — Efraimidis–Spirakis A-ES (2006). The key is Exp(rate=w), so the
    selected set is distributed EXACTLY as sequential weighted draws
    without replacement; :func:`priority_sample` (Ohlsson sequential
    Poisson, key u/w) is its approximate sibling — asymptotically
    equivalent inclusion probabilities, but only A-ES reproduces the
    without-replacement law exactly. Both live here because they fail
    differently under extreme weight ratios: priority sampling has
    lower variance for level estimators, A-ES is the one to cite when
    the draw order itself must match the sequential process.

    Determinism: u = (h60 + 1) / 2^60 is the same double in every
    engine (exact division by a power of two). ln is the one
    transcendental in the chain; neither JVM Math.log nor libm log is
    guaranteed correctly rounded, but both are sub-ulp, and md5-uniform
    order statistics sit ~1e12 ulps apart at any realistic stratum
    size, so a cross-engine rank flip needs two keys within ~1 ulp —
    never observed, and the oracle-parity gate would catch it loudly
    (unlike pow(), whose last-ulp spread breaks replay routinely, the
    reason temperature_sample pins alpha to sqrt).

    Same WindowGroupLimit plan as priority_sample: map tasks keep their
    local k smallest keys per stratum before the single shuffle.
    Nonpositive/NULL weights are excluded (priority NULL, documented
    not silent). Returns input columns + ``rank`` (1-based, by key
    ascending, key_col tiebreak).

    Inputs carrying the scratch name ``_ek`` or the output name
    ``rank`` are rejected loudly (the asof-family lesson: silent
    shadowing corrupts, a late AnalysisException misleads).
    :func:`priority_sample` carries the same guard.
    """
    reserved = {"_ek", "rank"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"weighted_sample_aes input carries reserved column names"
            f" {sorted(reserved)} — rename them first ('_ek' is the"
            f" internal exponential key, 'rank' is the output column)"
        )
    from .sketches import KEY_SPACE

    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(1).cast("long")).cast("double") / F.lit(KEY_SPACE)
    ekey = F.when(
        F.col(weight_col) > 0, -F.log(u) / F.col(weight_col).cast("double")
    )
    parts = [stratum_col] if stratum_col else []
    w = Window.partitionBy(*parts).orderBy(
        F.asc_nulls_last("_ek"), F.asc(key_col)
    )
    return (
        df.withColumn("_ek", ekey)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .filter(F.col("_ek").isNotNull())
        .drop("_ek")
        .withColumn("rank", F.col("rank").cast("long"))
    )


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
    salt: str = "dsir",
) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.
    2023, public method): pick the ``k`` raw-corpus documents that look
    most like a small TARGET domain, by importance weights from two
    bag-of-hashed-n-grams models. The curation family's domain-match
    stage: quality gate -> THIS -> pack/mix.

    Features are unigrams + bigrams hashed into ``buckets`` buckets
    (:func:`hash_bucket`, md5 — engine-portable). Both corpora fit a
    Laplace-smoothed bucket distribution; a document's importance
    log-weight is the sum over its gram occurrences of
    ``ln(p_b) - ln(q_b)`` (target over raw), quantized per BUCKET to
    exact e6 integers so the per-doc sum is order-independent — the
    decayed_counts exact-integer discipline. Each ln's argument is one
    IEEE division of two exact BIGINTs ((count+1) over (total+B)), so
    both engines feed ln the identical double; ln itself is the A-ES
    sub-ulp precedent, and the e6 floor only flips if ln's last ulp
    straddles a .5 boundary (~2^-32 per bucket — the oracle-parity
    gate would catch it loudly).

    Selection is Gumbel-top-k — the log-space equivalent of the A-ES
    exponential-key draw: key = logw_e6/1e6 - ln(-ln(u)) with u the
    doc's md5-uniform, so the selected set follows the exact
    without-replacement law proportional to exp(logw). Deterministic:
    a pure function of (texts, ids, salt).

    Scale shape: gram rows are MAP-SIDE array expressions (the
    shingle_rows slice trick); the two bucket distributions are
    B-bounded map-side-combined aggregates; totals are 1-row scalar
    broadcasts (whitelisted); the B-row log-ratio table BROADCASTS to
    score the raw side (the corpus never shuffles to meet it); the
    per-doc weight sum is ONE doc-keyed map-side-combined aggregate;
    the top-k is the WindowGroupLimit plan (map-local top-k before the
    single shuffle). A hot bucket skews nothing — the join side with
    the hot key has ONE row per bucket.

    Returns ``(id, n_grams, logw_e6, rank)`` for the k selected docs
    (rank 1 = most target-like draw). Docs with NULL id/text or no
    tokens have no features and are excluded (the sketch-family
    discipline: unscorable, not silently weight-0). Inputs carrying the
    output names are rejected loudly.
    """
    if int(k) < 1:
        raise ValueError(f"dsir_resample needs k >= 1, got {k}")
    if int(buckets) < 2:
        raise ValueError(f"dsir_resample needs buckets >= 2, got {buckets}")
    reserved = {"n_grams", "logw_e6", "rank"} & {id_col}
    if reserved:
        raise ValueError(
            f"dsir_resample id_col collides with output column names"
            f" {sorted(reserved)} — rename it first"
        )
    from ..functions import text as TX
    from .sketches import KEY_SPACE

    b = int(buckets)

    def gram_rows(df: DataFrame) -> DataFrame:
        keep = F.col(id_col).isNotNull() & F.col(text_col).isNotNull()
        d = df.filter(keep).select(
            F.col(id_col).alias("_id"),
            TX.lower_ws_tokens_nonempty(F.col(text_col)).alias("_t"),
        )
        grams = F.expr(
            "concat(_t, transform(slice(_t, 1, greatest(size(_t) - 1, 0)),"
            " (x, i) -> concat_ws(' ', _t[i], _t[i + 1])))"
        )
        ex = d.select("_id", F.explode(grams).alias("_g"))
        return ex.select(
            "_id", hash_bucket("_g", salt=salt, buckets=b).alias("_b")
        )

    # r12 (guide §1.2 "don't compute things you throw away"): ONE gram
    # pass over the raw corpus. The raw gram stream (tokenize + explode
    # + per-gram md5) used to be derived THREE times — bucket counts,
    # corpus total, per-doc scoring — and the target's twice. Now the
    # raw stream is materialized once (narrow (_id, _b) rows — the
    # minhash shingle-relation discipline; production stages to parquet
    # per materialize()'s note), the corpus totals are the SUMS of the
    # B-bounded bucket counts (the same BIGINTs — every gram row has
    # exactly one bucket; coalesce keeps the empty-corpus total at 0
    # where sum() yields NULL), and the target explodes once. Measured
    # ABBA at sf0.1 (460k raw gram rows): materialized 1.84/2.00 s vs
    # un-materialized 3.35/4.56 s medians. A per-(doc, bucket)
    # pre-aggregate was also tried and REJECTED: gram rows are mostly
    # unique per doc, so it pays a full-stream (id, b) exchange that
    # map-side partial aggregation of the doc-keyed sum never needs.
    from .dedup import materialize

    rg = materialize(gram_rows(raw))
    tg = gram_rows(target)
    q = rg.groupBy("_b").agg(F.count("*").alias("_cq"))
    p = tg.groupBy("_b").agg(F.count("*").alias("_cp"))
    tot = (
        q.agg(F.coalesce(F.sum("_cq"), F.lit(0).cast("long")).alias("_nq"))
        .crossJoin(
            F.broadcast(
                p.agg(
                    F.coalesce(F.sum("_cp"), F.lit(0).cast("long")).alias(
                        "_np"
                    )
                )
            )
        )
    )
    # only buckets PRESENT in the raw corpus can score a raw doc; a
    # bucket unseen in the target smooths to (0 + 1)
    ltab = (
        q.join(p, "_b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "_b",
            F.floor(
                (
                    F.log(
                        (F.coalesce("_cp", F.lit(0)) + 1).cast("double")
                        / (F.col("_np") + b).cast("double")
                    )
                    - F.log(
                        (F.col("_cq") + 1).cast("double")
                        / (F.col("_nq") + b).cast("double")
                    )
                )
                * 1_000_000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("_l"),
        )
    )
    scored = (
        rg.join(F.broadcast(ltab), "_b")
        .groupBy("_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum("_l").alias("logw_e6"),
        )
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:u:"), F.col("_id").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    # u = (h + 0.5) / KEY_SPACE lies STRICTLY inside (0, 1): the +1
    # variant used by the exponential-key samplers reaches u == 1.0 at
    # h == KEY_SPACE-1, which is fine for -ln(u) (key 0) but fatal for
    # the double log here — Spark's ln(-ln(1)) = ln(0) yields NULL
    # while DuckDB yields -inf, a measure-zero cross-engine parity
    # hole. The half-offset keeps both engines on finite doubles.
    u = (h.cast("double") + F.lit(0.5)) / F.lit(KEY_SPACE)
    gkey = F.col("logw_e6").cast("double") / 1e6 - F.log(-F.log(u))
    # global top-k as orderBy+limit -> TakeOrderedAndProject (each task
    # keeps its local k, one merge of k-row heaps — the path_mining
    # shape; a bare global row_number window would move EVERY scored
    # doc, one row per corpus document, to a single task). The rank
    # window then runs over k rows only — bounded, not corpus-sized.
    top = (
        scored.withColumn("_gk", gkey)
        .orderBy(F.desc("_gk"), F.asc("_id"))
        .limit(int(k))
    )
    w = Window.orderBy(F.desc("_gk"), F.asc("_id"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select(
            F.col("_id").alias(id_col),
            "n_grams",
            "logw_e6",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def gopher_quality_gate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """The Gopher quality-filter rule set (Rae et al. 2021, published
    heuristics; Dolma/RedPajama ship the same battery) as ONE pass of
    pure column expressions — the rule-based complement of
    ``functions/text.py::quality_score``'s scalar score. Every
    threshold is an EXACT integer cross-multiplication (mean word
    length in [3, 10] tests ``3·n <= chars <= 10·n``), so no float
    boundary can disagree between engines.

    Rules (keep iff ALL hold):
      1. ``min_words <= n_words <= max_words`` (paper: 50..100k);
      2. mean word length in [3, 10] characters;
      3. symbol-to-word ratio <= 0.1 (symbols: ``#`` and ellipsis,
         both ``...`` and the one-char form);
      4. <= 90% of lines start with a bullet (``-``, ``*``, or the
         bullet char);
      5. <= 30% of lines end with an ellipsis;
      6. >= 80% of words contain at least one alphabetic character;
      7. >= 2 distinct words from the 8-word stop list {the, be, to,
         of, and, that, have, with}.

    Returns EVERY input doc with the raw counts (``n_words, n_lines,
    word_chars, n_symbols, n_bullet_lines, n_ellipsis_lines,
    n_alpha_words, n_stopwords``) and the ``keep`` verdict — counts
    kept visible so a tightened policy can re-gate WITHOUT re-scanning
    text. Scale: per-row array expressions only (JVM codegen, zero
    shuffles, embarrassingly parallel); NULL text fails rule 1 at any
    sane min_words and is returned with zero counts, never silently
    dropped.
    """
    from ..functions import text as TX

    txt = F.coalesce(F.col(text_col), F.lit(""))
    toks = TX.lower_ws_tokens_nonempty(txt)
    lines = F.filter(
        F.split(txt, "\n"), lambda x: F.length(F.trim(x)) > 0
    )
    n_words = F.size(toks).cast("long")
    n_lines = F.size(lines).cast("long")
    word_chars = F.coalesce(
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ),
        F.lit(0).cast("long"),
    )
    n_hash = F.length(txt) - F.length(F.replace(txt, F.lit("#"), F.lit("")))
    n_uni_ell = F.length(txt) - F.length(
        F.replace(txt, F.lit("…"), F.lit(""))
    )
    n_dot_ell = (
        F.length(txt) - F.length(F.replace(txt, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    n_symbols = (n_hash + n_uni_ell + n_dot_ell).cast("long")
    bullet = F.size(
        F.filter(
            lines,
            lambda x: F.substring(F.ltrim(x), 1, 1).isin("-", "*", "•"),
        )
    ).cast("long")
    ell_end = F.size(
        F.filter(
            lines,
            lambda x: F.rtrim(x).endswith("...")
            | F.rtrim(x).endswith("…"),
        )
    ).cast("long")
    alpha_words = F.size(
        F.filter(toks, lambda x: x.rlike("[a-z]"))
    ).cast("long")
    stop = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(
                *[
                    F.lit(s)
                    for s in ("the", "be", "to", "of", "and", "that",
                              "have", "with")
                ]
            ),
        )
    ).cast("long")
    out = df.select(
        F.col(id_col).alias(id_col),
        n_words.alias("n_words"),
        n_lines.alias("n_lines"),
        word_chars.alias("word_chars"),
        n_symbols.alias("n_symbols"),
        bullet.alias("n_bullet_lines"),
        ell_end.alias("n_ellipsis_lines"),
        alpha_words.alias("n_alpha_words"),
        stop.alias("n_stopwords"),
    )
    keep = (
        (F.col("n_words") >= int(min_words))
        & (F.col("n_words") <= int(max_words))
        & (F.col("word_chars") >= 3 * F.col("n_words"))
        & (F.col("word_chars") <= 10 * F.col("n_words"))
        & (F.col("n_symbols") * 10 <= F.col("n_words"))
        & (F.col("n_bullet_lines") * 10 <= F.col("n_lines") * 9)
        & (F.col("n_ellipsis_lines") * 10 <= F.col("n_lines") * 3)
        & (F.col("n_alpha_words") * 5 >= F.col("n_words") * 4)
        & (F.col("n_stopwords") >= 2)
    )
    return out.withColumn("keep", keep)


def token_budget_mix(
    df: DataFrame,
    budgets: dict[str, int],
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
    salt: str = "budget",
    buckets: int = 1024,
) -> DataFrame:
    """Deterministic per-source TOKEN-budget selection — the literal
    "mix to N tokens: 30% web, 20% code, ..." allocator every
    pretraining run executes (balanced_mixture equalizes DOC counts;
    training budgets are token counts). For each source in
    ``budgets``, keep a hash-random subset of its docs whose token
    sum is maximal without EXCEEDING the budget (hard ceiling: the
    doc that would cross it is dropped, so a budget is never
    overshot). Sources absent from ``budgets`` are dropped —
    selection is an explicit statement of the mixture.

    Determinism: docs are "shuffled" by their md5-uniform (the
    hash_bucket/A-ES discipline) — a pure function of (id, salt), so
    re-runs, re-partitioning, and engine choice select the identical
    set, and an incremental re-run with more docs changes the
    selection only past the old boundary.

    Two-phase cut — the vocab_coverage prefix-sum trick, so NO source
    ever needs a source-sized single-task sort:
    (1) docs land in ``buckets`` hash buckets; per-(source, bucket)
        token totals aggregate map-side (output = sources x buckets
        rows, tiny);
    (2) a per-source prefix sum over the bucket totals (a
        buckets-bounded window, broadcast back) gives each bucket its
        tokens-before offset; each doc's global cumulative position is
        then its bucket offset + an INTRA-bucket running sum — every
        window sort is bucket-sized (~corpus/1024), and the filter
        ``cum <= budget`` keeps inside-buckets whole, drops past
        buckets entirely, and cuts the one boundary bucket exactly at
        the (uniform, id) order.

    Returns the selected rows as (id, source, n_tok). Docs with NULL
    id/source/text or zero tokens are excluded up front (a zero-token
    doc spends no budget but also trains nothing — excluded loudly by
    policy, not silently kept).
    """
    if not budgets:
        raise ValueError("token_budget_mix needs a non-empty budgets dict")
    for s, b in budgets.items():
        if int(b) < 0:
            raise ValueError(
                f"token_budget_mix budget for {s!r} must be >= 0, got {b}"
            )
    from ..functions import text as TX
    from .sketches import KEY_SPACE

    ntok = F.size(TX.lower_ws_tokens_nonempty(F.col(text_col))).cast("long")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))),
            1, 15,
        ),
        16, 10,
    ).cast("long")
    budget_expr: Column | None = None
    for s, b in budgets.items():
        cond = F.col(source_col) == s
        if budget_expr is None:
            budget_expr = F.when(cond, F.lit(int(b)).cast("long"))
        else:
            budget_expr = budget_expr.when(cond, F.lit(int(b)).cast("long"))
    docs = (
        df.filter(
            F.col(id_col).isNotNull()
            & F.col(source_col).isNotNull()
            & F.col(text_col).isNotNull()
        )
        .select(
            F.col(id_col).alias("_id"),
            F.col(source_col).alias("_src"),
            ntok.alias("n_tok"),
            (h % buckets).alias("_b"),
            ((h + F.lit(1).cast("long")).cast("double") / F.lit(KEY_SPACE))
            .alias("_u"),
            budget_expr.alias("_budget"),
        )
        .filter(F.col("_budget").isNotNull() & (F.col("n_tok") > 0))
    )
    bstats = docs.groupBy("_src", "_b").agg(
        F.sum("n_tok").alias("_bt"), F.max("_budget").alias("_budget")
    )
    w_pre = (
        Window.partitionBy("_src")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bpre = bstats.select(
        "_src", "_b", "_bt", "_budget",
        F.coalesce(F.sum("_bt").over(w_pre), F.lit(0)).cast("long").alias(
            "_before"
        ),
    )
    joined = docs.drop("_budget").join(
        F.broadcast(bpre.select("_src", "_b", "_before", "_budget")),
        ["_src", "_b"],
    )
    w_in = (
        Window.partitionBy("_src", "_b")
        .orderBy("_u", "_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = joined.select(
        "*",
        (F.col("_before") + F.sum("n_tok").over(w_in)).alias("_cum"),
    )
    return cum.filter(F.col("_cum") <= F.col("_budget")).select(
        F.col("_id").alias(id_col),
        F.col("_src").alias(source_col),
        "n_tok",
    )
