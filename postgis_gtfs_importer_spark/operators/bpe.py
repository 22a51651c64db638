"""Byte-pair-encoding tokenizer induction — the iterative merge-training
loop of an LLM data pipeline, in the shape real tokenizer trainers use.

Classic BPE (Sennrich et al. 2016) never iterates over the raw corpus:
it aggregates the corpus ONCE into a (word, freq) table and runs every
merge iteration against that vocabulary-sized relation. That is exactly
the scale story here — the only corpus-sized operation is the initial
tokenize+count (one shuffle on the word key, map-side combined); the
n_merges iterations then touch a relation bounded by the DISTINCT word
count (Heaps' law: millions of rows for a 100 TB corpus, not trillions),
with each iteration one pair-count aggregate plus a map-side array
rewrite.

The merge loop is genuinely iterative (argmax -> rewrite -> recount):
per round, ONE single-row collect picks the best pair (the same
legitimately-driver-side control-flow as connected_components'
convergence probe), and the rewrite is a pure-column left-fold — no
Python UDF, no per-row driver work. Lineage is cut every iteration
(localCheckpoint via materialize) so round N's plan does not replay
rounds 1..N-1.

Determinism: ties on pair count break on the pair's lexical order, so
the merge sequence — and therefore the whole tokenizer — is a pure
function of the corpus. Verified against a pure-Python reference
implementation in tests/test_bpe.py (exact merge-sequence equality),
which is the honest check for an operator no SQL oracle can express.

Character-split boundary (documented, not fixed): the initial symbols
come from ``split(word, '')``, which operates on Java UTF-16 code
UNITS — a non-BMP code point (emoji, rare CJK) splits into its two
surrogate halves, while the pure-Python reference's ``list(word)``
yields one code POINT. The two diverge only on non-BMP corpora; for a
byte/char-exact tokenizer over such text, pre-encode to bytes (real
BPE trainers operate on bytes anyway) before this operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TX

#: end-of-word marker (classic BPE: lets merges learn suffixes without
#: crossing word boundaries; also makes every word's symbol sequence
#: unique w.r.t. its string form).
EOW = "</w>"


def word_freqs(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """The ONE corpus-sized pass: whitespace+lowercase tokenize (the
    engine's shared tokenizer) aggregated to (word, freq). Everything
    downstream of this is vocabulary-sized."""
    toks = TX.lower_ws_tokens_nonempty(F.col(text_col))
    return (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """(word, freq) -> (syms: array<string>, freq): characters + EOW."""
    chars = F.filter(F.split(F.col("word"), ""), lambda x: x != F.lit(""))
    return words.select(
        F.concat(chars, F.array(F.lit(EOW))).alias("syms"), "freq"
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the symbol table — map-side pair
    generation from each row's array (no shuffle to see a neighbor),
    then one vocab-sized aggregate."""
    pairs = F.expr(
        "transform(slice(syms, 1, greatest(size(syms) - 1, 0)),"
        " (x, i) -> struct(x AS lhs, syms[i + 1] AS rhs))"
    )
    return (
        syms.select(F.explode(pairs).alias("_p"), "freq")
        .groupBy("_p.lhs", "_p.rhs")
        .agg(F.sum("freq").cast("long").alias("pair_count"))
    )


def _apply_merge(syms: DataFrame, lhs: str, rhs: str) -> DataFrame:
    """Rewrite every symbol array, replacing adjacent (lhs, rhs) with
    the merged symbol — leftmost-first, non-overlapping (the classic BPE
    apply order), as a pure-column left fold. 'aaa' under (a,a) becomes
    ['aa','a'], matching every reference implementation."""
    merged = lhs + rhs
    fold = F.expr(
        "aggregate(syms, CAST(array() AS array<string>), (acc, x) -> "
        "CASE WHEN size(acc) > 0 AND element_at(acc, -1) = {l} "
        "          AND x = {r} "
        "     THEN concat(slice(acc, 1, size(acc) - 1), array({m})) "
        "     ELSE concat(acc, array(x)) END)".format(
            l=_sql_str(lhs), r=_sql_str(rhs), m=_sql_str(merged)
        )
    )
    return syms.select(fold.alias("syms"), "freq")


def _sql_str(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def bpe_merges(
    df: DataFrame,
    n_merges: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Train ``n_merges`` BPE merges on the corpus; returns the learned
    merge table (rank, lhs, rhs, merged, pair_count) — the artifact a
    tokenizer ships. Stops early if the vocabulary runs out of adjacent
    pairs. See module docstring for the scale and determinism design."""
    from .dedup import materialize

    spark = df.sparkSession
    words = materialize(word_freqs(df, text_col))
    # Size the iteration partitioning to the VOCABULARY, not the corpus:
    # the merge loop runs ~2 jobs per round, and paying 32 task launches
    # per job for a 1k-word table is 25x fixed overhead for zero
    # parallelism (measured 38 s -> ~5 s at sf0.1). ~250k words/task
    # keeps a real 10M-word vocabulary at cluster width.
    n_parts = max(1, min(int(words.count()) // 250_000,
                         spark.sparkContext.defaultParallelism))
    syms = materialize(_initial_symbols(words).coalesce(n_parts))
    out: list[tuple[int, str, str, str, int]] = []
    for rank in range(n_merges):
        best = (
            _pair_counts(syms)
            .orderBy(F.desc("pair_count"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        lhs, rhs, cnt = best[0].lhs, best[0].rhs, best[0].pair_count
        out.append((rank, lhs, rhs, lhs + rhs, cnt))
        syms = materialize(_apply_merge(syms, lhs, rhs))
    return spark.createDataFrame(
        out, "rank long, lhs string, rhs string, merged string, pair_count long"
    )


#: Pinned merge table (rank order) for the ENCODE registry entry —
#: trained on the sf0.01 documents corpus (12 merges), equal to both
#: the pure-Python reference trainer and the Spark trainer on that
#: corpus (tests/test_bpe.py pins all three against each other, so a
#: testdata regeneration that drifts the corpus fails loudly there).
#: Encode correctness does NOT depend on which corpus trained the list:
#: the registry entry and its DuckDB oracle replay the SAME pinned
#: merges, and the pin makes the entry deterministic at every sf.
PINNED_MERGES_12: list[tuple[str, str]] = [
    ("e", "r"),
    ("e", EOW),
    ("n", EOW),
    ("er", EOW),
    ("o", "w"),
    ("ow", EOW),
    ("o", "r"),
    ("s", "t"),
    ("h", EOW),
    ("a", "t"),
    ("l", "u"),
    ("i", "n"),
]


def bpe_reference(texts: list[str], n_merges: int) -> list[tuple[str, str, int]]:
    """Pure-Python reference BPE trainer (the classic dict-of-tuples
    formulation) — the exactness oracle for :func:`bpe_merges`. Returns
    [(lhs, rhs, pair_count), ...] in merge order."""
    freqs: dict[tuple[str, ...], int] = {}
    for t in texts:
        for w in t.strip().lower().split():
            if not w:
                continue
            key = tuple(list(w) + [EOW])
            freqs[key] = freqs.get(key, 0) + 1
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in freqs.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (lhs, rhs), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((lhs, rhs, cnt))
        nxt: dict[tuple[str, ...], int] = {}
        for syms, f in freqs.items():
            new: list[str] = []
            for x in syms:
                if new and new[-1] == lhs and x == rhs:
                    new[-1] = lhs + rhs
                else:
                    new.append(x)
            key = tuple(new)
            nxt[key] = nxt.get(key, 0) + f
        freqs = nxt
    return merges


def _apply_merges_sql(arr_sql: str, merges: list[tuple[str, str]]) -> str:
    """Compose the rank-ordered merge folds into ONE nested column
    expression over ``arr_sql`` — the apply side is pure map-side
    compute: no loop, no shuffle, no driver round-trips."""
    expr = arr_sql
    for lhs, rhs in merges:
        merged = lhs + rhs
        expr = (
            "aggregate({src}, CAST(array() AS array<string>), (acc, x) -> "
            "CASE WHEN size(acc) > 0 AND element_at(acc, -1) = {l} "
            "          AND x = {r} "
            "     THEN concat(slice(acc, 1, size(acc) - 1), array({m})) "
            "     ELSE concat(acc, array(x)) END)".format(
                src=expr, l=_sql_str(lhs), r=_sql_str(rhs), m=_sql_str(merged)
            )
        )
    return expr


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize each document with a trained merge list — the APPLY half
    of the BPE pair (:func:`bpe_merges` is the train half). Per document:
    word count, pre-merge symbol count (chars + end-of-word markers) and
    post-merge BPE token count — the length accounting a packing /
    budget stage needs (pack_sequences consumes token counts).

    Entirely map-side: the merge list composes into one nested fold
    expression applied per word inside a transform over the document's
    word array — zero shuffles, zero driver round-trips, embarrassingly
    parallel at any corpus size. Exactness vs the pure-Python reference
    encoder is pinned in tests/test_bpe.py.

    Returns (doc_id, n_words, n_symbols_char, n_tokens_bpe).

    NULL text is in-domain (nulled-payload ingestion class) and must
    report exact ZEROS, matching the oracle's LEFT JOIN + coalesce:
    without the coalesce, split(trim(NULL)) propagates NULL through
    size/aggregate and the counts come back NULL.
    """
    words = TX.lower_ws_tokens_nonempty(
        F.coalesce(F.col(text_col), F.lit(""))
    )
    word_syms_sql = (
        "concat(filter(split(w, ''), c -> c <> ''), array('" + EOW + "'))"
    )
    encoded_size = F.expr(
        "transform(_words, w -> size({enc}))".format(
            enc=_apply_merges_sql(word_syms_sql, merges)
        )
    )
    char_size = F.expr(
        "transform(_words, w -> size({src}))".format(src=word_syms_sql)
    )
    base = df.select(F.col(id_col).alias("doc_id"), words.alias("_words"))
    zero = F.lit(0).cast("long")
    return base.select(
        "doc_id",
        F.size("_words").cast("long").alias("n_words"),
        F.aggregate(char_size, zero, lambda a, x: a + x).alias(
            "n_symbols_char"
        ),
        F.aggregate(encoded_size, zero, lambda a, x: a + x).alias(
            "n_tokens_bpe"
        ),
    )


def bpe_encode_reference(
    text: str, merges: list[tuple[str, str]]
) -> list[str]:
    """Pure-Python reference encoder (rank-ordered merge application,
    leftmost-first within each merge) — the exactness oracle for
    :func:`bpe_encode`."""
    out: list[str] = []
    for w in text.strip().lower().split():
        if not w:
            continue
        syms = list(w) + [EOW]
        for lhs, rhs in merges:
            new: list[str] = []
            for x in syms:
                if new and new[-1] == lhs and x == rhs:
                    new[-1] = lhs + rhs
                else:
                    new.append(x)
            syms = new
        out.extend(syms)
    return out


def bpe_fertility(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-language tokenizer FERTILITY — BPE tokens per word and per
    character-symbol — the standard multilingual-tokenizer equity
    report (a language whose fertility is 2x another's pays 2x the
    context budget for the same text; the number every vocab-size and
    merge-count decision is argued with).

    Aggregates :func:`bpe_encode`'s per-document exact counts per
    language: ``fertility_e6 = sum(tokens) * 1e6 / sum(words)`` and
    ``tokens_per_char_e6`` likewise over pre-merge symbols, both as
    EXACT integers via the div/mod decomposition ``(t div w)*1e6 +
    ((t mod w)*1e6) div w`` — no float, and the intermediate stays in
    BIGINT while a language's word count is < ~9.2e12 (beyond ~9
    trillion words per language, pre-scale the sums; the bound is
    documented, not silent).

    Scale: bpe_encode is pure map-side; the lang attach is one
    id-keyed hash join; the rollup is one lang-keyed map-side-combined
    aggregate (|langs| rows out). Docs with zero words contribute
    nothing (n_words > 0 filter — a NULL/empty doc has no fertility);
    NULL languages are excluded.
    """
    enc = bpe_encode(df, merges, id_col=id_col, text_col=text_col)
    lang = df.filter(F.col(lang_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"), F.col(lang_col)
    )
    j = enc.join(lang, "doc_id").filter(F.col("n_words") > 0)
    agg = j.groupBy(lang_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("n_words"),
        F.sum("n_symbols_char").cast("long").alias("n_symbols_char"),
        F.sum("n_tokens_bpe").cast("long").alias("n_tokens_bpe"),
    )
    def ratio_e6(num: str, den: str) -> "F.Column":
        return F.expr(
            f"({num} div {den}) * 1000000"
            f" + (({num} % {den}) * 1000000) div {den}"
        ).cast("long")

    return agg.select(
        lang_col, "n_docs", "n_words", "n_symbols_char", "n_tokens_bpe",
        ratio_e6("n_tokens_bpe", "n_words").alias("fertility_e6"),
        ratio_e6("n_tokens_bpe", "n_symbols_char").alias(
            "tokens_per_char_e6"
        ),
    )
