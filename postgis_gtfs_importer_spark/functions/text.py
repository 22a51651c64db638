"""Text-analysis column functions for large-scale corpus pipelines.

These extend the reference's text handling (BCP-47 lower-casing, C4 at
/root/reference/import.sh:125) into the operator family a training-data
pipeline needs: tokenization, quality scoring, language ID, fingerprinting
(BASELINE.json "north_star"). Everything is a pure column expression —
JVM-side, codegen, no Python in the hot path — and each has an exact ANSI-SQL
twin used by the DuckDB oracle (see __spark_entry__.oracle_sql), which keeps
the semantics portable and the oracle honest.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small, distinctive stopword lists per language. Deliberately tiny: the
# point is a cheap, deterministic n-gram/stopword heuristic (not a model),
# identical in Spark and the SQL oracle.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "was", "that", "it", "with", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu"],
    "fr": ["le", "la", "les", "et", "est", "dans", "pour", "que", "une", "du"],
    "es": ["el", "los", "las", "es", "y", "en", "por", "una", "como", "del"],
}

# ASCII-ish word/number/symbol tokenizer, shared with the oracle SQL. Kept
# RE2-compatible (no lookarounds) so DuckDB executes the same pattern.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def ws_tokens(col: Column | str) -> Column:
    """Whitespace tokens of trimmed text; empty text -> empty array."""
    c = F.trim(_c(col))
    return F.when(F.length(c) == 0, F.array().cast("array<string>")).otherwise(
        F.split(c, r"\s+")
    )


def lower_ws_tokens_nonempty(col: Column | str) -> Column:
    """Lowercased whitespace tokens with empty strings filtered — THE
    shared tokenizer of the BPE trainer/encoder, the bigram-LM
    featurizer, and every oracle twin that replays
    ``list_filter(list_transform(regexp_split_to_array(trim(x), '\\s+'),
    t -> lower(t)), t -> t <> '')``. One definition: a tokenization
    tweak applied here reaches all of them in lock-step (the
    copy-pasted expression blocks this replaces could silently
    diverge). NOTE: distinct from :func:`ws_tokens` (no lowercase, no
    empty-filter) — the two serve different oracle contracts.
    """
    return F.filter(
        F.transform(F.split(F.trim(_c(col)), r"\s+"), lambda x: F.lower(x)),
        lambda x: x != F.lit(""),
    )


def token_count(col: Column | str) -> Column:
    return F.size(ws_tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Count of BPE-ish regex tokens (letter runs, digit runs, single symbols)."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(BPE_ISH_PATTERN), 0))


def non_alnum_count(col: Column | str) -> Column:
    return F.length(F.regexp_replace(_c(col), r"[A-Za-z0-9\s]", ""))


def upper_count(col: Column | str) -> Column:
    return F.length(F.regexp_replace(_c(col), r"[^A-Z]", ""))


def han_count(col: Column | str) -> Column:
    """Count of CJK (Han) characters — the zh signal for language ID."""
    return F.length(F.regexp_replace(_c(col), "[^一-鿿]", ""))


def stopword_hits(col: Column | str, lang: str) -> Column:
    """Number of (lowercased, whitespace) tokens that are stopwords of lang."""
    words = STOPWORDS[lang]
    toks = F.transform(ws_tokens(col), lambda t: F.lower(t))
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def lang_id(col: Column | str) -> Column:
    """Deterministic heuristic language ID over {zh,en,de,fr,es,unknown}.

    Han characters present -> zh; otherwise the language with the most
    stopword hits, ties broken in en > de > fr > es order; all-zero ->
    unknown. Mirrors the oracle SQL exactly.
    """
    hits = {lang: stopword_hits(col, lang) for lang in STOPWORDS}
    best = F.greatest(*hits.values())
    expr = F.when(han_count(col) > 0, F.lit("zh")).when(best == 0, F.lit("unknown"))
    for lang in ("en", "de", "fr", "es"):
        expr = expr.when(hits[lang] == best, F.lit(lang))
    return expr


def quality_score(col: Column | str) -> Column:
    """Cheap [0,1] document-quality score from surface statistics.

    0.4 * alpha_ratio + 0.3 * (1 - non_alnum_ratio) + 0.3 * length_factor
    where length_factor saturates at 200 whitespace tokens. Returned
    unrounded — callers quantize (plans.queries.fixed_point) for
    engine-portable comparison.
    """
    c = _c(col)
    n = F.greatest(F.length(c), F.lit(1))
    alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", "")) / n
    punct = non_alnum_count(c) / n
    length_factor = F.least(token_count(c) / F.lit(200.0), F.lit(1.0))
    return 0.4 * alpha + 0.3 * (1.0 - punct) + 0.3 * length_factor


def normalized_text(col: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapsed whitespace."""
    return F.trim(F.regexp_replace(F.lower(_c(col)), r"\s+", " "))


def fingerprint(col: Column | str) -> Column:
    """128-bit content fingerprint (md5 hex of the normalized text)."""
    return F.md5(normalized_text(col))
