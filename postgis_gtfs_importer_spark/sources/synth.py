"""Synthetic skewed corpora, generated ENTIRELY map-side.

Scale-smoke inputs above the sf0.1 testdata (VERDICT r4 item 6): a
corpus with (a) one boilerplate line repeated VERBATIM in every
document — the hottest possible key for line-level dedup and a
df=n_docs stop-shingle family for the capped Jaccard join; (b) genuine
near-dup pairs (docs 2k/2k+1 share a rare phrase) so MinHash/Jaccard
have real signal; (c) per-document unique filler so documents differ.

Built from ``spark.range`` + column expressions only — no driver-side
data, no Python row generation — so a 50M-doc corpus costs the same
plan as a 50k one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: 12 tokens = exactly one line under line_dedup's default
#: tokens_per_line, so the hot line aligns with a dedup unit.
HOT_LINE = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
)


def synth_skewed_corpus(
    spark: SparkSession,
    n_docs: int,
    hot_repeats: int = 4,
    filler_tokens: int = 36,
    phrase_tokens: int = 6,
) -> DataFrame:
    """(doc_id, text): every doc starts with ``hot_repeats`` copies of
    HOT_LINE (so the hot join key carries doc-distinct (doc_id, line_no)
    payloads heavy enough to register in COMPRESSED shuffle statistics —
    a single identical line compresses ~1000x and AQE's size-based skew
    detection never sees it), docs 2k and 2k+1 share a 6-token near-dup
    phrase, then ``filler_tokens`` unique tokens."""
    base = spark.range(int(n_docs)).select(F.col("id").alias("doc_id"))
    pair = F.expr("doc_id div 2")
    phrase = F.concat_ws(
        " ",
        *[
            F.format_string(f"pair%d_tok{j}", pair)
            for j in range(int(phrase_tokens))
        ],
    )
    filler = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(int(filler_tokens))),
            lambda i: F.format_string("u%d_%d", F.col("doc_id"), i),
        ),
        " ",
    )
    return base.select(
        "doc_id",
        F.concat_ws(
            " ", *([F.lit(HOT_LINE)] * int(hot_repeats)), phrase, filler
        ).alias("text"),
    )
