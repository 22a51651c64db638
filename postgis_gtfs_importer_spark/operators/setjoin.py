"""Prefix-filtered set-similarity join (PPJoin-lite).

The third member of the near-dup family, next to MinHash-LSH
(probabilistic, tunable recall) and the df-capped shingle join
(operators/dedup.py): an EXACT threshold Jaccard join that never
enumerates all pairs. The classic prefix-filtering principle
(Chaudhuri et al., SSJoin; Xiao et al., PPJoin): order every set by a
global token order, keep only each set's first

    prefix_len = |s| - ceil(tau * |s|) + 1

tokens; two sets with Jaccard >= tau MUST share at least one prefix
token, so the candidate join on prefix tokens is lossless. With the
global order = ascending document frequency, prefixes are made of the
RAREST tokens, so the candidate join's key distribution is the inverse
of the corpus's token skew — the hot boilerplate tokens land in the
suffixes and never generate candidates.

Scale design:
- token sets + df: two hash aggregates (map-side combined).
- per-doc ordering is MAP-SIDE: collect the doc's (df, tok) structs in
  one groupBy, array_sort in the row, slice the prefix — no window, no
  per-token shuffle for ranking.
- candidate generation joins prefix tokens (rare by construction);
  verification joins the two docs' full sorted token arrays and
  computes exact intersection/union sizes with array_intersect — a
  pair-bounded cost, and the pair count is bounded by the prefix
  join's output, not n^2.
- threshold test is exact integer cross-multiplication:
  inter * den >= union * num (tau = num/den), no float thresholds.

Reference scope: the reference delegates fuzzy redundancy removal to
gtfsclean (/root/reference/import.sh:44-100); this operator is the
corpus-scale exact-threshold variant of that dedup surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _jaccard_e6, shingle_rows


def prefix_filter_jaccard(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    tau_num: int = 1,
    tau_den: int = 2,
) -> DataFrame:
    """All pairs with word-``n``-gram shingle-set Jaccard >=
    tau_num/tau_den, exactly.

    Shingles, not raw tokens: a natural-language corpus shares most of
    its VOCABULARY across unrelated documents (token-set Jaccard is
    near-degenerate — the sf0.01 corpus has 9k+ pairs even at tau=0.9),
    while n-gram shingles discriminate reuse of actual passages — the
    same granularity the MinHash family uses, so the two estimates are
    directly comparable. Returns (id_a, id_b, inter, union_sz,
    jaccard_e6) with id_a < id_b.
    """
    if not (0 < tau_num <= tau_den):
        raise ValueError("tau must be in (0, 1]")
    toks = shingle_rows(df, id_col, text_col, n=n).select(
        "id", F.col("shingle").alias("tok")
    )
    dfreq = toks.groupBy("tok").agg(F.count("*").alias("df"))
    per_doc = (
        toks.join(dfreq, "tok")
        .groupBy("id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("df"), F.col("tok")))
            ).alias("wtoks"),
            F.count("*").alias("sz"),
        )
    )
    # prefix_len = sz - ceil(tau * sz) + 1, all-integer:
    # ceil(num*sz/den) = (num*sz + den - 1) div den
    prefix_len = F.expr(
        f"sz - ((sz * {tau_num} + {tau_den - 1}) div {tau_den}) + 1"
    )
    # docs is referenced three times (prefix explode + both verification
    # sides) but NOT explicitly materialized: the three subtrees share
    # the per_doc aggregate's shuffle, which Spark already deduplicates
    # via ReusedExchange — an explicit localCheckpoint was measured
    # SLOWER at sf0.1 (3.5 s -> 6.2 s warm: it pays a full extra
    # materialization to save work the exchange reuse had already saved)
    docs = per_doc.select(
        "id",
        "sz",
        F.transform(F.col("wtoks"), lambda s: s["tok"]).alias("rare_order"),
        F.slice(
            F.transform(F.col("wtoks"), lambda s: s["tok"]),
            F.lit(1),
            prefix_len.cast("int"),
        ).alias("prefix"),
    )
    # prefix rows stay NARROW (id, tok): the token arrays are joined
    # back only for pairs that survive candidate generation, so the
    # prefix join never replicates document-sized payloads.
    # The join key is the shingle's xxhash64 (r12, guide §2.3 "shuffle
    # fewer bytes"): an 8-byte long crosses the candidate self-join's
    # exchange instead of the ~30-byte n-gram string. LOSSLESS for the
    # final result: every true pair shares a real prefix token, which
    # hashes equal on both sides, so no candidate is lost; a hash
    # collision can only ADD a candidate pair, and every candidate is
    # verified afterwards by exact array_intersect over the true token
    # arrays. Measured flat at sf0.1 (ABBA 10x: 3.785 vs 3.76 s — the
    # local plan broadcasts the prefix side so no exchange pays the
    # width), kept for the at-scale sort-merge case where both prefix
    # streams shuffle.
    pref = docs.select("id", F.explode("prefix").alias("tok")).select(
        "id", F.xxhash64("tok").alias("tok")
    )
    cand = (
        pref.alias("a")
        .join(pref.alias("b"), "tok")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sets = docs.select("id", "sz", "rare_order")
    cand = (
        cand.join(
            sets.select(
                F.col("id").alias("id_a"),
                F.col("sz").alias("sz_a"),
                F.col("rare_order").alias("ts_a"),
            ),
            "id_a",
        )
        .join(
            sets.select(
                F.col("id").alias("id_b"),
                F.col("sz").alias("sz_b"),
                F.col("rare_order").alias("ts_b"),
            ),
            "id_b",
        )
    )
    inter = F.size(F.array_intersect(F.col("ts_a"), F.col("ts_b")))
    verified = cand.select(
        "id_a",
        "id_b",
        inter.cast("long").alias("inter"),
        (F.col("sz_a") + F.col("sz_b") - inter).cast("long").alias("union_sz"),
    ).filter(
        F.col("inter") * F.lit(tau_den) >= F.col("union_sz") * F.lit(tau_num)
    )
    return verified.select(
        "id_a",
        "id_b",
        "inter",
        "union_sz",
        _jaccard_e6(F.col("inter"), F.col("union_sz")).alias("jaccard_e6"),
    )
