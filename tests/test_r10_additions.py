"""Round-10 additions: trigram stupid-backoff LM scoring (the
CCNet/KenLM-class fluency gate one order above bigram_lm_scores,
VERDICT r9 item 5) and the other r10 waves' operators.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgis_gtfs_importer_spark.operators.indexing import (
    trigram_backoff_scores,
)


# --------------------------------------------- trigram_backoff_scores


def _score(spark, docs, train_ids):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    train = df.filter(F.col("doc_id").isin(list(train_ids)))
    rows = trigram_backoff_scores(df, train).collect()
    return {r["doc_id"]: r for r in rows}


def test_trigram_in_model_doc_uses_trigram_level(spark):
    """A training doc probes only trigrams the model has seen: zero
    backoff, and a deterministic-corpus conditional of exactly 1.0
    (every (w1, w2) head continues one way -> 1e6 per trigram)."""
    got = _score(spark, [(1, "a b c d")], {1})
    r = got[1]
    assert r["n_trigrams"] == 2  # (a b c), (b c d)
    assert r["n_backoff"] == 0
    assert r["mean_sb_e6"] == 1_000_000


def test_trigram_backoff_chain_levels(spark):
    """Held-out doc exercises every backoff level. Train: 'a b c'
    (c3={abc:1}, c2={bc:1}, c1={c:1}, N=1).

    Probe doc 'a b c' (in-model, 1e6), doc 'x b c' (trigram unseen,
    bigram (b,c) seen -> 0.4 * 1e6 = 400000), doc 'x y c' (bigram
    (y,c) unseen, unigram c seen -> 0.16 * 1e6 = 160000), doc
    'x y z' (z unseen entirely -> 0)."""
    got = _score(
        spark,
        [(1, "a b c"), (2, "x b c"), (3, "x y c"), (4, "x y z")],
        {1},
    )
    assert got[1]["mean_sb_e6"] == 1_000_000 and got[1]["n_backoff"] == 0
    assert got[2]["mean_sb_e6"] == 400_000 and got[2]["n_backoff"] == 1
    assert got[3]["mean_sb_e6"] == 160_000 and got[3]["n_backoff"] == 1
    assert got[4]["mean_sb_e6"] == 0 and got[4]["n_backoff"] == 1


def test_trigram_short_docs_absent(spark):
    """Documents with fewer than 3 tokens have no trigram and no row."""
    got = _score(spark, [(1, "a b c"), (2, "a b"), (3, "a"), (4, "  ")], {1})
    assert set(got) == {1}


def test_trigram_mean_is_occurrence_weighted(spark):
    """Repeated trigrams weight the mean by multiplicity: train has
    'a b a b a' (trigrams aba x2? no: (a b a), (b a b), (a b a) -> aba
    m=2, bab m=1; heads (a,b)=2, (b,a)=1 -> p(aba)=1e6, p(bab)=1e6),
    so the self-scored doc means exactly 1e6 over 3 occurrences."""
    got = _score(spark, [(1, "a b a b a")], {1})
    r = got[1]
    assert r["n_trigrams"] == 3
    assert r["mean_sb_e6"] == 1_000_000


def test_trigram_backoff_is_a_score_not_probability(spark):
    """Unnormalized by design: a held-out doc mixing seen and unseen
    trigrams gets the exact integer mean of its per-occurrence
    contributions (here (1e6 + 400000) / 2)."""
    got = _score(spark, [(1, "a b c d"), (2, "a b c x c d")], {1})
    # doc 2 trigrams: (a b c) seen -> 1e6; (b c x) unseen, (c x)
    # unseen bigram, x unseen unigram -> 0; (c x c): unseen all the
    # way to unigram c: c1(c)=1? c appears as w3 in (a b c) only;
    # N = 2 train trigrams -> 0.16 * 1e6 * 1/2 = 80000;
    # (x c d): bigram (c d) seen -> 400000.
    r = got[2]
    assert r["n_trigrams"] == 4
    assert r["n_backoff"] == 3
    total = 1_000_000 + 0 + 80_000 + 400_000
    assert r["mean_sb_e6"] == round(total / 4)  # floor(x + 0.5)
