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


# ------------------------------------------------- compaction_plan


def test_compaction_plan_bins_fill_to_target(spark):
    from postgis_gtfs_importer_spark.operators.layout import compaction_plan

    files = spark.createDataFrame(
        [(f"f{i}", 40 + i) for i in range(20)],
        "path string, size_bytes long",
    )
    rows = sorted(
        compaction_plan(files, target_bytes=100).collect(),
        key=lambda r: r["running_bytes"],
    )
    # running totals are a permutation-consistent prefix sum
    total = 0
    for r in rows:
        total += r["size_bytes"]
        assert r["running_bytes"] == total
        assert r["bin_id"] == (max(r["running_bytes"], 1) - 1) // 100
    # every bin except possibly the last crosses the target with its
    # final file (cumulative chunking: bins are FULL, overshoot < 1
    # file)
    import collections

    by_bin = collections.defaultdict(int)
    for r in rows:
        by_bin[r["bin_id"]] += r["size_bytes"]
    last = max(by_bin)
    for b, sz in by_bin.items():
        if b != last:
            assert sz + max(r["size_bytes"] for r in rows) >= 100


def test_compaction_plan_deterministic_and_oversized(spark):
    from postgis_gtfs_importer_spark.operators.layout import compaction_plan

    files = spark.createDataFrame(
        [("big", 1000), ("s1", 10), ("s2", 10)],
        "path string, size_bytes long",
    )
    a = sorted(map(tuple, compaction_plan(files, target_bytes=100).collect()))
    b = sorted(map(tuple, compaction_plan(files, target_bytes=100).collect()))
    assert a == b  # hash order: no tie-break ambiguity, run-stable
    rows = {r["path"]: r for r in compaction_plan(
        files, target_bytes=100).collect()}
    # the oversized file advances the bin counter by ~size/target:
    # whatever follows it lands in a strictly later bin
    order = sorted(rows.values(), key=lambda r: r["running_bytes"])
    for earlier, later in zip(order, order[1:]):
        if earlier["path"] == "big":
            assert later["bin_id"] > earlier["bin_id"] or (
                later["running_bytes"] - 1
            ) // 100 == (earlier["running_bytes"] - 1) // 100


def test_compaction_plan_zero_size_head_parity_guard(spark):
    """Zero-size files at the head of the hash order must bin to 0,
    not -1 (Spark div truncates toward zero; the operator guards with
    greatest(running, 1) so both engines floor identically)."""
    from postgis_gtfs_importer_spark.operators.layout import compaction_plan

    files = spark.createDataFrame(
        [(f"z{i}", 0) for i in range(5)], "path string, size_bytes long"
    )
    rows = compaction_plan(files, target_bytes=100).collect()
    assert all(r["bin_id"] == 0 for r in rows)


# ------------------------------------------------- key_skew_profile


def test_key_skew_profile_exact_stats(spark):
    from postgis_gtfs_importer_spark.operators.profiling import (
        key_skew_profile,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, None)],
        "id long, k string",
    )
    got = {r["col_name"]: r for r in key_skew_profile(df, ["id", "k"]).collect()}
    k = got["k"]
    assert (k["n_nonnull"], k["n_nulls"], k["n_keys"]) == (4, 1, 2)
    assert k["max_freq"] == 3 and k["top_key"] == "a"
    assert k["max_share_e6"] == 750_000
    assert k["hhi_e6"] == (9 + 1) * 1_000_000 // 16  # 625000
    i = got["id"]
    assert i["n_keys"] == 5 and i["hhi_e6"] == 200_000
    # uniform keys: top_key ties break toward the LARGEST string
    assert i["top_key"] == "5"


def test_key_skew_profile_hot_key_dominates(spark):
    from postgis_gtfs_importer_spark.operators.profiling import (
        key_skew_profile,
    )

    rows = [(i, "hot" if i % 10 else "cold") for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, k string")
    r = {x["col_name"]: x for x in key_skew_profile(df, ["k"]).collect()}["k"]
    assert r["top_key"] == "hot" and r["max_freq"] == 900
    assert r["max_share_e6"] == 900_000
    assert r["hhi_e6"] == (900 * 900 + 100 * 100) * 1_000_000 // (1000 * 1000)


# ------------------------------------------------- rendezvous_assign


def test_rendezvous_resharding_invariant_exact(spark):
    """THE rendezvous property, asserted exactly: growing the shard
    list from n to n+1 either keeps a key's shard or moves it to the
    NEW shard — never between survivors — and removing a shard moves
    only that shard's keys."""
    from postgis_gtfs_importer_spark.operators.layout import (
        rendezvous_assign,
    )

    df = spark.createDataFrame(
        [(i,) for i in range(2000)], "doc_id long"
    )
    shards = [f"s{i}" for i in range(4)]
    before = {
        r["doc_id"]: r["shard"]
        for r in rendezvous_assign(df, shards, id_col="doc_id").collect()
    }
    after = {
        r["doc_id"]: r["shard"]
        for r in rendezvous_assign(
            df, shards + ["s4"], id_col="doc_id"
        ).collect()
    }
    moved = {k for k in before if before[k] != after[k]}
    assert all(after[k] == "s4" for k in moved)
    # expected move fraction 1/(n+1) = 20%; allow a generous band
    assert 0.1 < len(moved) / 2000 < 0.3
    # shrink: removing s0 moves exactly s0's keys, nowhere else
    dropped = {k for k, v in before.items() if v == "s0"}
    shrunk = {
        r["doc_id"]: r["shard"]
        for r in rendezvous_assign(
            df, shards[1:], id_col="doc_id"
        ).collect()
    }
    for k in before:
        if k in dropped:
            assert shrunk[k] != "s0"
        else:
            assert shrunk[k] == before[k]


def test_rendezvous_deterministic_and_balanced(spark):
    from postgis_gtfs_importer_spark.operators.layout import (
        rendezvous_assign,
    )

    df = spark.createDataFrame([(i,) for i in range(4000)], "doc_id long")
    shards = [f"s{i}" for i in range(8)]
    a = sorted(map(tuple, rendezvous_assign(df, shards, id_col="doc_id").collect()))
    b = sorted(map(tuple, rendezvous_assign(df, shards, id_col="doc_id").collect()))
    assert a == b
    import collections

    load = collections.Counter(s for _, s in a)
    assert set(load) == set(shards)  # every shard used
    # uniform weights: no shard further than 40% from the mean
    mean = 4000 / 8
    assert all(abs(c - mean) / mean < 0.4 for c in load.values())


def test_rendezvous_validates(spark):
    from postgis_gtfs_importer_spark.operators.layout import (
        rendezvous_assign,
    )

    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="at least one shard"):
        rendezvous_assign(df, [], id_col="doc_id")
    with pytest.raises(ValueError, match="unique"):
        rendezvous_assign(df, ["a", "a"], id_col="doc_id")


# ------------------------------------------------- rbo_overlap


def _mk_ranking(spark, rows):
    return spark.createDataFrame(rows, "q_id long, vec_id long, rn long")


def test_rbo_identical_rankings_score_truncated_max(spark):
    """Identical k=3 rankings: ov_d = d at every depth, so
    RBO = (1-p) * sum p^(d-1) — the truncated-form maximum (< 1 by
    construction; documented: a gate compares like against like)."""
    from postgis_gtfs_importer_spark.operators.similarity import rbo_overlap

    r = [(1, 10, 1), (1, 11, 2), (1, 12, 3)]
    out = rbo_overlap(
        _mk_ranking(spark, r), _mk_ranking(spark, r), k=3, p=0.9
    ).collect()
    expected = 0.09999999999999998 * ((1.0 * 1 / 1.0) + (0.9 * 2 / 2.0)
                                      + (0.81 * 3 / 3.0))
    import math

    assert out[0]["rbo_e6"] == math.floor(expected * 1e6 + 0.5)


def test_rbo_head_order_divergence_beats_recall(spark):
    """Two rankings with the SAME item set (recall@3 = 1.0) but
    reversed head order score strictly below the identical pair —
    the signal recall cannot see."""
    from postgis_gtfs_importer_spark.operators.similarity import rbo_overlap

    a = [(1, 10, 1), (1, 11, 2), (1, 12, 3)]
    b = [(1, 12, 1), (1, 11, 2), (1, 10, 3)]
    same = rbo_overlap(
        _mk_ranking(spark, a), _mk_ranking(spark, a), k=3, p=0.9
    ).collect()[0]["rbo_e6"]
    rev = rbo_overlap(
        _mk_ranking(spark, a), _mk_ranking(spark, b), k=3, p=0.9
    ).collect()[0]["rbo_e6"]
    assert rev < same
    # depth-3 prefixes agree fully, so the gap is exactly the d=1,2
    # disagreement: ov = (0, 1, 3)
    import math

    expected = 0.09999999999999998 * ((1.0 * 0 / 1.0) + (0.9 * 1 / 2.0)
                                      + (0.81 * 3 / 3.0))
    assert rev == math.floor(expected * 1e6 + 0.5)


def test_rbo_disjoint_and_validation(spark):
    from postgis_gtfs_importer_spark.operators.similarity import rbo_overlap

    a = [(1, 10, 1)]
    b = [(1, 99, 1)]
    out = rbo_overlap(
        _mk_ranking(spark, a), _mk_ranking(spark, b), k=3, p=0.9
    ).collect()
    assert out[0]["rbo_e6"] == 0
    with pytest.raises(ValueError, match="0 < p < 1"):
        rbo_overlap(_mk_ranking(spark, a), _mk_ranking(spark, b), p=1.0)
    with pytest.raises(ValueError, match="k >= 1"):
        rbo_overlap(_mk_ranking(spark, a), _mk_ranking(spark, b), k=0)
