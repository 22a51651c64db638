"""Unit tests for operators/curation.py — deterministic splits/sampling,
decontamination, repetition stats, PII redaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgis_gtfs_importer_spark.operators import curation as C


def test_assign_split_is_stable_under_repartition_and_growth(spark):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    base = spark.range(500).select(F.col("id").alias("doc_id"))
    a1 = {
        r.doc_id: r.split
        for r in base.select(
            "doc_id", C.assign_split("doc_id", w).alias("split")
        ).collect()
    }
    # same keys, different partitioning and a grown corpus
    grown = spark.range(1000).select(F.col("id").alias("doc_id")).repartition(7)
    a2 = {
        r.doc_id: r.split
        for r in grown.select(
            "doc_id", C.assign_split("doc_id", w).alias("split")
        ).collect()
    }
    assert all(a2[k] == v for k, v in a1.items())
    # proportions roughly honored (md5 is uniform)
    n_train = sum(1 for v in a2.values() if v == "train")
    assert 0.72 <= n_train / 1000 <= 0.88
    assert set(a2.values()) == {"train", "val", "test"}


def test_assign_split_disjoint_and_exhaustive(spark):
    w = {"train": 0.9, "val": 0.05, "test": 0.05}
    df = spark.range(2000).select(C.assign_split("id", w).alias("split"))
    counts = {r.split: r.n for r in df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000


def test_stratified_sample_deterministic_subset(spark):
    df = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    s1 = C.stratified_sample(df, "doc_id", "lang", {"en": 0.3}, default_rate=1.0)
    s2 = C.stratified_sample(df.repartition(5), "doc_id", "lang", {"en": 0.3})
    ids1 = {r.doc_id for r in s1.collect()}
    ids2 = {r.doc_id for r in s2.collect()}
    assert ids1 == ids2
    # de kept whole, en downsampled to ~30%
    de = [i for i in ids1 if i % 2 == 1]
    en = [i for i in ids1 if i % 2 == 0]
    assert len(de) == 200
    assert 30 <= len(en) <= 90


def test_decontaminate_flags_overlap_only(spark):
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),  # contains bench 4-gram
            (2, "one two three four five six"),  # disjoint
            (3, "Beta Gamma DELTA epsilon trailing words"),  # case-insensitive hit
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "beta gamma delta epsilon")], "doc_id long, text string"
    )
    out = {
        r.doc_id: (r.n_shared_ngrams, r.n_bench_docs)
        for r in C.decontaminate(corpus, bench, n=4).collect()
    }
    assert out == {1: (1, 1), 3: (1, 1)}


def test_decontaminate_broadcasts_benchmark(spark):
    corpus = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} w{i+3} w{i+4}") for i in range(50)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(999, "w1 w2 w3 w4")], "doc_id long, text string"
    )
    plan = C.decontaminate(corpus, bench, n=4)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_repetition_stats_values(spark):
    df = spark.createDataFrame(
        [
            (0, "a b c a b c a b c"),  # grams: 7 total, 3 distinct, max mult 3
            (1, "x y"),  # shorter than n
            (2, ""),
            (3, "p q r s"),  # 2 grams, all distinct
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in C.repetition_stats(df, n=3).collect()}
    assert (rows[0].n_ngrams, rows[0].n_distinct, rows[0].max_multiplicity) == (7, 3, 3)
    assert rows[0].dup_ratio_e6 == 571429  # floor((1 - 3/7)*1e6 + .5)
    assert (rows[1].n_ngrams, rows[1].dup_ratio_e6, rows[1].max_multiplicity) == (0, 0, 0)
    assert (rows[2].n_ngrams, rows[3].n_ngrams, rows[3].max_multiplicity) == (0, 2, 1)


def test_redact_pii_idempotent_and_counts(spark):
    df = spark.createDataFrame(
        [
            (0, "write a.b+c@ex-1.co.uk or call +49-123-4567-890 from 10.0.0.1"),
            (1, "clean text, no pii; v1.2.3 is not an ip"),
        ],
        "doc_id long, text string",
    )
    e, p, i = C.pii_counts("text")
    once = df.select(
        "doc_id",
        e.alias("e"), p.alias("p"), i.alias("i"),
        C.redact_pii("text").alias("red"),
    )
    rows = {r.doc_id: r for r in once.collect()}
    assert (rows[0].e, rows[0].p, rows[0].i) == (1, 1, 1)
    assert rows[0].red == "write [EMAIL] or call [PHONE] from [IP]"
    assert (rows[1].e, rows[1].p, rows[1].i) == (0, 0, 0)
    assert rows[1].red == rows[1].red  # unchanged text survives
    twice = once.select("doc_id", C.redact_pii("red").alias("red2"), "red")
    assert all(r.red2 == r.red for r in twice.collect())


def test_ngram_capped_matches_uncapped_on_corpus(spark):
    """df-capping drops only all-hot-overlap pairs; on the test corpus the
    capped operator must return a subset of the uncapped pairs with
    identical (exact, full-set) jaccard values."""
    from postgis_gtfs_importer_spark.operators import dedup as DD
    from postgis_gtfs_importer_spark.sources.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    kw = dict(id_col="doc_id", text_col="text", block_col="lang", n=3,
              threshold=0.05)
    uncapped = {
        (r.id_a, r.id_b): r.jaccard_e6
        for r in DD.ngram_jaccard_pairs(d, **kw).collect()
    }
    capped = {
        (r.id_a, r.id_b): r.jaccard_e6
        for r in DD.ngram_jaccard_pairs_capped(d, **kw, max_df=5).collect()
    }
    assert set(capped) <= set(uncapped)
    assert all(uncapped[k] == v for k, v in capped.items())
    # the cap must not cost recall on real near-dups here
    assert capped == uncapped


def test_pack_sequences_layout_invariants(spark):
    df = spark.createDataFrame(
        [(i, 10 + (i % 7) * 30) for i in range(100)] + [(200, 0)],
        "doc_id long, n_tokens int",
    )
    out = C.pack_sequences(df, "doc_id", "n_tokens", capacity=64, n_shards=3)
    rows = sorted(out.collect(), key=lambda r: (r.shard, r.doc_id))
    assert all(r.doc_id != 200 for r in rows)  # empty docs excluded
    # within each shard: contiguous token stream, no gaps or overlaps
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    assert len(by_shard) == 3
    for shard_rows in by_shard.values():
        off = 0
        for r in shard_rows:
            assert r.start_off == off
            assert r.window_first == off // 64
            assert r.window_last == (off + r.n_tokens - 1) // 64
            off += r.n_tokens
    # deterministic under repartition
    out2 = C.pack_sequences(
        df.repartition(7), "doc_id", "n_tokens", capacity=64, n_shards=3
    )
    assert sorted(map(tuple, out2.collect())) == sorted(map(tuple, rows))


def test_balanced_mixture_equalizes_strata(spark):
    rows = (
        [(i, "big") for i in range(400)]
        + [(1000 + i, "mid") for i in range(100)]
        + [(2000 + i, "rare") for i in range(40)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = C.balanced_mixture(df, "doc_id", "lang")
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # rare kept whole; big/mid downsampled toward 40 (hash-uniform, so ±50%)
    assert counts["rare"] == 40
    assert 20 <= counts["big"] <= 60
    assert 20 <= counts["mid"] <= 60
    # deterministic under repartition
    out2 = C.balanced_mixture(df.repartition(9), "doc_id", "lang")
    assert sorted(map(tuple, out2.collect())) == sorted(map(tuple, out.collect()))
    # corpus side never shuffles for the threshold application: thresholds
    # reach the filter via broadcast joins only
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_cap_per_stratum_caps_and_orders(spark):
    from postgis_gtfs_importer_spark.operators.curation import cap_per_stratum

    rows = [(i, "hot" if i < 50 else "cold", i % 7) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string, quality long")
    out = cap_per_stratum(df, "source", "quality", "doc_id", cap=5)
    pdf = out.toPandas()
    assert (pdf.groupby("source").size() <= 5).all()
    hot = pdf[pdf.source == "hot"].sort_values("rank")
    # highest quality first; doc_id ascending breaks ties deterministically
    assert list(hot["quality"]) == sorted(hot["quality"], reverse=True)
    assert hot.iloc[0]["quality"] == 6 and hot.iloc[0]["doc_id"] == 6


def test_negative_samples_deterministic_and_never_self(spark):
    from postgis_gtfs_importer_spark.operators.curation import negative_samples

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    a = negative_samples(df, "doc_id", k=4, buckets=64)
    b = negative_samples(df, "doc_id", k=4, buckets=64)
    ra = {(r.id, r.offset, r.neg_id) for r in a.collect()}
    rb = {(r.id, r.offset, r.neg_id) for r in b.collect()}
    assert ra == rb, "negatives must be re-run-stable"
    assert all(i != n for i, _, n in ra), "self-pairs must be dropped"
    # 64 buckets over 500 docs: every bucket populated -> k (or k-1 when
    # the anchor IS a neighbor bucket's representative) per anchor
    from collections import Counter
    per_anchor = Counter(i for i, _, _ in ra)
    assert set(per_anchor.values()) <= {3, 4}
    assert sum(1 for v in per_anchor.values() if v == 4) > 400


def test_percentile_gate_integer_ceiling_and_determinism(spark):
    from postgis_gtfs_importer_spark.operators.curation import (
        percentile_gate,
    )

    # stratum a: 5 rows -> ceil(5/4) = 2 survive; b: 1 row -> 1 survives
    rows = [(i, "a", 100 - i) for i in range(5)] + [(99, "b", 7)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, score long")
    out = percentile_gate(
        df, score_col="score", stratum_col="lang", id_col="doc_id"
    ).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    assert len(by_lang["a"]) == 2 and len(by_lang["b"]) == 1
    assert {r.doc_id for r in by_lang["a"]} == {0, 1}  # highest scores
    assert all(r.stratum_size == 5 for r in by_lang["a"])
    # score ties break on id: equal scores keep the LOWEST ids
    tied = spark.createDataFrame(
        [(i, "x", 5) for i in range(8)], "doc_id long, lang string, score long"
    )
    kept = sorted(
        r.doc_id
        for r in percentile_gate(
            tied, score_col="score", stratum_col="lang", id_col="doc_id"
        ).collect()
    )
    assert kept == [0, 1]  # ceil(8/4) = 2, deterministic under total tie


def test_temperature_sample_sqrt_rates_and_determinism(spark):
    from postgis_gtfs_importer_spark.operators.curation import temperature_sample

    rows = [(i, "big") for i in range(100)] + [(1000 + i, "small") for i in range(4)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = temperature_sample(df, "doc_id", "source", scale=2.0)
    got = {(r["doc_id"], r["source"]) for r in out.collect()}
    # small stratum: rate = min(1, 2/sqrt(4)) = 1 -> all four kept
    assert {(1000 + i, "small") for i in range(4)} <= got
    # big stratum: rate 2/sqrt(100) = 0.2 -> ~20 of 100 (hash-thresholded)
    n_big = sum(1 for d, s in got if s == "big")
    assert 8 <= n_big <= 35
    # deterministic under repartitioning
    got2 = {
        (r["doc_id"], r["source"])
        for r in temperature_sample(
            df.repartition(7), "doc_id", "source", scale=2.0
        ).collect()
    }
    assert got == got2
