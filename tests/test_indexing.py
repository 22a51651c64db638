"""Unit tests for the indexing operator family (chunking, TF-IDF,
inverted index, semantic dedup, stream-stream interval join) on crafted
inputs — the oracle-parity tests cover the testdata path."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from postgis_gtfs_importer_spark.operators.indexing import (
    build_inverted_index,
    chunk_documents,
    distinctive_terms,
)
from postgis_gtfs_importer_spark.operators.similarity import semantic_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_documents_windows_and_overlap(spark):
    text = " ".join(f"t{i}" for i in range(10))
    d = _docs(spark, [(1, text)])
    out = chunk_documents(d, chunk_size=4, stride=3).collect()
    # n=10, C=4, S=3 -> 1 + ceil(6/3) = 3 chunks
    assert [r.chunk_idx for r in out] == [0, 1, 2]
    chunks = {r.chunk_idx: r.chunk_text.split(" ") for r in out}
    assert chunks[0] == ["t0", "t1", "t2", "t3"]
    assert chunks[1] == ["t3", "t4", "t5", "t6"]
    assert chunks[2] == ["t6", "t7", "t8", "t9"]
    # consecutive chunks overlap by C - S = 1 token
    assert chunks[0][-1] == chunks[1][0]
    # every token covered
    assert set().union(*chunks.values()) == {f"t{i}" for i in range(10)}


def test_chunk_documents_edges(spark):
    d = _docs(spark, [(1, ""), (2, "   "), (3, "one two"), (4, "A B C D E")])
    out = chunk_documents(d, chunk_size=4, stride=3)
    rows = {(r.doc_id, r.chunk_idx): r for r in out.collect()}
    # empty/blank docs produce no chunks
    assert {k[0] for k in rows} == {3, 4}
    # short doc: single chunk, short length
    assert rows[(3, 0)].n_tokens == 2
    assert rows[(3, 0)].chunk_text == "one two"
    # n=5, C=4, S=3 -> 2 chunks, last one short + lowercased
    assert rows[(4, 0)].chunk_text == "a b c d"
    assert rows[(4, 1)].chunk_text == "d e"
    with pytest.raises(ValueError):
        chunk_documents(d, chunk_size=0)


def test_distinctive_terms_ranks_group_specific_tokens(spark):
    rows = [
        (1, "shared shared kernel kernel kernel", "code"),
        (2, "shared kernel compiler", "code"),
        (3, "shared shared sonnet sonnet sonnet", "poetry"),
        (4, "shared sonnet meter", "poetry"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = distinctive_terms(d, "source", "doc_id", "text", k=2)
    top = {r.source: r.tok for r in out.collect() if r.rn == 1}
    # group-exclusive high-tf terms outrank the corpus-wide 'shared'
    assert top == {"code": "kernel", "poetry": "sonnet"}
    kernel = [r for r in out.collect() if r.tok == "kernel"][0]
    # tf=4 occurrences in 'code', df=2 docs, N=4 docs -> score = 4*4 div 2
    assert (kernel.tf, kernel.df_docs, kernel.score) == (4, 2, 8)


def test_inverted_index_postings_bounded_sorted(spark):
    rows = [(i, "common special" if i < 3 else "common") for i in range(10)]
    d = _docs(spark, rows)
    out = {r.tok: r for r in build_inverted_index(
        d, min_df=2, postings_cap=4).collect()}
    assert out["common"].df == 10
    assert out["common"].total_tf == 10
    # preview capped at 4, ascending doc ids
    assert out["common"].postings == "0,1,2,3"
    assert out["special"].postings == "0,1,2"
    # min_df honored: nothing below 2 (no hapax in this corpus anyway)
    assert all(r.df >= 2 for r in out.values())


def test_inverted_index_min_df_filters(spark):
    d = _docs(spark, [(1, "a b"), (2, "a")])
    toks = {r.tok for r in build_inverted_index(d, min_df=2).collect()}
    assert toks == {"a"}


def test_semantic_dedup_flags_clustermates(spark):
    # 4 identical vectors + 2 orthogonal ones; centroids = vec_id < 2
    v1 = [1.0, 0.0, 0.0]
    v2 = [0.0, 1.0, 0.0]
    rows = [(0, v1), (1, v2), (2, v1), (3, v1), (4, v1), (5, v2)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: (r.cid, r.is_dup) for r in semantic_dedup(
        emb, threshold=0.9, n_centroids=2).collect()}
    # min-id representative of each duplicate set survives
    assert out[0] == (0, 0)
    assert out[1] == (1, 0)
    # clustermates of a lower id above threshold are flagged
    assert out[2] == (0, 1) and out[3] == (0, 1) and out[4] == (0, 1)
    assert out[5] == (1, 1)


def test_interval_join_stream_matches_batch(spark, tmp_path):
    from postgis_gtfs_importer_spark.streaming import events as SE

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    eid = 0
    for user in range(3):
        for m in (0, 10, 50, 70, 200):
            rows.append((eid, user, "click" if m % 20 == 0 else "purchase",
                         base + dt.timedelta(minutes=m + user), "1.0", "{}"))
            eid += 1
    df = spark.createDataFrame(rows, SE.EVENT_SCHEMA)
    d = str(tmp_path / "ev")
    df.coalesce(1).write.mode("overwrite").parquet(d)

    stream = SE.stream_events(spark, d)
    joined = SE.interval_join_stream(
        stream.filter(F.col("event_type") == "click"),
        stream.filter(F.col("event_type") == "purchase"),
        window_sec=3600,
    )
    SE.run_to_memory(joined, "ij_test")
    got = {
        (r.user_id, r.event_id_l, r.event_id_r, r.gap_sec)
        for r in spark.table("ij_test").collect()
    }

    b = spark.read.parquet(d)
    l = b.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("el"),
        F.col("ts").alias("tl"))
    r = b.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("ur"), F.col("event_id").alias("er"),
        F.col("ts").alias("tr"))
    batch = l.join(r, (F.col("u") == F.col("ur"))
                   & (F.col("tr") >= F.col("tl"))
                   & (F.col("tr") <= F.col("tl") + F.expr("INTERVAL 3600 SECONDS")))
    expected = {
        (x.u, x.el, x.er,
         int(x.tr.timestamp()) - int(x.tl.timestamp()))
        for x in batch.collect()
    }
    assert got == expected
    assert got, "join should produce matches"


def test_pmi_bigrams_finds_collocation(spark):
    from postgis_gtfs_importer_spark.operators.indexing import pmi_bigrams

    # "new york" always adjacent; filler tokens are independent
    rows = [(i, "new york " + " ".join(f"w{j}" for j in range(i % 3 + 1)))
            for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pmi_bigrams(df, min_count=5, k=10).collect()
    assert out, "no bigrams returned"
    by_bigram = {r.bigram: r for r in out}
    # the designed collocation is present, in every doc, above chance.
    # (it need not be rank 1: rarer all-or-nothing pairs like "w1 w2"
    # score higher — PMI's known rare-pair preference, by design.)
    ny = by_bigram["new york"]
    assert ny.c_ab == 20
    assert ny.ratio_e6 > 1_000_000
    # "york new" never occurs adjacently
    assert "york new" not in by_bigram
    # ranked by rounded integer, descending
    vals = [r.ratio_e6 for r in out]
    assert vals == sorted(vals, reverse=True)


def test_bm25_ranks_term_rich_docs_first(spark):
    from postgis_gtfs_importer_spark.operators.indexing import bm25_topk

    rows = [
        (1, "join join join filler filler"),
        (2, "join filler filler filler filler"),
        (3, "filler filler filler filler filler"),
        (4, "join vector filler filler filler"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_topk(df, ["join", "vector"], k=4).collect()
    ids = [r.doc_id for r in out]
    assert 3 not in ids  # no query term -> no row
    assert ids[0] == 4   # two distinct terms beat repeated one term here
    assert out[0].n_terms_hit == 2
    # equal-length docs, saturating tf: doc 1 (tf=3) above doc 2 (tf=1)
    assert ids.index(1) < ids.index(2)
    assert all(r.score_e6 > 0 for r in out)


def test_lexical_rarity_orders_boilerplate_above_jargon(spark):
    from postgis_gtfs_importer_spark.operators.indexing import lexical_rarity

    rows = [
        (1, "the quick brown fox"),       # tokens shared with doc 2/3
        (2, "the quick brown fox"),
        (3, "the quick brown fox"),
        (4, "zyzzyva qwerty flurble xyzzy"),  # corpus-unique jargon
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in lexical_rarity(df).collect()}
    assert out[1].n_tokens == 4
    # boilerplate: every token in 3 of 4 docs -> mean df ratio = 3/4
    assert out[1].mean_df_e6 == 750000
    # jargon: every token unique -> 1/4
    assert out[4].mean_df_e6 == 250000


def test_bigram_lm_scores_fluent_above_degenerate(spark):
    from postgis_gtfs_importer_spark.operators.indexing import (
        bigram_lm_scores,
    )

    rows = [
        # three docs repeating the same continuation: "a b" dominates
        (1, "a b a b a b"),
        (2, "a b a b"),
        # degenerate doc: "a" continues to corpus-rare tokens
        (3, "a x a y a z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in bigram_lm_scores(df).collect()}
    assert out[1].n_bigrams == 5 and out[2].n_bigrams == 3
    # fluent docs outscore the one with unpredictable continuations
    assert out[1].mean_cond_e6 > out[3].mean_cond_e6
    # conditional distribution: p(.|a) sums to 1 -> a doc consisting of
    # ALL of a's continuations weighted by count has mean p(.|'a') ==
    # sum c12^2/c1 over its bigrams / n -- sanity: every score in (0, 1e6]
    for r in out.values():
        assert 0 < r.mean_cond_e6 <= 1_000_000


def test_bigram_lm_scores_single_token_docs_dropped(spark):
    from postgis_gtfs_importer_spark.operators.indexing import (
        bigram_lm_scores,
    )

    rows = [(1, "solo"), (2, "a b")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bigram_lm_scores(df).collect()
    assert [r.doc_id for r in out] == [2]
    # "a b" is the only bigram: p(b|a)=1 -> exactly 1e6
    assert out[0].mean_cond_e6 == 1_000_000
