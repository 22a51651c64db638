"""BPE tokenizer induction: the Spark trainer must reproduce the classic
pure-Python reference EXACTLY (merge-for-merge), which is the honest
verification for an iterative operator no SQL oracle can express."""

from __future__ import annotations

from postgis_gtfs_importer_spark.operators.bpe import (
    EOW,
    bpe_merges,
    bpe_reference,
)


def _train_both(spark, texts, n):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r.lhs, r.rhs, r.pair_count)
        for r in bpe_merges(df, n_merges=n).orderBy("rank").collect()
    ]
    want = bpe_reference(texts, n)
    return got, want


def test_bpe_matches_reference_on_classic_corpus(spark):
    # the Sennrich toy corpus shape: shared suffixes should merge early
    texts = [
        "low low low low low",
        "lower lower newest newest newest newest newest newest",
        "widest widest widest",
    ]
    got, want = _train_both(spark, texts, 10)
    assert got == want
    # the first merge on this corpus is the dominant adjacent pair of
    # 'newest' (e s or s t depending on counts) — assert it learned a
    # multi-char symbol by rank 10
    assert any(len(l + r) > 2 for l, r, _ in got)


def test_bpe_deterministic_tiebreak(spark):
    # two pairs with identical counts: lexical (lhs, rhs) order decides
    texts = ["ab", "ab", "cd", "cd"]
    got, want = _train_both(spark, texts, 2)
    assert got == want
    assert got[0][:2] == ("a", "b")  # ('a','b') < ('c','d')


def test_bpe_exhausts_and_stops_early(spark):
    # single-char word + EOW: one merge possible, then no pairs remain
    texts = ["x x x"]
    got, want = _train_both(spark, texts, 5)
    assert got == want
    assert len(got) == 1 and got[0] == ("x", EOW, 3)


def test_bpe_on_driver_testdata_prefix(spark):
    """Real corpus smoke at sf0.001 + reference equality."""
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    texts = [r.text for r in docs.select("text").collect()]
    got = [
        (r.lhs, r.rhs, r.pair_count)
        for r in bpe_merges(docs, n_merges=8).orderBy("rank").collect()
    ]
    assert got == bpe_reference(texts, 8)


def test_bpe_encode_matches_reference(spark):
    from postgis_gtfs_importer_spark.operators.bpe import (
        bpe_encode,
        bpe_encode_reference,
        bpe_reference,
    )

    texts = [
        "low low low low low lower lower",
        "newest newest newest widest widest",
        "the newest low",
    ]
    merges = [(l, r) for l, r, _ in bpe_reference(texts, 6)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in bpe_encode(df, merges).collect()}
    for i, t in enumerate(texts):
        toks = bpe_encode_reference(t, merges)
        words = t.split()
        assert out[i].n_words == len(words)
        assert out[i].n_symbols_char == sum(len(w) + 1 for w in words)
        assert out[i].n_tokens_bpe == len(toks)
        # merges only ever shrink the sequence
        assert out[i].n_tokens_bpe <= out[i].n_symbols_char


def test_bpe_encode_is_shuffle_free(spark):
    from postgis_gtfs_importer_spark.operators.bpe import bpe_encode

    df = spark.createDataFrame([(1, "aa ab aa")], "doc_id long, text string")
    out = bpe_encode(df, [("a", "a"), ("aa", "</w>")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    r = out.collect()[0]
    # 'aa' -> [aa,</w>] -> [aa</w>]: 1 token; 'ab' -> [a,b,</w>]: 3
    assert r.n_tokens_bpe == 1 + 3 + 1
