"""Regression pins for the LLM-pipeline-core review findings
(dedup, similarity, curation, functions.vectors)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_ivf_topk_external_queries_use_their_own_embeddings(spark):
    """External query sets (ids not in the corpus) must be scored with
    THEIR embeddings — the corpus-lookup form silently returned empty
    results (or scored with the corpus's vector on id collision)."""
    from postgis_gtfs_importer_spark.operators.similarity import ivf_topk

    corpus = spark.createDataFrame(
        [(i, [float(i % 7), float((i * 3) % 5), 1.0]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(1000, [1.0, 0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    out = ivf_topk(corpus, queries, k=3, n_centroids=4, nprobe=4)
    rows = out.collect()
    assert rows, "external query returned no neighbors"
    assert all(r.q_id == 1000 for r in rows)


def test_centroid_table_non_dense_ids(spark):
    """Sampled quantizer must work for ids that do not start at 0 —
    the id < n_centroids filter yielded an EMPTY centroid table and
    every downstream operator silently returned zero rows."""
    from postgis_gtfs_importer_spark.operators.similarity import ivf_topk

    corpus = spark.createDataFrame(
        [(10_000 + i, [float(i % 5), 1.0]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    q = corpus.limit(2)
    out = ivf_topk(corpus, q, k=3, n_centroids=4, nprobe=4)
    assert out.count() > 0


def test_hyperplane_sketch_rejects_dim_mismatch(spark):
    """zip_with NULL-pads a wrong-length vector: every sign bit falls to
    0 and ALL vectors land in bucket 0 — LSH degenerates to a full
    cross product. Must raise instead."""
    from postgis_gtfs_importer_spark.operators.similarity import lsh_topk

    corpus = spark.createDataFrame(
        [(i, [1.0] * 8) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="vector length"):
        lsh_topk(corpus, corpus.limit(1), k=2, dim=64).collect()
    # matching dim works
    assert lsh_topk(corpus, corpus.limit(1), k=2, dim=8).count() >= 0


def test_repetition_stats_null_text_zeros(spark):
    """NULL text must report zeros, not one phantom empty n-gram."""
    from postgis_gtfs_importer_spark.operators.curation import repetition_stats

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a b c d")], "doc_id long, text string"
    )
    got = {r.doc_id: (r.n_ngrams, r.n_distinct) for r in repetition_stats(df).collect()}
    assert got[1] == (0, 0)
    assert got[2] == (0, 0)
    assert got[3] == (2, 2)


def test_connected_components_propagate_raises_on_deep_chain(spark):
    """A 30-hop chain cannot converge in 5 propagate rounds; silent
    partial labels were returned before — now it must raise, and the
    star algorithm must handle the same chain fine."""
    from postgis_gtfs_importer_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(pairs, max_iters=5, algorithm="propagate")
    star = connected_components(pairs, algorithm="star")
    assert {r.component for r in star.collect()} == {0}


def test_neardup_incremental_intra_batch_election(spark):
    """Two docs near-identical to EACH OTHER but novel vs the index must
    not both enter the index — the batch elects one canonical."""
    from postgis_gtfs_importer_spark.operators.dedup import (
        minhash_signatures,
        neardup_incremental,
    )

    base = "the quick brown fox jumps over the lazy dog again and again " * 4
    batch = spark.createDataFrame(
        [
            (100, base + "tail one"),
            (101, base + "tail two"),
            (200, "completely different content about spark and duckdb "
                  "engines and oracles and parquet files in a lake"),
        ],
        "doc_id long, text string",
    )
    index = minhash_signatures(
        spark.createDataFrame(
            [(1, "unrelated historical corpus document entirely")],
            "doc_id long, text string",
        ),
        "doc_id",
        "text",
    )
    matches, new_rows = neardup_incremental(batch, index, "doc_id", "text")
    assert matches.count() == 0
    ids = {r.id for r in new_rows.select("id").collect()}
    assert 200 in ids
    # exactly ONE of the twins survives (the canonical, min id)
    assert (100 in ids) != (101 in ids) or ids == {100, 200}


def test_brute_force_matmul_string_ids(spark):
    """The GEMM path must honor 'same contract as brute_force_topk' for
    string ids (it hard-coded int64 before)."""
    from postgis_gtfs_importer_spark.operators.similarity import (
        brute_force_topk,
        brute_force_topk_matmul,
    )

    corpus = spark.createDataFrame(
        [(f"doc{i}", [float(i), 1.0, float(i % 3)]) for i in range(12)],
        "vec_id string, embedding array<double>",
    )
    q = corpus.limit(2)
    exact = {
        (r.q_id, r.rn): r.vec_id for r in brute_force_topk(corpus, q, k=3).collect()
    }
    fast = {
        (r.q_id, r.rn): r.vec_id
        for r in brute_force_topk_matmul(corpus, q, k=3).collect()
    }
    assert exact == fast
