"""End-to-end corpus curation composition (plans/corpus.py): stage
ordering, per-stage accounting, and full-pipeline idempotence on the
real driver testdata."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgis_gtfs_importer_spark.plans.corpus import (
    CorpusConfig,
    curate_corpus,
)
from postgis_gtfs_importer_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents")


def test_pipeline_stages_shrink_monotonically(spark, docs):
    # benchmark = a slice of the corpus itself -> guaranteed contamination
    bench = docs.filter(F.col("doc_id") % 17 == 0).limit(20)
    res = curate_corpus(docs, benchmark=bench, cfg=CorpusConfig())
    r = res.report
    order = [
        "input", "exact_dedup", "near_dedup", "decontaminated",
        "quality_gated", "mixed",
    ]
    for a, b in zip(order, order[1:]):
        assert r[b] <= r[a], f"{b} grew over {a}: {r}"
    assert r["input"] > 0
    # the planted benchmark slice must actually remove docs
    assert r["decontaminated"] < r["near_dedup"]
    # every curated doc has a split; packed docs = curated docs with tokens
    assert res.curated.filter(F.col("split").isNull()).count() == 0
    assert r["packed_docs"] <= r["mixed"]
    assert r["packed_docs"] > 0


def test_pipeline_is_idempotent(spark, docs):
    cfg = CorpusConfig(balance_mixture=True)
    a = curate_corpus(docs, cfg=cfg)
    b = curate_corpus(docs, cfg=cfg)
    assert a.report == b.report
    assert a.curated.exceptAll(b.curated).isEmpty()
    assert a.packed.exceptAll(b.packed).isEmpty()


def test_packing_respects_split_isolation(spark, docs):
    res = curate_corpus(docs, cfg=CorpusConfig())
    joined = res.packed.join(
        res.curated.select("doc_id", F.col("split").alias("curated_split")),
        "doc_id",
    )
    assert joined.filter(
        F.col("split") != F.col("curated_split")
    ).count() == 0


def test_fluency_and_percentile_stages_compose(spark):
    """The round-4 stages slot into the chain: enabling them only ever
    shrinks the survivor set, the report attributes each drop, and the
    pipeline stays idempotent."""
    from postgis_gtfs_importer_spark.plans.corpus import (
        CorpusConfig,
        curate_corpus,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base_cfg = CorpusConfig(min_quality_e6=0, balance_mixture=False)
    base = curate_corpus(docs, cfg=base_cfg)
    cfg = CorpusConfig(
        min_quality_e6=0,
        balance_mixture=False,
        min_fluency_e6=10_000,
        percentile_keep=(1, 2),
        min_compression_ratio_e6=100_000,
    )
    out = curate_corpus(docs, cfg=cfg)
    r = out.report
    assert "fluency_gated" in r and "percentile_gated" in r
    assert "compression_gated" in r
    assert r["fluency_gated"] <= r["quality_gated"]
    assert r["compression_gated"] <= r["fluency_gated"]
    assert r["percentile_gated"] <= r["compression_gated"]
    assert r["percentile_gated"] >= 1
    # the relative gate keeps ceil(n/2) per stratum of ITS input
    assert r["percentile_gated"] <= base.report["quality_gated"]
    # idempotent: identical inputs -> identical survivor sets
    again = curate_corpus(docs, cfg=cfg)
    a = {t[0] for t in out.curated.select("doc_id").collect()}
    b = {t[0] for t in again.curated.select("doc_id").collect()}
    assert a == b


def test_trigram_fluency_stage_slots_in(spark):
    """The r10 trigram stupid-backoff gate composes like the bigram
    gate: enabling it only shrinks the survivor set, the report
    attributes the drop, and unscoreable (<3-token) docs pass."""
    from postgis_gtfs_importer_spark.plans.corpus import (
        CorpusConfig,
        curate_corpus,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cfg = CorpusConfig(
        min_quality_e6=0,
        balance_mixture=False,
        min_trigram_sb_e6=1_000,
    )
    out = curate_corpus(docs, cfg=cfg)
    r = out.report
    assert "trigram_fluency_gated" in r
    assert r["trigram_fluency_gated"] <= r["quality_gated"]
    assert r["trigram_fluency_gated"] >= 1
    # a floor of 0 keeps everything the quality gate kept (scores are
    # nonnegative; unscoreable docs pass by the LEFT-join contract)
    keep_all = curate_corpus(
        docs,
        cfg=CorpusConfig(
            min_quality_e6=0, balance_mixture=False, min_trigram_sb_e6=0
        ),
    )
    assert (
        keep_all.report["trigram_fluency_gated"]
        == keep_all.report["quality_gated"]
    )
