"""Multimodal plumbing tests: batch shapes, schemas, cardinality behavior
of the mapInPandas stages (decode kernels are deterministic fakes — see
operators.multimodal docstring; the plumbing is what's under test)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgis_gtfs_importer_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, "x" * (10 + 37 * i)) for i in range(20)]
    return MM.with_binary_payload(
        spark.createDataFrame(rows, "doc_id long, text string")
    )


def test_payload_is_binary(docs):
    assert dict(docs.dtypes)["payload"] == "binary"


def test_image_features_deterministic(docs):
    feats = {r.doc_id: r for r in MM.image_features(docs).collect()}
    assert len(feats) == 20
    r = feats[3]  # len = 10 + 111 = 121
    assert r.byte_len == 121
    assert r.width == 121 % 640 + 1 and r.height == (121 * 7) % 480 + 1
    assert r.format == "jpeg"  # odd length


def test_image_features_no_shuffle(docs):
    plan = MM.image_features(docs)._sc._jvm and MM.image_features(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # bytes never shuffle


def test_resize_truncates_payload(docs):
    out = MM.resize_images(docs, max_side=16)
    lens = [len(r.payload) for r in out.collect()]
    assert all(n <= 16 for n in lens)
    assert out.schema == docs.schema  # binary -> binary, schema preserved


def test_sample_frames_cardinality(docs):
    frames = MM.sample_frames(docs, every_n_bytes=64, max_frames=8)
    per_doc = {
        r.doc_id: r.n
        for r in frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    # doc 0: 10 bytes -> 1 frame; doc 19: 713 bytes -> capped at 8
    assert per_doc[0] == 1
    assert per_doc[19] == 8
    first = frames.filter((F.col("doc_id") == 19) & (F.col("frame_idx") == 0)).first()
    assert len(first.frame_bytes) == 64
