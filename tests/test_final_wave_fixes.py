"""Regression pins for the final review wave (multimodal, spatial,
corpus gates, funnels, scoring)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_media_kernels_null_payload_null_features(spark):
    """NULL payload/text rows yield NULL features, never a bytes(None)
    TypeError that kills the job."""
    from postgis_gtfs_importer_spark.operators.multimodal import (
        audio_features,
        image_features,
        sample_frames,
        with_binary_payload,
    )

    docs = spark.createDataFrame(
        [(1, "some text"), (2, None)], "doc_id long, text string"
    )
    binned = with_binary_payload(docs, text_col="text")
    feats = {r.doc_id: r for r in image_features(binned).collect()}
    assert feats[2].width is None and feats[2].byte_len is None
    assert feats[1].byte_len is not None
    au = {r.doc_id: r for r in audio_features(binned, payload_col="payload").collect()}
    # text bytes are not WAV: features NULL for both, but byte_len
    # distinguishes present-vs-NULL payload and nothing crashed
    assert au[2].byte_len is None and au[1].byte_len is not None
    # frame sampling simply skips NULL payloads
    frames = sample_frames(binned).groupBy("doc_id").count().collect()
    assert {r.doc_id for r in frames} == {1}


def test_wav_subbyte_bits_no_crash():
    """4-bit ADPCM-style fmt chunk: duration undefined, not a
    ZeroDivisionError."""
    import struct

    from postgis_gtfs_importer_spark.operators.multimodal import (
        decode_audio_header,
    )

    fmt = struct.pack("<HHIIHH", 17, 1, 8000, 4000, 1, 4)
    data = b"\x00" * 64
    buf = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    ch, sr, bits, dur, fmt_name = decode_audio_header(buf)
    assert (ch, sr, bits) == (1, 8000, 4)
    assert dur is None


def test_mvhd_v1_truncated_box_no_crash():
    """A version-1 mvhd with only 28 body bytes must yield NULL duration
    (neither struct.error nor a v0-layout misparse)."""
    import struct

    from postgis_gtfs_importer_spark.operators.multimodal import (
        decode_video_header,
    )

    mvhd_body = bytes([1, 0, 0, 0]) + b"\x00" * 24  # version 1, 28 bytes
    mvhd = struct.pack(">I", 8 + len(mvhd_body)) + b"mvhd" + mvhd_body
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    ftyp = struct.pack(">I", 16) + b"ftypisom\x00\x00\x00\x00"
    w, h, dur, fmt_name = decode_video_header(ftyp + moov)
    assert dur is None and fmt_name == "mp4"


def test_radius_pairs_antimeridian(spark):
    """In-radius pairs straddling lon ±180 must be found (the 3x3 probe
    now wraps the longitude cell ring)."""
    from postgis_gtfs_importer_spark.operators.spatial import radius_pairs

    pts = spark.createDataFrame(
        [("E", -17.7, 179.9995), ("W", -17.7, -179.9995), ("F", -17.7, 178.0)],
        "stop_id string, lat double, lon double",
    )
    got = sorted(
        (r.id_a, r.id_b)
        for r in radius_pairs(pts, radius_m=500, cell_deg=1.0).collect()
    )
    assert got == [("E", "W")]


def test_corpus_fluency_gate_passes_short_docs(spark):
    """Docs too short to score (no bigram) pass the fluency gate instead
    of being silently dropped regardless of threshold."""
    from postgis_gtfs_importer_spark.plans.corpus import (
        CorpusConfig,
        curate_corpus,
    )

    docs = spark.createDataFrame(
        [
            (1, "ok", "en", "s0"),
            (2, "the quick brown fox jumps over the lazy dog and then "
                "keeps going with plenty of normal words in a sentence",
             "en", "s0"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    cfg = CorpusConfig(min_quality_e6=0, min_fluency_e6=0)
    res = curate_corpus(docs, cfg=cfg)
    ids = {r.doc_id for r in res.curated.select("doc_id").collect()}
    assert 1 in ids, "short doc dropped by fluency gate it cannot fail"


def test_funnel_oracle_sql_escapes_quotes():
    from postgis_gtfs_importer_spark.operators.funnels import funnel_oracle_sql

    sql = funnel_oracle_sql(["click", "o'clock"], window_sec=60)
    assert "o''clock" in sql and "'o'clock'" not in sql


def test_quantile_normalize_unstratified_no_single_task_window(spark):
    """stratum_col=None routes through the distributed global_rank —
    assert no no-partition window remains AND values match the
    stratified definition run with a constant stratum."""
    from postgis_gtfs_importer_spark.operators.scoring import quantile_normalize

    df = spark.createDataFrame(
        [(i, float((i * 37) % 11)) for i in range(200)], "id long, s double"
    )
    out = quantile_normalize(df, "s")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # rank windows in the plan must all carry partition keys
    import re

    assert not re.search(
        r"Window \[.*rank.*windowspecdefinition\(cast", plan
    ) or "_pid" in plan
    want = {
        (r.id, r.pr_e6)
        for r in quantile_normalize(
            df.withColumn("c", F.lit(1)), "s", stratum_col="c"
        ).drop("c").collect()
    }
    got = {(r.id, r.pr_e6) for r in out.collect()}
    assert got == want
