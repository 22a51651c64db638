"""Corpus ingestion sources: JSONL with corrupt-record accounting and
WebDataset-style tar shards exploded to member rows."""

from __future__ import annotations

import io
import json
import tarfile


def test_jsonl_corpus_accounts_for_corrupt_lines(spark, tmp_path):
    from postgis_gtfs_importer_spark.sources.corpus import read_jsonl_corpus

    p = tmp_path / "docs.jsonl"
    lines = [
        json.dumps({"doc_id": 1, "text": "hello world", "lang": "en",
                    "source": "a"}),
        json.dumps({"doc_id": 2, "text": "bonjour", "lang": "fr"}),  # drift ok
        '{"doc_id": 3, "text": "truncated...',                       # corrupt
        "not json at all",                                           # corrupt
        json.dumps({"doc_id": 4, "text": "", "lang": "en", "source": "b"}),
    ]
    p.write_text("\n".join(lines) + "\n")
    docs, corrupt = read_jsonl_corpus(spark, str(p))
    got = {r.doc_id: r for r in docs.collect()}
    assert set(got) == {1, 2, 4}
    assert got[2].source is None  # missing field -> null, not a drop
    bad = [r.raw_line for r in corrupt.collect()]
    assert len(bad) == 2 and "not json at all" in bad


def _make_shard(path, samples):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, payload in samples:
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
    path.write_bytes(buf.getvalue())


def test_tar_shards_explode_to_member_rows(spark, tmp_path):
    from postgis_gtfs_importer_spark.operators.multimodal import synth_wav
    from postgis_gtfs_importer_spark.sources.corpus import read_tar_shards

    _make_shard(
        tmp_path / "shard-000.tar",
        [
            ("sample0.json", b'{"caption": "a cat"}'),
            ("sample0.wav", synth_wav(0, 100)),
            ("sample1.json", b'{"caption": "a dog"}'),
            ("sample1.wav", synth_wav(1, 200)),
        ],
    )
    _make_shard(
        tmp_path / "shard-001.tar",
        [("sample2.meta.json", b"{}"), ("sample2.wav", synth_wav(2, 300))],
    )
    (tmp_path / "manifest.txt").write_text("2 shards\n")  # must be ignored
    (tmp_path / "broken.tar").write_bytes(b"definitely not a tar")

    df = read_tar_shards(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 6
    by_key = {}
    for r in rows:
        by_key.setdefault(r.key, set()).add(r.ext)
    assert by_key["sample0"] == {"json", "wav"}
    assert by_key["sample2"] == {"meta.json", "wav"}  # multi-dot ext
    # payloads survive byte-exact: decode one through the audio parser
    from postgis_gtfs_importer_spark.operators.multimodal import (
        decode_audio_header,
    )

    wav1 = next(r for r in rows if r.key == "sample1" and r.ext == "wav")
    assert decode_audio_header(bytes(wav1.payload))[1] == 16000  # doc 1 rate
    assert wav1.n_bytes == len(bytes(wav1.payload))
    # bytes never shuffle: single MapInPandas over the binaryFile scan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_tar_member_reassembly_groups_by_key(spark, tmp_path):
    from postgis_gtfs_importer_spark.sources.corpus import read_tar_shards

    _make_shard(
        tmp_path / "s.tar",
        [("k0.txt", b"t0"), ("k0.bin", b"\x01\x02"), ("k1.txt", b"t1")],
    )
    from pyspark.sql import functions as F

    df = read_tar_shards(spark, str(tmp_path))
    grouped = (
        df.groupBy("key")
        .agg(F.sort_array(F.collect_list("ext")).alias("exts"))
        .collect()
    )
    got = {r.key: r.exts for r in grouped}
    assert got == {"k0": ["bin", "txt"], "k1": ["txt"]}


# ---------------------------------------------------------------------------
# gtfszip Python Data Source (Spark 4 API)
# ---------------------------------------------------------------------------


def test_gtfszip_datasource_reads_members_distributed(spark, tmp_path):
    """The Spark-4 Python Data Source over a GTFS zip: every member's
    lines surface with (member, line_no, line), one input partition per
    member (member-granular parallelism, no extraction step), content
    byte-identical to direct zipfile reads."""
    import zipfile

    from .gtfs_fixtures import write_feed_zip

    from postgis_gtfs_importer_spark.sources.pyds import register_gtfszip

    zp = write_feed_zip(str(tmp_path / "feed.zip"))
    register_gtfszip(spark)
    df = spark.read.format("gtfszip").option("path", zp).load()

    got = {
        (r.member, r.line_no): r.line for r in df.collect()
    }
    with zipfile.ZipFile(zp) as z:
        members = [n for n in z.namelist() if n.endswith(".txt")]
        want = {}
        for m in members:
            with z.open(m) as f:
                for i, raw in enumerate(f):
                    want[(m, i)] = raw.decode("utf-8").rstrip("\r\n")
    assert got == want
    # one partition per member
    assert df.rdd.getNumPartitions() == len(members)
    # and the source composes with ordinary SQL: per-member line counts
    counts = {
        r.member: r.n
        for r in df.groupBy("member").count().withColumnRenamed("count", "n").collect()
    }
    import collections

    want_counts = collections.Counter(m for m, _ in want)
    assert counts == dict(want_counts)
