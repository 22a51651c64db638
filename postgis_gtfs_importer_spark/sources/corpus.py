"""Corpus ingestion sources — the two formats LLM training data actually
arrives in beyond parquet:

  * JSONL (one document object per line, frequently with schema drift
    and corrupt lines) — ``read_jsonl_corpus``: schema-enforced
    PERMISSIVE read with EXPLICIT corrupt-record accounting, because a
    silent drop of 3% of a crawl is a quality incident, not a default.
  * WebDataset-style tar shards (media + metadata members grouped by
    key inside .tar files) — ``read_tar_shards``: Spark's binaryFile
    source enumerates/distributes the shards, a mapInPandas kernel
    explodes each shard into (shard, key, member, payload) rows using
    the stdlib tarfile on an in-memory buffer.

Scale design: both sources preserve Spark's input-split parallelism —
one task per shard/file group, no driver-side listing beyond what the
file index already does, bytes stay partition-local until the caller
explicitly shuffles. Tar shards are the unit of parallelism BY DESIGN
(that is the whole WebDataset contract: a shard is a sequential-read
unit sized for one worker), so a 100 TB corpus is just more shards, and
the reader's only per-task state is one shard's decompressed members.
"""

from __future__ import annotations

import io
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Expected document shape for JSONL corpora (superset tolerated,
#: missing fields null — PERMISSIVE semantics).
JSONL_DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("_corrupt_record", StringType()),
    ]
)

TAR_MEMBER_SCHEMA = StructType(
    [
        StructField("shard", StringType()),
        StructField("key", StringType()),
        StructField("member", StringType()),
        StructField("ext", StringType()),
        StructField("n_bytes", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def read_jsonl_corpus(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Schema-enforced JSONL read with corrupt-record accounting.

    Returns ``(docs, corrupt)``: clean documents (corrupt column
    dropped) and the quarantined raw lines. The split is one predicate
    on the PERMISSIVE reader's _corrupt_record column — no second scan
    of the source (both frames prune from the same cached read; callers
    at production scale write ``corrupt`` to a quarantine sink and
    alert on its count, reference: every serious crawl pipeline).

    Cache lifecycle: the shared read is ``.cache()``d (required —
    SPARK-21610), and its blocks live until BOTH returned frames are
    garbage-collected (the ContextCleaner then reclaims them) — there
    is no explicit handle. A loop reading MANY corpora should drop its
    references between iterations (or call
    ``spark.catalog.clearCache()``) rather than accumulate all of them
    live; each cached corpus holds its full parsed size in
    MEMORY_AND_DISK until released.
    """
    raw = (
        spark.read.schema(JSONL_DOC_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    # Spark requires caching/materializing the raw frame before
    # filtering on the corrupt column (SPARK-21610: the pruned plan
    # would otherwise re-parse and never see corrupt rows).
    raw = raw.cache()
    docs = raw.filter(F.col("_corrupt_record").isNull()).drop(
        "_corrupt_record"
    )
    corrupt = raw.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return docs, corrupt


def _split_key_ext(name: str) -> tuple[str, str]:
    """WebDataset convention: 'dir/abc123.cls.jpg' -> key 'dir/abc123',
    ext 'cls.jpg' (first dot after the basename starts the extension)."""
    slash = name.rfind("/")
    dot = name.find(".", slash + 1)
    if dot == -1:
        return name, ""
    return name[:dot], name[dot + 1 :]


def read_tar_shards(spark: SparkSession, path: str) -> DataFrame:
    """Explode WebDataset-style tar shards into one row per member.

    ``binaryFile`` distributes whole shards to tasks (a shard is the
    sequential-read unit — the WebDataset contract), then a mapInPandas
    kernel walks each tar in memory via the stdlib tarfile. Output rows
    carry (shard, key, member, ext, n_bytes, payload); grouping by
    ``key`` reassembles a sample's members (image + caption + meta)
    WITHOUT any shuffle when the consumer keeps the shard partitioning.
    Non-tar files yield zero rows rather than failing the scan (the
    shard directory may carry manifests/checksums).
    """
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .load(path)
        .select("path", "content")
    )

    def explode_tars(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "shard": [], "key": [], "member": [],
                "ext": [], "n_bytes": [], "payload": [],
            }
            for shard_path, content in zip(pdf["path"], pdf["content"]):
                shard = str(shard_path).rsplit("/", 1)[-1]
                try:
                    tf = tarfile.open(fileobj=io.BytesIO(bytes(content)))
                except tarfile.TarError:
                    continue
                with tf:
                    for m in tf.getmembers():
                        if not m.isfile():
                            continue
                        f = tf.extractfile(m)
                        payload = f.read() if f is not None else b""
                        key, ext = _split_key_ext(m.name)
                        out["shard"].append(shard)
                        out["key"].append(key)
                        out["member"].append(m.name)
                        out["ext"].append(ext)
                        out["n_bytes"].append(len(payload))
                        out["payload"].append(payload)
            yield pd.DataFrame(out)

    return raw.mapInPandas(explode_tars, TAR_MEMBER_SCHEMA)
