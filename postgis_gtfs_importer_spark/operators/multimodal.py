"""Multimodal columns — image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media as ``binary`` columns with a
metadata struct, processed by Arrow-batched ``mapInPandas`` stages: the
executor-side batch shape (pandas DataFrames of a few thousand rows, bytes
in object arrays) is what real decoders (PIL/ffmpeg/torchaudio) consume.
Those libraries are not in this container, so the DECODE KERNELS HERE ARE
DETERMINISTIC FAKES (clearly marked below); the Spark-side plumbing —
schema, partitioning, UDF signatures, batch iteration — is real and
tested. Swap ``_fake_decode_*`` for a real decoder and nothing else
changes.

Design notes for scale:
  * decode stages are ``mapInPandas`` (streaming batches, no shuffle): a
    partition of binaries is transformed in place wherever it already
    lives — media bytes never shuffle unless the user repartitions.
  * metadata-only operations (filter by width, group by codec) run on the
    typed metadata columns and never touch the bytes — keep metadata in
    separate columns, not inside the blob.
  * frame sampling emits multiple rows per video via an iterator of
    batches — output cardinality > input cardinality without collecting.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGE_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("format", StringType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", BinaryType()),
    ]
)


def _fake_decode_image(buf: bytes) -> tuple[int, int, str]:
    """DETERMINISTIC FAKE decoder (real one: PIL.Image.open).

    Derives (width, height, format) purely from the byte length so the
    DuckDB oracle can replay it. NotImplementedError-free by design — the
    plumbing is the thing under test.
    """
    n = len(buf)
    return (n % 640 + 1, (n * 7) % 480 + 1, "png" if n % 2 == 0 else "jpeg")


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary column (stand-in for image bytes).

    In production this column arrives from the source (parquet/webdataset);
    here it is derived so the testdata documents table can exercise the
    pipeline. JVM-side ``encode`` — no Python.
    """
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def image_features(df: DataFrame, id_col: str = "doc_id",
                   payload_col: str = "payload") -> DataFrame:
    """Decode/feature-extract stage: binary -> typed metadata (mapInPandas).

    One Arrow batch in, one out; bytes stay partition-local (no shuffle in
    the plan — check with .explain: a single MapInPandas over the scan).
    """
    id_c, pay = id_col, payload_col

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode_image(b) for b in pdf[pay]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_c].astype("int64"),
                    "byte_len": [len(b) for b in pdf[pay]],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "format": [f[2] for f in feats],
                }
            )

    return df.select(id_c, pay).mapInPandas(decode, IMAGE_FEATURE_SCHEMA)


def resize_images(df: DataFrame, max_side: int,
                  payload_col: str = "payload") -> DataFrame:
    """Resize stage: binary -> binary (mapInPandas, partition-local).

    DETERMINISTIC FAKE kernel (real one: PIL resize + re-encode): truncates
    the payload proportionally — preserves the batch-in/batch-out shape
    and the no-shuffle plan of a real resize.
    """
    pay = payload_col

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out[pay] = [
                b[: max(1, min(len(b), max_side))] for b in pdf[pay]
            ]
            yield out

    return df.mapInPandas(resize, df.schema)


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 64,
    max_frames: int = 8,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame-sampling stage: one video row -> up to max_frames frame rows.

    DETERMINISTIC FAKE kernel (real one: ffmpeg keyframe extraction):
    slices the payload every ``every_n_bytes``. Demonstrates the
    cardinality-raising mapInPandas pattern (iterator out > iterator in)
    that real frame extraction uses — output rows stream out batch by
    batch, never buffered per partition.
    """
    id_c, pay = id_col, payload_col

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, bufs = [], [], []
            # zip over columns, not iterrows (iterrows materializes a
            # Series per row — ~10× slower on wide batches)
            for doc, buf in zip(pdf[id_c].to_numpy(), pdf[pay]):
                n_frames = min(max_frames, max(1, len(buf) // every_n_bytes))
                ids.extend([doc] * n_frames)
                idxs.extend(range(n_frames))
                bufs.extend(
                    bytes(buf[i * every_n_bytes : (i + 1) * every_n_bytes])
                    for i in range(n_frames)
                )
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(idxs, dtype="int32"),
                 "frame_bytes": bufs}
            )

    return df.select(id_c, pay).mapInPandas(frames, FRAME_SCHEMA)
