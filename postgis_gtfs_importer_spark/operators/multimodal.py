"""Multimodal columns — image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media as ``binary`` columns with a
metadata struct, processed by Arrow-batched ``mapInPandas`` stages: the
executor-side batch shape (pandas DataFrames of a few thousand rows, bytes
in object arrays) is what real decoders (PIL/ffmpeg/torchaudio) consume.

Two decode kernels ship behind the SAME mapInPandas contract:

  * ``decoder="header"`` (default for real media) — a REAL, dependency-
    free container-header parser: PNG IHDR, JPEG SOFn segment walk, GIF
    logical-screen descriptor (``decode_image_header`` below). It reads
    actual dimensions from actual bytes; full-pixel decoding (PIL/ffmpeg,
    absent in this container) would slot into the same kernel signature.
  * ``decoder="fake"`` — the DETERMINISTIC FAKE used by the DuckDB-oracle
    registry twin (the testdata payloads are UTF-8 text, not media, and
    the oracle must replay the kernel arithmetic relationally).

The frame-sampling and resize kernels remain deterministic fakes (real
ones need ffmpeg/PIL); their Spark-side plumbing — schema, partitioning,
UDF signatures, batch iteration — is real and tested.

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
    """DETERMINISTIC FAKE decoder — the DuckDB-oracle-replayable twin.

    Derives (width, height, format) purely from the byte length so the
    registry query's oracle can replay it relationally over text
    payloads. Real media goes through ``decode_image_header``.
    """
    n = len(buf)
    return (n % 640 + 1, (n * 7) % 480 + 1, "png" if n % 2 == 0 else "jpeg")


#: JPEG start-of-frame markers that carry dimensions (C0-CF minus the
#: huffman/arithmetic/restart bookkeeping markers C4/C8/CC).
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def decode_image_header(buf: bytes) -> tuple[int | None, int | None, str | None]:
    """REAL image-header decoder — no dependencies, pure struct parsing.

    Recognizes:
      * PNG  — 8-byte signature, IHDR chunk: width/height big-endian u32
        at offsets 16/20 (PNG spec, W3C).
      * JPEG — SOI then segment walk to the first SOFn marker; height/
        width are big-endian u16 at segment offset +5/+7 (ITU T.81).
        Standalone markers (RSTn/SOI/EOI/TEM) have no length field.
      * GIF  — GIF87a/GIF89a signature; logical-screen width/height are
        little-endian u16 at offsets 6/8.

    Returns (width, height, format), or (None, None, None) when the
    bytes are not a recognized container — callers keep the row (the
    metadata columns are nullable) so undecodable media is visible, not
    silently dropped.
    """
    import struct

    if len(buf) >= 24 and buf[:8] == b"\x89PNG\r\n\x1a\n" and buf[12:16] == b"IHDR":
        w, h = struct.unpack(">II", buf[16:24])
        return (w, h, "png")
    if len(buf) >= 4 and buf[:2] == b"\xff\xd8":
        i = 2
        while i + 9 <= len(buf):
            if buf[i] != 0xFF:
                break
            marker = buf[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in _JPEG_SOF:
                h, w = struct.unpack(">HH", buf[i + 5 : i + 9])
                return (w, h, "jpeg")
            if 0xD0 <= marker <= 0xD9 or marker == 0x01:  # standalone
                i += 2
                continue
            (seg_len,) = struct.unpack(">H", buf[i + 2 : i + 4])
            i += 2 + seg_len
        return (None, None, "jpeg")  # JPEG container, no SOF found
    if len(buf) >= 10 and buf[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", buf[6:10])
        return (w, h, "gif")
    return (None, None, None)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary column (stand-in for image bytes).

    In production this column arrives from the source (parquet/webdataset);
    here it is derived so the testdata documents table can exercise the
    pipeline. JVM-side ``encode`` — no Python.
    """
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def image_features(df: DataFrame, id_col: str = "doc_id",
                   payload_col: str = "payload",
                   decoder: str = "header") -> DataFrame:
    """Decode/feature-extract stage: binary -> typed metadata (mapInPandas).

    One Arrow batch in, one out; bytes stay partition-local (no shuffle in
    the plan — check with .explain: a single MapInPandas over the scan).

    ``decoder="header"`` parses real PNG/JPEG/GIF headers
    (decode_image_header — unrecognized bytes yield NULL width/height);
    ``decoder="fake"`` is the byte-length-derived deterministic kernel the
    DuckDB-oracle registry twin replays.
    """
    kernels = {"header": decode_image_header, "fake": _fake_decode_image}
    kernel = kernels[decoder]
    id_c, pay = id_col, payload_col

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payload rows (e.g. NULL source text) must yield NULL
            # features, not a TypeError from bytes(None) that kills the
            # whole job
            feats = [
                kernel(bytes(b)) if b is not None else (None, None, None)
                for b in pdf[pay]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_c].astype("int64"),
                    "byte_len": pd.Series(
                        [len(b) if b is not None else None for b in pdf[pay]],
                        dtype="object",
                    ),
                    # object dtype: Arrow maps None -> NULL int32/str
                    "width": pd.Series([f[0] for f in feats], dtype="object"),
                    "height": pd.Series([f[1] for f in feats], dtype="object"),
                    "format": pd.Series([f[2] for f in feats], dtype="object"),
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
                b[: max(1, min(len(b), max_side))] if b is not None else None
                for b in pdf[pay]
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
                if buf is None:
                    continue  # no payload -> no frames (not a crash)
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


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("bits_per_sample", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("format", StringType()),
    ]
)


def decode_audio_header(
    buf: bytes,
) -> tuple[int | None, int | None, int | None, int | None, str | None]:
    """REAL audio-header decoder — no dependencies, pure struct parsing.

    Recognizes:
      * WAV  — RIFF/WAVE chunk walk to ``fmt `` (channels u16, sample
        rate u32, bits-per-sample u16, all little-endian) and ``data``
        (payload byte count); duration derives from data size / byte
        rate (RIFF spec / MSDN WAVEFORMAT).
      * FLAC — ``fLaC`` signature, STREAMINFO metadata block: sample
        rate (20 bits), channels-1 (3 bits), bits-1 (5 bits), total
        samples (36 bits) packed big-endian at byte 18 (xiph.org spec).

    Returns (channels, sample_rate, bits_per_sample, duration_ms,
    format); unrecognized bytes yield all-NULL so undecodable media
    stays visible, never silently dropped.
    """
    import struct

    if len(buf) >= 12 and buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        i = 12
        ch = sr = bits = None
        data_bytes = None
        while i + 8 <= len(buf):
            cid = buf[i : i + 4]
            (clen,) = struct.unpack("<I", buf[i + 4 : i + 8])
            if cid == b"fmt " and i + 24 <= len(buf):
                ch, sr = struct.unpack("<HI", buf[i + 10 : i + 16])
                (bits,) = struct.unpack("<H", buf[i + 22 : i + 24])
            elif cid == b"data":
                data_bytes = clen
            # chunks are word-aligned: odd sizes carry a pad byte
            i += 8 + clen + (clen & 1)
        # sub-byte sample formats (e.g. 4-bit IMA-ADPCM) make
        # bits // 8 == 0: duration is undefined under this PCM-style
        # frame math, NOT a ZeroDivisionError (the all-NULL contract)
        if ch and sr and bits and bits >= 8 and data_bytes is not None:
            n_samples = data_bytes // (ch * (bits // 8))
            return (ch, sr, bits, n_samples * 1000 // sr, "wav")
        return (ch, sr, bits, None, "wav")
    if len(buf) >= 34 and buf[:4] == b"fLaC":
        # STREAMINFO is the mandatory first block; its body starts at 8.
        # Bytes 18..25 of the file: sr(20) ch-1(3) bits-1(5) total(36).
        packed = int.from_bytes(buf[18:26], "big")
        sr = packed >> 44
        ch = ((packed >> 41) & 0x7) + 1
        bits = ((packed >> 36) & 0x1F) + 1
        total = packed & ((1 << 36) - 1)
        if sr:
            return (ch, sr, bits, total * 1000 // sr, "flac")
        return (ch, None, bits, None, "flac")
    return (None, None, None, None, None)


def synth_wav(doc_id: int, n_chars: int) -> bytes:
    """Spec-valid PCM WAV bytes with header fields derived from row
    attributes — the deterministic payload generator for driving the
    REAL decoder at scale. Independent codepath from the parser (struct
    *pack* against spec offsets vs the parser's chunk *walk*), so
    builder/parser agreement — and the DuckDB oracle's arithmetic
    re-derivation — is a genuine cross-check, not a tautology."""
    import struct

    ch = 1 + (doc_id % 2)
    sr = 8000 * (1 + (doc_id % 3))
    bits = 8 * (1 + (doc_id % 2))
    n_samples = 100 + (n_chars % 900)
    data = bytes(n_samples * ch * (bits // 8))
    fmt = struct.pack("<HHIIHH", 1, ch, sr, sr * ch * bits // 8,
                      ch * bits // 8, bits)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def audio_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str | None = None,
    chars_col: str = "n_chars",
) -> DataFrame:
    """Audio decode stage: binary -> typed metadata via mapInPandas —
    the torchaudio-shaped batch contract with a real header parser.

    With ``payload_col`` the column's bytes are decoded as-is. Without
    it (the registry/driver path, where testdata has no media), each
    row SYNTHESIZES a spec-valid WAV from (doc_id, n_chars) and decodes
    it with the same parser — real bytes through the real kernel, and
    the oracle re-derives the expected metadata arithmetically.
    Bytes never shuffle: one MapInPandas over the scan.
    """
    id_c = id_col

    if payload_col is None:
        cols = [id_c, chars_col]

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                bufs = [
                    synth_wav(int(i), int(n)) if n is not None else None
                    for i, n in zip(pdf[id_c], pdf[chars_col])
                ]
                yield _audio_frame(pdf[id_c], bufs)

    else:
        cols = [id_c, payload_col]

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                bufs = [
                    bytes(b) if b is not None else None
                    for b in pdf[payload_col]
                ]
                yield _audio_frame(pdf[id_c], bufs)

    return df.select(*cols).mapInPandas(run, AUDIO_FEATURE_SCHEMA)


def _audio_frame(ids, bufs: list[bytes]) -> pd.DataFrame:
    # None payloads yield all-NULL features (never a bytes(None) crash)
    feats = [
        decode_audio_header(b) if b is not None else (None,) * 5
        for b in bufs
    ]
    return pd.DataFrame(
        {
            "doc_id": ids.astype("int64"),
            "byte_len": pd.Series(
                [len(b) if b is not None else None for b in bufs],
                dtype="object",
            ),
            "channels": pd.Series([f[0] for f in feats], dtype="object"),
            "sample_rate": pd.Series([f[1] for f in feats], dtype="object"),
            "bits_per_sample": pd.Series(
                [f[2] for f in feats], dtype="object"
            ),
            "duration_ms": pd.Series([f[3] for f in feats], dtype="object"),
            "format": pd.Series([f[4] for f in feats], dtype="object"),
        }
    )


VIDEO_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("format", StringType()),
    ]
)


def decode_video_header(
    buf: bytes,
) -> tuple[int | None, int | None, int | None, str | None]:
    """REAL video-container header decoder — MP4/ISO BMFF box walk, no
    dependencies (ISO/IEC 14496-12).

    Walks top-level boxes to ``moov``, then inside it reads ``mvhd``
    (movie timescale u32 + duration u32/u64, version-dependent offsets)
    and the first ``trak``'s ``tkhd`` (track width/height as 16.16
    fixed-point u32 at the end of the box). Box sizes are big-endian
    u32 with the size-1 (largesize u64) and size-0 (to-end-of-file)
    escapes handled. Returns (width, height, duration_ms, format);
    unrecognized bytes yield all-NULL, never an exception.
    """
    import struct

    def boxes(data: bytes, start: int, end: int):
        i = start
        while i + 8 <= end:
            (size,) = struct.unpack(">I", data[i : i + 4])
            btype = data[i + 4 : i + 8]
            hdr = 8
            if size == 1:
                if i + 16 > end:
                    return
                (size,) = struct.unpack(">Q", data[i + 8 : i + 16])
                hdr = 16
            elif size == 0:
                size = end - i
            if size < hdr or i + size > end:
                return
            yield btype, i + hdr, i + size
            i += size

    if len(buf) < 12:
        return (None, None, None, None)
    top = list(boxes(buf, 0, len(buf)))
    if not top or top[0][0] != b"ftyp":
        return (None, None, None, None)
    width = height = None
    duration_ms = None
    for btype, s, e in top:
        if btype != b"moov":
            continue
        for ityp, is_, ie in boxes(buf, s, e):
            if ityp == b"mvhd" and ie - is_ >= 20:
                version = buf[is_]
                timescale = dur = None
                if version == 1:
                    # v1 reads through body offset 32 (64-bit duration);
                    # the earlier >= 28 guard let a truncated box raise
                    # struct.error past the all-NULL contract (or unpack
                    # the NEXT box's bytes as the duration) — and a
                    # truncated v1 must NOT fall through to the v0
                    # layout, whose offsets would mis-parse it silently
                    if ie - is_ >= 32:
                        (timescale,) = struct.unpack(
                            ">I", buf[is_ + 20 : is_ + 24]
                        )
                        (dur,) = struct.unpack(">Q", buf[is_ + 24 : is_ + 32])
                else:
                    (timescale,) = struct.unpack(">I", buf[is_ + 12 : is_ + 16])
                    (dur,) = struct.unpack(">I", buf[is_ + 16 : is_ + 20])
                if timescale:
                    duration_ms = dur * 1000 // timescale
            elif ityp == b"trak" and width is None:
                for ttyp, ts, te in boxes(buf, is_, ie):
                    if ttyp == b"tkhd" and te - ts >= 8:
                        w16, h16 = struct.unpack(">II", buf[te - 8 : te])
                        width, height = w16 >> 16, h16 >> 16
    return (width, height, duration_ms, "mp4")


def synth_mp4(doc_id: int, n_chars: int) -> bytes:
    """Minimal spec-valid MP4 (ftyp + moov[mvhd + trak[tkhd]]) with
    metadata derived from row attributes — same independent
    builder-vs-parser design as synth_wav."""
    import struct

    w = 320 + (doc_id % 8) * 160
    h = 240 + (doc_id % 6) * 120
    timescale = 600
    dur_units = 600 + (n_chars % 1200) * 10

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mvhd = box(
        b"mvhd",
        struct.pack(">BBBB", 0, 0, 0, 0)  # version 0 + flags
        + struct.pack(">II", 0, 0)        # creation, modification
        + struct.pack(">II", timescale, dur_units)
        + bytes(80),                      # rate..next_track_id
    )
    tkhd = box(
        b"tkhd",
        struct.pack(">BBBB", 0, 0, 0, 7)
        + struct.pack(">IIII", 0, 0, 1, 0)   # times, track id, reserved
        + struct.pack(">I", dur_units)
        + bytes(52)                          # reserved/layer/matrix
        + struct.pack(">II", w << 16, h << 16),
    )
    moov = box(b"moov", mvhd + box(b"trak", tkhd))
    return ftyp + moov


def video_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str | None = None,
    chars_col: str = "n_chars",
) -> DataFrame:
    """Video decode stage: binary -> typed metadata via mapInPandas,
    completing the media trio (image/audio/video) behind real
    dependency-free header parsers. Same synth-or-passthrough contract
    as audio_features; bytes never shuffle."""
    id_c = id_col

    if payload_col is None:
        cols = [id_c, chars_col]

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                bufs = [
                    synth_mp4(int(i), int(n)) if n is not None else None
                    for i, n in zip(pdf[id_c], pdf[chars_col])
                ]
                yield _video_frame(pdf[id_c], bufs)

    else:
        cols = [id_c, payload_col]

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                bufs = [
                    bytes(b) if b is not None else None
                    for b in pdf[payload_col]
                ]
                yield _video_frame(pdf[id_c], bufs)

    return df.select(*cols).mapInPandas(run, VIDEO_FEATURE_SCHEMA)


def _video_frame(ids, bufs: list[bytes]) -> pd.DataFrame:
    feats = [
        decode_video_header(b) if b is not None else (None,) * 4
        for b in bufs
    ]
    return pd.DataFrame(
        {
            "doc_id": ids.astype("int64"),
            "byte_len": pd.Series(
                [len(b) if b is not None else None for b in bufs],
                dtype="object",
            ),
            "width": pd.Series([f[0] for f in feats], dtype="object"),
            "height": pd.Series([f[1] for f in feats], dtype="object"),
            "duration_ms": pd.Series([f[2] for f in feats], dtype="object"),
            "format": pd.Series([f[3] for f in feats], dtype="object"),
        }
    )
