"""Multimodal tests: the REAL header-decode kernel (PNG/JPEG/GIF struct
parsing over genuine bytes) plus batch shapes, schemas, and cardinality
behavior of the mapInPandas stages (resize/frame kernels remain
deterministic fakes — see operators.multimodal docstring)."""

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
    feats = {
        r.doc_id: r
        for r in MM.image_features(docs, decoder="fake").collect()
    }
    assert len(feats) == 20
    r = feats[3]  # len = 10 + 111 = 121
    assert r.byte_len == 121
    assert r.width == 121 % 640 + 1 and r.height == (121 * 7) % 480 + 1
    assert r.format == "jpeg"  # odd length


def test_image_features_no_shuffle(docs):
    plan = MM.image_features(docs)._sc._jvm and MM.image_features(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # bytes never shuffle


def _png_bytes(width: int, height: int) -> bytes:
    """A complete, spec-valid 8-bit grayscale PNG built with stdlib only."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x7f" * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _jpeg_bytes(width: int, height: int) -> bytes:
    """A JPEG prefix: SOI + APP0(JFIF) + DQT + SOF0 carrying the dims."""
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00\x01\x00\x01\x00\x00"
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(64)
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", height, width)
        + b"\x01\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + dqt + sof0


def _gif_bytes(width: int, height: int) -> bytes:
    import struct

    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00"


def test_image_features_decodes_real_headers(spark):
    """The REAL kernel (default): actual dimensions from actual bytes —
    a spec-valid PNG, a JPEG SOF0 stream, a GIF89a descriptor, and one
    undecodable blob (NULL metadata, row kept) — through the same
    mapInPandas contract as the oracle-checked fake."""
    rows = [
        (0, _png_bytes(320, 200)),
        (1, _jpeg_bytes(1024, 768)),
        (2, _gif_bytes(13, 7)),
        (3, b"not an image at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in MM.image_features(df).collect()}
    assert (out[0].width, out[0].height, out[0].format) == (320, 200, "png")
    assert (out[1].width, out[1].height, out[1].format) == (1024, 768, "jpeg")
    assert (out[2].width, out[2].height, out[2].format) == (13, 7, "gif")
    assert (out[3].width, out[3].height, out[3].format) == (None, None, None)
    assert out[3].byte_len == len(b"not an image at all")  # kept, not dropped


def test_decode_image_header_pure():
    """Kernel-level checks incl. JPEG segment-walk past variable-length
    segments and progressive SOF2, plus truncation safety."""
    import struct

    assert MM.decode_image_header(_png_bytes(1, 1)) == (1, 1, "png")
    # progressive JPEG: SOF2 marker instead of SOF0
    prog = _jpeg_bytes(640, 480).replace(b"\xff\xc0", b"\xff\xc2")
    assert MM.decode_image_header(prog) == (640, 480, "jpeg")
    # dims land big-endian height-first — cross-check asymmetric sizes
    assert MM.decode_image_header(_jpeg_bytes(2, 9)) == (2, 9, "jpeg")
    assert MM.decode_image_header(b"\x89PNG\r\n\x1a\n" + b"\x00" * 4) == (
        None, None, None,
    )  # truncated PNG: too short for IHDR
    assert MM.decode_image_header(b"") == (None, None, None)
    # GIF87a variant
    g = b"GIF87a" + struct.pack("<HH", 99, 44) + b"\x00"
    assert MM.decode_image_header(g) == (99, 44, "gif")


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


def test_decode_audio_header_pure():
    import struct

    from postgis_gtfs_importer_spark.operators.multimodal import (
        decode_audio_header,
        synth_wav,
    )

    # hand-built WAV, chunk order data-before-fmt plus an odd-size LIST
    # chunk (word-aligned pad) — the walk must survive all of it
    fmt = struct.pack("<HHIIHH", 1, 2, 44100, 44100 * 2 * 2, 4, 16)
    data = bytes(44100 * 4)  # 1 second stereo 16-bit
    lst = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad
    chunks = (
        lst
        + b"data" + struct.pack("<I", len(data)) + data
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    )
    wav = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    assert decode_audio_header(wav) == (2, 44100, 16, 1000, "wav")

    # FLAC STREAMINFO: 44.1kHz stereo 16-bit, 88200 samples = 2000 ms
    packed = (44100 << 44) | ((2 - 1) << 41) | ((16 - 1) << 36) | 88200
    flac = b"fLaC" + b"\x00" + b"\x00\x00\x22" + bytes(10) + packed.to_bytes(8, "big") + bytes(16)
    assert decode_audio_header(flac) == (2, 44100, 16, 2000, "flac")

    # junk and truncation stay visible as NULLs, never raise
    assert decode_audio_header(b"not audio") == (None,) * 5
    assert decode_audio_header(wav[:16])[4] == "wav"  # container seen
    assert decode_audio_header(wav[:16])[0] is None

    # the synthesizer round-trips through the parser
    ch, sr, bits, dur, fmt_name = decode_audio_header(synth_wav(7, 350))
    assert (ch, sr, bits, fmt_name) == (2, 16000, 16, "wav")
    assert dur == (100 + 350 % 900) * 1000 // 16000


def test_audio_features_no_shuffle_and_real_payload(spark):
    from postgis_gtfs_importer_spark.operators.multimodal import (
        audio_features,
        synth_wav,
    )

    docs = spark.createDataFrame(
        [(i, 100 + i * 37) for i in range(20)], "doc_id long, n_chars long"
    )
    out = audio_features(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # bytes never shuffle
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[3].channels == 2 and rows[3].sample_rate == 8000
    # explicit payload path decodes caller bytes as-is
    payload = spark.createDataFrame(
        [(1, bytearray(synth_wav(1, 500)))],
        "doc_id long, payload binary",
    )
    r = audio_features(payload, payload_col="payload").collect()[0]
    assert (r.channels, r.sample_rate, r.format) == (2, 16000, "wav")


def test_decode_video_header_pure():
    import struct

    from postgis_gtfs_importer_spark.operators.multimodal import (
        decode_video_header,
        synth_mp4,
    )

    # builder round-trips through the independent parser
    buf = synth_mp4(3, 500)
    w, h, dur, fmt = decode_video_header(buf)
    assert (w, h, fmt) == (320 + 3 * 160, 240 + 3 * 120, "mp4")
    assert dur == (600 + 500 % 1200 * 10) * 1000 // 600

    # 64-bit largesize escape on the moov box must parse identically
    i = buf.index(b"moov") - 4
    (size,) = struct.unpack(">I", buf[i : i + 4])
    large = (
        buf[:i]
        + struct.pack(">I", 1)
        + b"moov"
        + struct.pack(">Q", size + 8)
        + buf[i + 8 :]
    )
    assert decode_video_header(large) == (w, h, dur, "mp4")

    # junk, truncation, missing ftyp -> all-NULL, never a raise
    assert decode_video_header(b"\x00" * 40) == (None,) * 4
    assert decode_video_header(buf[4:]) == (None,) * 4
    assert decode_video_header(buf[:10]) == (None,) * 4


def test_video_features_no_shuffle(spark):
    from postgis_gtfs_importer_spark.operators.multimodal import (
        video_features,
    )

    docs = spark.createDataFrame(
        [(i, 100 + i * 53) for i in range(16)], "doc_id long, n_chars long"
    )
    out = video_features(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[5].width == 320 + 5 * 160 and rows[5].format == "mp4"
    assert all(r.duration_ms > 0 for r in rows.values())
