"""Multimodal binary-column plumbing: metadata without decode, the
Arrow-batched stub decode, and frame sampling shapes."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
    multimodal as M,
)


@pytest.fixture(scope="module")
def payloads(spark):
    rows = [(1, b"x" * 100), (2, b"y" * 1500), (3, b"")]
    return spark.createDataFrame(rows, "doc_id int, payload binary")


def test_attach_binary_meta_no_decode(payloads):
    got = {r.doc_id: r for r in M.attach_binary_meta(payloads).collect()}
    assert got[1].n_bytes == 100 and got[3].n_bytes == 0
    assert got[2].content_id == hashlib.sha256(b"y" * 1500).hexdigest()


def test_decode_image_features_shape_and_determinism(payloads):
    a = {r.doc_id: r for r in M.decode_image_features(payloads, dim=8).collect()}
    b = {r.doc_id: r for r in M.decode_image_features(payloads, dim=8).collect()}
    for i in (1, 2, 3):
        assert len(a[i].feature) == 8
        assert a[i].feature == b[i].feature  # stub is deterministic
    assert a[1].n_bytes == 100


def test_sample_video_frames_stride(payloads):
    rows = M.sample_video_frames(payloads, every_n=10, frame_bytes=64).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # 1500 bytes / stride 640 → 3 frames; 100 bytes → 1; empty → 1 empty frame
    assert len(by_doc[2]) == 3 and len(by_doc[1]) == 1 and len(by_doc[3]) == 1
    f2 = sorted(by_doc[2], key=lambda r: r.frame_idx)
    assert bytes(f2[0].frame_payload) == b"y" * 64
    assert bytes(f2[2].frame_payload) == b"y" * 64  # 220 bytes remain at offset 1280


def test_decode_ppm_parses_real_binary():
    """Genuine P6 parsing: header with comment, raw RGB raster, correct
    (h, w, 3) layout and channel order."""
    import numpy as np

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.multimodal import (
        decode_ppm,
        ppm_features,
    )

    raster = bytes(range(2 * 2 * 3))  # pixels 0..11
    payload = b"P6\n# a comment\n2 2\n255\n" + raster
    w, h, px = decode_ppm(payload)
    assert (w, h) == (2, 2) and px.shape == (2, 2, 3)
    assert px[0, 0].tolist() == [0, 1, 2]  # RGB of the first pixel
    assert px[1, 1].tolist() == [9, 10, 11]

    f = ppm_features(payload, 16)
    assert f[0] == 2.0 and f[1] == 2.0 and f[2] == 1.0
    assert abs(f[3] - np.mean([0, 3, 6, 9]) / 255.0) < 1e-12  # red mean

    # malformed payloads refuse instead of mis-parsing
    assert decode_ppm(b"P5\n2 2\n255\n" + raster) is None      # wrong magic
    assert decode_ppm(payload[:-1]) is None                     # truncated raster
    assert decode_ppm(b"P6\n2 2\n127\n" + raster) is None       # unsupported maxval
    assert decode_ppm(b"") is None and decode_ppm(None) is None


def _make_wav(frames: int, rate: int, ch: int, samples: bytes, extra_chunk: bytes = b"") -> bytes:
    import struct

    data_len = len(samples)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(extra_chunk) + data_len)
        + b"WAVE"
        + struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, ch, rate, rate * ch * 2, ch * 2, 16)
        + extra_chunk
        + b"data"
        + struct.pack("<I", data_len)
        + samples
    )


def test_decode_wav_parses_real_binary():
    """Genuine RIFF/PCM parsing: chunk walk (including a foreign LIST
    chunk), little-endian int16 reinterpretation, channel de-interleave."""
    import numpy as np
    import struct

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.multimodal import (
        decode_wav,
        wav_features,
    )

    vals = [100, -200, 300, -400, 500, -600]  # 3 frames × 2 channels
    samples = struct.pack("<6h", *vals)
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    payload = _make_wav(3, 8000, 2, samples, extra_chunk=extra)
    rate, ch, s = decode_wav(payload)
    assert (rate, ch) == (8000, 2) and s.shape == (3, 2)
    assert s[0].tolist() == [100, -200] and s[2].tolist() == [500, -600]

    f = wav_features(payload, 16)
    assert f[0] == 3.0 and f[1] == 8000.0 and f[2] == 2.0
    assert abs(f[3] - 3 / 8000) < 1e-15
    ch0 = np.array([100.0, 300.0, 500.0])
    assert abs(f[8] - np.sqrt(np.mean(ch0 * ch0)) / 32768.0) < 1e-12
    assert f[7] == 0.0  # channel 0 never changes sign
    assert f[14] == -600.0 / 32768.0 and f[15] == 500.0 / 32768.0

    # malformed payloads refuse instead of mis-parsing
    assert decode_wav(b"RIFX" + payload[4:]) is None            # wrong magic
    assert decode_wav(payload[:-1]) is None                     # truncated raster
    bad_fmt = payload.replace(struct.pack("<HH", 1, 2), struct.pack("<HH", 3, 2), 1)
    assert decode_wav(bad_fmt) is None                          # non-PCM format
    assert decode_wav(b"") is None and decode_wav(None) is None


def test_decode_audio_features_real_path_vs_fallback(spark):
    """WAV payloads take the real signal-statistics path; non-WAV bytes
    fall back to the digest stub — distinguishable because the real
    path's slot 1 is the sample rate while the stub is in [-1, 1]."""
    import struct

    wav = _make_wav(4, 16000, 1, struct.pack("<4h", 1000, -1000, 1000, -1000))
    df = spark.createDataFrame(
        [(1, wav), (2, b"not audio at all")], "doc_id int, payload binary"
    )
    rows = {r.doc_id: r for r in M.decode_audio_features(df, dim=16).collect()}
    assert rows[1].feature[1] == 16000.0 and rows[1].feature[2] == 1.0
    assert rows[1].feature[7] == 1.0  # alternating signs: every pair crosses
    assert rows[1].feature[9] == 0.0  # mono → channel-1 slot zeroed
    assert all(-1.0 <= v <= 1.0 for v in rows[2].feature)  # digest stub
    assert rows[1].n_bytes == len(wav)


def test_decode_image_features_real_path_vs_fallback(spark):
    """PPM payloads take the real pixel-statistics path; non-PPM bytes
    fall back to the digest stub — distinguishable because the real
    path's slot 0 is the width while the stub is bounded in [-1, 1]."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        multimodal as M,
    )

    raster = bytes((i * 7) % 256 for i in range(4 * 2 * 3))
    ppm = b"P6\n4 2\n255\n" + raster
    df = spark.createDataFrame(
        [(1, ppm), (2, b"not an image at all")], "doc_id int, payload binary"
    )
    rows = {r.doc_id: r for r in M.decode_image_features(df, dim=16).collect()}
    assert rows[1].feature[0] == 4.0 and rows[1].feature[1] == 2.0  # real w, h
    assert all(-1.0 <= v <= 1.0 for v in rows[2].feature)           # digest stub
    assert rows[1].n_bytes == len(ppm)
