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
