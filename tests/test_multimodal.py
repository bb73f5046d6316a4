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
