"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The container ships no image/audio codecs, so the *decode* step is a
clearly-marked stub (deterministic fake features keyed on the content
hash — the Spark-side plumbing, schema, batching and partitioning are
real and tested; swap ``_fake_decode`` for PIL/torchaudio on a real
cluster). Pattern per the north-star spec: binary payload stays opaque
to Catalyst; metadata columns (mime, width/height, duration) are real
columns so filters on them prune before any decode runs.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "attach_binary_meta",
    "decode_image_features",
    "sample_video_frames",
]

HAS_CODECS = False  # no PIL/libav in this container; stubs below are deterministic fakes


def attach_binary_meta(df: DataFrame, bin_col: str = "payload") -> DataFrame:
    """Typed metadata for an opaque binary column: byte length and
    sha256 content id — pure expressions, no decode. At scale these are
    written at ingest so dedup/filtering never touches the payload."""
    return df.withColumn("n_bytes", F.length(F.col(bin_col))).withColumn(
        "content_id", F.sha2(F.col(bin_col), 256)
    )


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """STUB decode: deterministic pseudo-features from the content hash
    — feature j is sha256 digest byte j scaled to [-1, 1].

    Raises nothing — a real deployment replaces this with
    `PIL.Image.open` / `torchaudio.load`; it is isolated so that swap
    touches one function. Marked fake so no one mistakes the features
    for real embeddings. Chosen over an RNG fake because any engine can
    reproduce it (the DuckDB oracle value-checks the whole decode
    pipeline); dim ≤ 32 (sha256 digest length).
    """
    if HAS_CODECS:  # pragma: no cover
        raise NotImplementedError("real codec path not available in this container")
    if dim > 32:
        raise ValueError("stub features support dim <= 32 (sha256 digest bytes)")
    digest = hashlib.sha256(payload or b"").digest()
    return np.array([(b / 255.0) * 2.0 - 1.0 for b in digest[:dim]], dtype=np.float64)


def decode_image_features(
    df: DataFrame, bin_col: str = "payload", id_col: str = "doc_id", dim: int = 16, batch_limit: int = 1024
) -> DataFrame:
    """Decode + featurize binary images via ``mapInPandas``.

    Real plumbing: Arrow batches in, one vectorized pass per batch,
    schema ``(id, feature: array<float>, n_bytes: int)``. The stub
    keeps it deterministic. ``spark.sql.execution.arrow.maxRecordsPerBatch``
    bounds batch memory when payloads are MBs each (set ``batch_limit``
    accordingly on a real cluster)."""
    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, feature array<double>, n_bytes int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = [_fake_decode(p, dim).tolist() for p in pdf[bin_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "feature": feats,
                    "n_bytes": [len(p or b"") for p in pdf[bin_col]],
                }
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema=schema)


def sample_video_frames(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    every_n: int = 10,
    frame_bytes: int = 64,
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emit one row per
    sampled "frame" (stub slices the byte stream at fixed strides — a
    real decoder emits actual frames at the same row shape
    ``(id, frame_idx, frame_payload)``)."""
    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, frame_idx int, frame_payload binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids, idxs, frames = [], [], []
            for rid, payload in zip(pdf[id_col], pdf[bin_col]):
                payload = payload or b""
                stride = frame_bytes * every_n
                for i, off in enumerate(range(0, max(len(payload), 1), max(stride, 1))):
                    ids.append(rid)
                    idxs.append(i)
                    frames.append(payload[off : off + frame_bytes])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame_payload": frames})

    return df.select(id_col, bin_col).mapInPandas(run, schema=schema)
