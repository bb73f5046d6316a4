"""Stratified sampling determinism/rates and sequence-packing invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import sampling


def test_stratified_sample_deterministic_and_rate(tables):
    rates = {"en": 0.5, "de": 1.0}
    a = {r.doc_id for r in sampling.stratified_sample(tables["documents"], rates).collect()}
    b = {r.doc_id for r in sampling.stratified_sample(tables["documents"], rates).collect()}
    assert a == b  # hash-based: identical across runs
    by_lang = (
        sampling.stratified_sample(tables["documents"], rates)
        .groupBy("lang").count().collect()
    )
    counts = {r.lang: r["count"] for r in by_lang}
    totals = {r.lang: r["count"] for r in tables["documents"].groupBy("lang").count().collect()}
    assert counts["de"] == totals["de"]          # rate 1.0 keeps everything
    assert set(counts) == {"en", "de"}           # default rate 0 drops other strata
    assert 0.3 < counts["en"] / totals["en"] < 0.7  # ~half of en


def test_stratified_sample_subset_semantics(tables):
    """A lower rate keeps a SUBSET of a higher rate's rows (nested
    samples — the property that makes mixture re-weighting cheap)."""
    lo = {r.doc_id for r in sampling.stratified_sample(tables["documents"], {"en": 0.2}).collect()}
    hi = {r.doc_id for r in sampling.stratified_sample(tables["documents"], {"en": 0.6}).collect()}
    assert lo <= hi


def test_pack_sequences_invariants(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e"), (3, "f g h i"), (4, " ".join(["x"] * 20)), (5, "z")],
        "doc_id int, text string",
    )
    rows = sorted(
        sampling.pack_sequences(docs, seq_len=8).collect(), key=lambda r: r.doc_id
    )
    # greedy in id order: docs 1(3)+2(2) fill bin 0 to offset 5; doc 3(4)
    # starts at cum 5 → bin 0 offset 5; doc 4(20) starts at cum 9 → bin 1;
    # doc 5 starts at cum 29 → bin 3
    got = [(r.doc_id, r.bin_id, r.bin_offset) for r in rows]
    assert got == [(1, 0, 0), (2, 0, 3), (3, 0, 5), (4, 1, 1), (5, 3, 5)]
    # every doc's start offset is inside the budget
    assert all(0 <= r.bin_offset < 8 for r in rows)
