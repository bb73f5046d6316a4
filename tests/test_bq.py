"""Binary quantization (operators/bq.py): packing vs numpy ground
truth, Hamming == sign-mismatch count, bit-63 signed packing, shortlist
determinism, and the no-shuffle scan plan."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import bq as BQ


def _emb(spark, mat):
    rows = [(i, [float(x) for x in row]) for i, row in enumerate(mat)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _np_bits(mat, thr):
    return (np.asarray(mat) > np.asarray(thr)).astype(np.uint64)


def test_pack_matches_numpy_64dim(spark):
    rng = np.random.default_rng(7)
    mat = rng.normal(size=(20, 64)).astype(np.float32)
    df = _emb(spark, mat)
    thr = BQ.train_bq_thresholds(df, dim=64)
    got = {r["vec_id"]: r["w0"] for r in BQ.bq_encode_bits(df, thr).collect()}
    bits = _np_bits(mat.astype(np.float64), thr)
    for i in range(20):
        word = 0
        for d in range(64):
            if bits[i, d]:
                word |= 1 << d
        # numpy unsigned word → signed long (two's complement)
        expect = word - (1 << 64) if word >= (1 << 63) else word
        assert got[i] == expect


def test_bit63_uses_signed_long(spark):
    # one row, only dim 63 above threshold → w0 == -2^63 exactly
    vec = [0.0] * 64
    vec[63] = 10.0
    df = _emb(spark, [vec, [1.0] * 63 + [0.0]])
    thr = [0.5] * 64
    w = {r["vec_id"]: r["w0"] for r in BQ.bq_encode_bits(df, thr).collect()}
    assert w[0] == -(1 << 63)


def test_hamming_equals_mismatch_count(spark):
    rng = np.random.default_rng(11)
    mat = rng.normal(size=(30, 64)).astype(np.float32)
    q = rng.normal(size=64).astype(np.float32)
    df = _emb(spark, mat)
    thr = BQ.train_bq_thresholds(df, dim=64)
    codes = BQ.bq_encode_bits(df, thr)
    qw = BQ.pack_query(q, thr)
    got = {
        r["vec_id"]: r["h"]
        for r in codes.select("vec_id", BQ.bq_hamming(["w0"], qw).alias("h")).collect()
    }
    b = _np_bits(mat.astype(np.float64), thr)
    qb = _np_bits(q.astype(np.float64)[None, :], thr)[0]
    for i in range(30):
        assert got[i] == int((b[i] != qb).sum())


def test_multiword_dim_96(spark):
    rng = np.random.default_rng(3)
    mat = rng.normal(size=(10, 96))
    df = _emb(spark, mat)
    thr = [0.0] * 96
    enc = BQ.bq_encode_bits(df, thr)
    assert set(enc.columns) == {"vec_id", "w0", "w1"}
    qw = BQ.pack_query(mat[0], thr)
    h = {
        r["vec_id"]: r["h"]
        for r in enc.select("vec_id", BQ.bq_hamming(["w0", "w1"], qw).alias("h")).collect()
    }
    assert h[0] == 0  # self-distance
    b = _np_bits(mat, thr)
    assert h[5] == int((b[5] != b[0]).sum())


def test_bq_topk_exact_rerank_and_recall(spark):
    rng = np.random.default_rng(5)
    mat = rng.normal(size=(200, 64)).astype(np.float32)
    q = mat[0]
    df = _emb(spark, mat)
    thr = BQ.train_bq_thresholds(df, dim=64)
    out = BQ.bq_topk(df, q, thr, k=5, shortlist=60).collect()
    assert len(out) == 5
    assert out[0]["vec_id"] == 0 and out[0]["hamming"] == 0  # self is nearest
    # scores are exact dots of the returned rows (descending)
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    for r in out:
        assert r["score"] == pytest.approx(
            float(np.dot(mat[r["vec_id"]].astype(np.float64), q.astype(np.float64))),
            rel=1e-9,
        )


def test_bq_scan_plan_no_shuffle(spark):
    rng = np.random.default_rng(1)
    df = _emb(spark, rng.normal(size=(50, 64)))
    thr = [0.0] * 64
    codes = BQ.bq_encode_bits(df, thr)
    qw = BQ.pack_query([0.1] * 64, thr)
    short = (
        codes.select("vec_id", BQ.bq_hamming(["w0"], qw).alias("hamming"))
        .orderBy(F.asc("hamming"), F.asc("vec_id"))
        .limit(50)
    )
    plan = short._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan  # pure scan + local top-k, no shuffle
    full = BQ.bq_topk(df, [0.1] * 64, thr, k=5, shortlist=20)
    fplan = full._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in fplan  # rerank joins a broadcast shortlist
    assert "BatchEvalPython" not in fplan and "ArrowEvalPython" not in fplan


def test_bq_index_roundtrip_matches_inline(spark, tmp_path):
    rng = np.random.default_rng(9)
    mat = rng.normal(size=(120, 64)).astype(np.float32)
    df = _emb(spark, mat)
    thr = BQ.train_bq_thresholds(df, dim=64)
    path = str(tmp_path / "bq_idx")
    BQ.write_bq_index(df, path, thr)
    inline = BQ.bq_topk(df, mat[3], thr, k=7, shortlist=40).collect()
    indexed = BQ.bq_topk_indexed(
        spark, path, mat[3], k=7, shortlist=40, rerank_corpus=df
    ).collect()
    assert [(r["vec_id"], r["hamming"]) for r in indexed] == [
        (r["vec_id"], r["hamming"]) for r in inline
    ]
    # hamming-only mode (no rerank corpus): ranked by -hamming
    ham_only = BQ.bq_topk_indexed(spark, path, mat[3], k=7, shortlist=40).collect()
    assert ham_only[0]["vec_id"] == 3 and ham_only[0]["score"] == 0.0
    hams = [-r["score"] for r in ham_only]
    assert hams == sorted(hams)


# r14: part of the fast driver-gate subset (default `pytest` selection
# per pytest.ini; `-m ''` runs the full suite)
import pytest as _pytest

pytestmark = _pytest.mark.driver_gate
