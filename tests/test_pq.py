"""Product quantization: encode determinism, ADC vs a numpy oracle,
rerank recovering exact results, and the materialized codes table."""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
    pq as PQ,
    search as S,
)
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.plans.explain import (
    physical_plan,
)

M = 8
KSUB = 16
K = 10


@pytest.fixture(scope="module")
def corpus(tables):
    return tables["embeddings"].select("vec_id", "embedding")


@pytest.fixture(scope="module")
def np_corpus(corpus):
    rows = corpus.orderBy("vec_id").collect()
    ids = np.asarray([r.vec_id for r in rows])
    X = np.asarray([r.embedding for r in rows], dtype=np.float64)
    return ids, X


@pytest.fixture(scope="module")
def books(np_corpus):
    ids, X = np_corpus
    return PQ.codebooks_from_rows(X[:KSUB].tolist(), M)


@pytest.fixture(scope="module")
def qvec(np_corpus):
    ids, X = np_corpus
    return X[0].tolist()


def _np_codes(X, books):
    m, ksub = len(books), len(books[0])
    dsub = X.shape[1] // m
    C = np.asarray(books)  # m × ksub × dsub
    codes = np.empty((len(X), m), dtype=np.int64)
    for j in range(m):
        sub = X[:, j * dsub : (j + 1) * dsub]
        d = ((sub[:, None, :] - C[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = d.argmin(axis=1)  # argmin takes lowest index on ties
    return codes


@pytest.mark.parametrize("encode", [PQ.pq_encode, PQ.pq_encode_expr])
def test_encode_matches_numpy_argmin(corpus, np_corpus, books, encode):
    """Both the vectorized production encode and the pure-expression
    specification produce the numpy argmin codes — i.e. the two
    implementations are value-identical."""
    ids, X = np_corpus
    got = {r.vec_id: list(r.code) for r in encode(corpus, books).collect()}
    want = _np_codes(X, books)
    for i, vid in enumerate(ids):
        assert got[vid] == list(want[i]), f"vec {vid}"


def test_adc_topk_matches_numpy_lut(corpus, np_corpus, books, qvec):
    ids, X = np_corpus
    codes = PQ.pq_encode(corpus, books)
    got = PQ.pq_adc_topk(codes, books, qvec, k=K).collect()
    # numpy oracle: LUT scores, top-k by (-score, id)
    lut = np.asarray(PQ.adc_lut(books, qvec))  # m × ksub
    nc = _np_codes(X, books)
    scores = lut[np.arange(M)[None, :], nc].sum(axis=1)
    order = sorted(range(len(ids)), key=lambda i: (-scores[i], ids[i]))[:K]
    assert [r.vec_id for r in got] == [int(ids[i]) for i in order]
    for r, i in zip(got, order):
        assert r.score == pytest.approx(scores[i], abs=1e-9)
    # sorted desc, ties by id
    ss = [r.score for r in got]
    assert ss == sorted(ss, reverse=True)


def test_rerank_recovers_exact_topk(corpus, books, qvec):
    """Rerank with a full-corpus budget IS the exact search (ADC only
    orders the shortlist); with a partial budget its recall can only
    improve on plain ADC (exact ordering over an ADC superset)."""
    codes = PQ.pq_encode(corpus, books)
    n = corpus.count()
    exact = [r.vec_id for r in S.topk(corpus, qvec, k=K).collect()]
    full = [
        r.vec_id
        for r in PQ.pq_rerank_topk(codes, corpus, books, qvec, k=K, rerank=n).collect()
    ]
    assert full == exact

    adc = {r.vec_id for r in PQ.pq_adc_topk(codes, books, qvec, k=K).collect()}
    partial = {
        r.vec_id
        for r in PQ.pq_rerank_topk(codes, corpus, books, qvec, k=K, rerank=50).collect()
    }
    assert len(partial & set(exact)) >= len(adc & set(exact))


def test_trained_codebooks_reduce_quantization_error(corpus, np_corpus):
    """k-means codebooks beat the slices-of-first-rows codebooks on
    reconstruction error — the trainer actually trains."""
    ids, X = np_corpus
    naive = PQ.codebooks_from_rows(X[:KSUB].tolist(), M)
    trained = PQ.train_pq_codebooks(
        corpus, M, ksub=KSUB, sample_fraction=1.0, n_iter=10, seed=13
    )

    def recon_err(books):
        C = np.asarray(books)
        codes = _np_codes(X, books)
        dsub = X.shape[1] // M
        err = 0.0
        for j in range(M):
            sub = X[:, j * dsub : (j + 1) * dsub]
            err += ((sub - C[j][codes[:, j]]) ** 2).sum()
        return err

    assert recon_err(trained) < recon_err(naive)


def test_pq_index_roundtrip_and_codes_only_scan(corpus, books, qvec, spark):
    tmp = tempfile.mkdtemp(prefix="pq_idx_")
    try:
        PQ.write_pq_index(corpus, tmp, books)
        # indexed ADC == query-time ADC
        codes = PQ.pq_encode(corpus, books)
        want = [(r.vec_id, r.score) for r in PQ.pq_adc_topk(codes, books, qvec, k=K).collect()]
        df = PQ.pq_topk_indexed(spark, tmp, qvec, k=K)
        got = [(r.vec_id, r.score) for r in df.collect()]
        assert got == want
        # the scan reads the CODES table, not the vectors: schema on disk
        # is (vec_id, code) only
        assert set(spark.read.parquet(tmp).columns) == {"vec_id", "code"}
        # rerank variant with a full budget reproduces the exact search
        rer = PQ.pq_topk_indexed(
            spark, tmp, qvec, k=K, rerank_corpus=corpus, rerank=corpus.count()
        )
        exact = [r.vec_id for r in S.topk(corpus, qvec, k=K).collect()]
        assert [r.vec_id for r in rer.collect()] == exact
        # the ADC scan plan stays Python-free (no UDF/Arrow eval nodes)
        plan = physical_plan(df)
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_ivfpq_index_prunes_cells_and_scores_adc(corpus, np_corpus, books, qvec, spark):
    """IVF-PQ: the read must carry a PartitionFilters prune on
    ivf_cell; the result must equal ADC scoring restricted to the
    probed cells; full-budget rerank recovers the exact top-k of the
    probed subset."""
    from pyspark.sql import functions as F

    ids, X = np_corpus
    cents = [(int(ids[i]), X[i].tolist()) for i in range(4)]
    nprobe = 2
    tmp = tempfile.mkdtemp(prefix="ivfpq_idx_")
    try:
        PQ.write_ivfpq_index(corpus, tmp, cents, books)
        df = PQ.ivfpq_topk_indexed(spark, tmp, qvec, k=K, nprobe=nprobe)
        got = [(r.vec_id, round(r.score, 6)) for r in df.collect()]

        # oracle: numpy cell assignment -> probe cells -> ADC over subset
        C = np.asarray([c[1] for c in cents])
        d_all = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        cell = d_all.argmin(axis=1)
        qd = ((np.asarray(qvec)[None, :] - C) ** 2).sum(axis=1)
        probe = set(np.argsort(qd, kind="stable")[:nprobe])
        mask = np.isin(cell, list(probe))
        codes = _np_codes(X[mask], books)
        lut = np.asarray(PQ.adc_lut(books, qvec))
        scores = lut[np.arange(len(books))[None, :], codes].sum(axis=1)
        sub_ids = ids[mask]
        order = sorted(zip(sub_ids, scores), key=lambda t: (-t[1], t[0]))[:K]
        want = [(int(i), round(float(s), 6)) for i, s in order]
        assert got == want

        # partition pruning visible in the plan
        plan = physical_plan(df)
        assert "PartitionFilters" in plan and "ivf_cell" in plan

        # full-budget rerank == exact top-k over the probed subset
        rer = PQ.ivfpq_topk_indexed(
            spark, tmp, qvec, k=K, nprobe=nprobe,
            rerank_corpus=corpus, rerank=int(mask.sum()),
        )
        probed = corpus.filter(F.col("vec_id").isin([int(i) for i in sub_ids]))
        exact = [r.vec_id for r in S.topk(probed, qvec, k=K).collect()]
        assert [r.vec_id for r in rer.collect()] == exact
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# OPQ rotation (Ge et al.)
# ---------------------------------------------------------------------------


def _aniso_corpus(spark, n=2000, d=32, seed=3):
    """Axis-aligned decaying variances — the unbalanced-raw-dims regime
    OPQ exists for: contiguous PQ subspaces get wildly different
    variance mass (first block dominates), so a learned rotation that
    redistributes information strictly improves both distortion and
    NN recall. (On a pre-balanced basis — e.g. the repo's isotropic
    synthetic embeddings, or any randomly-mixed corpus — plain PQ is
    already at the balanced optimum and NO rotation can help; measured
    and documented in train_opq's docstring.)"""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    scales = np.geomspace(1.0, 0.05, d)
    X = rng.standard_normal((n, d)) * scales
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(n), "embedding": [x.tolist() for x in X]})
    )
    return df, X


def _recon(Y, cbs, m):
    import numpy as np

    dsub = Y.shape[1] // m
    out = np.empty_like(Y)
    for j in range(m):
        S = Y[:, j * dsub : (j + 1) * dsub]
        C = np.asarray(cbs[j])
        a = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
        out[:, j * dsub : (j + 1) * dsub] = C[a]
    return out


def test_opq_rotation_is_orthogonal_and_deterministic(spark):
    import numpy as np

    df, _ = _aniso_corpus(spark, n=600)
    R1, _b1 = PQ.train_opq(df, m=4, ksub=16, n_iter=3, kmeans_iter=2,
                           sample_fraction=1.0)
    R2, _b2 = PQ.train_opq(df, m=4, ksub=16, n_iter=3, kmeans_iter=2,
                           sample_fraction=1.0)
    R = np.asarray(R1)
    assert np.allclose(R @ R.T, np.eye(R.shape[0]), atol=1e-9)
    assert R1 == R2  # seeded: bit-identical across calls


def test_opq_quantization_error_beats_plain_pq(spark):
    import numpy as np

    df, X = _aniso_corpus(spark)
    m = 4
    R, books = PQ.train_opq(df, m=m, ksub=32, n_iter=12, kmeans_iter=6,
                            sample_fraction=1.0)
    Rm = np.asarray(R)
    plain = PQ.train_pq_codebooks(df, m=m, ksub=32, sample_fraction=1.0,
                                  n_iter=10)
    e_opq = ((X @ Rm.T - _recon(X @ Rm.T, books, m)) ** 2).sum()
    e_pq = ((X - _recon(X, plain, m)) ** 2).sum()
    assert e_opq < 0.8 * e_pq, (e_opq, e_pq)  # decisively lower distortion


def test_opq_improves_nn_recall_on_unbalanced_data(spark):
    """Euclidean-NN recall@10 (the metric OPQ optimizes, per the
    paper) from the SPARK-side pipeline: opq_rotate (Arrow matmul) +
    distributed pq_encode produce the codes, recall is read off the
    reconstructions they imply."""
    import numpy as np

    df, X = _aniso_corpus(spark)
    m, ksub, k = 4, 32, 10
    R, obooks = PQ.train_opq(df, m=m, ksub=ksub, n_iter=12, kmeans_iter=6,
                             sample_fraction=1.0)
    Rm = np.asarray(R)
    plain = PQ.train_pq_codebooks(df, m=m, ksub=ksub, sample_fraction=1.0,
                                  n_iter=10)
    rot = PQ.opq_rotate(df, R).select("vec_id", F.col("opq").alias("embedding"))
    dsub = X.shape[1] // m

    def recon_from_codes(codes_df, books, back=None):
        rows = {r.vec_id: r.code for r in codes_df.collect()}
        B = [np.asarray(c) for c in books]
        Y = np.stack([
            np.concatenate([B[j][rows[i][j]] for j in range(m)])
            for i in range(len(X))
        ])
        return Y @ back if back is not None else Y

    Xh_pq = recon_from_codes(PQ.pq_encode(df, plain), plain)
    Xh_opq = recon_from_codes(PQ.pq_encode(rot, obooks), obooks, back=Rm)
    rng = np.random.default_rng(7)
    hits_pq = hits_opq = 0
    for qi in rng.choice(len(X), 60, replace=False):
        q = X[qi]
        exact = set(np.argsort(((X - q) ** 2).sum(1))[:k].tolist())
        hits_pq += len(exact & set(np.argsort(((Xh_pq - q) ** 2).sum(1))[:k].tolist()))
        hits_opq += len(exact & set(np.argsort(((Xh_opq - q) ** 2).sum(1))[:k].tolist()))
    # decisive margin, not a tie-break: measured ~1.45x at this setup
    assert hits_opq > 1.15 * hits_pq, (hits_opq, hits_pq)


def test_residual_ivfpq_quantizes_finer_on_clustered_data(spark):
    """The IVFADC premise: when cells capture cluster structure,
    residuals are the small within-cluster offsets and quantize far
    finer than raw vectors at equal budget — asserted on
    reconstruction error, the quantity the encoding controls. (With
    arbitrary untrained anchors on isotropic data the residual is NOT
    smaller and the two paths tie to noise — measured; the contract
    entries therefore claim IVFADC's arithmetic, not a universal
    recall win.)"""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(5)
    centers = rng.normal(size=(4, 32)) * 3.0
    X = np.vstack([c + rng.normal(size=(400, 32)) * 0.3 for c in centers])
    order = rng.permutation(len(X))  # codebook rows sample all clusters
    X = X[order]
    emb = spark.createDataFrame(pd.DataFrame(
        {"vec_id": range(len(X)), "embedding": [x.tolist() for x in X]}))
    cents = [(i, c.tolist()) for i, c in enumerate(centers)]
    books_raw = PQ.codebooks_from_rows([x.tolist() for x in X[:16]], 8)
    books_res = PQ.residual_codebooks(emb, cents, m=8, ksub=16)

    def recon_err(Y, books):
        m, dsub = 8, 4
        tot = 0.0
        for j in range(m):
            S = Y[:, j * dsub : (j + 1) * dsub]
            C = np.asarray(books[j])
            tot += (((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
                    .min(axis=1).sum())
        return tot

    cell = np.array([
        ((X[i] - centers) ** 2).sum(axis=1).argmin() for i in range(len(X))
    ])
    resid = X - centers[cell]
    e_res = recon_err(resid, books_res)
    e_raw = recon_err(X, books_raw)
    # measured 0.41x with first-16-row codebooks (untrained); a
    # trained codebook widens the gap further
    assert e_res < 0.6 * e_raw, (e_res, e_raw)


def test_residual_score_decomposition_is_exact_on_codebook_rows(tables, spark):
    """A vector that IS a residual-codebook row reconstructs exactly, so
    its IVFADC score equals the true inner product <q, x>."""
    import numpy as np

    emb = tables["embeddings"]
    cents = [(r.vec_id, list(r.embedding))
             for r in emb.filter("vec_id < 4").orderBy("vec_id").collect()]
    qv = np.asarray(emb.filter("vec_id = 0").head().embedding, dtype=np.float64)
    books = PQ.residual_codebooks(emb, cents, m=8, ksub=16)
    scored = {r.vec_id: r.score
              for r in PQ.ivfpq_residual_topk(emb, cents, books, qv.tolist(),
                                              k=1000, nprobe=4).collect()}
    # rows 0..15 are the codebook rows; those in the probed cells score
    # exactly <q, x> (sequential-fold arithmetic)
    for r in emb.filter("vec_id < 16").collect():
        if r.vec_id not in scored:
            continue
        x = [float(v) for v in r.embedding]
        want = 0.0
        for a, b in zip(qv.tolist(), x):
            want += a * b
        assert abs(scored[r.vec_id] - want) < 1e-6, (r.vec_id, scored[r.vec_id], want)


# r14: part of the fast driver-gate subset (default `pytest` selection
# per pytest.ini; `-m ''` runs the full suite)
import pytest as _pytest

pytestmark = _pytest.mark.driver_gate
