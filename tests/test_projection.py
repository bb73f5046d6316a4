"""Known-answer tests for operators/projection.py: deterministic sign
random projection (numpy parity, python-point mirror, JL norm sanity)
and the distributed PCA trainer (numpy parity, partitioning
invariance). The sf0.01 oracle value-check for the rp_* contract
entries runs in tests/test_contract_extras.py."""
from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
    projection as P,
)


def _rand_df(spark, n=200, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, dim))
    rows = [(i, [float(x) for x in X[i]]) for i in range(n)]
    return X, spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_sign_matrix_deterministic_pm1():
    a = P.sign_matrix(8, 4)
    b = P.sign_matrix(8, 4)
    assert a == b
    assert all(v in (1.0, -1.0) for row in a for v in row)
    # not degenerate: both signs occur
    flat = [v for row in a for v in row]
    assert 1.0 in flat and -1.0 in flat


def test_rp_embed_matches_numpy(spark):
    X, df = _rand_df(spark, n=50, dim=16)
    out_dim = 6
    got = {r.vec_id: r.rp for r in P.rp_embed(df, out_dim=out_dim, in_dim=16).collect()}
    S = np.asarray(P.sign_matrix(16, out_dim))
    want = (X @ S.T) / math.sqrt(out_dim)
    for i in range(50):
        assert np.allclose(got[i], want[i], atol=1e-9)


def test_rp_project_point_mirrors_rp_embed(spark):
    X, df = _rand_df(spark, n=5, dim=16)
    got = {r.vec_id: r.rp for r in P.rp_embed(df, out_dim=4, in_dim=16).collect()}
    for i in range(5):
        py = P.rp_project_point([float(x) for x in X[i]], out_dim=4)
        assert got[i] == pytest.approx(py, abs=1e-12)


def test_rp_preserves_norms_in_expectation(spark):
    X, df = _rand_df(spark, n=300, dim=64, seed=11)
    res = (
        P.rp_embed(df, out_dim=16, in_dim=64)
        .select(
            F.aggregate("rp", F.lit(0.0), lambda a, x: a + x * x).alias("pn"),
            F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x).alias("n"),
        )
        .collect()
    )
    ratios = [r.pn / r.n for r in res]
    # JL: mean ratio ~ 1 with O(1/sqrt(out_dim)) per-row spread
    assert abs(float(np.mean(ratios)) - 1.0) < 0.1


def test_pca_fit_matches_numpy_and_partitioning(spark):
    X, df = _rand_df(spark, n=400, dim=8, seed=5)
    # stretch two directions so the spectrum is well-separated
    X2 = X.copy()
    X2[:, 0] *= 5.0
    X2[:, 1] *= 3.0
    rows = [(i, [float(x) for x in X2[i]]) for i in range(len(X2))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    mean, comps, ev = P.pca_fit(df, k=3, in_dim=8)
    # numpy reference
    mu = X2.mean(axis=0)
    cov = np.cov(X2.T, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:3]
    assert np.allclose(mean, mu, atol=1e-9)
    for j, i in enumerate(order):
        v = vecs[:, i]
        nz = np.nonzero(np.abs(v) > 1e-12)[0]
        if len(nz) and v[nz[0]] < 0:
            v = -v
        assert np.allclose(comps[j], v, atol=1e-6), j
        assert ev[j] == pytest.approx(float(vals[i]), abs=1e-9)
    # partitioning must not change the fit (partials are exact sums)
    mean7, comps7, ev7 = P.pca_fit(df.repartition(7), k=3, in_dim=8)
    assert np.allclose(mean, mean7, atol=1e-9)
    assert np.allclose(comps, comps7, atol=1e-9)


def test_pca_project_matches_numpy(spark):
    X, df = _rand_df(spark, n=100, dim=8, seed=9)
    mean, comps, _ = P.pca_fit(df, k=2, in_dim=8)
    got = {r.vec_id: r.pca for r in P.pca_project(df, mean, comps).collect()}
    C = np.asarray(comps)
    want = (X - np.asarray(mean)) @ C.T
    for i in range(100):
        assert np.allclose(got[i], want[i], atol=1e-9)


def test_pca_empty_raises(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        P.pca_fit(df, k=2, in_dim=8)


def test_rp_knn_join_full_shortlist_equals_exact(spark):
    # shortlist >= corpus: rerank sees everything -> exact knn_join
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        search as S,
    )

    X, df = _rand_df(spark, n=40, dim=64, seed=21)
    qs = df.filter("vec_id < 3").selectExpr("vec_id as qid", "embedding")
    exact = S.knn_join(qs, df, k=5)
    two = P.rp_knn_join(qs, df, k=5, shortlist=40, out_dim=16)
    a = {(r.qid, r.rank): (r.neighbor_id, round(r.score, 9)) for r in exact.collect()}
    b = {(r.qid, r.rank): (r.neighbor_id, round(r.score, 9)) for r in two.collect()}
    assert a == b


def test_rp_knn_join_narrow_shortlist_reasonable_recall(spark):
    from pyspark.sql import functions as F
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        search as S,
    )

    X, df = _rand_df(spark, n=300, dim=64, seed=22)
    qs = df.filter("vec_id < 4").selectExpr("vec_id as qid", "embedding")
    exact = S.knn_join(qs, df, k=5)
    two = P.rp_knn_join(qs, df, k=5, shortlist=60, out_dim=16)
    rec = S.recall_at_k(exact, two, k=5, by=["qid", "neighbor_id"])
    vals = [r.recall for r in rec.collect()]
    assert len(vals) == 4 and sum(vals) / 4 >= 0.5  # JL at 16 dims: decent

