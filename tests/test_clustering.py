"""Distributed k-means (operators/clustering.py): Lloyd loop converges
on separable blobs with monotone inertia, empty clusters keep their
centroid, the E-step plan is a shuffle-free projection, and
cluster-blocked semantic dedup finds within-blob near-dups."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import clustering as CL


def _blobs(spark, centers, n_per, spread=0.05, dim=8, seed=0, interleave=False):
    """interleave=True deals ids round-robin across blobs so the
    lowest-id seeds (kmeans_init) start one-per-blob; False keeps
    contiguous id blocks (all seeds land in blob 0 — the classic
    bad-seeding local optimum)."""
    rng = np.random.default_rng(seed)
    rows = []
    i = 0
    for j, c in enumerate(centers):
        for m in range(n_per):
            v = np.asarray(c, dtype=float) + rng.normal(scale=spread, size=dim)
            vid = (m * len(centers) + j) if interleave else i
            rows.append((vid, [float(x) for x in v]))
            i += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_fit_converges_on_blobs(spark):
    dim = 8
    centers = [np.eye(dim)[i] * 4 for i in range(3)]
    df = _blobs(spark, centers, n_per=30, dim=dim, interleave=True)
    cents, hist = CL.kmeans_fit(df, k=3, n_iter=8)
    # inertia is non-increasing across Lloyd iterations
    assert all(hist[i + 1] <= hist[i] + 1e-9 for i in range(len(hist) - 1))
    # converged centroids sit on the true blob centers
    got = sorted(np.argmax(c) for c in cents)
    assert got == [0, 1, 2]
    for c in cents:
        assert abs(max(c) - 4.0) < 0.1
    # final assignment is pure: each cluster holds exactly one blob
    sizes = (
        CL.assign_clusters(df, cents).groupBy("cluster").count().collect()
    )
    assert sorted(r["count"] for r in sizes) == [30, 30, 30]


def test_kmeans_fit_deterministic(spark):
    df = _blobs(spark, [np.ones(4), -np.ones(4)], n_per=20, dim=4, seed=3)
    c1, h1 = CL.kmeans_fit(df, k=2, n_iter=5)
    c2, h2 = CL.kmeans_fit(df, k=2, n_iter=5)
    assert c1 == c2 and h1 == h2


def test_empty_cluster_keeps_centroid(spark):
    # k=3 seeds but only 2 real blobs far away: seed 2's cluster can
    # starve — its centroid must survive verbatim, not NaN out
    rows = [(0, [0.0, 0.0]), (1, [0.1, 0.0]), (2, [10.0, 10.0]), (3, [10.1, 10.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents, _ = CL.kmeans_fit(df, k=3, n_iter=3)
    assert len(cents) == 3
    assert all(all(np.isfinite(x) for x in c) for c in cents)


def test_assign_plan_is_shuffle_free(spark):
    df = _blobs(spark, [np.ones(4)], n_per=10, dim=4)
    plan = (
        CL.assign_clusters(df, [[1.0] * 4, [0.0] * 4])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_semantic_dedup_blocks_by_cluster(spark):
    dim = 8
    centers = [np.eye(dim)[0] * 4, np.eye(dim)[1] * 4]
    df = _blobs(spark, centers, n_per=10, dim=dim, spread=0.01, seed=5, interleave=True)
    cents, _ = CL.kmeans_fit(df, k=2, n_iter=4)
    pairs = CL.semantic_dedup_pairs(df, cents, tau=0.99).collect()
    assert len(pairs) > 0
    # tight blobs → every within-blob pair is a near-dup; no pair may
    # cross blob boundaries (interleaved ids: blob = id % 2)
    for r in pairs:
        assert r["id_a"] % 2 == r["id_b"] % 2
        assert r["cos"] >= 0.99
    assert len(pairs) == 2 * (10 * 9) // 2


def test_semantic_dedup_block_cap(spark):
    dim = 8
    centers = [np.eye(dim)[0] * 4, np.eye(dim)[1] * 4]
    # blob A has 12 members, blob B has 4
    rows = []
    rng = np.random.default_rng(11)
    i = 0
    for j, (c, n) in enumerate(zip(centers, [12, 4])):
        for _ in range(n):
            v = np.asarray(c) + rng.normal(scale=0.01, size=dim)
            rows.append((i, [float(x) for x in v]))
            i += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [list(np.eye(dim)[0] * 4), list(np.eye(dim)[1] * 4)]
    # cap below blob A's size: only blob B's pairs survive
    capped = CL.semantic_dedup_pairs(df, cents, tau=0.9, max_block_size=8).collect()
    assert len(capped) == 4 * 3 // 2
    assert all(r["id_a"] >= 12 and r["id_b"] >= 12 for r in capped)
    # no cap: both blobs' pairs
    full = CL.semantic_dedup_pairs(df, cents, tau=0.9).collect()
    assert len(full) == 12 * 11 // 2 + 4 * 3 // 2


# ---------------------------------------------------------------------------
# k-center greedy coreset
# ---------------------------------------------------------------------------


def test_kcenter_matches_numpy_greedy(tables):
    import numpy as np

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.clustering import (
        kcenter_select,
    )

    emb = tables["embeddings"]
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([r.embedding for r in rows], dtype=np.float64)

    def np_greedy(k, seed=0):
        sel = [int(np.where(ids == seed)[0][0])]
        out = [(seed, 1, None)]
        for rank in range(2, k + 1):
            d = np.min(
                ((X[:, None, :] - X[None, sel, :]) ** 2).sum(axis=2), axis=1
            )
            d[sel] = -np.inf
            # argmax with ascending-id tie-break
            best = max(
                (i for i in range(len(ids)) if i not in sel),
                key=lambda i: (d[i], -ids[i]),
            )
            out.append((int(ids[best]), rank, float(d[best])))
            sel.append(best)
        return out

    got = [
        (r.id, r.rank, r.min_dist)
        for r in kcenter_select(emb, k=5, seed_id=0).orderBy("rank").collect()
    ]
    want = np_greedy(5)
    for (gi, gr, gd), (wi, wr, wd) in zip(got, want):
        assert (gi, gr) == (wi, wr)
        if wd is not None:
            assert abs(gd - wd) < 1e-9


def test_kcenter_spreads_further_than_topk_neighbors(tables):
    # the selected set must be pairwise farther apart than the seed's
    # nearest neighbors are to the seed (diversity property)
    import numpy as np

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.clustering import (
        kcenter_select,
    )

    emb = tables["embeddings"]
    sel = kcenter_select(emb, k=4, seed_id=0).collect()
    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in emb.filter(F.col("vec_id").isin([r.id for r in sel])).collect()
    }
    ids = [r.id for r in sel]
    pair_d = [
        ((vecs[a] - vecs[b]) ** 2).sum()
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
    ]
    assert min(pair_d) > 0.0


def test_kcenter_missing_seed_raises(tables):
    import pytest

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.clustering import (
        kcenter_select,
    )

    with pytest.raises(ValueError, match="seed_id"):
        kcenter_select(tables["embeddings"], k=3, seed_id=-999)

