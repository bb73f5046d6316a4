"""Implicit-feedback ALS (operators/factorization.py): numpy-replica
parity, partitioning independence, and learned-structure checks — the
no-SQL-mirror verification discipline (the OPQ pattern)."""

from __future__ import annotations

import numpy as np
import pytest

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
    factorization as FX,
)

RANK, ITERS, ALPHA, REG = 4, 2, 5.0, 0.1


def _replica(rows, rank=RANK, iters=ITERS, alpha=ALPHA, reg=REG):
    """The identical ALS schedule in pure numpy: same dedup, same hash
    init, same items-then-users order, same sorted accumulation."""
    agg = {}
    for u, i, r in rows:
        agg[(u, i)] = agg.get((u, i), 0.0) + float(r)
    users = sorted({u for u, _ in agg})
    items = sorted({i for _, i in agg})
    X = {u: FX.init_factors(np.array([u]), rank)[0] for u in users}
    Y = {i: FX.init_factors(np.array([i]), rank)[0] for i in items}
    by_item = {i: sorted(u for u, ii in agg if ii == i) for i in items}
    by_user = {u: sorted(i for uu, i in agg if uu == u) for u in users}

    def solve(fixed, groups, get_r):
        G = np.zeros((rank, rank))
        for v in fixed.values():
            G += np.outer(v, v)
        out = {}
        for key, others in groups.items():
            Yg = np.stack([fixed[o] for o in others])
            c = 1.0 + alpha * np.array([get_r(key, o) for o in others])
            A = G + reg * np.eye(rank) + (Yg.T * (c - 1.0)) @ Yg
            b = Yg.T @ c
            out[key] = np.linalg.solve(A, b)
        return out

    for _ in range(iters):
        Y = solve(X, by_item, lambda i, u: agg[(u, i)])
        X = solve(Y, by_user, lambda u, i: agg[(u, i)])
    return X, Y


def _rows():
    # two blocks: users 0-2 hit items 0-2, users 3-5 hit items 3-4,
    # plus one weak cross edge and a repeated interaction
    rows = []
    for u in range(3):
        for i in range(3):
            rows.append((u, i, 2.0 + u + i))
    for u in range(3, 6):
        for i in range(3, 5):
            rows.append((u, i, 3.0))
    rows.append((0, 4, 0.5))
    rows.append((0, 0, 1.0))  # duplicate pair: strengths sum
    return rows


def test_als_matches_numpy_replica(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, "user_id long, item_id long, strength double")
    uf, itf = FX.als_implicit(df, rank=RANK, iters=ITERS, alpha=ALPHA, reg=REG)
    X, Y = _replica(rows)
    got_u = {r.id: np.array(r.vec) for r in uf.collect()}
    got_i = {r.id: np.array(r.vec) for r in itf.collect()}
    assert set(got_u) == set(X) and set(got_i) == set(Y)
    for u in X:
        assert np.allclose(got_u[u], X[u], atol=1e-8), u
    for i in Y:
        assert np.allclose(got_i[i], Y[i], atol=1e-8), i


def test_als_partitioning_independent(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, "user_id long, item_id long, strength double")
    uf1, _ = FX.als_implicit(df, rank=RANK, iters=1, alpha=ALPHA, reg=REG)
    uf2, _ = FX.als_implicit(
        df.repartition(7), rank=RANK, iters=1, alpha=ALPHA, reg=REG
    )
    a = {r.id: np.array(r.vec) for r in uf1.collect()}
    b = {r.id: np.array(r.vec) for r in uf2.collect()}
    for k in a:
        assert np.allclose(a[k], b[k], atol=1e-9)


def test_als_learns_block_structure(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, "user_id long, item_id long, strength double")
    uf, itf = FX.als_implicit(df, rank=RANK, iters=3, alpha=ALPHA, reg=REG)
    pairs = spark.createDataFrame(
        [(1, 1), (1, 4), (4, 4), (4, 1)], "u long, i long"
    )
    s = {(r.u, r.i): r.score for r in FX.predict_scores(uf, itf, pairs).collect()}
    # in-block preference beats cross-block for both blocks
    assert s[(1, 1)] > s[(1, 4)]
    assert s[(4, 4)] > s[(4, 1)]
    # observed-pair predictions approach preference 1
    assert s[(1, 1)] > 0.6 and s[(4, 4)] > 0.6


def test_als_factors_feed_knn_join(spark):
    """Closes the loop the module docstring claims: learned item
    factors are an (id, embedding) frame the ANN family consumes
    directly — similar items stay in-block."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.search import knn_join

    rows = _rows()
    df = spark.createDataFrame(rows, "user_id long, item_id long, strength double")
    _, itf = FX.als_implicit(df, rank=RANK, iters=3, alpha=ALPHA, reg=REG)
    corpus = itf.withColumnRenamed("vec", "embedding").withColumnRenamed("id", "vec_id")
    q = corpus.select(
        corpus.vec_id.alias("qid"), corpus.embedding.alias("qvec")
    ).filter("qid = 0")
    nn = knn_join(q, corpus, k=2, query_vec="qvec").collect()
    # item 0's nearest neighbor (after itself) is another block-A item
    others = [r.neighbor_id for r in nn if r.neighbor_id != 0]
    assert others and all(n in (1, 2) for n in others)


def test_als_fold_in_reproduces_and_generalizes(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, "user_id long, item_id long, strength double")
    uf, itf = FX.als_implicit(df, rank=RANK, iters=ITERS, alpha=ALPHA, reg=REG)
    # folding the training interactions against the frozen items must
    # reproduce the trained user factors exactly (same solve, same data)
    folded = FX.als_fold_in(df, itf, rank=RANK, alpha=ALPHA, reg=REG)
    a = {r.id: np.array(r.vec) for r in uf.collect()}
    b = {r.id: np.array(r.vec) for r in folded.collect()}
    assert set(a) == set(b)
    for k in a:
        assert np.allclose(a[k], b[k], atol=1e-9), k
    # a brand-new user who bought block-A items scores block A higher
    new = spark.createDataFrame(
        [(99, 0, 3.0), (99, 1, 3.0)], "user_id long, item_id long, strength double"
    )
    nf = FX.als_fold_in(new, itf, rank=RANK, alpha=ALPHA, reg=REG)
    pairs = spark.createDataFrame([(99, 2), (99, 4)], "u long, i long")
    s = {
        (r.u, r.i): r.score
        for r in FX.predict_scores(nf, itf, pairs).collect()
    }
    assert s[(99, 2)] > s[(99, 4)]
