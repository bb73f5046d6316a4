"""Radius (range) search invariants: membership vs a numpy
brute-force oracle, metric-native threshold semantics, matmul == expr
parity on the batch join, the chunked-split path, and the no-shuffle
plan shape (SURVEY.md §2.2 range-variant gap)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import search as S


@pytest.fixture(scope="module")
def corpus(tables):
    return tables["embeddings"].select("vec_id", "embedding")


@pytest.fixture(scope="module")
def np_corpus(corpus):
    rows = corpus.orderBy("vec_id").collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    return ids, X


def _np_cosine(X, q):
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    qn = np.asarray(q, dtype=np.float64)
    qn = qn / max(np.linalg.norm(qn), 1e-12)
    return Xn @ qn


def test_range_search_cosine_membership(corpus, np_corpus):
    ids, X = np_corpus
    q = list(X[0])
    t = 0.25
    got = {r.vec_id for r in S.range_search(corpus, q, t).collect()}
    sims = _np_cosine(X, q)
    want = set(ids[sims >= t - 1e-12])
    # boundary rows (within an ulp of t) may differ between the fold
    # and the matmul — the testdata has none at this threshold
    assert got == want
    assert len(got) > 0
    assert ids[0] in got  # the query itself (sim 1.0)


def test_range_search_l2_radius(corpus, np_corpus):
    ids, X = np_corpus
    q = list(X[0])
    radius = 2.0
    got = S.range_search(corpus, q, radius, metric="l2").collect()
    d = np.linalg.norm(X - np.asarray(q), axis=1)
    want = set(ids[d <= radius + 1e-12])
    assert {r.vec_id for r in got} == want
    # score column stays higher-is-better neg-l2sq
    for r in got:
        assert r.score >= -radius * radius - 1e-9


def test_range_search_l2_negative_radius_raises(corpus):
    with pytest.raises(ValueError):
        S.range_search(corpus, [0.0] * 64, -1.0, metric="l2")


def test_range_search_empty_results(corpus):
    assert S.range_search(corpus, [1.0] * 64, 1.1).count() == 0
    empty = corpus.filter("vec_id < 0")
    assert S.range_search(empty, [1.0] * 64, -1.0).count() == 0


@pytest.fixture(scope="module")
def queries(corpus):
    return corpus.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )


def test_range_join_matmul_equals_expr(queries, corpus):
    t = 0.25
    got_mm = S.range_join(queries, corpus, t).collect()
    got_ex = S.range_join(queries, corpus, t, use_matmul=False).collect()
    mm = {(r.qid, r.neighbor_id) for r in got_mm}
    ex = {(r.qid, r.neighbor_id) for r in got_ex}
    assert mm == ex
    s_mm = {(r.qid, r.neighbor_id): r.score for r in got_mm}
    s_ex = {(r.qid, r.neighbor_id): r.score for r in got_ex}
    for key in mm:
        assert s_mm[key] == pytest.approx(s_ex[key], abs=1e-9)


def test_range_join_vs_numpy(queries, corpus, np_corpus):
    ids, X = np_corpus
    t = 0.3
    got = S.range_join(queries, corpus, t).collect()
    by_q: dict[int, set] = {}
    for r in got:
        by_q.setdefault(r.qid, set()).add(r.neighbor_id)
    for qi in range(8):
        sims = _np_cosine(X, X[qi])
        want = set(ids[sims >= t - 1e-12])
        assert by_q.get(int(ids[qi]), set()) == want


def test_range_join_split_path_exact(queries, corpus):
    """Hash-split recursion (budget=3 forces splits) == direct path."""
    t = 0.25
    direct = {
        (r.qid, r.neighbor_id)
        for r in S.range_join(queries, corpus, t).collect()
    }
    split = {
        (r.qid, r.neighbor_id)
        for r in S.range_join(queries, corpus, t, max_broadcast_rows=3).collect()
    }
    assert split == direct


def test_range_join_l2(queries, corpus, np_corpus):
    ids, X = np_corpus
    radius = 2.0
    got = S.range_join(queries, corpus, radius, metric="l2").collect()
    by_q: dict[int, set] = {}
    for r in got:
        by_q.setdefault(r.qid, set()).add(r.neighbor_id)
    for qi in range(8):
        d = np.linalg.norm(X - X[qi], axis=1)
        want = set(ids[d <= radius + 1e-12])
        assert by_q.get(int(ids[qi]), set()) == want


def test_range_search_plan_has_no_shuffle(corpus):
    """The whole point vs top-k: scan → project → filter, zero
    exchanges."""
    plan = S.range_search(corpus, [1.0] * 64, 0.5)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_range_join_matmul_plan_has_no_shuffle(queries, corpus):
    plan = (
        S.range_join(queries, corpus, 0.25)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_ivf_range_search_subset_precision_and_full_probe(corpus, np_corpus):
    """IVF-pruned radius search: (a) results ⊆ exact (precision 1 — a
    returned row is truly in range), (b) probing EVERY cell recovers
    the exact result, (c) scores match the exact path bit-for-bit on
    the shared rows (same fold)."""
    ids, X = np_corpus
    q = list(X[0])
    t = 0.25
    cents = [(int(ids[i]), list(X[i])) for i in range(4)]
    exact = {r.vec_id: r.score for r in S.range_search(corpus, q, t).collect()}
    pruned = {r.vec_id: r.score for r in S.ivf_range_search(corpus, q, t, cents, nprobe=2).collect()}
    assert set(pruned) <= set(exact)
    for vid, s in pruned.items():
        assert s == exact[vid]
    full = {r.vec_id for r in S.ivf_range_search(corpus, q, t, cents, nprobe=4).collect()}
    assert full == set(exact)

