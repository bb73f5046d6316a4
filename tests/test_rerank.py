"""MMR diversity rerank: λ=1 degenerates to relevance order; λ<1
breaks up near-duplicate shortlists; selection is deterministic."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
    rerank as R,
)
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.search import (
    topk,
)


def test_mmr_lambda_one_is_relevance_order(tables):
    corpus = tables["embeddings"].select("vec_id", "embedding")
    q = corpus.filter(F.col("vec_id") == 0).first().embedding
    plain = [r.vec_id for r in topk(corpus, q, k=5).collect()]
    mmr = R.mmr_topk(corpus, q, k=5, shortlist=20, lam=1.0).orderBy("rank").collect()
    assert [r.vec_id for r in mmr] == plain


def test_mmr_diversifies_duplicate_corpus(spark):
    """Corpus = 3 copies of vector A (ids 0-2), one vector B (id 3),
    query ≈ A. Plain top-3 is the three A-copies; MMR with λ=0.5 must
    pull in B by rank 3 because the 2nd A-copy's max-sim penalty (=1)
    dominates its relevance edge."""
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.001]),
        (2, [0.999, 0.001, 0.0]),
        (3, [0.0, 1.0, 0.0]),
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = [1.0, 0.05, 0.0]
    plain = [r.vec_id for r in topk(corpus, q, k=3).collect()]
    assert 3 not in plain
    mmr = R.mmr_topk(corpus, q, k=3, shortlist=4, lam=0.5).orderBy("rank").collect()
    assert 3 in [r.vec_id for r in mmr]
    # rank 1 is always the raw-relevance argmax
    assert mmr[0].vec_id == plain[0]


def test_mmr_select_deterministic_and_bounded():
    rng = np.random.default_rng(11)
    V = rng.standard_normal((30, 8))
    ids = list(range(30))
    scores = sorted(rng.random(30).tolist(), reverse=True)
    a = R.mmr_select(ids, scores, V, k=10, lam=0.3)
    b = R.mmr_select(ids, scores, V, k=10, lam=0.3)
    assert a == b
    assert len(a) == 10
    assert [r[2] for r in a] == list(range(1, 11))
    # k > n clamps
    assert len(R.mmr_select(ids[:4], scores[:4], V[:4], k=10)) == 4
    assert R.mmr_select([], [], np.empty((0, 8)), k=5) == []

