"""Diversity rerank: maximal marginal relevance (MMR) over a top-k
shortlist.

The reference returns the raw score order (coordinator/main.py:85-86);
real retrieval stacks usually rerank the shortlist — RAG context slots
are wasted on near-duplicate chunks (exactly what the dedup operators
show the corpus contains). MMR (Carbonell & Goldstein, SIGIR'98)
greedily picks the candidate maximizing

    λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)

Physical shape: the *candidate generation* is the distributed part
(exact top-C via ``search.topk``, or any ANN/PQ path); the greedy
selection is inherently sequential in k and runs on the C-row
shortlist at the driver — C is a user constant (default 100, ≤ a few
thousand), so this is a deliberate driver-side step on an
already-reduced result, the same place the reference's coordinator
merge runs. Nothing distributed ever iterates.

At 100 TB: C stays constant while the corpus scan underneath scales —
the MMR stage's cost is O(C²·dim) floats at the driver, unchanged.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.search import (
    topk,
)

__all__ = ["mmr_select", "mmr_topk"]


def mmr_select(
    ids: list,
    scores: list[float],
    vectors: np.ndarray,
    k: int,
    lam: float = 0.5,
) -> list[tuple[object, float, int]]:
    """Greedy MMR over an in-memory shortlist. Returns
    ``[(id, mmr_score, rank)]`` with rank 1..k. Deterministic: ties on
    the MMR objective break toward the earlier shortlist position
    (higher relevance, then lower id — inherited from the candidate
    frame's ordering).

    ``vectors`` rows are L2-normalized here so ``sim`` is cosine no
    matter which metric produced the relevance scores.
    """
    n = len(ids)
    if n == 0 or k <= 0:
        return []
    norms = np.linalg.norm(vectors, axis=1, keepdims=True)
    V = vectors / np.where(norms == 0.0, 1e-12, norms)
    rel = np.asarray(scores, dtype=np.float64)
    k = min(k, n)

    selected: list[int] = []
    # max cosine to any already-selected item, per candidate
    max_sim = np.full(n, -np.inf)
    out: list[tuple[object, float, int]] = []
    for rank in range(1, k + 1):
        if not selected:
            objective = rel.copy()
        else:
            objective = lam * rel - (1.0 - lam) * max_sim
        objective[selected] = -np.inf
        pick = int(np.argmax(objective))  # argmax takes the FIRST max → deterministic
        out.append((ids[pick], float(objective[pick]), rank))
        selected.append(pick)
        sims = V @ V[pick]
        max_sim = np.maximum(max_sim, sims)
    return out


def mmr_topk(
    corpus: DataFrame,
    query_vec,
    k: int = 10,
    shortlist: int = 100,
    lam: float = 0.5,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Diverse top-k: exact top-``shortlist`` candidates (distributed,
    TakeOrderedAndProject — the flagship search plan), then greedy MMR
    down to ``k`` at the driver.

    ``lam=1`` degenerates to plain relevance order (= ``topk``), the
    property the tests pin; lower ``lam`` trades relevance for
    diversity. Returns ``(id, mmr_score, rank)`` ordered by rank.
    """
    cand = topk(
        corpus, query_vec, k=shortlist, metric=metric, id_col=id_col, vec_col=vec_col
    )
    # join the shortlist's vectors back (k rows — broadcast)
    with_vec = cand.join(
        F.broadcast(corpus.select(id_col, vec_col)), on=id_col, how="inner"
    ).orderBy(F.desc("score"), F.asc(id_col))
    rows = with_vec.collect()
    ids = [r[id_col] for r in rows]
    scores = [r["score"] for r in rows]
    vecs = np.asarray([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    picked = mmr_select(ids, scores, vecs, k=k, lam=lam)
    spark = corpus.sparkSession
    id_type = dict(corpus.dtypes)[id_col]
    return spark.createDataFrame(
        picked, schema=f"{id_col} {id_type}, mmr_score double, rank int"
    )
