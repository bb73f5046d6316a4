"""Dimensionality reduction for embedding columns: deterministic
sign random projection (Johnson–Lindenstrauss) and a distributed PCA
trainer — the compression tier BEFORE the quantizers (pq/sq/bq): fewer
dimensions means proportionally fewer bytes scanned per distance, and
the projected column composes with every search operator in
operators/search.py unchanged.

Reference parity note: the reference engine (flat scan over fixed-dim
vectors, SURVEY.md §1) has no dim-reduction surface; this belongs to
the mandated large-scale-pipeline extensions next to pq/sq/bq.

Scale design:

* **Sign projection** is a pure per-row projection — no training, no
  state, no shuffle. The ±1 matrix is DERIVED from a hash (md5 parity,
  the repo's portable-hash idiom), so every engine — and the DuckDB
  oracle — reproduces it bit-for-bit from the (in_dim, out_dim) pair
  alone; nothing is stored or broadcast. The projection is an
  Arrow-batched left-to-right fold (see rp_embed's docstring for why
  the unrolled-expression form, though codegen-friendly on paper,
  falls off the JIT cliff at 1024 terms).
* **PCA** splits exactly like distributed k-means: executors reduce
  each partition to a (D×D gram, D sum, count) triple via Arrow
  batches (`mapInPandas` — one numpy matmul per batch), the driver
  sums the tiny partials and eigendecomposes the D×D covariance
  (D=64 → 32 KB), and projection is again a per-row expression over
  centred inputs. The corpus never leaves the executors; driver state
  is O(D²) regardless of row count.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = [
    "sign_matrix",
    "project_expr",
    "rp_embed",
    "rp_project_point",
    "pca_fit",
    "pca_project",
    "rp_knn_join",
]


def sign_matrix(in_dim: int, out_dim: int) -> list[list[float]]:
    """Deterministic ±1 projection matrix ``signs[j][d]`` from md5
    parity of the flat index ``j·in_dim + d`` — the same portable-hash
    trick as :func:`functions.text.portable_token_hash`, so the DuckDB
    oracle (and any other engine) can re-derive the identical matrix
    with no artifact exchange."""
    out = []
    for j in range(out_dim):
        row = []
        for d in range(in_dim):
            h = int(hashlib.md5(str(j * in_dim + d).encode()).hexdigest()[:15], 16)
            row.append(1.0 if h % 2 == 0 else -1.0)
        out.append(row)
    return out


def project_expr(vec: Column, signs: list[list[float]], scale: float) -> Column:
    """``array<double>`` projection of ``vec`` by a ±1 matrix: each
    output dim is a left-to-right signed sum of the inputs times
    ``scale``. Unrolled adds — no HOF, whole-stage-codegen friendly,
    and the evaluation order is exactly mirrorable in SQL."""
    cols = []
    for row in signs:
        e = None
        for d, s in enumerate(row):
            term = vec[d].cast("double")
            term = term if s > 0 else -term
            e = term if e is None else e + term
        cols.append(e * F.lit(float(scale)))
    return F.array(*cols)


def rp_embed(
    df: DataFrame,
    out_dim: int = 16,
    in_dim: int = 64,
    vec_col: str = "embedding",
    out_col: str = "rp",
) -> DataFrame:
    """Attach the sign-random-projection of ``vec_col`` as
    ``out_col``. Scaled by 1/√out_dim so squared norms are preserved
    in expectation (JL); cosine ranking is scale-invariant anyway.

    Computed by an Arrow-batched pandas UDF that folds the ±columns
    STRICTLY left-to-right (d = 0..in_dim−1, each input cast to double
    first), so every output double is bit-identical to
    :func:`project_expr` / :func:`rp_project_point` and the DuckDB
    oracle — the UDF is a perf substitution only. Why not the unrolled
    expression: 16×64 = 1024 terms generate a method past HotSpot's
    huge-method JIT limit, so the whole projection runs in the
    bytecode interpreter — measured 6.2 s per 100k-row corpus pass vs
    ~0.5 s for the Arrow fold (the round-8 rp_knn_join probe finding;
    same class of lesson as the round-7 HOF re-tokenization)."""
    signs = sign_matrix(in_dim, out_dim)
    scale = 1.0 / math.sqrt(out_dim)

    @pandas_udf("array<double>")
    def _proj(v: pd.Series) -> pd.Series:
        m = np.stack(v.values).astype(np.float64)  # per-element cast first
        outs = []
        for row in signs:
            acc = (m[:, 0] if row[0] > 0 else -m[:, 0]).copy()
            for d in range(1, in_dim):
                acc = acc + (m[:, d] if row[d] > 0 else -m[:, d])
            outs.append(acc * scale)
        z = np.stack(outs, axis=1)
        return pd.Series(list(z))

    return df.withColumn(out_col, _proj(F.col(vec_col)))


def rp_project_point(vec, out_dim: int = 16) -> list[float]:
    """Python mirror of :func:`rp_embed` for a single query vector —
    same signs, same left-to-right summation order, so a projected
    query scores against a projected corpus without engine drift."""
    in_dim = len(vec)
    signs = sign_matrix(in_dim, out_dim)
    scale = 1.0 / math.sqrt(out_dim)
    out = []
    for row in signs:
        acc = None
        for d, s in enumerate(row):
            t = float(vec[d]) if s > 0 else -float(vec[d])
            acc = t if acc is None else acc + t
        out.append(acc * scale)
    return out


def pca_fit(
    df: DataFrame, k: int, vec_col: str = "embedding", in_dim: int = 64
) -> tuple[list[float], list[list[float]], list[float]]:
    """Distributed PCA: returns ``(mean, components, explained_var)``
    with ``components`` the top-``k`` eigenvectors (rows) of the
    covariance, eigenvalue-descending, sign-canonicalized (first
    nonzero coordinate positive) so the fit is deterministic.

    One pass: every Arrow batch reduces to ``(XᵀX, Σx, n)`` — a
    D×D+D+1 partial — summed per partition and again on the driver
    (O(D²) driver state, never O(rows)); the eigendecomposition of the
    64×64 covariance is numpy on the driver, same driver-only-k×D
    contract as clustering.kmeans_fit."""
    schema = "gram array<double>, s array<double>, n long"

    def partial(batches):
        import pandas as pd

        G = np.zeros((in_dim, in_dim))
        s = np.zeros(in_dim)
        n = 0
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            G += X.T @ X
            s += X.sum(axis=0)
            n += X.shape[0]
        yield pd.DataFrame(
            {"gram": [G.ravel().tolist()], "s": [s.tolist()], "n": [n]}
        )

    parts = df.select(vec_col).mapInPandas(partial, schema=schema).collect()
    G = np.zeros((in_dim, in_dim))
    s = np.zeros(in_dim)
    n = 0
    for r in parts:
        G += np.asarray(r.gram).reshape(in_dim, in_dim)
        s += np.asarray(r.s)
        n += r.n
    if n == 0:
        raise ValueError("pca_fit on an empty frame")
    mean = s / n
    cov = G / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = []
    for i in order:
        v = vecs[:, i]
        nz = np.nonzero(np.abs(v) > 1e-12)[0]
        if len(nz) and v[nz[0]] < 0:
            v = -v
        comps.append([float(x) for x in v])
    return (
        [float(x) for x in mean],
        comps,
        [float(vals[i]) for i in order],
    )


def pca_project(
    df: DataFrame,
    mean: list[float],
    components: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project onto trained components: ``y_j = Σ_d c_jd·(x_d − μ_d)``
    as an unrolled per-row expression (literals ride the plan — no
    join, no shuffle, codegen-friendly)."""
    cols = []
    for row in components:
        e = None
        for d, c in enumerate(row):
            term = (F.col(vec_col)[d].cast("double") - F.lit(float(mean[d]))) * F.lit(
                float(c)
            )
            e = term if e is None else e + term
        cols.append(e)
    return df.withColumn(out_col, F.array(*cols))


def rp_knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    shortlist: int = 50,
    out_dim: int = 16,
    in_dim: int = 64,
    query_id: str = "qid",
    query_vec: str = "embedding",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage batch retrieval through the JL tier: shortlist every
    query's ``shortlist`` nearest neighbors in the PROJECTED space
    (out_dim/in_dim of the bytes and multiply-adds per candidate),
    then exact-rerank only the shortlist in full dimension — the
    compressed-domain analogue of pq/sq/bq's shortlist+rerank, with
    zero training and zero stored artifact.

    Recall < 1 by design (the projection can demote a true neighbor
    past the shortlist cut); widen ``shortlist`` to trade scan savings
    for recall, and measure with :func:`search.recall_at_k`. The
    rerank joins candidate ids back to the full-dim corpus (id
    equi-join — candidates only, never the corpus² cross) with the
    query vectors broadcast. Returns ``(qid, neighbor_id, score,
    rank)`` like :func:`search.knn_join`.
    """
    from pyspark.sql import Window

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.functions import (
        vector as V,
    )
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.search import (
        knn_join,
    )

    # the corpus projection is FUSED into knn_join's single scoring
    # pass (corpus_transform seam): raw vectors project per Arrow batch
    # right before the matmul, instead of a prior rp_embed job pushing
    # projected vectors through a second Arrow transfer — measured
    # 3.8 s → ~2.5 s at the 100k probe. The numpy fold below is the
    # same left-to-right order as rp_embed, so shortlist membership is
    # identical to the unfused two-job form.
    signs = sign_matrix(in_dim, out_dim)
    scale = 1.0 / math.sqrt(out_dim)

    def _project_batch(x):
        x = x.astype(np.float64, copy=False)
        outs = []
        for row in signs:
            acc = (x[:, 0] if row[0] > 0 else -x[:, 0]).copy()
            for d in range(1, in_dim):
                acc = acc + (x[:, d] if row[d] > 0 else -x[:, d])
            outs.append(acc * scale)
        return np.stack(outs, axis=1)

    qp = rp_embed(
        queries.select(query_id, query_vec), out_dim=out_dim, in_dim=in_dim,
        vec_col=query_vec, out_col="rp",
    )
    short = knn_join(
        qp.select(query_id, F.col("rp").alias("__rq")),
        corpus.select(id_col, vec_col),
        k=shortlist,
        query_id=query_id,
        query_vec="__rq",
        id_col=id_col,
        vec_col=vec_col,
        corpus_transform=_project_batch,
    )
    full = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    qfull = queries.select(
        F.col(query_id).alias("qid"), F.col(query_vec).alias("__qv")
    )
    rer = (
        short.select("qid", "neighbor_id")
        .join(full, "neighbor_id")
        .join(F.broadcast(qfull), "qid")
        .select(
            "qid",
            "neighbor_id",
            V.score(F.col("__cv"), F.col("__qv"), "cosine").alias("score"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        rer.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "neighbor_id", "score", "rank")
    )
