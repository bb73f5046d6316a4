"""Product quantization (PQ): compressed-domain ANN scoring.

The reference scores full float32 vectors on every query (its flat
index streams the whole N×D matrix per search, shard/fallback_
numpy_index.py:22-28).  At 100 TB of embeddings that scan is the cost
that dominates everything else, and the classic fix (Jégou et al.,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011) is to
scan *codes* instead of vectors:

* split each D-dim vector into ``m`` contiguous subvectors;
* quantize every subvector to its nearest centroid from a per-subspace
  codebook of ``ksub`` entries (``ksub ≤ 256`` → one byte per
  subspace);
* at query time build a lookup table ``LUT[j][c] = <q_j, C[j][c]>``
  (m·ksub dot products — microscopic) and score a vector as
  ``Σ_j LUT[j][code_j]`` — the *asymmetric distance computation* (ADC).

Storage drops from ``4·D`` bytes to ``m`` bytes per vector (32× at
D=64, m=8) and the per-row score is ``m`` table lookups instead of a
D-term dot product.  On a 1000-executor cluster the codes table for a
100 TB corpus is ~3 TB — small enough to keep hot — and the exact
vectors are touched only to rerank the handful of ADC survivors.

Spark-first shape:

* **encode** is a pure Column expression (argmin over ``ksub`` struct
  comparisons per subspace) — JVM codegen, no Python, and a DuckDB
  oracle can mirror it term for term;
* **ADC top-k** is ``aggregate(sequence(0,m-1), …)`` over the code
  array against a broadcast LUT literal → ``TakeOrderedAndProject``,
  identical physical shape to the exact `search.topk`;
* **rerank** joins the ADC survivors (tiny) back to the full vectors —
  a broadcast equi-join, never a second corpus scan.

All arithmetic is double-precision sequential folds, matching
``functions.vector`` and the DuckDB mirrors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.functions import vector as V
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.search import topk

__all__ = [
    "codebooks_from_rows",
    "train_pq_codebooks",
    "pq_encode",
    "pq_encode_expr",
    "adc_lut",
    "adc_lut_expr",
    "adc_score_fn",
    "pq_adc_topk",
    "pq_rerank_topk",
    "write_pq_index",
    "pq_topk_indexed",
    "write_ivfpq_index",
    "ivfpq_topk_indexed",
    "train_opq",
    "opq_rotate",
    "residual_codebooks",
    "ivfpq_residual_topk",
]


def codebooks_from_rows(rows, m: int) -> list[list[list[float]]]:
    """Codebooks whose subspace-``j`` centroids are the ``j``-th slices
    of the given vectors: ``C[j][c] = rows[c][j·dsub : (j+1)·dsub]``.

    The deterministic, oracle-expressible trainer (same trick as the
    contract's IVF centroids = the first ``n`` corpus rows): any SQL
    engine can rebuild the identical codebooks from the corpus itself.
    Production training belongs to :func:`train_pq_codebooks`.
    """
    ksub = len(rows)
    d = len(rows[0])
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    return [
        [[float(rows[c][j * dsub + t]) for t in range(dsub)] for c in range(ksub)]
        for j in range(m)
    ]


def train_pq_codebooks(
    df: DataFrame,
    m: int,
    ksub: int = 256,
    vec_col: str = "embedding",
    sample_fraction: float = 0.1,
    n_iter: int = 10,
    seed: int = 13,
) -> list[list[list[float]]]:
    """Production codebooks: independent k-means per subspace on a
    driver-side sample (standard PQ training — codebooks come from a
    ≤1e5-row sample, never a full-table pass; encoding then runs
    distributed).  Deterministic via seed."""
    rows = (
        df.select(vec_col)
        .sample(fraction=min(1.0, sample_fraction), seed=seed)
        .limit(100_000)
        .collect()
    )
    X = np.asarray([r[0] for r in rows], dtype=np.float64)
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.default_rng(seed)
    books: list[list[list[float]]] = []
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        C = S[rng.choice(len(S), size=min(ksub, len(S)), replace=False)].copy()
        for _ in range(n_iter):
            dist = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = dist.argmin(axis=1)
            for c in range(len(C)):
                members = S[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books.append([[round(float(v), 6) for v in c] for c in C])
    return books


def _sub_l2sq(vec: Column, j: int, dsub: int, centroid: list[float]) -> Column:
    """Squared L2 between subspace ``j`` of ``vec`` and a centroid —
    the same sequential double fold as ``functions.vector.l2sq``."""
    sub = F.slice(vec, j * dsub + 1, dsub)
    return V.l2sq(sub, V.vec_lit(centroid))


def pq_encode_expr(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    code_col: str = "code",
) -> DataFrame:
    """Pure-expression encode: per subspace, ``array_min`` over ``ksub``
    ``struct(dist, idx)`` terms — struct comparison is lexicographic,
    giving argmin-with-tie-break natively, and the whole thing mirrors
    the DuckDB oracle term for term.

    The m·ksub distance folds make a LARGE expression tree (128 terms
    at m=8, ksub=16) that Catalyst executes slowly; this form exists as
    the semantic specification and for small codebooks — the production
    path is :func:`pq_encode` (vectorized, same values, asserted equal
    in tests/test_pq.py).
    """
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    vec = F.col(vec_col)
    code_terms = []
    for j in range(m):
        candidates = F.array(
            *[
                F.struct(
                    _sub_l2sq(vec, j, dsub, codebooks[j][c]).alias("d"),
                    F.lit(c).alias("c"),
                )
                for c in range(len(codebooks[j]))
            ]
        )
        code_terms.append(F.array_min(candidates)["c"])
    return df.select(F.col(id_col), F.array(*code_terms).alias(code_col))


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    code_col: str = "code",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """``(id, code)`` where ``code[j]`` is the index of the nearest
    subspace-``j`` centroid (ties → lowest index: numpy ``argmin``
    keeps the first minimum, the same rule as the expression form and
    the SQL oracle).

    Vectorized Arrow-batched encode — one ``(n, m, ksub)`` distance
    tensor per batch, the idiomatic analogue of the reference's batch
    CUDA kernel (flat_kernels.cu:4-45) and the same physical shape as
    ``search.knn_join``.  Map-only: no shuffle, the encode rides the
    corpus scan.  Distances are float64 elementwise ``(x-c)²`` sums
    over ``dsub`` elements, bit-matching the sequential fold both the
    expression form and DuckDB compute (asserted in tests/test_pq.py).
    """
    import pandas as pd

    m = len(codebooks)
    dsub = len(codebooks[0][0])
    C = np.asarray(codebooks, dtype=np.float64)  # m × ksub × dsub
    keep = list(keep_cols or [])
    keep_types = {c: t for c, t in df.dtypes if c in keep}

    def encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray([list(v) for v in pdf[vec_col]], dtype=np.float64)
            Xs = X.reshape(len(X), m, dsub)
            d = ((Xs[:, :, None, :] - C[None, :, :, :]) ** 2).sum(axis=-1)
            codes = d.argmin(axis=-1).astype(np.int32)
            out = {id_col: pdf[id_col], code_col: list(codes)}
            for c in keep:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    schema = f"{id_col} long, {code_col} array<int>"
    for c in keep:
        schema += f", {c} {keep_types[c]}"
    return df.select(id_col, vec_col, *keep).mapInPandas(encode, schema=schema)


def adc_lut(codebooks: list[list[list[float]]], query_vec) -> list[list[float]]:
    """``LUT[j][c] = <q_j, C[j][c]>`` as plain Python doubles — the
    same sequential fold both engines use, so a SQL oracle recomputing
    the LUT from the corpus gets bit-identical values."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    q = [float(x) for x in query_vec]
    lut: list[list[float]] = []
    for j in range(m):
        qj = q[j * dsub : (j + 1) * dsub]
        row = []
        for cent in codebooks[j]:
            s = 0.0
            for x, y in zip(qj, cent):
                s += float(x) * float(y)
            row.append(s)
        lut.append(row)
    return lut


def adc_lut_expr(vec_col, codebooks: list[list[list[float]]]) -> Column:
    """Per-ROW ADC lookup table as a column: ``LUT[j][c] = <v_j,
    C[j][c]>`` over the row's vector — the batched form of
    :func:`adc_lut` (which folds one driver-side query).  The
    codebooks ride in as literals; each of the m·ksub cells is the
    same ascending-i sequential fold ``Σ_i v[j·dsub+i]·C[j][c][i]``
    as the driver version, so a SQL mirror recomputing the LUT
    per-query gets bit-identical doubles.  Used by the graph-PQ
    serving tier to give every query row its own LUT in one
    whole-stage-codegen projection (no join, no Python)."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col

    def _cell(j: int, cent: list[float]) -> Column:
        cent_lit = F.array(*[F.lit(float(x)) for x in cent])
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(dsub - 1)),
            F.lit(0.0),
            lambda acc, i: acc
            + v[F.lit(j * dsub) + i].cast("double") * F.element_at(cent_lit, i + 1),
        )

    return F.array(
        *[F.array(*[_cell(j, cent) for cent in codebooks[j]]) for j in range(m)]
    )


def adc_score_fn(m: int):
    """Score callable ``(lut_col, code_col) → Σ_j LUT[j][code_j]`` for
    :func:`..graph_ann.graph_beam_search`'s pluggable-metric seam —
    the same 1-based ``element_at`` fold as :func:`pq_adc_topk`, but
    reading the LUT from the query side of the join instead of a
    literal."""

    def _fn(lut_col, code_col) -> Column:
        lut = F.col(lut_col) if isinstance(lut_col, str) else lut_col
        code = F.col(code_col) if isinstance(code_col, str) else code_col
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(m - 1)),
            F.lit(0.0),
            lambda acc, j: acc
            + F.element_at(F.element_at(lut, j + 1), code[j] + 1),
        )

    return _fn


def pq_adc_topk(
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "code",
) -> DataFrame:
    """Compressed-domain top-k: score every code row as
    ``Σ_j LUT[j][code_j]`` (inner-product ADC) and take the global
    top-k.

    The LUT rides into the plan as a literal (m·ksub doubles — bytes,
    not a broadcast join), the fold is ``aggregate`` over
    ``sequence(0, m-1)`` so whole-stage codegen keeps the scan
    Python-free, and ORDER BY+LIMIT compiles to TakeOrderedAndProject
    exactly like the exact path.  The scan it replaces read 4·D bytes
    per row; this one reads m bytes.
    """
    lut = adc_lut(codebooks, query_vec)
    lut_col = F.array(*[F.array(*[F.lit(v) for v in row]) for row in lut])
    m = len(codebooks)
    code = F.col(code_col)
    score = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(F.element_at(lut_col, j + 1), code[j] + 1),
    )
    scored = codes.select(F.col(id_col), score.alias("score"))
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def pq_rerank_topk(
    codes: DataFrame,
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec,
    k: int = 10,
    rerank: int = 50,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC shortlist → exact rerank: take the top ``rerank`` candidates
    in the compressed domain, join back to the full vectors
    (broadcast — the shortlist is ≤ rerank rows), score exactly, keep
    the top ``k``.

    This is the production read path at scale: the 100 TB vector table
    is touched only through an id equi-join on ~50 rows; the scan that
    ranks the whole corpus ran over the ~3 TB codes table.  Recall is
    ≥ plain ADC by construction (exact ordering over an ADC candidate
    superset — asserted in tests/test_pq.py).
    """
    shortlist = pq_adc_topk(
        codes, codebooks, query_vec, k=rerank, id_col=id_col
    ).select(id_col)
    candidates = corpus.join(F.broadcast(shortlist), id_col)
    return topk(candidates, query_vec, k=k, metric=metric, id_col=id_col, vec_col=vec_col)


# -- materialized codes table ------------------------------------------------

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.ann_index import (  # noqa: E402
    _read_meta,
    _write_meta,
)


def write_pq_index(
    df: DataFrame,
    path: str,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    mode: str = "overwrite",
) -> None:
    """Persist the codes table + codebook sidecar.  Appends are
    incremental (new vectors encode against the frozen codebooks and
    land as new files); the codebooks travel with the index via the
    same Spark-written sidecar as the LSH/IVF indexes, so hdfs:///s3://
    paths work."""
    pq_encode(df, codebooks, vec_col=vec_col, id_col=id_col).write.mode(mode).parquet(path)
    _write_meta(df.sparkSession, path, {"kind": "pq", "codebooks": codebooks, "vec_col": vec_col})


def write_ivfpq_index(
    df: DataFrame,
    path: str,
    centroids: list[tuple[int, list[float]]],
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    mode: str = "overwrite",
) -> None:
    """IVF-PQ (IVFADC, Jégou et al. 2011 §V): the codes table
    partitioned by coarse-quantizer cell. The two classic index ideas
    compose orthogonally —

    * the coarse quantizer (IVF cell = nearest centroid) becomes a
      *partition column*, so a query's ``nprobe`` cells prune to
      ~nprobe/n_cells of the files before any scan;
    * inside the probed cells the scan reads ``m``-byte PQ codes, not
      4·D-byte vectors.

    At 100 TB that stacks a ~n_cells/nprobe read reduction on PQ's 32×
    byte reduction — the standard billion-scale serving layout. Same
    Spark-written sidecar as every other index, so hdfs:///s3:// work.
    """
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.search import (
        ivf_assign,
    )

    assigned = ivf_assign(df, centroids, id_col=id_col, vec_col=vec_col)
    codes = pq_encode(
        assigned, codebooks, vec_col=vec_col, id_col=id_col, keep_cols=["ivf_cell"]
    )
    codes.repartition("ivf_cell").write.mode(mode).partitionBy("ivf_cell").parquet(path)
    _write_meta(
        df.sparkSession,
        path,
        {
            "kind": "ivfpq",
            "centroids": [[int(c), list(map(float, v))] for c, v in centroids],
            "codebooks": codebooks,
            "vec_col": vec_col,
        },
    )


def ivfpq_topk_indexed(
    spark: SparkSession,
    path: str,
    query_vec,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    rerank_corpus: DataFrame | None = None,
    rerank: int = 50,
    metric: str = "cosine",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k over a materialized IVF-PQ index: nearest ``nprobe`` cells
    by centroid distance (driver-side — n_cells is small by design),
    partition-pruned read of those cells' PQ codes, ADC scoring, and an
    optional exact rerank against ``rerank_corpus`` (broadcast id-join
    of the ≤``rerank``-row shortlist — the full-width table is never
    scanned)."""
    meta = _read_meta(spark, path)
    centroids = [(int(c), list(v)) for c, v in meta["centroids"]]
    codebooks = meta["codebooks"]
    q = np.asarray(query_vec, dtype=np.float64)
    order = sorted(
        centroids, key=lambda c: (float(((q - np.asarray(c[1])) ** 2).sum()), c[0])
    )
    probe = [int(cid) for cid, _ in order[:nprobe]]
    codes = spark.read.parquet(path).filter(F.col("ivf_cell").isin(probe))
    if rerank_corpus is None:
        return pq_adc_topk(codes, codebooks, query_vec, k=k, id_col=id_col)
    shortlist = pq_adc_topk(
        codes, codebooks, query_vec, k=rerank, id_col=id_col
    ).select(id_col)
    candidates = rerank_corpus.join(F.broadcast(shortlist), id_col)
    return topk(candidates, query_vec, k=k, metric=metric, id_col=id_col, vec_col=vec_col)


def pq_topk_indexed(
    spark: SparkSession,
    path: str,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    rerank_corpus: DataFrame | None = None,
    rerank: int = 50,
    metric: str = "cosine",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k over a materialized PQ codes table: ADC scan of the codes
    (m bytes/row), optional exact rerank against ``rerank_corpus``."""
    meta = _read_meta(spark, path)
    codebooks = meta["codebooks"]
    codes = spark.read.parquet(path)
    if rerank_corpus is None:
        return pq_adc_topk(codes, codebooks, query_vec, k=k, id_col=id_col)
    return pq_rerank_topk(
        codes,
        rerank_corpus,
        codebooks,
        query_vec,
        k=k,
        rerank=rerank,
        metric=metric,
        id_col=id_col,
        vec_col=vec_col,
    )


# ---------------------------------------------------------------------------
# OPQ: optimized product quantization (Ge et al., CVPR 2013 / TPAMI 2014)
# ---------------------------------------------------------------------------


def _kmeans_subspaces(Y: np.ndarray, m: int, ksub: int, n_iter: int, rng) -> list:
    """Seeded per-subspace k-means on a driver-side sample (the
    train_pq_codebooks inner loop, shared by the OPQ alternation)."""
    d = Y.shape[1]
    dsub = d // m
    books = []
    for j in range(m):
        S = Y[:, j * dsub : (j + 1) * dsub]
        C = S[rng.choice(len(S), size=min(ksub, len(S)), replace=False)].copy()
        for _ in range(n_iter):
            dist = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = dist.argmin(axis=1)
            for c in range(len(C)):
                members = S[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books.append(C)
    return books


def _reconstruct(Y: np.ndarray, books: list) -> np.ndarray:
    """Nearest-centroid reconstruction per subspace (the quantizer the
    OPQ objective measures against)."""
    m = len(books)
    dsub = Y.shape[1] // m
    out = np.empty_like(Y)
    for j, C in enumerate(books):
        S = Y[:, j * dsub : (j + 1) * dsub]
        assign = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
        out[:, j * dsub : (j + 1) * dsub] = C[assign]
    return out


def train_opq(
    df: DataFrame,
    m: int,
    ksub: int = 256,
    vec_col: str = "embedding",
    sample_fraction: float = 0.1,
    n_iter: int = 8,
    kmeans_iter: int = 4,
    seed: int = 13,
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """Non-parametric OPQ (Ge et al.): learn an orthogonal rotation R
    and codebooks minimizing ‖R·x − q(R·x)‖² by alternation —

    - init: PCA basis with greedy EIGENVALUE ALLOCATION (each
      eigenvector, eigenvalue-descending, goes to the unfilled
      subspace with the smallest variance product — the paper's
      balanced-information start, built from the same Gram/covariance
      partials pca_fit uses);
    - repeat: per-subspace k-means in the rotated space → nearest-
      centroid reconstruction X̂ → orthogonal Procrustes update
      (SVD of XᵀX̂ = U·S·Vᵀ gives R = V·Uᵀ, the closed-form optimal
      rotation against the current quantizer).

    Training is the standard driver-side ≤1e5-row sample (the
    train_pq_codebooks contract — codebooks/rotation are KBs; encoding
    then runs distributed via :func:`opq_rotate` + pq_encode). The
    improvement shows exactly when raw subspaces carry unbalanced
    variance mass (measured at d=32/m=4/ksub=32 on axis-aligned
    geometric decay: distortion 0.66× of plain PQ, Euclidean
    recall@10 350 vs 239 over 100 queries). Two measured null results
    worth knowing: on an already-BALANCED basis (randomly mixed or
    isotropic data) plain PQ sits at the optimum and no rotation
    helps — the repo's synthetic embeddings are isotropic (per-dim
    variance 0.014–0.018, mean |corr| 0.036), so the operator stays
    pytest-gated rather than oracle-paired (an SQL mirror would also
    need SVD, which no SQL engine runs); and the PARAMETRIC shortcut
    (eigenvalue-allocated PCA without alternation) misfires on steep
    spectra at small ksub — the log-variance-product criterion
    balances products while k-means distortion tracks sums (measured:
    per-subspace error 3162/415/57/7, recall 217 vs plain PQ's 434 on
    the mixed corpus) — so the alternation is load-bearing, not a
    refinement.

    Returns ``(R, codebooks)`` — R as a row-major list (y = R·x),
    codebooks in the :func:`pq_encode` format.
    """
    rows = (
        df.select(vec_col)
        .sample(fraction=min(1.0, sample_fraction), seed=seed)
        .limit(100_000)
        .collect()
    )
    X = np.asarray([r[0] for r in rows], dtype=np.float64)
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    cov = np.cov(X.T)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1]
    # greedy eigenvalue allocation: balance per-subspace variance
    # products (log-sums) across the m buckets
    buckets: list[list[int]] = [[] for _ in range(m)]
    logsum = [0.0] * m
    for i in order:
        open_b = [b for b in range(m) if len(buckets[b]) < dsub]
        b = min(open_b, key=lambda bb: (logsum[bb], bb))
        buckets[b].append(i)
        logsum[b] += float(np.log(max(vals[i], 1e-12)))
    R = np.vstack([vecs[:, i] for b in buckets for i in b])  # rows: y = R x
    rng = np.random.default_rng(seed)
    books: list = []
    for _ in range(n_iter):
        Y = X @ R.T
        books = _kmeans_subspaces(Y, m, ksub, kmeans_iter, rng)
        Yhat = _reconstruct(Y, books)
        U, _s, Vt = np.linalg.svd(X.T @ Yhat)
        R = (U @ Vt).T
    # final codebooks against the final rotation
    Y = X @ R.T
    books = _kmeans_subspaces(Y, m, ksub, kmeans_iter, rng)
    return (
        [[float(x) for x in row] for row in R],
        [[[round(float(v), 6) for v in c] for c in C] for C in books],
    )


def opq_rotate(
    df: DataFrame,
    R: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "opq",
) -> DataFrame:
    """Apply the trained OPQ rotation (y = R·x) as an Arrow-batched
    pandas UDF — a D×D unrolled expression would be D² terms and run
    interpreted past HotSpot's huge-method JIT limit (the rp_embed
    lesson); one numpy matmul per Arrow batch keeps the corpus pass
    vectorized. The rotation matrix rides the closure (KBs); no join,
    no shuffle."""
    from pyspark.sql.functions import pandas_udf

    Rb = np.asarray(R, dtype=np.float64)

    @pandas_udf("array<double>")
    def _rot(v: pd.Series) -> pd.Series:
        M = np.stack(v.values).astype(np.float64)
        return pd.Series(list(M @ Rb.T))

    return df.withColumn(out_col, _rot(F.col(vec_col)))


# ---------------------------------------------------------------------------
# residual IVF-PQ (true IVFADC — Jégou et al. 2011 §V.B)
# ---------------------------------------------------------------------------


def _centroid_map(centroids: list) -> Column:
    """cell → centroid array as a literal map (n_cells · D literals —
    KBs; rides the plan, no join)."""
    pairs: list[Column] = []
    for cid, cv in centroids:
        pairs.append(F.lit(int(cid)))
        pairs.append(F.array(*[F.lit(float(x)) for x in cv]))
    return F.create_map(*pairs)


def residual_expr(vec: Column, cell: Column, centroids: list) -> Column:
    """``x − c(cell)`` elementwise, each input cast to double first —
    the residual the true IVFADC quantizes. Pure zip_with projection."""
    carr = F.element_at(_centroid_map(centroids), cell)
    return F.zip_with(vec, carr, lambda x, y: x.cast("double") - y)


def residual_codebooks(
    df: DataFrame,
    centroids: list,
    m: int,
    ksub: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Deterministic residual-domain codebooks: the subspace slices of
    the first ``ksub`` corpus rows' RESIDUALS (cell assignment via the
    oracle-proven ``ivf_assign`` arithmetic) — the residual analogue of
    ``codebooks_from_rows``'s first-n trick, so any SQL engine rebuilds
    identical codebooks from the corpus itself."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.search import (
        ivf_assign,
    )

    head = ivf_assign(
        df.filter(F.col(id_col) < ksub), centroids, id_col=id_col, vec_col=vec_col
    )
    rows = (
        head.select(
            id_col,
            residual_expr(F.col(vec_col), F.col("ivf_cell"), centroids).alias("res"),
        )
        .orderBy(id_col)
        .collect()
    )
    return codebooks_from_rows([r.res for r in rows], m)


def ivfpq_residual_topk(
    df: DataFrame,
    centroids: list,
    codebooks: list[list[list[float]]],
    query_vec,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """True IVFADC: PQ quantizes the RESIDUAL ``x − c(cell)`` instead
    of the raw vector, and the inner-product score decomposes exactly
    as ``⟨q,x⟩ = ⟨q,c⟩ + ⟨q,res⟩`` — the per-cell constant ⟨q,c⟩ is
    computed once on the driver (n_cells doubles) and the ADC LUT
    approximates ⟨q,res⟩. When the coarse cells capture
    cluster structure, residuals are the small within-cluster offsets
    and the same code budget quantizes decisively finer (measured:
    reconstruction error 0.41× of raw-vector PQ on clustered data,
    tests/test_pq.py); with arbitrary untrained anchors on isotropic
    data the residual is NOT smaller and the two paths tie to noise —
    measured too, so the claim here is IVFADC's exact score
    decomposition, with the quality win conditional on trained
    cells. Same scale shape as the raw path:
    probed-cell pruning, then an m-byte ADC scan; the residual is a
    zip_with projection, no extra shuffle."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.search import (
        ivf_assign,
    )

    probe = sorted(
        ((_seq_l2sq(query_vec, cv), cid) for cid, cv in centroids)
    )[:nprobe]
    probed = [cid for _d, cid in probe]
    qdotc = {cid: _seq_dot(query_vec, dict(centroids)[cid]) for cid in probed}
    assigned = ivf_assign(df, centroids, id_col=id_col, vec_col=vec_col).filter(
        F.col("ivf_cell").isin(probed)
    )
    res = assigned.select(
        id_col,
        "ivf_cell",
        residual_expr(F.col(vec_col), F.col("ivf_cell"), centroids).alias("__res"),
    )
    codes = pq_encode(res, codebooks, vec_col="__res", id_col=id_col,
                      keep_cols=["ivf_cell"])
    lut = adc_lut(codebooks, query_vec)
    lut_col = F.array(*[F.array(*[F.lit(v) for v in row]) for row in lut])
    m = len(codebooks)
    code = F.col("code")
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc + F.element_at(F.element_at(lut_col, j + 1), code[j] + 1),
    )
    const = F.element_at(
        F.create_map(*[F.lit(x) for cid in probed for x in (cid, qdotc[cid])]),
        F.col("ivf_cell"),
    )
    return (
        codes.select(F.col(id_col), (const + adc).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def _seq_dot(a, b) -> float:
    s = 0.0
    for x, y in zip(a, b):
        s += float(x) * float(y)
    return s


def _seq_l2sq(a, b) -> float:
    s = 0.0
    for x, y in zip(a, b):
        d = float(x) - float(y)
        s += d * d
    return s
