"""Exact and approximate top-k vector search, Spark-first.

Reference read path (SURVEY.md §3.1): coordinator fans a query out to
every shard (coordinator/main.py:58-73), each shard scores its dense
matrix and returns a local top-k (shard/server.py:70-84), the
coordinator merges partials with a bounded heap (coordinator/main.py:75-86).

Spark mapping: shards are partitions; fan-out is task parallelism;
"local top-k then merge" is exactly Catalyst's ``TakeOrderedAndProject``
(per-partition bounded priority queue + driver merge), so the flagship
single-query search is a plain ``ORDER BY score DESC LIMIT k`` — no
hand-built coordinator needed. For *batch* kNN (a query table instead of
one query) we add the one bespoke physical shape Spark lacks: a
per-partition local-top-k prune inside ``mapInPandas`` (vectorized numpy
matmul per Arrow batch — the idiomatic analogue of the reference's CUDA
batch kernel flat_kernels.cu:4-45) before a cheap global window, so the
shuffle carries O(parts·|Q|·k) rows instead of O(|Q|·N).

Scale notes (100 TB): the single-query path scans partitions in
parallel and ships ≤k rows per partition to the driver. The batch path
broadcasts the query matrix (must be the small side), prunes locally,
and shuffles only survivors; for |Q| too big to broadcast, chunk the
query table and union the results.  Ties always break by id so results
are deterministic and engine-independent.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.functions import vector as V

__all__ = [
    "topk",
    "mmr_topk",
    "mmr_knn_join",
    "sharded_topk",
    "collection_topk",
    "knn_join",
    "knn_join_expr",
    "knn_join_grouped",
    "knn_classify",
    "range_search",
    "range_join",
    "ivf_range_search",
    "lsh_bucket",
    "random_hyperplanes",
    "lsh_probe_buckets",
    "lsh_topk",
    "ivf_assign",
    "ivf_topk",
    "recall_at_k",
    "ranking_metrics",
    "mrl_topk",
    "mutual_knn",
    "nn_descent",
]


def topk(
    corpus: DataFrame,
    query_vec,
    k: int = 10,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Single-query exact top-k — the reference's ``POST /search``
    (coordinator/main.py:58-86 + shard/server.py:70-84) as one Catalyst
    plan.

    Compiles to ``TakeOrderedAndProject``: every partition computes a
    bounded top-k during its scan (the shard's heap, flat_index.hpp:39-53)
    and the driver merges (the coordinator's heap, main.py:77-84). Score
    is higher-is-better for both metrics; k is clamped by LIMIT
    semantics (reference O12); empty corpus → empty result (O11).

    ``keep_cols`` carries payload columns through the top-k heap
    (k rows hold them, the heap compares only (score, id)) — the
    reference returns payloads with its hits the same way
    (shard/server.py returns ids+scores, coordinator re-attaches); for
    small payloads this fuses the O17 join-back away entirely (r13
    optimization, see rag.rag_context).
    """
    # collision guard (r14, ADVICE): keep_cols listing id_col (already
    # projected) or a column named 'score' (the output score column)
    # would produce ambiguous duplicates at plan time — reject with a
    # readable error instead
    bad = {c for c in (keep_cols or []) if c == id_col or c == "score"}
    if bad:
        raise ValueError(
            f"keep_cols may not include the id column or 'score': {sorted(bad)}"
        )
    q = V.vec_lit(query_vec)
    scored = corpus.select(
        F.col(id_col),
        *[F.col(c) for c in (keep_cols or [])],
        V.score(F.col(vec_col), q, metric).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def sharded_topk(
    corpus: DataFrame,
    query_vec,
    k: int = 10,
    n_shards: int = 8,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    shard_expr: Column | None = None,
) -> DataFrame:
    """Explicit shard-local top-k → global merge, proving the
    coordinator property (merge of per-shard top-k == global top-k).

    Reproduces the reference topology explicitly: O1 hash placement
    (coordinator/main.py:43-45), O7 per-shard top-k (shard/server.py:79),
    O9 global merge (coordinator/main.py:75-86). ``shard_expr`` defaults
    to ``pmod(id, n_shards)`` (deterministic & oracle-mirrorable; use
    ``pmod(xxhash64(id), n)`` in production ingest — see
    ``ingest.assign_shard``).
    """
    shard = shard_expr if shard_expr is not None else F.pmod(F.col(id_col), F.lit(n_shards))
    q = V.vec_lit(query_vec)
    scored = corpus.select(
        F.col(id_col),
        shard.cast("int").alias("shard"),
        V.score(F.col(vec_col), q, metric).alias("score"),
    )
    w = Window.partitionBy("shard").orderBy(F.desc("score"), F.asc(id_col))
    local = scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)
    return (
        local.select(id_col, "shard", "score")
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def topk_per_group(
    corpus: DataFrame,
    query_vec,
    group_col: str,
    k: int = 10,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group exact top-k — namespace/tenant-scoped search (every
    group gets its own result list from ONE corpus scan).

    A window rank per group instead of G separate topk() calls: Spark's
    WindowGroupLimit pushes the k-limit into each partition before the
    shuffle, so the exchange carries O(parts·G·k) rows. At scale,
    partition the table by the group column and the shuffle disappears
    entirely (group-local windows).

    Returns ``(group, id, score, rank)`` with rank 1..k per group.
    """
    q = V.vec_lit(query_vec)
    scored = corpus.select(
        F.col(group_col),
        F.col(id_col),
        V.score(F.col(vec_col), q, metric).alias("score"),
    )
    w = Window.partitionBy(group_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(group_col, id_col, "score", "rank")
    )


def collection_topk(
    spark,
    path: str,
    query_vec,
    k: int = 10,
    metric: str = "cosine",
    shard: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k over a durable sharded collection (ingest.write_collection
    layout: parquet partitioned by ``shard``).

    ``shard=None`` queries the whole collection — the coordinator's
    broadcast fan-out (main.py:58-73), realized as a parallel scan of
    all shard directories. ``shard=s`` queries ONE shard — the
    reference's per-shard endpoint (shard/server.py:70-84) — and the
    shard filter is a PARTITION filter: only that directory's files
    are opened (plan-asserted in tests).
    """
    corpus = spark.read.parquet(path)
    if shard is not None:
        corpus = corpus.filter(F.col("shard") == shard)
    return topk(corpus, query_vec, k=k, metric=metric, id_col=id_col, vec_col=vec_col)


def _normalize_rows(X: np.ndarray) -> np.ndarray:
    # ε only for exactly-zero norms (functions.vector.l2_normalize rule;
    # clamping tiny-but-nonzero norms would diverge from the expression
    # path's cosine for sub-ε vectors — caught by hypothesis)
    n = np.linalg.norm(X, axis=1, keepdims=True)
    return X / np.where(n == 0.0, 1e-12, n)


#: knn_join collects the query side to the driver in chunks of this
#: size; chunk results are unioned. Bounds driver memory at any |Q|.
KNN_JOIN_QUERY_CHUNK = 4096


#: query rows per corpus scan: bounds executor broadcast memory
#: (rows·dim·8 bytes); at dim 384 the default is ~800 MB per scan.
KNN_JOIN_MAX_BROADCAST_ROWS = 262_144


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    metric: str = "cosine",
    query_id: str = "qid",
    query_vec: str = "embedding",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_chunk: int = KNN_JOIN_QUERY_CHUNK,
    max_broadcast_rows: int = KNN_JOIN_MAX_BROADCAST_ROWS,
    corpus_transform=None,
    _depth: int = 0,
) -> DataFrame:
    """Batch kNN similarity join: for every query row, the exact top-k
    corpus neighbors. Generalizes the reference's one-query search to a
    query *table* (SURVEY.md X1).

    Physical shape: the query matrix is pulled to the driver in ONE
    Arrow transfer (``toPandas`` — the driver must hold the full
    matrix regardless, to broadcast it; a per-partition
    ``toLocalIterator`` costs one sequential job round-trip per
    partition, measured 1.9 s vs 0.04 s at 32 partitions), split into
    ``query_chunk``-row chunks, and shipped to executors ONCE via a
    Spark broadcast; a
    single ``mapInPandas`` over the corpus scores every chunk against
    each corpus Arrow batch with one float64 numpy matmul per chunk
    (the vectorized analogue of the reference's per-block CUDA kernel,
    flat_kernels.cu:4-24) and prunes to the per-batch top-k **per
    query** before any shuffle. The corpus is scanned exactly once for
    any |Q| — the plan has ONE scan node (plan-asserted in
    tests/test_plans.py) — and the global stage windows over
    O(parts·|Q|·k) survivors instead of O(|Q|·N) pairs. Chunking
    bounds the per-batch score matrix at |chunk|×B regardless of |Q|.

    The local prune keeps every row whose score ties the k-th *largest*
    per-batch score, so the global window's deterministic tie-break
    (score desc, id asc) gives exactly the same set as an unpruned
    cross join — this is the coordinator merge property, per batch.

    Scale bounds: the broadcast holds the full normalized query matrix
    (|Q|·dim·8 bytes — ~3 GB at |Q|=1e6, dim=384). When |Q| exceeds
    ``max_broadcast_rows``, the query table is carved into disjoint
    splits by a hash filter on the query id and the scan runs once per
    split (corpus scans = |Q|/max_broadcast_rows, NOT |Q|/query_chunk
    — the budget, not the matmul tile, decides scan count); the driver
    materializes ONE split at a time, so driver memory is bounded by
    the budget for any |Q|. Per-qid results are independent, so the
    split union is exact.

    ``corpus_transform`` (optional, picklable ``(n,d) ndarray →
    (n,d') ndarray``): applied to each corpus batch INSIDE the scoring
    pass — the seam the projected-tier search uses to fuse its
    dimensionality reduction into the single corpus scan (the query
    side must already be in the transformed space).

    Returns columns ``(qid, neighbor_id, score, rank)``.
    """
    qid_type = dict(queries.dtypes)[query_id]
    id_type = dict(corpus.dtypes)[id_col]
    out_schema = f"qid {qid_type}, neighbor_id {id_type}, score double"
    corpus_slim = corpus.select(id_col, vec_col)
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("neighbor_id"))

    # budget check BEFORE any driver materialization: a count is a
    # metadata-cheap job, and over-budget splits are carved by a hash
    # filter on the query id — each recursion toPandas()-es only its
    # own bounded split, so the driver never holds more than one
    # budget's worth of vectors no matter how large |Q| grows (the old
    # shape pulled the WHOLE query frame first and sliced in pandas —
    # a 100×-scale batch OOMed the driver before the split could help).
    # The frame is persisted first so the count materializes it ONCE:
    # a DERIVED query frame (the output of a filter/join) would
    # otherwise recompute its whole plan for the count AND the
    # toPandas — and once more per split filter (r7 verdict item #2).
    # Safe to drop as soon as the vectors live in driver chunks /
    # split recursions have run: the output plan references only the
    # broadcast chunks and the corpus scan, never `queries`.
    # Only persist (and later unpersist) when the CALLER hadn't: persist
    # on an already-cached frame is a no-op but unpersist is not, so an
    # unconditional pair would evict the caller's cache as a side effect.
    _we_cached = _depth == 0 and not queries.is_cached
    if _we_cached:
        queries = queries.persist()
    n_q = queries.count()
    if n_q > max_broadcast_rows and _depth < 4:
        # 10% headroom absorbs hash-split unevenness; per-qid results
        # are independent, so the union over disjoint splits is exact.
        # _depth caps re-splitting: a split still over budget re-splits
        # with a new modulus, but a single qid duplicated past the
        # budget can never be separated by an id hash — after 4 levels
        # fall through to the direct path rather than loop forever.
        n_splits = -(-n_q * 10 // (9 * max_broadcast_rows))
        out = None
        for i in range(n_splits):
            split = queries.filter(
                F.pmod(F.xxhash64(F.col(query_id)), F.lit(n_splits)) == i
            )
            part = knn_join(
                split, corpus, k=k, metric=metric, query_id=query_id,
                query_vec=query_vec, id_col=id_col, vec_col=vec_col,
                query_chunk=query_chunk, max_broadcast_rows=max_broadcast_rows,
                corpus_transform=corpus_transform, _depth=_depth + 1,
            )
            out = part if out is None else out.unionByName(part)
        # every split's vectors are already in driver-side broadcast
        # chunks (the recursion's toPandas ran eagerly in the loop)
        if _we_cached:
            queries.unpersist()
        return out

    # chunk list: [(qids, Qs, q_sq)] — normalization/norms precomputed
    # once on the driver, not per corpus batch; ONE Arrow transfer
    # (a per-partition toLocalIterator costs one sequential job
    # round-trip per partition: measured 1.9 s vs 0.04 s at 32 parts)
    qpdf = queries.select(query_id, query_vec).toPandas()
    if _we_cached:
        queries.unpersist()  # vectors now live in driver memory
    chunks: list[tuple[list, np.ndarray, np.ndarray]] = []
    for lo in range(0, len(qpdf), query_chunk):
        part = qpdf.iloc[lo : lo + query_chunk]
        Q = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in part[query_vec]]
        )
        Qs = _normalize_rows(Q) if metric == "cosine" else Q
        chunks.append((part[query_id].tolist(), Qs, (Qs * Qs).sum(axis=1)))

    if not chunks:
        empty = "qid long, neighbor_id long, score double, rank int"
        return queries.sparkSession.createDataFrame([], empty)

    bc = corpus_slim.sparkSession.sparkContext.broadcast(chunks)

    def score_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            if corpus_transform is not None:
                # fused projection: the compressed-tier transform runs
                # HERE, inside the one corpus pass, instead of a prior
                # projection job shipping projected vectors through a
                # second Arrow transfer (round-8 rp_knn_join fusion)
                X = corpus_transform(X)
            ids = pdf[id_col].to_numpy()
            if metric == "cosine":
                Xc = _normalize_rows(X)
                x_sq = None
            else:
                Xc = X
                x_sq = (X * X).sum(axis=1)
            for c_qids, Qs, q_sq in bc.value:
                if metric == "cosine":
                    S = Qs @ Xc.T  # |chunk| x B
                else:
                    S = 2.0 * (Qs @ Xc.T) - q_sq[:, None] - x_sq[None, :]
                kk = min(k, S.shape[1])
                # kth *largest* score per query (index B-kk after an
                # ascending partition); keep >= so ties survive and the
                # global deterministic tie-break stays exact.
                thresh = np.partition(S, S.shape[1] - kk, axis=1)[:, S.shape[1] - kk]
                out_q, out_i, out_s = [], [], []
                for qi in range(S.shape[0]):
                    keep = np.nonzero(S[qi] >= thresh[qi])[0]
                    out_q.extend([c_qids[qi]] * len(keep))
                    out_i.extend(ids[keep])
                    out_s.extend(S[qi, keep])
                yield pd.DataFrame({"qid": out_q, "neighbor_id": out_i, "score": out_s})

    pruned = corpus_slim.mapInPandas(score_partition, schema=out_schema)
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "neighbor_id", "score", "rank")
    )


def knn_join_grouped(
    queries: DataFrame,
    corpus: DataFrame,
    group_col: str,
    k: int = 10,
    metric: str = "cosine",
    query_id: str = "qid",
    query_vec: str = "qvec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Namespace-scoped batch kNN: each query row searches ONLY the
    corpus rows sharing its ``group_col`` (tenant / collection /
    language) — the multi-tenant form of the batch similarity join.

    The group key is an EQUI-join condition, so the physical plan is a
    hash join on the key (broadcast when the query side is small), and
    the scored pair count is Σ_g |Q_g|·|C_g| instead of |Q|·N — the
    join itself does the namespace pruning. The per-query window then
    ranks within (qid) as usual. At scale, partition the corpus by the
    group column: the join co-locates and the window's shuffle
    disappears into it.

    Returns ``(group, qid, neighbor_id, score, rank)``.
    """
    q = queries.select(
        F.col(group_col).alias("__g"),
        F.col(query_id).alias("qid"),
        F.col(query_vec).alias("__qvec"),
    )
    c = corpus.select(
        F.col(group_col).alias("__g"),
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
    )
    scored = c.join(F.broadcast(q), "__g").select(
        F.col("__g").alias(group_col),
        "qid",
        "neighbor_id",
        V.score(F.col("__cvec"), F.col("__qvec"), metric).alias("score"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(group_col, "qid", "neighbor_id", "score", "rank")
    )


def knn_join_expr(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    metric: str = "cosine",
    query_id: str = "qid",
    query_vec: str = "qvec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Pure-expression batch kNN: broadcast cross join → higher-order-
    function scoring → per-query window. No Python workers at all —
    everything whole-stage-codegen — but shuffles O(|Q|·N) scored pairs,
    so prefer :func:`knn_join` once |Q|·N is large. Kept as the
    declarative baseline the optimizer can see through, and for oracle
    parity.
    """
    q = queries.select(
        F.col(query_id).alias("qid"), F.col(query_vec).alias("__qvec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec"))
    scored = c.join(F.broadcast(q)).select(
        "qid",
        "neighbor_id",
        V.score(F.col("__cvec"), F.col("__qvec"), metric).alias("score"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "neighbor_id", "score", "rank")
    )


def knn_classify(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    metric: str = "cosine",
    weighted: bool = False,
    label_col: str = "label",
    query_id: str = "qid",
    query_vec: str = "embedding",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """kNN classification — label each query by majority vote of its k
    nearest corpus neighbors (the classic similarity-search application;
    ``weighted=True`` votes by summed similarity instead of count).

    Shape for scale: neighbors come from :func:`knn_join` (one corpus
    scan, local prune), producing a |Q|·k frame; that SMALL frame is
    broadcast back onto the corpus for the label lookup, so the corpus
    never shuffles. The vote aggregation then groups |Q|·k rows by
    (qid, label) — partial-aggregated, trivially small.

    Tie-break is fully deterministic: vote count desc, summed score
    desc, label asc. Returns ``(qid, pred_label, votes, vote_score)``.

    NULL-labeled corpus rows are excluded from voting: they carry no
    class information, and letting them through would both form a
    phantom NULL vote group and win ties (Spark sorts NULLs first under
    ``asc``), predicting ``pred_label = NULL``.
    """
    nn = knn_join(
        queries, corpus, k=k, metric=metric, query_id=query_id,
        query_vec=query_vec, id_col=id_col, vec_col=vec_col,
    )
    labels = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(label_col)).filter(
        F.col(label_col).isNotNull()
    )
    labeled = labels.join(F.broadcast(nn), "neighbor_id")
    votes = labeled.groupBy("qid", label_col).agg(
        F.count("*").alias("votes"),
        F.sum("score").alias("vote_score"),
    )
    order = (
        [F.desc("vote_score"), F.desc("votes")]
        if weighted
        else [F.desc("votes"), F.desc("vote_score")]
    )
    w = Window.partitionBy("qid").orderBy(*order, F.asc(label_col))
    return (
        votes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "qid",
            F.col(label_col).alias("pred_label"),
            "votes",
            "vote_score",
        )
    )


def _range_cutoff(threshold: float, metric: str) -> float:
    """Metric-native threshold → internal higher-is-better score cutoff.

    ``cosine``: keep similarity >= threshold (Faiss IP/cosine
    range-search orientation).  ``l2``: threshold is a EUCLIDEAN
    RADIUS — keep distance <= threshold, i.e. the neg-l2sq score
    >= -threshold² (the engine's score orientation, reference
    coordinator/main.py:75)."""
    if metric == "cosine":
        return float(threshold)
    if threshold < 0:
        raise ValueError(f"l2 radius must be >= 0, got {threshold}")
    return -float(threshold) * float(threshold)


def range_search(
    corpus: DataFrame,
    query_vec,
    threshold: float,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Single-query radius search: EVERY corpus row within the
    metric-native threshold of the query (Faiss ``range_search`` /
    Milvus radius search — the reference's top-k read path
    (shard/server.py:70-84) with the bounded heap replaced by a
    predicate, SURVEY.md §2.2's "range variant" gap).

    ``threshold`` is metric-native: cosine similarity >= threshold, or
    Euclidean distance <= threshold for ``metric='l2'`` (the returned
    ``score`` column stays higher-is-better neg-l2sq, like every other
    search operator, so rerankers compose unchanged).

    Physical shape — STRICTLY cheaper than top-k: one corpus scan with
    a codegen'd score-and-filter; no window, no TakeOrdered heap, no
    shuffle AT ALL (the plan is scan → project → filter).  At 100 TB
    the result size is data-dependent (selectivity · N), which is the
    caller's contract: a radius search that matches everything
    produces everything.  Empty corpus / nothing-in-range → empty
    frame (reference O11 semantics).
    """
    q = V.vec_lit(query_vec)
    cutoff = _range_cutoff(threshold, metric)
    return corpus.select(
        F.col(id_col),
        V.score(F.col(vec_col), q, metric).alias("score"),
    ).filter(F.col("score") >= cutoff)


def range_join(
    queries: DataFrame,
    corpus: DataFrame,
    threshold: float,
    metric: str = "cosine",
    query_id: str = "qid",
    query_vec: str = "qvec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_matmul: bool = True,
    query_chunk: int = KNN_JOIN_QUERY_CHUNK,
    max_broadcast_rows: int = KNN_JOIN_MAX_BROADCAST_ROWS,
    _depth: int = 0,
) -> DataFrame:
    """Batch radius join: for every query row, ALL corpus rows within
    the metric-native ``threshold`` (see :func:`range_search`) — the
    set-returning sibling of :func:`knn_join` (SURVEY.md X1), e.g.
    "every document whose embedding is within cosine 0.8 of any
    flagged query" for policy sweeps and near-dup radius audits.

    Physical shape (``use_matmul=True``): the query matrix broadcasts
    in :func:`knn_join`'s chunked form, one ``mapInPandas`` corpus scan
    scores each Arrow batch with a float64 matmul and emits ONLY the
    pairs passing the cutoff — and that is the WHOLE plan.  No window,
    no rank, no shuffle: unlike kNN there is no cross-partition
    interaction (the predicate is per-pair), so the output goes
    straight from the scan to the consumer.  Over-budget query batches
    hash-split exactly like knn_join (disjoint qid splits; the union
    is exact; driver holds one split's vectors at a time).

    ``use_matmul=False`` is the pure-expression form (broadcast join +
    the sequential-fold score + filter): all whole-stage-codegen,
    bit-identical to the DuckDB mirror's fold — the oracle-parity path
    (the graph-tier scoring precedent), and the boundary-safe one when
    a score sits within an ulp of the cutoff.

    Returns ``(qid, neighbor_id, score)``.
    """
    cutoff = _range_cutoff(threshold, metric)
    if not use_matmul:
        q = queries.select(F.col(query_id).alias("qid"), F.col(query_vec).alias("__qvec"))
        c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec"))
        return (
            c.join(F.broadcast(q))
            .select(
                "qid",
                "neighbor_id",
                V.score(F.col("__cvec"), F.col("__qvec"), metric).alias("score"),
            )
            .filter(F.col("score") >= cutoff)
        )

    qid_type = dict(queries.dtypes)[query_id]
    id_type = dict(corpus.dtypes)[id_col]
    out_schema = f"qid {qid_type}, neighbor_id {id_type}, score double"
    corpus_slim = corpus.select(id_col, vec_col)

    # same driver-memory discipline as knn_join: count first (cheap),
    # carve over-budget batches into disjoint xxhash64 splits, and
    # materialize ONE split's vectors at a time.  Per-pair results are
    # independent, so the split union is exact.
    _we_cached = _depth == 0 and not queries.is_cached
    if _we_cached:
        queries = queries.persist()
    n_q = queries.count()
    if n_q > max_broadcast_rows and _depth < 4:
        n_splits = -(-n_q * 10 // (9 * max_broadcast_rows))
        out = None
        for i in range(n_splits):
            split = queries.filter(
                F.pmod(F.xxhash64(F.col(query_id)), F.lit(n_splits)) == i
            )
            part = range_join(
                split, corpus, threshold, metric=metric, query_id=query_id,
                query_vec=query_vec, id_col=id_col, vec_col=vec_col,
                use_matmul=True, query_chunk=query_chunk,
                max_broadcast_rows=max_broadcast_rows, _depth=_depth + 1,
            )
            out = part if out is None else out.unionByName(part)
        if _we_cached:
            queries.unpersist()
        return out

    qpdf = queries.select(query_id, query_vec).toPandas()
    if _we_cached:
        queries.unpersist()
    chunks: list[tuple[list, np.ndarray, np.ndarray]] = []
    for lo in range(0, len(qpdf), query_chunk):
        part = qpdf.iloc[lo : lo + query_chunk]
        Q = np.asarray([np.asarray(v, dtype=np.float64) for v in part[query_vec]])
        Qs = _normalize_rows(Q) if metric == "cosine" else Q
        chunks.append((part[query_id].tolist(), Qs, (Qs * Qs).sum(axis=1)))

    if not chunks:
        return queries.sparkSession.createDataFrame([], out_schema)

    bc = corpus_slim.sparkSession.sparkContext.broadcast(chunks)

    def score_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            ids = pdf[id_col].to_numpy()
            if metric == "cosine":
                Xc = _normalize_rows(X)
                x_sq = None
            else:
                Xc = X
                x_sq = (X * X).sum(axis=1)
            for c_qids, Qs, q_sq in bc.value:
                if metric == "cosine":
                    S = Qs @ Xc.T  # |chunk| x B
                else:
                    S = 2.0 * (Qs @ Xc.T) - q_sq[:, None] - x_sq[None, :]
                qi, ci = np.nonzero(S >= cutoff)
                if len(qi) == 0:
                    continue
                qarr = np.asarray(c_qids)
                yield pd.DataFrame(
                    {"qid": qarr[qi], "neighbor_id": ids[ci], "score": S[qi, ci]}
                )

    return corpus_slim.mapInPandas(score_partition, schema=out_schema)


# ---------------------------------------------------------------------------
# Approximate search: random-hyperplane LSH and IVF (fixed centroids)
# ---------------------------------------------------------------------------


def random_hyperplanes(n_planes: int, dim: int, seed: int = 7) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for sign-LSH (SimHash for
    dense vectors). Seeded so Spark and the SQL oracle share the exact
    same literals."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def lsh_bucket(vec_col: Column | str, planes: list[list[float]]) -> Column:
    """Bucket id = integer of sign bits of ⟨x, plane_j⟩ — random
    hyperplane LSH. Pure expression, codegen'd, oracle-mirrorable."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bucket = F.lit(0).cast("long")
    for j, p in enumerate(planes):
        bit = (V.dot(c, V.vec_lit(p)) > 0).cast("long")
        bucket = bucket + bit * F.lit(1 << j).cast("long")
    return bucket


def lsh_probe_buckets(
    query_vec, planes: list[list[float]], n_probe_buckets: int = 1
) -> list[int]:
    """Multi-probe LSH bucket order, weakest margin first.

    The query's own bucket, then single-bit flips ordered by ascending
    |⟨q, plane_j⟩| — the hyperplanes the query is *closest* to are the
    ones whose sign bit is most likely wrong for its true neighbors, so
    flipping them first maximizes recall per probed bucket (multi-probe
    LSH, Lv et al. VLDB'07). When more probes are requested than
    planes+1, the remaining flip masks follow ordered by total flipped
    margin (requesting all 2^planes buckets degrades gracefully to the
    exact search).

    Dot products are sequential double folds (not numpy) so the bucket
    bits match the engine-side ``lsh_bucket`` expression arithmetic
    exactly, even for near-zero dots.
    """
    dots: list[float] = []
    qbucket = 0
    for j, p in enumerate(planes):
        s = 0.0
        for x, y in zip(query_vec, p):
            s += float(x) * float(y)
        dots.append(s)
        if s > 0:
            qbucket |= 1 << j
    singles = sorted(range(len(planes)), key=lambda j: (abs(dots[j]), j))
    probes = [qbucket] + [qbucket ^ (1 << j) for j in singles]
    if n_probe_buckets > len(probes):
        # deep-probe tail (rare: caller wants a large share of all
        # 2^planes buckets): every remaining flip mask by margin sum
        seen = set(probes)
        masked = sorted(
            (sum(abs(dots[j]) for j in range(len(planes)) if (m >> j) & 1), m)
            for m in range(1, 1 << len(planes))
        )
        for _, m in masked:
            b = qbucket ^ m
            if b not in seen:
                seen.add(b)
                probes.append(b)
    return probes[:n_probe_buckets]


def lsh_topk(
    corpus: DataFrame,
    query_vec,
    planes: list[list[float]],
    k: int = 10,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe_buckets: int = 1,
) -> DataFrame:
    """ANN: score only the corpus rows in the query's LSH bucket(s),
    then exact top-k rerank inside. ``n_probe_buckets > 1`` probes
    extra buckets in weakest-margin order (:func:`lsh_probe_buckets`)
    for higher recall at proportionally higher read cost.

    At scale the bucket column is materialized at ingest and the table
    is partitioned by it, so this becomes a partition-pruned scan
    (filter on bucket reaches the parquet reader) — the candidate set
    read from disk is ~n_probe·N/2^planes instead of N.
    """
    probes = lsh_probe_buckets(query_vec, planes, n_probe_buckets)
    bucket = lsh_bucket(vec_col, planes)
    cond = bucket == F.lit(probes[0]) if len(probes) == 1 else bucket.isin(probes)
    candidates = corpus.filter(cond)
    return topk(candidates, query_vec, k=k, metric=metric, id_col=id_col, vec_col=vec_col)


def ivf_assign(
    corpus: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF list assignment: each vector → nearest centroid (min L2²,
    ties to lowest centroid id). Centroids are given (e.g. sampled or
    trained offline); pure expression via an array of centroid
    distances + ``array_position(min)``.

    At 100 TB: write the corpus partitioned/bucketed by ``ivf_cell`` so
    probe queries prune partitions.
    """
    dists = F.array(
        *[
            F.struct(
                V.l2sq(F.col(vec_col), V.vec_lit(cv)).alias("d"),
                F.lit(int(cid)).alias("cid"),
            )
            for cid, cv in centroids
        ]
    )
    best = F.array_min(dists)
    return corpus.withColumn("ivf_cell", best["cid"])


def ivf_topk(
    corpus: DataFrame,
    query_vec,
    centroids: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 2,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: probe the ``nprobe`` nearest centroids' cells, exact
    rerank within. Recall < 1 by design; measure with
    :func:`recall_at_k`."""
    q = np.asarray(query_vec, dtype=np.float64)
    order = sorted(
        centroids, key=lambda c: (float(((q - np.asarray(c[1])) ** 2).sum()), c[0])
    )
    probe = [int(cid) for cid, _ in order[:nprobe]]
    assigned = ivf_assign(corpus, centroids, id_col=id_col, vec_col=vec_col)
    candidates = assigned.filter(F.col("ivf_cell").isin(probe))
    return topk(candidates, query_vec, k=k, metric=metric, id_col=id_col, vec_col=vec_col)


def ivf_range_search(
    corpus: DataFrame,
    query_vec,
    threshold: float,
    centroids: list[tuple[int, list[float]]],
    nprobe: int = 2,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-pruned radius search — the 100 TB shape of
    :func:`range_search`: scan only the ``nprobe`` nearest cells
    instead of the whole corpus (with the corpus written partitioned
    by ``ivf_cell``, unprobed cells prune at the SCAN, the
    ivf_topk_indexed PartitionFilters story).  Approximate BY DESIGN:
    an in-range row living in an unprobed cell is missed — quantify
    with the range_recall entry (found/true set ratio, the set-level
    analogue of recall@k); every returned row IS truly in range
    (candidates ⊆ corpus under the same predicate), so precision is 1
    by construction."""
    q = np.asarray(query_vec, dtype=np.float64)
    order = sorted(
        centroids, key=lambda c: (float(((q - np.asarray(c[1])) ** 2).sum()), c[0])
    )
    probe = [int(cid) for cid, _ in order[:nprobe]]
    assigned = ivf_assign(corpus, centroids, id_col=id_col, vec_col=vec_col)
    candidates = assigned.filter(F.col("ivf_cell").isin(probe))
    return range_search(
        candidates, query_vec, threshold, metric=metric, id_col=id_col, vec_col=vec_col
    )


def more_like_these(
    corpus: DataFrame,
    seed_ids: list,
    k: int = 10,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Seed-set expansion ("more like these"): nearest neighbors of the
    CENTROID of a handful of example rows, seeds excluded — the
    relevance-feedback / topic-harvest primitive (grow a labeled pool
    from a few curated examples).

    Fully distributed: the centroid is a 1-row per-dim avg aggregate
    broadcast back (never collected to Python), scoring is the same
    projection as :func:`topk`, and the cut is TakeOrderedAndProject.
    One scan feeds both the centroid and the scored side at 100 TB —
    or pass a cheap cached seeds frame since the seed filter is pushed
    to the scan. Returns ``(id, score)``, score-desc, id-asc ties.
    """
    ids = [int(i) for i in seed_ids]
    cent = (
        corpus.filter(F.col(id_col).isin(ids))
        .agg(F.array(*[F.avg(F.col(vec_col)[d]) for d in range(dim)]).alias("__c"))
    )
    scored = (
        corpus.filter(~F.col(id_col).isin(ids))
        .crossJoin(F.broadcast(cent))
        .select(
            F.col(id_col),
            V.score(F.col(vec_col), F.col("__c"), metric).alias("score"),
        )
    )
    # no seed matched → NULL centroid → NULL scores: return empty, not
    # k arbitrary rows with NULL score
    return (
        scored.filter(F.col("score").isNotNull())
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def recall_at_k(
    exact: DataFrame,
    approx: DataFrame,
    k: int,
    by: list[str] | None = None,
    fill_missing: bool = False,
) -> DataFrame:
    """recall@k of an approximate result vs the exact one (SURVEY.md X7):
    |approx ∩ exact| / k, grouped by query id when ``by`` is given
    (expects both frames to carry ``qid``/``neighbor_id``; for
    single-query results pass the id column name).

    CAVEAT the inner join implies: a query with ZERO hits produces NO
    row, so averaging the returned ``recall`` column silently drops
    exactly the worst queries (measured bite: single-cluster entry
    points on a clustered corpus looked like 0.88 when 3/4 of the
    queries were unanswerable — tests/test_graph_ann.py medoid test).
    Pass ``fill_missing=True`` to emit recall 0.0 for every qid in the
    EXACT frame absent from the hits (grouped mode only).  The default
    stays False: the oracle mirrors share the inner-join shape."""
    keys = by or ["neighbor_id"]
    hit = approx.select(*keys).join(exact.select(*keys), on=keys, how="inner")
    group = [c for c in keys if c == "qid"]
    if group:
        per = hit.groupBy(*group).agg((F.count("*") / F.lit(k)).alias("recall"))
        if fill_missing:
            allq = exact.select(*group).distinct()
            per = allq.join(per, on=group, how="left").select(
                *group, F.coalesce(F.col("recall"), F.lit(0.0)).alias("recall")
            )
        return per
    return hit.agg((F.count("*") / F.lit(k)).alias("recall"))


def ranking_metrics(
    exact: DataFrame,
    approx: DataFrame,
    k: int,
    qid_col: str = "qid",
    id_col: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query ranking quality of an approximate retrieval vs the
    exact reference (the standard IR pair next to recall@k):

    * **nDCG@k** — binary relevance (membership in the exact top-k),
      DCG = Σ_hits 1/log2(rank+1) over the approx list, normalized by
      the ideal DCG for ``k`` relevant items (a compile-time constant:
      the exact list always carries k rows per query);
    * **MRR** — reciprocal rank of the first relevant hit (0 when the
      approx list misses entirely).

    Both frames carry (qid, id, 1-based rank). One equi-join on
    (qid, id) + one groupBy(qid) — at scale this is a |Q|·k-row frame,
    trivially shuffled; queries with zero hits survive via the left
    join from the exact side's qid set. Returns (qid, ndcg, mrr).
    """
    import math

    idcg = sum(1.0 / math.log2(r + 1) for r in range(1, k + 1))
    # truncate to the @k cutoff BEFORE scoring: callers may hand a longer
    # approx list, and credit past rank k would let nDCG@k exceed 1 / MRR
    # count hits the cutoff should exclude
    hits = (
        approx.filter(F.col(rank_col) <= k)
        .select(qid_col, id_col, rank_col)
        .join(exact.select(qid_col, id_col), [qid_col, id_col])
    )
    per_q = hits.groupBy(qid_col).agg(
        (F.sum(F.lit(1.0) / F.log2(F.col(rank_col) + F.lit(1.0))) / F.lit(idcg)).alias(
            "ndcg"
        ),
        F.max(F.lit(1.0) / F.col(rank_col)).alias("mrr"),
    )
    qids = exact.select(qid_col).distinct()
    return qids.join(per_q, qid_col, "left").select(
        qid_col,
        F.coalesce(F.col("ndcg"), F.lit(0.0)).alias("ndcg"),
        F.coalesce(F.col("mrr"), F.lit(0.0)).alias("mrr"),
    )


def mrl_topk(
    corpus: DataFrame,
    query_vec,
    m: int = 16,
    k: int = 10,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka (MRL) two-tier search: score on the FIRST ``m``
    dimensions only, shortlist, then exact full-dimension rerank.

    Matryoshka-trained embeddings front-load information into the
    leading dimensions (public MRL literature), so an m-dim prefix scan
    preserves ranking well at D/m × less arithmetic — and when the
    corpus is stored with the prefix as its own column (or parquet
    column-chunked by dimension group), D/m × less I/O too.  Even on
    vanilla embeddings the prefix scan is an unbiased random projection
    — recall degrades gracefully and the exact rerank restores the
    head of the list (recall measured by the ``recall_mrl`` contract
    entry).

    Same plan skeleton as BQ/SQ/PQ two-tier reads: shuffle-free
    prefix-dot ``TakeOrderedAndProject`` shortlist → broadcast-pruned
    exact rerank.  Output ``(id, prefix_score, score)``.
    """
    q_pref = V.vec_lit([float(x) for x in query_vec[:m]])
    pref = F.slice(F.col(vec_col), 1, m)
    short = (
        corpus.select(id_col, V.dot(pref, q_pref).alias("prefix_score"))
        .orderBy(F.desc("prefix_score"), F.asc(id_col))
        .limit(shortlist)
    )
    pruned = corpus.select(id_col, vec_col).join(F.broadcast(short), id_col)
    return (
        pruned.select(
            id_col,
            "prefix_score",
            V.dot(F.col(vec_col), V.vec_lit(query_vec)).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def mmr_topk(
    corpus: DataFrame,
    query_vec,
    k: int = 5,
    pool: int = 30,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Diversified top-k via Maximal Marginal Relevance (Carbonell &
    Goldstein 1998): greedily pick the result maximizing
    ``λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s)`` — relevance traded
    against redundancy, the standard fix for a top-k full of
    near-duplicates of the best hit. ``λ=1`` degrades to plain top-k.

    Two stages, both bounded: (1) a relevance POOL of the top ``pool``
    candidates — the same TakeOrderedAndProject bounded-top-k scan as
    :func:`topk`, the only corpus-sized work; the pool is
    localCheckpoint-pinned so the greedy loop never re-scans the
    corpus. (2) The inherently-sequential greedy: k−1 passes over the
    pool-row frame, each an anti-join against the selected set (≤ k
    broadcast rows), a max-similarity over a pool×selected cross of at
    most ``pool·k`` rows, and a 1-row argmax. Cost is O(pool·k²) tiny
    rows regardless of corpus size. Ties break by ascending id; the
    first pick's penalty term is zero (``mmr = λ·rel``). Returns
    ``(id, rank, rel, mmr)``, rank 1..k in selection order.
    """
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.functions import (
        vector as V,
    )

    rel = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("__v"),
        V.cosine_sim(vec_col, V.vec_lit(query_vec)).alias("rel"),
    )
    cand = (
        rel.orderBy(F.desc("rel"), F.asc("id"))
        .limit(pool)
        .localCheckpoint(eager=True)
    )
    first = (
        cand.orderBy(F.desc("rel"), F.asc("id"))
        .limit(1)
        .select(
            "id", "__v", "rel", F.lit(1).alias("rank"),
            (F.lit(lam) * F.col("rel")).alias("mmr"),
        )
    )
    sel = first.localCheckpoint(eager=True)
    for step in range(2, k + 1):
        rest = cand.join(
            sel.select(F.col("id").alias("__sid")),
            F.col("id") == F.col("__sid"),
            "left_anti",
        )
        pairs = rest.crossJoin(
            F.broadcast(sel.select(F.col("__v").alias("__sv")))
        )
        mx = pairs.groupBy("id").agg(
            F.max(V.cosine_sim("__v", "__sv")).alias("__maxsim")
        )
        pick = (
            rest.join(mx, "id")
            .select(
                "id", "__v", "rel", F.lit(step).alias("rank"),
                (
                    F.lit(lam) * F.col("rel")
                    - F.lit(1.0 - lam) * F.col("__maxsim")
                ).alias("mmr"),
            )
            .orderBy(F.desc("mmr"), F.asc("id"))
            .limit(1)
        )
        sel = sel.unionByName(pick).localCheckpoint(eager=True)
    return sel.select("id", "rank", "rel", "mmr")


def mmr_knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    pool: int = 20,
    lam: float = 0.7,
    query_id: str = "qid",
    query_vec: str = "embedding",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batch MMR: the :func:`mmr_topk` greedy for EVERY query at once.
    The greedy is sequential in k but embarrassingly parallel across
    queries, so each of the k−1 steps is ONE set-level pass over the
    |Q|·pool candidate frame — a per-qid windowed argmax — instead of
    |Q| driver-side loops; wall-clock scales with k, not |Q|.

    Stage 1: pool MEMBERSHIP from :func:`knn_join` (one corpus scan
    for all queries, BLAS-ranked — rank-robust to the last-ulp matmul
    drift exactly like rp_knn_join's shortlist), then relevance and
    all pairwise similarities are RE-SCORED with the sequential-fold
    cosine expression on the pooled rows only, so every number the
    greedy compares is bit-identical to the SQL mirror. Stage 2: k−1
    rounds of (anti-join selected) → (qid-keyed join to selected,
    ≤ pool·k rows per query) → max-sim → per-qid row_number()=1 pick;
    each round localCheckpoint-pinned so plans stay flat. Returns
    ``(qid, id, rank, rel, mmr)``.
    """
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.functions import (
        vector as V,
    )

    pool_ids = knn_join(
        queries, corpus, k=pool, query_id=query_id, query_vec=query_vec,
        id_col=id_col, vec_col=vec_col,
    ).select("qid", "neighbor_id")
    qv = queries.select(
        F.col(query_id).alias("qid"), F.col(query_vec).alias("__qv")
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__v")
    )
    cand = (
        pool_ids.join(cv, "neighbor_id")
        .join(F.broadcast(qv), "qid")
        .select(
            "qid",
            F.col("neighbor_id").alias("id"),
            "__v",
            V.cosine_sim("__v", "__qv").alias("rel"),
        )
        .localCheckpoint(eager=True)
    )
    w_rel = Window.partitionBy("qid").orderBy(F.desc("rel"), F.asc("id"))
    sel = (
        cand.withColumn("__rn", F.row_number().over(w_rel))
        .filter(F.col("__rn") == 1)
        .select(
            "qid", "id", "__v", "rel", F.lit(1).alias("rank"),
            (F.lit(lam) * F.col("rel")).alias("mmr"),
        )
        .localCheckpoint(eager=True)
    )
    for step in range(2, k + 1):
        rest = cand.join(
            sel.select(F.col("qid").alias("__sq"), F.col("id").alias("__sid")),
            (cand["id"] == F.col("__sid")) & (cand["qid"] == F.col("__sq")),
            "left_anti",
        )
        mx = (
            rest.join(
                sel.select(F.col("qid").alias("__q"), F.col("__v").alias("__sv")),
                F.col("qid") == F.col("__q"),
            )
            .groupBy("qid", "id")
            .agg(F.max(V.cosine_sim("__v", "__sv")).alias("__maxsim"))
        )
        w_mmr = Window.partitionBy("qid").orderBy(F.desc("mmr"), F.asc("id"))
        pick = (
            rest.join(mx, ["qid", "id"])
            .select(
                "qid", "id", "__v", "rel", F.lit(step).alias("rank"),
                (
                    F.lit(lam) * F.col("rel")
                    - F.lit(1.0 - lam) * F.col("__maxsim")
                ).alias("mmr"),
            )
            .withColumn("__rn", F.row_number().over(w_mmr))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        sel = sel.unionByName(pick).localCheckpoint(eager=True)
    return sel.select("qid", "id", "rank", "rel", "mmr")


def mutual_knn(
    vectors: DataFrame,
    k: int = 5,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Reciprocal (mutual) kNN pairs: ``(a, b)`` kept only when ``b``
    is in ``a``'s top-k AND ``a`` is in ``b``'s top-k, self excluded.

    The mutual constraint is the standard asymmetry filter on a kNN
    graph — hubs attract thousands of one-way neighbors at scale, and
    mutuality is what near-dup/cluster pipelines (and UMAP-style graph
    constructions) use to cut those spurious edges, since a hub is
    rarely mutually nearest to all its admirers.

    Built by composition: one :func:`knn_join` of the table against
    itself at ``k+1`` (the self-match rides along at similarity 1 and
    is dropped afterwards — with exact-duplicate vectors tied at score
    1, id-asc tie-breaking can displace self from the top-(k+1), in
    which case a duplicate, which is distance-identical, stands in),
    a per-qid re-rank to top-k, then one equi-join of the directed
    edge set against its own swap (both keys — never a theta join)
    keeps the reciprocated pairs once in canonical ``id_a < id_b``
    orientation. All scale properties inherit from knn_join's single
    corpus scan per broadcast budget. Returns ``(id_a, id_b, score)``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    q = vectors.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"))
    nn = knn_join(
        q,
        vectors,
        k=k + 1,
        metric=metric,
        query_vec="qvec",
        id_col=id_col,
        vec_col=vec_col,
    ).filter(F.col("qid") != F.col("neighbor_id"))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("neighbor_id"))
    # pinned: the directed edge set feeds BOTH sides of the reciprocity
    # join — unpinned, the whole knn_join lineage (including its corpus
    # scans) re-executes per side (observed as 4 parquet scans in the
    # plan; the checkpoint makes the final plan scan-free)
    topk_edges = (
        nn.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .select("qid", "neighbor_id", "score")
        .localCheckpoint(eager=True)
    )
    rev = topk_edges.select(
        F.col("neighbor_id").alias("qid"), F.col("qid").alias("neighbor_id")
    )
    return (
        topk_edges.join(rev, ["qid", "neighbor_id"], "left_semi")
        .filter(F.col("qid") < F.col("neighbor_id"))
        .select(
            F.col("qid").alias("id_a"),
            F.col("neighbor_id").alias("id_b"),
            "score",
        )
    )


def nn_descent(
    vectors: DataFrame,
    k: int = 10,
    rounds: int = 2,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_candidates: int | None = None,
    seed: int = 0,
    k_build: int | None = None,
) -> DataFrame:
    """NN-descent approximate kNN-GRAPH construction (Dong, Moses &
    Li, WWW 2011) — the graph-based ANN tier next to the LSH / IVF /
    PQ families, and the primitive under embedding near-dup and
    UMAP-style pipelines at corpus scale: "a neighbor of my neighbor
    is likely my neighbor", iterated to convergence, with NO index and
    NO all-pairs join.

    Spark shape, all per-round equi-joins (the graph-module
    discipline — pagerank/k-core's pinned-iteration rule):

    - INIT: deterministic random blocking — THREE independent hash
      bucketings of expected size ~2k each
      (``pmod(xxhash64(id, seed·1000+t))``, t = 0..2), union of
      within-bucket pairs.  Independence matters: ONE blocking yields
      a DISCONNECTED candidate graph (neighbor-of-neighbor never
      escapes its block — measured: recall frozen at the init level
      across rounds), while overlapping blockings make the graph
      connected w.h.p., which is what lets descent propagate — the
      deterministic stand-in for the paper's random init (no RNG, so
      the whole graph is a pure function of the input — the
      stratified_sample rationale).
    - ROUND: the current directed edge set unions its reverse, joins
      itself on the midpoint (neighbor-of-neighbor — candidates flow
      along BOTH edge directions, the paper's forward+reverse
      neighborhoods), new pairs are deduped, anti-joined against the
      already-scored set, capped DETERMINISTICALLY per node at
      ``max_candidates`` (hash-ranked — the hot-bucket cap rule:
      hubs would otherwise generate k² candidates times their degree),
      scored by ONE equi-join to the vector table per side, and the
      union re-top-k'd per node.  Every round's survivor set is
      ``localCheckpoint``-pinned so round r replans against a
      materialized r−1 (plan-asserted for the graph family).

    The descent runs internally at ``k_build`` (default ``2k`` — the
    pynndescent-style widened frontier) and truncates to k at the end:
    on the hardest case, RANDOM high-dim vectors with no cluster
    structure, building at k the recall@10 plateaus ~0.83, while the
    2k build measures **0.976 at rounds=2 / 0.991 at rounds=3** on the
    same data (testdata embeddings, vs the exact knn_join graph) —
    the frontier width, not the round count, is what buys the tail.
    Per-round cost is O(N·k_build²) candidate scorings, distributed —
    never N²; recall vs the exact brute-force graph is pytest-measured
    and improves monotonically per round.
    Ties break (score desc, id asc) so results are deterministic and
    partitioning-independent.  Self-pairs excluded.  Returns the
    directed graph ``(node, nbr, score, rank)``, exactly k rows per
    node (fewer only when N − 1 < k).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    k_out = k
    k = int(k_build) if k_build is not None else 2 * k
    if k < k_out:
        raise ValueError(f"k_build must be >= k, got {k} < {k_out}")
    if max_candidates is None:
        max_candidates = 4 * k * k
    score_fn = V.cosine_sim if metric == "cosine" else V.neg_l2sq
    if metric not in ("cosine", "l2"):
        raise ValueError(f"unknown metric {metric!r}")
    vecs = vectors.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")
    ).persist()
    n = vecs.count()
    if n == 0:
        vecs.unpersist()
        # build the empty frame from the INPUT id type — id_col may be
        # string/int; hardcoding long would return a schema that can't
        # union with a non-empty run's output (round-11 ADVICE)
        id_type = vectors.schema[id_col].dataType
        return vectors.sparkSession.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("node", id_type),
                    T.StructField("nbr", id_type),
                    T.StructField("score", T.DoubleType()),
                    T.StructField("rank", T.IntegerType()),
                ]
            ),
        )
    n_buckets = max(1, n // max(2 * k, 4))
    cands = None
    for t in range(3):
        bucketed = vecs.select(
            "__id",
            F.pmod(
                F.xxhash64(F.col("__id"), F.lit(int(seed) * 1000 + t)),
                F.lit(n_buckets),
            ).alias("__b"),
        )
        left = bucketed.select(F.col("__b"), F.col("__id").alias("node"))
        right = bucketed.select(F.col("__b"), F.col("__id").alias("nbr"))
        pairs = (
            left.join(right, "__b")
            .filter(F.col("node") != F.col("nbr"))
            .select("node", "nbr")
        )
        cands = pairs if cands is None else cands.unionByName(pairs)
    cands = cands.distinct()

    va = vecs.select(F.col("__id").alias("node"), F.col("__v").alias("__va"))
    vb = vecs.select(F.col("__id").alias("nbr"), F.col("__v").alias("__vb"))

    def _score(pairs):
        return (
            pairs.join(va, "node")
            .join(vb, "nbr")
            .select(
                "node", "nbr", score_fn("__va", "__vb").alias("score")
            )
        )

    def _topk(scored):
        w = Window.partitionBy("node").orderBy(
            F.desc("score"), F.asc("nbr")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("node", "nbr", "score", "rank")
        )

    knn = _topk(_score(cands)).localCheckpoint(eager=True)
    for _ in range(rounds):
        edges = knn.select("node", "nbr").unionByName(
            knn.select(
                F.col("nbr").alias("node"), F.col("node").alias("nbr")
            )
        )
        mid_out = edges.select(F.col("node"), F.col("nbr").alias("__m"))
        mid_in = edges.select(
            F.col("node").alias("__m"), F.col("nbr").alias("cand")
        )
        expanded = (
            mid_out.join(mid_in, "__m")
            .filter(F.col("node") != F.col("cand"))
            .select("node", F.col("cand").alias("nbr"))
            .distinct()
        )
        fresh = expanded.join(
            knn.select("node", "nbr"), ["node", "nbr"], "left_anti"
        )
        # deterministic per-node cap: hash-ranked, not sampled — the
        # hot-bucket discipline applied to hub nodes
        w_cap = Window.partitionBy("node").orderBy(
            F.pmod(
                F.xxhash64(F.col("node"), F.col("nbr"), F.lit(int(seed))),
                F.lit(1_000_003),
            ),
            F.asc("nbr"),
        )
        capped = (
            fresh.withColumn("__cr", F.row_number().over(w_cap))
            .filter(F.col("__cr") <= max_candidates)
            .select("node", "nbr")
        )
        merged = knn.select("node", "nbr", "score").unionByName(
            _score(capped)
        )
        knn = _topk(merged).localCheckpoint(eager=True)
    vecs.unpersist()
    return knn.filter(F.col("rank") <= k_out)
