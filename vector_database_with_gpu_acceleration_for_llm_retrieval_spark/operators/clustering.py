"""Distributed k-means and semantic (cluster-blocked) dedup.

Embedding-space clustering is the organizing primitive for three
pipeline jobs the flat reference engine doesn't have:

* **semantic dedup** — SemDeDup-style: block the corpus by cluster,
  compare only within blocks (the third blocking strategy next to
  MinHash bands and hyperplane LSH buckets in operators/dedup.py);
* **corpus cartography** — per-cluster sizes/stats for mixture design;
* **IVF training** — ann_index.train_centroids gets a principled
  replacement for its sampled seeding.

Lloyd's algorithm maps cleanly onto Spark's execution model: the E-step
(assignment) is a per-row argmin against k broadcast centroid literals
— one codegen'd projection, no shuffle; the M-step is one
groupBy(cluster) with 64 per-dimension ``avg`` partials — one
vocabulary-sized shuffle of k rows.  The driver loop carries only the
k×D centroid matrix (a few KB) between iterations; the corpus is
scanned once per iteration and never collected.  At 100 TB each
iteration is exactly one scan + one k-row aggregate — the textbook
shape (public Spark MLlib KMeans does the same dataflow; this
implementation stays in DataFrame expressions so plans stay auditable
and the E/M steps are individually oracle-checkable).

Determinism: init takes the k lowest-id vectors (no RNG), argmin
tie-breaks to the lowest cluster index, and empty clusters keep their
previous centroid — so a fit is bit-reproducible given the corpus, and
the assignment/update steps mirror term-for-term into DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.functions import vector as V

__all__ = [
    "kmeans_init",
    "assign_clusters",
    "kmeans_update",
    "kmeans_fit",
    "cluster_profile",
    "semantic_dedup_pairs",
    "kcenter_select",
]


def kmeans_init(
    df: DataFrame, k: int, vec_col: str = "embedding", id_col: str = "vec_id"
) -> list[list[float]]:
    """Deterministic seeding: the ``k`` lowest-id vectors (no RNG — a
    fit is reproducible and the oracle can name the same seeds).  For
    better spreads swap in k-means|| style sampling; the loop is
    agnostic to the seeder."""
    rows = (
        df.select(id_col, vec_col)
        .orderBy(F.asc(id_col))
        .limit(k)
        .collect()
    )
    return [[float(x) for x in r[vec_col]] for r in rows]


def _dist_array(vec: Column, centroids: list[list[float]]) -> Column:
    return F.array(*[V.l2sq(vec, V.vec_lit(c)) for c in centroids])


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    keep_vec: bool = False,
) -> DataFrame:
    """E-step: ``(id, cluster, dist)`` — 0-based argmin of squared L2
    against the broadcast centroid literals, ties to the lowest index
    (``array_position`` returns the first match).  One projection, no
    shuffle; the k×D literal matrix rides the closure, not a join."""
    dists = _dist_array(F.col(vec_col), centroids)
    cols = [
        F.col(id_col),
        (F.array_position(dists, F.array_min(dists)) - 1).cast("int").alias("cluster"),
        F.array_min(dists).alias("dist"),
    ]
    if keep_vec:
        cols.append(F.col(vec_col))
    return df.select(*cols)


def kmeans_update(
    assigned: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> list[list[float]]:
    """M-step: per-cluster per-dimension mean — ``dim`` avg partials in
    one groupBy(cluster) (map-side combined; the shuffle moves k rows).
    Clusters that captured no rows keep their previous centroid."""
    dim = len(centroids[0])
    aggs = [F.avg(F.col(vec_col)[d]).alias(f"c{d}") for d in range(dim)]
    rows = assigned.groupBy("cluster").agg(*aggs).collect()
    out = [list(c) for c in centroids]
    for r in rows:
        out[r["cluster"]] = [float(r[f"c{d}"]) for d in range(dim)]
    return out


def kmeans_fit(
    df: DataFrame,
    k: int,
    n_iter: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    tol: float = 1e-6,
) -> tuple[list[list[float]], list[float]]:
    """Full Lloyd loop: returns ``(centroids, inertia_history)``.
    Each iteration = one corpus scan (assignment rides it) + one k-row
    aggregate; stops early when inertia improves by < ``tol``
    (relative).  The corpus never leaves the executors."""
    cents = kmeans_init(df, k, vec_col, id_col)
    history: list[float] = []
    base = df.select(id_col, vec_col)
    for _ in range(n_iter):
        assigned = assign_clusters(base, cents, vec_col, id_col, keep_vec=True)
        agg = assigned.groupBy("cluster").agg(
            F.sum("dist").alias("__inertia"),
            F.count("*").alias("__n"),
            *[F.avg(F.col(vec_col)[d]).alias(f"c{d}") for d in range(len(cents[0]))],
        )
        rows = agg.collect()
        inertia = float(sum(r["__inertia"] for r in rows))
        new_cents = [list(c) for c in cents]
        for r in rows:
            new_cents[r["cluster"]] = [
                float(r[f"c{d}"]) for d in range(len(cents[0]))
            ]
        cents = new_cents
        if history and history[-1] - inertia < tol * max(abs(history[-1]), 1.0):
            history.append(inertia)
            break
        history.append(inertia)
    return cents, history


def cluster_profile(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-cluster cartography: size, mean/max distance to centroid —
    the mixture-design summary table."""
    a = assign_clusters(df, centroids, vec_col, id_col)
    return a.groupBy("cluster").agg(
        F.count("*").alias("n"),
        F.avg("dist").alias("avg_dist"),
        F.max("dist").alias("max_dist"),
    )


def semantic_dedup_pairs(
    df: DataFrame,
    centroids: list[list[float]],
    tau: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_block_size: int | None = None,
) -> DataFrame:
    """SemDeDup-style near-duplicate pairs: assign every vector to its
    nearest centroid, self-join ON the cluster id, keep pairs with
    cosine ≥ ``tau``.  The equi-join on cluster turns the all-pairs
    O(N²) into Σ_c |c|² — the same collide-then-verify economics as
    MinHash banding, with ``k`` controlling the block size (pick
    k ≈ N/√N per level; recurse a second k-means inside giant clusters
    at extreme scale).  Cross-cluster near-dups are the documented
    recall tradeoff — raise k-means iterations or probe the 2nd-nearest
    centroid (assign twice) to recover them.

    ``max_block_size`` is the quadratic-blowup guard (same discipline
    as dedup.lsh_candidate_pairs' bucket cap): clusters above the cap
    are DROPPED from the self-join — at 100 TB one catch-all cluster
    would otherwise dominate Σ|c|²; cap it and recurse a finer k-means
    inside the dropped clusters instead.  Use
    :func:`cluster_profile` to see what the cap would drop.

    Output: ``(id_a, id_b, cluster, cos)`` with ``id_a < id_b``.
    """
    assigned = assign_clusters(df, centroids, vec_col, id_col, keep_vec=True)
    if max_block_size is not None:
        ok = (
            assigned.groupBy("cluster")
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") <= max_block_size)
            .select("cluster")
        )
        assigned = assigned.join(F.broadcast(ok), "cluster")
    a = assigned.select(
        F.col(id_col).alias("id_a"), F.col("cluster"), F.col(vec_col).alias("__va")
    )
    b = assigned.select(
        F.col(id_col).alias("id_b"), F.col("cluster"), F.col(vec_col).alias("__vb")
    )
    pairs = a.join(b, "cluster").filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cos", V.cosine_sim(F.col("__va"), F.col("__vb")))
        .filter(F.col("cos") >= F.lit(float(tau)))
        .select("id_a", "id_b", "cluster", "cos")
    )


def kcenter_select(
    corpus: "DataFrame",
    k: int = 5,
    seed_id=0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "DataFrame":
    """Greedy k-center coreset selection (farthest-point traversal,
    Gonzalez 1985 — the 2-approximation): starting from ``seed_id``,
    repeatedly pick the point FARTHEST from everything selected so far
    (max over candidates of min-L2² to the selected set). The standard
    diversity-first data-selection primitive — a coreset whose covering
    radius is within 2× of optimal, the complement of similarity-driven
    dedup (drop redundancy) and MMR (rerank a pool): here the OUTPUT is
    the diverse subset itself, e.g. seed examples for labeling or a
    balanced eval slice.

    Scale shape: the greedy is inherently k−1 sequential passes, each
    ONE corpus scan — an anti-join against the ≤k selected ids, a
    broadcast of the ≤k selected vectors, a per-id min-distance
    partial agg, and a 1-row TakeOrdered argmax (ties by ascending
    id). k scans of the corpus is the honest cost of the exact greedy;
    subsample upstream (or pool like mmr_topk) when k·scan is too
    much. Selected frames are localCheckpoint-pinned so plans stay
    flat. Returns ``(id, rank, min_dist)`` — min-L2² to the previously
    selected at pick time (NULL for the seed).
    """
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.functions import (
        vector as V,
    )

    src = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("__v"))
    sel = (
        src.filter(F.col("id") == seed_id)
        .select(
            "id", "__v", F.lit(1).alias("rank"),
            F.lit(None).cast("double").alias("min_dist"),
        )
        .localCheckpoint(eager=True)
    )
    # a missing seed would silently thread an empty selected set through
    # every greedy step and return an empty frame — surface the caller
    # error instead (the checkpoint above already materialized sel)
    if sel.limit(1).count() == 0:
        raise ValueError(f"seed_id {seed_id!r} not found in corpus")
    for step in range(2, k + 1):
        rest = src.join(
            sel.select(F.col("id").alias("__sid")),
            F.col("id") == F.col("__sid"),
            "left_anti",
        )
        dists = (
            rest.crossJoin(F.broadcast(sel.select(F.col("__v").alias("__sv"))))
            .groupBy("id")
            .agg(F.min(V.l2sq("__v", "__sv")).alias("__d"))
        )
        pick = (
            rest.join(dists, "id")
            .orderBy(F.desc("__d"), F.asc("id"))
            .limit(1)
            .select(
                "id", "__v", F.lit(step).alias("rank"),
                F.col("__d").alias("min_dist"),
            )
        )
        sel = sel.unionByName(pick).localCheckpoint(eager=True)
    return sel.select("id", "rank", "min_dist")
