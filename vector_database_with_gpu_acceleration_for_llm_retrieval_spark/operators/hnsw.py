"""HNSW-style hierarchical graph ANN: layered coarse-to-fine serving.

The reference mentions HNSW only as demo corpus *text*
(rag_demo/ingest.py:14 — its own index is an exact flat scan); this
module adds the real structure on top of the engine's existing graph
tier (operators/graph_ann.py). An HNSW index (Malkov & Yashunin,
TPAMI 2018) is a stack of kNN graphs: layer 0 holds every vector,
each higher layer an exponentially thinner sample. A query greedily
descends the thin upper layers (each hop halves the remaining
distance in expectation) and hands the reached node to the dense
base-layer search as its entry point — turning entry selection from
"hope the global medoids are close" into a per-query O(log N) walk.

Spark-first decomposition — each piece is an existing discipline:

* **Layer assignment** is a *deterministic integer-geometric* rule:
  ``lvl(id) = Σ_{l=1..L} [h(id) mod scale^l = 0]`` over the portable
  60-bit md5 hash of the id string. Pure integer arithmetic, so any
  engine re-derives the same layers (the classic ``floor(-ln(U)·mL)``
  draw needs ln and RNG — neither is cross-engine exact); the
  expected layer-l occupancy is ``N/scale^l``, the HNSW geometric
  decay.
* **Upper-layer graphs** are kNN graphs over geometrically shrinking
  subsets: exact JVM-fold pairing below ``exact_threshold`` rows
  (bit-stable for mirrors), :func:`..search.nn_descent` above it —
  layer l of a 1B-vector corpus at scale=32 has ~1M nodes, well inside
  nn_descent's regime, and build cost shrinks by scale^l per level.
* **Descent** is a *fixed-hop budgeted* greedy walk (the fixed-rounds
  discipline of :func:`..graph_ann.graph_beam_search`): per layer,
  ``hops`` rounds of "expand current node's layer edges, keep the
  best of current ∪ neighbors" — monotone in score, set-at-a-time
  over the whole query batch, every round an equi-join + a
  per-query top-1 window. Fixed budgets keep the dataflow
  SQL-mirrorable and the wall-clock bounded; a hop that finds no
  improvement is a no-op (greedy is monotone), so over-provisioned
  hops cost only the join, never correctness.
* **Base layer** is the existing beam search with its entry seeded
  PER QUERY by the descent (``entries_per_query``) — everything else
  (rounds, beam, early exit, filtered/PQ modes) composes unchanged.

Scale: descent state is one row per query; each hop shuffles
``|Q| · deg`` candidate rows keyed by query id — corpus size enters
only through the (pruned, layered) edge tables. The layers ABOVE
level 1 total ~``N/(scale-1)`` nodes, a rounding error next to the
base graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.functions import text as TX
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.graph_ann import (
    _metric_fn,
    graph_beam_search,
)

__all__ = [
    "assign_layers",
    "build_hnsw_layers",
    "top_entries",
    "hnsw_descend",
    "hnsw_search",
    "write_hnsw_index",
    "hnsw_topk_indexed",
    "hnsw_insert",
    "hnsw_delete",
    "delete_from_hnsw_index",
    "calibrate_hnsw",
]

#: geometric thinning factor between layers (expected |layer l| =
#: N / scale^l). 32 ≈ the HNSW paper's M=32 regime; the contract uses
#: 8 so the 500-row fixture has a real 2-level hierarchy.
HNSW_SCALE = 32

#: layer subsets at or below this row count build their kNN graph by
#: exact JVM-fold pairing (|subset|² scorings, bit-stable for SQL
#: mirrors); larger subsets use nn_descent.
EXACT_BUILD_THRESHOLD = 20_000


def assign_layers(
    vectors: DataFrame,
    id_col: str = "vec_id",
    scale: int = HNSW_SCALE,
    max_layer: int = 2,
) -> DataFrame:
    """``(id, lvl)``: the deterministic integer-geometric HNSW level.

    ``lvl = Σ_{l=1..max_layer} [h mod scale^l = 0]`` with ``h`` the
    portable 60-bit hash of ``CAST(id AS STRING)`` — because
    ``scale^(l+1) | h`` implies ``scale^l | h``, the sum IS the
    largest qualifying level. Expected occupancy of layer ≥ l is
    ``N/scale^l`` (md5 is uniform). Pure projection, no shuffle.
    """
    if scale < 2:
        raise ValueError(f"scale must be >= 2, got {scale}")
    if max_layer < 1:
        raise ValueError(f"max_layer must be >= 1, got {max_layer}")
    h = TX.portable_token_hash(F.col(id_col).cast("string"))
    lvl = None
    for l in range(1, max_layer + 1):
        ind = (F.pmod(h, F.lit(scale**l)) == 0).cast("int")
        lvl = ind if lvl is None else (lvl + ind)
    return vectors.select(F.col(id_col), lvl.alias("lvl"))


def _exact_layer_graph(
    sub: DataFrame, deg: int, metric: str, id_col: str, vec_col: str
) -> DataFrame:
    """Exact deg-``deg`` kNN graph over a (small) layer subset — the
    JVM-fold scoring path (bit-identical to a SQL mirror's sequential
    double fold), NOT a BLAS matmul whose last-ulp drift across matrix
    shapes could flip edge tie-breaks (the contract _exact_knn_graph
    rationale)."""
    score_fn = _metric_fn(metric)
    a = sub.select(F.col(id_col).alias("node"), F.col(vec_col).alias("__av"))
    b = sub.select(F.col(id_col).alias("nbr"), F.col(vec_col).alias("__bv"))
    scored = a.join(F.broadcast(b), F.col("node") != F.col("nbr")).select(
        "node", "nbr", score_fn("__av", "__bv").alias("__s")
    )
    w = Window.partitionBy("node").orderBy(F.desc("__s"), F.asc("nbr"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= deg)
        .select("node", "nbr")
    )


def build_hnsw_layers(
    vectors: DataFrame,
    deg: int = 8,
    scale: int = HNSW_SCALE,
    max_layer: int = 2,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact_threshold: int = EXACT_BUILD_THRESHOLD,
) -> DataFrame:
    """Upper-layer edge tables: ``(layer, node, nbr)`` for layers
    1..max_layer, each a deg-``deg`` kNN graph over the nodes with
    ``lvl >= layer``. Layer 0 (the full corpus) is NOT built here —
    that is the existing base graph (:func:`..search.nn_descent` /
    ``write_graph_snapshot``), which this index descends INTO.

    Build strategy per layer: exact JVM-fold pairing when the subset
    fits ``exact_threshold`` (|sub|² scorings — upper layers shrink by
    scale^l, so this is the common case), else nn_descent over the
    subset. Total upper-layer build cost is a geometric series
    dominated by layer 1 at ``N/scale`` nodes.
    """
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.search import (
        nn_descent,
    )

    lv = assign_layers(vectors, id_col=id_col, scale=scale, max_layer=max_layer)
    out = None
    for layer in range(1, max_layer + 1):
        sub = (
            vectors.join(
                lv.filter(F.col("lvl") >= layer).select(id_col), id_col, "left_semi"
            )
            .select(id_col, vec_col)
        )
        n_sub = sub.count()
        if n_sub <= 1:
            continue  # a 0/1-node layer has no edges; descent no-ops there
        if n_sub <= exact_threshold:
            edges = _exact_layer_graph(sub, deg, metric, id_col, vec_col)
        else:
            edges = nn_descent(
                sub, k=deg, metric=metric, id_col=id_col, vec_col=vec_col
            ).select(F.col("node"), F.col("nbr"))
        edges = edges.select(F.lit(layer).alias("layer"), "node", "nbr")
        out = edges if out is None else out.unionByName(edges)
    if out is None:
        # degenerate corpus (≤1 upper node everywhere): empty edge
        # frame, node/nbr typed like the id column
        from pyspark.sql.types import IntegerType, StructField, StructType

        id_type = vectors.schema[id_col].dataType
        spark = vectors.sparkSession
        return spark.createDataFrame(
            [],
            StructType([
                StructField("layer", IntegerType()),
                StructField("node", id_type),
                StructField("nbr", id_type),
            ]),
        )
    return out


def top_entries(
    vectors: DataFrame,
    id_col: str = "vec_id",
    scale: int = HNSW_SCALE,
    max_layer: int = 2,
    cap: int = 4,
) -> DataFrame:
    """Global entry set: the ``cap`` lowest ids of the highest
    OCCUPIED layer — expressed as a static fallback chain (layer
    max_layer's lowest ids; if that layer is empty, layer max_layer-1;
    … down to the full corpus), so a SQL mirror states the same rule
    without data-dependent control flow. Returns a 1-column frame of
    ``id_col`` (≤ cap rows — a broadcast constant)."""
    lv = assign_layers(vectors, id_col=id_col, scale=scale, max_layer=max_layer)
    # tag each tier's candidate ids, then keep only the best (highest)
    # occupied tier — one set-level min, no data-dependent control flow
    tiers = []
    for layer in range(max_layer, -1, -1):
        tiers.append(
            lv.filter(F.col("lvl") >= layer)
            .select(id_col)
            .orderBy(F.asc(id_col))
            .limit(cap)
            .withColumn("__tier", F.lit(max_layer - layer))
        )
    allt = tiers[0]
    for t in tiers[1:]:
        allt = allt.unionByName(t)
    best = allt.agg(F.min("__tier").alias("__bt"))
    return allt.join(
        F.broadcast(best), F.col("__tier") == F.col("__bt")
    ).select(id_col)


def hnsw_descend(
    queries: DataFrame,
    vectors: DataFrame,
    layer_edges: DataFrame,
    entries: DataFrame,
    hops: int = 2,
    max_layer: int = 2,
    width: int = 1,
    metric: str = "cosine",
    query_id: str = "qid",
    query_vec: str = "qvec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    stats: dict | None = None,
) -> DataFrame:
    """Greedy coarse-to-fine descent: score the entry set per query,
    keep the best ``width`` nodes, then for each layer from
    ``max_layer`` down to 1 run ``hops`` greedy steps (expand the
    current set's layer edges, keep the best ``width`` of current ∪
    neighbors — score desc, id asc). Returns ``(query_id, id_col,
    score)`` — ``width`` rows per query, the base-layer entry points.

    ``width=1`` is the classic HNSW walk; ``width>1`` is the ef>1
    analog — it costs ``width·deg`` scorings per hop and hands the
    base beam a DIVERSE per-query entry set, which matters on
    weakly-clustered data where any single greedy path can stall in
    a local optimum (measured on the random 64-dim testdata: the
    one-entry walk trails a 4-global-entry flat beam; width=4
    descent restores parity at equal base-beam budget).

    Monotone and deterministic: current nodes always compete, so the
    set's best score never decreases and ties break on node id. State
    is ``width`` rows per query; each hop is an equi-join on (node)
    then (query id) + a per-query top-``width`` window — |Q|-sized
    frames throughout, pinned per hop (the graph_ann per-round
    discipline).
    """
    if width < 1:
        raise ValueError(f"width must be >= 1, got {width}")
    score_fn = _metric_fn(metric)
    q = queries.select(
        F.col(query_id).alias("__qid"), F.col(query_vec).alias("__qv")
    ).persist()
    v = vectors.select(
        F.col(id_col).alias("__node"), F.col(vec_col).alias("__nv")
    ).persist()

    def _score(cands: DataFrame) -> DataFrame:
        return (
            cands.join(v, "__node")
            .join(q, "__qid")
            .select("__qid", "__node", score_fn("__qv", "__nv").alias("score"))
        )

    w1 = Window.partitionBy("__qid").orderBy(F.desc("score"), F.asc("__node"))
    ent = entries.select(F.col(id_col).alias("__node")).distinct()
    sc_ent = _score(q.select("__qid").crossJoin(F.broadcast(ent))).localCheckpoint(
        eager=True
    )
    n_scored = sc_ent.count() if stats is not None else None
    cur = (
        sc_ent.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= width)
        .drop("__rn")
        .localCheckpoint(eager=True)
    )
    for layer in range(max_layer, 0, -1):
        edges = (
            layer_edges.filter(F.col("layer") == layer)
            .select(F.col("node").alias("__node"), F.col("nbr").alias("__nbr"))
        )
        for _ in range(hops):
            nbrs = (
                cur.select("__qid", "__node")
                .join(edges, "__node")
                .select("__qid", F.col("__nbr").alias("__node"))
                .distinct()
            )
            # pin the scored frame once per hop: it feeds the window
            # merge AND (when stats is on) the honest scoring count —
            # the graph_ann per-round pin discipline
            sc = _score(nbrs).localCheckpoint(eager=True)
            if stats is not None:
                n_scored += sc.count()
            # a current node re-reached through an edge is re-scored to
            # the identical value — dedup before the window so one node
            # cannot occupy two width slots
            cur = (
                sc.unionByName(cur)
                .dropDuplicates(["__qid", "__node"])
                .withColumn("__rn", F.row_number().over(w1))
                .filter(F.col("__rn") <= width)
                .drop("__rn")
                .localCheckpoint(eager=True)
            )
    if stats is not None:
        stats["n_scored"] = stats.get("n_scored", 0) + n_scored
    # cur is localCheckpoint-pinned, so the inputs can release their
    # storage now (a long-running serving stream calls this per
    # micro-batch — leaked persists would accumulate until eviction)
    q.unpersist()
    v.unpersist()
    return cur.select(
        F.col("__qid").alias(query_id),
        F.col("__node").alias(id_col),
        "score",
    )


def hnsw_search(
    queries: DataFrame,
    vectors: DataFrame,
    base_graph: DataFrame,
    layer_edges: DataFrame,
    k: int = 10,
    beam: int = 32,
    rounds: int = 4,
    hops: int = 2,
    max_layer: int = 2,
    width: int = 1,
    entries: DataFrame | None = None,
    scale: int = HNSW_SCALE,
    entry_cap: int = 4,
    metric: str = "cosine",
    query_id: str = "qid",
    query_vec: str = "qvec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    stats: dict | None = None,
    allowed: DataFrame | None = None,
) -> DataFrame:
    """Full HNSW serving: descend the upper layers to a per-query
    entry, then run the base-layer beam search seeded with it
    (``entries_per_query``). Output is the :func:`..search.knn_join`
    contract ``(qid, neighbor_id, score, rank)``; ``allowed`` passes
    through to the beam's filtered mode.

    ``entries`` defaults to :func:`top_entries` (the highest occupied
    layer's lowest ids, capped) — the deterministic stand-in for
    HNSW's single top-layer entry point."""
    if entries is None:
        entries = top_entries(
            vectors, id_col=id_col, scale=scale, max_layer=max_layer, cap=entry_cap
        )
    descended = hnsw_descend(
        queries,
        vectors,
        layer_edges,
        entries,
        hops=hops,
        max_layer=max_layer,
        width=width,
        metric=metric,
        query_id=query_id,
        query_vec=query_vec,
        id_col=id_col,
        vec_col=vec_col,
        stats=stats,
    )
    return graph_beam_search(
        queries,
        vectors,
        base_graph,
        k=k,
        beam=beam,
        rounds=rounds,
        metric=metric,
        query_id=query_id,
        query_vec=query_vec,
        id_col=id_col,
        vec_col=vec_col,
        stats=stats,
        allowed=allowed,
        entries_per_query=descended.select(query_id, id_col),
    )


def write_hnsw_index(
    vectors: DataFrame,
    base_graph: DataFrame,
    path: str,
    deg: int = 8,
    scale: int = HNSW_SCALE,
    max_layer: int = 2,
    entry_cap: int = 4,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "overwrite",
) -> None:
    """Persist the hierarchical serving artifact as three co-located
    tables under one root (the ``write_graph_pq_index`` storage
    convention — separate directories, not a ``kind=`` column, so a
    descent-only reader opens ``layers/`` without listing the base
    graph or vector files):

    * ``layers/``  — the upper-layer adjacency ``(layer, node, nbr)``
      (~N/(scale-1) rows total — a rounding error next to the base),
    * ``base/``    — the layer-0 kNN graph ``(node, nbr)``,
    * ``vectors/`` — the full vectors (scored during descent + beam),

    plus a sidecar with the build parameters AND the frozen entry
    list (:func:`top_entries` evaluated once at build — query time
    never re-derives it). Mutations: the base graph evolves through
    the existing ``graph_insert``/``graph_delete`` snapshot machinery;
    the upper layers are cheap enough (geometric series over shrinking
    subsets) that the documented maintenance is a layer REBUILD, which
    this writer makes idempotent via ``mode=overwrite``."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.ann_index import (
        _write_meta,
    )

    layers = build_hnsw_layers(
        vectors, deg=deg, scale=scale, max_layer=max_layer, metric=metric,
        id_col=id_col, vec_col=vec_col,
    )
    layers.write.mode(mode).parquet(f"{path}/layers")
    base_graph.select("node", "nbr").write.mode(mode).parquet(f"{path}/base")
    vectors.select(id_col, vec_col).write.mode(mode).parquet(f"{path}/vectors")
    ents = [
        r[id_col]
        for r in top_entries(
            vectors, id_col=id_col, scale=scale, max_layer=max_layer, cap=entry_cap
        ).collect()
    ]
    _write_meta(
        vectors.sparkSession,
        path,
        {
            "kind": "hnsw",
            "scale": scale,
            "max_layer": max_layer,
            "deg": deg,
            "metric": metric,
            "entries": sorted(ents),
            "entry_cap": entry_cap,
            "id_col": id_col,
            "vec_col": vec_col,
        },
    )


def hnsw_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    beam: int = 32,
    rounds: int = 4,
    hops: int = 2,
    width: int = 1,
    query_id: str = "qid",
    query_vec: str = "qvec",
    stats: dict | None = None,
    allowed: DataFrame | None = None,
) -> DataFrame:
    """Serve from a :func:`write_hnsw_index` store — bit-identical to
    the in-memory :func:`hnsw_search` on the same corpus (same layer
    rule, same frozen entries, same folds) through the parquet round
    trip (parity pytest). Per query the store reads the tiny layers
    table, the base adjacency, and the vectors it actually scores."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.ann_index import (
        _read_meta,
    )

    meta = _read_meta(spark, path)
    if meta.get("kind") != "hnsw":
        raise ValueError(f"not an hnsw index: kind={meta.get('kind')!r}")
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    vectors = spark.read.parquet(f"{path}/vectors")
    base = spark.read.parquet(f"{path}/base")
    layers = spark.read.parquet(f"{path}/layers")
    # entries typed from the stored id column — ids need not be ints
    from pyspark.sql.types import StructField, StructType

    entries = spark.createDataFrame(
        [(e,) for e in meta["entries"]],
        StructType([StructField(id_col, vectors.schema[id_col].dataType)]),
    )
    return hnsw_search(
        queries,
        vectors,
        base,
        layers,
        k=k,
        beam=beam,
        rounds=rounds,
        hops=hops,
        max_layer=int(meta["max_layer"]),
        width=width,
        entries=entries,
        scale=int(meta["scale"]),
        metric=meta["metric"],
        query_id=query_id,
        query_vec=query_vec,
        id_col=id_col,
        vec_col=vec_col,
        stats=stats,
        allowed=allowed,
    )


def hnsw_insert(
    vectors: DataFrame,
    base_graph: DataFrame,
    layer_edges: DataFrame,
    new_vectors: DataFrame,
    base_k: int = 10,
    deg: int = 8,
    scale: int = HNSW_SCALE,
    max_layer: int = 2,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **graph_insert_kwargs,
) -> tuple[DataFrame, DataFrame]:
    """Incremental HNSW maintenance: fold a batch of new vectors into
    the hierarchy without rebuilding. Returns ``(base_graph',
    layer_edges')``.

    * **Base layer** delegates to :func:`..graph_ann.graph_insert`
      (placement by beam search + touched-neighborhood repair —
      approximate, recall-audited there). ``base_graph`` must carry
      scores (the nn_descent output shape), as graph_insert re-ranks.
    * **Upper layers** are rebuild-equivalent WHEN the existing layer
      graphs are exact (built at or under ``EXACT_BUILD_THRESHOLD``,
      the common case — upper layers shrink geometrically): a new
      node's level comes from the same deterministic hash rule, its
      adjacency is its top-``deg`` among the layer's nodes, and each
      existing layer node's adjacency is re-ranked over (its current
      top-deg ∪ its pairs with the new nodes) — which equals the
      top-deg over ALL pairs, because any pair absent from the old
      top-deg is dominated by ``deg`` better pairs that are all
      present in the union. Asserted set-equal to a from-scratch
      build in tests/test_hnsw.py. For a layer that was built with
      nn_descent (above the threshold), the same merge is a MONOTONE
      IMPROVEMENT of that approximate graph (edges only ever get
      better), not exact rebuild parity — the base tier's
      graph_insert recall-audit posture applies there. Cost: ``|new_layer_nodes| · |layer|``
      scorings per layer — and layer populations shrink by
      ``scale^l``, so the expected upper-tier work per inserted row
      is ``N/(scale-1) / N ≈ 1/scale`` of one corpus scan.

    Existing-edge scores are recomputed from the vector table (the
    stored layer adjacency is (layer, node, nbr) only); scoring is the
    JVM fold, so re-ranking reproduces build-time tie-breaks exactly.
    """
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.graph_ann import (
        graph_insert,
    )

    score_fn = _metric_fn(metric)
    new_base = graph_insert(
        vectors, base_graph, new_vectors, k=base_k, metric=metric,
        id_col=id_col, vec_col=vec_col, **graph_insert_kwargs,
    )

    union = vectors.select(id_col, vec_col).unionByName(
        new_vectors.select(id_col, vec_col)
    )
    lv_new = assign_layers(new_vectors, id_col=id_col, scale=scale, max_layer=max_layer)
    lv_all = assign_layers(union, id_col=id_col, scale=scale, max_layer=max_layer)
    out = None
    for layer in range(1, max_layer + 1):
        ln = lv_new.filter(F.col("lvl") >= layer).select(id_col)
        n_new = ln.count()
        old_edges = layer_edges.filter(F.col("layer") == layer).select("node", "nbr")
        if n_new == 0:
            keep = old_edges.select(
                F.lit(layer).alias("layer"), "node", "nbr"
            )
            out = keep if out is None else out.unionByName(keep)
            continue
        la = lv_all.filter(F.col("lvl") >= layer).select(id_col)
        members = union.join(F.broadcast(la), id_col, "left_semi")
        newv = new_vectors.join(F.broadcast(ln), id_col, "left_semi")
        a = members.select(F.col(id_col).alias("node"), F.col(vec_col).alias("__av"))
        b = newv.select(F.col(id_col).alias("nbr"), F.col(vec_col).alias("__bv"))
        # all pairs touching a new node, BOTH directions, self excluded
        fwd = a.join(F.broadcast(b), F.col("node") != F.col("nbr")).select(
            "node", "nbr", score_fn("__av", "__bv").alias("__s")
        )
        rev = fwd.select(
            F.col("nbr").alias("node"), F.col("node").alias("nbr"), "__s"
        )
        # existing edges re-scored from the vectors (same fold as build)
        va = union.select(F.col(id_col).alias("node"), F.col(vec_col).alias("__av"))
        vb = union.select(F.col(id_col).alias("nbr"), F.col(vec_col).alias("__bv"))
        old_scored = (
            old_edges.join(va, "node").join(vb, "nbr")
            .select("node", "nbr", score_fn("__av", "__bv").alias("__s"))
        )
        merged = old_scored.unionByName(fwd).unionByName(rev).dropDuplicates(
            ["node", "nbr"]
        )
        w = Window.partitionBy("node").orderBy(F.desc("__s"), F.asc("nbr"))
        upd = (
            merged.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= deg)
            .select(F.lit(layer).alias("layer"), "node", "nbr")
        )
        out = upd if out is None else out.unionByName(upd)
    if out is None:
        out = layer_edges.select("layer", "node", "nbr")
    return new_base, out


def hnsw_delete(
    vectors: DataFrame,
    base_graph: DataFrame,
    layer_edges: DataFrame,
    doomed: DataFrame,
    base_k: int | None = None,
    deg: int = 8,
    scale: int = HNSW_SCALE,
    max_layer: int = 2,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Delete maintenance for the hierarchy: remove a set of ids so no
    tier can ever surface them. Returns ``(base_graph',
    layer_edges')`` over the surviving corpus.

    * **Base layer** delegates to :func:`..graph_ann.graph_delete`
      (edge removal + 2-hop repair against the live corpus).
    * **Upper layers** repair EXACTLY (the :func:`hnsw_insert`
      symmetry, same exact-built caveat): edges touching a doomed id
      drop; each node that LOST an out-edge re-ranks over (its
      surviving edges ∪ its pairs with the whole surviving layer) —
      i.e. its true top-``deg``, recomputed from ``|damaged| · |layer|``
      scorings, never a layer rebuild. Layer membership of survivors
      is hash-derived, so it never changes under deletes.

    The caller owns entry refresh: :func:`top_entries` is rule-based
    over the surviving corpus (a persisted store would rewrite its
    frozen entry list the same way).
    """
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.graph_ann import (
        graph_delete,
    )

    score_fn = _metric_fn(metric)
    dd = F.broadcast(doomed.select(id_col).distinct())
    survivors = vectors.join(dd, id_col, "left_anti")
    new_base = graph_delete(
        base_graph, doomed.select(id_col), id_col=id_col, vectors=survivors,
        k=base_k, metric=metric, vec_col=vec_col,
    )

    lv = assign_layers(survivors, id_col=id_col, scale=scale, max_layer=max_layer)
    dnode = dd.withColumnRenamed(id_col, "node")
    dnbr = doomed.select(F.col(id_col).alias("nbr")).distinct()
    out = None
    for layer in range(1, max_layer + 1):
        edges = layer_edges.filter(F.col("layer") == layer).select("node", "nbr")
        # damaged = surviving nodes that lose at least one out-edge
        damaged = (
            edges.join(F.broadcast(dnbr), "nbr", "left_semi")
            .select("node").distinct()
            .join(dnode, "node", "left_anti")
        )
        kept = (
            edges.join(dnode, "node", "left_anti")
            .join(F.broadcast(dnbr), "nbr", "left_anti")
        )
        members = survivors.join(
            F.broadcast(
                lv.filter(F.col("lvl") >= layer).select(id_col)
            ),
            id_col,
            "left_semi",
        )
        a = members.join(
            F.broadcast(damaged.withColumnRenamed("node", id_col)), id_col, "left_semi"
        ).select(F.col(id_col).alias("node"), F.col(vec_col).alias("__av"))
        b = members.select(F.col(id_col).alias("nbr"), F.col(vec_col).alias("__bv"))
        repaired = (
            a.join(b, F.col("node") != F.col("nbr"))
            .select("node", "nbr", score_fn("__av", "__bv").alias("__s"))
        )
        w = Window.partitionBy("node").orderBy(F.desc("__s"), F.asc("nbr"))
        fixed = (
            repaired.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= deg)
            .select("node", "nbr")
        )
        upd = (
            kept.join(damaged, "node", "left_anti")
            .unionByName(fixed)
            .select(F.lit(layer).alias("layer"), "node", "nbr")
        )
        out = upd if out is None else out.unionByName(upd)
    if out is None:
        out = layer_edges.select("layer", "node", "nbr")
    return new_base, out


def delete_from_hnsw_index(spark, path: str, ids: list, base_k: int | None = None) -> dict:
    """Right-to-erasure maintenance for a materialized
    :func:`write_hnsw_index` store: apply :func:`hnsw_delete` (exact
    upper-layer repair + base-layer 2-hop repair) and rewrite the
    three tables plus the sidecar — whose frozen entry list is
    re-derived over the survivors, so a doomed entry node can never
    seed another descent. Stored base adjacency is (node, nbr); edge
    scores are recomputed from the vector table for the repair's
    re-ranking (same fold as build). Every frame is
    localCheckpoint-pinned before its own directory is overwritten.
    Idempotent: re-running with the same ids is a no-op. Returns
    ``{"docs_deleted", "entries"}``."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.ann_index import (
        _read_meta,
        _write_meta,
    )

    meta = _read_meta(spark, path)
    if meta.get("kind") != "hnsw":
        raise ValueError(f"not an hnsw index: kind={meta.get('kind')!r}")
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    if not ids:
        return {"docs_deleted": 0, "entries": meta["entries"]}
    from pyspark.sql.types import StructField, StructType

    vectors = spark.read.parquet(f"{path}/vectors")
    doomed = spark.createDataFrame(
        [(i,) for i in ids],
        StructType([StructField(id_col, vectors.schema[id_col].dataType)]),
    ).distinct()
    n_doomed = vectors.join(F.broadcast(doomed), id_col, "left_semi").count()
    if n_doomed == 0:
        return {"docs_deleted": 0, "entries": meta["entries"]}
    base = spark.read.parquet(f"{path}/base")
    layers = spark.read.parquet(f"{path}/layers")
    score_fn = _metric_fn(meta["metric"])
    va = vectors.select(F.col(id_col).alias("node"), F.col(vec_col).alias("__av"))
    vb = vectors.select(F.col(id_col).alias("nbr"), F.col(vec_col).alias("__bv"))
    scored_base = (
        base.join(va, "node").join(vb, "nbr")
        .select("node", "nbr", score_fn("__av", "__bv").alias("score"))
    )
    wr = Window.partitionBy("node").orderBy(F.desc("score"), F.asc("nbr"))
    scored_base = scored_base.withColumn("rank", F.row_number().over(wr))
    new_base, new_layers = hnsw_delete(
        vectors, scored_base, layers, doomed,
        base_k=base_k, deg=int(meta["deg"]), scale=int(meta["scale"]),
        max_layer=int(meta["max_layer"]), metric=meta["metric"],
        id_col=id_col, vec_col=vec_col,
    )
    survivors = vectors.join(F.broadcast(doomed), id_col, "left_anti")
    survivors = survivors.localCheckpoint(eager=True)
    new_base = new_base.select("node", "nbr").localCheckpoint(eager=True)
    new_layers = new_layers.localCheckpoint(eager=True)
    survivors.write.mode("overwrite").parquet(f"{path}/vectors")
    new_base.write.mode("overwrite").parquet(f"{path}/base")
    new_layers.write.mode("overwrite").parquet(f"{path}/layers")
    ents = [
        r[id_col]
        for r in top_entries(
            survivors, id_col=id_col, scale=int(meta["scale"]),
            max_layer=int(meta["max_layer"]),
            # the BUILD-TIME cap, not len(entries): a sparsely-occupied
            # top layer (fewer entries than cap) must not permanently
            # shrink the refresh budget (older sidecars lack the key)
            cap=int(meta.get("entry_cap", max(len(meta["entries"]), 4))),
        ).collect()
    ]
    new_meta = dict(meta)
    new_meta["entries"] = sorted(ents)
    _write_meta(spark, path, new_meta)
    return {"docs_deleted": int(n_doomed), "entries": new_meta["entries"]}


def calibrate_hnsw(
    queries: DataFrame,
    vectors: DataFrame,
    base_graph: DataFrame,
    layer_edges: DataFrame,
    k: int = 10,
    target_recall: float = 0.95,
    configs: tuple = ((1, 1), (1, 2), (2, 2), (4, 2), (4, 3)),
    beam: int = 32,
    rounds: int = 4,
    max_layer: int = 2,
    scale: int = HNSW_SCALE,
    entry_cap: int = 4,
    metric: str = "cosine",
    query_id: str = "qid",
    query_vec: str = "qvec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[tuple[int, int] | None, list[dict]]:
    """Offline descent calibration — the :func:`..graph_ann
    .calibrate_beam` harness applied to the hierarchy's own knobs:
    sweep ``(width, hops)`` configs ascending by descent cost
    (``width·hops``) until recall@k of :func:`hnsw_search` against the
    exact ground truth meets ``target_recall``. The exact kNN is
    computed ONCE and reused across the sweep; each step is one
    batched hierarchical search with the honest two-tier scoring
    count. Returns ``(chosen_config, frontier)`` with one
    ``{"width", "hops", "recall", "n_scored", "scored_per_query"}``
    dict per tried config. Iterative + driver-ranged: pytest-checked,
    no SQL mirror (the documented harness-class precedent)."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import search as S

    q = queries.persist()
    n_q = q.count()
    if n_q == 0:
        q.unpersist()
        return None, []
    exact = S.knn_join(
        q.select(F.col(query_id).alias("qid"), F.col(query_vec).alias(vec_col)),
        vectors, k=k, metric=metric, query_id="qid", query_vec=vec_col,
        id_col=id_col, vec_col=vec_col,
    ).persist()
    exact.count()
    ent = top_entries(
        vectors, id_col=id_col, scale=scale, max_layer=max_layer, cap=entry_cap
    )
    frontier: list[dict] = []
    chosen = None
    try:
        for width, hops in sorted(set(configs), key=lambda c: (c[0] * c[1], c)):
            stats: dict = {}
            approx = hnsw_search(
                q, vectors, base_graph, layer_edges, k=k, beam=beam,
                rounds=rounds, hops=hops, max_layer=max_layer, width=width,
                entries=ent, scale=scale, metric=metric, query_id=query_id,
                query_vec=query_vec, id_col=id_col, vec_col=vec_col,
                stats=stats,
            )
            rec = (
                S.recall_at_k(
                    exact, approx, k=k, by=["qid", "neighbor_id"],
                    fill_missing=True,
                )
                .agg(F.avg("recall"))
                .collect()[0][0]
            )
            rec = float(rec) if rec is not None else 0.0
            frontier.append(
                {
                    "width": width,
                    "hops": hops,
                    "recall": rec,
                    "n_scored": stats["n_scored"],
                    "scored_per_query": stats["n_scored"] / n_q,
                }
            )
            if rec >= target_recall:
                chosen = (width, hops)
                break
    finally:
        q.unpersist()
        exact.unpersist()
    return chosen, frontier
