"""Graph analytics over relational interaction data: co-purchase edge
extraction, degree statistics, triangle counting, and fixed-iteration
PageRank — the graph half of the recommendation/link-analysis toolbox
next to :func:`~.relational.item_cooccurrence` (co-visitation) and
:func:`~.dedup.dedup_clusters` (connected components).

All operators are pure DataFrame compositions; the graph is an edge
frame ``(src, dst, weight)`` with canonical ``src < dst`` for the
undirected operators, so each undirected edge is stored once and
symmetrized only where an algorithm needs both directions.

Scale shapes (the usual distributed-graph hazards, addressed up
front):

* **edge extraction** caps items per container BEFORE the pair
  self-join (same quadratic-blowup guard as ``item_cooccurrence``);
* **triangle counting** joins edges in canonical orientation only
  (``a<b<c``), so every triangle is generated exactly once and the
  wedge join is driven by the smaller oriented-edge frame, never the
  full symmetric blowup;
* **PageRank** is the standard power iteration: out-degree computed
  once and persisted, each round one join + one groupBy keyed on the
  node id, rank frame localCheckpoint-pinned per round so the lineage
  (and replanned shuffles) can't stack across iterations.

Reference parity note: the reference engine (a flat vector store,
SURVEY.md §1) has no graph surface; these belong to the mandated
large-scale-training-pipeline extensions (web-graph quality signals à
la PageRank-style corpus weighting in public CommonCrawl pipelines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "copurchase_edges",
    "association_rules",
    "node_degrees",
    "degree_histogram",
    "triangle_count",
    "pagerank",
    "connected_components",
    "label_propagation",
    "shortest_paths",
    "personalized_pagerank",
    "kcore",
]


def _capped_order_items(
    lineitem: DataFrame,
    max_items_per_order: int,
    order_col: str,
    item_col: str,
) -> DataFrame:
    """The shared anti-quadratic ladder: distinct (order, item), then a
    deterministic per-order item cap (item-asc) so a pathological
    basket contributes at most cap² pairs downstream."""
    oi = (
        lineitem.select(F.col(order_col).alias("o"), F.col(item_col).alias("item"))
        .filter(F.col("item").isNotNull())
        .distinct()
    )
    w = Window.partitionBy("o").orderBy(F.asc("item"))
    return (
        oi.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_items_per_order)
        .drop("__rn")
    )


def copurchase_edges(
    lineitem: DataFrame,
    min_weight: int = 1,
    max_items_per_order: int = 20,
    order_col: str = "l_orderkey",
    item_col: str = "l_partkey",
) -> DataFrame:
    """Undirected co-purchase edges from an order log: parts appearing
    in the same order, weighted by the number of co-orders. Canonical
    orientation ``src < dst`` — one row per undirected edge.

    Same anti-quadratic ladder as ``item_cooccurrence``: distinct
    (order, item) first, per-order item cap second (deterministic
    item-asc), pair self-join third — a pathological basket contributes
    at most cap² pairs. Returns ``(src, dst, weight)``.
    """
    capped = _capped_order_items(lineitem, max_items_per_order, order_col, item_col)
    a = capped.withColumnRenamed("item", "src")
    b = capped.withColumnRenamed("item", "dst")
    return (
        a.join(b, "o")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("weight"))
        .filter(F.col("weight") >= min_weight)
    )


def association_rules(
    lineitem: DataFrame,
    min_weight: int = 2,
    max_items_per_order: int = 20,
    order_col: str = "l_orderkey",
    item_col: str = "l_partkey",
) -> DataFrame:
    """Market-basket association rules over the co-purchase pairs:
    directed ``src → dst`` with

    * ``support``    = P(src ∧ dst)      = co-orders / N
    * ``confidence`` = P(dst | src)      = co-orders / orders(src)
    * ``lift``       = confidence / P(dst)

    — the recommendation/assortment staple on top of
    :func:`copurchase_edges` (lift > 1 ⇒ genuinely associated, not
    just popular).

    Scale shape: the same distinct→cap→self-join ladder bounds the
    pair blowup; per-item order counts are one partial agg; the order
    total is a 1-row aggregate broadcast back; the metric joins are
    item-keyed equi-joins of the PAIR frame (bounded by surviving
    pairs, never the fact table). Both rule directions come from one
    undirected pair frame. Returns
    ``(src, dst, n_co, support, confidence, lift)``.
    """
    capped = _capped_order_items(lineitem, max_items_per_order, order_col, item_col)
    a = capped.withColumnRenamed("item", "src")
    b = capped.withColumnRenamed("item", "dst")
    pairs = (
        a.join(b, "o")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= min_weight)
    )
    directed = pairs.unionByName(
        pairs.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "n_co"
        )
    )
    item_n = capped.groupBy(F.col("item")).agg(F.count(F.lit(1)).alias("__n"))
    tot = capped.agg(F.count_distinct("o").alias("__N"))
    out = (
        directed.join(item_n.select(F.col("item").alias("src"), F.col("__n").alias("__ns")), "src")
        .join(item_n.select(F.col("item").alias("dst"), F.col("__n").alias("__nd")), "dst")
        .crossJoin(F.broadcast(tot))
    )
    conf = F.col("n_co") / F.col("__ns")
    return out.select(
        "src",
        "dst",
        "n_co",
        (F.col("n_co") / F.col("__N")).alias("support"),
        conf.alias("confidence"),
        (conf * F.col("__N") / F.col("__nd")).alias("lift"),
    )


def node_degrees(edges: DataFrame) -> DataFrame:
    """Per-node degree of a canonical (src<dst) undirected edge frame:
    one union of the two endpoint projections, one groupBy — the
    symmetric edge list is never materialized. Returns
    ``(node, degree)``."""
    ends = edges.select(F.col("src").alias("node")).unionAll(
        edges.select(F.col("dst").alias("node"))
    )
    return ends.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))


def degree_histogram(edges: DataFrame) -> DataFrame:
    """Degree distribution ``(degree, n_nodes)`` — the shape report
    (power-law check, skew early-warning for the joins downstream).
    Two tiny aggregations on top of :func:`node_degrees`."""
    return (
        node_degrees(edges)
        .groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("degree")
    )


def triangle_count(edges: DataFrame, orient: str = "id") -> DataFrame:
    """Global triangle count of a canonical undirected edge frame.

    Classic oriented wedge-close: with every edge oriented by a total
    order ``≺``, a triangle ``a≺b≺c`` is found exactly once by joining
    ``(a,b) ⋈ (b,c)`` (wedge at ``b``) against ``(a,c)``. Two
    equi-join shuffles on node keys; one scalar count out. Returns a
    1-row frame ``(n_triangles)``.

    ``orient`` picks the total order — the count is identical (parity
    pytest-asserted), only the wedge distribution changes:

    * ``"id"`` — the stored ``src < dst`` orientation, zero prep work;
      what the oracle-mirrored contract entry runs.
    * ``"degree"`` — re-orient each edge low-degree → high-degree
      endpoint (ties by id): the standard hub guard for power-law
      graphs at scale, bounding every node's out-orientation at
      O(√|E|) so no hub owns a quadratic wedge set (a low-id hub under
      id-orientation does). Costs one degree aggregate + two joins of
      the edge frame against the (node, degree) frame — linear
      equi-key work, the right trade once the graph is hub-heavy.
    """
    e = edges.select("src", "dst")
    if orient == "degree":
        deg = node_degrees(e)
        ds = deg.select(F.col("node").alias("src"), F.col("degree").alias("__ds"))
        dd = deg.select(F.col("node").alias("dst"), F.col("degree").alias("__dd"))
        ed = e.join(ds, "src").join(dd, "dst")
        low_first = (F.col("__ds") < F.col("__dd")) | (
            (F.col("__ds") == F.col("__dd")) & (F.col("src") < F.col("dst"))
        )
        e = ed.select(
            F.when(low_first, F.col("src")).otherwise(F.col("dst")).alias("src"),
            F.when(low_first, F.col("dst")).otherwise(F.col("src")).alias("dst"),
        )
    ab = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    ac = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    wedges = ab.join(bc, "b")
    return (
        wedges.join(ac, ["a", "c"])
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    directed: bool = False,
    weight_col: str | None = None,
    _pin_every: int = 1,
    _coalesce: int | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank power method. ``directed=False``
    (default) symmetrizes the canonical edge frame first, so every
    node both emits and receives and the dangling-mass term vanishes
    (every node has degree ≥ 1 by construction — it appears in an
    edge). ``directed=True`` builds the node universe from
    ``src ∪ dst`` — sink-only nodes are ranked, not dropped — and the
    rank mass sitting on dangling nodes (no out-edges) is
    redistributed uniformly each iteration, so ranks always sum to 1
    up to float error.

    Per iteration: one join rank⋈edges on the emitting node, one
    groupBy on the receiving node — both shuffles keyed on node id,
    partial-aggregated. The edge+degree frame is computed once and
    persisted; the rank frame is ``localCheckpoint``-pinned every
    round so iteration ``k`` replans against a materialized ``k−1``
    instead of an ever-deepening lineage (the same pinning rule as the
    connected-components pointer jumping in dedup.py). ``iters`` is
    deliberately a fixed small constant — rank ordering stabilizes in
    a few rounds and a fixed count keeps the result oracle-mirrorable.

    ``weight_col`` switches to WEIGHTED PageRank: each node spreads
    its rank proportionally to edge weights (``w(u,v) / Σ_v w(u,·)``
    instead of ``1/out_degree``) — the natural reading on a
    co-purchase graph where weight = co-order count. Same plan shape:
    the degree frame just sums weights instead of counting edges.
    Edges with null or non-positive weight carry no mass: they are
    dropped from the emission frame (so a node whose out-weights are
    all ≤ 0 / null has no ``__deg`` row and falls into the dangling
    redistribution path instead of silently NULL-ing its rank out of
    the system), but such nodes still count in the node universe.

    The dangling-mass aggregate (one left-anti agg + broadcast
    crossJoin per iteration) only runs when dangling nodes can exist:
    a single upfront ``deg.count()`` vs ``n_nodes`` comparison proves
    their absence — always so in the unweighted undirected case,
    where symmetrization gives every node out-degree ≥ 1 — and the
    per-iteration term is skipped entirely, since the emitting-node
    set is fixed across iterations.

    Returns ``(node, rank)``; ranks sum to 1 up to float error.
    """
    wcol = (
        F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    ).alias("w")
    if directed:
        em = edges.select("src", "dst", wcol)
    else:
        em = edges.select("src", "dst", wcol).unionAll(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), wcol
            )
        )
    # node universe = src ∪ dst OVER THE UNFILTERED frame: sink-only
    # nodes (directed) and zero/null-weight-only emitters are real
    # nodes and must carry rank.  Under undirected symmetrization the
    # union is redundant but cheap (distinct over the edge frame).
    nodes = (
        em.select("src")
        .unionAll(em.select(F.col("dst").alias("src")))
        .distinct()
        .persist()
    )
    if weight_col is not None:
        # null > 0 is null → filtered; null/zero/negative weights
        # spread no mass, and their emitters become dangling.
        em = em.filter(F.col("w") > 0)
    em = em.persist()
    deg = em.groupBy("src").agg(F.sum("w").alias("__deg")).persist()
    # NOTE (r8): hoisting the iteration-invariant w/Σw fraction into a
    # pre-joined cached frame was MEASURED SLOWER (8.3 s vs 4.7 s at
    # the 10× probe): em and deg are already cached and the
    # per-iteration deg join is a near-free broadcast into the cached
    # em scan, while the pre-joined frame adds a materialization
    # barrier and a wider cache. Keep the per-iteration join.
    n_nodes = nodes.count()
    if n_nodes == 0:
        em.unpersist()
        nodes.unpersist()
        deg.unpersist()
        return edges.sparkSession.createDataFrame([], "node long, rank double")
    # the emitting-node set is iteration-invariant, so "no dangling
    # nodes" is decidable once: every node has a degree row.
    has_dangling = deg.count() < n_nodes
    # _pin_every / _coalesce: the round-10 verdict #8 measurement
    # (tools/idle_pagerank_probe.py, interleaved 10x probe, BASELINE
    # r11): pin-every-other (`_pin_every=2`) is a WASH (7.54 vs
    # 7.58 s) — keep the audited every-round pin; coalescing the
    # node-sized rank frame before the pin is a consistent ~10% win
    # (6.86 vs 7.58 s — 32 µs-tasks collapsed to a few). The default
    # derives the partition count from n_nodes (~500k rows/task), so
    # at probe scale it coalesces hard while a billion-node graph
    # keeps full parallelism — scale-correct, not a local[32] tune.
    # `_coalesce=0` disables; an explicit int overrides.
    if _coalesce is None:
        _coalesce = max(1, -(-n_nodes // 500_000))
    ncur = int(
        edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    base = (1.0 - damping) / n_nodes
    ranks = nodes.select("src", F.lit(1.0 / n_nodes).alias("rank"))
    for _it in range(iters):
        contrib = (
            ranks.join(em, "src")
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") * F.col("w") / F.col("__deg")).alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        new_ranks = nodes.join(contrib, F.col("src") == F.col("node"), "left")
        if has_dangling:
            # mass sitting on dangling nodes (no out-edges) would leak
            # out of the system — collect it as a 1-row scalar and
            # redistribute uniformly (the classic dangling-mass term).
            dangling = ranks.join(deg, "src", "left_anti").agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dang")
            )
            new_ranks = new_ranks.crossJoin(F.broadcast(dangling)).select(
                "src",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce("__in", F.lit(0.0)) + F.col("__dang") / n_nodes)
                ).alias("rank"),
            )
        else:
            new_ranks = new_ranks.select(
                "src",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("__in", F.lit(0.0))
                ).alias("rank"),
            )
        if _coalesce and _coalesce < ncur:
            new_ranks = new_ranks.coalesce(_coalesce)
        if (_it + 1) % max(_pin_every, 1) == 0 or _it == iters - 1:
            ranks = new_ranks.localCheckpoint(eager=True)
        else:
            ranks = new_ranks
    out = ranks.select(F.col("src").alias("node"), "rank")
    em.unpersist()
    nodes.unpersist()
    deg.unpersist()
    return out


def connected_components(edges: DataFrame, max_iter: int = 10) -> DataFrame:
    """Connected components of an undirected edge frame: every node
    labeled with the minimum node id reachable from it — the general
    graph-clustering primitive (the dedup near-dup collapse is this
    exact algorithm; this adapter gives the graph module the
    first-class surface).

    Delegates to the pointer-jumping label propagation in
    ``dedup.dedup_clusters``: each round one shuffle, chain length
    halves per round (diameter ≤ 2^max_iter converges), labels
    localCheckpoint-pinned per round. Returns ``(node, component)``.
    """
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.dedup import (
        dedup_clusters,
    )

    pairs = edges.select(F.col("src").alias("id_a"), F.col("dst").alias("id_b"))
    out = dedup_clusters(pairs, max_iter=max_iter)
    return out.select(
        F.col("doc_id").alias("node"), F.col("canonical_id").alias("component")
    )


def label_propagation(edges: DataFrame, iters: int = 4) -> DataFrame:
    """Synchronous label-propagation communities (Raghavan et al. 2007)
    over an undirected edge frame: every node starts labeled with its
    own id; each round it adopts the most frequent label among its
    neighbors, ties broken by the SMALLEST label. Densely connected
    groups converge to one label (the community id) while sparse
    bridges don't carry enough votes to merge them — the standard
    step past connected components when one bridge edge shouldn't
    collapse two communities (the co-purchase case: one shared order
    must not merge two product families).

    A FIXED number of synchronous rounds with a deterministic
    tie-break makes the result exactly reproducible — and therefore
    oracle-mirrorable round for round — where classic asynchronous
    LPA is run-order-dependent by construction (sync LPA may
    oscillate on bipartite structures rather than converge; the fixed
    round count makes even that deterministic).

    Scale shape: per round ONE join of the label frame against the
    persisted symmetrized edges (both keyed on node id) and one
    (node, label) count + per-node argmax — all equi-key partial-agged
    shuffles; no window over the full graph, no driver collect. The
    label frame is localCheckpoint-pinned per round (the pagerank /
    pointer-jumping rule: iteration k replans against a materialized
    k−1, and RangePartitioner-free plans stay flat). Returns
    ``(node, label)``.
    """
    und = edges.select("src", "dst").unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    labels = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        msgs = und.join(
            labels.select(F.col("node").alias("__nbr"), "label"),
            F.col("dst") == F.col("__nbr"),
        ).select(F.col("src").alias("node"), "label")
        counts = msgs.groupBy("node", "label").agg(F.count(F.lit(1)).alias("__cnt"))
        # per-node argmax by (count desc, label asc): max over the
        # struct (cnt, -label) — no window, plain partial-agged groupBy
        labels = (
            counts.groupBy("node")
            .agg(
                F.max(
                    F.struct(F.col("__cnt").alias("c"), (-F.col("label")).alias("nl"))
                ).alias("__b")
            )
            .select("node", (-F.col("__b.nl")).cast("long").alias("label"))
            .localCheckpoint(eager=True)
        )
    und.unpersist()
    return labels


def shortest_paths(
    edges: DataFrame,
    source,
    iters: int = 6,
    weight_col: str | None = None,
) -> DataFrame:
    """Single-source shortest paths by fixed-round distributed
    Bellman-Ford over an undirected edge frame: ``iters`` synchronous
    relaxation rounds give exact shortest distances among paths of
    ≤ ``iters`` hops (full convergence when ``iters`` ≥ graph
    diameter; a fixed round count keeps the result deterministic and
    oracle-mirrorable either way — the LPA/PageRank discipline).
    Edge cost is ``1/weight_col`` when given (heavier co-purchase
    ties = closer products), else 1 (hop distance).

    Per round: ONE join of the current distance frontier against the
    persisted symmetrized edges + a union with the kept distances and
    a per-node min — equi-key partial-agged shuffles only; unreached
    nodes simply don't appear yet, so early rounds touch frontier-
    sized frames, not the graph. Distances are single IEEE adds per
    relaxation of deterministic inputs, so both engines compute
    bit-identical sums path for path. The frame is
    localCheckpoint-pinned per round. Returns ``(node, dist)`` for
    nodes within ``iters`` hops of ``source``.

    Edges with a zero or NULL weight are DROPPED when ``weight_col``
    is given: ``1/0`` is Infinity and ``1/NULL`` is a NULL cost that
    silently swallows every relaxation through the edge (the pagerank
    zero-weight-emitter guard, applied to the cost transform).
    """
    base = (
        edges.filter(F.col(weight_col).cast("double") > 0)
        if weight_col
        else edges
    )
    w = (
        (F.lit(1.0) / F.col(weight_col).cast("double"))
        if weight_col
        else F.lit(1.0)
    ).alias("w")
    und = base.select("src", "dst", w).unionAll(
        base.select(F.col("dst").alias("src"), F.col("src").alias("dst"), w)
    ).persist()
    spark = edges.sparkSession
    dist = spark.createDataFrame([(source, 0.0)], "node long, dist double")
    for _ in range(iters):
        relaxed = und.join(
            dist.select(F.col("node").alias("__u"), "dist"),
            F.col("src") == F.col("__u"),
        ).select(F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("dist"))
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    und.unpersist()
    return dist


def personalized_pagerank(
    edges: DataFrame,
    seeds: list,
    iters: int = 3,
    damping: float = 0.85,
    weight_col: str | None = None,
) -> DataFrame:
    """Personalized PageRank: random walks that RESTART at the seed
    set instead of teleporting uniformly — "what's related to THESE
    products" proximity on the co-purchase graph (the graph-side
    sibling of the seed-set centroid expansion in
    search.more_like_these). Fixed iterations, undirected
    symmetrization (every node emits, so no dangling term), same
    ``rank·w/deg`` emission expression as :func:`pagerank` so the two
    stay float-order-consistent.

    The scale win over global PageRank: the rank frame starts at
    |seeds| rows and grows only with the REACHED neighborhood (k hops
    after k rounds) — on a 100 TB graph the per-iteration join touches
    frontier-sized frames, not the node universe. Per round one
    frontier⋈edges join + per-node sum, checkpoint-pinned. Returns
    ``(node, score)``, scores summing to ≤ 1 (mass not yet walked
    back to the frontier's edge stays unassigned)."""
    wcol = (
        F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    ).alias("w")
    em = edges.select("src", "dst", wcol).unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), wcol)
    ).persist()
    deg = em.groupBy("src").agg(F.sum("w").alias("__deg")).persist()
    spark = edges.sparkSession
    sv = 1.0 / len(seeds)
    seed_df = spark.createDataFrame(
        [(int(s), sv) for s in seeds], "node long, seed double"
    )
    ranks = seed_df.select("node", F.col("seed").alias("rank"))
    for _ in range(iters):
        contrib = (
            ranks.join(em, F.col("node") == F.col("src"))
            .join(deg, "src")
            .select(
                F.col("dst").alias("__n"),
                (F.col("rank") * F.col("w") / F.col("__deg")).alias("__c"),
            )
            .groupBy("__n")
            .agg(F.sum("__c").alias("__in"))
        )
        ranks = (
            contrib.join(seed_df, F.col("__n") == F.col("node"), "full")
            .select(
                F.coalesce(F.col("__n"), F.col("node")).alias("node"),
                (
                    F.lit(1.0 - damping) * F.coalesce("seed", F.lit(0.0))
                    + F.lit(damping) * F.coalesce("__in", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    em.unpersist()
    deg.unpersist()
    return ranks.select("node", F.col("rank").alias("score")).orderBy(
        F.desc("score"), F.asc("node")
    )


def kcore(edges: DataFrame, k: int = 2, iters: int = 8) -> DataFrame:
    """The k-core of an undirected edge frame: the maximal subgraph in
    which every node has degree ≥ k, found by iterative peeling
    (Seidman 1983) — repeatedly delete nodes of degree < k until none
    remain. The dense-backbone extractor: pendant chains and loosely
    attached fringe fall away while the cohesive center (which is what
    recommendation/fraud neighborhoods care about) survives; a single
    bridge can hold two components together but never inflates a
    2-core the way it corrupts connected components.

    A FIXED number of synchronous peel rounds keeps the result
    deterministic and oracle-mirrorable round for round (the LPA /
    Bellman-Ford discipline); when a round deletes nothing the
    remaining rounds are no-ops, so ``iters`` ≥ the peel depth gives
    the exact k-core — peel depth is typically tiny (each round must
    delete ≥ 1 node to matter, and cascades shorten fast on real
    graphs).

    Scale shape: per round one degree aggregation (equi-key,
    partial-agged) + two semi-joins of the shrinking edge frame
    against the ≥k node set — no windows over the graph, no driver
    collect; the edge frame only ever shrinks, and each round is
    localCheckpoint-pinned so round r replans against a materialized
    r−1 (the pagerank rule). Returns ``(node, core_deg)`` — nodes in
    the k-core with their degree WITHIN the core subgraph.
    """
    und = (
        edges.select("src", "dst")
        .unionAll(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .localCheckpoint(eager=True)
    )
    cur = und
    for _ in range(iters):
        keep = (
            cur.groupBy("src")
            .agg(F.count(F.lit(1)).alias("__deg"))
            .filter(F.col("__deg") >= k)
            .select("src")
        )
        cur = (
            cur.join(keep, "src", "left_semi")
            .join(keep.withColumnRenamed("src", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
    return (
        cur.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("core_deg"))
        .filter(F.col("core_deg") >= k)
    )
