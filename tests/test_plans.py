"""Physical-plan shape assertions (SURVEY.md §4): the scale contract is
what the plan *does*, not what the code intends. Enforced here so a
regression that silently de-optimizes a path fails CI."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
    relational as R,
    search as S,
)
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.plans.explain import (
    assert_plan_contains,
)


def test_topk_compiles_to_take_ordered(tables):
    """Flagship search must be TakeOrderedAndProject — per-partition
    bounded top-k + driver merge, no global sort, no shuffle."""
    df = S.topk(tables["embeddings"], [0.1] * 64, k=10)
    assert_plan_contains(df, "TakeOrderedAndProject", absent=("Exchange",))


def test_pricing_summary_pushes_filter_and_partial_agg(tables):
    plan = assert_plan_contains(
        R.pricing_summary(tables), "HashAggregate", "PushedFilters"
    )
    # the shipdate predicate must reach the parquet scan, not sit in a
    # post-scan Filter only
    assert "l_shipdate" in plan.split("PushedFilters")[1][:200]


def test_pricing_summary_prunes_columns(tables):
    plan = assert_plan_contains(R.pricing_summary(tables), "ReadSchema")
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_comment" not in read_schema  # wide column pruned from scan
    assert "l_quantity" in read_schema


def test_revenue_by_nation_broadcasts_dims(tables):
    plan = assert_plan_contains(R.revenue_by_nation(tables), "BroadcastHashJoin")
    # the only sort-merge-or-shuffle join allowed is lineitem ⋈ orders
    assert plan.count("BroadcastHashJoin") >= 4


def test_join_back_is_broadcast(spark, tables):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import ingest as I

    hits = spark.createDataFrame([(0, "x", 1.0)], "qid int, chunk_id string, score double")
    chunks = I.chunk_documents(tables["documents"], max_words=50)
    df = I.join_back(hits, chunks.withColumnRenamed("chunk_id", "chunk_id"))
    assert_plan_contains(df, "BroadcastHashJoin", absent=("SortMergeJoin",))


def test_anti_join_pushes_date_filter(tables):
    """customers_without_orders: the orderdate filter must reach the
    orders scan, and the join must be an anti join (no full outer
    materialization)."""
    plan = assert_plan_contains(
        R.customers_without_orders(tables), "LeftAnti", "PushedFilters"
    )
    pushed = plan.split("PushedFilters")
    assert any("o_orderdate" in seg[:200] for seg in pushed[1:])


def test_cube_is_single_expand_pass(tables):
    """CUBE compiles to one Expand + Aggregate — no per-grouping-set
    re-scan of orders."""
    import re

    plan = assert_plan_contains(R.order_priority_cube(tables), "Expand")
    # formatted explain prints each node in the tree AND a details
    # section — count scan node headers "(n) Scan parquet"
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1


def test_knn_join_scans_corpus_once(tables):
    """Multi-chunk batch kNN must NOT rescan the corpus per query
    chunk: all chunks ride one broadcast into a single mapInPandas, so
    the plan has exactly one corpus scan and one Python worker stage
    regardless of |Q|/query_chunk."""
    import re

    q = (
        tables["embeddings"]
        .filter(F.col("vec_id") < 8)
        .select(F.col("vec_id").alias("qid"), "embedding")
    )
    # query_chunk=3 → 3 chunks of the 8 queries; still one scan
    df = S.knn_join(q, tables["embeddings"], k=3, query_chunk=3)
    plan = assert_plan_contains(df, "MapInPandas")
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1
    assert len(re.findall(r"^\(\d+\) MapInPandas", plan, re.M)) == 1


def test_bm25_broadcasts_term_stats(tables):
    """BM25: the per-term document-frequency dimension (≤ |q| rows)
    must broadcast — the corpus side never shuffles for that join."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        lexical,
    )

    df = lexical.bm25_topk(tables["documents"], "spark join window", k=5)
    plan = assert_plan_contains(df, "BroadcastHashJoin", "TakeOrderedAndProject")
    assert "SortMergeJoin" not in plan


def test_embeddings_scan_prunes_label(tables):
    """Column pruning: a 2-column projection must not read `label`."""
    df = tables["embeddings"].select("vec_id", "embedding").limit(5)
    plan = assert_plan_contains(df, "ReadSchema")
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "label" not in read_schema


def test_pq_adc_plan_shape(tables):
    """PQ read path: encode is ONE MapInPandas riding the scan (no
    shuffle before it), ADC scoring + top-k stay JVM-side as
    TakeOrderedAndProject — no second Python stage."""
    import re

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        pq as PQ,
    )

    corpus = tables["embeddings"].select("vec_id", "embedding")
    rows = corpus.filter(F.col("vec_id") < 16).orderBy("vec_id").collect()
    books = PQ.codebooks_from_rows([list(r.embedding) for r in rows], 8)
    qvec = rows[0].embedding
    df = PQ.pq_adc_topk(PQ.pq_encode(corpus, books), books, qvec, k=10)
    plan = assert_plan_contains(df, "MapInPandas", "TakeOrderedAndProject")
    assert len(re.findall(r"^\(\d+\) MapInPandas", plan, re.M)) == 1
    # map-only encode + per-partition top-k merge at the driver: the
    # whole single-query PQ search plan needs zero shuffles
    assert "Exchange" not in plan


def test_pii_scrub_is_single_scan_projection(spark):
    """PII counts + redaction + digest must stay one scan, one
    projection: no Exchange, no join, no Python stage."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark import contract

    df = contract.q_pii_scrub(spark, "/root/testdata/sf0.001")
    plan = assert_plan_contains(
        df, "Scan parquet", absent=("Exchange", "Join", "Python")
    )
    tree = plan.split("(1)")[0]  # the tree block, before the node details
    assert tree.count("Scan parquet") == 1


def test_repetition_is_zero_shuffle_projection(tables):
    """All three repetition statistics are per-row expressions over the
    sorted n-gram array — the plan must be one scan with NO Exchange,
    no join, no Python stage (skew-free by construction)."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        textstats as T,
    )

    # fan_out's RoundRobin Exchange (pure parallelism) is allowed; any
    # KEYED exchange (hash/range), join, agg, window, or Python stage
    # would mean the stats left the per-row projection.
    assert_plan_contains(
        T.repetition_stats(tables["documents"]),
        "Scan parquet",
        absent=(
            "hashpartitioning",
            "rangepartitioning",
            "Join",
            "Python",
            "HashAggregate",
            "Window",
        ),
    )


def test_pack_sequences_no_stratum_sequential_window(tables):
    """The data-sized window must partition by (stratum, __pid) — never
    by the stratum alone — so one dominant language can't serialize the
    cumsum through a single task. The only stratum-partitioned window
    allowed is the tiny strata x P offsets frame (input is __ptot)."""
    import re

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        sampling,
    )
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.plans.explain import (
        physical_plan,
    )

    plan = physical_plan(
        sampling.pack_sequences(tables["documents"], seq_len=512, by="lang")
    )
    specs = re.findall(r"windowspecdefinition\(([^)]*)", plan)
    assert specs, plan
    for spec in specs:
        # partition spec = everything before the first ordering term
        part = spec.split(" ASC")[0].split(" DESC")[0]
        if "__pid" in part:
            continue  # the (stratum, __pid)-keyed data window: fine
        # a stratum-only window is only legal over the offsets frame
        assert "__ptot" in spec or "_w" in spec, f"stratum-sequential window: {spec}\n{plan}"


def test_rolling_time_agg_is_single_shuffle_range_frame(tables):
    """One Exchange on the key; the frame must be a RANGE frame on the
    epoch-µs order key (a rows frame would silently change semantics
    on irregular spacing)."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import temporal

    df = temporal.rolling_time_agg(tables["events"])
    plan = assert_plan_contains(df, "RangeFrame")
    # formatted mode lists each node in the tree and the detail section:
    # exactly one Exchange node → it appears in both, keyed on user_id
    assert plan.count("(RangeFrame") >= 1 or "RangeFrame" in plan
    assert "hashpartitioning(user_id" in plan
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1


def test_item_cooccurrence_caps_before_join(tables):
    """The per-user cap must push down as WindowGroupLimit (map-side
    partial BEFORE the shuffle) so a hot user's rows never amplify
    through the exchange; the self-join must be an equi-join, never a
    cartesian."""
    df = R.item_cooccurrence(tables["events"])
    plan = assert_plan_contains(
        df, "WindowGroupLimit", absent=("CartesianProduct",)
    )
    # both the Partial (map-side, pre-shuffle) and Final limits present
    assert plan.count("WindowGroupLimit") >= 2


def test_tfidf_topk_pushes_group_limit(tables):
    """Per-doc top-k must compile to WindowGroupLimit (partial group
    limit before the shuffle), not rank-then-filter over the full
    (doc, term) frame."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import lexical

    df = lexical.tfidf_top_terms(tables["documents"], k=3)
    assert_plan_contains(df, "WindowGroupLimit", absent=("CartesianProduct",))


def test_skew_report_is_take_ordered(tables):
    """The diagnostic must cost one count-shuffle + broadcast totals +
    bounded top-N merge — no global sort."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.plans.partitioning import (
        skew_report,
    )

    df = skew_report(tables["lineitem"], ["l_suppkey"], top_n=10)
    assert_plan_contains(df, "TakeOrderedAndProject")


def test_decayed_sum_single_shuffle(tables):
    """Both windows (per-key min and the cumulative sum) must share one
    hashpartitioning Exchange on the key."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import temporal

    plan = assert_plan_contains(temporal.decayed_sum(tables["events"]), "Window")
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1


def test_plan_summary_structure(tables):
    """plan_summary turns the explain text into assertable numbers."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.plans.explain import (
        plan_summary,
    )

    ps = plan_summary(R.revenue_by_nation(tables))
    assert ps["n_scans"] >= 5  # fact + four dims (broadcast)
    assert ps["joins"].get("BroadcastHashJoin", 0) >= 4
    # AQE plans may defer codegen annotation; the key must exist either way
    assert "wholestage_codegen" in ps
    simple = plan_summary(tables["embeddings"].select("vec_id").limit(3))
    assert simple["n_exchanges"] == 0 and not simple["has_cartesian"]
    assert simple["joins"] == {}


def test_rp_topk_is_codegen_take_ordered(tables):
    """JL projected search: the unrolled projection must stay inside
    whole-stage codegen (no HOF fallback) and compile to the same
    TakeOrderedAndProject shape as the flagship — no Exchange."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        projection as PJ,
    )

    corp = PJ.rp_embed(tables["embeddings"], out_dim=16)
    qp = PJ.rp_project_point([0.1] * 64, out_dim=16)
    df = S.topk(corp, qp, k=10, vec_col="rp")
    plan = assert_plan_contains(df, "TakeOrderedAndProject", absent=("Exchange",))
    # the projection is an Arrow-batched fold (the 1024-term unrolled
    # expression exceeded HotSpot's huge-method JIT limit — round 8);
    # the scoring scan itself must still carry a codegen id
    assert "ArrowEvalPython" in plan and "[codegen id" in plan


def test_hot_keys_uses_take_ordered(tables):
    """The top-N cut must be TakeOrderedAndProject (never a global
    sort of the key-count frame)."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        profiling as PF,
    )

    df = PF.hot_keys(tables["events"], "user_id", top=20)
    assert_plan_contains(df, "TakeOrderedAndProject", "BroadcastNestedLoopJoin")


def test_prefix_jaccard_is_equi_join_only(tables):
    # collide-then-verify must never degrade to a cross product
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import dedup as D

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.plans.explain import (
        physical_plan,
    )

    df = D.prefix_jaccard_pairs(tables["documents"], threshold=0.7)
    plan = physical_plan(df)
    assert any(
        j in plan for j in ("ShuffledHashJoin", "SortMergeJoin", "BroadcastHashJoin")
    ), plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_zorder_stats_is_single_partial_agg(tables):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.layout import (
        zorder_stats,
    )

    plan = assert_plan_contains(
        zorder_stats(tables["lineitem"], "l_partkey", "l_suppkey"),
        "HashAggregate",
        absent=("CartesianProduct", "Generate"),
    )
    # one exchange for the bucket partials, one for the final tiny sort
    assert plan.count("Exchange") <= 4, plan


def test_hll_distinct_shuffles_registers_not_keys(tables):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        sketches as SK,
    )

    plan = assert_plan_contains(
        SK.hll_distinct(tables["lineitem"], "l_partkey"), "HashAggregate"
    )
    # register agg must be partial (map-side combine onto ≤ m rows)
    assert "partial_max" in plan or "partial" in plan.lower(), plan


def test_containment_pairs_no_cross_product(tables):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import dedup as D
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.plans.explain import (
        physical_plan,
    )

    df = D.containment_pairs(tables["documents"], threshold=0.8)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_snm_uses_range_exchange_no_global_window(tables):
    """Sorted-neighborhood's rank must come from the distributed-prefix
    shape: a RANGE exchange + per-partition windows — never a
    single-partition global window over the records."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import dedup as D
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.plans.explain import (
        physical_plan,
    )

    df = D.sorted_neighborhood_pairs(tables["documents"], "lang", "doc_id", window=2)
    plan = physical_plan(df)
    # the range exchange + within-partition window live INSIDE the
    # checkpoint (lineage cut) — what the final plan must show is: the
    # neighborhood join is equi-key, and the only Window nodes operate
    # on the P-row partition-offset ladder (input carries __ptot), not
    # the record frame
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan
    for seg in plan.split("\n\n"):
        if seg.startswith("(") and "Window" in seg.splitlines()[0]:
            assert "__ptot" in seg, seg


def test_ks_test_window_is_on_distinct_value_frame(tables):
    """The KS CDF window must sit ABOVE the distinct-value aggregate —
    the ordered window's input is the domain-bounded frame, not the
    raw table."""
    from pyspark.sql import functions as F
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import stats as ST
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.plans.explain import (
        physical_plan,
    )

    df = ST.ks_test(
        tables["orders"].select(
            F.col("o_totalprice").alias("v"),
            F.when(F.col("o_orderkey") % 2 == 0, "a").otherwise("b").alias("g"),
        ),
        "v",
        "g",
        "a",
        "b",
    )
    plan = physical_plan(df)
    # aggregate runs before (deeper than) the window: HashAggregate must
    # appear in the plan and the Window input must be the agg output
    assert "HashAggregate" in plan and "Window" in plan, plan


def test_mutual_knn_single_corpus_scan(tables):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import search as S2
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.plans.explain import (
        physical_plan,
    )

    df = S2.mutual_knn(tables["embeddings"], k=3)
    plan = physical_plan(df)
    # knn_join's one-scan property must survive the composition
    assert plan.count("Scan parquet") <= 1, plan


def test_stats_high_cardinality_no_global_window(tables):
    """r9 verdict #1: with high_cardinality=True the rank/CDF cumsum
    runs through the distributed prefix — every Window node left in
    the final plan must operate on the P-row partition-offset ladder
    (input carries __ptot), never the distinct-value frame (the
    sorted-neighborhood assertion, applied to the stats wave)."""
    from pyspark.sql import functions as F
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import stats as ST
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.plans.explain import (
        physical_plan,
    )

    src = tables["orders"].select(
        F.col("o_totalprice").alias("v"),
        F.when(F.col("o_orderkey") % 2 == 0, "a").otherwise("b").alias("g"),
    )
    surv = tables["orders"].select(
        (F.col("o_orderkey") % 1000 + 1).cast("double").alias("t"),
        (F.col("o_orderkey") % 2).cast("int").alias("event"),
        F.when(F.col("o_custkey") % 2 == 0, "a").otherwise("b").alias("g"),
    )
    frames = [
        ST.ks_test(src, "v", "g", "a", "b", high_cardinality=True),
        ST.mann_whitney_u(src, "v", "g", "a", "b", high_cardinality=True),
        ST.spearman_corr(
            src.select(F.col("v").alias("x"), (F.col("v") * 2).alias("y")),
            "x",
            "y",
            high_cardinality=True,
        ),
        ST.kaplan_meier(surv, high_cardinality=True),
        ST.logrank_test(surv, high_cardinality=True),
    ]
    for df in frames:
        plan = physical_plan(df)
        for seg in plan.split("\n\n"):
            if seg.startswith("(") and "Window" in seg.splitlines()[0]:
                assert "__ptot" in seg, seg


def test_iterative_graph_ops_final_plans_are_pinned(tables):
    """r9 verdict #8: the pinned-iteration discipline as a regression
    net for the round-9 graph completions (the assertion style that
    caught 4-scan mutual_knn): every per-round localCheckpoint means
    the FINAL plan reads materialized RDDs — zero parquet re-scans of
    the edge source, no cartesians, and no Window over the graph."""
    from pyspark.sql import functions as F
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import graph as G
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.plans.explain import (
        physical_plan,
        plan_summary,
    )

    li = tables["lineitem"].filter(F.col("l_orderkey") % 7 == 0)
    edges = G.copurchase_edges(li, min_weight=1, max_items_per_order=4)
    frames = {
        "label_propagation": G.label_propagation(edges, iters=2),
        "shortest_paths": G.shortest_paths(
            edges, edges.select("src").head()[0], iters=3, weight_col="weight"
        ),
        "ppr": G.personalized_pagerank(
            edges, [edges.select("src").head()[0]], iters=2
        ),
        "kcore": G.kcore(edges, k=2, iters=3),
    }
    for name, df in frames.items():
        plan = physical_plan(df)
        summ = plan_summary(df)
        assert "Scan ExistingRDD" in plan, (name, plan)  # the pin
        assert "Scan parquet" not in plan, (name, plan)  # no source re-scan
        assert not summ["has_cartesian"], (name, plan)
        assert "Window" not in plan, (name, plan)


def test_concordance_and_bootstrap_plan_shapes(tables):
    """The r10 statistics additions keep the module's scale shapes:
    concordance's windows all operate on the bucket grid (partitioned
    by tb/sb — never an unpartitioned window over data), and the
    bootstrap is ONE scan of the fact table with map-side partial
    aggregation, no joins, no windows."""
    from pyspark.sql import functions as F
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import stats as ST
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.plans.explain import (
        physical_plan,
        plan_summary,
    )

    surv = tables["orders"].select(
        (F.col("o_orderkey") % 997 + 1).alias("t"),
        (F.col("o_orderkey") % 2).cast("int").alias("event"),
        (F.col("o_custkey") % 313 + 1).alias("score"),
    )
    ci = ST.concordance_index(surv, "t", "event", "score", m=5)
    plan = physical_plan(ci)
    for seg in plan.split("\n\n"):
        if seg.startswith("(") and "Window" in seg.splitlines()[0]:
            spec = seg
            assert ("windowspecdefinition(sb" in spec) or (
                "windowspecdefinition(tb" in spec
            ), seg

    boot = ST.poisson_bootstrap_ci(
        tables["orders"].select("o_orderkey", "o_totalprice"),
        [],
        "o_totalprice",
        "o_orderkey",
        b=8,
    )
    summ = plan_summary(boot)
    assert summ["n_scans"] == 1, summ
    assert summ["joins"] == {}, summ
    assert not summ["has_cartesian"]
    assert "Window" not in physical_plan(boot)


def test_stats_auto_high_cardinality_routes_continuous_columns(tables):
    """r10 verdict #3: high_cardinality defaults to "auto" — a
    continuous double column routes to the distributed prefix WITHOUT
    the caller passing the flag (sampled distinct-count heuristic),
    while a bounded discrete domain keeps the plain window."""
    from pyspark.sql import functions as F
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import stats as ST
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.plans.explain import (
        physical_plan,
    )

    spark = tables["orders"].sparkSession
    # a genuinely continuous column on an above-sample-size frame
    # (the heuristic deliberately keeps sub-sample inputs windowed —
    # a frame smaller than one sample split is trivially windowable)
    cont = spark.range(20000).select(
        (F.col("id").cast("double") * 1.0000001 + 0.5).alias("v"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("g"),
    )
    df = ST.ks_test(cont, "v", "g", "a", "b")  # no flag
    plan = physical_plan(df)
    assert "__ptot" in plan, plan[:2000]
    for seg in plan.split("\n\n"):
        if seg.startswith("(") and "Window" in seg.splitlines()[0]:
            assert "__ptot" in seg, seg
    # a 9-value discrete domain stays on the plain window (no __ptot)
    disc = spark.range(20000).select(
        (F.col("id") % 9).cast("double").alias("v"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("g"),
    )
    plan_d = physical_plan(ST.ks_test(disc, "v", "g", "a", "b"))
    assert "__ptot" not in plan_d
    # sub-sample-size input stays windowed even when fully unique
    tiny = tables["orders"].select(
        F.col("o_totalprice").alias("v"),
        F.when(F.col("o_orderkey") % 2 == 0, "a").otherwise("b").alias("g"),
    )
    if tiny.count() < 8192:
        assert "__ptot" not in physical_plan(
            ST.ks_test(tiny, "v", "g", "a", "b")
        )


def test_nn_descent_final_plan_is_pinned(tables):
    """nn_descent joins the iterative family: every round pins, so the
    final plan reads materialized RDDs — no parquet re-scan of the
    vector source, no cartesian, no global Window."""
    from pyspark.sql import functions as F
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import search as S2
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.plans.explain import (
        physical_plan,
    )

    g = S2.nn_descent(tables["embeddings"].select("vec_id", "embedding"), k=5, rounds=1)
    plan = physical_plan(g)
    assert "Scan parquet" not in plan, plan[:1500]
    assert "CartesianProduct" not in plan
    assert "Scan ExistingRDD" in plan


def test_sparse_retrieval_plan_shapes(spark, tables):
    """Sparse tier scale contracts: single-query top-k ends in
    TakeOrderedAndProject with no cartesian; the batch join BROADCASTS
    the query postings (corpus side never shuffles before the matched-
    pair groupBy)."""
    from pyspark.sql import functions as F
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import sparse as SP
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.plans.explain import (
        physical_plan,
    )

    docs = tables["documents"].limit(200)
    sv = SP.sparse_from_text(docs)
    qi, qv = SP.sparse_query_py("spark join window")
    plan = physical_plan(SP.sparse_topk(sv, qi, qv, k=5))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    qsv = sv.limit(3).withColumnRenamed("doc_id", "qid")
    plan2 = physical_plan(SP.sparse_knn_join(qsv, sv, k=3))
    assert "BroadcastHashJoin" in plan2
    assert "CartesianProduct" not in plan2


def test_planner_exact_branch_pushes_filter(spark, tables):
    """The planner's pre-filter-exact branch must keep the flagship
    TakeOrderedAndProject and read the corpus once (broadcast semi-join
    on the allowed ids, no cartesian)."""
    from pyspark.sql import functions as F
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import planner as PL
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.plans.explain import (
        physical_plan,
    )

    emb = tables["embeddings"]
    qv = emb.filter(F.col("vec_id") == 0).head()["embedding"]
    allowed = emb.filter(F.col("label") == 1).select("vec_id")
    df = PL.filtered_topk_auto(emb, qv, allowed, k=5, graph=None)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "CartesianProduct" not in plan


# r14: part of the fast driver-gate subset (default `pytest` selection
# per pytest.ini; `-m ''` runs the full suite)
import pytest as _pytest

pytestmark = _pytest.mark.driver_gate
