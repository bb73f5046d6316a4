"""BM25 and reciprocal-rank-fusion semantics."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import lexical


def test_bm25_scores_and_ranks(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark join join join"),        # high tf for 'join'
            (2, "spark join"),                  # both terms, short doc
            (3, "spark window function guide"), # one term
            (4, "nothing relevant here at all"),
        ],
        "doc_id long, text string",
    )
    out = lexical.bm25_topk(docs, "spark join", k=10).collect()
    got = {r.doc_id: r.score for r in out}
    assert 4 not in got            # no matching term → no row
    assert set(got) == {1, 2, 3}
    assert all(s > 0 for s in got.values())
    ranked = [r.doc_id for r in out]
    assert ranked[0] in (1, 2)     # both-term docs beat the one-term doc
    assert ranked[-1] == 3
    # hand-check doc 3: one term 'spark', tf=1
    n, df_spark = 4, 3
    dls = {1: 4, 2: 2, 3: 4, 4: 5}
    avgdl = sum(dls.values()) / n
    idf = math.log(1 + (n - df_spark + 0.5) / (df_spark + 0.5))
    expect = idf * (1 * 2.2) / (1 + 1.2 * (1 - 0.75 + 0.75 * dls[3] / avgdl))
    assert abs(got[3] - expect) < 1e-12


def test_bm25_empty_query_and_k_clamp(spark, tables):
    docs = tables["documents"]
    assert lexical.bm25_topk(docs, "   ", k=5).count() == 0
    assert lexical.bm25_topk(docs, "zzz_not_a_word_zzz", k=5).count() == 0
    assert lexical.bm25_topk(docs, "the", k=10**6).count() <= docs.count()
    # empty corpus: the r13 single-plan rewrite dropped the driver-side
    # n_docs==0 early return — the natural path must still yield an
    # empty frame with the right schema (avgdl NULL never divides rows)
    empty = docs.filter(F.lit(False))
    out = lexical.bm25_topk(empty, "the spark", k=5)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["doc_id", "score"]
    assert lexical.bm25_knn_join(
        empty, spark.createDataFrame([(0, "the spark")], "qid long, qtext string"), k=3
    ).count() == 0


def test_rrf_fuse_prefers_doubly_ranked(spark):
    a = spark.createDataFrame([(10, 1), (20, 2), (30, 3)], "doc_id long, rank int")
    b = spark.createDataFrame([(20, 1), (40, 2)], "doc_id long, rank int")
    out = {r.doc_id: r.rrf_score for r in lexical.rrf_fuse(a, b, k=10).collect()}
    assert set(out) == {10, 20, 30, 40}
    # 20 is in both lists → highest fused score
    assert max(out, key=out.get) == 20
    assert abs(out[20] - (1 / 62 + 1 / 61)) < 1e-15
    assert abs(out[10] - 1 / 61) < 1e-15  # absent list contributes 0


def test_bm25_index_matches_query_time_and_prunes(spark, tables):
    """The materialized lexical index must score identically to the
    query-time path (same constants, same term-ordered fold), and the
    query's terms must prune the postings read to their term-bucket
    partitions at planning time."""
    import shutil
    import tempfile

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.plans.explain import (
        physical_plan,
    )

    docs = tables["documents"]
    tmp = tempfile.mkdtemp(prefix="bm25_idx_")
    try:
        lexical.write_bm25_index(docs, tmp)
        q = "spark join window performance"
        want = [(r.doc_id, round(r.score, 10)) for r in lexical.bm25_topk(docs, q, k=10).collect()]
        got = [
            (r.doc_id, round(r.score, 10))
            for r in lexical.bm25_topk_indexed(spark, tmp, q, k=10).collect()
        ]
        assert got == want and len(got) == 10
        plan = physical_plan(lexical.bm25_topk_indexed(spark, tmp, q, k=10))
        part = plan.split("PartitionFilters:")[1].splitlines()[0]
        assert "term_bucket" in part and " IN " in part  # folded to literal ids
        # empty query and missing terms degrade cleanly
        assert lexical.bm25_topk_indexed(spark, tmp, "", k=5).count() == 0
        assert lexical.bm25_topk_indexed(spark, tmp, "zzzqqqxxx", k=5).count() == 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_linear_fuse_normalizes_and_weights(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.lexical import (
        linear_fuse,
    )

    a = spark.createDataFrame(
        [(1, 10.0), (2, 5.0), (3, 0.0)], "doc_id long, score double"
    )
    b = spark.createDataFrame(
        [(2, 0.9), (3, 0.8), (4, 0.7)], "doc_id long, score double"
    )
    out = {r["doc_id"]: r["fused_score"] for r in linear_fuse(a, b, 0.5, k=10).collect()}
    # doc 1: only in a, normalized 1.0 → 0.5; doc 4: only in b, norm 0 → 0
    assert abs(out[1] - 0.5) < 1e-12
    assert out[4] == 0.0
    # doc 2: a-norm 0.5, b-norm 1.0 → 0.75
    assert abs(out[2] - 0.75) < 1e-12
    # degenerate list (all scores equal) → norm 1.0, no div-by-zero
    c = spark.createDataFrame([(7, 3.0), (8, 3.0)], "doc_id long, score double")
    out2 = {r["doc_id"]: r["fused_score"] for r in linear_fuse(c, b, 1.0, k=10).collect()}
    assert out2[7] == 1.0 and out2[8] == 1.0


def test_bm25_knn_join_matches_per_query(spark, tables):
    from pyspark.sql import functions as F

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.lexical import (
        bm25_knn_join,
        bm25_topk,
    )

    docs = tables["documents"]
    queries = [(1, "spark window join"), (2, "performance data")]
    qdf = spark.createDataFrame(queries, "qid long, qtext string")
    batch = bm25_knn_join(docs, qdf, k=5)
    by_q = {}
    for r in batch.collect():
        by_q.setdefault(r["qid"], []).append((r["doc_id"], round(r["score"], 9)))
    for qid, qtext in queries:
        single = bm25_topk(docs, qtext, k=5).collect()
        assert by_q[qid] == [(r["doc_id"], round(r["score"], 9)) for r in single]
    # the corpus-sized work is query-count-independent: one tokenize,
    # one (doc, term) aggregation; no python, no cross join
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan


def test_bm25_knn_join_max_df_guard(spark):
    from pyspark.sql import functions as F

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.lexical import (
        bm25_knn_join,
        bm25_topk,
    )

    # "common" appears in every doc; "rare0" only in doc 0
    rows = [(i, f"common filler{i} " + ("rare0" if i == 0 else f"word{i}")) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    qdf = spark.createDataFrame([(1, "common rare0")], "qid long, qtext string")
    capped = bm25_knn_join(docs, qdf, k=5, max_df_ratio=0.5).collect()
    # the stop term is dropped: ranking equals the rare-term-only query
    expect = bm25_topk(docs, "rare0", k=5).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in capped] == [
        (r["doc_id"], round(r["score"], 9)) for r in expect
    ]
    # uncapped: every doc is a candidate for the query (the hazard)
    full = bm25_knn_join(docs, qdf, k=50).collect()
    assert len(full) == 20
    assert len(capped) == 1  # only the rare-term match survives scoring


def test_delete_from_bm25_index_scores_match_reduced_corpus(spark, tables, tmp_path):
    """r9 verdict #6 (lexical half): delete docs from the materialized
    BM25 index — postings rows gone, dfreq decremented (df=0 terms
    dropped), sidecar N/avgdl updated EXACTLY, so indexed scores equal
    bm25_topk on the reduced corpus; untouched term buckets stay
    byte-identical."""
    import os

    docs = tables["documents"].select("doc_id", "text").filter("doc_id < 60")
    path = str(tmp_path / "bm25del")
    lexical.write_bm25_index(docs, path)
    doomed = [0, 1, 2]
    # untouched buckets = buckets containing none of the doomed docs
    postings = spark.read.parquet(path + "/postings")
    victim_buckets = {
        r.term_bucket
        for r in postings.filter(F.col("doc_id").isin(doomed))
        .select("term_bucket").distinct().collect()
    }
    untouched = sorted(
        {r.term_bucket for r in postings.select("term_bucket").distinct().collect()}
        - victim_buckets
    )

    def snap(b):
        d = os.path.join(path, "postings", f"term_bucket={b}")
        return [
            (f, os.path.getsize(os.path.join(d, f)), open(os.path.join(d, f), "rb").read())
            for f in sorted(os.listdir(d))
        ]

    before = {b: snap(b) for b in untouched}
    out = lexical.delete_from_bm25_index(spark, path, doomed)
    assert out["docs_deleted"] == 3
    assert sorted(out["touched_buckets"]) == sorted(victim_buckets)
    for b in untouched:
        assert snap(b) == before[b], b
    left = spark.read.parquet(path + "/postings")
    assert left.filter(F.col("doc_id").isin(doomed)).count() == 0
    # indexed scores == query-time scores on the reduced corpus
    reduced = docs.filter(~F.col("doc_id").isin(doomed))
    sample = reduced.select("text").first().text.split()[:3]
    query = " ".join(sample)
    want = [
        (r.doc_id, round(r.score, 6))
        for r in lexical.bm25_topk(reduced, query, k=10).collect()
    ]
    got = [
        (r.doc_id, round(r.score, 6))
        for r in lexical.bm25_topk_indexed(spark, path, query, k=10).collect()
    ]
    assert got == want
    # dfreq never keeps df=0 terms, and guards work
    assert spark.read.parquet(path + "/dfreq").filter("df <= 0").count() == 0
    assert lexical.delete_from_bm25_index(spark, path, [])["docs_deleted"] == 0
    assert lexical.delete_from_bm25_index(spark, path, [10**9])["docs_deleted"] == 0


# r14: part of the fast driver-gate subset (default `pytest` selection
# per pytest.ini; `-m ''` runs the full suite)
import pytest as _pytest

pytestmark = _pytest.mark.driver_gate
