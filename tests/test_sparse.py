"""Sparse-vector (SPLADE-shape) retrieval semantics."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import sparse as SP


def _hand_sparse(text: str) -> dict[int, float]:
    idx, vals = SP.sparse_query_py(text)
    return dict(zip(idx, vals))


def test_sparse_from_text_shape_and_weights(spark):
    docs = spark.createDataFrame(
        [(1, "a b a c"), (2, "b"), (3, "d d d d")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in SP.sparse_from_text(docs).collect()}
    # indices strictly ascending, parallel to values
    for r in rows.values():
        assert list(r.indices) == sorted(r.indices)
        assert len(r.indices) == len(set(r.indices)) == len(r.values)
    # doc 1: a(tf2), b(1), c(1) → weights sqrt(tf)
    d1 = dict(zip(rows[1].indices, rows[1].values))
    assert sorted(d1.values()) == sorted([math.sqrt(2.0), 1.0, 1.0])
    assert rows[3].values == [2.0]  # sqrt(4)
    # matches the driver-side encoder exactly
    assert d1 == _hand_sparse("a b a c")


def test_sparse_topk_dot_product_exact(spark):
    docs = spark.createDataFrame(
        [
            (1, "x x y"),       # q={x,y}: sqrt(2)*1 + 1*1
            (2, "x"),           # 1
            (3, "y y y y"),     # sqrt(4)=2
            (4, "z z"),         # no overlap → absent
        ],
        "doc_id long, text string",
    )
    sv = SP.sparse_from_text(docs)
    qi, qv = SP.sparse_query_py("x y")
    out = {r.doc_id: r.score for r in SP.sparse_topk(sv, qi, qv, k=10).collect()}
    assert set(out) == {1, 2, 3}
    assert abs(out[1] - (math.sqrt(2.0) + 1.0)) < 1e-12
    assert abs(out[2] - 1.0) < 1e-12
    assert abs(out[3] - 2.0) < 1e-12
    # empty query short-circuits
    assert SP.sparse_topk(sv, [], [], k=5).count() == 0


def test_sparse_topk_text_matches_composed_path(spark, tables):
    """The fused rebuild-and-search plan (r13 optimization) returns the
    EXACT rows of sparse_topk(sparse_from_text(docs), ...) — bit-equal
    scores, same ids, same order — including on real-table text and on
    edge docs (blank text, no query overlap)."""
    docs = tables["documents"].limit(300)
    edge = spark.createDataFrame(
        [(90001, ""), (90002, "   "), (90003, "zz zz qq")],
        "doc_id long, text string",
    ).select("doc_id", F.col("text"))
    corpus = docs.select("doc_id", "text").unionByName(edge)
    qi, qv = SP.sparse_query_py("spark window join performance zz")
    composed = SP.sparse_topk(SP.sparse_from_text(corpus), qi, qv, k=8).collect()
    fused = SP.sparse_topk_text(corpus, qi, qv, k=8).collect()
    assert [(r.doc_id, r.score) for r in fused] == [
        (r.doc_id, r.score) for r in composed
    ]
    # empty query short-circuits identically
    assert SP.sparse_topk_text(corpus, [], [], k=5).count() == 0


def test_sparse_knn_join_matches_single_query(spark, tables):
    """Batch result for one query == the single-query operator."""
    docs = tables["documents"].limit(300).cache()
    sv = SP.sparse_from_text(docs)
    qtext = "spark window join performance"
    qi, qv = SP.sparse_query_py(qtext)
    single = [(r.doc_id, round(r.score, 10)) for r in SP.sparse_topk(sv, qi, qv, k=5).collect()]
    qdf = spark.createDataFrame([(0, qtext)], "qid long, text string")
    qsv = SP.sparse_from_text(qdf, id_col="qid")
    batch = SP.sparse_knn_join(qsv, sv, k=5).orderBy("rank").collect()
    assert [(r.doc_id, round(r.score, 10)) for r in batch] == single
    assert [r.rank for r in batch] == list(range(1, len(batch) + 1))


def test_sparse_knn_join_max_df_drops_hot_terms(spark):
    docs = spark.createDataFrame(
        [(i, "common rare" if i == 0 else "common") for i in range(10)],
        "doc_id long, text string",
    )
    sv = SP.sparse_from_text(docs)
    q = SP.sparse_from_text(
        spark.createDataFrame([(0, "common rare")], "qid long, text string"),
        id_col="qid",
    )
    exact = SP.sparse_knn_join(q, sv, k=20).collect()
    assert len(exact) == 10  # every doc matches 'common'
    capped = SP.sparse_knn_join(q, sv, k=20, max_df=5).collect()
    # 'common' (df=10) postings dropped → only doc 0 matches via 'rare'
    assert [(r.doc_id) for r in capped] == [0]
    assert abs(capped[0].score - 1.0) < 1e-12


def test_sparse_index_matches_query_time_and_prunes(spark, tables):
    """Materialized inverted index must score identically to the
    query-time path, prune the postings read to the query's term
    buckets at planning time, and support per-bucket deletes."""
    import shutil
    import tempfile

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.plans.explain import (
        physical_plan,
    )

    docs = tables["documents"].limit(400)
    sv = SP.sparse_from_text(docs)
    qi, qv = SP.sparse_query_py("spark join window performance")
    tmp = tempfile.mkdtemp(prefix="sparse_idx_")
    try:
        SP.write_sparse_index(sv, tmp)
        want = [(r.doc_id, round(r.score, 10)) for r in SP.sparse_topk(sv, qi, qv, k=10).collect()]
        got_df = SP.sparse_topk_indexed(spark, tmp, qi, qv, k=10)
        got = [(r.doc_id, round(r.score, 10)) for r in got_df.collect()]
        assert got == want and len(got) == 10
        plan = physical_plan(SP.sparse_topk_indexed(spark, tmp, qi, qv, k=10))
        part = plan.split("PartitionFilters:")[1].splitlines()[0]
        assert "term_bucket" in part and " IN " in part
        # empty query degrades cleanly
        assert SP.sparse_topk_indexed(spark, tmp, [], [], k=5).count() == 0

        # delete the current top doc → it vanishes, scores of the rest hold
        top_id = got[0][0]
        res = SP.delete_from_sparse_index(spark, tmp, [top_id])
        assert res["docs_deleted"] == 1 and res["rows_deleted"] > 0
        after = [
            (r.doc_id, round(r.score, 10))
            for r in SP.sparse_topk_indexed(spark, tmp, qi, qv, k=10).collect()
        ]
        assert all(d != top_id for d, _ in after)
        survivors = [x for x in want if x[0] != top_id]
        assert after[: len(survivors)] == survivors[: len(after)]
        # idempotent / missing ids
        res2 = SP.delete_from_sparse_index(spark, tmp, [top_id])
        assert res2 == {"rows_deleted": 0, "docs_deleted": 0, "touched_buckets": []}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_sparse_postings_roundtrip(spark):
    docs = spark.createDataFrame([(7, "p q p")], "doc_id long, text string")
    sv = SP.sparse_from_text(docs)
    post = SP.sparse_postings(sv).orderBy("term").collect()
    assert len(post) == 2
    assert {r.doc_id for r in post} == {7}
    hand = _hand_sparse("p q p")
    assert {r.term: r.w for r in post} == hand


def test_stream_sparse_serving_matches_batch(spark, tables):
    """Continuous sparse serving through stream_search's search_fn
    seam: sparse query vectors arriving across micro-batches get
    exactly the batch sparse_knn_join answers (per-qid results are
    query-independent, so the micro-batch union must equal one batch
    join)."""
    import shutil
    import tempfile

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.streaming import (
        serving as SV,
    )

    docs = tables["documents"].limit(300)
    corpus_sv = SP.sparse_from_text(docs).persist()
    queries = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("qid"), F.col("text")
    )
    qsv = SP.sparse_from_text(queries, id_col="qid", text_col="text").persist()

    tmp = tempfile.mkdtemp(prefix="stream_sparse_")
    try:
        src, sink = tmp + "/src", tmp + "/sink"
        qids = sorted(r.qid for r in qsv.select("qid").collect())
        mid = qids[len(qids) // 2]
        qsv.filter(F.col("qid") < mid).coalesce(1).write.mode("append").parquet(src)
        qsv.filter(F.col("qid") >= mid).coalesce(1).write.mode("append").parquet(src)

        batches: list[int] = []

        def sink_fn(hits, batch_id):
            batches.append(batch_id)
            hits.write.mode("append").parquet(sink)

        q = SV.stream_search(
            spark,
            src,
            corpus_sv,
            sink_fn,
            schema="qid long, indices array<bigint>, values array<double>",
            reader_options={"maxFilesPerTrigger": 1},
            search_fn=lambda batch: SP.sparse_knn_join(batch, corpus_sv, k=5),
        )
        q.processAllAvailable()
        q.stop()

        assert len(batches) >= 2
        got = {
            (r.qid, r.doc_id, r.rank, round(r.score, 6))
            for r in spark.read.parquet(sink).collect()
        }
        expect = {
            (r.qid, r.doc_id, r.rank, round(r.score, 6))
            for r in SP.sparse_knn_join(qsv, corpus_sv, k=5).collect()
        }
        assert got == expect
    finally:
        corpus_sv.unpersist()
        qsv.unpersist()
        shutil.rmtree(tmp, ignore_errors=True)


def test_sparse_truncate_keeps_top_m(spark):
    docs = spark.createDataFrame(
        [(1, "a a a b b c d")],  # weights: a=sqrt3, b=sqrt2, c=1, d=1
        "doc_id long, text string",
    )
    sv = SP.sparse_from_text(docs)
    t2 = SP.sparse_truncate(sv, 2).collect()[0]
    assert len(t2.indices) == 2 and list(t2.indices) == sorted(t2.indices)
    assert sorted(t2.values, reverse=True) == sorted(
        [math.sqrt(3.0), math.sqrt(2.0)], reverse=True
    )
    # ties at the boundary break on term asc (deterministic): m=3 keeps
    # exactly one of the two weight-1.0 terms — the smaller hash
    t3 = SP.sparse_truncate(sv, 3).collect()[0]
    ones = [h for h, w in zip(t3.indices, t3.values) if w == 1.0]
    all_ones = sorted(h for h, w in _hand_sparse("a a a b b c d").items() if w == 1.0)
    assert ones == [all_ones[0]]
    # m >= nnz is the identity
    t9 = SP.sparse_truncate(sv, 9).collect()[0]
    assert list(t9.indices) == list(sv.collect()[0].indices)
    import pytest

    with pytest.raises(ValueError):
        SP.sparse_truncate(sv, 0)


def test_sparse_postings_expr_matches_groupby_path(spark, tables):
    """The row-local array-expression encoding (the streaming-safe
    form) must be value-identical to the groupBy form."""
    docs = tables["documents"].limit(100)
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.functions import text as TX

    via_expr = docs.select(
        "doc_id", F.explode(SP.sparse_postings_expr(TX.tokens(F.col("text")))).alias("p")
    ).select("doc_id", F.col("p.term").alias("term"), F.col("p.w").alias("w"))
    via_group = SP.sparse_postings(SP.sparse_from_text(docs))
    a = {(r.doc_id, r.term, round(r.w, 12)) for r in via_expr.collect()}
    b = {(r.doc_id, r.term, round(r.w, 12)) for r in via_group.collect()}
    assert a == b and len(a) > 0


def test_stream_sparse_index_matches_batch(spark, tables):
    """Documents streamed through stream_sparse_index_ingest must
    yield an index whose sparse_topk_indexed answers are identical to
    the query-time sparse_topk over the same corpus — bucket pruning
    surviving the streaming file-sink log."""
    import shutil
    import tempfile

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.plans.explain import (
        physical_plan,
    )
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.streaming import (
        pipeline as P,
    )

    docs = tables["documents"].limit(400).select("doc_id", "text")
    qi, qv = SP.sparse_query_py("spark join window performance")
    tmp = tempfile.mkdtemp(prefix="stream_sparse_idx_")
    try:
        src, idx, ckpt = tmp + "/src", tmp + "/idx", tmp + "/ckpt"
        docs.filter(F.col("doc_id") < 200).write.mode("append").parquet(src)
        docs.filter(F.col("doc_id") >= 200).write.mode("append").parquet(src)

        q = P.stream_sparse_index_ingest(spark, src, idx, ckpt)
        q.processAllAvailable()
        q.stop()

        expect = [
            (r.doc_id, round(r.score, 10))
            for r in SP.sparse_topk(SP.sparse_from_text(docs), qi, qv, k=10).collect()
        ]
        got = [
            (r.doc_id, round(r.score, 10))
            for r in SP.sparse_topk_indexed(spark, idx, qi, qv, k=10).collect()
        ]
        assert got == expect and len(got) == 10
        plan = physical_plan(SP.sparse_topk_indexed(spark, idx, qi, qv, k=10))
        part = plan.split("PartitionFilters:")[1].splitlines()[0]
        assert "term_bucket" in part
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_sparse_quantize_roundtrip_and_bounds(spark):
    docs = spark.createDataFrame(
        [(1, "a a a a b c"), (2, "z")], "doc_id long, text string"
    )
    sv = SP.sparse_from_text(docs)
    sq = SP.sparse_quantize(sv)
    rows = {r.doc_id: r for r in sq.collect()}
    assert all(0 <= c <= 255 for r in rows.values() for c in r.codes)
    # the max coordinate always quantizes to exactly 255 → survives
    assert 255 in rows[1].codes
    dq = {r.doc_id: r for r in SP.sparse_dequantize(sq).collect()}
    orig = {r.doc_id: r for r in sv.collect()}
    for d in orig:
        assert dq[d].indices == orig[d].indices
        for w, w2 in zip(orig[d].values, dq[d].values):
            # quantization error bounded by max_w/510 (half a code step)
            assert abs(w - w2) <= max(orig[d].values) / 510 + 1e-12
    # single-term doc: code 255, exact reconstruction
    assert dq[2].values == orig[2].values


def test_fast_hash_space_self_consistent(spark):
    """hash='fast' (xxhash64) gives the same tf structure in its own
    space: corpus and queries encoded with the same setting retrieve
    identically to the portable space on collision-free vocab."""
    docs = spark.createDataFrame(
        [(1, "x x y"), (2, "x"), (3, "y y")], "doc_id long, text string"
    )
    q = spark.createDataFrame([(0, "x y")], "qid long, text string")
    import pytest

    with pytest.raises(ValueError):
        SP.sparse_from_text(docs, hash="bogus")
    res = {}
    for h in ("portable", "fast"):
        sv = SP.sparse_from_text(docs, hash=h)
        qsv = SP.sparse_from_text(q, id_col="qid", hash=h)
        res[h] = {
            (r.qid, r.doc_id, round(r.score, 10), r.rank)
            for r in SP.sparse_knn_join(qsv, sv, k=3).collect()
        }
    assert res["portable"] == res["fast"]


# r14: part of the fast driver-gate subset (default `pytest` selection
# per pytest.ini; `-m ''` runs the full suite)
import pytest as _pytest

pytestmark = _pytest.mark.driver_gate
