"""Streaming vector-search serving: the coordinator's continuous
/search loop (reference coordinator/main.py:58-86, driven by
scripts/bench.py:16-35) as a Structured Streaming flow. Parity check:
micro-batched answers == the one-shot batch knn_join over the same
queries."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.search import (
    knn_join,
)
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.streaming import (
    serving as S,
)


def _result_set(df):
    return {
        (r.qid, r.neighbor_id, r.rank, round(r.score, 6)) for r in df.collect()
    }


def test_stream_search_matches_batch(spark, tables):
    """Queries arriving across micro-batches get exactly the batch
    answers: per-qid top-k is independent per query, so the union of
    per-micro-batch results must equal one batch knn_join."""
    corpus = tables["embeddings"].select("vec_id", "embedding").persist()
    queries = (
        tables["embeddings"]
        .filter(F.col("vec_id") < 6)
        .select(F.col("vec_id").alias("qid"), "embedding")
    )

    tmp = tempfile.mkdtemp(prefix="stream_search_")
    try:
        src, sink = tmp + "/src", tmp + "/sink"
        # two separate appends → two files → maxFilesPerTrigger=1 forces
        # (at least) two micro-batches
        queries.filter(F.col("qid") < 3).coalesce(1).write.mode("append").parquet(src)
        queries.filter(F.col("qid") >= 3).coalesce(1).write.mode("append").parquet(src)

        batch_ids: list[int] = []

        def sink_fn(hits, batch_id):
            batch_ids.append(batch_id)
            hits.write.mode("append").parquet(sink)

        q = S.stream_search(
            spark,
            src,
            corpus,
            sink_fn,
            k=5,
            reader_options={"maxFilesPerTrigger": 1},
        )
        q.processAllAvailable()
        q.stop()

        assert len(batch_ids) >= 2  # really served incrementally
        got = _result_set(spark.read.parquet(sink))
        expect = _result_set(knn_join(queries, corpus, k=5))
        assert got == expect
    finally:
        corpus.unpersist()
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_search_custom_search_fn(spark, tables):
    """ANN-backed serving: search_fn swaps the per-micro-batch
    retrieval — here a tiny exact closure tagging its own rank — and
    the sink sees exactly its output."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.search import (
        knn_join_expr,
    )

    corpus = tables["embeddings"].select("vec_id", "embedding")
    queries = (
        tables["embeddings"]
        .filter(F.col("vec_id") < 3)
        .select(F.col("vec_id").alias("qid"), "embedding")
    )
    tmp = tempfile.mkdtemp(prefix="stream_search_fn_")
    try:
        src, sink = tmp + "/src", tmp + "/sink"
        queries.write.mode("overwrite").parquet(src)

        def ann(batch_df):
            return knn_join_expr(
                batch_df, corpus, k=4, query_vec="embedding"
            )

        def sink_fn(hits, batch_id):
            hits.write.mode("append").parquet(sink)

        q = S.stream_search(spark, src, corpus, sink_fn, search_fn=ann)
        q.processAllAvailable()
        q.stop()
        got = _result_set(spark.read.parquet(sink))
        expect = _result_set(knn_join_expr(queries, corpus, k=4, query_vec="embedding"))
        assert got == expect
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_search_to_parquet_smoke(spark, tables):
    corpus = tables["embeddings"].select("vec_id", "embedding")
    queries = (
        tables["embeddings"]
        .filter(F.col("vec_id") < 2)
        .select(F.col("vec_id").alias("qid"), "embedding")
    )
    tmp = tempfile.mkdtemp(prefix="stream_search_pq_")
    try:
        src, sink = tmp + "/src", tmp + "/sink"
        queries.write.mode("overwrite").parquet(src)
        q = S.stream_search_to_parquet(spark, src, corpus, sink, k=3)
        q.processAllAvailable()
        q.stop()
        out = spark.read.parquet(sink)
        assert out.count() == 2 * 3
        assert set(out.columns) == {"qid", "neighbor_id", "score", "rank"}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_search_range_join_serving(spark, tables):
    """r13: continuous RADIUS serving through the existing search_fn
    seam — each micro-batch answered by range_join; the streamed union
    equals the one-shot batch result (per-pair predicate, no
    cross-batch interaction by construction)."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.search import (
        range_join,
    )

    corpus = tables["embeddings"].select("vec_id", "embedding").persist()
    q = corpus.filter(F.col("vec_id") % 61 == 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding")
    )
    t = 0.25
    tmp = tempfile.mkdtemp(prefix="stream_range_")
    try:
        src = tmp + "/src"
        q.write.mode("append").parquet(src)
        got: list = []
        stream = S.stream_search(
            spark, src, corpus,
            lambda df, bid: got.extend(df.collect()),
            search_fn=lambda batch: range_join(
                batch, corpus, t, query_vec="embedding"
            ),
        )
        stream.processAllAvailable()
        stream.stop()
        want = {
            (r.qid, r.neighbor_id, round(r.score, 6))
            for r in range_join(q, corpus, t, query_vec="embedding").collect()
        }
        assert {(r.qid, r.neighbor_id, round(r.score, 6)) for r in got} == want
        assert want  # non-trivial
    finally:
        corpus.unpersist()
        shutil.rmtree(tmp, ignore_errors=True)
