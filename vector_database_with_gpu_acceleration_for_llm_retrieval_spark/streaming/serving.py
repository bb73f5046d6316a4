"""Continuous vector-search serving (the reference's long-lived read
path as a stream).

The reference coordinator is a server answering an unbounded sequence
of ``POST /search`` requests (coordinator/main.py:58-86); its bench
drives exactly that loop (scripts/bench.py:16-35). The Spark-native
equivalent is a Structured Streaming flow: queries arrive on a stream,
each micro-batch is answered with the *batch* kNN operator against the
served collection, and results go to a sink — same logical operator,
incremental driver.

Physical shape per micro-batch: ``foreachBatch`` hands us a plain
DataFrame, so the exact :func:`operators.search.knn_join` plan runs —
broadcast query matrix, one corpus scan, per-batch local top-k prune
before the global per-query window. The corpus should be persisted (or
a partition-pruned ANN/PQ collection) so repeated micro-batches do not
re-read parquet from cold storage; pass it pre-``.persist()``-ed.

Why ``foreachBatch`` and not a stream-static join: per-query top-k
needs a rank window over the scored pairs, which streaming append mode
cannot express — while inside ``foreachBatch`` the full batch toolbox
(windows, mapInPandas, broadcasts) is legal. This is the documented
idiom for reusing batch writers/operators in streams.

Scale: state-free (each query is answered once; no watermarks needed).
Throughput scales with the corpus scan, exactly like the batch path;
latency is micro-batch scheduling (~trigger interval + one knn_join).
The 100 TB serving posture is the materialized ANN/PQ collection as
``corpus`` so each micro-batch reads the probed partitions only.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.search import (
    knn_join,
)

__all__ = ["stream_search", "stream_search_to_parquet", "stream_graph_search"]


def latest_committed_version(spark: SparkSession, graph_path: str) -> int | None:
    """Largest ``version=N`` subdirectory of a versioned snapshot store
    (:func:`.pipeline.stream_graph_index_ingest` layout) that carries a
    ``_SUCCESS`` marker — i.e. the newest FULLY-COMMITTED snapshot.

    Readers must never list the base path with partition discovery
    while the ingest stream is live: a concurrently-writing
    ``version=N+1`` directory would be picked up half-written.  The
    ``_SUCCESS`` gate is the standard Hadoop commit protocol — the
    marker lands only after every task file is moved into place — so
    pinning to the max SUCCESS-marked version gives a consistent
    (corpus, graph) pair under concurrent inserts, at any scale."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    base = jvm.org.apache.hadoop.fs.Path(graph_path)
    fs = base.getFileSystem(conf)
    if not fs.exists(base):
        return None
    best = None
    for st in fs.listStatus(base):
        name = st.getPath().getName()
        if not name.startswith("version="):
            continue
        try:
            v = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if fs.exists(jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")) and (
            best is None or v > best
        ):
            best = v
    return best


def stream_graph_search(
    spark: SparkSession,
    source_dir: str,
    graph_path: str,
    on_batch: Callable[[DataFrame, int], None],
    k: int = 10,
    beam: int = 32,
    rounds: int = 4,
    n_entry: int = 8,
    metric: str = "cosine",
    schema: str = "qid long, qvec array<float>",
    query_id: str = "qid",
    query_vec: str = "qvec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    reader_options: dict | None = None,
    allowed: DataFrame | None = None,
    codebooks: list | None = None,
    rerank: int | None = None,
):
    """Graph-tier continuous serving: answer a stream of query vectors
    with :func:`..operators.graph_ann.graph_beam_search` over the
    NEWEST committed snapshot of a live
    :func:`.pipeline.stream_graph_index_ingest` store — the reference's
    long-lived ``/search`` loop (coordinator/main.py:58-86) composed
    with its insert path, on the serving tier whose per-query cost is
    independent of corpus size.

    Per micro-batch: resolve the latest ``_SUCCESS``-committed
    ``version=N`` (never partition-discover the base path under a
    concurrent writer — see :func:`latest_committed_version`), load
    that one directory (a partition-pruned read: exactly one version's
    files), split it into the (corpus, graph) pair on the ``kind``
    discriminator, run the batched beam search, and hand
    ``(qid, neighbor_id, score, rank, version)`` to ``on_batch`` — the
    ``version`` column is freshness provenance, so downstream can
    audit exactly which index state served each answer (and the parity
    test can replay it in batch mode bit-for-bit).

    Queries arriving between ingest commits are served from the
    previous snapshot — the same read-your-latest-commit semantics the
    reference's in-memory shard gives between inserts.  Empty
    micro-batches skip the snapshot read entirely.

    ``allowed`` (frame of ``id_col``) serves every micro-batch through
    the FILTERED beam search (answers restricted to the allowed set,
    traversal unfiltered — graph_ann.graph_beam_search's ACORN form).
    ``codebooks`` switches scoring to the compressed domain
    (:func:`..operators.graph_ann.graph_beam_search_pq`): each batch's
    snapshot corpus is PQ-encoded once and traversed by ADC, with
    ``rerank`` top answers exactly rescored against the snapshot's
    full vectors — at scale, materialize the codes alongside the
    snapshot instead of re-encoding (the write_pq_index layout); the
    per-batch encode here keeps the serving composition testable
    without a second store.
    """
    from pyspark.sql import functions as F

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        graph_ann as GA,
    )

    def answer(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        latest = latest_committed_version(spark, graph_path)
        if latest is None:
            raise ValueError(
                f"stream_graph_search: no committed version=N snapshot under "
                f"{graph_path}; seed with write_graph_snapshot"
            )
        snap = spark.read.parquet(f"{graph_path}/version={latest}")
        graph = snap.filter(F.col("kind") == "edge").select(
            "node", "nbr", "score", "rank"
        )
        corpus = snap.filter(F.col("kind") == "vec").select(
            F.col("node").alias(id_col), F.col("vec").alias(vec_col)
        )
        if codebooks is not None:
            from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import pq as PQ

            codes = PQ.pq_encode(
                corpus, codebooks, id_col=id_col, vec_col=vec_col
            )
            hits = GA.graph_beam_search_pq(
                batch_df,
                codes,
                codebooks,
                graph,
                k=k,
                beam=beam,
                rounds=rounds,
                n_entry=n_entry,
                rerank=rerank,
                vectors=corpus if rerank is not None else None,
                query_id=query_id,
                query_vec=query_vec,
                id_col=id_col,
                vec_col=vec_col,
                allowed=allowed,
            )
        else:
            hits = GA.graph_beam_search(
                batch_df,
                corpus,
                graph,
                k=k,
                beam=beam,
                rounds=rounds,
                n_entry=n_entry,
                metric=metric,
                query_id=query_id,
                query_vec=query_vec,
                id_col=id_col,
                vec_col=vec_col,
                allowed=allowed,
            )
        on_batch(hits.withColumn("version", F.lit(latest)), batch_id)

    reader = spark.readStream.schema(schema)
    for key, val in (reader_options or {}).items():
        reader = reader.option(key, val)
    stream = reader.parquet(source_dir)
    return stream.writeStream.foreachBatch(answer).outputMode("append").start()


def stream_search(
    spark: SparkSession,
    source_dir: str,
    corpus: DataFrame,
    on_batch: Callable[[DataFrame, int], None],
    k: int = 10,
    metric: str = "cosine",
    schema: str = "qid long, embedding array<float>",
    query_id: str = "qid",
    query_vec: str = "embedding",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    reader_options: dict | None = None,
    search_fn: Callable[[DataFrame], DataFrame] | None = None,
):
    """Answer a file-source stream of query vectors against a static
    ``corpus``; each micro-batch's results (``qid, neighbor_id, score,
    rank``) are handed to ``on_batch(results_df, batch_id)``.

    ``reader_options`` passes through to the file source (e.g.
    ``{"maxFilesPerTrigger": 1}`` to bound per-micro-batch query load).
    ``search_fn`` swaps the retrieval strategy: given the micro-batch's
    query DataFrame it returns the hits frame — e.g. a closure over
    ``pq_rerank_topk`` or ``lsh_topk_indexed`` for ANN-backed serving
    against a materialized index; default is the exact ``knn_join``.
    Returns the started StreamingQuery (caller awaits/stops). Empty
    micro-batches are skipped (no corpus scan).
    """

    def answer(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if search_fn is not None:
            hits = search_fn(batch_df)
        else:
            hits = knn_join(
                batch_df,
                corpus,
                k=k,
                metric=metric,
                query_id=query_id,
                query_vec=query_vec,
                id_col=id_col,
                vec_col=vec_col,
            )
        on_batch(hits, batch_id)

    reader = spark.readStream.schema(schema)
    for key, val in (reader_options or {}).items():
        reader = reader.option(key, val)
    stream = reader.parquet(source_dir)
    return stream.writeStream.foreachBatch(answer).outputMode("append").start()


def stream_search_to_parquet(
    spark: SparkSession,
    source_dir: str,
    corpus: DataFrame,
    sink_dir: str,
    k: int = 10,
    metric: str = "cosine",
    schema: str = "qid long, embedding array<float>",
    **kwargs,
):
    """:func:`stream_search` with a parquet result sink — the serving
    loop as a durable request/response log. Appends are atomic per
    micro-batch (one write job each); replay safety comes from the
    stream checkpoint the caller configures on the returned query."""

    def sink(hits: DataFrame, batch_id: int) -> None:
        hits.write.mode("append").parquet(sink_dir)

    return stream_search(
        spark, source_dir, corpus, sink, k=k, metric=metric, schema=schema, **kwargs
    )
