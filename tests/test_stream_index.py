"""Streaming LSH index maintenance: vectors streamed across
micro-batches land in their bucket partitions; the indexed reader sees
exactly what a batch-built index would, and the partition-pruned read
survives the streaming file-sink log."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
    ann_index as A,
    ingest as I,
    search as S,
)
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.plans.explain import (
    physical_plan,
)
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.streaming import (
    pipeline as P,
)


def test_stream_ivf_index_matches_query_time(spark, tables):
    corpus = tables["embeddings"].select("vec_id", "embedding", F.lit(0).alias("label"))
    normed = I.normalized(corpus)
    qvec = corpus.filter("vec_id = 0").first().embedding
    # frozen centroids = first 4 normalized corpus rows (deterministic)
    cents = [
        (i, list(r.embedding))
        for i, r in enumerate(normed.filter(F.col("vec_id") < 4).orderBy("vec_id").collect())
    ]

    tmp = tempfile.mkdtemp(prefix="stream_ivf_")
    try:
        src, idx, ckpt = tmp + "/src", tmp + "/idx", tmp + "/ckpt"
        corpus.write.mode("append").parquet(src)
        q = P.stream_ivf_index_ingest(spark, src, idx, ckpt, cents, dim=64)
        q.processAllAvailable()
        q.stop()

        expect = S.ivf_topk(normed, qvec, cents, k=10, nprobe=2).collect()
        got = A.ivf_topk_indexed(spark, idx, qvec, k=10, nprobe=2).collect()
        assert [(r.vec_id, round(r.score, 6)) for r in got] == [
            (r.vec_id, round(r.score, 6)) for r in expect
        ]

        plan = physical_plan(A.ivf_topk_indexed(spark, idx, qvec, k=10, nprobe=2))
        assert "PartitionFilters" in plan
        assert "ivf_cell" in plan.split("PartitionFilters:")[1].splitlines()[0]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_lsh_index_matches_batch_index(spark, tables):
    planes = S.random_hyperplanes(n_planes=4, dim=64, seed=7)
    corpus = tables["embeddings"].select("vec_id", "embedding", F.lit(0).alias("label"))
    qvec = corpus.filter("vec_id = 0").first().embedding

    tmp = tempfile.mkdtemp(prefix="stream_lsh_")
    try:
        src, idx, ckpt = tmp + "/src", tmp + "/idx", tmp + "/ckpt"
        # two appends → two micro-batches worth of files
        corpus.filter(F.col("vec_id") < 250).write.mode("append").parquet(src)
        corpus.filter(F.col("vec_id") >= 250).write.mode("append").parquet(src)

        q = P.stream_lsh_index_ingest(spark, src, idx, ckpt, planes, dim=64)
        q.processAllAvailable()
        q.stop()

        # the live index answers identically to the query-time ANN over
        # the same (normalized) corpus
        expect = S.lsh_topk(
            I.normalized(corpus), qvec, planes, k=10
        ).collect()
        got = A.lsh_topk_indexed(spark, idx, qvec, k=10).collect()
        assert [(r.vec_id, round(r.score, 6)) for r in got] == [
            (r.vec_id, round(r.score, 6)) for r in expect
        ]

        # pruned read: bucket filter reaches PartitionFilters even when
        # the scan goes through the streaming sink's metadata log
        df = A.lsh_topk_indexed(spark, idx, qvec, k=10)
        plan = physical_plan(df)
        assert "PartitionFilters" in plan
        part_filters = plan.split("PartitionFilters:")[1].splitlines()[0]
        assert "bucket" in part_filters

        # full count landed exactly once
        assert spark.read.parquet(idx).count() == corpus.count()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_ivfpq_index_matches_batch_index(spark, tables):
    """Vectors streamed through stream_ivfpq_index_ingest must yield an
    index whose ivfpq_topk_indexed answers (ADC scores) are identical
    to a batch-built write_ivfpq_index over the same corpus — and the
    nprobe partition pruning must survive the streaming file-sink log."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        pq as PQ,
    )

    corpus = tables["embeddings"].select("vec_id", "embedding", F.lit(0).alias("label"))
    normed = I.normalized(corpus)
    qvec = corpus.filter("vec_id = 0").first().embedding
    rows = normed.filter(F.col("vec_id") < 16).orderBy("vec_id").collect()
    cents = [(i, list(r.embedding)) for i, r in enumerate(rows[:4])]
    codebooks = PQ.codebooks_from_rows([list(r.embedding) for r in rows], m=8)

    tmp = tempfile.mkdtemp(prefix="stream_ivfpq_")
    try:
        src, sidx, ckpt, bidx = tmp + "/src", tmp + "/sidx", tmp + "/ckpt", tmp + "/bidx"
        corpus.write.mode("append").parquet(src)
        q = P.stream_ivfpq_index_ingest(
            spark, src, sidx, ckpt, cents, codebooks, dim=64
        )
        q.processAllAvailable()
        q.stop()

        PQ.write_ivfpq_index(normed, bidx, cents, codebooks)
        want = PQ.ivfpq_topk_indexed(spark, bidx, qvec, k=10, nprobe=2).collect()
        got = PQ.ivfpq_topk_indexed(spark, sidx, qvec, k=10, nprobe=2).collect()
        assert [(r.vec_id, round(r.score, 6)) for r in got] == [
            (r.vec_id, round(r.score, 6)) for r in want
        ] and len(got) == 10

        plan = physical_plan(PQ.ivfpq_topk_indexed(spark, sidx, qvec, k=10, nprobe=2))
        assert "PartitionFilters" in plan
        assert "ivf_cell" in plan.split("PartitionFilters:")[1].splitlines()[0]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_bq_index_matches_batch_index(spark, tables):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        bq as BQ,
    )

    corpus = tables["embeddings"].select("vec_id", "embedding", F.lit(0).alias("label"))
    qvec = corpus.filter("vec_id = 0").first().embedding
    thr = BQ.train_bq_thresholds(corpus, dim=64)

    tmp = tempfile.mkdtemp(prefix="stream_bq_")
    try:
        src, idx, ckpt = tmp + "/src", tmp + "/idx", tmp + "/ckpt"
        # two appends → two micro-batches
        corpus.filter(F.col("vec_id") < 40).write.mode("append").parquet(src)
        corpus.filter(F.col("vec_id") >= 40).write.mode("append").parquet(src)

        q = P.stream_bq_index_ingest(spark, src, idx, ckpt, thr, dim=64)
        q.processAllAvailable()
        q.stop()

        inline = BQ.bq_topk(corpus, qvec, thr, k=8, shortlist=30).collect()
        live = BQ.bq_topk_indexed(
            spark, idx, qvec, k=8, shortlist=30, rerank_corpus=corpus
        ).collect()
        assert [(r.vec_id, r.hamming) for r in live] == [
            (r.vec_id, r.hamming) for r in inline
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_lm_score_matches_batch(spark, tables):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        lm as LM,
    )

    docs = tables["documents"].select("doc_id", "text")
    train = docs.filter(F.col("doc_id") % 2 == 0)
    model = LM.bigram_lm(train)
    model = tuple(m.cache() for m in model)

    tmp = tempfile.mkdtemp(prefix="stream_lm_")
    try:
        src, out, ckpt = tmp + "/src", tmp + "/out", tmp + "/ckpt"
        held = docs.filter(F.col("doc_id") % 2 == 1)
        held.filter(F.col("doc_id") < 100).write.mode("append").parquet(src)
        held.filter(F.col("doc_id") >= 100).write.mode("append").parquet(src)

        q = P.stream_lm_score(spark, src, out, ckpt, model, alpha=0.5)
        q.processAllAvailable()
        q.stop()

        got = {
            r["doc_id"]: (r["n_bigrams"], round(r["avg_logp"], 9))
            for r in spark.read.parquet(out).collect()
        }
        expect = {
            r["doc_id"]: (r["n_bigrams"], round(r["avg_logp"], 9))
            for r in LM.score_with_model(held, model, alpha=0.5).collect()
        }
        assert got == expect and len(got) > 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        for m in model:
            m.unpersist()


def test_stream_semantic_route_matches_batch_assignment(spark, tables):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.functions.embed import (
        hash_embedding,
    )
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        clustering as CL,
    )

    docs = tables["documents"].select("doc_id", "text")
    # frozen centroids from a batch fit over the hash embeddings
    embedded = docs.withColumn("e", hash_embedding(F.col("text"), dim=64))
    cents, _ = CL.kmeans_fit(
        embedded.select("doc_id", "e"), k=3, n_iter=2, vec_col="e", id_col="doc_id"
    )

    tmp = tempfile.mkdtemp(prefix="stream_route_")
    try:
        src, out, ckpt = tmp + "/src", tmp + "/out", tmp + "/ckpt"
        docs.filter(F.col("doc_id") % 2 == 0).write.mode("append").parquet(src)
        docs.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(src)
        q = P.stream_semantic_route(spark, src, out, ckpt, cents, dim=64)
        q.processAllAvailable()
        q.stop()

        routed = spark.read.parquet(out)
        got = {r["doc_id"]: r["cluster"] for r in routed.collect()}
        expect = {
            r["doc_id"]: r["cluster"]
            for r in CL.assign_clusters(
                embedded, cents, vec_col="e", id_col="doc_id"
            ).collect()
        }
        assert got == expect and len(got) == docs.count()
        # the sink is cluster-partitioned → readers prune
        pruned = spark.read.parquet(out).filter(F.col("cluster") == 0)
        plan = physical_plan(pruned)
        assert "PartitionFilters" in plan
        assert "cluster" in plan.split("PartitionFilters:")[1].splitlines()[0]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_neardup_gate_matches_batch(spark, tables):
    """Dedup-on-arrival: near-copies of corpus docs are dropped per
    micro-batch against the frozen signature table; survivors equal the
    batch gate's survivor set."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        dedup as D,
    )

    corpus = tables["documents"].select("doc_id", "text").filter(F.col("doc_id") < 200)
    sig = D.minhash_signature(
        D.shingle_tids_hash(corpus), D.minhash_perms(16)
    ).cache()

    # incoming: near-copies of every 4th corpus doc + clearly novel docs
    near = (
        corpus.filter(F.col("doc_id") % 4 == 0)
        .select(
            (F.col("doc_id") + 10_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zz qq rr")).alias("text"),
        )
    )
    novel = spark.createDataFrame(
        [(20_001, "entirely novel streaming prose about watermark state eviction"),
         (20_002, "another brand new document with vocabulary unseen in the corpus")],
        "doc_id long, text string",
    )
    incoming = near.unionByName(novel)

    tmp = tempfile.mkdtemp(prefix="stream_ndg_")
    try:
        src, out, ckpt = tmp + "/src", tmp + "/out", tmp + "/ckpt"
        incoming.filter(F.col("doc_id") < 15_000).write.mode("append").parquet(src)
        incoming.filter(F.col("doc_id") >= 15_000).write.mode("append").parquet(src)

        q = P.stream_neardup_gate(spark, src, out, ckpt, sig, threshold=0.6)
        q.processAllAvailable()
        q.stop()

        survived = {r.doc_id for r in spark.read.parquet(out).collect()}
        batch_matches = D.near_dup_against_corpus(
            incoming, corpus=None, threshold=0.6, corpus_sig=sig
        )
        expect = {
            r.doc_id
            for r in incoming.join(
                batch_matches.select(F.col("new_id").alias("doc_id")).distinct(),
                "doc_id",
                "left_anti",
            ).collect()
        }
        assert survived == expect
        assert {20_001, 20_002} <= survived          # novel docs pass
        assert len(survived) < incoming.count()      # near-copies dropped
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        sig.unpersist()
