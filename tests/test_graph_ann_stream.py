"""Streaming kNN-graph maintenance (r12): the stream-built snapshot is
IDENTICAL to folding the same micro-batches through graph_insert
sequentially in batch mode — the stream_*_index_ingest parity pattern
applied to the graph tier — and retention prunes old snapshots."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
    graph_ann as GA,
    search as S,
)
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.streaming import (
    pipeline as P,
)


def _edge_set(df):
    return {
        (r.node, r.nbr, r.rank, round(r.score, 12)) for r in df.collect()
    }


def test_stream_graph_ingest_equals_sequential_batch_folds(spark, tables):
    emb = tables["embeddings"].select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") % 5 < 3)
    batch_a = emb.filter(F.col("vec_id") % 5 == 3)
    batch_b = emb.filter(F.col("vec_id") % 5 == 4)
    k = 6
    g0 = S.nn_descent(base, k=k, rounds=1).persist()
    g0.count()

    tmp = tempfile.mkdtemp(prefix="stream_graph_")
    try:
        src, idx, ckpt = tmp + "/src", tmp + "/idx", tmp + "/ckpt"
        P.write_graph_snapshot(base, g0, idx + "/version=-1")
        # micro-batch 0
        batch_a.write.mode("append").parquet(src)
        q = P.stream_graph_index_ingest(
            spark, src, idx, ckpt, k=k, rounds=2, keep_versions=2
        )
        q.processAllAvailable()
        # micro-batch 1
        batch_b.write.mode("append").parquet(src)
        q.processAllAvailable()
        q.stop()

        # batch-mode replay of the same folds
        g1 = GA.graph_insert(base, g0, batch_a, k=k, rounds=2)
        g2 = GA.graph_insert(
            base.unionByName(batch_a), g1, batch_b, k=k, rounds=2
        )

        snap = spark.read.parquet(idx)
        latest = snap.agg(F.max("version")).collect()[0][0]
        assert latest == 1
        final = snap.filter(F.col("version") == 1)
        got_edges = _edge_set(
            final.filter(F.col("kind") == "edge").select(
                "node", "nbr", "score", "rank"
            )
        )
        assert got_edges == _edge_set(g2)
        # the snapshot's corpus is the full union
        got_ids = {
            r.node for r in final.filter(F.col("kind") == "vec").collect()
        }
        assert got_ids == {r.vec_id for r in emb.collect()}
        # retention: keep_versions=2 -> the seed version=-1 was pruned
        vers = sorted(
            int(d.split("=")[1])
            for d in os.listdir(idx)
            if d.startswith("version=")
        )
        assert vers == [0, 1], vers

        # the maintained graph serves queries: beam search over the
        # live snapshot finds the batch-b vectors' own neighborhoods
        corpus = final.filter(F.col("kind") == "vec").select(
            F.col("node").alias("vec_id"), F.col("vec").alias("embedding")
        )
        graph = final.filter(F.col("kind") == "edge").select(
            "node", "nbr", "score", "rank"
        )
        queries = batch_b.limit(5).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
        )
        res = GA.graph_beam_search(queries, corpus, graph, k=3, beam=12, rounds=5)
        rows = res.collect()
        assert len(rows) == 15
        # most queries' best hit is themselves (they are in the corpus);
        # directed-kNN in-degree skew makes a minority of nodes hard to
        # reach on RANDOM vectors (the batch nn_descent graph has the
        # same property — 5 of 500 nodes have zero in-degree), so the
        # recall bar lives in test_graph_ann.py, not this serving smoke
        best = {r.qid: r.neighbor_id for r in rows if r.rank == 1}
        assert sum(qid == nid for qid, nid in best.items()) >= 3, best
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        g0.unpersist()


def test_snapshot_delete_and_validate(spark, tables):
    """delete_from_graph_snapshot writes version+1 with no doomed ids
    on either edge end and the corpus rows dropped; the predecessor
    version is untouched (crash story); validate_graph_snapshot
    reports a clean structure before and flags nothing after."""
    import tempfile

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        graph_ann as GA2,
    )

    emb = tables["embeddings"].select("vec_id", "embedding").filter(
        F.col("vec_id") < 300
    )
    g = S.nn_descent(emb, k=6, rounds=1)
    tmp = tempfile.mkdtemp(prefix="graph_snap_")
    try:
        P.write_graph_snapshot(emb, g, tmp + "/version=0")
        rep = GA2.validate_graph_snapshot(spark, tmp)
        assert rep["ok"] and rep["version"] == 0
        assert rep["n_nodes"] == rep["n_vectors"] == emb.count()
        assert rep["self_edges"] == rep["dangling_edges"] == 0

        doomed = emb.filter(F.col("vec_id") % 9 == 0).select("vec_id")
        doomed_ids = {r.vec_id for r in doomed.collect()}
        v = GA2.delete_from_graph_snapshot(spark, tmp, doomed, k=6)
        assert v == 1
        rep2 = GA2.validate_graph_snapshot(spark, tmp)
        assert rep2["version"] == 1 and rep2["ok"], rep2
        assert rep2["n_vectors"] == emb.count() - len(doomed_ids)
        snap = spark.read.parquet(tmp)
        new_edges = snap.filter(
            (F.col("version") == 1) & (F.col("kind") == "edge")
        )
        for r in new_edges.collect():
            assert r.node not in doomed_ids and r.nbr not in doomed_ids
        # predecessor untouched
        old_edges = snap.filter(
            (F.col("version") == 0) & (F.col("kind") == "edge")
        )
        assert old_edges.count() == g.count()
    finally:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_graph_retention_keeps_predecessor_at_keep_versions_1(
    spark, tables
):
    """keep_versions=1 is clamped so the just-read predecessor always
    survives the prune: a foreachBatch retry of the latest batch
    (crash between handle() returning and the checkpoint commit)
    re-reads max(versions) — deleting it would permanently wedge the
    stream on the "no snapshot at version < bid" guard (ADVICE r12)."""
    emb = tables["embeddings"].select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") < 100)
    k = 4
    g0 = S.nn_descent(base, k=k, rounds=0)
    tmp = tempfile.mkdtemp(prefix="stream_graph_kv1_")
    try:
        src, idx, ckpt = tmp + "/src", tmp + "/idx", tmp + "/ckpt"
        P.write_graph_snapshot(base, g0, idx + "/version=-1")
        for lo, hi in ((100, 120), (120, 140), (140, 160)):
            emb.filter(
                (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
            ).write.mode("append").parquet(src)
        q = P.stream_graph_index_ingest(
            spark, src, idx, ckpt, k=k, rounds=1, keep_versions=1
        )
        q.processAllAvailable()
        q.stop()
        vers = sorted(
            int(d.split("=")[1])
            for d in os.listdir(idx)
            if d.startswith("version=")
        )
        # the latest write's direct predecessor must survive; everything
        # older is pruned
        assert vers[-2:] == [max(vers) - 1, max(vers)], vers
        assert len(vers) == 2, vers
        snap = spark.read.parquet(idx)
        assert snap.filter(F.col("version") == max(vers) - 1).count() > 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_graph_search_serves_latest_committed_snapshot(spark, tables):
    """Continuous graph-tier serving (r13): a query stream answered by
    graph_beam_search over the newest _SUCCESS-committed snapshot of a
    LIVE ingest store.  Parity contract: each served answer set is
    IDENTICAL to a batch-mode replay of graph_beam_search over the
    snapshot version stamped on it — and the stamped version advances
    across an interleaved insert, proving the reader tracks commits."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.streaming import (
        serving as SV,
    )

    emb = tables["embeddings"].select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") < 300)
    batch_a = emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 380))
    k_g = 6
    g0 = S.nn_descent(base, k=k_g, rounds=1)
    tmp = tempfile.mkdtemp(prefix="stream_graph_serve_")
    try:
        src_i, idx, ck_i = tmp + "/src_i", tmp + "/idx", tmp + "/ck_i"
        src_q, ck_q = tmp + "/src_q", tmp + "/ck_q"
        P.write_graph_snapshot(base, g0, idx + "/version=-1")
        assert SV.latest_committed_version(spark, idx) == -1
        q1 = emb.filter(F.col("vec_id") % 97 == 3).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
        )
        # the file source needs the dir to exist before the stream starts
        q1.write.mode("append").parquet(src_q)
        served: list = []
        serve = SV.stream_graph_search(
            spark,
            src_q,
            idx,
            lambda df, bid: served.append(df.collect()),
            k=4,
            beam=10,
            rounds=3,
        )
        serve.processAllAvailable()
        # live insert commits version=0, then a second query wave
        # (file-source dirs must exist before their stream starts, so
        # the ingest stream starts at its first batch — the serve
        # stream stays live across the commit, which is the contract
        # under test)
        batch_a.write.mode("append").parquet(src_i)
        ingest = P.stream_graph_index_ingest(
            spark, src_i, idx, ck_i, k=k_g, rounds=1
        )
        ingest.processAllAvailable()
        assert SV.latest_committed_version(spark, idx) == 0
        q2 = emb.filter(F.col("vec_id") % 89 == 7).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
        )
        q2.write.mode("append").parquet(src_q)
        serve.processAllAvailable()
        ingest.stop()
        serve.stop()

        assert len(served) == 2, [len(s) for s in served]
        vers = [sorted({r.version for r in rows}) for rows in served]
        assert vers == [[-1], [0]], vers  # freshness advanced mid-stream

        # batch-mode replay parity, per stamped version
        for rows, qdf in ((served[0], q1), (served[1], q2)):
            v = rows[0].version
            snap = spark.read.parquet(f"{idx}/version={v}")
            graph = snap.filter(F.col("kind") == "edge").select(
                "node", "nbr", "score", "rank"
            )
            corpus = snap.filter(F.col("kind") == "vec").select(
                F.col("node").alias("vec_id"), F.col("vec").alias("embedding")
            )
            replay = GA.graph_beam_search(
                qdf, corpus, graph, k=4, beam=10, rounds=3
            ).collect()
            got = {(r.qid, r.neighbor_id, r.rank, round(r.score, 12)) for r in rows}
            want = {
                (r.qid, r.neighbor_id, r.rank, round(r.score, 12)) for r in replay
            }
            assert got == want, (v, got ^ want)
            assert got, v  # non-trivial answer sets
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_graph_search_filtered_and_pq_variants(spark, tables):
    """r13 serving pass-throughs: the filtered (allowed=) and
    compressed-domain (codebooks + rerank) forms of stream_graph_search
    each replay bit-for-bit as their batch operator over the served
    snapshot."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import pq as PQ
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.streaming import (
        serving as SV,
    )

    emb = tables["embeddings"].select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") < 250)
    g0 = S.nn_descent(base, k=6, rounds=1)
    rows = base.filter(F.col("vec_id") < 16).orderBy("vec_id").collect()
    books = PQ.codebooks_from_rows([list(r["embedding"]) for r in rows], 8)
    allowed = base.filter(F.col("vec_id") % 3 == 0).select("vec_id")
    qdf = emb.filter(F.col("vec_id") % 83 == 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )

    tmp = tempfile.mkdtemp(prefix="stream_graph_variants_")
    try:
        idx = tmp + "/idx"
        P.write_graph_snapshot(base, g0, idx + "/version=-1")
        snap = spark.read.parquet(f"{idx}/version=-1")
        graph = snap.filter(F.col("kind") == "edge").select(
            "node", "nbr", "score", "rank"
        )
        corpus = snap.filter(F.col("kind") == "vec").select(
            F.col("node").alias("vec_id"), F.col("vec").alias("embedding")
        )

        for variant, kwargs, replay_fn in (
            (
                "filtered",
                {"allowed": allowed},
                lambda: GA.graph_beam_search(
                    qdf, corpus, graph, k=4, beam=10, rounds=3, allowed=allowed
                ),
            ),
            (
                "pq_rerank",
                {"codebooks": books, "rerank": 8},
                lambda: GA.graph_beam_search_pq(
                    qdf, PQ.pq_encode(corpus, books), books, graph,
                    k=4, beam=10, rounds=3, rerank=8, vectors=corpus,
                ),
            ),
        ):
            src_q = f"{tmp}/src_q_{variant}"
            qdf.write.mode("append").parquet(src_q)
            served: list = []
            serve = SV.stream_graph_search(
                spark, src_q, idx,
                lambda df, bid: served.append(df.collect()),
                k=4, beam=10, rounds=3, **kwargs,
            )
            serve.processAllAvailable()
            serve.stop()
            assert len(served) == 1, variant
            got = {
                (r.qid, r.neighbor_id, r.rank, round(r.score, 12))
                for r in served[0]
            }
            want = {
                (r.qid, r.neighbor_id, r.rank, round(r.score, 12))
                for r in replay_fn().collect()
            }
            assert got == want, (variant, got ^ want)
            assert got, variant
            if variant == "filtered":
                assert all(r.neighbor_id % 3 == 0 for r in served[0])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
