#!/usr/bin/env python
"""Idle measurements for the round-13 second-wave tiers, the
BASELINE.md A/B methodology (interleaved reps on an otherwise-idle
box):

A. ``range_join`` (matmul path) at 100k corpus x 1k queries vs the
   DuckDB fold mirror at the same threshold — the one-scan-no-shuffle
   claim measured where the pair count (100M evaluated, ~selectivity
   emitted) actually stresses it.

B. ``graph_beam_search_pq`` vs ``graph_beam_search`` at matched
   traversal (20k corpus, 200 queries, deg-10 nn_descent, beam 16 x
   rounds 4) — wall clock + recall@10 vs exact.  The honest framing:
   at single-box probe scale ADC adds LUT-projection overhead per
   round; the tier's claim is BYTES per scoring (m code bytes vs 4*D
   vector bytes), which governs at the 100 TB memory boundary, so the
   numbers here attribute cost, not victory.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import graph_ann as GA
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import pq as PQ
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import search as S
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.ingest import (
    bulk_random_vectors,
)
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.session import get_spark

RANGE_T = 0.4


def probe_range(spark, tmp: str, reps: int) -> None:
    bulk_random_vectors(spark, 100_000, dim=64, seed=42).write.mode(
        "overwrite"
    ).parquet(f"{tmp}/emb.parquet")
    emb = spark.read.parquet(f"{tmp}/emb.parquet")
    qs = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )

    def run_spark() -> float:
        t0 = time.perf_counter()
        S.range_join(qs, emb, RANGE_T, query_vec="qvec").write.mode(
            "overwrite"
        ).format("noop").save()
        return time.perf_counter() - t0

    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW emb AS SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM read_parquet('{tmp}/emb.parquet/*.parquet')"
    )
    mirror = f"""
WITH q AS (SELECT vec_id AS qid, v AS qv FROM emb WHERE vec_id % 100 = 0)
SELECT count(*) FROM (
  SELECT q.qid, e.vec_id,
         list_dot_product(e.v, q.qv)
         / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS s
  FROM emb e, q) WHERE s >= {RANGE_T}
"""

    def run_duck() -> float:
        t0 = time.perf_counter()
        con.execute(mirror).fetchall()
        return time.perf_counter() - t0

    n_pairs = S.range_join(qs, emb, RANGE_T, query_vec="qvec").count()
    print(f"[range] pairs in range at t={RANGE_T}: {n_pairs}")
    run_spark(); run_duck()  # warm
    ts, td = [], []
    for _ in range(reps):
        ts.append(run_spark())
        td.append(run_duck())
    print(f"[range] spark matmul medians: {statistics.median(ts):.2f}s {sorted(ts)}")
    print(f"[range] duckdb fold medians:  {statistics.median(td):.2f}s {sorted(td)}")


def probe_graph_pq(spark, tmp: str, reps: int) -> None:
    bulk_random_vectors(spark, 20_000, dim=64, seed=7).write.mode(
        "overwrite"
    ).parquet(f"{tmp}/gemb.parquet")
    emb = spark.read.parquet(f"{tmp}/gemb.parquet").persist()
    emb.count()
    graph = S.nn_descent(emb, k=10, rounds=2).persist()
    graph.count()
    qs = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    ).persist()
    qs.count()
    rows = emb.filter(F.col("vec_id") < 16).orderBy("vec_id").collect()
    books = PQ.codebooks_from_rows([list(r["embedding"]) for r in rows], 8)
    codes = PQ.pq_encode(emb, books).persist()
    codes.count()

    def run_plain() -> float:
        t0 = time.perf_counter()
        GA.graph_beam_search(
            qs, emb, graph, k=10, beam=16, rounds=4, n_entry=8
        ).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    def run_pq() -> float:
        t0 = time.perf_counter()
        GA.graph_beam_search_pq(
            qs, codes, books, graph, k=10, beam=16, rounds=4, n_entry=8,
            rerank=16, vectors=emb,
        ).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    exact = S.knn_join(qs, emb, k=10, query_vec="qvec")
    def recall(approx) -> float:
        r = S.recall_at_k(exact, approx, k=10, by=["qid", "neighbor_id"])
        return r.agg(F.avg("recall")).collect()[0][0]

    rec_plain = recall(
        GA.graph_beam_search(qs, emb, graph, k=10, beam=16, rounds=4, n_entry=8)
    )
    rec_pq = recall(
        GA.graph_beam_search_pq(
            qs, codes, books, graph, k=10, beam=16, rounds=4, n_entry=8,
            rerank=16, vectors=emb,
        )
    )
    print(f"[graphpq] recall@10 plain={rec_plain:.3f} pq+rerank16={rec_pq:.3f}")
    run_plain(); run_pq()  # warm
    tp, tq = [], []
    for _ in range(reps):
        tp.append(run_plain())
        tq.append(run_pq())
    print(f"[graphpq] plain beam medians: {statistics.median(tp):.2f}s {sorted(tp)}")
    print(f"[graphpq] pq beam medians:    {statistics.median(tq):.2f}s {sorted(tq)}")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="idle_r13_")
    try:
        probe_range(spark, tmp, reps)
        probe_graph_pq(spark, tmp, reps)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
