#!/usr/bin/env python
"""Idle-box scale probes for the round-13 second-session families.

1. SPARSE at 10x documents (~600k docs): single-query sparse top-k as
   (a) full rebuild (tokenize+hash the corpus per query — the
   worst-case composite), (b) the materialized inverted index's
   bucket-pruned read (the serving path), vs (c) DuckDB running the
   full oracle SQL on the same scaled parquet. The serving claim:
   (b)'s cost is the matched postings, independent of corpus text.

2. HNSW at a 20k-vector corpus (the graph-tier probe scale): hierarchy
   build cost, then hnsw_search vs the flat-entry beam at the same
   base budget — wall clock, honest n_scored (descent + beam), and
   recall@10 vs exact.

Run on an idle box: python tools/idle_r13b_probe.py
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
REPS = 3


def _med(fn, reps=REPS):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts), 3), [round(t, 3) for t in ts]


def probe_sparse(spark, tmp):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark import contract
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import sparse as SP

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    reps = F.explode(F.array(*[F.lit(i) for i in range(10)])).alias("rep")
    big = (
        docs.select("*", reps)
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 10_000_000)
        .drop("rep")
    )
    big.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    bigd = spark.read.parquet(f"{tmp}/documents.parquet")
    n = bigd.count()
    print(f"[sparse] scaled docs: {n}")

    qi, qv = SP.sparse_query_py(contract.RAG_QUESTION)

    def rebuild():
        SP.sparse_topk(SP.sparse_from_text(bigd), qi, qv, k=10).write.mode(
            "overwrite"
        ).format("noop").save()

    m, ts = _med(rebuild)
    print(f"[sparse] full-rebuild topk @10x: median {m}s {ts}")

    t0 = time.perf_counter()
    SP.write_sparse_index(SP.sparse_from_text(bigd), f"{tmp}/spidx")
    print(f"[sparse] index build @10x: {time.perf_counter()-t0:.1f}s (one-time ingest)")

    def indexed():
        SP.sparse_topk_indexed(spark, f"{tmp}/spidx", qi, qv, k=10).write.mode(
            "overwrite"
        ).format("noop").save()

    m, ts = _med(indexed)
    print(f"[sparse] indexed topk @10x: median {m}s {ts}")

    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp}/documents.parquet')"
    )
    sql = contract.oracle_sql()["sparse_topk"]

    def duck():
        con.execute(sql).fetchall()

    m, ts = _med(duck)
    print(f"[sparse] duckdb full oracle @10x: median {m}s {ts}")


def probe_hnsw(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        graph_ann as GA,
        hnsw as H,
        search as S,
    )
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.ingest import (
        bulk_random_vectors,
    )

    n, nq = 20_000, 100
    emb = bulk_random_vectors(spark, n, dim=64, seed=42).persist()
    emb.count()
    qs = (
        bulk_random_vectors(spark, nq, dim=64, seed=7)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
        .persist()
    )
    qs.count()

    t0 = time.perf_counter()
    base = S.nn_descent(emb, k=10).select("node", "nbr").persist()
    base.count()
    print(f"[hnsw] base nn_descent build @{n}: {time.perf_counter()-t0:.1f}s")

    t0 = time.perf_counter()
    layers = H.build_hnsw_layers(emb, deg=8, scale=16, max_layer=2).persist()
    nl = layers.groupBy("layer").count().orderBy("layer").collect()
    print(
        f"[hnsw] layer build @{n} scale=16: {time.perf_counter()-t0:.1f}s,"
        f" edges {[(r.layer, r['count']) for r in nl]}"
    )

    qse = qs.select("qid", F.col("qvec").alias("embedding"))
    exact = S.knn_join(qse, emb, k=10).persist()
    exact.count()

    def recall_of(res):
        r = S.recall_at_k(
            exact, res, k=10, by=["qid", "neighbor_id"], fill_missing=True
        ).agg(F.avg("recall")).collect()[0][0]
        return round(float(r), 3)

    for name, fn in [
        (
            "flat n_entry=8",
            lambda st: GA.graph_beam_search(
                qs, emb, base, k=10, beam=16, rounds=4, n_entry=8, stats=st
            ),
        ),
        (
            "hnsw w4 h2",
            lambda st: H.hnsw_search(
                qs, emb, base, layers, k=10, beam=16, rounds=4, hops=2,
                max_layer=2, width=4, scale=16, stats=st,
            ),
        ),
    ]:
        st: dict = {}
        t0 = time.perf_counter()
        res = fn(st)
        rec = recall_of(res)
        wall = time.perf_counter() - t0
        print(
            f"[hnsw] {name}: recall@10 {rec}, wall {wall:.1f}s,"
            f" scored/query {st['n_scored'] / nq:.0f}"
        )


def main():
    spark = get_spark("idle_r13b_probe")
    tmp = tempfile.mkdtemp(prefix="r13b_probe_")
    try:
        probe_sparse(spark, tmp)
        probe_hnsw(spark)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
