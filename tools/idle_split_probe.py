#!/usr/bin/env python
"""Idle re-measure of the bench knn_join broadcast-split shape probes
(VERDICT r12 next-round #1): BENCH_r12 recorded knn_join_2k_split1
1.88->5.76 s and split2 1.96->3.90 s vs r11 while the DuckDB yardstick
itself drifted up uniformly (probe mirror 67.9->81.8 s) — this script
reproduces the exact bench shape-probe inputs (100k hash-derived
vectors, 2k queries, k=10, 1-scan vs 2-scan broadcast budgets) on an
otherwise-idle box, interleaving the two variants round-robin (the
BASELINE.md A/B methodology: sequential blocks confound with page
cache and stage accumulation).  git log shows knn_join's code path
unchanged r11->r12 (only nn_descent's empty-input schema in
search.py), so a clean idle number attributes the drift to driver-box
contention, not a regression."""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import search as S
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.ingest import (
    bulk_random_vectors,
)
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.session import get_spark


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark()
    import tempfile, shutil, os

    tmp = tempfile.mkdtemp(prefix="idle_split_")
    try:
        bulk_random_vectors(spark, 100_000, dim=64, seed=42).withColumn(
            "label", (F.col("vec_id") % 5).cast("int")
        ).write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")
        emb_df = spark.read.parquet(f"{tmp}/embeddings.parquet")
        qs_df = emb_df.filter(F.col("vec_id") % 50 == 0).select(
            F.col("vec_id").alias("qid"), "embedding"
        )

        def run(budget: int) -> float:
            t0 = time.perf_counter()
            S.knn_join(
                qs_df, emb_df, k=10, max_broadcast_rows=budget
            ).write.mode("overwrite").format("noop").save()
            return time.perf_counter() - t0

        # warm both variants once, then interleave
        run(10**9)
        run(1000)
        t1, t2 = [], []
        for i in range(reps):
            t1.append(run(10**9))
            t2.append(run(1000))
            print(
                f"rep {i}: split1={t1[-1]:.3f}s split2={t2[-1]:.3f}s",
                flush=True,
            )
        print(
            "MEDIANS split1=%.4f split2=%.4f (r11 bench: 1.88/1.96; r12 bench: 5.76/3.90)"
            % (statistics.median(t1), statistics.median(t2))
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
