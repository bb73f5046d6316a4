#!/usr/bin/env python
"""Interleaved A/B for the r13 graph_beam_search scored-frame pinning:
OLD = each round's three-join scoring plan evaluated twice (once into
the beam checkpoint, once into the seen checkpoint), NEW = scored
pinned once + exact zero-fresh early exit.  Loads the OLD operator
from a git blob into a shadow module so both variants run interleaved
in ONE session on the same pinned inputs (the BASELINE.md A/B
methodology — never sequential blocks).

Usage: python tools/idle_beam_pin_probe.py [git_rev] [reps]
"""

from __future__ import annotations

import importlib.util
import os
import statistics
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (  # noqa: E402
    graph_ann as GA_NEW,
    search as S,
)
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.ingest import (  # noqa: E402
    bulk_random_vectors,
)
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.session import get_spark  # noqa: E402


def main() -> None:
    rev = sys.argv[1] if len(sys.argv) > 1 else "HEAD~1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    src = subprocess.check_output(
        [
            "git",
            "show",
            f"{rev}:vector_database_with_gpu_acceleration_for_llm_retrieval_spark/operators/graph_ann.py",
        ],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        text=True,
    )
    with tempfile.NamedTemporaryFile(
        "w", suffix="_old_graph_ann.py", delete=False
    ) as f:
        f.write(src)
        old_path = f.name
    spec = importlib.util.spec_from_file_location("old_graph_ann", old_path)
    GA_OLD = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(GA_OLD)

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    emb = bulk_random_vectors(spark, 20_000, dim=64, seed=5).persist()
    emb.count()
    graph = S.nn_descent(emb, k=10, rounds=1).persist()
    graph.count()
    qs = emb.filter(F.col("vec_id") % 100 == 0).persist()  # 200 queries
    qs = qs.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))

    def run(mod) -> float:
        t0 = time.perf_counter()
        mod.graph_beam_search(
            qs, emb, graph, k=10, beam=10, rounds=4, n_entry=4
        ).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    run(GA_OLD)
    run(GA_NEW)  # warm both
    old_t, new_t = [], []
    for i in range(reps):
        old_t.append(run(GA_OLD))
        new_t.append(run(GA_NEW))
        print(f"rep {i}: old={old_t[-1]:.3f}s new={new_t[-1]:.3f}s", flush=True)
    print(
        "MEDIANS old=%.4f new=%.4f (%.0f%% of old)"
        % (
            statistics.median(old_t),
            statistics.median(new_t),
            100.0 * statistics.median(new_t) / statistics.median(old_t),
        )
    )
    os.unlink(old_path)


if __name__ == "__main__":
    main()
