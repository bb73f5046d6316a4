"""part_pagerank iteration-overhead measurement (r10 verdict #8) — the
one recurring >1.4x family. The r8 fraction-hoist lever was measured
and rejected (BASELINE.md); this probe measures the two remaining
levers the round-10 judge named, on the SAME 10x lineitem co-purchase
graph the bench scale probe uses:

* ``pin2``   — localCheckpoint only every 2nd round (lineage depth 2
  between pins; final round always pins).  Risk: the dangling branch
  and the next round's join would replay an unpinned round twice.
* ``coal8``  — coalesce the node-sized rank frame to 8 partitions
  between rounds (32 µs-tasks → 8), cutting per-round task-dispatch
  overhead on a frame that is only |nodes| rows.
* ``pin2+coal8`` — both.

Each variant runs PAGERANK_ITERS rounds x 3 reps (median, warm
excluded); results must stay value-identical to the baseline (checked
to 1e-12 on summed rank).  Usage::

    python tools/idle_pagerank_probe.py [reps_of_lineitem]
"""
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACT_REPL = int(sys.argv[1]) if len(sys.argv) > 1 else 10

from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.session import get_spark
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import graph as G
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.contract import (
    COPURCHASE_CAP,
    COPURCHASE_MIN_WEIGHT,
    PAGERANK_DAMPING,
    PAGERANK_ITERS,
)

spark = get_spark("pagerank_probe")
spark.sparkContext.setLogLevel("ERROR")

tmp = tempfile.mkdtemp(prefix="pr_probe_")
try:
    frepl = F.explode(F.array(*[F.lit(i) for i in range(FACT_REPL)])).alias("rep")
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select("*", frepl).drop(
        "rep"
    ).write.mode("overwrite").parquet(f"{tmp}/lineitem.parquet")
    li = spark.read.parquet(f"{tmp}/lineitem.parquet")
    edges = G.copurchase_edges(
        li, min_weight=COPURCHASE_MIN_WEIGHT, max_items_per_order=COPURCHASE_CAP
    )

    VARIANTS = {
        "baseline": {"_coalesce": 0},  # pre-r11 shape: no coalesce
        "pin2": {"_pin_every": 2, "_coalesce": 0},
        "coal8": {"_coalesce": 8},
        "auto": {},  # r11 default: n_nodes-derived coalesce
        "pin2+coal8": {"_pin_every": 2, "_coalesce": 8},
    }

    def run(kw):
        t0 = time.perf_counter()
        df = G.pagerank(edges, iters=PAGERANK_ITERS, damping=PAGERANK_DAMPING, **kw)
        s = df.agg(F.sum("rank"), F.sum(F.col("node") * F.col("rank"))).collect()[0]
        return time.perf_counter() - t0, (float(s[0]), float(s[1]))

    # INTERLEAVED reps (the r7/r8 run-order lesson: the first variant
    # pays the cold lineitem scan and later runs ride the page cache +
    # accumulated-stage overhead — sequential blocks confound variant
    # with position). Round-robin 1 warm + 3 measured cycles; medians
    # per variant are position-balanced.
    ref = None
    times: dict[str, list] = {n: [] for n in VARIANTS}
    for cycle in range(4):
        for name, kw in VARIANTS.items():
            dt, chk = run(kw)
            if ref is None:
                ref = chk
            assert abs(chk[0] - ref[0]) < 1e-9 and abs(chk[1] - ref[1]) < 1e-6, (
                name,
                chk,
                ref,
            )
            if cycle > 0:
                times[name].append(dt)
    for name in VARIANTS:
        print(
            json.dumps(
                {
                    "variant": name,
                    "fact_repl": FACT_REPL,
                    "median": round(statistics.median(times[name]), 3),
                    "all": [round(t, 2) for t in times[name]],
                }
            ),
            flush=True,
        )
finally:
    shutil.rmtree(tmp, ignore_errors=True)
