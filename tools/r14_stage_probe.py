#!/usr/bin/env python
"""Round-14 optimization: per-stage noop-sink decomposition (guide
§1.4) of the three most expensive un-optimized probe rows —
mixture_pipeline, budget_select, dup_span_stats/remove_dup_spans — on
an idle box, so the round attacks the measured stage, not a guess.

Usage: python tools/r14_stage_probe.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark import contract
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
    curation,
    dedup as D,
    lm as LM,
    sampling,
    textstats as T,
)
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.curation import (
    _attach_quality_lang,
)
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.session import get_spark
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.sources.catalog import (
    load_tables,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def timed(label, fn, spark, reps=REPS):
    """Median-of-reps noop-sink wall time; signature cache cleared per
    rep (the bench's honest-rep rule)."""
    ts = []
    for _ in range(reps + 1):
        D.clear_signature_cache()
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        fn().write.mode("overwrite").format("noop").save()
        ts.append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    med = statistics.median(ts[1:])
    print(f"{label:55s} {med:7.3f}s  reps={[round(t, 2) for t in ts]}", flush=True)
    return med


def main():
    spark = get_spark("r14_stage_probe")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, SF_DIR)
    docs = t["documents"]

    print(f"== sf_dir={SF_DIR} reps={REPS} load={os.getloadavg()}", flush=True)

    print("-- mixture_pipeline decomposition --", flush=True)
    timed("quality+lang projection only", lambda: _attach_quality_lang(docs, "text").select("doc_id", "quality", "pred_lang"), spark)
    timed("repetition_stats only", lambda: T.repetition_stats(docs, n=contract.REPEAT_N).select("doc_id", "dup_ngram_ratio"), spark)
    timed("lm_score only", lambda: LM.lm_score(docs, alpha=contract.LM_ALPHA), spark)
    timed("doc_signals (all three + joins)", lambda: curation.doc_signals(docs, repeat_n=contract.REPEAT_N, lm_alpha=contract.LM_ALPHA), spark)

    def _kept():
        sig = curation.doc_signals(docs, repeat_n=contract.REPEAT_N, lm_alpha=contract.LM_ALPHA)
        pct = sampling.within_group_percentile(sig, "quality", group_col="pred_lang", id_col="doc_id")
        return pct.filter(F.col("pctl") >= contract.MIXPIPE_MIN_PCTL).select("doc_id", "pred_lang")

    timed("signals -> percentile gate (kept)", _kept, spark)

    def _mixed():
        kept = D._persist_signature(_kept())
        return sampling.mixture_sample(kept, contract.MIXPIPE_TARGET, stratum_col="pred_lang", id_col="doc_id")

    timed("... -> mixture_sample (mixed)", _mixed, spark)
    timed("... -> join back text", lambda: _mixed().join(docs.select("doc_id", "text"), "doc_id"), spark)
    timed("FULL mixture_pipeline", lambda: contract.q_mixture_pipeline(spark, SF_DIR), spark)

    print("-- budget_select decomposition --", flush=True)
    timed("quality_score only", lambda: T.quality_score(docs).select("doc_id", "quality"), spark)
    timed("docs JOIN quality_score", lambda: docs.join(T.quality_score(docs).select("doc_id", "quality"), "doc_id"), spark)
    timed("FULL q_budget_select", lambda: contract.q_budget_select(spark, SF_DIR), spark)

    print("-- dup spans --", flush=True)
    timed("FULL dup_span_stats", lambda: contract.q_dup_span_stats(spark, SF_DIR), spark)
    timed("FULL remove_dup_spans", lambda: contract.q_remove_dup_spans(spark, SF_DIR), spark)

    spark.stop()


if __name__ == "__main__":
    main()
