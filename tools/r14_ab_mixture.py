#!/usr/bin/env python
"""Interleaved A/B: old mixture_pipeline shape (doc_signals + text
join-back + re-tokenize) vs the r14 pruned single-scan shape. Also
asserts row-equality of the two outputs first."""

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
    sampling,
)
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.session import get_spark
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.sources.catalog import (
    load_tables,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def old_pipeline(docs):
    sig = curation.doc_signals(
        docs, repeat_n=contract.REPEAT_N, lm_alpha=contract.LM_ALPHA
    )
    pct = sampling.within_group_percentile(
        sig, "quality", group_col="pred_lang", id_col="doc_id"
    )
    kept = D._persist_signature(
        pct.filter(F.col("pctl") >= contract.MIXPIPE_MIN_PCTL).select(
            "doc_id", "pred_lang"
        )
    )
    mixed = sampling.mixture_sample(
        kept, contract.MIXPIPE_TARGET, stratum_col="pred_lang", id_col="doc_id"
    )
    with_text = mixed.join(docs.select("doc_id", "text"), "doc_id")
    return sampling.pack_sequences(
        with_text,
        seq_len=contract.PACK_SEQ_LEN,
        id_col="doc_id",
        text_col="text",
        by="pred_lang",
    )


def new_pipeline(docs):
    return sampling.mixture_pipeline(
        docs,
        contract.MIXPIPE_TARGET,
        min_pctl=contract.MIXPIPE_MIN_PCTL,
        seq_len=contract.PACK_SEQ_LEN,
        repeat_n=contract.REPEAT_N,
        lm_alpha=contract.LM_ALPHA,
    )


def main():
    spark = get_spark("r14_ab_mixture")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_tables(spark, SF_DIR)["documents"]

    # equality first
    D.clear_signature_cache()
    a = {tuple(r) for r in old_pipeline(docs).collect()}
    D.clear_signature_cache()
    b = {tuple(r) for r in new_pipeline(docs).collect()}
    assert a == b, f"outputs differ: {len(a)} vs {len(b)} rows, diff={list(a ^ b)[:5]}"
    print(f"row-equal: {len(a)} rows", flush=True)

    ts = {"old": [], "new": []}
    for i in range(REPS):
        for name, fn in (("old", old_pipeline), ("new", new_pipeline)):
            D.clear_signature_cache()
            t0 = time.perf_counter()
            fn(docs).write.mode("overwrite").format("noop").save()
            ts[name].append(time.perf_counter() - t0)
    for name, v in ts.items():
        print(
            f"{name}: median {statistics.median(v):.3f}s  reps={[round(t,2) for t in v]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
