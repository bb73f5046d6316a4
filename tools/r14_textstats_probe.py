#!/usr/bin/env python
"""r14: textstats HOF-CSE audit at 8x document length (VERDICT #8).

repetition_stats and lexical_diversity already pre-project their token
arrays (the r13 `__toks` pattern); readability_scores is plain (non-HOF)
regexp/size expressions where whole-stage codegen subexpression
elimination applies. This probe measures each at 8x-length docs and,
for readability, A/Bs the current inline form against an explicit
pre-projection to settle whether the no-CSE tax exists there at all.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.functions import text as TX
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
    textstats as T,
)
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def readability_preprojected(docs, id_col="doc_id", text_col="text"):
    """Variant: n_words / trimmed text pre-projected to columns."""
    pre = docs.select(
        F.col(id_col),
        F.col(text_col),
        F.greatest(TX.n_tokens(F.col(text_col)), F.lit(1)).cast("long").alias("__nw"),
    )
    text = F.col(text_col)
    n_words = F.col("__nw")
    n_sents = F.greatest(F.regexp_count(text, F.lit(r"[.!?]+")), F.lit(1)).cast("long")
    n_syll = F.greatest(
        F.regexp_count(F.lower(text), F.lit(r"[aeiouy]+")), n_words
    ).cast("long")
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (n_words.cast("double") / n_sents)
        - F.lit(84.6) * (n_syll.cast("double") / n_words)
    )
    return pre.select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_sents.alias("n_sentences"),
        n_syll.alias("n_syllables"),
        flesch.alias("flesch"),
    )


def timed(label, fn, spark, reps=REPS):
    ts = []
    for _ in range(reps + 1):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        fn().write.mode("overwrite").format("noop").save()
        ts.append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    print(f"{label:45s} {statistics.median(ts[1:]):7.3f}s  reps={[round(t,2) for t in ts]}", flush=True)


def main():
    spark = get_spark("r14_textstats_probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    big = docs.select(
        "doc_id",
        F.concat_ws(". ", *([F.col("text")] * 8)).alias("text"),
    ).localCheckpoint(eager=True)
    n = big.count()
    print(f"== {n} docs at 8x length, load={os.getloadavg()}", flush=True)

    timed("repetition_stats (current)", lambda: T.repetition_stats(big, n=3), spark)
    timed("lexical_diversity (current)", lambda: T.lexical_diversity(big), spark)
    timed("readability (current inline)", lambda: T.readability_scores(big), spark)
    timed("readability (pre-projected)", lambda: readability_preprojected(big), spark)

    # equality spot check for the readability variant
    a = sorted(tuple(r) for r in T.readability_scores(big).collect())
    b = sorted(tuple(r) for r in readability_preprojected(big).collect())
    print("readability variants row-equal:", a == b, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
