"""Fresh-session single-family probe at the bench 10x-docs scale
(r8 verdict #1: dsir_weights 3.23->5.25 s with a stable yardstick —
is it real, or in-bench stage-accumulation drift?). Builds the SAME
scaled documents table bench.py's _scale_probe builds, runs ONE
family warm+3 reps in an otherwise-idle fresh JVM, plus the DuckDB
mirror, prints one JSON line."""
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FAMILY = sys.argv[1] if len(sys.argv) > 1 else "dsir_weights"

from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.session import get_spark
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark import contract

spark = get_spark("idle_probe")
spark.sparkContext.setLogLevel("ERROR")
qs = {**contract.queries(), **contract.extra_queries()}
tmp = tempfile.mkdtemp(prefix="idle_probe_")
try:
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    reps = F.explode(F.array(*[F.lit(i) for i in range(10)])).alias("rep")
    (docs.select("*", reps)
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 10_000_000)
        .withColumn("text", F.when(F.col("rep") == 0, F.col("text")).otherwise(
            F.concat_ws(" ", F.col("text"), F.concat(F.lit("rep"), F.col("rep")))))
        .drop("rep")
        .write.mode("overwrite").parquet(f"{tmp}/documents.parquet"))

    def run():
        t0 = time.perf_counter()
        qs[FAMILY](spark, tmp).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    warm = run()
    times = [run() for _ in range(3)]

    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp}/documents.parquet/*.parquet')")
    sql = contract.oracle_sql()[FAMILY]
    con.execute(sql).fetchall()
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        dts.append(time.perf_counter() - t0)
    print(json.dumps({"family": FAMILY, "spark_warm": round(warm, 3),
                      "spark_median": round(statistics.median(times), 3),
                      "spark_times": [round(x, 3) for x in times],
                      "duckdb_median": round(statistics.median(dts), 3)}))
finally:
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()
