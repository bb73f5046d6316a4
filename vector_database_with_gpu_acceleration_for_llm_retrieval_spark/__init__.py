"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference vector database
(rajdhake/Vector-Database-with-GPU-Acceleration-for-LLM-Retrieval).

Everything here is expressed Spark-first: DataFrame/SQL logical plans
optimized by Catalyst, higher-order functions for vector math (JVM-side,
whole-stage codegen), Pandas UDFs / mapInPandas only where built-in
operators cannot express the semantics (batched numpy scoring, model
stubs), and Structured Streaming for the append/ingest stream.

Subpackages
-----------
functions   column-builder expression libraries (vector math, text)
operators   batch dataflow operators (search, dedup, ingest, text stats)
sources     table catalog / parquet loaders for the driver testdata
plans       physical-plan helpers (explain capture, shape assertions)
streaming   Structured Streaming pipelines (insert stream, windowed aggs)
"""

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.session import get_spark

__all__ = ["get_spark"]
