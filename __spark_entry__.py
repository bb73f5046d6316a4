"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in
``vector_database_with_gpu_acceleration_for_llm_retrieval_spark.contract``;
this file only re-exports the three hooks.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.contract import (  # noqa: E402,F401
    entry,
    oracle_sql,
    queries,
)
