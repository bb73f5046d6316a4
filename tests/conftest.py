from __future__ import annotations

import pytest

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.session import get_spark
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.sources.catalog import load_tables

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    return get_spark("vdb_spark_tests")


@pytest.fixture(scope="session")
def tables(spark):
    return load_tables(spark, SF_DIR)
