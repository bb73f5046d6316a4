from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.sources.catalog import (
    TABLES,
    load_table,
    load_tables,
    register_views,
)

__all__ = ["TABLES", "load_table", "load_tables", "register_views"]
