from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.functions import text, vector

__all__ = ["vector", "text"]
