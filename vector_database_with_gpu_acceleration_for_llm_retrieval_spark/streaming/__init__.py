from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.streaming import pipeline

__all__ = ["pipeline"]
