from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.plans.explain import (
    assert_plan_contains,
    physical_plan,
)

__all__ = ["physical_plan", "assert_plan_contains"]
