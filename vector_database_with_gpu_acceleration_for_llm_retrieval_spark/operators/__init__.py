from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
    dedup,
    graph_ann,
    hnsw,
    ingest,
    multimodal,
    planner,
    relational,
    search,
    sparse,
    textstats,
)

__all__ = [
    "search",
    "ingest",
    "dedup",
    "textstats",
    "relational",
    "multimodal",
    "graph_ann",
    "hnsw",
    "sparse",
    "planner",
]
