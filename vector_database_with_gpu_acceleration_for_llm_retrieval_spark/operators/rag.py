"""End-to-end RAG retrieval pipeline (SURVEY.md §3.3).

The reference demo: chunk documents → embed chunks → insert
(rag_demo/ingest.py), then embed question → top-k search → id→text
join → context assembly → prompt → FLAN-T5 generation
(rag_demo/ask.py). Here the whole ask-path is ONE DataFrame pipeline —
chunking (O14/O15), hash embedding (O16 stand-in, functions/embed.py),
exact top-k (O5/O7/O9), broadcast join-back (O17), ordered context
assembly (O18) and prompt build (O19) — a single Catalyst plan from
parquet scan to the final (qid, context, prompt) row.

Generation itself (FLAN-T5, ask.py:35-39) is out of the core engine
(BASELINE.json: no model serving); ``generate_stub`` marks where a
``pandas_udf`` batch-inference stage would slot in and returns a
deterministic extractive fake so the pipeline stays checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.functions.embed import (
    hash_embed_py,
    hash_embedding_udf,
)
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.ingest import (
    assemble_context,
    chunk_documents,
    join_back,
)
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.search import topk

__all__ = ["rag_context", "generate_stub", "generate_with_model", "TinyExtractiveModel"]

PROMPT_TEMPLATE = (
    "Answer the question using only the context.\n\n"
    "Context:\n%s\n\nQuestion: %s\nAnswer:"
)


def rag_context(
    docs: DataFrame,
    question: str,
    k: int = 4,
    dim: int = 64,
    max_words: int = 120,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Retrieval tail of the RAG demo as one plan.

    Returns a single row ``(qid, context, prompt)``. The chunk corpus is
    embedded with the same deterministic hash embedding as the question
    (reference invariant: one model for both sides, ingest.py:27 /
    ask.py:15), scored by cosine, top-k selected with deterministic
    tie-break (score desc, chunk_id asc), joined back to text and
    assembled score-ordered.

    Scale: chunks+embeddings is a narrow projection (no shuffle);
    the top-k is TakeOrderedAndProject over the chunk scan; join-back
    broadcasts only the k surviving chunk ids. At 100 TB the embedded
    chunk table would be written once at ingest (write_collection) and
    this becomes a scan of that table instead of re-embedding.
    """
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.plans.partitioning import (
        fan_out,
    )

    chunks = chunk_documents(
        fan_out(docs), max_words=max_words, id_col=id_col, text_col=text_col
    )
    embedded = chunks.select(
        "chunk_id", "chunk_text", hash_embedding_udf(dim=dim)("chunk_text").alias("emb")
    )
    qvec = hash_embed_py(question, dim=dim)
    hits = topk(embedded, qvec, k=k, id_col="chunk_id", vec_col="emb").withColumn(
        "qid", F.lit(0)
    )
    with_text = join_back(hits, embedded.select("chunk_id", "chunk_text"), on="chunk_id")
    ctx = assemble_context(with_text, group_col="qid", text_col="chunk_text", order_col="score")
    return ctx.select(
        "qid",
        "context",
        F.format_string(PROMPT_TEMPLATE, F.col("context"), F.lit(question)).alias("prompt"),
    )


def generate_stub(prompts: DataFrame, prompt_col: str = "prompt") -> DataFrame:
    """Deterministic stand-in for the generation stage (O19,
    rag_demo/ask.py:35-39). A real deployment replaces this projection
    with a ``pandas_udf`` loading the model once per executor and
    inferring per Arrow batch. The fake is extractive — first bullet
    line of the context inside the prompt — so tests have a stable
    value to assert on.
    """
    first_bullet = F.regexp_extract(F.col(prompt_col), r"- ([^\n]*)", 1)
    return prompts.withColumn("answer", first_bullet)


def generate_with_model(
    prompts: DataFrame,
    loader,
    cache_key: str = "generator",
    prompt_col: str = "prompt",
) -> DataFrame:
    """The real generation stage (O19, reference rag_demo/ask.py:35-39
    runs FLAN-T5): batch inference through the same per-executor model
    seam as embedding — ``loader()`` must return an object with
    ``.generate(list[str]) -> list[str]`` (e.g. a transformers
    pipeline wrapper). Loaded once per Python worker, inferred per
    Arrow batch; see functions.embed.model_inference_udf."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.functions.embed import (
        model_inference_udf,
    )

    gen = model_inference_udf(loader, cache_key, "string", "generate")
    return prompts.withColumn("answer", gen(F.col(prompt_col)))


class TinyExtractiveModel:
    """Deterministic generation stand-in with the batch ``.generate``
    call shape: extracts the first context bullet — by construction the
    same answer as :func:`generate_stub`, so the model-seam path is
    value-checkable against the expression path."""

    def generate(self, prompts: list[str]) -> list[str]:
        import re

        out = []
        for p in prompts:
            m = re.search(r"- ([^\n]*)", p or "")
            out.append(m.group(1) if m else "")
        return out
