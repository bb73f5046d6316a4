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
)
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.search import topk

__all__ = ["rag_context", "generate_stub", "generate_with_model", "TinyExtractiveModel", "maxsim_topk"]

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

    Scale: chunks+embeddings is a narrow projection (no shuffle); the
    top-k is TakeOrderedAndProject over the chunk scan, carrying the
    chunk text through the k-row heap (r13 optimization: the previous
    join-back branch re-scanned and re-chunked the corpus just to
    recover the k surviving texts — measured ~25 % of the row; the
    heap compares only (score, id), so payload carriage is free at
    k=4 and the second scan + broadcast join disappear — 2 scans → 1.
    ``ingest.join_back`` remains the O17 operator for hits that arrive
    without payloads, e.g. from a materialized index). Results are
    identical: chunk_id → chunk_text is functional, so attaching text
    before or after the top-k yields the same k rows. At 100 TB the
    embedded chunk table would be written once at ingest
    (write_collection) and this becomes a scan of that table instead
    of re-embedding.
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
    with_text = topk(
        embedded, qvec, k=k, id_col="chunk_id", vec_col="emb", keep_cols=["chunk_text"]
    ).withColumn("qid", F.lit(0))
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


def maxsim_topk(
    docs: DataFrame,
    question: str,
    k: int = 10,
    dim: int = 64,
    max_words: int = 120,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Late-interaction (ColBERT-style MaxSim) document retrieval:

        score(doc) = Σ_{q ∈ question tokens} max_{c ∈ doc chunks} ⟨e(q), e(c)⟩

    Each query token keeps its own vector instead of mean-pooling the
    question away — a token that matches ANY chunk of the document
    contributes its best alignment, which is what makes late
    interaction beat single-vector retrieval on multi-topic documents
    (public ColBERT literature; this engine's chunk granularity stands
    in for token granularity, same algebra).

    Spark-first shape: the corpus is chunked and hash-embedded in one
    scan; the |Q| query-token vectors are driver-side literals
    (hash_embed_py — tiny, no job), so the per-chunk scoring is |Q|
    dot-product expressions in ONE projection; the per-document
    ``max`` per token and the final ``Σ`` ride a single
    groupBy(doc) with map-side partial maxes. One scan, one
    doc-keyed shuffle, TakeOrderedAndProject tail — the same plan
    skeleton as the flagship search regardless of |Q|.

    Output: ``(id, score)``, ties on id.
    """
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.functions import (
        vector as V,
    )
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.functions.embed import (
        hash_embedding,
    )

    q_tokens = question.split()
    q_vecs = [hash_embed_py(t, dim=dim) for t in q_tokens]
    chunks = chunk_documents(docs, max_words=max_words, id_col=id_col, text_col=text_col)
    emb = chunks.select(
        F.col(id_col), hash_embedding(F.col("chunk_text"), dim=dim).alias("e")
    )
    scored = emb.select(
        id_col,
        *[V.dot(F.col("e"), V.vec_lit(qv)).alias(f"d{i}") for i, qv in enumerate(q_vecs)],
    )
    agg = scored.groupBy(id_col).agg(
        *[F.max(f"d{i}").alias(f"m{i}") for i in range(len(q_vecs))]
    )
    total = None
    for i in range(len(q_vecs)):
        c = F.col(f"m{i}")
        total = c if total is None else total + c
    return (
        agg.select(F.col(id_col), total.alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
