"""Scalar quantization (SQ): int8-per-dimension compressed scoring.

The second classic compression next to product quantization
(operators/pq.py): each dimension is quantized independently to a byte
against a per-dimension ``[lo, hi]`` range learned from the corpus —

    code_d = round((x_d − lo_d) / step_d),  step_d = (hi_d − lo_d)/255

Storage drops 4× (one byte per dimension instead of a float32; parquet
dictionary/bit-packing takes the stored int array to ~1 byte/dim at
rest), and unlike PQ there is no codebook scan in the score: the
approximate inner product against a query ``q`` is affine in the code,

    ⟨q, decode(code)⟩ = Σ_d q_d·(lo_d + code_d·step_d)
                      = c0 + Σ_d a_d·code_d

with ``a_d = q_d·step_d`` and ``c0 = Σ q_d·lo_d`` computed once per
query on the driver. So the whole compressed-domain search is ONE
``zip_with``/``aggregate`` fold of the code array against a literal
coefficient vector — all JVM-side expression evaluation, zero shuffles
and zero Python stages (plan-asserted), the exact same physical shape
(and ``TakeOrderedAndProject`` tail) as the uncompressed flagship
search, and a SQL oracle mirrors it term for term.

Quality: SQ's error is bounded per dimension (≤ step_d/2), so it
degrades gracefully and reranks cheaply; PQ compresses harder (m bytes
total) but pays a codebook. The two compose the standard menu: SQ when
4× is enough, PQ(+rerank) when the corpus must shrink 32×.

All folds are double-precision and sequential, matching
``functions.vector`` and the DuckDB mirrors; rounding is HALF_UP on
non-negative values, identical in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.functions import vector as V

__all__ = [
    "train_sq_ranges",
    "sq_encode",
    "sq_adc_topk",
    "sq_rerank_topk",
    "write_sq_index",
    "sq_topk_indexed",
]


def train_sq_ranges(
    df: DataFrame, vec_col: str = "embedding", dim: int | None = None
) -> list[tuple[float, float]]:
    """Per-dimension ``(lo, hi)`` over the corpus — ONE distributed
    aggregation of 2·D partial min/max expressions (no shuffle beyond
    the final single-row reduce; at 100 TB this is a full scan but of
    the narrow vector column only, paid once at index build).

    min/max copy values without arithmetic, so the ranges are exact
    float32 values any engine reproduces bit-for-bit.
    """
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    aggs = []
    for d in range(dim):
        aggs.append(F.min(F.col(vec_col)[d]).alias(f"__lo{d}"))
        aggs.append(F.max(F.col(vec_col)[d]).alias(f"__hi{d}"))
    row = df.agg(*aggs).first()
    return [(float(row[2 * d]), float(row[2 * d + 1])) for d in range(dim)]


def _steps(ranges: list[tuple[float, float]]) -> list[float]:
    return [(hi - lo) / 255.0 for lo, hi in ranges]


def sq_encode(
    df: DataFrame,
    ranges: list[tuple[float, float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    code_col: str = "code",
) -> DataFrame:
    """``(id, code)`` with ``code[d] = clamp₀²⁵⁵(round((x_d−lo_d)/step_d))``
    (constant dimensions — ``step=0`` — encode to 0).

    Pure expression (`transform` with index lambda against literal
    lo/step arrays): codegen'd, no Python, rides the corpus scan
    map-only. In-range values land in [0,255] by construction; the
    clamp only guards out-of-sample encodes (query-time vectors beyond
    the trained ranges).
    """
    lo_lit = F.array(*[F.lit(float(lo)) for lo, _ in ranges])
    step_lit = F.array(*[F.lit(float(s)) for s in _steps(ranges)])

    def enc(x, i):
        lo = F.element_at(lo_lit, i + 1)
        st = F.element_at(step_lit, i + 1)
        raw = F.when(st == 0.0, F.lit(0.0)).otherwise(
            F.round((x.cast("double") - lo) / st)
        )
        return F.least(F.lit(255), F.greatest(F.lit(0), raw.cast("int")))

    return df.select(
        F.col(id_col), F.transform(F.col(vec_col), enc).alias(code_col)
    )


def sq_adc_topk(
    codes: DataFrame,
    ranges: list[tuple[float, float]],
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "code",
) -> DataFrame:
    """Compressed-domain top-k by approximate inner product:
    ``c0 + Σ_d a_d·code_d`` — one zip_with fold against a literal
    coefficient vector, then ``TakeOrderedAndProject``. The scan reads
    the codes table only (≈1 byte/dim at rest vs 4)."""
    steps = _steps(ranges)
    q = [float(x) for x in query_vec]
    a = [q[d] * steps[d] for d in range(len(q))]
    c0 = 0.0
    for d in range(len(q)):
        c0 += q[d] * ranges[d][0]
    a_lit = F.array(*[F.lit(v) for v in a])
    prods = F.zip_with(F.col(code_col), a_lit, lambda c, av: c.cast("double") * av)
    score = F.lit(c0) + F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)
    scored = codes.select(F.col(id_col), score.alias("score"))
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def sq_rerank_topk(
    codes: DataFrame,
    corpus: DataFrame,
    ranges: list[tuple[float, float]],
    query_vec,
    k: int = 10,
    rerank: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SQ shortlist → exact inner-product rerank: top ``rerank`` codes,
    broadcast id-join back to the full vectors, exact ``dot`` top-k —
    the same two-tier read path as ``pq_rerank_topk`` (the full-width
    table is only touched through a ≤``rerank``-row equi-join)."""
    shortlist = sq_adc_topk(codes, ranges, query_vec, k=rerank, id_col=id_col).select(
        id_col
    )
    candidates = corpus.join(F.broadcast(shortlist), id_col)
    scored = candidates.select(
        F.col(id_col), V.dot(F.col(vec_col), V.vec_lit(query_vec)).alias("score")
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


# -- materialized codes table (same sidecar mechanism as LSH/IVF/PQ) ---------

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.ann_index import (  # noqa: E402
    _read_meta,
    _write_meta,
)


def write_sq_index(
    df: DataFrame,
    path: str,
    ranges: list[tuple[float, float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    mode: str = "overwrite",
) -> None:
    """Persist the codes table + ranges sidecar. Appends encode against
    the frozen ranges (out-of-range values clamp — retrain when drift
    accumulates); the sidecar is Spark-written so hdfs:///s3:// work."""
    sq_encode(df, ranges, vec_col=vec_col, id_col=id_col).write.mode(mode).parquet(path)
    _write_meta(
        df.sparkSession,
        path,
        {"kind": "sq", "ranges": [[lo, hi] for lo, hi in ranges], "vec_col": vec_col},
    )


def sq_topk_indexed(
    spark: SparkSession,
    path: str,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    rerank_corpus: DataFrame | None = None,
    rerank: int = 50,
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k over a materialized SQ codes table; optional exact rerank
    against ``rerank_corpus``."""
    meta = _read_meta(spark, path)
    ranges = [(float(lo), float(hi)) for lo, hi in meta["ranges"]]
    codes = spark.read.parquet(path)
    if rerank_corpus is None:
        return sq_adc_topk(codes, ranges, query_vec, k=k, id_col=id_col)
    return sq_rerank_topk(
        codes,
        rerank_corpus,
        ranges,
        query_vec,
        k=k,
        rerank=rerank,
        id_col=id_col,
        vec_col=vec_col,
    )
