"""Binary quantization (BQ): 1-bit-per-dimension Hamming-distance ANN.

The third point on the compression menu next to SQ (operators/sq.py,
4×) and PQ (operators/pq.py, 32×): each dimension collapses to a single
sign bit against a per-dimension threshold, so a D-dim float32 vector
becomes ``ceil(D/64)`` longs — 32× smaller at D=64, 256× less raw I/O
than the float column.  The modern serving stack (e.g. the public
binary-quantization literature and every major vector store's "BQ"
mode) uses exactly this as the cheap first tier: Hamming distance on
packed words approximates angular distance, a shortlist survives, and
an exact rerank on the shortlist restores accuracy.

Design choices that keep it Spark-first and oracle-mirrorable:

* **Thresholds are per-dimension midranges** ``(min_d + max_d) / 2``
  from one distributed min/max aggregation — min/max copy values
  without arithmetic, so any engine reproduces the thresholds
  bit-for-bit (same trick as SQ's range training; a mean would be
  partition-order dependent).
* **Packing is a literal-unrolled sum** of ``CASE WHEN x_d > thr_d
  THEN 2^(d mod 64)`` terms per 64-dim word — bits are disjoint so the
  sum has no carries, the whole encode is one codegen'd projection
  (zero Python, zero shuffle), and bit 63 uses the signed long value
  ``-2^63`` which both engines treat identically.
* **Scoring is XOR + POPCOUNT**: ``Σ_w bit_count(code_w ⊕ q_w)`` —
  the cheapest possible scan expression — followed by the standard
  ``TakeOrderedAndProject`` shortlist (ties broken on id so the cut is
  deterministic), then a broadcast-joined exact inner-product rerank
  over only the shortlist rows.

At 100 TB the codes table is ~8 bytes/vector: the Hamming scan touches
0.4 % of the bytes the exact scan would, and the rerank reads the float
vectors of ``shortlist`` rows only (a broadcast semi-join prunes the
scan).  No shuffle anywhere in the read path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.functions import vector as V

__all__ = [
    "train_bq_thresholds",
    "bq_encode_bits",
    "bq_encode",
    "pack_bits",
    "bq_hamming",
    "bq_topk",
    "write_bq_index",
    "bq_topk_indexed",
]


def train_bq_thresholds(
    df: DataFrame, vec_col: str = "embedding", dim: int | None = None
) -> list[float]:
    """Per-dimension sign threshold = midrange ``(min_d + max_d)/2``.
    One distributed aggregation of 2·D min/max partials; exact values
    any engine reproduces (no order-dependent arithmetic)."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    aggs = []
    for d in range(dim):
        aggs.append(F.min(F.col(vec_col)[d]).alias(f"__lo{d}"))
        aggs.append(F.max(F.col(vec_col)[d]).alias(f"__hi{d}"))
    row = df.agg(*aggs).first()
    return [(float(row[2 * d]) + float(row[2 * d + 1])) / 2.0 for d in range(dim)]


def _bit_lit(pos: int) -> int:
    """Signed-long value of bit ``pos`` (bit 63 → −2^63)."""
    return (1 << pos) if pos < 63 else -(1 << 63)


def pack_bits(vec: Column, thresholds: list[float]) -> list[Column]:
    """``ceil(D/64)`` long columns packing ``x_d > thr_d`` sign bits.
    Literal-unrolled disjoint-bit sum — one codegen'd expression per
    word, no carries, no Python."""
    dim = len(thresholds)
    words = []
    for w in range(0, dim, 64):
        terms = [
            F.when(
                vec[d].cast("double") > F.lit(float(thresholds[d])),
                F.lit(_bit_lit(d - w)).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
            for d in range(w, min(w + 64, dim))
        ]
        acc = terms[0]
        for t in terms[1:]:
            acc = acc + t
        words.append(acc)
    return words


def pack_query(query_vec, thresholds: list[float]) -> list[int]:
    """Driver-side packing of the query vector with the same rule."""
    dim = len(thresholds)
    out = []
    for w in range(0, dim, 64):
        acc = 0
        for d in range(w, min(w + 64, dim)):
            if float(query_vec[d]) > thresholds[d]:
                acc += _bit_lit(d - w)
        out.append(acc)
    return out


def bq_encode_bits(
    df: DataFrame,
    thresholds: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """``(id, w0, w1, …)`` — packed sign-bit words as top-level long
    columns (parquet-friendly: plain longs bit-pack/dict-encode well
    and column-prune individually)."""
    words = pack_bits(F.col(vec_col), thresholds)
    return df.select(
        F.col(id_col), *[c.alias(f"w{i}") for i, c in enumerate(words)]
    )


# kept name parity with sq_encode / pq_encode
bq_encode = bq_encode_bits


def bq_hamming(code_cols: list[str], query_words: list[int]) -> Column:
    """``Σ_w bit_count(code_w ⊕ q_w)`` over the packed words."""
    acc = None
    for c, q in zip(code_cols, query_words):
        term = F.bit_count(F.col(c).bitwiseXOR(F.lit(int(q)).cast("long")))
        acc = term if acc is None else acc + term
    return acc.cast("int")


def bq_topk(
    df: DataFrame,
    query_vec,
    thresholds: list[float],
    k: int = 10,
    shortlist: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    codes: DataFrame | None = None,
) -> DataFrame:
    """Two-tier BQ search: Hamming shortlist over the packed codes,
    exact inner-product rerank over the survivors.

    ``codes=None`` packs inline off ``df`` (one scan); pass a
    materialized ``bq_encode`` frame to read 8 bytes/row instead.
    Output: ``(id, hamming, score)`` — exact top-``k`` of the
    shortlist by inner product, ties on id.
    """
    n_words = (len(thresholds) + 63) // 64
    if codes is None:
        codes = bq_encode_bits(df, thresholds, vec_col, id_col)
    qwords = pack_query(query_vec, thresholds)
    word_cols = [f"w{i}" for i in range(n_words)]
    short = (
        codes.select(id_col, bq_hamming(word_cols, qwords).alias("hamming"))
        .orderBy(F.asc("hamming"), F.asc(id_col))
        .limit(shortlist)
    )
    # one broadcast join: the float-vector scan is pruned to shortlist
    # rows by the broadcast hash join, and the exact dot runs only there
    pruned = df.select(id_col, vec_col).join(F.broadcast(short), id_col)
    return (
        pruned.select(
            id_col,
            "hamming",
            V.dot(F.col(vec_col), V.vec_lit(query_vec)).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


# -- materialized codes table (same sidecar mechanism as LSH/IVF/PQ/SQ) ------

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.ann_index import (  # noqa: E402
    _read_meta,
    _write_meta,
)


def write_bq_index(
    df: DataFrame,
    path: str,
    thresholds: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    mode: str = "overwrite",
) -> None:
    """Persist the packed sign-bit table + thresholds sidecar — 8 bytes
    per vector per 64 dims at rest. Appends encode against the frozen
    thresholds (retrain on drift); sidecar is Spark-written so
    hdfs:///s3:// paths work."""
    bq_encode_bits(df, thresholds, vec_col=vec_col, id_col=id_col).write.mode(
        mode
    ).parquet(path)
    _write_meta(
        df.sparkSession,
        path,
        {"kind": "bq", "thresholds": [float(t) for t in thresholds], "vec_col": vec_col},
    )


def bq_topk_indexed(
    spark: SparkSession,
    path: str,
    query_vec,
    k: int = 10,
    shortlist: int = 50,
    id_col: str = "vec_id",
    rerank_corpus: DataFrame | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k over a materialized BQ codes table: Hamming shortlist off
    the 8-byte rows; with ``rerank_corpus`` the shortlist broadcast-
    prunes the float scan for the exact rerank (the standard two-tier
    read). Without it, returns the shortlist ranked by Hamming alone
    (``score`` = −hamming so larger is better, like every other path).
    """
    meta = _read_meta(spark, path)
    thresholds = [float(t) for t in meta["thresholds"]]
    codes = spark.read.parquet(path)
    n_words = (len(thresholds) + 63) // 64
    qwords = pack_query(query_vec, thresholds)
    word_cols = [f"w{i}" for i in range(n_words)]
    short = (
        codes.select(id_col, bq_hamming(word_cols, qwords).alias("hamming"))
        .orderBy(F.asc("hamming"), F.asc(id_col))
        .limit(shortlist)
    )
    if rerank_corpus is None:
        return (
            short.withColumn("score", -F.col("hamming").cast("double"))
            .orderBy(F.desc("score"), F.asc(id_col))
            .limit(k)
        )
    pruned = rerank_corpus.select(id_col, vec_col).join(F.broadcast(short), id_col)
    return (
        pruned.select(
            id_col,
            "hamming",
            V.dot(F.col(vec_col), V.vec_lit(query_vec)).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
