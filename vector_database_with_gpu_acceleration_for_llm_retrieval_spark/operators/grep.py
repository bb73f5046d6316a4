"""Index-accelerated substring search (pg_trgm-style trigram index):
``LIKE '%pattern%'`` without scanning the corpus text.

The classic engine trick the reference (a flat vector store) has no
analogue for, but any corpus-scale pipeline needs: exact substring
grep over 100 TB of text. A full ``contains()`` scan reads every text
byte; the trigram index reads only the postings buckets hit by the
pattern's own trigrams, intersects posting lists with an equi-key
aggregate, and verifies the survivors with ``contains()`` against just
those documents.

Guarantees: EXACT — every document containing the pattern contains
every trigram of the pattern, so the candidate set is a superset and
the verify join makes the result identical to the scan (parity is
pytest-asserted and the contract entry shares the scan's oracle).
Patterns shorter than 3 chars have no trigram and fall back to the
scan path explicitly.

Scale design:

* postings are written **partitioned by a hash bucket of the
  trigram** (``tg_bucket``), so a query's handful of trigrams prunes
  to a handful of partitions (``PartitionFilters``) — the read is
  O(pattern trigram postings), never O(corpus);
* the AND-intersection is a ``groupBy(doc_id)`` with a distinct-count
  HAVING — partial-agged, shuffle bounded by candidate postings;
* the verify step joins candidate ids back to the docs table
  (broadcast of the id list when small) and applies ``contains`` to
  those rows only;
* a hot trigram (appears in most docs) makes its posting list long —
  queries drop the highest-document-frequency trigrams first (keep the
  ``max_query_trigrams`` rarest by the sidecar's df table), the same
  stop-shingle move as contamination's ``max_probe_df``: the result
  stays exact because ANY trigram subset still yields a superset.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "delete_from_trigram_index",
    "trigram_keys",
    "write_trigram_index",
    "grep_scan",
    "grep_indexed",
    "grep_many",
    "grep_like",
]

#: postings partition fan-out — small enough for healthy parquet files
#: per bucket, large enough that a 3-trigram query prunes ~97% of them
N_TG_BUCKETS = 64


def trigram_keys(text_col) -> "F.Column":
    """Distinct character trigrams of a string column (exact bytes —
    no casefolding, so index semantics equal ``contains``). Strings
    shorter than 3 chars yield an empty array."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    n = F.length(t)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - 2, F.lit(0))),
        lambda i: t.substr(i, F.lit(3)),
    )
    return F.array_distinct(F.when(n >= 3, grams).otherwise(F.array().cast("array<string>")))


def _bucket(c) -> "F.Column":
    return F.pmod(F.xxhash64(c), F.lit(N_TG_BUCKETS)).cast("int")


def _py_trigrams(pattern: str) -> list[str]:
    return sorted({pattern[i : i + 3] for i in range(len(pattern) - 2)})


def write_trigram_index(
    docs: DataFrame, path: str, id_col: str = "doc_id", text_col: str = "text"
) -> dict:
    """Build and write the postings table ``(trigram, doc_id)``
    partitioned by ``tg_bucket``, plus a sidecar with the bucket count
    and the per-trigram document frequencies of the ``top_df`` hottest
    trigrams (the stop-trigram list queries use to skip the longest
    posting lists). One explode + one write; no shuffle beyond the
    partitioned sink."""
    base = docs.select(F.col(id_col).alias("doc_id"), trigram_keys(text_col).alias("__g"))
    postings = base.select("doc_id", F.explode_outer("__g").alias("trigram")).filter(
        F.col("trigram").isNotNull()
    )
    (
        postings.withColumn("tg_bucket", _bucket(F.col("trigram")))
        .write.mode("overwrite")
        .partitionBy("tg_bucket")
        .parquet(path)
    )
    df_rows = (
        postings.groupBy("trigram")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("df"), F.asc("trigram"))
        .limit(256)
        .collect()
    )
    meta = {
        "kind": "trigram",
        "n_buckets": N_TG_BUCKETS,
        "hot_df": {r.trigram: r.df for r in df_rows},
    }
    spark = docs.sparkSession
    spark.createDataFrame([(json.dumps(meta),)], "meta string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}_meta")
    return meta


def grep_scan(
    docs: DataFrame, pattern: str, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact substring grep by full scan: the baseline (and the
    fallback for patterns shorter than one trigram). Returns
    ``(doc_id)`` of matching documents."""
    return docs.filter(F.col(text_col).contains(pattern)).select(
        F.col(id_col).alias("doc_id")
    )


def grep_indexed(
    spark: SparkSession,
    path: str,
    docs: DataFrame,
    pattern: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_query_trigrams: int = 4,
) -> DataFrame:
    """Exact substring grep through the trigram index: prune postings
    partitions to the pattern's (rarest ``max_query_trigrams``)
    trigrams, AND-intersect posting lists, verify survivors with
    ``contains`` against the docs table. Identical output to
    :func:`grep_scan` (superset-then-verify)."""
    grams = _py_trigrams(pattern)
    if not grams:
        return grep_scan(docs, pattern, id_col=id_col, text_col=text_col)
    try:
        meta = json.loads(
            spark.read.parquet(f"{path}_meta").head()["meta"]
        )
        hot = meta.get("hot_df", {})
    except Exception:
        hot = {}
    # keep the rarest trigrams (df 0 for anything outside the hot list
    # — i.e. rare by construction), deterministic tie-break
    grams = sorted(grams, key=lambda g: (hot.get(g, 0), g))[:max_query_trigrams]
    buckets = sorted({_py_bucket_of(spark, g) for g in grams})
    postings = spark.read.parquet(path).filter(
        F.col("tg_bucket").isin(buckets) & F.col("trigram").isin(grams)
    )
    cand = (
        postings.groupBy("doc_id")
        .agg(F.count_distinct("trigram").alias("__ng"))
        .filter(F.col("__ng") == len(grams))
        .select("doc_id")
    )
    verified = (
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__t"))
        .join(cand, "doc_id")
        .filter(F.col("__t").contains(pattern))
        .select("doc_id")
    )
    return verified


def grep_many(
    spark: SparkSession,
    path: str,
    docs: DataFrame,
    patterns: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    max_query_trigrams: int = 4,
) -> DataFrame:
    """Multi-pattern grep through ONE pruned postings read (the grep
    twin of knn_join's batch contract: the index is scanned once for
    any number of patterns). Per pattern: its rarest trigrams AND-
    intersect; survivors verify with ``contains``. Patterns shorter
    than a trigram fall back to one scan each (they can't use the
    index). Returns ``(pattern, doc_id)`` — exact, scan-identical.
    """
    try:
        meta = json.loads(spark.read.parquet(f"{path}_meta").head()["meta"])
        hot = meta.get("hot_df", {})
    except Exception:
        hot = {}
    indexed = [p for p in patterns if _py_trigrams(p)]
    short = [p for p in patterns if not _py_trigrams(p)]
    out = None
    if indexed:
        sel: dict[str, list[str]] = {
            p: sorted(_py_trigrams(p), key=lambda g: (hot.get(g, 0), g))[
                :max_query_trigrams
            ]
            for p in indexed
        }
        pat_rows = [
            (p, g, len(gs)) for p, gs in sel.items() for g in gs
        ]
        pats = spark.createDataFrame(
            pat_rows, "pattern string, trigram string, n_grams int"
        )
        all_grams = sorted({g for gs in sel.values() for g in gs})
        buckets = sorted({_py_bucket_of(spark, g) for g in all_grams})
        postings = spark.read.parquet(path).filter(
            F.col("tg_bucket").isin(buckets) & F.col("trigram").isin(all_grams)
        )
        cand = (
            postings.join(F.broadcast(pats), "trigram")
            .groupBy("pattern", "doc_id", "n_grams")
            .agg(F.count_distinct("trigram").alias("__ng"))
            .filter(F.col("__ng") == F.col("n_grams"))
            .select("pattern", "doc_id")
        )
        out = (
            docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__t"))
            .join(cand, "doc_id")
            .filter(F.col("__t").contains(F.col("pattern")))
            .select("pattern", "doc_id")
        )
    for p in short:
        part = grep_scan(docs, p, id_col=id_col, text_col=text_col).select(
            F.lit(p).alias("pattern"), "doc_id"
        )
        out = part if out is None else out.unionByName(part)
    if out is None:
        return spark.createDataFrame([], "pattern string, doc_id long")
    return out


def _like_literal_segments(pattern: str) -> list[str] | None:
    """Split a SQL LIKE pattern into its literal segments,
    escape-aware: ``\\%`` / ``\\_`` (and ``\\\\``) contribute the
    escaped char to the CURRENT segment; unescaped ``%`` and ``_``
    break segments (``_`` matches exactly one arbitrary char, so it
    interrupts trigram continuity just like ``%``). Returns ``None``
    for a malformed pattern (dangling trailing escape) so the caller
    can fall back to the exact scan instead of guessing."""
    segs: list[str] = []
    cur: list[str] = []
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\":
            if i + 1 >= len(pattern):
                return None
            cur.append(pattern[i + 1])
            i += 2
            continue
        if ch in ("%", "_"):
            if cur:
                segs.append("".join(cur))
                cur = []
        else:
            cur.append(ch)
        i += 1
    if cur:
        segs.append("".join(cur))
    return segs


def grep_like(
    spark: SparkSession,
    path: str,
    docs: DataFrame,
    like_pattern: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_query_trigrams: int = 4,
) -> DataFrame:
    """Index-accelerated SQL ``LIKE``: a row matching
    ``'%foo%bar%'`` must contain every LITERAL segment between
    wildcards, so each segment's trigrams AND into the candidate set
    and a final ``LIKE`` verify restores exact semantics (wildcard
    order, ``_`` single-char holes). Segments shorter than a trigram
    contribute nothing; if NO segment is indexable the query falls
    back to the scan. Escape sequences (``\\%`` / ``\\_`` — Spark's
    default LIKE escape char) are parsed as literal chars when
    building segments, so a pattern like ``'%100\\%%'`` yields the
    trigram ``'00%'`` (which matching docs DO contain) rather than
    ``'00\\'`` (which they don't — that would break the superset
    guarantee and silently drop true matches); a dangling trailing
    escape falls back to the scan path. Same superset-then-verify
    exactness contract as :func:`grep_indexed`. Returns
    ``(doc_id)``."""
    segments = _like_literal_segments(like_pattern)
    if segments is None:  # malformed (dangling escape): let .like() decide
        return docs.filter(F.col(text_col).like(like_pattern)).select(
            F.col(id_col).alias("doc_id")
        )
    grams = sorted({g for seg in segments for g in _py_trigrams(seg)})
    if not grams:
        return docs.filter(F.col(text_col).like(like_pattern)).select(
            F.col(id_col).alias("doc_id")
        )
    try:
        meta = json.loads(spark.read.parquet(f"{path}_meta").head()["meta"])
        hot = meta.get("hot_df", {})
    except Exception:
        hot = {}
    grams = sorted(grams, key=lambda g: (hot.get(g, 0), g))[:max_query_trigrams]
    buckets = sorted({_py_bucket_of(spark, g) for g in grams})
    postings = spark.read.parquet(path).filter(
        F.col("tg_bucket").isin(buckets) & F.col("trigram").isin(grams)
    )
    cand = (
        postings.groupBy("doc_id")
        .agg(F.count_distinct("trigram").alias("__ng"))
        .filter(F.col("__ng") == len(grams))
        .select("doc_id")
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__t"))
        .join(cand, "doc_id")
        .filter(F.col("__t").like(like_pattern))
        .select("doc_id")
    )


_BUCKET_CACHE: dict[str, int] = {}


def _py_bucket_of(spark: SparkSession, gram: str) -> int:
    """Bucket id of one trigram — computed through the ENGINE's own
    xxhash64 (a 1-row local-relation job, no scan) so the python side
    can never drift from the write-side bucketing."""
    if gram not in _BUCKET_CACHE:
        row = spark.range(1).select(_bucket(F.lit(gram)).alias("b")).head()
        _BUCKET_CACHE[gram] = int(row["b"])
    return _BUCKET_CACHE[gram]


def delete_from_trigram_index(
    spark: SparkSession, path: str, ids: list, id_col: str = "doc_id"
) -> dict:
    """Right-to-erasure maintenance for the trigram substring index —
    the grep sibling of ``ann_index.delete_from_index``: one
    column-pruned pass locates the doomed posting rows, only their
    ``tg_bucket`` partitions rewrite under dynamic overwrite (a doc's
    trigrams spread across buckets, so locality is per-trigram), and
    the sidecar's hot-trigram df counts decrement by the deleted
    postings so stop-trigram pruning stays honest (the hot list is
    advisory — it only orders WHICH trigrams a query intersects;
    exactness is superset-then-verify regardless).  A streaming-sink
    ``_spark_metadata`` log is dropped first (the
    ``delete_from_index`` shadow rule; resume maintenance with
    ``log_free=True`` + a fresh checkpoint).  Returns
    ``{"rows_deleted", "touched_buckets"}``."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.ann_index import (
        _dynamic_partition_overwrite,
    )
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.sources.maintenance import (
        _fs_and_path,
    )

    if not ids:
        return {"rows_deleted": 0, "touched_buckets": []}
    fs, _, jvm = _fs_and_path(spark, path)
    path_cls = jvm.org.apache.hadoop.fs.Path
    sink_log = path_cls(f"{path}/_spark_metadata")
    if fs.exists(sink_log):
        fs.delete(sink_log, True)
    id_frame = F.broadcast(
        spark.createDataFrame([(i,) for i in ids], [id_col]).distinct()
    )
    postings = spark.read.parquet(path)
    doomed = postings.join(id_frame, id_col, "left_semi").localCheckpoint(
        eager=True
    )
    rows_deleted = doomed.count()
    if rows_deleted == 0:
        return {"rows_deleted": 0, "touched_buckets": []}
    touched = sorted(
        r["tg_bucket"] for r in doomed.select("tg_bucket").distinct().collect()
    )
    keep = (
        postings.filter(F.col("tg_bucket").isin(touched))
        .join(id_frame, id_col, "left_anti")
        .localCheckpoint(eager=True)
    )
    _dynamic_partition_overwrite(keep, path, "tg_bucket", touched)
    # sidecar: decrement the advisory hot-trigram dfs by the deleted
    # postings (only listed trigrams; <=0 entries drop)
    try:
        meta = json.loads(spark.read.parquet(f"{path}_meta").head()["meta"])
    except Exception:
        meta = None
    if meta is not None and meta.get("hot_df"):
        hot = meta["hot_df"]
        dec = {
            r["trigram"]: r["c"]
            for r in doomed.filter(F.col("trigram").isin(list(hot)))
            .groupBy("trigram")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        meta["hot_df"] = {
            t: n - dec.get(t, 0) for t, n in hot.items() if n - dec.get(t, 0) > 0
        }
        spark.createDataFrame([(json.dumps(meta),)], "meta string").coalesce(
            1
        ).write.mode("overwrite").parquet(f"{path}_meta")
    return {"rows_deleted": rows_deleted, "touched_buckets": touched}
