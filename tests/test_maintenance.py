"""Small-file compaction: fewer files, identical data, partition
layout preserved."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import ingest as I
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.sources import maintenance as MN


def _snapshot(spark, path):
    return sorted(
        (r.vec_id, r.shard, tuple(round(x, 6) for x in r.embedding))
        for r in spark.read.parquet(path).collect()
    )


def test_compact_collection_shrinks_files_preserves_data(spark, tables):
    prepared = I.prepare_vectors(tables["embeddings"], dim=64, n_shards=4)
    tmp = tempfile.mkdtemp(prefix="compact_")
    path = tmp + "/coll"
    try:
        # simulate append-heavy fragmentation: many writer tasks per shard
        prepared.repartition(32).write.partitionBy("shard").parquet(path)
        before_files = MN.table_file_stats(spark, path)["n_files"]
        assert before_files > 8, "fixture should be fragmented"
        before = _snapshot(spark, path)

        stats = MN.compact_collection(spark, path, target_file_bytes=512 * 1024 * 1024)

        assert stats["files_before"] == before_files
        # one writer task per shard, rows fit one file each → 4 files
        assert stats["files_after"] <= 4
        assert stats["rows"] == len(before)
        assert _snapshot(spark, path) == before
        # partition directories survive (pruned scans still work)
        pruned = spark.read.parquet(path).filter(F.col("shard") == 1)
        assert pruned.count() == sum(1 for _, s, _ in before if s == 1)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_compact_empty_and_unpartitioned(spark, tables):
    tmp = tempfile.mkdtemp(prefix="compact_plain_")
    path = tmp + "/t"
    try:
        docs = tables["documents"].select("doc_id", "text")
        docs.repartition(16).write.parquet(path)
        before = sorted((r.doc_id, r.text) for r in spark.read.parquet(path).collect())
        stats = MN.compact_collection(spark, path, partition_col=None)
        assert stats["files_after"] < stats["files_before"]
        assert sorted((r.doc_id, r.text) for r in spark.read.parquet(path).collect()) == before
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
