"""Materialized ANN index: write partitioned, read pruned — the scale
contract is that the bucket/cell filter is a PARTITION filter (files
outside the probe are never opened), asserted on the physical plan."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
    ann_index as A,
    search as S,
)
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.plans.explain import (
    physical_plan,
)


@pytest.fixture(scope="module")
def corpus(tables):
    return tables["embeddings"].select("vec_id", "embedding")


@pytest.fixture(scope="module")
def qvec(corpus):
    return corpus.filter("vec_id = 0").collect()[0].embedding


def test_lsh_index_prunes_partitions_and_matches_query_time(corpus, qvec, spark):
    planes = S.random_hyperplanes(n_planes=4, dim=64, seed=7)
    tmp = tempfile.mkdtemp(prefix="lsh_idx_")
    try:
        A.write_lsh_index(corpus, tmp, planes)
        df = A.lsh_topk_indexed(spark, tmp, qvec, k=10)
        plan = physical_plan(df)
        assert "PartitionFilters" in plan
        part_filters = plan.split("PartitionFilters:")[1].splitlines()[0]
        assert "bucket" in part_filters  # pruning reaches the scan
        # pruned result == query-time LSH over the same planes
        expect = [r.vec_id for r in S.lsh_topk(corpus, qvec, planes, k=10).collect()]
        got = [r.vec_id for r in df.collect()]
        assert got == expect
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_lsh_index_multi_probe_improves_candidates(corpus, qvec, spark):
    planes = S.random_hyperplanes(n_planes=4, dim=64, seed=7)
    tmp = tempfile.mkdtemp(prefix="lsh_idx_")
    try:
        A.write_lsh_index(corpus, tmp, planes)
        one = A.lsh_topk_indexed(spark, tmp, qvec, k=50, n_probe_buckets=1).count()
        multi = A.lsh_topk_indexed(spark, tmp, qvec, k=50, n_probe_buckets=3).count()
        assert multi >= one
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_ivf_index_prunes_and_matches_query_time(corpus, qvec, spark):
    centroids = A.train_centroids(corpus, n_centroids=4, sample_fraction=1.0)
    tmp = tempfile.mkdtemp(prefix="ivf_idx_")
    try:
        A.write_ivf_index(corpus, tmp, centroids)
        df = A.ivf_topk_indexed(spark, tmp, qvec, k=10, nprobe=2)
        plan = physical_plan(df)
        assert "PartitionFilters" in plan
        assert "ivf_cell" in plan.split("PartitionFilters:")[1].splitlines()[0]
        expect = [r.vec_id for r in S.ivf_topk(corpus, qvec, centroids, k=10, nprobe=2).collect()]
        assert [r.vec_id for r in df.collect()] == expect
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_lsh_index_incremental_append(corpus, qvec, spark):
    """Appends land in their bucket directories only (no full rewrite —
    unlike the reference GPU path's re-upload); queries see old+new."""
    planes = S.random_hyperplanes(n_planes=4, dim=64, seed=7)
    tmp = tempfile.mkdtemp(prefix="lsh_idx_")
    try:
        first = corpus.filter("vec_id < 1000")
        rest = corpus.filter("vec_id >= 1000")
        A.write_lsh_index(first, tmp, planes)
        n1 = spark.read.parquet(tmp).count()
        A.write_lsh_index(rest, tmp, planes, mode="append")
        n2 = spark.read.parquet(tmp).count()
        assert (n1, n2) == (first.count(), corpus.count())
        got = [r.vec_id for r in A.lsh_topk_indexed(spark, tmp, qvec, k=10).collect()]
        expect = [r.vec_id for r in S.lsh_topk(corpus, qvec, planes, k=10).collect()]
        assert got == expect  # post-append results == full-corpus query-time LSH
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_train_centroids_deterministic(corpus):
    a = A.train_centroids(corpus, n_centroids=3, sample_fraction=1.0)
    b = A.train_centroids(corpus, n_centroids=3, sample_fraction=1.0)
    assert a == b
    assert len(a) == 3 and all(len(c[1]) == 64 for c in a)


def test_filtered_indexed_ann_pushes_both_filters(tables, spark):
    """Metadata-filtered ANN over the materialized index: the label
    predicate must ride the SAME partition-pruned scan (PartitionFilters
    carries the bucket, PushedFilters carries the label), and results
    must equal filtering inside the probed buckets at query time."""
    corpus = tables["embeddings"].select("vec_id", "embedding", "label")
    qvec = corpus.filter("vec_id = 0").collect()[0].embedding
    planes = S.random_hyperplanes(n_planes=4, dim=64, seed=7)
    tmp = tempfile.mkdtemp(prefix="lsh_idx_filt_")
    try:
        A.write_lsh_index(corpus, tmp, planes)
        df = A.lsh_topk_indexed(
            spark, tmp, qvec, k=10, where=F.col("label") == 1
        )
        plan = physical_plan(df)
        assert "PartitionFilters" in plan
        part = plan.split("PartitionFilters:")[1].splitlines()[0]
        assert "bucket" in part
        pushed = plan.split("PushedFilters:")[1].splitlines()[0]
        assert "label" in pushed  # the metadata predicate reaches the scan
        # parity: same as filtering the probed bucket at query time
        bucketed = corpus.withColumn("bucket", S.lsh_bucket("embedding", planes))
        probe = S.lsh_probe_buckets(qvec, planes, 1)
        expect = [
            r.vec_id
            for r in S.topk(
                bucketed.filter(F.col("bucket").isin(probe)).filter("label = 1"),
                qvec,
                k=10,
            ).collect()
        ]
        got = [r.vec_id for r in df.collect()]
        assert got == expect and len(got) > 0
        # every returned id really has label 1, and the string-predicate
        # form produces the same ids
        labels = {r.vec_id: r.label for r in corpus.collect()}
        assert all(labels[i] == 1 for i in got)
        got_str = [
            r.vec_id
            for r in A.lsh_topk_indexed(
                spark, tmp, qvec, k=10, where="label = 1"
            ).collect()
        ]
        assert got_str == got
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_distributed_trainer_drops_into_ivf_index(spark, tables, tmp_path):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.ann_index import (
        ivf_topk_indexed,
        train_centroids_distributed,
        write_ivf_index,
    )

    emb = tables["embeddings"]
    cents = train_centroids_distributed(emb, n_centroids=4, n_iter=3)
    assert len(cents) == 4 and all(len(c) == 64 for _, c in cents)
    path = str(tmp_path / "ivf_dist")
    write_ivf_index(emb, path, cents)
    qv = emb.filter("vec_id = 0").head()["embedding"]
    res = ivf_topk_indexed(spark, path, qv, k=5, nprobe=2).collect()
    assert len(res) == 5
    # the query's own vector lives in the probed cell → self at rank 1
    assert res[0]["vec_id"] == 0


def test_ivf_knn_join_indexed_pruned_and_consistent(spark, tables, tmp_path):
    from pyspark.sql import functions as F

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.ann_index import (
        ivf_knn_join_indexed,
        ivf_topk_indexed,
        write_ivf_index,
    )
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.plans.explain import (
        physical_plan,
    )

    emb = tables["embeddings"]
    cents = [
        (i, list(r["embedding"]))
        for i, r in enumerate(emb.filter("vec_id < 4").orderBy("vec_id").collect())
    ]
    path = str(tmp_path / "ivf_batch")
    write_ivf_index(emb.select("vec_id", "embedding"), path, cents)
    qs = emb.filter("vec_id < 3").select(F.col("vec_id").alias("qid"), "embedding")

    batch = ivf_knn_join_indexed(spark, path, qs, k=5, nprobe=2)
    rows = batch.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append((r["vec_id"], round(r["score"], 9)))
    # batch answers == per-query indexed answers, query by query
    for r in qs.collect():
        single = ivf_topk_indexed(
            spark, path, r["embedding"], k=5, nprobe=2
        ).collect()
        assert by_q[r["qid"]] == [
            (s["vec_id"], round(s["score"], 9)) for s in single
        ]
    # the read is partition-pruned on the probed-cell union
    plan = physical_plan(batch)
    assert "PartitionFilters" in plan
    assert "ivf_cell" in plan.split("PartitionFilters:")[1].splitlines()[0]


def test_validate_index_all_kinds(spark, tables, tmp_path):
    from pyspark.sql import functions as F

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        bq as BQ,
        sq as SQ,
    )
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.ann_index import (
        validate_index,
        write_ivf_index,
        write_lsh_index,
    )
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.search import (
        random_hyperplanes,
    )

    emb = tables["embeddings"].select("vec_id", "embedding")

    p = str(tmp_path / "lsh")
    write_lsh_index(emb, p, random_hyperplanes(n_planes=3, dim=64, seed=5))
    out = validate_index(spark, p)
    assert out["kind"] == "lsh" and out["rows"] == emb.count() and out["issues"] == []

    p = str(tmp_path / "ivf")
    cents = [(i, list(r["embedding"])) for i, r in
             enumerate(emb.filter("vec_id < 3").orderBy("vec_id").collect())]
    write_ivf_index(emb, p, cents)
    out = validate_index(spark, p)
    assert out["kind"] == "ivf" and out["issues"] == []

    p = str(tmp_path / "bq")
    thr = BQ.train_bq_thresholds(emb, dim=64)
    BQ.write_bq_index(emb, p, thr)
    out = validate_index(spark, p)
    assert out["kind"] == "bq" and out["issues"] == []

    p = str(tmp_path / "sq")
    ranges = SQ.train_sq_ranges(emb, dim=64)
    SQ.write_sq_index(emb, p, ranges)
    out = validate_index(spark, p)
    assert out["kind"] == "sq" and out["issues"] == []


def test_validate_index_flags_corruption(spark, tables, tmp_path):
    from pyspark.sql import functions as F

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.ann_index import (
        validate_index,
        write_ivf_index,
    )

    emb = tables["embeddings"].select("vec_id", "embedding")
    cents = [(i, list(r["embedding"])) for i, r in
             enumerate(emb.filter("vec_id < 2").orderBy("vec_id").collect())]
    p = str(tmp_path / "ivf_bad")
    write_ivf_index(emb, p, cents)
    # corrupt: append rows into a cell the sidecar doesn't know
    emb.limit(3).withColumn("ivf_cell", F.lit(99)).repartition(1).write.mode(
        "append"
    ).partitionBy("ivf_cell").parquet(p)
    out = validate_index(spark, p)
    assert out["issues"] and "99" in out["issues"][0]


def _partition_snapshot(path, part_dir):
    """(name, size) listing of one partition directory — byte-identity
    witness for untouched partitions."""
    import os

    out = []
    d = os.path.join(path, part_dir)
    for f in sorted(os.listdir(d)):
        fp = os.path.join(d, f)
        out.append((f, os.path.getsize(fp), open(fp, "rb").read()))
    return out


def test_delete_from_lsh_index_prunes_and_preserves(corpus, qvec, spark, tmp_path):
    """r9 verdict #6: delete ids in place — searches exclude them,
    only the touched bucket partitions rewrite (untouched dirs
    byte-identical), validate_index still passes."""
    import os

    path = str(tmp_path / "lshdel")
    planes = S.random_hyperplanes(n_planes=3, dim=64, seed=5)
    A.write_lsh_index(corpus, path, planes)
    all_ids = [r.vec_id for r in corpus.select("vec_id").orderBy("vec_id").collect()]
    doomed = all_ids[:5]
    # locate victim + untouched buckets beforehand
    idx = spark.read.parquet(path)
    victim_buckets = {
        r.bucket for r in idx.filter(F.col("vec_id").isin(doomed))
        .select("bucket").distinct().collect()
    }
    untouched = sorted(
        {r.bucket for r in idx.select("bucket").distinct().collect()}
        - victim_buckets
    )
    assert untouched, "fixture needs at least one untouched bucket"
    before = {b: _partition_snapshot(path, f"bucket={b}") for b in untouched}
    out = A.delete_from_index(spark, path, doomed)
    assert out["kind"] == "lsh"
    assert sorted(out["touched_partitions"]) == sorted(victim_buckets)
    assert out["rows_deleted"] == 5
    after = spark.read.parquet(path)
    assert after.filter(F.col("vec_id").isin(doomed)).count() == 0
    assert after.count() == len(all_ids) - 5
    for b in untouched:
        assert _partition_snapshot(path, f"bucket={b}") == before[b], b
    # searches exclude the deleted ids
    got = A.lsh_topk_indexed(spark, path, qvec, k=50, n_probe_buckets=8).collect()
    assert not ({r.vec_id for r in got} & set(doomed))
    assert A.validate_index(spark, path)["issues"] == []
    # deleting every id in a bucket drops its directory
    rest = [r.vec_id for r in after.filter(F.col("bucket") == untouched[0])
            .select("vec_id").collect()]
    A.delete_from_index(spark, path, rest)
    assert not os.path.exists(os.path.join(path, f"bucket={untouched[0]}"))
    assert A.validate_index(spark, path)["issues"] == []


def test_delete_from_unpartitioned_code_index(corpus, spark, tmp_path):
    """bq/sq/pq code tables are flat — delete is anti-join + staged
    full rewrite; sidecar survives, validate_index passes."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        bq as BQ,
    )

    path = str(tmp_path / "bqdel")
    thr = BQ.train_bq_thresholds(corpus, dim=64)
    BQ.write_bq_index(corpus, path, thr)
    n = corpus.count()
    out = A.delete_from_index(spark, path, [0, 1, 2])
    assert out["kind"] == "bq" and out["rows_deleted"] == 3
    after = spark.read.parquet(path)
    assert after.count() == n - 3
    assert after.filter(F.col("vec_id").isin([0, 1, 2])).count() == 0
    assert A.validate_index(spark, path)["issues"] == []
    # no-op delete of absent ids
    out = A.delete_from_index(spark, path, [10**9])
    assert out["rows_deleted"] == 0


def test_delete_then_stream_maintenance_consistent(corpus, spark, tmp_path):
    """Delete composes with the stream-maintained index: build the
    index VIA the sink, delete ids (which must drop the sink's
    _spark_metadata shadow log so the rewrite is visible), then resume
    maintenance with a fresh checkpoint on new data — the index serves
    survivors + arrivals and validate_index passes."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.streaming.pipeline import (
        stream_lsh_index_ingest,
    )

    src1, src2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    path = str(tmp_path / "lshstream")
    ck1, ck2 = str(tmp_path / "ck1"), str(tmp_path / "ck2")
    planes = S.random_hyperplanes(n_planes=3, dim=64, seed=5)
    corpus.filter("vec_id < 40").withColumn("label", F.lit(0)).write.mode(
        "append"
    ).parquet(src1)
    q = stream_lsh_index_ingest(spark, src1, path, ck1, planes, dim=64)
    q.processAllAvailable()
    q.stop()
    import os

    assert os.path.exists(os.path.join(path, "_spark_metadata"))
    out = A.delete_from_index(spark, path, [0, 1])
    assert out["rows_deleted"] == 2
    # the shadow log is gone and the rewrite is visible to batch reads
    assert not os.path.exists(os.path.join(path, "_spark_metadata"))
    got = {r.vec_id for r in spark.read.parquet(path).select("vec_id").collect()}
    assert got == set(range(2, 40))
    # resume maintenance: FRESH checkpoint + log_free sink (the
    # documented contract after a delete — a file-sink resume would
    # recreate the shadow log over only its own files)
    corpus.filter("vec_id >= 40 AND vec_id < 60").withColumn(
        "label", F.lit(0)
    ).write.mode("append").parquet(src2)
    q = stream_lsh_index_ingest(
        spark, src2, path, ck2, planes, dim=64, log_free=True
    )
    q.processAllAvailable()
    q.stop()
    assert not os.path.exists(os.path.join(path, "_spark_metadata"))
    got = {r.vec_id for r in spark.read.parquet(path).select("vec_id").collect()}
    assert got == set(range(2, 60))
    assert A.validate_index(spark, path)["issues"] == []
    # and a second delete now touches streamed rows too
    assert A.delete_from_index(spark, path, [45])["rows_deleted"] == 1


def test_flat_delete_crash_windows_recover(corpus, spark, tmp_path):
    """r10 verdict #2: every crash state of the flat-table swap is
    auto-recovered — simulate each window by reproducing the swap's
    directory states by hand, then assert recover_index (and a plain
    delete_from_index call, which runs it first) sees a complete table
    at `path` with the sidecar intact."""
    import shutil
    import os

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        bq as BQ,
    )

    path = str(tmp_path / "bqcrash")
    thr = BQ.train_bq_thresholds(corpus, dim=64)
    BQ.write_bq_index(corpus, path, thr)
    n = corpus.count()
    tmp, old = path + "__del_tmp", path + "__del_old"

    # --- window A: crash AFTER stage write, BEFORE the aside-rename
    # (live intact, orphan stage present) → stage dropped, live served
    shutil.copytree(path, tmp)
    assert A.recover_index(spark, path) == "dropped_stage"
    assert not os.path.exists(tmp)
    assert spark.read.parquet(path).count() == n
    assert A.validate_index(spark, path)["issues"] == []

    # --- window B: crash BETWEEN the two renames (no live table; the
    # complete stage holds the post-delete data + sidecar) → promoted
    shutil.move(path, tmp)
    assert A.recover_index(spark, path) == "promoted_stage"
    assert os.path.exists(path) and not os.path.exists(tmp)
    assert spark.read.parquet(path).count() == n
    assert A.validate_index(spark, path)["issues"] == []

    # --- window C: crash AFTER the swap, BEFORE dropping the aside
    shutil.copytree(path, old)
    assert A.recover_index(spark, path) == "dropped_aside"
    assert not os.path.exists(old)
    assert A.validate_index(spark, path)["issues"] == []

    # --- clean state is a no-op
    assert A.recover_index(spark, path) == "clean"

    # --- and delete_from_index itself recovers window B en route:
    # recreate it, then run a real delete — it must promote the stage
    # first and then delete from the promoted table
    shutil.move(path, tmp)
    out = A.delete_from_index(spark, path, [0, 1, 2])
    assert out["rows_deleted"] == 3
    after = spark.read.parquet(path)
    assert after.count() == n - 3
    assert not os.path.exists(tmp) and not os.path.exists(old)
    assert A.validate_index(spark, path)["issues"] == []
