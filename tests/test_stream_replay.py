"""Crash-replay idempotence of the ``log_free`` index-append sinks
(round-10 verdict #1): an uncommitted micro-batch re-delivered after a
restart must NOT double-append.  Two crash states are simulated against
every stream_*_index_ingest sink by surgically editing the checkpoint:

- committed-but-unacknowledged: the batch's data committed (marker
  present) but the checkpoint's ``commits/<n>`` never landed — the
  replay must hit the marker and no-op;
- mid-commit: the batch's files were moved into the index but the
  marker never landed — the replay must sweep the batch-tagged
  leftovers and re-move, leaving exactly one copy.

Either way the final index contents equal the no-crash run row-for-row
and ``validate_index`` stays green.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
    ann_index as A,
    ingest as I,
)
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.streaming import (
    pipeline as P,
)


def _rows(spark, idx):
    df = spark.read.parquet(idx)
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def _remove_commit(ckpt: str, n: int) -> None:
    for f in (f"{ckpt}/commits/{n}", f"{ckpt}/commits/.{n}.crc"):
        if os.path.exists(f):
            os.remove(f)


def _remove_marker(idx: str, n: int) -> None:
    hits = glob.glob(f"{idx}/_appended_batches/*-{n}")
    assert hits, f"no batch marker for {n} under {idx}"
    for m in hits:
        os.remove(m)
        crc = os.path.join(os.path.dirname(m), f".{os.path.basename(m)}.crc")
        if os.path.exists(crc):
            os.remove(crc)


def _replay_scenario(spark, start, writes, idx, ckpt, validate=True):
    """Drive ``len(writes)`` micro-batches through the sink, snapshot,
    then replay the last batch in both crash states."""
    for w in writes:
        w()
        q = start()
        q.processAllAvailable()
        q.stop()
    snapshot = _rows(spark, idx)
    assert snapshot, "sink produced an empty index"
    last = max(
        int(f) for f in os.listdir(f"{ckpt}/commits") if not f.startswith(".")
    )

    # state 1: checkpoint commit lost, data commit (marker) present
    _remove_commit(ckpt, last)
    q = start()
    q.processAllAvailable()
    q.stop()
    assert _rows(spark, idx) == snapshot, "marker-present replay duplicated rows"

    # state 2: crash mid-commit — marker lost, moved files still there
    _remove_commit(ckpt, last)
    _remove_marker(idx, last)
    q = start()
    q.processAllAvailable()
    q.stop()
    assert _rows(spark, idx) == snapshot, "mid-commit replay duplicated rows"
    if validate:
        assert A.validate_index(spark, idx)["issues"] == []


def _halves(tables, cut=250):
    corpus = tables["embeddings"].select(
        "vec_id", "embedding", F.lit(0).alias("label")
    )
    return corpus, (
        corpus.filter(F.col("vec_id") < cut),
        corpus.filter(F.col("vec_id") >= cut),
    )


def test_log_free_lsh_replay_idempotent(spark, tables, tmp_path):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        search as S,
    )

    planes = S.random_hyperplanes(n_planes=3, dim=64, seed=7)
    corpus, (h1, h2) = _halves(tables)
    src, idx, ckpt = str(tmp_path / "src"), str(tmp_path / "idx"), str(tmp_path / "ck")
    writes = [
        lambda: h1.write.mode("append").parquet(src),
        lambda: h2.write.mode("append").parquet(src),
    ]
    start = lambda: P.stream_lsh_index_ingest(
        spark, src, idx, ckpt, planes, dim=64, log_free=True
    )
    _replay_scenario(spark, start, writes, idx, ckpt)
    # the recovered index answers exactly like the query-time ANN
    qvec = corpus.filter("vec_id = 0").first().embedding
    expect = [
        (r.vec_id, round(r.score, 6))
        for r in S.lsh_topk(I.normalized(corpus), qvec, planes, k=10).collect()
    ]
    got = [
        (r.vec_id, round(r.score, 6))
        for r in A.lsh_topk_indexed(spark, idx, qvec, k=10).collect()
    ]
    assert got == expect
    assert spark.read.parquet(idx).count() == corpus.count()


def test_log_free_ivf_replay_idempotent(spark, tables, tmp_path):
    corpus, (h1, h2) = _halves(tables)
    normed = I.normalized(corpus)
    cents = [
        (i, list(r.embedding))
        for i, r in enumerate(
            normed.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()
        )
    ]
    src, idx, ckpt = str(tmp_path / "src"), str(tmp_path / "idx"), str(tmp_path / "ck")
    writes = [
        lambda: h1.write.mode("append").parquet(src),
        lambda: h2.write.mode("append").parquet(src),
    ]
    start = lambda: P.stream_ivf_index_ingest(
        spark, src, idx, ckpt, cents, dim=64, log_free=True
    )
    _replay_scenario(spark, start, writes, idx, ckpt)
    assert spark.read.parquet(idx).count() == corpus.count()


def test_log_free_ivfpq_replay_idempotent(spark, tables, tmp_path):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        pq as PQ,
    )

    corpus, (h1, h2) = _halves(tables)
    normed = I.normalized(corpus)
    rows = normed.filter(F.col("vec_id") < 16).orderBy("vec_id").collect()
    cents = [(i, list(r.embedding)) for i, r in enumerate(rows[:4])]
    codebooks = PQ.codebooks_from_rows([list(r.embedding) for r in rows], m=8)
    src, idx, ckpt = str(tmp_path / "src"), str(tmp_path / "idx"), str(tmp_path / "ck")
    writes = [
        lambda: h1.write.mode("append").parquet(src),
        lambda: h2.write.mode("append").parquet(src),
    ]
    start = lambda: P.stream_ivfpq_index_ingest(
        spark, src, idx, ckpt, cents, codebooks, dim=64, log_free=True
    )
    _replay_scenario(spark, start, writes, idx, ckpt)
    assert spark.read.parquet(idx).count() == corpus.count()


def test_log_free_bq_replay_idempotent(spark, tables, tmp_path):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        bq as BQ,
    )

    corpus, (h1, h2) = _halves(tables, cut=40)
    small = corpus.filter(F.col("vec_id") < 80)
    thr = BQ.train_bq_thresholds(small, dim=64)
    src, idx, ckpt = str(tmp_path / "src"), str(tmp_path / "idx"), str(tmp_path / "ck")
    h2 = h2.filter(F.col("vec_id") < 80)
    writes = [
        lambda: h1.write.mode("append").parquet(src),
        lambda: h2.write.mode("append").parquet(src),
    ]
    start = lambda: P.stream_bq_index_ingest(
        spark, src, idx, ckpt, thr, dim=64, log_free=True
    )
    _replay_scenario(spark, start, writes, idx, ckpt)
    assert spark.read.parquet(idx).count() == small.count()


def test_log_free_trigram_replay_idempotent(spark, tmp_path):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        grep as GR,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs"),
            (3, "quick silver foxes"),
            (4, "sphinx of black quartz judge my vow"),
            (5, "brown paper packages tied up with strings"),
            (6, "the five boxing wizards jump quickly"),
        ],
        "doc_id long, text string",
    )
    src, idx, ckpt = str(tmp_path / "src"), str(tmp_path / "idx"), str(tmp_path / "ck")
    writes = [
        lambda: docs.filter("doc_id <= 3").write.mode("append").parquet(src),
        lambda: docs.filter("doc_id > 3").write.mode("append").parquet(src),
    ]
    start = lambda: P.stream_trigram_index_ingest(
        spark, src, idx, ckpt, log_free=True
    )
    _replay_scenario(spark, start, writes, idx, ckpt, validate=False)
    # the recovered index serves grep identically to a scan
    for pat in ("quick", "brown", "fox"):
        scan = {r.doc_id for r in GR.grep_scan(docs, pat).collect()}
        got = {r.doc_id for r in GR.grep_indexed(spark, idx, docs, pat).collect()}
        assert got == scan, pat
