"""Trigram-index substring search: indexed == scan on hand-built and
corpus docs, partition pruning on the postings read, fallbacks. The
sf0.01 oracle value-check of the contract entries runs in
tests/test_contract_extras.py."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
    grep as GR,
)


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "the quick brown fox"),
        (2, "quick silver"),
        (3, "a qu"),            # shorter than some patterns
        (4, ""),                # empty text
        (5, "slow brown dog"),
        (6, "the quick brown fox jumps"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_trigram_keys_edges(spark):
    df = spark.createDataFrame([("abcd",), ("ab",), ("",)], "text string")
    got = [r.g for r in df.select(GR.trigram_keys("text").alias("g")).collect()]
    assert got[0] == ["abc", "bcd"]
    assert got[1] == [] and got[2] == []


def test_grep_indexed_equals_scan(spark, docs, tmp_path):
    path = str(tmp_path / "tg")
    GR.write_trigram_index(docs, path)
    for pat in ("quick brown", "brown", "fox", "qu", "zebra", "the quick brown fox jumps"):
        scan = {r.doc_id for r in GR.grep_scan(docs, pat).collect()}
        idx = {r.doc_id for r in GR.grep_indexed(spark, path, docs, pat).collect()}
        assert idx == scan, pat
    # sanity on one known answer
    assert {r.doc_id for r in GR.grep_scan(docs, "quick brown").collect()} == {1, 6}


def test_grep_indexed_prunes_partitions(spark, docs, tmp_path):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.plans.explain import (
        physical_plan,
    )

    path = str(tmp_path / "tg")
    GR.write_trigram_index(docs, path)
    plan = physical_plan(GR.grep_indexed(spark, path, docs, "quick brown"))
    assert "PartitionFilters" in plan and "tg_bucket" in plan


def test_grep_hot_trigram_dropped_still_exact(spark, tmp_path):
    # one boilerplate trigram in every doc: the df-ranked query side
    # must prefer rare trigrams, and the result stays exact
    rows = [(i, f"zzz common tail marker{i}") for i in range(30)]
    rows += [(100, "zzz unique needle here")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "tg")
    GR.write_trigram_index(docs, path)
    got = {r.doc_id for r in GR.grep_indexed(
        spark, path, docs, "unique needle", max_query_trigrams=2
    ).collect()}
    assert got == {100}


def test_grep_many_matches_per_pattern_scan(spark, docs, tmp_path):
    path = str(tmp_path / "tg")
    GR.write_trigram_index(docs, path)
    pats = ["quick brown", "brown", "qu", "zebra"]  # incl. short + miss
    got = {(r.pattern, r.doc_id) for r in GR.grep_many(spark, path, docs, pats).collect()}
    want = {
        (p, r.doc_id) for p in pats for r in GR.grep_scan(docs, p).collect()
    }
    assert got == want and ("qu", 3) in got and not any(p == "zebra" for p, _ in got)


def test_stream_trigram_index_serves_grep(spark, docs, tmp_path):
    # postings streamed across micro-batches == batch index answers
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.streaming import (
        pipeline as P,
    )

    src, idx, ckpt = str(tmp_path / "src"), str(tmp_path / "idx"), str(tmp_path / "ck")
    half1 = docs.filter("doc_id <= 3")
    half2 = docs.filter("doc_id > 3")
    half1.write.mode("append").parquet(src)
    q = P.stream_trigram_index_ingest(spark, src, idx, ckpt)
    q.processAllAvailable()
    half2.write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    for pat in ("quick brown", "brown", "fox jumps"):
        scan = {r.doc_id for r in GR.grep_scan(docs, pat).collect()}
        got = {r.doc_id for r in GR.grep_indexed(spark, idx, docs, pat).collect()}
        assert got == scan, pat


def test_grep_like_matches_like_scan(spark, docs, tmp_path):
    path = str(tmp_path / "tg")
    GR.write_trigram_index(docs, path)
    pats = [
        "%quick%fox%",        # two indexable segments, ordered
        "%fox%quick%",        # wrong order: LIKE verify must reject
        "%brown%",            # single segment
        "%q_ick%",            # _ hole splits the segment
        "%a%",                # no indexable segment -> scan fallback
    ]
    from pyspark.sql import functions as F

    for pat in pats:
        want = {r.doc_id for r in docs.filter(F.col("text").like(pat))
                .select("doc_id").collect()}
        got = {r.doc_id for r in GR.grep_like(spark, path, docs, pat).collect()}
        assert got == want, pat
    assert {r.doc_id for r in GR.grep_like(spark, path, docs, "%quick%fox%").collect()} == {1, 6}
    assert GR.grep_like(spark, path, docs, "%fox%quick%").count() == 0


def test_grep_like_escaped_wildcards_exact(spark, tmp_path):
    # r8 ADVICE fix: '\%'/'\_' are literal chars, not segment breaks —
    # the old split kept the backslash in the segment, minting trigrams
    # ('00\') that no matching doc contains, so true matches vanished
    # from the candidate superset.
    rows = [
        (1, "save 100% today"),
        (2, "save 100x today"),
        (3, "fully 50% off"),
        (4, "a_b literal underscore"),
        (5, "axb hole char"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "tg_esc")
    GR.write_trigram_index(docs, path)
    for pat in [r"%100\%%", r"%a\_b%", r"%a_b%", r"%50\% off%"]:
        want = {r.doc_id for r in docs.filter(F.col("text").like(pat))
                .select("doc_id").collect()}
        got = {r.doc_id for r in GR.grep_like(spark, path, docs, pat).collect()}
        assert got == want, pat
    # sanity on the python splitter itself
    assert GR._like_literal_segments(r"%100\%%") == ["100%"]
    assert GR._like_literal_segments(r"%a\_b%") == ["a_b"]
    assert GR._like_literal_segments(r"a\\b%c") == ["a\\b", "c"]
    assert GR._like_literal_segments("abc\\") is None  # dangling escape


def test_delete_from_trigram_index(spark, tables, tmp_path):
    """Delete docs from the substring index: grep no longer returns
    them, untouched buckets stay byte-identical, the advisory hot-df
    list decrements (never below 1)."""
    import json
    import os

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        grep as G,
    )

    docs = tables["documents"].select("doc_id", "text").filter("doc_id < 80")
    path = str(tmp_path / "tg")
    meta0 = G.write_trigram_index(docs, path)
    # pick a pattern present in doc 0 so the delete is observable
    sample = docs.filter("doc_id = 0").first().text
    pattern = sample[:6]
    before_hits = {r.doc_id for r in G.grep_indexed(spark, path, docs, pattern).collect()}
    assert 0 in before_hits
    postings = spark.read.parquet(path)
    victim_buckets = {
        r.tg_bucket for r in postings.filter(F.col("doc_id").isin([0, 1]))
        .select("tg_bucket").distinct().collect()
    }
    untouched = sorted(
        {r.tg_bucket for r in postings.select("tg_bucket").distinct().collect()}
        - victim_buckets
    )

    def snap(b):
        d = os.path.join(path, f"tg_bucket={b}")
        return [(f, os.path.getsize(os.path.join(d, f))) for f in sorted(os.listdir(d))]

    before = {b: snap(b) for b in untouched}
    out = G.delete_from_trigram_index(spark, path, [0, 1])
    assert out["rows_deleted"] > 0
    assert sorted(out["touched_buckets"]) == sorted(victim_buckets)
    for b in untouched:
        assert snap(b) == before[b], b
    left = spark.read.parquet(path)
    assert left.filter(F.col("doc_id").isin([0, 1])).count() == 0
    # the corpus passed to the query is the reduced one (erased docs
    # are gone from storage too in a real flow)
    reduced = docs.filter(~F.col("doc_id").isin([0, 1]))
    after_hits = {r.doc_id for r in G.grep_indexed(spark, path, reduced, pattern).collect()}
    assert 0 not in after_hits and 1 not in after_hits
    assert after_hits == before_hits - {0, 1}
    meta1 = json.loads(spark.read.parquet(f"{path}_meta").head()["meta"])
    assert all(v >= 1 for v in meta1["hot_df"].values())
    assert sum(meta1["hot_df"].values()) < sum(meta0["hot_df"].values())
    # no-op ids
    assert G.delete_from_trigram_index(spark, path, [10**9])["rows_deleted"] == 0
