"""Format layer: round-trips, schema discipline, corrupt-record
quarantine."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.sources import formats as FMT


@pytest.fixture()
def tmp():
    d = tempfile.mkdtemp(prefix="formats_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_infer_format_by_extension():
    assert FMT.infer_format("/a/b/docs.jsonl") == "json"
    assert FMT.infer_format("s3a://bucket/t.csv") == "csv"
    assert FMT.infer_format("/data/table.parquet/") == "parquet"
    assert FMT.infer_format("/data/unknown_dir") == "parquet"


@pytest.mark.parametrize("ext", ["parquet", "csv", "json", "orc"])
def test_round_trip_every_format(spark, tmp, ext):
    df = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta", -2.0)], "id long, name string, v double"
    )
    path = f"{tmp}/t.{ext}"
    FMT.write_any(df, path)
    back = FMT.read_any(spark, path, schema="id long, name string, v double")
    assert {tuple(r) for r in back.collect()} == {(1, "alpha", 1.5), (2, "beta", -2.0)}


def test_schemaless_formats_require_explicit_choice(spark, tmp):
    df = spark.createDataFrame([(1, "x")], "id long, s string")
    FMT.write_any(df, f"{tmp}/t.csv")
    with pytest.raises(ValueError, match="schema"):
        FMT.read_any(spark, f"{tmp}/t.csv")
    inferred = FMT.read_any(spark, f"{tmp}/t.csv", infer=True)
    assert inferred.count() == 1


def test_corrupt_json_rows_quarantine_not_crash(spark, tmp):
    with open(f"{tmp}/docs.jsonl", "w") as f:
        f.write('{"doc_id": 1, "text": "good"}\n')
        f.write("{not json at all\n")
        f.write('{"doc_id": 2, "text": "also good"}\n')
    df = FMT.read_any(
        spark,
        f"{tmp}/docs.jsonl",
        schema="doc_id long, text string, _corrupt_record string",
    )
    rows = df.collect()
    good = {r.doc_id for r in rows if r._corrupt_record is None}
    bad = [r for r in rows if r._corrupt_record is not None]
    assert good == {1, 2}
    assert len(bad) == 1


def test_partitioned_write_prunes(spark, tmp):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.plans.explain import (
        assert_plan_contains,
    )

    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "de", f"d{i}") for i in range(20)],
        "doc_id long, lang string, text string",
    )
    path = f"{tmp}/docs.parquet"
    FMT.write_any(df, path, partition_by=["lang"])
    back = FMT.read_any(spark, path).filter("lang = 'en'")
    assert back.count() == 10
    assert_plan_contains(back, "PartitionFilters: [isnotnull(lang")


# r14: part of the fast driver-gate subset (default `pytest` selection
# per pytest.ini; `-m ''` runs the full suite)
import pytest as _pytest

pytestmark = _pytest.mark.driver_gate
