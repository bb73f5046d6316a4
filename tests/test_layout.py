"""Clustered layout: per-file min/max ranges are near-disjoint (the
zone-map property readers skip by), the range filter reaches the
parquet scan as a pushed filter, and the data round-trips identically."""

from __future__ import annotations

import glob
import shutil
import tempfile

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.plans.explain import (
    physical_plan,
)
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.sources.layout import (
    write_clustered,
)


def _file_ranges(path: str, col: str) -> list[tuple]:
    out = []
    for f in sorted(glob.glob(path + "/*.parquet")):
        md = pq.ParquetFile(f).metadata
        los, his = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    los.append(c.statistics.min)
                    his.append(c.statistics.max)
        out.append((min(los), max(his)))
    return out


def test_write_clustered_zone_maps_and_pushdown(spark, tables):
    li = tables["lineitem"].select("l_orderkey", "l_partkey", "l_extendedprice")
    tmp = tempfile.mkdtemp(prefix="layout_")
    try:
        write_clustered(
            li, tmp + "/clustered", ["l_orderkey"],
            max_records_per_file=20_000, n_partitions=6,
        )
        li.repartition(8).write.parquet(tmp + "/shuffled")

        ranges = _file_ranges(tmp + "/clustered", "l_orderkey")
        assert len(ranges) >= 3  # several skipping units exist
        # clustered: files cover near-disjoint slices — sorted by lo,
        # each file's hi must not reach into the file after next
        ranges.sort()
        overlaps = sum(1 for (_, hi_a), (lo_b, _) in zip(ranges, ranges[1:]) if hi_a > lo_b)
        assert overlaps == 0

        # unclustered: every file spans ~the whole domain (no skipping)
        bad = _file_ranges(tmp + "/shuffled", "l_orderkey")
        domain_lo = min(lo for lo, _ in bad)
        domain_hi = max(hi for _, hi in bad)
        assert all(hi - lo > (domain_hi - domain_lo) * 0.5 for lo, hi in bad)

        # a range predicate on the cluster key is pushed to the scan
        df = spark.read.parquet(tmp + "/clustered").filter(
            (F.col("l_orderkey") >= 1000) & (F.col("l_orderkey") < 2000)
        )
        plan = physical_plan(df)
        assert "PushedFilters" in plan
        pushed = plan.split("PushedFilters:")[1].splitlines()[0]
        assert "l_orderkey" in pushed

        # identical data after the rewrite (price summed as exact
        # decimal — double sums are partition-order-dependent)
        exact = [
            F.count("*").alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("price"),
            F.sum("l_orderkey").alias("keys"),
        ]
        a = spark.read.parquet(tmp + "/clustered").agg(*exact).collect()
        b = li.agg(*exact).collect()
        assert a == b
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_write_clustered_rejects_overlapping_partition_keys(tables):
    import pytest

    with pytest.raises(ValueError):
        write_clustered(
            tables["lineitem"], "/tmp/unused", ["l_orderkey"], partition_by=["l_orderkey"]
        )


def test_compaction_plan_bins(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.layout import compaction_plan

    rows = [
        ("p", 1, 40), ("p", 2, 40), ("p", 3, 40),  # 40+40 -> grp0 (80 >= 100? no)
        ("p", 4, 500),                               # big: keep
        ("p", 5, 30),
        ("q", 6, 10),
    ]
    df = spark.createDataFrame(rows, "part string, fid long, sz long")
    out = {r.fid: r for r in compaction_plan(
        df, "fid", "sz", ["part"], target_bytes=100, small_threshold=100
    ).collect()}
    # next-fit by offset: f1 start 0 -> g0; f2 start 40 -> g0; f3 start 80 -> g0
    # (overruns target by one file); f5 start 120 -> g1; f4 kept; q resets.
    assert [out[i].grp for i in (1, 2, 3, 5)] == [0, 0, 0, 1]
    assert out[4].action == "keep" and out[4].grp is None
    assert out[1].grp_bytes == 120 and out[1].grp_files == 3
    assert out[5].grp_bytes == 30 and out[5].grp_files == 1
    assert out[6].grp == 0 and out[6].grp_bytes == 10


def test_compaction_plan_no_small_files(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.layout import compaction_plan

    df = spark.createDataFrame([("p", 1, 900)], "part string, fid long, sz long")
    r = compaction_plan(df, "fid", "sz", ["part"], target_bytes=100).collect()[0]
    assert r.action == "keep" and r.grp is None and r.grp_bytes is None


# r14: part of the fast driver-gate subset (default `pytest` selection
# per pytest.ini; `-m ''` runs the full suite)
import pytest as _pytest

pytestmark = _pytest.mark.driver_gate
