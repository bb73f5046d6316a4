"""Bucketed co-located joins: the fact⋈fact shuffle paid once at write
time — the join plan must have zero Exchange nodes and match the plain
join's result exactly."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.plans.explain import (
    physical_plan,
)
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.sources.bucketed import (
    write_bucketed,
)

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_pair(spark, tables, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    write_bucketed(
        tables["lineitem"].select("l_orderkey", "l_quantity", "l_extendedprice"),
        "lineitem_b",
        ["l_orderkey"],
        N_BUCKETS,
        sort_cols=["l_orderkey"],
        path=str(base / "lineitem_b"),
    )
    write_bucketed(
        tables["orders"].select("o_orderkey", "o_custkey", "o_totalprice"),
        "orders_b",
        ["o_orderkey"],
        N_BUCKETS,
        sort_cols=["o_orderkey"],
        path=str(base / "orders_b"),
    )
    yield spark.table("lineitem_b"), spark.table("orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    li, od = bucketed_pair
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(od, li.l_orderkey == od.o_orderkey).groupBy("o_custkey").agg(
            F.sum("l_extendedprice").alias("rev")
        )
        plan = physical_plan(joined)
        join_section = plan.split("HashAggregate")[-1]  # below the agg: the join subtree
        assert "SortMergeJoin" in plan
        # the join itself must not shuffle either side (the aggregate
        # above it may); bucket scans show their selected bucket count
        assert len(re.findall(r"^\(\d+\) Exchange", join_section, re.M)) == 0
        assert "SelectedBucketsCount: 8 out of 8" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_matches_plain_join(spark, tables, bucketed_pair):
    li, od = bucketed_pair
    bucketed = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("rev"))
    )
    plain = (
        tables["lineitem"]
        .join(tables["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("rev"))
    )
    a = {(r.o_custkey, r.rev) for r in bucketed.collect()}
    b = {(r.o_custkey, r.rev) for r in plain.collect()}
    assert a == b and len(a) > 0


# r14: part of the fast driver-gate subset (default `pytest` selection
# per pytest.ini; `-m ''` runs the full suite)
import pytest as _pytest

pytestmark = _pytest.mark.driver_gate
