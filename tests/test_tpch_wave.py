"""Known-answer tests for the TPC-H-shaped round-6 wave
(Q2/Q3/Q8/Q9/Q10/Q11/Q12/Q15/Q16/Q17/Q19/Q21 shapes) on a tiny
hand-built star schema. The same operators are value-checked against
DuckDB over the sf0.01 tables by tests/test_contract_extras.py; these
pin the edge-case semantics (unique-max laggard, min-cost ties, max
ties kept) a big-table diff can miss."""
from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
    relational as R,
)


def _d(s):
    return dt.datetime.strptime(s, "%Y-%m-%d")


@pytest.fixture(scope="module")
def star(spark):
    region = spark.createDataFrame(
        [(0, "ASIA"), (1, "EUROPE")], "r_regionkey int, r_name string"
    )
    nation = spark.createDataFrame(
        [(0, "NATION_0", 0), (1, "NATION_1", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    supplier = spark.createDataFrame(
        [(1, "S1", 0, 100.0), (2, "S2", 0, 200.0), (3, "S3", 1, 300.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    customer = spark.createDataFrame(
        [(1, "C1", 0, 50.0, "BUILDING"), (2, "C2", 1, 60.0, "MACHINERY")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    part = spark.createDataFrame(
        [
            (1, "red widget", "Brand#12", "ECONOMY", 5, 10.0),
            (2, "blue bolt", "Brand#23", "LARGE", 40, 20.0),
        ],
        "p_partkey long, p_name string, p_brand string, p_type string, p_size int, p_retailprice double",
    )
    orders = spark.createDataFrame(
        [
            (10, 1, "O", 100.0, _d("1999-01-10"), "1-URGENT"),
            (11, 2, "F", 200.0, _d("1999-02-10"), "5-LOW"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
        "o_orderdate timestamp, o_orderpriority string",
    )
    lineitem = spark.createDataFrame(
        [
            # order 10: suppliers 1 and 2; supplier 2 ships strictly last
            (10, 1, 1, 1, 10.0, 100.0, 0.0, 0.0, "N", "O", _d("1999-01-20")),
            (10, 1, 2, 2, 5.0, 60.0, 0.0, 0.0, "R", "O", _d("1999-03-20")),
            # order 11: single supplier → never a laggard
            (11, 2, 3, 1, 20.0, 400.0, 0.5, 0.0, "N", "F", _d("1999-02-15")),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate timestamp",
    )
    return {
        "region": region, "nation": nation, "supplier": supplier,
        "customer": customer, "part": part, "orders": orders, "lineitem": lineitem,
    }


def test_order_laggards_unique_max_only(spark, star):
    got = {r.s_name: r.numwait for r in R.order_laggards(star).collect()}
    # supplier 2 uniquely shipped last in the only multi-supplier order
    assert got == {"S2": 1}


def test_order_laggards_tied_max_excluded(spark, star):
    t = dict(star)
    # make both suppliers of order 10 ship on the same (max) date → no
    # UNIQUE laggard, nobody blamed
    t["lineitem"] = spark.createDataFrame(
        [
            (10, 1, 1, 1, 10.0, 100.0, 0.0, 0.0, "N", "O", _d("1999-03-20")),
            (10, 1, 2, 2, 5.0, 60.0, 0.0, 0.0, "N", "O", _d("1999-03-20")),
        ],
        star["lineitem"].schema,
    )
    assert R.order_laggards(t).count() == 0


def test_min_cost_supplier_window_min_and_region(spark, star):
    t = dict(star)
    # part 1 sold by suppliers 1 (unit 10.0) and 2 (unit 12.0), both in
    # ASIA; supplier 3 (EUROPE) is out of scope even at lower cost
    t["lineitem"] = spark.createDataFrame(
        [
            (10, 1, 1, 1, 10.0, 100.0, 0.0, 0.0, "N", "O", _d("1999-01-20")),
            (10, 1, 2, 2, 5.0, 60.0, 0.0, 0.0, "N", "O", _d("1999-01-21")),
            (11, 1, 3, 1, 10.0, 10.0, 0.0, 0.0, "N", "F", _d("1999-02-15")),
        ],
        star["lineitem"].schema,
    )
    rows = R.min_cost_supplier(t, region="ASIA", max_size=50).collect()
    assert [(r.s_name, r.p_partkey) for r in rows] == [("S1", 1)]
    assert rows[0].supply_cost == 10.0


def test_top_supplier_keeps_all_max_ties(spark, star):
    t = dict(star)
    # two suppliers tie at revenue 100.0 in the quarter
    t["lineitem"] = spark.createDataFrame(
        [
            (10, 1, 1, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", _d("1999-01-20")),
            (10, 1, 2, 2, 1.0, 100.0, 0.0, 0.0, "N", "O", _d("1999-01-21")),
            (11, 2, 3, 1, 1.0, 40.0, 0.0, 0.0, "N", "F", _d("1999-02-15")),
        ],
        star["lineitem"].schema,
    )
    rows = R.top_supplier(t, start="1999-01-01").collect()
    assert [(r.s_suppkey, r.total_revenue) for r in rows] == [(1, 100.0), (2, 100.0)]


def test_small_qty_revenue_hand_computed(spark, star):
    t = dict(star)
    # Brand#23 is part 2 only; avg qty over its lines = (10+30)/2 = 20;
    # only the 5-qty line is < 0.5*20 → sum(extendedprice)/7 = 70/7 = 10
    t["lineitem"] = spark.createDataFrame(
        [
            (10, 2, 1, 1, 10.0, 100.0, 0.0, 0.0, "N", "O", _d("1999-01-20")),
            (10, 2, 2, 2, 30.0, 300.0, 0.0, 0.0, "N", "O", _d("1999-01-21")),
            (11, 2, 3, 3, 5.0, 70.0, 0.0, 0.0, "N", "F", _d("1999-02-15")),
            (11, 1, 3, 4, 1.0, 999.0, 0.0, 0.0, "N", "F", _d("1999-02-15")),  # other brand
        ],
        star["lineitem"].schema,
    )
    got = R.small_qty_revenue(t, brand="Brand#23", frac=0.5).collect()[0]
    assert got.avg_yearly == 10.0


def test_late_ship_priority_hand_computed(spark, star):
    # order 10 (1-URGENT, 1999-01-10): ships +10d (ontime) and +69d (late)
    # order 11 (5-LOW, 1999-02-10): ships +5d (ontime)
    got = {r.o_orderpriority: r for r in R.late_ship_priority(star, late_days=60).collect()}
    assert got["1-URGENT"].n_lines == 2 and got["1-URGENT"].n_late == 1
    assert got["1-URGENT"].n_late_urgent == 1
    assert abs(got["1-URGENT"].late_share - 0.5) < 1e-12
    assert got["5-LOW"].n_late == 0 and got["5-LOW"].n_late_urgent == 0


def test_market_share_conditional_sum(spark, star):
    # EUROPE market = customer 2's order 11 only; its single ECONOMY-part
    # line must come from part 1 → rebuild lines so order 11 buys part 1
    t = dict(star)
    t["lineitem"] = spark.createDataFrame(
        [
            (11, 1, 1, 1, 1.0, 100.0, 0.0, 0.0, "N", "F", _d("1999-02-15")),  # NATION_0 supp
            (11, 1, 3, 2, 1.0, 300.0, 0.0, 0.0, "N", "F", _d("1999-02-15")),  # NATION_1 supp
        ],
        star["lineitem"].schema,
    )
    got = R.market_share(
        t, supp_nation="NATION_1", mkt_region="EUROPE", p_type="ECONOMY"
    ).collect()
    assert len(got) == 1 and got[0].o_year == 1999
    assert abs(got[0].mkt_share - 0.75) < 1e-12


def test_important_parts_threshold_rounds_both_sides(spark):
    # a part whose value is EXACTLY the fraction*total cut (at cents
    # scale) must be excluded deterministically — the comparison
    # rounds both sides so float summation order can't flip it
    nation = spark.createDataFrame(
        [(1, "NATION_1", 1)], "n_nationkey int, n_name string, n_regionkey int"
    )
    supplier = spark.createDataFrame(
        [(1, "S1", 1, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    # values: part 1 → 10.0, part 2 → 990.0; total 1000.0.
    # fraction=0.01 → cut = 10.00: part 1 sits exactly on it.
    lineitem = spark.createDataFrame(
        [(1, 1, 1, 1.0, 10.0, 0.0), (2, 2, 1, 1.0, 990.0, 0.0)],
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double, "
        "l_extendedprice double, l_discount double",
    )
    t = {"lineitem": lineitem, "supplier": supplier, "nation": nation}
    got = {r.l_partkey for r in R.important_parts(t, fraction=0.01).collect()}
    assert got == {2}


# r14: part of the fast driver-gate subset (default `pytest` selection
# per pytest.ini; `-m ''` runs the full suite)
import pytest as _pytest

pytestmark = _pytest.mark.driver_gate
