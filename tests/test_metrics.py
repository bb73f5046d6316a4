"""O22 observability: in-plan observations and the Prometheus-style
registry must capture real metrics for a contract query."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark import contract, metrics

from conftest import SF_DIR


def test_observed_collects_in_plan_metrics(spark, tables):
    df = tables["orders"].select("o_orderkey", "o_totalprice")
    inst, obs = metrics.observed(df, "orders_probe", F.sum("o_totalprice").alias("sum_price"))
    n = inst.count()
    got = dict(obs.get)
    assert got["n_rows"] == n
    expect_sum = df.agg(F.sum("o_totalprice")).collect()[0][0]
    assert abs(got["sum_price"] - expect_sum) < 1e-6


def test_registry_tracks_contract_query(spark):
    reg = metrics.MetricsRegistry()
    df = contract.queries()["pricing_summary"](spark, SF_DIR)
    expect_rows = df.count()
    got = reg.run(df, "pricing_summary")
    got2 = reg.run(df, "pricing_summary")
    assert got["n_rows"] == expect_rows == got2["n_rows"]
    stats = reg.snapshot()["pricing_summary"]
    assert stats.n_runs == 2
    assert stats.last_seconds > 0
    assert stats.total_seconds >= stats.last_seconds
    text = reg.render_prometheus()
    assert 'vdb_queries_total{query="pricing_summary"} 2' in text
    assert f'vdb_query_last_rows{{query="pricing_summary"}} {expect_rows}' in text


# r14: part of the fast driver-gate subset (default `pytest` selection
# per pytest.ini; `-m ''` runs the full suite)
import pytest as _pytest

pytestmark = _pytest.mark.driver_gate
