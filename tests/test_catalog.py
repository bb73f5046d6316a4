"""Catalog robustness: a clean session (no nanos conf, wrong timezone)
must still run the contract's events queries — the driver harness
builds its OWN session, not ours."""

from __future__ import annotations

import pytest


def test_catalog_repairs_foreign_session(spark):
    """Simulate the driver's session: fresh session state with the
    nanos conf unset and a non-UTC timezone — load_table must repair
    both and read events."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.sources.catalog import (
        load_table,
    )

    s2 = spark.newSession()
    s2.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    s2.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    # Works for either physical ts type the generator has used:
    # TIMESTAMP(NANOS) (raises without the nanos conf; load_table sets it)
    # or TIMESTAMP(MICROS) (reads directly; load_table synthesizes ts_ns).
    ev = load_table(s2, "events", "/root/testdata/sf0.001")
    assert ev.count() > 0
    assert "ts_ns" in ev.columns and "ts" in ev.columns
    assert dict(ev.dtypes)["ts"].startswith("timestamp")
    assert dict(ev.dtypes)["ts_ns"] == "bigint"
    assert s2.conf.get("spark.sql.session.timeZone") == "UTC"


def test_lazy_catalog_isolates_bad_table(spark, tmp_path):
    """One unreadable file must not take down unrelated tables."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.sources.catalog import (
        load_tables,
    )

    t = load_tables(spark, str(tmp_path))  # empty dir: every table missing
    with pytest.raises(Exception):
        t["region"].count()
    # a catalog over real data is unaffected by the failed one
    good = load_tables(spark, "/root/testdata/sf0.001")
    assert good["region"].count() > 0


# r14: part of the fast driver-gate subset (default `pytest` selection
# per pytest.ini; `-m ''` runs the full suite)
import pytest as _pytest

pytestmark = _pytest.mark.driver_gate
