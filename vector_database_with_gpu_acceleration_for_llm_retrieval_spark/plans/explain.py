"""Physical-plan introspection helpers.

The scale contract (SURVEY.md §4) is enforced in tests: the flagship
search must compile to ``TakeOrderedAndProject``; dimension joins must
broadcast; parquet scans must show pushed filters. These helpers make
those assertions one-liners.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def assert_plan_contains(df: DataFrame, *needles: str, absent: tuple[str, ...] = ()) -> str:
    """Assert physical-plan properties; returns the plan for debugging."""
    plan = physical_plan(df)
    for needle in needles:
        assert needle in plan, f"expected {needle!r} in plan:\n{plan}"
    for needle in absent:
        assert needle not in plan, f"expected NO {needle!r} in plan:\n{plan}"
    return plan
