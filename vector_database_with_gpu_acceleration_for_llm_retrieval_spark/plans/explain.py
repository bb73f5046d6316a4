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


def plan_summary(df: DataFrame) -> dict:
    """Structured summary of the physical plan — the numbers a scale
    review asks for, as data instead of explain-text grepping:

    ``n_scans``, ``n_exchanges`` (plus keyed/roundrobin/range split),
    ``n_python_stages`` (MapInPandas/ArrowEvalPython/etc.),
    ``joins`` (node-name counts), ``has_cartesian``,
    ``wholestage_codegen`` (span count), ``pushed_filters`` (raw
    strings per scan).

    Use it in pipeline CI the way tests/test_plans.py uses
    ``assert_plan_contains``: e.g. assert a dim join broadcasts and the
    fact never shuffles before shipping a new query at 100 TB.
    """
    import re

    plan = physical_plan(df)
    tree = plan.split("\n\n")[0]
    joins = {}
    for j in re.findall(r"(\w*Join\w*)", tree):
        joins[j] = joins.get(j, 0) + 1
    return {
        "n_scans": len(re.findall(r"^\(\d+\) Scan ", plan, re.M)),
        "n_exchanges": tree.count("Exchange"),
        "n_keyed_exchanges": plan.count("hashpartitioning") // 2
        + plan.count("rangepartitioning") // 2,
        "n_python_stages": sum(
            tree.count(n) for n in ("MapInPandas", "ArrowEvalPython", "BatchEvalPython", "FlatMapGroupsInPandas")
        ),
        "joins": joins,
        "has_cartesian": "CartesianProduct" in tree or "BroadcastNestedLoopJoin" in tree,
        "wholestage_codegen": len(set(re.findall(r"codegen id : (\d+)", plan))),
        "pushed_filters": re.findall(r"PushedFilters: \[([^\]]*)\]", plan),
    }
