"""Temporal joins Spark lacks as built-ins: as-of and range joins.

The brief's custom-operator rule (a): express them as compositions of
existing DataFrame ops where the semantics allow — both of these do,
so there is no Python in the hot path and Catalyst optimizes the whole
plan.

* **as-of join** — for every left row, the single most recent right row
  at-or-before its timestamp (per key). Implemented with the classic
  union-and-carry-forward shape: tag both sides, union on (key, ts),
  sort within key, carry the last seen right values forward with
  ``last(..., ignorenulls=True)`` over an unbounded-preceding window,
  keep the left rows. ONE shuffle on the key — the same cost as a
  plain equi-join, versus the naive per-left-row subquery which is a
  range cross join. At 100 TB: pre-partition both inputs by the key so
  the union inherits co-partitioning and the window is shuffle-free.

* **range join** — rows matched to intervals (band dimension). With a
  small band table this is a broadcast non-equi join: each row streams
  against the broadcast intervals, no shuffle of the fact side. For
  non-broadcastable interval sets, map both sides to interval-aligned
  buckets and equi-join on bucket first (the standard pre-filter), then
  verify the range — never an unbucketed theta join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join_bands"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each row of ``left``: the latest ``right`` row with
    ``right.on <= left.on`` within the same ``by`` key (ties at equal
    timestamps resolve to the right row — "at or before").

    Returns ``left`` plus ``<value_col><suffix>`` columns (null when no
    right row precedes).
    """
    lcols = left.columns
    l_tagged = left.select(
        F.col(by), F.col(on), F.lit(1).alias("__is_left"),
        F.struct(*lcols).alias("__l"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        F.col(by), F.col(on), F.lit(0).alias("__is_left"),
        F.lit(None).cast(l_tagged.schema["__l"].dataType).alias("__l"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)
    # at equal ts the right row must sort BEFORE the left row so the
    # carry-forward includes it ("at or before" semantics); right rows
    # tying on (by, on) get a deterministic final order by their value
    # columns, so the carried row is stable across runs/engines (the
    # greatest value tuple wins) instead of partition-order-dependent
    w = (
        Window.partitionBy(by)
        .orderBy(
            F.col(on).asc(),
            F.col("__is_left").asc(),
            *[F.asc_nulls_first(f"__r_{c}") for c in value_cols],
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "__is_left",
        "__l",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__rv_{c}")
            for c in value_cols
        ],
    ).filter(F.col("__is_left") == 1)
    return carried.select(
        *[F.col("__l")[c].alias(c) for c in lcols],
        *[F.col(f"__rv_{c}").alias(f"{c}{suffix}") for c in value_cols],
    )


def range_join_bands(
    facts: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Join each fact row to the band whose ``[lo, hi)`` interval
    contains ``value_col``. ``bands`` must be small → broadcast
    non-equi join (fact side streams, no shuffle)."""
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return facts.join(F.broadcast(bands), cond, "left")
