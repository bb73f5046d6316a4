"""Incremental aggregate maintenance: fold a delta batch into a
materialized rollup WITHOUT re-scanning history — the materialized-view
refresh primitive every warehouse needs at 100 TB (re-aggregating a
petabyte of history because one hour of data landed is the classic
anti-pattern this kills).

The algebra: an aggregate is incrementally maintainable iff its state
is a commutative monoid — sum/count/min/max fold directly;
avg = sum/count folds via its two components (store the components,
derive avg at read time). The refresh is then

    new_rollup = reagg( old_rollup ∪ partial_agg(delta) )

— one partial agg of the (small) delta plus one equi-key agg of
old_rollup-sized data. Cost scales with |delta| + |groups|, never with
history. Deletions/corrections ride the SAME path as negative deltas
(count −1, sum −x): parquet can't update in place, but a retraction
row folds exactly like an insert.

Equivalence to a full recompute is exact for sum/count/min/max over
the same input multiset (floating-point sums may differ in order —
both the pytest and the oracle pin results with rounding, the repo
standard). The contract entry proves the claim end-to-end: history agg
+ delta fold == the oracle's single-pass aggregate over the full
table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["partial_agg", "merge_rollup", "incremental_agg"]

#: supported mergeable measures → (state builder, merger)
_MERGE = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def partial_agg(
    rows: DataFrame, keys: list[str], measures: dict[str, tuple[str, str]]
) -> DataFrame:
    """Aggregate ``rows`` into mergeable per-key state.

    ``measures`` maps output column → (kind, source column), kind in
    {sum, count, min, max} (avg = request sum + count, divide at read
    time). The result is a valid rollup on its own AND a foldable
    delta for :func:`merge_rollup`."""
    aggs = []
    for out, (kind, src) in measures.items():
        build, _ = _MERGE[kind]
        aggs.append(build(F.col(src)).alias(out))
    return rows.groupBy(*keys).agg(*aggs)


def merge_rollup(
    rollup: DataFrame, delta: DataFrame, keys: list[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """Fold an already-partial-agged ``delta`` into ``rollup``: union
    the two state frames, re-aggregate per key with each measure's
    MERGE function (count states merge by SUM). New keys appear,
    untouched keys pass through; cost is |rollup|+|delta| keyed work,
    never a history re-scan."""
    aggs = []
    for out, (kind, _src) in measures.items():
        _, merge = _MERGE[kind]
        aggs.append(merge(F.col(out)).alias(out))
    return rollup.unionByName(delta.select(rollup.columns)).groupBy(*keys).agg(*aggs)


def incremental_agg(
    history_rollup: DataFrame,
    new_rows: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """One-call refresh: partial-agg the raw ``new_rows`` delta and
    fold it into ``history_rollup``. Equivalent to re-aggregating
    history ∪ delta from scratch (pytest + oracle-proven), at
    |delta| + |groups| cost."""
    return merge_rollup(
        history_rollup, partial_agg(new_rows, keys, measures), keys, measures
    )
