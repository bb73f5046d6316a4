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

__all__ = ["partial_agg", "merge_rollup", "incremental_agg", "stream_rollup_maintenance"]

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


def stream_rollup_maintenance(
    spark,
    source_dir: str,
    rollup_path: str,
    checkpoint_dir: str,
    keys: list[str],
    measures: dict[str, tuple[str, str]],
    schema: str,
):
    """Continuously-maintained materialized rollup: each micro-batch
    partial-aggs its rows and folds them into the rollup table via
    :func:`merge_rollup` inside ``foreachBatch`` — the streaming
    materialized view (per-batch work is |batch| + |groups|, history
    never re-scans; the same frozen-artifact serving split as the
    streaming index maintenance family).

    The rollup parquet is swapped crash-safely per batch: the merged
    table is staged to a ``__stage_<id>`` dir (with the folded batch
    id INSIDE it as an underscore-prefixed marker parquet readers
    ignore), the live dir is renamed ASIDE (never deleted first),
    the stage renamed in, and only then the aside copy dropped. Every
    crash window is recoverable: a crash between the aside-rename and
    the stage-rename leaves a fully-written stage whose marker proves
    it complete, and the next fold (the replayed batch) finishes the
    rename instead of treating the batch as first — history is never
    silently discarded, unlike a delete-then-rename swap where that
    window has NO rollup at all. The fold is IDEMPOTENT under
    micro-batch replay: data and marker swap in the same rename so
    they can never disagree, and a replayed batch whose fold already
    landed is skipped (the same per-batch-id discipline as the
    streaming near-dup sink). Returns the started StreamingQuery.
    """

    def _fs(s, p):
        jvm = s.sparkContext._jvm
        path_cls = jvm.org.apache.hadoop.fs.Path
        return path_cls, path_cls(p).getFileSystem(s.sparkContext._jsc.hadoopConfiguration())

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        path_cls, fs = _fs(s, rollup_path)
        root = path_cls(rollup_path)
        # RECOVERY: no live rollup but a complete stage (marker inside)
        # = crash between aside-rename and stage-rename. Finish the
        # rename; the marker check below then skips the replayed fold.
        if not fs.exists(root):
            staged = fs.globStatus(path_cls(rollup_path + "__stage_*"))
            for st in list(staged) if staged is not None else []:
                sp = st.getPath()
                if fs.exists(path_cls(sp.toString() + "/_folded_batch")):
                    fs.rename(sp, root)
                    break
        # a crash after the stage-rename but before the aside-delete
        # leaves a stale aside copy next to a healthy rollup — drop it.
        if fs.exists(root):
            asides = fs.globStatus(path_cls(rollup_path + "__old_*"))
            for od in list(asides) if asides is not None else []:
                fs.delete(od.getPath(), True)
        marker = path_cls(rollup_path + "/_folded_batch")
        current = None
        if fs.exists(root):
            if fs.exists(marker):
                stream_in = fs.open(marker)
                try:
                    last = int(bytes(stream_in.readAllBytes()).decode())
                finally:
                    stream_in.close()
                if batch_id <= last:
                    return  # replayed batch: fold already landed
            current = s.read.parquet(rollup_path)
        delta = partial_agg(batch_df, keys, measures)
        merged = delta if current is None else merge_rollup(current, delta, keys, measures)
        tmp = rollup_path + f"__stage_{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        out = fs.create(path_cls(tmp + "/_folded_batch"), True)
        try:
            out.write(str(batch_id).encode())
        finally:
            out.close()
        # crash-safe swap: aside-rename (detectable+recoverable, never
        # a delete of the only copy), stage-rename in, drop the aside.
        aside = path_cls(rollup_path + f"__old_{batch_id}")
        if fs.exists(root):
            fs.delete(aside, True)  # stale aside from a replayed attempt
            fs.rename(root, aside)
        fs.rename(path_cls(tmp), root)
        fs.delete(aside, True)

    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
