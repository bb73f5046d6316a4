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

__all__ = ["partial_agg", "merge_rollup", "incremental_agg", "can_answer", "answer_from_rollup", "join_view_delta", "incremental_join_agg", "cdc_apply", "stream_rollup_maintenance", "stream_snapshot_maintenance", "read_snapshot", "list_snapshots", "vacuum_snapshots"]

#: supported mergeable measures → (state builder, merger)
_MERGE = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
    # bitwise-OR is an idempotent commutative monoid like min/max —
    # folds Bloom-filter words (sketches.bloom_build) through the same
    # algebra, so a dim-key pruning filter can be incrementally /
    # streaming maintained as new keys land
    "bit_or": (F.bit_or, F.bit_or),
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


def _read_marker(fs, path_cls, table_dir: str) -> int | None:
    """Batch id recorded inside a table version (the ``_folded_batch``
    marker that swaps atomically with the data), or None if absent."""
    marker = path_cls(table_dir + "/_folded_batch")
    if not fs.exists(marker):
        return None
    stream_in = fs.open(marker)
    try:
        return int(bytes(stream_in.readAllBytes()).decode())
    finally:
        stream_in.close()


def _prune_asides(fs, path_cls, table_path: str, retain: int) -> None:
    """Keep the ``retain`` newest complete ``__old_<id>`` aside
    versions (by their in-table batch-id marker), drop the rest —
    with retain=0 this is the original drop-all-stale-asides
    behavior."""
    asides = fs.globStatus(path_cls(table_path + "__old_*"))
    aged: list[tuple[int, object]] = []
    for od in list(asides) if asides is not None else []:
        b = _read_marker(fs, path_cls, od.getPath().toString())
        if b is None:  # a markerless aside can't be a snapshot — drop
            fs.delete(od.getPath(), True)
        else:
            aged.append((b, od.getPath()))
    aged.sort(key=lambda t: t[0], reverse=True)
    for _b, p in aged[retain:]:
        fs.delete(p, True)


def _fold_with_crash_safe_swap(
    batch_df: DataFrame, batch_id: int, table_path: str, merge_fn,
    retain_snapshots: int = 0,
) -> None:
    """The shared foreachBatch fold skeleton: recovery of interrupted
    swaps, idempotent batch-id marker, merge via ``merge_fn(current_or
    _None, batch_df)``, and the aside-rename crash-safe table swap (the
    atomicity discipline documented on
    :func:`stream_rollup_maintenance`, shared with
    :func:`stream_snapshot_maintenance`).

    ``retain_snapshots=N`` keeps the N newest ``__old_<id>`` aside
    dirs instead of dropping them — each is a complete previous table
    version whose in-dir batch-id marker (written in the same rename
    unit as its data) identifies it, giving :func:`read_snapshot`
    time-travel for free from plumbing the swap already does."""
    s = batch_df.sparkSession
    jvm = s.sparkContext._jvm
    path_cls = jvm.org.apache.hadoop.fs.Path
    fs = path_cls(table_path).getFileSystem(s.sparkContext._jsc.hadoopConfiguration())
    root = path_cls(table_path)
    # RECOVERY: no live table but a complete stage (marker inside)
    # = crash between aside-rename and stage-rename. Finish the
    # rename; the marker check below then skips the replayed fold.
    if not fs.exists(root):
        staged = fs.globStatus(path_cls(table_path + "__stage_*"))
        for st in list(staged) if staged is not None else []:
            sp = st.getPath()
            if fs.exists(path_cls(sp.toString() + "/_folded_batch")):
                fs.rename(sp, root)
                break
    # a crash after the stage-rename but before the aside-prune leaves
    # an extra aside next to a healthy table — prune to the retention
    # budget (drop them all when no snapshots are retained).
    if fs.exists(root):
        _prune_asides(fs, path_cls, table_path, retain_snapshots)
    marker = path_cls(table_path + "/_folded_batch")
    current = None
    if fs.exists(root):
        if fs.exists(marker):
            last = _read_marker(fs, path_cls, table_path)
            if batch_id <= last:
                return  # replayed batch: fold already landed
        current = s.read.parquet(table_path)
    merged = merge_fn(current, batch_df)
    tmp = table_path + f"__stage_{batch_id}"
    merged.write.mode("overwrite").parquet(tmp)
    out = fs.create(path_cls(tmp + "/_folded_batch"), True)
    try:
        out.write(str(batch_id).encode())
    finally:
        out.close()
    # crash-safe swap: aside-rename (detectable+recoverable, never
    # a delete of the only copy), stage-rename in, drop the aside.
    aside = path_cls(table_path + f"__old_{batch_id}")
    if fs.exists(root):
        fs.delete(aside, True)  # stale aside from a replayed attempt
        fs.rename(root, aside)
    fs.rename(path_cls(tmp), root)
    # the aside is the complete PREVIOUS version (its own marker names
    # it); keep the newest retain_snapshots of them, drop the rest
    _prune_asides(fs, path_cls, table_path, retain_snapshots)


def list_snapshots(spark, table_path: str) -> list[tuple[int, str]]:
    """Readable versions of a maintained table: ``(batch_id, dir)``
    pairs, newest first — the live table plus any ``__old_<id>``
    asides retained by ``retain_snapshots``. Version identity comes
    from each dir's in-table batch-id marker, which swaps in the same
    rename unit as its data, so a listed version is always complete."""
    jvm = spark.sparkContext._jvm
    path_cls = jvm.org.apache.hadoop.fs.Path
    fs = path_cls(table_path).getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()
    )
    out: list[tuple[int, str]] = []
    if fs.exists(path_cls(table_path)):
        b = _read_marker(fs, path_cls, table_path)
        if b is not None:
            out.append((b, table_path))
    asides = fs.globStatus(path_cls(table_path + "__old_*"))
    for od in list(asides) if asides is not None else []:
        d = od.getPath().toString()
        b = _read_marker(fs, path_cls, d)
        if b is not None:
            out.append((b, d))
    out.sort(key=lambda t: t[0], reverse=True)
    return out


def read_snapshot(spark, table_path: str, batch_id: int | None = None) -> DataFrame:
    """Time-travel read of a maintained rollup/snapshot table:
    ``batch_id=None`` reads the live version; a specific id reads the
    table AS OF that fold, from the retained aside whose marker equals
    it. Raises ``ValueError`` (listing what IS available) when the
    requested version was never produced or has aged out of the
    ``retain_snapshots`` budget — CDC consumers get read-at-version
    from the swap plumbing, no table format needed.

    CONCURRENCY CONTRACT: the returned DataFrame is lazy over the
    aside directory, and rename-based retention has no read locks —
    a maintenance fold (or :func:`vacuum_snapshots`) that prunes the
    version while the read executes fails it mid-query. Either
    complete (or persist/write-out) snapshot reads before the next
    fold can prune, or run the stream with ``retain_snapshots`` one
    larger than the deepest version readers actually request, which
    guarantees a requested version survives one full fold interval."""
    versions = list_snapshots(spark, table_path)
    if not versions:
        raise ValueError(f"no readable versions at {table_path!r}")
    if batch_id is None:
        return spark.read.parquet(versions[0][1])
    for b, d in versions:
        if b == batch_id:
            return spark.read.parquet(d)
    raise ValueError(
        f"batch_id {batch_id} not retained at {table_path!r}; "
        f"available: {[b for b, _ in versions]}"
    )


def vacuum_snapshots(spark, table_path: str, retain: int = 0) -> list[int]:
    """Manually prune a maintained table's retained ``__old_<id>``
    versions to the ``retain`` newest (0 = drop all) — the janitor for
    tables whose maintenance stream ran with a larger
    ``retain_snapshots`` than storage wants to keep. The live table is
    never touched. Returns the batch ids still readable afterwards
    (live first)."""
    jvm = spark.sparkContext._jvm
    path_cls = jvm.org.apache.hadoop.fs.Path
    fs = path_cls(table_path).getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()
    )
    _prune_asides(fs, path_cls, table_path, retain)
    return [b for b, _ in list_snapshots(spark, table_path)]


def stream_rollup_maintenance(
    spark,
    source_dir: str,
    rollup_path: str,
    checkpoint_dir: str,
    keys: list[str],
    measures: dict[str, tuple[str, str]],
    schema: str,
    retain_snapshots: int = 0,
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

    def merge(current: DataFrame | None, batch_df: DataFrame) -> DataFrame:
        delta = partial_agg(batch_df, keys, measures)
        if current is None:
            return delta
        return merge_rollup(current, delta, keys, measures)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        _fold_with_crash_safe_swap(
            batch_df, batch_id, rollup_path, merge, retain_snapshots
        )

    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def join_view_delta(
    a_base: DataFrame,
    a_delta: DataFrame,
    b_base: DataFrame,
    b_delta: DataFrame,
    join_on,
    keys: list[str],
    measures: dict[str, tuple[str, str]],
    broadcast_deltas: bool = True,
) -> DataFrame:
    """Insert-delta of a JOIN view — the other half of incremental view
    maintenance (aggregates fold via :func:`merge_rollup`; join views
    fold via the bilinearity of ⋈ over union):

        Δ(A⋈B) = ΔA⋈B₀  ∪  A₀⋈ΔB  ∪  ΔA⋈ΔB

    so a view over ``agg(A⋈B)`` refreshes by partial-agging these three
    delta joins and folding the result — the history-sized A₀⋈B₀ join
    is NEVER recomputed. Cost: two big-side scans each joined against a
    delta (broadcast by default: deltas are small by definition — turn
    ``broadcast_deltas`` off when a backfill delta outgrows the driver's
    broadcast budget and let AQE pick) plus a delta×delta join.
    This is textbook IVM (Blakeley et al. 1986, counting algorithm
    restricted to inserts); deletions ride as retraction rows with
    negated measures for the sum/count monoids — min/max are
    insert-only here, as in every rollup (a retraction cannot un-take
    a max).

    ``join_on`` is any join condition usable by ``DataFrame.join``.
    Returns the partial-agged DELTA rollup (fold it with
    :func:`merge_rollup`, or use :func:`incremental_join_agg`).
    """
    da = F.broadcast(a_delta) if broadcast_deltas else a_delta
    db = F.broadcast(b_delta) if broadcast_deltas else b_delta
    parts = [
        da.join(b_base, join_on),
        a_base.join(db, join_on),
        da.join(db, join_on),
    ]
    cols = parts[0].columns
    delta_rows = parts[0].unionByName(parts[1].select(cols)).unionByName(
        parts[2].select(cols)
    )
    return partial_agg(delta_rows, keys, measures)


def incremental_join_agg(
    view_rollup: DataFrame,
    a_base: DataFrame,
    a_delta: DataFrame,
    b_base: DataFrame,
    b_delta: DataFrame,
    join_on,
    keys: list[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """One-call refresh of an ``agg(A⋈B)`` view: fold
    :func:`join_view_delta` into the existing rollup. Equivalent to
    re-aggregating (A₀∪ΔA)⋈(B₀∪ΔB) from scratch (oracle-proven), at
    delta-join + |groups| cost instead of a history re-join."""
    return merge_rollup(
        view_rollup,
        join_view_delta(a_base, a_delta, b_base, b_delta, join_on, keys, measures),
        keys,
        measures,
    )


def cdc_apply(
    changes: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    op_col: str = "op",
    delete_value: str = "delete",
    keep_tombstones: bool = False,
) -> DataFrame:
    """Apply a change-data-capture log to produce the current snapshot:
    latest-wins per key by ``seq_cols`` (highest wins), then delete
    tombstones drop the key — the MERGE INTO a parquet-only pipeline
    can't express in place. One shuffle on the key; the per-key window
    is bounded by that key's change count (compact logs periodically —
    this is the replay, not the store). Ties across ALL seq_cols are
    broken arbitrarily — pass a total order (e.g. ts + event id).
    ``keep_tombstones=True`` keeps the winning delete rows in the
    output (op column intact) — the STORED form a continuously-
    maintained snapshot needs so later out-of-order upserts older than
    a delete cannot resurrect the key; filter them at read time."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(*[F.desc(c) for c in seq_cols])
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if keep_tombstones:
        return latest
    return latest.filter(F.col(op_col) != delete_value)


def stream_snapshot_maintenance(
    spark,
    source_dir: str,
    snapshot_path: str,
    checkpoint_dir: str,
    key_cols: list[str],
    seq_cols: list[str],
    schema: str,
    op_col: str = "op",
    delete_value: str = "delete",
    retain_snapshots: int = 0,
):
    """Continuously-maintained SNAPSHOT table (the keyed sibling of
    :func:`stream_rollup_maintenance`): each micro-batch of change rows
    folds into the current snapshot via latest-wins-per-key
    (:func:`cdc_apply` over current ∪ batch) — a streaming MERGE INTO
    for engines without table formats. Per-batch cost is
    |batch| + |live keys|, never a log re-scan.

    Tombstones are RETAINED in the stored snapshot (op column intact):
    a delete's seq keeps dominating, so late out-of-order upserts older
    than the delete cannot resurrect the key across batches — read the
    table through ``op != delete_value``. Same crash-safe aside-rename
    swap and idempotent batch-id marker as the rollup maintenance
    (shared :func:`_fold_with_crash_safe_swap`). Returns the started
    StreamingQuery."""

    def merge(current: DataFrame | None, batch_df: DataFrame) -> DataFrame:
        log = batch_df if current is None else current.unionByName(
            batch_df.select(current.columns)
        )
        return cdc_apply(
            log, key_cols, seq_cols, op_col=op_col,
            delete_value=delete_value, keep_tombstones=True,
        )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        _fold_with_crash_safe_swap(
            batch_df, batch_id, snapshot_path, merge, retain_snapshots
        )

    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def can_answer(
    rollup_keys: list[str],
    measures: dict[str, tuple[str, str]],
    query_keys: list[str],
    query_measures: list[str],
) -> bool:
    """True iff a rollup with ``rollup_keys``/``measures`` can answer a
    GROUP BY ``query_keys`` over ``query_measures`` exactly: the query
    keys must be a subset of the rollup keys (coarser or equal
    grouping) and every requested measure must exist in the maintained
    state with a mergeable kind. Distinct counts are the classic
    non-example — they are NOT re-mergeable from per-key counts (use
    the HLL register rollup for those)."""
    return set(query_keys) <= set(rollup_keys) and all(
        m in measures and measures[m][0] in _MERGE for m in query_measures
    )


def answer_from_rollup(
    rollup: DataFrame,
    rollup_keys: list[str],
    measures: dict[str, tuple[str, str]],
    query_keys: list[str],
    query_measures: list[str] | None = None,
) -> DataFrame:
    """Materialized-view query routing: answer a coarser GROUP BY from
    the maintained rollup state instead of the base table.

    The aggregation-rewrite half of what warehouse optimizers do with
    materialized views (Goldstein/Larson-style view matching,
    restricted to the rollup lattice): a query grouping by a SUBSET of
    the rollup's keys re-aggregates the state frame with each
    measure's MERGE function — sum/count states by sum, min/max/bit_or
    by themselves — touching |rollup| rows instead of the base table.
    Combined with the incremental/streaming maintenance in this module
    the pattern is: pay the base-table scan once per delta, answer
    every coarser ad-hoc rollup from state.

    Raises ``ValueError`` when the rollup cannot answer (finer/foreign
    keys or unknown measure) — silent wrong answers are the failure
    mode view routing must never have.  Exactness caveat, stated
    honestly: integer measures re-merge bit-exactly; float sums
    re-associate (state order vs row order), differing by float
    rounding only — same caveat any two-level aggregation carries.
    """
    query_measures = query_measures or list(measures)
    if not can_answer(rollup_keys, measures, query_keys, query_measures):
        raise ValueError(
            f"rollup over {rollup_keys} cannot answer GROUP BY {query_keys} "
            f"for measures {query_measures}"
        )
    aggs = []
    for out in query_measures:
        kind, _src = measures[out]
        _, merge = _MERGE[kind]
        aggs.append(merge(F.col(out)).alias(out))
    return rollup.groupBy(*query_keys).agg(*aggs)
