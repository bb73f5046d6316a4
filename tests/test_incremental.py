"""Incremental aggregate maintenance: delta folding == full recompute,
retraction rows, new-key appearance. The sf0.01 oracle value-check of
the contract entry runs in tests/test_contract_extras.py."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
    incremental as INC,
)

MEASURES = {
    "n": ("count", "v"),
    "total": ("sum", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
}


def _rows(spark, data):
    return spark.createDataFrame(data, "k string, v double")


def test_incremental_equals_full_recompute(spark):
    hist = _rows(spark, [("a", 1.0), ("a", 2.0), ("b", 5.0)])
    delta = _rows(spark, [("a", 4.0), ("c", 7.0)])  # existing + new key
    rollup = INC.partial_agg(hist, ["k"], MEASURES)
    got = {r.k: r for r in INC.incremental_agg(rollup, delta, ["k"], MEASURES).collect()}
    full = {r.k: r for r in INC.partial_agg(hist.unionByName(delta), ["k"], MEASURES).collect()}
    assert set(got) == set(full) == {"a", "b", "c"}
    for k in full:
        assert got[k].n == full[k].n
        assert got[k].total == pytest.approx(full[k].total)
        assert got[k].lo == full[k].lo and got[k].hi == full[k].hi
    assert got["a"].n == 3 and got["a"].total == pytest.approx(7.0)
    assert got["b"].n == 1  # untouched key passes through


def test_merge_rollup_folds_retractions(spark):
    # a correction batch rides the same path as negative state
    hist = _rows(spark, [("a", 10.0), ("a", 2.0)])
    rollup = INC.partial_agg(hist, ["k"], {"n": ("count", "v"), "total": ("sum", "v")})
    retract = spark.createDataFrame(
        [("a", -1, -10.0)], "k string, n long, total double"
    )
    got = INC.merge_rollup(
        rollup, retract, ["k"], {"n": ("count", "v"), "total": ("sum", "v")}
    ).collect()[0]
    assert got.n == 1 and got.total == pytest.approx(2.0)


def test_repeated_folds_associative(spark):
    # fold two deltas one at a time == fold their union once
    hist = _rows(spark, [("a", 1.0)])
    d1 = _rows(spark, [("a", 2.0), ("b", 3.0)])
    d2 = _rows(spark, [("b", 4.0)])
    r = INC.partial_agg(hist, ["k"], MEASURES)
    one_by_one = INC.incremental_agg(
        INC.incremental_agg(r, d1, ["k"], MEASURES), d2, ["k"], MEASURES
    )
    at_once = INC.incremental_agg(r, d1.unionByName(d2), ["k"], MEASURES)
    a = {(r.k, r.n, r.total, r.lo, r.hi) for r in one_by_one.collect()}
    b = {(r.k, r.n, r.total, r.lo, r.hi) for r in at_once.collect()}
    assert a == b


def test_stream_rollup_maintenance(spark, tmp_path):
    # micro-batched folds == one batch aggregate over everything
    src, roll, ckpt = str(tmp_path / "src"), str(tmp_path / "roll"), str(tmp_path / "ck")
    m = {"n": ("count", "v"), "total": ("sum", "v"),
         "lo": ("min", "v"), "hi": ("max", "v")}
    b1 = _rows(spark, [("a", 1.0), ("b", 5.0)])
    b2 = _rows(spark, [("a", 4.0), ("c", 7.0)])
    b1.write.mode("append").parquet(src)
    q = INC.stream_rollup_maintenance(
        spark, src, roll, ckpt, ["k"], m, "k string, v double"
    )
    q.processAllAvailable()
    b2.write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    got = {r.k: r for r in spark.read.parquet(roll).collect()}
    full = {r.k: r for r in INC.partial_agg(
        b1.unionByName(b2), ["k"], m
    ).collect()}
    assert set(got) == set(full)
    for k in full:
        assert (got[k].n, got[k].total, got[k].lo, got[k].hi) == (
            full[k].n, full[k].total, full[k].lo, full[k].hi
        )


def test_stream_rollup_replay_is_idempotent(spark, tmp_path):
    # re-invoking the fold with an already-landed batch id is a no-op
    src, roll, ckpt = str(tmp_path / "s2"), str(tmp_path / "r2"), str(tmp_path / "c2")
    m = {"n": ("count", "v"), "total": ("sum", "v")}
    _rows(spark, [("a", 1.0)]).write.mode("append").parquet(src)
    q = INC.stream_rollup_maintenance(
        spark, src, roll, ckpt, ["k"], m, "k string, v double"
    )
    q.processAllAvailable()
    q.stop()
    before = {(r.k, r.n, r.total) for r in spark.read.parquet(roll).collect()}
    # simulate replay: restart the stream on the SAME checkpoint with
    # no new source data — any re-fold would double-count
    q2 = INC.stream_rollup_maintenance(
        spark, src, roll, ckpt, ["k"], m, "k string, v double"
    )
    q2.processAllAvailable()
    q2.stop()
    after = {(r.k, r.n, r.total) for r in spark.read.parquet(roll).collect()}
    assert after == before


def test_stream_rollup_crash_between_renames_recovers(spark, tmp_path):
    # r8 ADVICE fix: the old delete-then-rename swap had a window with
    # NO rollup table; a crash there made the replayed batch treat
    # itself as first and silently discard all history. Simulate the
    # worst window of the new aside-rename swap — rollup renamed aside,
    # stage fully written (marker inside), stage NOT yet renamed in —
    # and assert the restarted stream completes the rename instead of
    # re-folding or discarding.
    import shutil

    src, roll, ckpt = (str(tmp_path / p) for p in ("s3", "r3", "c3"))
    m = {"n": ("count", "v"), "total": ("sum", "v")}
    b1 = _rows(spark, [("a", 1.0), ("b", 5.0)])
    b2 = _rows(spark, [("a", 4.0), ("c", 7.0)])
    b1.write.mode("append").parquet(src)
    q = INC.stream_rollup_maintenance(spark, src, roll, ckpt, ["k"], m,
                                      "k string, v double")
    q.processAllAvailable()
    q.stop()
    # batch 1's data lands in the source but we fake its fold crashing
    b2.write.mode("append").parquet(src)
    merged = INC.incremental_agg(
        spark.read.parquet(roll), b2, ["k"], m)
    stage = roll + "__stage_1"
    merged.write.mode("overwrite").parquet(stage)
    with open(stage + "/_folded_batch", "w") as fh:
        fh.write("1")
    shutil.move(roll, roll + "__old_1")   # aside-rename happened...
    assert not __import__("os").path.exists(roll)  # ...crash here
    # restart on the same checkpoint: batch 1 replays
    q2 = INC.stream_rollup_maintenance(spark, src, roll, ckpt, ["k"], m,
                                       "k string, v double")
    q2.processAllAvailable()
    q2.stop()
    got = {(r.k, r.n, r.total) for r in spark.read.parquet(roll).collect()}
    full = {(r.k, r.n, r.total) for r in INC.partial_agg(
        b1.unionByName(b2), ["k"], m).collect()}
    assert got == full                    # history NOT discarded
    import os
    leftovers = [d for d in os.listdir(tmp_path)
                 if "__old_" in d or "__stage_" in d]
    assert leftovers == []                # scratch dirs cleaned up


# ---------------------------------------------------------------------------
# incremental JOIN-view maintenance (Δ(A⋈B) algebra)
# ---------------------------------------------------------------------------


def test_join_view_delta_equals_full_recompute(tables):
    o, c = tables["orders"], tables["customer"]
    measures = {
        "revenue": ("sum", "o_totalprice"),
        "n_orders": ("count", "o_orderkey"),
        "max_price": ("max", "o_totalprice"),
    }
    cond = F.col("o_custkey") == F.col("c_custkey")
    a_base, a_delta = o.filter(F.col("o_orderkey") % 7 != 0), o.filter(
        F.col("o_orderkey") % 7 == 0
    )
    b_base, b_delta = c.filter(F.col("c_custkey") % 11 != 0), c.filter(
        F.col("c_custkey") % 11 == 0
    )
    view0 = INC.partial_agg(a_base.join(b_base, cond), ["c_mktsegment"], measures)
    got = {
        r.c_mktsegment: (round(r.revenue, 2), r.n_orders, r.max_price)
        for r in INC.incremental_join_agg(
            view0, a_base, a_delta, b_base, b_delta, cond, ["c_mktsegment"], measures
        ).collect()
    }
    want = {
        r.c_mktsegment: (round(r.revenue, 2), r.n_orders, r.max_price)
        for r in INC.partial_agg(
            o.join(c, cond), ["c_mktsegment"], measures
        ).collect()
    }
    assert got == want and len(want) > 1


def test_join_view_delta_empty_deltas_are_noop(tables, spark):
    o, c = tables["orders"], tables["customer"]
    measures = {"n_orders": ("count", "o_orderkey")}
    cond = F.col("o_custkey") == F.col("c_custkey")
    empty_o = o.filter(F.lit(False))
    empty_c = c.filter(F.lit(False))
    delta = INC.join_view_delta(
        o, empty_o, c, empty_c, cond, ["c_mktsegment"], measures
    )
    assert delta.count() == 0


# ---------------------------------------------------------------------------
# streaming snapshot (CDC upsert sink)
# ---------------------------------------------------------------------------


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "k string, seq long, op string, payload string"
    )


def test_stream_snapshot_maintenance(spark, tmp_path):
    # micro-batched upsert folds == one cdc_apply over the full log
    src, snap, ckpt = (str(tmp_path / p) for p in ("cs", "cn", "cc"))
    schema = "k string, seq long, op string, payload string"
    b1 = _changes(spark, [("a", 1, "upsert", "a1"), ("b", 1, "upsert", "b1")])
    b2 = _changes(
        spark,
        [("a", 3, "upsert", "a3"), ("b", 2, "delete", None), ("c", 1, "upsert", "c1")],
    )
    b1.write.mode("append").parquet(src)
    q = INC.stream_snapshot_maintenance(
        spark, src, snap, ckpt, ["k"], ["seq"], schema
    )
    q.processAllAvailable()
    b2.write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    live = {
        (r.k, r.seq, r.payload)
        for r in spark.read.parquet(snap).filter("op != 'delete'").collect()
    }
    assert live == {("a", 3, "a3"), ("c", 1, "c1")}  # b tombstoned
    # tombstone retained in the STORED table so late data can't resurrect
    stored = {r.k: r.op for r in spark.read.parquet(snap).collect()}
    assert stored["b"] == "delete"


def test_stream_snapshot_late_upsert_cannot_resurrect_delete(spark, tmp_path):
    src, snap, ckpt = (str(tmp_path / p) for p in ("ls", "ln", "lc"))
    schema = "k string, seq long, op string, payload string"
    _changes(spark, [("a", 5, "delete", None)]).write.mode("append").parquet(src)
    q = INC.stream_snapshot_maintenance(
        spark, src, snap, ckpt, ["k"], ["seq"], schema
    )
    q.processAllAvailable()
    # a LATE batch carrying an upsert OLDER than the delete
    _changes(spark, [("a", 2, "upsert", "stale")]).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    live = spark.read.parquet(snap).filter("op != 'delete'").collect()
    assert live == []


# ---------------------------------------------------------------------------
# snapshot time-travel reads (retain_snapshots)
# ---------------------------------------------------------------------------


def test_time_travel_reads_each_retained_version(spark, tmp_path):
    # fold 3 batches with retention; every historical version reads
    # back AS OF its fold, identified by the in-table batch-id marker
    src, roll, ckpt = (str(tmp_path / p) for p in ("s4", "r4", "c4"))
    m = {"n": ("count", "v"), "total": ("sum", "v")}
    batches = [
        _rows(spark, [("a", 1.0), ("b", 5.0)]),
        _rows(spark, [("a", 4.0), ("c", 7.0)]),
        _rows(spark, [("b", 2.0)]),
    ]
    batches[0].write.mode("append").parquet(src)
    q = INC.stream_rollup_maintenance(
        spark, src, roll, ckpt, ["k"], m, "k string, v double",
        retain_snapshots=5,
    )
    q.processAllAvailable()
    for b in batches[1:]:
        b.write.mode("append").parquet(src)
        q.processAllAvailable()
    q.stop()

    versions = INC.list_snapshots(spark, roll)
    assert len(versions) >= 3  # an idle empty micro-batch may add one
    assert [b for b, _ in versions] == sorted(
        (b for b, _ in versions), reverse=True
    )
    snaps = [
        frozenset(
            (r.k, r.n, r.total)
            for r in INC.read_snapshot(spark, roll, batch_id=b).collect()
        )
        for b, _ in versions
    ]
    acc = None
    for i, b in enumerate(batches):
        acc = b if acc is None else acc.unionByName(b)
        want = frozenset(
            (r.k, r.n, r.total) for r in INC.partial_agg(acc, ["k"], m).collect()
        )
        assert want in snaps, f"cumulative state after batch {i} not readable"
    # live read == newest version == final cumulative state
    live = frozenset(
        (r.k, r.n, r.total) for r in INC.read_snapshot(spark, roll).collect()
    )
    assert live == snaps[0] == frozenset(
        (r.k, r.n, r.total) for r in INC.partial_agg(acc, ["k"], m).collect()
    )
    import pytest

    with pytest.raises(ValueError, match="not retained"):
        INC.read_snapshot(spark, roll, batch_id=99)


def test_retention_budget_prunes_oldest(spark, tmp_path):
    src, roll, ckpt = (str(tmp_path / p) for p in ("s5", "r5", "c5"))
    m = {"n": ("count", "v")}
    q = None
    for i in range(4):
        _rows(spark, [(f"k{i}", float(i))]).write.mode("append").parquet(src)
        if q is None:
            q = INC.stream_rollup_maintenance(
                spark, src, roll, ckpt, ["k"], m, "k string, v double",
                retain_snapshots=1,
            )
        q.processAllAvailable()
    q.stop()
    # live + exactly one retained aside, newest ids first
    versions = INC.list_snapshots(spark, roll)
    assert len(versions) == 2
    assert versions[0][0] == versions[1][0] + 1
    import pytest

    with pytest.raises(ValueError, match="not retained"):
        INC.read_snapshot(spark, roll, batch_id=0)


def test_crash_recovery_preserves_retained_snapshots(spark, tmp_path):
    # the crash-window recovery path must finish the interrupted swap
    # AND keep the retention budget's worth of asides readable
    import shutil

    src, roll, ckpt = (str(tmp_path / p) for p in ("s6", "r6", "c6"))
    m = {"n": ("count", "v"), "total": ("sum", "v")}
    b1 = _rows(spark, [("a", 1.0), ("b", 5.0)])
    b2 = _rows(spark, [("a", 4.0), ("c", 7.0)])
    b1.write.mode("append").parquet(src)
    q = INC.stream_rollup_maintenance(
        spark, src, roll, ckpt, ["k"], m, "k string, v double",
        retain_snapshots=3,
    )
    q.processAllAvailable()
    q.stop()
    # fake batch 1's fold crashing between aside-rename and stage-rename
    b2.write.mode("append").parquet(src)
    merged = INC.incremental_agg(spark.read.parquet(roll), b2, ["k"], m)
    stage = roll + "__stage_1"
    merged.write.mode("overwrite").parquet(stage)
    with open(stage + "/_folded_batch", "w") as fh:
        fh.write("1")
    shutil.move(roll, roll + "__old_1")
    q2 = INC.stream_rollup_maintenance(
        spark, src, roll, ckpt, ["k"], m, "k string, v double",
        retain_snapshots=3,
    )
    q2.processAllAvailable()
    q2.stop()
    # live == full recompute; version 0 still time-travel-readable
    got = {(r.k, r.n, r.total) for r in spark.read.parquet(roll).collect()}
    full = {(r.k, r.n, r.total)
            for r in INC.partial_agg(b1.unionByName(b2), ["k"], m).collect()}
    assert got == full
    v0 = {(r.k, r.n, r.total)
          for r in INC.read_snapshot(spark, roll, batch_id=0).collect()}
    assert v0 == {(r.k, r.n, r.total)
                  for r in INC.partial_agg(b1, ["k"], m).collect()}


def test_vacuum_snapshots_prunes_to_budget(spark, tmp_path):
    src, roll, ckpt = (str(tmp_path / p) for p in ("s7", "r7", "c7"))
    m = {"n": ("count", "v")}
    q = None
    for i in range(4):
        _rows(spark, [(f"k{i}", float(i))]).write.mode("append").parquet(src)
        if q is None:
            q = INC.stream_rollup_maintenance(
                spark, src, roll, ckpt, ["k"], m, "k string, v double",
                retain_snapshots=10,
            )
        q.processAllAvailable()
    q.stop()
    before = INC.vacuum_snapshots(spark, roll, retain=10)
    assert len(before) >= 4  # everything retained
    after = INC.vacuum_snapshots(spark, roll, retain=1)
    assert len(after) == 2  # live + one aside
    assert after == sorted(after, reverse=True)
    # live table untouched; newest retained version still reads
    assert INC.read_snapshot(spark, roll, batch_id=after[1]).count() >= 1


def test_answer_from_rollup_routes_and_refuses(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import incremental as INC
    import pytest as _pytest

    rows = [("a", "x", 1, 10.0), ("a", "y", 2, 20.0), ("b", "x", 3, 5.0)]
    df = spark.createDataFrame(rows, "g string, h string, id long, v double")
    measures = {"n": ("count", "id"), "s": ("sum", "v"), "mx": ("max", "v")}
    rollup = INC.partial_agg(df, ["g", "h"], measures)
    out = {
        r.g: (r.n, r.s, r.mx)
        for r in INC.answer_from_rollup(rollup, ["g", "h"], measures, ["g"]).collect()
    }
    assert out == {"a": (2, 30.0, 20.0), "b": (1, 5.0, 5.0)}
    # total (empty grouping) also answerable
    tot = INC.answer_from_rollup(rollup, ["g", "h"], measures, []).collect()[0]
    assert (tot.n, tot.s, tot.mx) == (3, 35.0, 20.0)
    # finer/foreign key or unknown measure must refuse, not mis-answer
    with _pytest.raises(ValueError):
        INC.answer_from_rollup(rollup, ["g", "h"], measures, ["id"])
    with _pytest.raises(ValueError):
        INC.answer_from_rollup(rollup, ["g", "h"], measures, ["g"], ["nope"])
    assert not INC.can_answer(["g"], measures, ["g", "h"], ["n"])
