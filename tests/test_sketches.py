"""Sketch aggregates: error bounds vs the exact operators (their gate —
cross-engine sketch values can't hash-match an oracle by design)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import sketches


def test_approx_distinct_within_rsd_bound(tables):
    exact = {
        r.event_type: r.n
        for r in tables["events"]
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r.event_type: r.approx_distinct
        for r in sketches.approx_distinct_counts(
            tables["events"], ["event_type"], "user_id", rsd=0.02
        ).collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(3, 5 * 0.02 * n), (k, approx[k], n)


def test_approx_quantiles_near_exact(tables):
    probs = [0.25, 0.5, 0.75]
    got = sketches.approx_quantiles(
        tables["orders"], "o_totalprice", probs, accuracy=10_000
    ).collect()[0].quantiles
    exact = (
        tables["orders"]
        .agg(F.expr("percentile(o_totalprice, array(0.25, 0.5, 0.75))").alias("q"))
        .collect()[0]
        .q
    )
    spread = (
        tables["orders"].agg((F.max("o_totalprice") - F.min("o_totalprice")).alias("s")).collect()[0].s
    )
    for a, e in zip(got, exact):
        assert abs(a - e) <= 0.05 * spread  # loose sanity: rank error is tiny, value error bounded by local density
    assert got == sorted(got)


def test_approx_quantiles_grouped(tables):
    out = sketches.approx_quantiles(
        tables["orders"], "o_totalprice", [0.5], keys=["o_orderstatus"]
    )
    rows = out.collect()
    assert {r.o_orderstatus for r in rows} == {
        r.o_orderstatus for r in tables["orders"].select("o_orderstatus").distinct().collect()
    }
    for r in rows:
        assert len(r.quantiles) == 1 and r.quantiles[0] > 0


# ---------------------------------------------------------------------------
# portable HLL — registers must match a pure-Python replica bit-for-bit
# ---------------------------------------------------------------------------


def _py_hll(values, p=8):
    """Pure-Python replica of sketches.hll_distinct's register math."""
    import hashlib
    import math

    m, w = 1 << p, 60 - p
    regs = {}
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        idx, rest = h >> w, h & ((1 << w) - 1)
        rho = (w + 1) if rest == 0 else (w + 1 - rest.bit_length())
        regs[idx] = max(regs.get(idx, 0), rho)
    z_scaled = sum(1 << (w + 1 - r) for r in regs.values()) + (m - len(regs)) * (
        1 << (w + 1)
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m * float(1 << (w + 1)) / z_scaled
    v_empty = m - len(regs)
    est = m * math.log(m / v_empty) if (raw <= 2.5 * m and v_empty > 0) else raw
    return len(regs), z_scaled, raw, est


def test_hll_distinct_matches_python_replica(tables):
    got = sketches.hll_distinct(tables["lineitem"], "l_partkey", p=8).collect()[0]
    vals = [
        r.l_partkey
        for r in tables["lineitem"].select("l_partkey").distinct().collect()
    ]
    nonzero, z_scaled, raw, est = _py_hll(vals, p=8)
    assert got.nonzero == nonzero
    assert got.z_scaled == z_scaled
    assert abs(got.raw_estimate - round(raw, 6)) < 1e-6
    assert abs(got.estimate - round(est, 6)) < 1e-6
    assert got.exact_distinct == len(vals)
    # classic-HLL error at m=256 is ~1.04/sqrt(m) ≈ 6.5%; allow 4 sigma
    assert got.rel_err < 0.26


def test_hll_registers_merge_like_partitions(spark):
    # the mergeability claim: sketch(a ∪ b) == merge(sketch(a), sketch(b))
    # holds because registers are per-index max — verify via the replica
    a, b = range(0, 500), range(300, 900)
    na, za, _, _ = _py_hll(list(a) + list(b))
    import hashlib

    def regs(vals, p=8, w=52):
        out = {}
        for v in vals:
            h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
            idx, rest = h >> w, h & ((1 << w) - 1)
            rho = (w + 1) if rest == 0 else (w + 1 - rest.bit_length())
            out[idx] = max(out.get(idx, 0), rho)
        return out

    ra, rb = regs(a), regs(b)
    merged = {i: max(ra.get(i, 0), rb.get(i, 0)) for i in set(ra) | set(rb)}
    assert merged == regs(list(a) + list(b))


# ---------------------------------------------------------------------------
# Misra-Gries frequent items — exact output, bounded summaries
# ---------------------------------------------------------------------------


def _skewed(spark, n=20_000):
    return spark.range(n).selectExpr(
        "CASE WHEN id % 2 = 0 THEN concat('hot_', CAST(id % 3 AS STRING)) "
        "ELSE concat('cold_', CAST(id % 701 AS STRING)) END AS item"
    )


def test_frequent_items_equals_exact_groupby(spark):
    src = _skewed(spark)
    got = {
        (r.item, r.n_rows)
        for r in sketches.frequent_items(src, "item", k=10).collect()
    }
    n = src.count()
    exact = {
        (r.item, r.cnt)
        for r in src.groupBy("item").agg(F.count("*").alias("cnt")).collect()
        if r.cnt * 10 >= n
    }
    assert got == exact and len(got) == 3  # the three hot_* keys


def test_frequent_items_tight_cap_still_exact(spark):
    # cap == k is the minimum that preserves the superset guarantee;
    # the 701 cold keys churn the summary constantly and the output
    # must STILL equal the exact answer
    src = _skewed(spark).repartition(8)
    got = {
        r.item for r in sketches.frequent_items(src, "item", k=10, cap=10).collect()
    }
    assert got == {"hot_0", "hot_1", "hot_2"}


def test_frequent_items_cap_below_k_rejected(spark):
    import pytest

    with pytest.raises(ValueError):
        sketches.frequent_items(_skewed(spark, 100), "item", k=10, cap=5)


def test_frequent_items_keeps_frequent_null(spark):
    # a NULL that clears the N/k bar must appear, exactly as plain
    # GROUP BY/HAVING would keep the NULL group (null-safe verify join)
    src = spark.range(100).selectExpr(
        "CASE WHEN id < 60 THEN NULL "
        "WHEN id < 90 THEN 'b' ELSE concat('z_', id) END AS item"
    )
    got = {(r.item, r.n_rows) for r in sketches.frequent_items(src, "item", k=4).collect()}
    assert got == {(None, 60), ("b", 30)}


def test_hll_estimate_empty_input_is_zero(spark):
    regs = sketches.hll_register_updates(
        spark.range(10).filter("id < 0").selectExpr("CAST(id AS STRING) AS s"), "s"
    )
    row = sketches.hll_estimate_from_registers(regs).collect()[0]
    assert row.nonzero == 0
    assert row.z_scaled == (1 << 8) * (1 << (60 - 8 + 1))
    assert row.estimate == 0.0


def test_hll_registers_fold_via_incremental_rollup(tables):
    # the streaming-view path: register updates folded through the
    # generic rollup algebra == the one-shot sketch
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        incremental as INC,
    )

    li = tables["lineitem"]
    hist = li.filter(F.col("l_orderkey") % 3 != 0)
    delta = li.filter(F.col("l_orderkey") % 3 == 0)
    measures = {"rho": ("max", "rho")}
    r0 = INC.partial_agg(
        sketches.hll_register_updates(hist, "l_partkey"), ["idx"], measures
    )
    folded = INC.incremental_agg(
        r0, sketches.hll_register_updates(delta, "l_partkey"), ["idx"], measures
    )
    got = sketches.hll_estimate_from_registers(folded).collect()[0]
    want_regs = (
        sketches.hll_register_updates(li, "l_partkey")
        .groupBy("idx")
        .agg(F.max("rho").alias("rho"))
    )
    want = sketches.hll_estimate_from_registers(want_regs).collect()[0]
    assert (got.nonzero, got.z_scaled) == (want.nonzero, want.z_scaled)
    assert got.estimate == want.estimate


def test_hll_registers_stream_maintained(spark, tmp_path):
    # composition proof: the generic streaming rollup maintenance keeps
    # a LIVE distinct-count sketch when fed register updates with the
    # max-merge measure — no HLL-specific streaming code needed
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        incremental as INC,
    )

    src, roll, ckpt = (str(tmp_path / p) for p in ("hs", "hr", "hc"))
    b1 = spark.range(0, 4000).selectExpr("CAST(id AS STRING) AS item")
    b2 = spark.range(3000, 9000).selectExpr("CAST(id AS STRING) AS item")
    sketches.hll_register_updates(b1, "item").write.mode("append").parquet(src)
    q = INC.stream_rollup_maintenance(
        spark, src, roll, ckpt, ["idx"], {"rho": ("max", "rho")},
        "idx long, rho int",
    )
    q.processAllAvailable()
    sketches.hll_register_updates(b2, "item").write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    live = sketches.hll_estimate_from_registers(spark.read.parquet(roll)).collect()[0]
    want = sketches.hll_estimate_from_registers(
        sketches.hll_register_updates(b1.unionByName(b2), "item")
        .groupBy("idx")
        .agg(F.max("rho").alias("rho"))
    ).collect()[0]
    assert (live.nonzero, live.z_scaled, live.estimate) == (
        want.nonzero, want.z_scaled, want.estimate,
    )
    # 9000 true distincts; classic-HLL p=8 error ~6.5%, allow 4 sigma
    assert abs(live.estimate - 9000) / 9000 < 0.26


# ---------------------------------------------------------------------------
# portable quantile sketch
# ---------------------------------------------------------------------------


def _qvals(spark):
    import pandas as pd
    import numpy as np

    rng = np.random.RandomState(11)
    vals = np.concatenate([
        rng.lognormal(8, 2, 3000).round(2),
        -rng.lognormal(4, 1, 1000).round(2),
        np.zeros(30),
        np.arange(1, 40) / 100.0,
    ])
    return spark.createDataFrame(pd.DataFrame({"x": vals})), np.sort(vals)


def test_qsketch_small_ints_exact_buckets(spark):
    # |v| < 2^(m+1) → every integer its own bucket (exact small-value
    # quantiles); bucket ids strictly monotone in the value
    df = spark.range(1, 256).selectExpr("CAST(id AS DOUBLE) AS x")
    sk = sketches.qsketch(df, "x", m=7, scale=1).collect()
    assert len(sk) == 255
    assert all(r.n_rows == 1 and r.lo == r.hi for r in sk)
    assert [r.lo for r in sorted(sk, key=lambda r: r.bucket)] == [
        float(i) for i in range(1, 256)
    ]


def test_qsketch_bounds_bracket_true_quantiles(spark):
    import numpy as np

    df, sv = _qvals(spark)
    sk = sketches.qsketch(df, "x", m=7, scale=100)
    assert sk.agg(F.sum("n_rows")).collect()[0][0] == len(sv)
    # buckets are disjoint and ordered: value order == bucket order
    rows = sorted(sk.collect(), key=lambda r: r.bucket)
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo + 1e-9
    est = sketches.qsketch_quantiles(
        sk.select("bucket", "n_rows"), [0.01, 0.25, 0.5, 0.9, 0.99], m=7, scale=100
    ).collect()
    for r in est:
        true = sv[int(np.ceil(r.q * len(sv))) - 1]
        assert r.lo - 1e-9 <= true <= r.hi + 1e-9, (r, true)
        if abs(true) >= 1:  # relative bound needs |v| past the exact range
            assert abs(r.estimate - true) / abs(true) <= 2**-8 + 1e-12


def test_qsketch_incremental_fold_equals_one_shot(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        incremental as INC,
    )

    df, _ = _qvals(spark)
    parts = [df.filter(F.pmod(F.monotonically_increasing_id(), F.lit(3)) == i)
             for i in range(3)]
    # fold three deltas through the rollup algebra in arbitrary order
    measures = {"cnt": ("sum", "cnt")}
    r = INC.partial_agg(
        sketches.qsketch_updates(parts[2], "x", scale=100), ["bucket"], measures
    )
    for p in (parts[0], parts[1]):
        r = INC.incremental_agg(
            r, sketches.qsketch_updates(p, "x", scale=100), ["bucket"], measures
        )
    got = {(x.bucket, x.cnt) for x in r.collect()}
    want = {
        (x.bucket, x.n_rows)
        for x in sketches.qsketch(df, "x", scale=100).collect()
    }
    assert got == want


def test_qsketch_stream_maintained(spark, tmp_path):
    # composition proof: the generic streaming rollup keeps a LIVE
    # quantile sketch when fed bucket updates with the sum measure —
    # no quantile-specific streaming code needed (the HLL pattern)
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        incremental as INC,
    )

    src, roll, ckpt = (str(tmp_path / p) for p in ("qs", "qr", "qc"))
    b1 = spark.range(1, 4000).selectExpr("CAST(id AS DOUBLE) / 7 AS x")
    b2 = spark.range(4000, 9000).selectExpr("CAST(id AS DOUBLE) / 7 AS x")
    sketches.qsketch_updates(b1, "x", scale=100).write.mode("append").parquet(src)
    q = INC.stream_rollup_maintenance(
        spark, src, roll, ckpt, ["bucket"], {"cnt": ("sum", "cnt")},
        "bucket long, cnt long",
    )
    q.processAllAvailable()
    sketches.qsketch_updates(b2, "x", scale=100).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    live = spark.read.parquet(roll).select("bucket", F.col("cnt").alias("n_rows"))
    got = sketches.qsketch_quantiles(live, [0.5, 0.9], scale=100).collect()
    want = sketches.qsketch_quantiles(
        sketches.qsketch(b1.unionByName(b2), "x", scale=100).select("bucket", "n_rows"),
        [0.5, 0.9], scale=100,
    ).collect()
    assert [(r.q, r.bucket, r.estimate) for r in got] == [
        (r.q, r.bucket, r.estimate) for r in want
    ]


def test_qsketch_empty_and_null_input(spark):
    empty = spark.range(0).selectExpr("CAST(id AS DOUBLE) AS x")
    assert sketches.qsketch(empty, "x").count() == 0
    nulls = spark.range(10).selectExpr(
        "CASE WHEN id < 5 THEN CAST(id + 1 AS DOUBLE) ELSE NULL END AS x"
    )
    assert sketches.qsketch(nulls, "x").agg(F.sum("n_rows")).collect()[0][0] == 5


def test_qsketch_grouped_matches_per_group_numpy(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(4)
    gs = np.repeat(["a", "b", "c"], [800, 500, 200])
    vals = np.concatenate([
        rng.lognormal(6, 1, 800), rng.lognormal(3, 2, 500),
        rng.uniform(1, 9, 200),
    ]).round(2)
    df = spark.createDataFrame(pd.DataFrame({"g": gs, "x": vals}))
    got = sketches.qsketch_grouped(
        df, ["g"], "x", [0.5, 0.9], m=7, scale=100
    ).collect()
    assert len(got) == 6
    for r in got:
        sub = np.sort(vals[gs == r.g])
        true = sub[int(np.ceil(r.q * len(sub))) - 1]
        assert r.lo - 1e-9 <= true <= r.hi + 1e-9, (r, true)
        if abs(true) >= 1:
            assert abs(r.estimate - true) / abs(true) <= 2**-8 + 1e-12


def test_hll_grouped_estimates_near_exact_per_group(tables):
    exact = {
        r.event_type: r.n
        for r in tables["events"]
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    got = {r.event_type: r.estimate
           for r in sketches.hll_grouped(
               tables["events"], ["event_type"], "user_id", p=8).collect()}
    assert set(got) == set(exact)
    for g, n in exact.items():
        # m=256 -> ~6.5% typical error; allow 4 sigma
        assert abs(got[g] - n) <= max(5, 0.26 * n), (g, got[g], n)


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


def test_cm_never_underestimates_and_bounds_overshoot(spark):
    import pandas as pd

    n, width = 20_000, 2048
    src = spark.range(n).selectExpr("concat('k', CAST(id % 500 AS STRING)) AS item")
    sk = sketches.cm_sketch(src, "item", depth=4, width=width)
    keys = spark.createDataFrame(
        pd.DataFrame({"item": [f"k{i}" for i in range(500)]})
    )
    est = {r.item: r.cm_estimate
           for r in sketches.cm_lookup(sk, keys, "item", depth=4,
                                       width=width).collect()}
    exact = {r.item: r.c
             for r in src.groupBy("item").agg(F.count("*").alias("c")).collect()}
    import math

    bound = math.e * n / width  # CM guarantee at prob 1 - e^-depth
    violations = 0
    for k, c in exact.items():
        assert est[k] >= c, (k, est[k], c)  # NEVER an underestimate
        if est[k] - c > bound:
            violations += 1
    assert violations <= 0.05 * len(exact), violations


def test_cm_sketch_folds_through_incremental_rollup(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        incremental as INC,
    )

    a = spark.range(0, 3000).selectExpr("CAST(id % 70 AS STRING) AS item")
    b = spark.range(3000, 8000).selectExpr("CAST(id % 70 AS STRING) AS item")
    measures = {"cnt": ("sum", "cnt")}
    r0 = INC.partial_agg(sketches.cm_updates(a, "item"), ["r", "cell"], measures)
    folded = INC.incremental_agg(
        r0, sketches.cm_updates(b, "item"), ["r", "cell"], measures
    )
    got = {(x.r, x.cell, x.cnt) for x in folded.collect()}
    want = {(x.r, x.cell, x.n)
            for x in sketches.cm_sketch(a.unionByName(b), "item").collect()}
    assert got == want


# ---------------------------------------------------------------------------
# KMV set sketches
# ---------------------------------------------------------------------------


def test_kmv_sketch_is_partitioning_independent(spark):
    src = spark.range(5000).selectExpr("concat('u', CAST(id % 900 AS STRING)) AS u")
    a = {r.h for r in sketches.kmv_sketch(src, "u", k=64).collect()}
    b = {r.h for r in sketches.kmv_sketch(src.repartition(17), "u", k=64).collect()}
    assert a == b and len(a) == 64


def test_kmv_overlap_small_sets_exact(spark):
    a = spark.range(0, 40).selectExpr("CAST(id AS STRING) AS u")
    b = spark.range(25, 70).selectExpr("CAST(id AS STRING) AS u")
    row = sketches.kmv_overlap(a, b, "u", k=256).collect()[0]
    # union 70 < k: everything exact
    assert (row.n_a, row.n_b, row.n_union) == (40, 45, 70)
    assert row.est_a == 40.0 and row.est_union == 70.0
    assert row.rho == 15 and row.est_intersection == 15.0


def test_kmv_overlap_estimates_within_error(spark):
    n_a, n_b, n_i, k = 3000, 2500, 800, 256
    a = spark.range(0, n_a).selectExpr("concat('x', CAST(id AS STRING)) AS u")
    b = spark.range(n_a - n_i, n_a - n_i + n_b).selectExpr(
        "concat('x', CAST(id AS STRING)) AS u"
    )
    row = sketches.kmv_overlap(a, b, "u", k=k).collect()[0]
    # KMV rse ~ 1/sqrt(k-1) ~ 6.3%; allow 4 sigma on each estimate
    assert abs(row.est_a - n_a) / n_a < 0.26
    assert abs(row.est_b - n_b) / n_b < 0.26
    assert abs(row.est_union - (n_a + n_b - n_i)) / (n_a + n_b - n_i) < 0.26
    # intersection: ratio estimator compounds — allow wider band
    assert abs(row.est_intersection - n_i) / n_i < 0.5, row.est_intersection


def test_cm_join_size_never_underestimates(spark):
    a = spark.range(6000).selectExpr("concat('u', CAST(id % 300 AS STRING)) AS u")
    b = spark.range(4000).selectExpr("concat('u', CAST(id % 450 AS STRING)) AS u")
    ska = sketches.cm_sketch(a, "u", depth=4, width=4096)
    skb = sketches.cm_sketch(b, "u", depth=4, width=4096)
    est = sketches.cm_join_size(ska, skb).collect()[0].estimate
    exact = (
        a.groupBy("u").agg(F.count("*").alias("na"))
        .join(b.groupBy("u").agg(F.count("*").alias("nb")), "u")
        .agg(F.sum(F.col("na") * F.col("nb"))).collect()[0][0]
    )
    assert est >= exact
    import math

    assert est - exact <= 4 * math.e * 6000 * 4000 / 4096  # loose CM band


def test_qsketch_weighted_matches_numpy_weighted_quantile(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(6)
    vals = rng.randint(1, 5000, 1200)
    ws = rng.randint(1, 20, 1200)
    df = spark.createDataFrame(pd.DataFrame({"x": vals, "w": ws}))
    got = sketches.qsketch_weighted(df, "x", "w", [0.5, 0.9], m=7, scale=1).collect()
    order = np.argsort(vals)
    sv, sw = vals[order], ws[order]
    cw = np.cumsum(sw)
    for r in got:
        # true weighted quantile: first value whose cumulative weight
        # reaches ceil(q * W)
        target = int(np.ceil(r.q * cw[-1]))
        true = sv[np.searchsorted(cw, target)]
        assert r.lo - 1e-9 <= true <= r.hi + 1e-9, (r, true)


# ---------------------------------------------------------------------------
# portable Bloom filter
# ---------------------------------------------------------------------------


def test_bloom_prune_no_false_negatives_bounded_fp(spark):
    dim = spark.range(0, 300).selectExpr("id AS k")
    fact = spark.range(0, 6000).selectExpr("id AS fk", "id % 4000 AS key")
    bloom = sketches.bloom_build(dim, "k", n_bits=4096, n_hashes=5)
    kept = sketches.bloom_prune(fact, "key", bloom, n_bits=4096, n_hashes=5)
    kept_keys = {r.key for r in kept.collect()}
    true_keys = {r.key for r in fact.filter("key < 300").collect()}
    assert true_keys <= kept_keys          # NEVER a false negative
    fp = kept_keys - true_keys
    # designed fp rate ~(1-e^(-5*300/4096))^5 ~ 0.3%; 4000 distinct probes
    assert len(fp) <= 40, len(fp)
    # output schema/rows preserved (duplicate fact keys survive per-row)
    assert kept.columns == ["fk", "key"]
    assert kept.count() == len({r.fk for r in kept.collect()})


def test_bloom_filters_merge_by_bit_or(spark):
    from pyspark.sql import functions as FF

    a = spark.range(0, 100).selectExpr("id AS k")
    b = spark.range(100, 250).selectExpr("id AS k")
    merged = (
        sketches.bloom_build(a, "k", n_bits=2048)
        .unionByName(sketches.bloom_build(b, "k", n_bits=2048))
        .groupBy("word")
        .agg(FF.bit_or("bits").alias("bits"))
    )
    whole = sketches.bloom_build(a.unionByName(b), "k", n_bits=2048)
    assert {(r.word, r.bits) for r in merged.collect()} == {
        (r.word, r.bits) for r in whole.collect()
    }


def test_bloom_stream_maintained(spark, tmp_path):
    # composition proof: the generic streaming rollup with the bit_or
    # measure keeps a LIVE Bloom filter as new dim keys land — no
    # bloom-specific streaming code (the HLL/quantile pattern)
    from pyspark.sql import functions as FF

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        incremental as INC,
    )

    def words(df):
        return sketches.bloom_build(df, "k", n_bits=2048).select(
            "word", FF.col("bits").alias("bits")
        )

    src, roll, ckpt = (str(tmp_path / p) for p in ("bs", "br", "bc"))
    b1 = spark.range(0, 150).selectExpr("id AS k")
    b2 = spark.range(150, 400).selectExpr("id AS k")
    words(b1).write.mode("append").parquet(src)
    q = INC.stream_rollup_maintenance(
        spark, src, roll, ckpt, ["word"], {"bits": ("bit_or", "bits")},
        "word long, bits long",
    )
    q.processAllAvailable()
    words(b2).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    live = {(r.word, r.bits) for r in spark.read.parquet(roll).collect()}
    want = {(r.word, r.bits)
            for r in words(b1.unionByName(b2)).collect()}
    assert live == want


def test_hll_sliding_distinct_window_semantics(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.sketches import (
        hll_distinct,
        hll_sliding_distinct,
    )
    from pyspark.sql import functions as F

    # buckets 0,1,5 with disjoint user sets; bucket 3 absent (gap)
    rows = (
        [(0, u) for u in range(30)]
        + [(1, 100 + u) for u in range(20)]
        + [(5, 200 + u) for u in range(10)]
    )
    df = spark.createDataFrame(rows, "bucket long, uid long")
    out = {r.bucket: r for r in hll_sliding_distinct(df, "bucket", "uid", trailing=3).collect()}
    assert set(out) == {0, 1, 5}
    # trailing-3 at bucket 1 = buckets {0,1} merged == one-shot HLL of both sets
    both = hll_distinct(
        df.filter(F.col("bucket") <= 1).select("uid"), "uid"
    ).collect()[0]
    assert abs(out[1].estimate - both.estimate) < 1e-5  # hll_distinct rounds to 6dp
    assert out[1].z_scaled == both.z_scaled
    # RANGE frame: bucket 5's window [3,5] excludes buckets 0/1 despite
    # them being the adjacent ROWS — only its own 10 users remain
    solo = hll_distinct(
        df.filter(F.col("bucket") == 5).select("uid"), "uid"
    ).collect()[0]
    assert out[5].z_scaled == solo.z_scaled


def test_hll_sliding_stream_maintained(spark, tmp_path):
    # composition proof: the generic streaming rollup keyed on
    # (bucket, idx) with the max-rho measure keeps LIVE sliding-window
    # distinct counts — zero sliding-specific streaming code
    from pyspark.sql import functions as F
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        incremental as INC,
    )
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.sketches import (
        hll_sliding_distinct,
        hll_sliding_from_registers,
    )

    def reg_updates(df):
        from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.functions.text import (
            portable_token_hash,
        )
        from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.sketches import (
            hll_rho,
        )

        w = 52
        h = portable_token_hash(F.col("uid").cast("string"))
        return df.select(
            "bucket",
            F.shiftright(h, w).alias("idx"),
            hll_rho(h.bitwiseAND(F.lit((1 << w) - 1)), w).alias("rho"),
        )

    rows1 = [(0, u) for u in range(200)] + [(1, 300 + u) for u in range(100)]
    rows2 = [(2, 600 + u) for u in range(150)] + [(1, 300 + u) for u in range(50)]
    b1 = spark.createDataFrame(rows1, "bucket long, uid long")
    b2 = spark.createDataFrame(rows2, "bucket long, uid long")
    src, roll, ckpt = (str(tmp_path / p) for p in ("ss", "sr", "sc"))
    reg_updates(b1).write.mode("append").parquet(src)
    q = INC.stream_rollup_maintenance(
        spark, src, roll, ckpt, ["bucket", "idx"], {"rho": ("max", "rho")},
        "bucket long, idx long, rho int",
    )
    q.processAllAvailable()
    reg_updates(b2).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    live = {
        r.bucket: (r.nonzero, r.z_scaled, r.estimate)
        for r in hll_sliding_from_registers(
            spark.read.parquet(roll), trailing=2
        ).collect()
    }
    want = {
        r.bucket: (r.nonzero, r.z_scaled, r.estimate)
        for r in hll_sliding_distinct(
            b1.unionByName(b2), "bucket", "uid", trailing=2
        ).collect()
    }
    assert live == want and set(live) == {0, 1, 2}


def test_frequent_items_grouped_exact(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.sketches import (
        frequent_items_grouped,
    )

    rows = []
    # group A: 'x' 60 times, 40 singletons -> only x passes k=4 (>=25)
    rows += [("A", "x")] * 60 + [("A", f"a{i}") for i in range(40)]
    # group B: 'y' 30, 'z' 30, 40 singletons -> y and z pass (>=25)
    rows += [("B", "y")] * 30 + [("B", "z")] * 30 + [("B", f"b{i}") for i in range(40)]
    # NULL group with a frequent NULL item
    rows += [(None, None)] * 8 + [(None, "q")] * 2
    df = spark.createDataFrame(rows, "g string, item string").repartition(7)
    out = {
        (r.group, r.item): r.n_rows
        for r in frequent_items_grouped(df, "g", "item", k=4, cap=8).collect()
    }
    assert out == {("A", "x"): 60, ("B", "y"): 30, ("B", "z"): 30, (None, None): 8}


def test_qsketch_bucket_long_min_saturates(spark):
    """abs(LONG_MIN) overflows back to LONG_MIN under JVM semantics —
    the raw BIGINT API clamps it to -(2^63-1) so the bucket id is
    well-defined (and equal to its neighbor's)."""
    lmin = -(1 << 63)
    df = spark.createDataFrame(
        [(lmin,), (lmin + 1,), (-((1 << 62)),)], "v long"
    )
    rows = {r.v: r.b for r in df.select(
        "v", sketches.qsketch_bucket(F.col("v")).alias("b")
    ).collect()}
    assert rows[lmin] == rows[lmin + 1]          # saturated into the neighbor
    assert rows[lmin] < rows[-(1 << 62)] < 0     # monotone, negative side


def test_qsketch_sliding_matches_per_window_batch(spark):
    """Sliding quantiles == the one-shot sketch run on each trailing
    window's rows — including a time bucket whose values all landed in
    sketch buckets only touched in EARLIER hours (the dense-spine
    case)."""
    rows = []
    vals = {0: [1.0, 2.0, 3.0], 1: [100.0, 200.0], 2: [1.5], 4: [50.0, 60.0]}
    for tb, vs in vals.items():
        rows += [(tb, v) for v in vs]
    df = spark.createDataFrame(rows, "tb long, x double")
    got = {
        (r.bucket_ts, r.q): (r.rank, r.bucket, r.estimate)
        for r in sketches.qsketch_sliding_quantiles(
            df, "tb", "x", [0.5, 0.95], trailing=2, scale=100
        ).collect()
    }
    for tb in vals:
        window_rows = [v for t, v in rows if tb - 1 <= t <= tb]
        bdf = spark.createDataFrame([(v,) for v in window_rows], "x double")
        want = sketches.qsketch_quantiles(
            sketches.qsketch(bdf, "x", scale=100).select("bucket", "n_rows"),
            [0.5, 0.95],
            scale=100,
        ).collect()
        for r in want:
            assert got[(tb, r.q)] == (r.rank, r.bucket, r.estimate), (tb, r.q)
    # hour 4 is isolated (gap at 3): RANGE frame must not stretch over
    # the calendar gap, so its window is hour 4 alone
    assert (3, 0.5) not in got and (4, 0.5) in got


def test_qsketch_sliding_stream_maintained_live_reads(spark, tmp_path):
    """The generic streaming rollup keyed on (bucket_ts, bucket) with
    the sum measure serves LIVE sliding percentiles — read BETWEEN
    micro-batches and after, each time equal to the batch composition
    over the data seen so far (zero sliding-specific streaming code:
    the hll_sliding pattern)."""
    from pyspark.sql import functions as F

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        incremental as INC,
    )

    src, roll, ckpt = (str(tmp_path / p) for p in ("qss", "qsr", "qsc"))

    def updates(df):
        v = F.floor(F.col("x") * 100 + F.lit(0.5)).cast("long")
        return (
            df.filter(F.col("x").isNotNull())
            .select(
                F.col("tb").alias("bucket_ts"),
                sketches.qsketch_bucket(v).alias("bucket"),
            )
            .groupBy("bucket_ts", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    b1 = spark.range(0, 3000).selectExpr(
        "id % 3 AS tb", "CAST(id AS DOUBLE) / 11 AS x"
    )
    b2 = spark.range(3000, 7000).selectExpr(
        "2 + id % 2 AS tb", "CAST(id AS DOUBLE) / 11 AS x"
    )
    updates(b1).write.mode("append").parquet(src)
    q = INC.stream_rollup_maintenance(
        spark, src, roll, ckpt, ["bucket_ts", "bucket"],
        {"cnt": ("sum", "cnt")}, "bucket_ts long, bucket long, cnt long",
    )
    q.processAllAvailable()

    def live():
        return sorted(
            (r.bucket_ts, r.q, r.rank, r.bucket, r.estimate)
            for r in sketches.qsketch_sliding_from_counts(
                spark.read.parquet(roll).select("bucket_ts", "bucket", "cnt"),
                [0.5, 0.9], trailing=2, scale=100,
            ).collect()
        )

    def batch(df):
        return sorted(
            (r.bucket_ts, r.q, r.rank, r.bucket, r.estimate)
            for r in sketches.qsketch_sliding_quantiles(
                df, "tb", "x", [0.5, 0.9], trailing=2, scale=100
            ).collect()
        )

    assert live() == batch(b1)  # live read BETWEEN micro-batches
    updates(b2).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    assert live() == batch(b1.unionByName(b2))
