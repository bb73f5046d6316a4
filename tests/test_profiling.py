"""One-pass table profiling (operators/profiling.py): exact counts on
a hand-built frame with NULLs, the approximate path's error bound, and
the single-aggregation plan shape."""

from __future__ import annotations

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import profiling


def test_profile_exact_counts_with_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "a", None), (3, None, 2.5), (None, "b", 2.5)],
        "x long, s string, v double",
    )
    out = {r["col_name"]: r for r in profiling.profile_table(df).collect()}
    assert out["x"]["n_nulls"] == 1 and out["x"]["n_distinct"] == 3
    assert out["x"]["min_str"] == "1" and out["x"]["max_str"] == "3"
    assert out["s"]["n_nulls"] == 1 and out["s"]["n_distinct"] == 2
    assert out["s"]["min_str"] == "a" and out["s"]["max_str"] == "b"
    assert out["v"]["n_nulls"] == 1 and out["v"]["n_distinct"] == 2
    # min/max aggregate BEFORE the string cast: numeric, not lexicographic
    df2 = spark.createDataFrame([(9,), (10,)], "x long")
    o2 = {r["col_name"]: r for r in profiling.profile_table(df2).collect()}
    assert o2["x"]["max_str"] == "10"  # lexicographic would say "9"


def test_profile_single_job_plan(spark, tables):
    df = profiling.profile_table(tables["orders"], ["o_orderkey", "o_orderstatus"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    # one aggregation subtree over the scan, not one scan per column
    assert plan.count("FileScan") <= 1


def test_profile_approximate_within_bound(spark, tables):
    exact = {
        r["col_name"]: r["n_distinct"]
        for r in profiling.profile_table(tables["orders"], ["o_custkey"]).collect()
    }
    approx = {
        r["col_name"]: r["n_distinct"]
        for r in profiling.profile_table(
            tables["orders"], ["o_custkey"], approximate=True
        ).collect()
    }
    e, a = exact["o_custkey"], approx["o_custkey"]
    assert abs(a - e) <= 0.1 * e


def test_audit_constraints_hand_computed(spark):
    from pyspark.sql import functions as F

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.profiling import (
        audit_constraints,
    )

    child = spark.createDataFrame(
        [
            (1, 10, 5.0),
            (2, 10, -1.0),   # range violation
            (3, None, 2.0),  # null fk (not an orphan: nulls skip FK check)
            (3, 99, 3.0),    # duplicate id + orphan fk (99 not in parent)
            (None, 20, 1.0), # null id
        ],
        "id long, pid long, v double",
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    out = {
        r.constraint: r.n_violations
        for r in audit_constraints(
            child,
            not_null=["id"],
            unique=[["id"]],
            fks={"pid": (parent, "pk")},
            checks={"v_nonneg": F.col("v") >= 0},
        ).collect()
    }
    assert out["not_null(id)"] == 1
    assert out["unique(id)"] == 1      # one extra copy of id=3
    assert out["fk(pid)"] == 1         # pid=99 orphan; NULL pid skipped
    assert out["check(v_nonneg)"] == 1


def test_audit_constraints_clean_and_empty(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.profiling import (
        audit_constraints,
    )

    df = spark.createDataFrame([(1,), (2,)], "id long")
    out = audit_constraints(df, not_null=["id"], unique=[["id"]]).collect()
    assert all(r.n_violations == 0 for r in out)
    assert audit_constraints(df).count() == 0


def test_numeric_histogram_hand_computed(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.profiling import (
        numeric_histogram,
    )

    df = spark.createDataFrame(
        [(0.0,), (2.5,), (5.0,), (7.5,), (10.0,), (None,)], "x double"
    )
    got = {r.bin: (r.bin_lo, r.bin_hi, r.n_rows) for r in
           numeric_histogram(df, "x", n_bins=4).collect()}
    # bounds 0..10, width 2.5; 10.0 folds into last bin; NULL excluded
    assert got[0] == (0.0, 2.5, 1)
    assert got[1] == (2.5, 5.0, 1)
    assert got[2] == (5.0, 7.5, 1)
    assert got[3] == (7.5, 10.0, 2)
    # explicit bounds
    got2 = {r.bin: r.n_rows for r in
            numeric_histogram(df, "x", n_bins=2, lo=0.0, hi=20.0).collect()}
    assert got2 == {0: 4, 1: 1}


def test_winsorized_stats_hand_computed(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.profiling import (
        winsorized_stats,
    )

    # 1..10 with an outlier 1000; p10/p90 clipping
    vals = [float(v) for v in range(1, 11)] + [1000.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    r = winsorized_stats(df, "x", lo_p=0.1, hi_p=0.9).collect()[0]
    assert r.n_rows == 11
    # pct = (rank-1)/10: lo_cut = min value with pct>=0.1 → rank 2 → 2.0
    # hi_cut = max value with pct<=0.9 → rank 10 → 10.0
    assert r.lo_cut == 2.0 and r.hi_cut == 10.0
    clipped = [min(max(v, 2.0), 10.0) for v in vals]
    assert abs(r.winsorized_sum - sum(clipped)) < 1e-9
    assert abs(r.winsorized_avg - sum(clipped) / 11) < 1e-9


def test_equi_depth_bins_balanced(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.profiling import (
        equi_depth_bins,
    )
    from pyspark.sql import functions as F

    # heavily skewed values still give ~equal bin populations
    df = spark.range(1000).select((F.col("id") * F.col("id")).cast("double").alias("x"))
    rows = equi_depth_bins(df, "x", n_bins=4).collect()
    assert [r.bin for r in rows] == [0, 1, 2, 3]
    assert all(abs(r.n_rows - 250) <= 1 for r in rows)
    # bins tile the value range in order
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo


def test_column_correlations_hand_computed(spark):
    import math

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.profiling import (
        column_correlations,
    )

    # y = 2x exactly (corr 1); z anti-correlated with x; w constant
    rows = [(1.0, 2.0, 3.0, 5.0), (2.0, 4.0, 2.0, 5.0), (3.0, 6.0, 1.0, 5.0)]
    df = spark.createDataFrame(rows, "x double, y double, z double, w double")
    got = {(r.col_a, r.col_b): r for r in
           column_correlations(df, ["x", "y", "z", "w"]).collect()}
    assert len(got) == 6
    assert abs(got[("x", "y")].corr - 1.0) < 1e-12
    assert abs(got[("x", "z")].corr + 1.0) < 1e-12
    assert got[("x", "w")].corr is None  # constant side → NULL
    # NULL pairwise deletion: a NULL x row drops from (x,*) pairs only
    df2 = spark.createDataFrame(
        rows + [(None, 8.0, 9.0, 5.0)], "x double, y double, z double, w double"
    )
    got2 = {(r.col_a, r.col_b): r for r in
            column_correlations(df2, ["x", "y", "z"]).collect()}
    assert got2[("x", "y")].n == 3 and got2[("y", "z")].n == 4


def test_numeric_histogram_partial_and_degenerate_bounds(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.profiling import (
        numeric_histogram,
    )

    df = spark.createDataFrame([(3.2,), (5.0,), (9.9,)], "x double")
    # explicit lo honored even though hi is observed
    got = {r.bin: r for r in numeric_histogram(df, "x", n_bins=2, lo=0.0).collect()}
    assert got[0].bin_lo == 0.0  # NOT the observed min 3.2
    # value below an explicit lo clamps to bin 0, never negative
    df2 = spark.createDataFrame([(-5.0,), (5.0,)], "x double")
    bins = {r.bin for r in numeric_histogram(df2, "x", n_bins=4, lo=0.0, hi=8.0).collect()}
    assert bins == {0, 2}
    # constant column: all rows land in bin 0, no NULL bins
    df3 = spark.createDataFrame([(7.0,), (7.0,)], "x double")
    rows = numeric_histogram(df3, "x", n_bins=5).collect()
    assert len(rows) == 1 and rows[0].bin == 0 and rows[0].n_rows == 2


def test_audit_constraints_null_check_is_violation(spark):
    from pyspark.sql import functions as F

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.profiling import (
        audit_constraints,
    )

    df = spark.createDataFrame([(1.0,), (None,), (-2.0,)], "v double")
    out = {r.constraint: r.n_violations for r in
           audit_constraints(df, checks={"v_pos": F.col("v") > 0}).collect()}
    # NULL predicate result must count as a violation, not a pass
    assert out["check(v_pos)"] == 2


def test_table_diff_hand_computed(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.profiling import (
        table_diff,
    )

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None), (4, "d", 4.0)],
        "id long, name string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "B", 2.0), (3, "c", 3.0), (5, "e", 5.0)],
        "id long, name string, v double",
    )
    got = {r.id: (r.status, sorted(r.changed_cols)) for r in table_diff(old, new, "id").collect()}
    assert got[1] == ("unchanged", [])
    assert got[2] == ("changed", ["name"])
    assert got[3] == ("changed", ["v"])  # NULL -> 3.0 is a change
    assert got[4] == ("removed", [])
    assert got[5] == ("added", [])


def test_gini_hand_computed(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.profiling import (
        gini_coefficient,
    )

    # perfectly even → 0
    even = spark.createDataFrame([(5.0,)] * 4, "x double")
    assert abs(gini_coefficient(even, "x").collect()[0].gini) < 1e-12
    # one holder of everything among 4 → G = (n-1)/n = 0.75
    mono = spark.createDataFrame([(0.0,), (0.0,), (0.0,), (12.0,)], "x double")
    assert abs(gini_coefficient(mono, "x").collect()[0].gini - 0.75) < 1e-12
    # textbook small case [1,2,3,4]: G = 2*(1+4+9+16)/(4*10) - 5/4 = 0.25
    small = spark.createDataFrame([(1.0,), (2.0,), (3.0,), (4.0,)], "x double")
    assert abs(gini_coefficient(small, "x").collect()[0].gini - 0.25) < 1e-12


def test_market_concentration_hand_computed(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.profiling import (
        market_concentration,
    )

    rows = [
        ("m1", "a", 50.0), ("m1", "b", 50.0),        # duopoly → 0.5
        ("m2", "a", 90.0), ("m2", "b", 10.0),        # 0.81 + 0.01
        ("m3", "a", 7.0),                             # monopoly → 1.0
    ]
    df = spark.createDataFrame(rows, "market string, firm string, rev double")
    got = {r.market: (r.n_entities, r.hhi) for r in
           market_concentration(df, "market", "firm", "rev").collect()}
    assert got["m1"] == (2, 0.5)
    assert abs(got["m2"][1] - 0.82) < 1e-12
    assert got["m3"] == (1, 1.0)


def test_population_stability_hand_computed(spark):
    import math

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.profiling import (
        population_stability,
    )

    ref = spark.createDataFrame([(float(i),) for i in range(10)], "x double")
    # identical distribution → PSI ≈ 0
    same = population_stability(ref, ref, "x", n_bins=5).collect()
    tot = [r for r in same if r.bin == -1][0]
    assert abs(tot.psi_term) < 1e-9
    # shifted distribution: everything out of range clamps to top bin
    cur = spark.createDataFrame([(100.0,)] * 10, "x double")
    rows = {r.bin: r for r in population_stability(ref, cur, "x", n_bins=5).collect()}
    assert abs(rows[4].p_cur - (1.0 + 1e-6)) < 1e-9   # all mass in edge bin
    assert rows[-1].psi_term > 0.25  # "shifted" regime
    # per-bin terms sum to the total
    assert abs(sum(r.psi_term for b, r in rows.items() if b != -1) - rows[-1].psi_term) < 1e-9


def test_target_encode_hand_computed(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.features import (
        frequency_encode,
        target_encode,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0), ("b", None)],
        "cat string, y double",
    )
    mu = (1 + 3 + 10) / 3  # global label mean over non-null labels
    got = {(r.cat, r.y): r.cat_te for r in target_encode(df, "cat", "y", alpha=2.0).collect()}
    # a: (4 + 2µ)/(2+2); b: (10 + 2µ)/(1+2)
    assert abs(got[("a", 1.0)] - (4 + 2 * mu) / 4) < 1e-12
    assert abs(got[("b", 10.0)] - (10 + 2 * mu) / 3) < 1e-12
    # LOO: a row's own label excluded
    loo = {(r.cat, r.y): r.cat_te for r in
           target_encode(df, "cat", "y", alpha=2.0, loo=True).collect()}
    assert abs(loo[("a", 1.0)] - (3 + 2 * mu) / 3) < 1e-12   # (4-1 + 2µ)/(1+2)
    assert abs(loo[("b", 10.0)] - (0 + 2 * mu) / 2) < 1e-12  # singleton → prior-ish
    # NULL-label row gets the inclusive encoding in LOO mode
    assert abs(loo[("b", None)] - (10 + 2 * mu) / 3) < 1e-12
    # frequency encoding
    fr = {r.cat: r.cat_freq for r in frequency_encode(df, "cat").collect()}
    assert fr == {"a": 0.5, "b": 0.5}


def test_lift_table_hand_computed(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.features import (
        lift_table,
    )

    # scores 1..10; label = 1 for the top-4 scores, else 0
    rows = [(float(s), 1.0 if s > 6 else 0.0) for s in range(1, 11)]
    df = spark.createDataFrame(rows, "score double, y double")
    got = {r.bin: r for r in lift_table(df, "score", "y", n_bins=5).collect()}
    # bin 0 = scores {10, 9}: all positive, lift = 1.0/0.4 = 2.5
    assert got[0].n_rows == 2 and got[0].avg_label == 1.0
    assert abs(got[0].lift - 2.5) < 1e-12
    assert abs(got[0].cum_capture - 0.5) < 1e-12   # 2 of 4 positives
    assert abs(got[1].cum_capture - 1.0) < 1e-12   # all 4 captured by bin 1
    assert got[4].avg_label == 0.0


def test_target_encode_null_category_gets_group_stats(spark):
    """NULL is a real category: its rows must receive the NULL group's
    smoothed mean / frequency share, not NULL features (ADVICE round 5
    — features.py null-safe join)."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.features import (
        frequency_encode,
        target_encode,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 0.0), (None, 1.0), (None, 1.0)],
        "cat string, y double",
    )
    mu = 0.75
    te = {r.cat: r.cat_te for r in target_encode(df, "cat", "y", alpha=2.0).collect()}
    assert abs(te[None] - (2.0 + 2.0 * mu) / (2 + 2.0)) < 1e-12
    assert abs(te["a"] - (1.0 + 2.0 * mu) / (2 + 2.0)) < 1e-12
    fr = {r.cat: r.cat_freq for r in frequency_encode(df, "cat").collect()}
    assert fr[None] == 0.5 and fr["a"] == 0.5


def test_lift_table_tied_scores_deterministic_stats(spark):
    """Tied scores straddling a bin boundary: repeated runs produce
    identical bin statistics (hash-of-(score,label) tiebreak)."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.features import (
        lift_table,
    )

    # 10 rows, all score ties in the middle; labels differ across ties
    rows = [(5.0, float(i % 2)) for i in range(8)] + [(9.0, 1.0), (1.0, 0.0)]
    df = spark.createDataFrame(rows, "score double, y double").repartition(7)
    runs = [
        {(r.bin): (r.n_rows, r.avg_label) for r in
         lift_table(df, "score", "y", n_bins=5).collect()}
        for _ in range(3)
    ]
    assert runs[0] == runs[1] == runs[2]
    assert sum(n for n, _ in runs[0].values()) == 10


def test_hot_keys_hand_computed(spark):
    import pytest

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        profiling as PF,
    )

    rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1 + [(None,)] * 2
    df = spark.createDataFrame(rows, "k string")
    got = PF.hot_keys(df, "k", top=3).collect()
    # heaviest first; NULL counts as a key (skew source); 4 keys total
    assert [(r.key, r.n_rows) for r in got] == [("a", 6), ("b", 3), (None, 2)]
    assert got[0].share == pytest.approx(0.5)
    assert got[0].skew == pytest.approx(2.0)  # 0.5 share x 4 keys
    assert got[2].cum_share == pytest.approx(11 / 12)


def test_centroid_drift_detects_shift(spark):
    import numpy as np
    import pandas as pd

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        profiling as PRF,
    )

    rng = np.random.RandomState(8)
    base = rng.normal(0, 0.05, (400, 8)) + np.array([1.0] + [0.0] * 7)
    same = rng.normal(0, 0.05, (400, 8)) + np.array([1.0] + [0.0] * 7)
    moved = rng.normal(0, 0.05, (400, 8)) + np.array([0.0, 1.0] + [0.0] * 6)

    def df(X, g):
        return spark.createDataFrame(pd.DataFrame(
            {"g": g, "embedding": [x.tolist() for x in X]}))

    ref = df(base, "stable").unionByName(df(base, "shifted"))
    cur = df(same, "stable").unionByName(df(moved, "shifted"))
    got = {r.g: r for r in PRF.centroid_drift(ref, cur, "g").collect()}
    assert got["stable"].drift < 0.01
    assert got["shifted"].drift > 0.5  # near-orthogonal centroid move
    assert got["stable"].n_ref == 400 and got["stable"].n_cur == 400


def test_centroid_drift_matches_numpy(spark):
    import numpy as np
    import pandas as pd

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        profiling as PRF,
    )

    rng = np.random.RandomState(3)
    A, B = rng.normal(size=(100, 6)), rng.normal(size=(120, 6))
    ref = spark.createDataFrame(pd.DataFrame(
        {"g": "x", "embedding": [v.tolist() for v in A]}))
    cur = spark.createDataFrame(pd.DataFrame(
        {"g": "x", "embedding": [v.tolist() for v in B]}))
    r = PRF.centroid_drift(ref, cur, "g").collect()[0]
    ca, cb = A.mean(0), B.mean(0)
    want = float(ca @ cb / (np.linalg.norm(ca) * np.linalg.norm(cb)))
    assert abs(r.cos_sim - want) < 1e-9


def test_vocab_divergence_zero_for_identical_and_positive_for_shift(spark):
    import pandas as pd

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        profiling as PRF,
    )

    same = spark.createDataFrame(pd.DataFrame(
        {"text": ["the quick brown fox jumps"] * 50}))
    r = PRF.vocab_divergence(same, same).collect()[0]
    assert abs(r.js_divergence) < 1e-12
    assert r.n_ref_tokens == r.n_cur_tokens == 250
    other = spark.createDataFrame(pd.DataFrame(
        {"text": ["completely different vocabulary entirely here"] * 50}))
    d = PRF.vocab_divergence(same, other).collect()[0]
    import math

    assert 0.5 < d.js_divergence <= math.log(2) + 1e-9  # disjoint vocab -> ln 2


def test_vocab_divergence_matches_scipy_style_reference(spark):
    import hashlib
    import math

    import pandas as pd

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        profiling as PRF,
    )

    a_texts = ["alpha beta gamma", "beta gamma delta", "alpha alpha beta"]
    b_texts = ["gamma delta epsilon", "delta epsilon zeta"]
    ref = spark.createDataFrame(pd.DataFrame({"text": a_texts}))
    cur = spark.createDataFrame(pd.DataFrame({"text": b_texts}))
    got = PRF.vocab_divergence(ref, cur, n_buckets=64).collect()[0]

    def bucket_counts(texts):
        c = {}
        for t in texts:
            for tok in t.split():
                h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 64
                c[h] = c.get(h, 0) + 1
        return c

    ca, cb = bucket_counts(a_texts), bucket_counts(b_texts)
    ta, tb = sum(ca.values()), sum(cb.values())
    js = 0.0
    for k in set(ca) | set(cb):
        p, q = ca.get(k, 0) / ta, cb.get(k, 0) / tb
        m = (p + q) / 2
        if p > 0:
            js += p * math.log(p / m) / 2
        if q > 0:
            js += q * math.log(q / m) / 2
    assert abs(got.js_divergence - js) < 1e-9


def test_fd_check_g3(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.profiling import fd_check

    rows = [
        (1, "x", 10), (1, "x", 11),       # a=1 -> b consistent
        (2, "y", 12), (2, "y", 13), (2, "z", 14),  # a=2 violates: 2 rows y, 1 row z
        (None, "w", 15), (None, "w", 16),  # NULL lhs is one group, holds
    ]
    df = spark.createDataFrame(rows, "a int, b string, c int")
    out = {(r.lhs, r.rhs): r for r in fd_check(df, [("a", "b"), ("c", "b")]).collect()}
    ab = out[("a", "b")]
    assert (ab.n_rows, ab.n_groups, ab.violating_groups) == (7, 3, 1)
    assert ab.g3_rows == 1 and not ab.holds  # drop the single z row
    cb = out[("c", "b")]
    assert cb.holds and cb.g3_rows == 0  # c unique per row -> any FD holds


def test_woe_iv_hand_computed(spark):
    import math

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.features import woe_iv

    # bin A: 3 good, 1 bad; bin B: 1 good, 3 bad (symmetric separation)
    rows = [("A", 1)] * 3 + [("A", 0)] + [("B", 1)] + [("B", 0)] * 3
    df = spark.createDataFrame(rows, "bin string, label int")
    out = {r.bin: r for r in woe_iv(df, "bin", "label", smooth=0.5).collect()}
    tg = tb = 3.5 + 1.5
    wa = math.log((3.5 / tg) / (1.5 / tb))
    assert abs(out["A"].woe - wa) < 1e-12
    assert abs(out["B"].woe + wa) < 1e-12  # symmetric
    assert abs(out["A"].iv_term - (3.5 / tg - 1.5 / tb) * wa) < 1e-12
    assert out["A"].n_good == 3 and out["A"].n_bad == 1
    # empty-class bin stays finite under smoothing
    rows2 = rows + [("C", 1)] * 4
    out2 = {r.bin: r for r in woe_iv(spark.createDataFrame(rows2, "bin string, label int"), "bin", "label").collect()}
    assert math.isfinite(out2["C"].woe) and out2["C"].n_bad == 0
