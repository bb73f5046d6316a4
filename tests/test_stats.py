"""Known-answer tests for the hypothesis-testing family
(operators/stats.py): hand-computable fixtures, no table deps."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import stats as S


def test_ks_identical_samples_is_zero(spark):
    rows = [(float(v), g) for v in (1, 2, 3, 4, 5) for g in ("a", "b")]
    df = spark.createDataFrame(rows, "v double, g string")
    r = S.ks_test(df, "v", "g", "a", "b").collect()[0]
    assert r.n_a == 5 and r.n_b == 5
    assert r.d_stat == 0.0
    assert r.p_approx == 1.0


def test_ks_disjoint_samples_is_one(spark):
    rows = [(float(v), "a") for v in (1, 2, 3)] + [
        (float(v), "b") for v in (10, 11, 12)
    ]
    df = spark.createDataFrame(rows, "v double, g string")
    r = S.ks_test(df, "v", "g", "a", "b").collect()[0]
    assert r.d_stat == 1.0
    # z = 1 * sqrt(9/6); p = 2*exp(-2*z^2) = 2*exp(-3)
    assert abs(r.ks_z - math.sqrt(1.5)) < 1e-12
    assert abs(r.p_approx - 2.0 * math.exp(-3.0)) < 1e-12


def test_ks_ignores_other_groups(spark):
    rows = [(1.0, "a"), (2.0, "b"), (9.0, "zzz")]
    df = spark.createDataFrame(rows, "v double, g string")
    r = S.ks_test(df, "v", "g", "a", "b").collect()[0]
    assert r.n_a == 1 and r.n_b == 1 and r.d_stat == 1.0


def test_chi2_independent_table_is_zero(spark):
    # perfectly proportional 2x2: (a1,b1)=10,(a1,b2)=20,(a2,b1)=30,(a2,b2)=60
    rows = (
        [("a1", "b1")] * 10
        + [("a1", "b2")] * 20
        + [("a2", "b1")] * 30
        + [("a2", "b2")] * 60
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = S.chi2_independence(df, "a", "b").collect()[0]
    assert r.n == 120 and r.dof == 1
    assert abs(r.chi2) < 1e-9
    assert abs(r.cramers_v) < 1e-9


def test_chi2_known_value(spark):
    # 2x2 table [[10, 20], [20, 10]]: chi2 = n*(ad-bc)^2/((a+b)(c+d)(a+c)(b+d))
    rows = (
        [("x", "u")] * 10
        + [("x", "v")] * 20
        + [("y", "u")] * 20
        + [("y", "v")] * 10
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = S.chi2_independence(df, "a", "b").collect()[0]
    expect = 60 * (10 * 10 - 20 * 20) ** 2 / (30 * 30 * 30 * 30)
    assert abs(r.chi2 - expect) < 1e-9
    assert abs(r.cramers_v - math.sqrt(expect / 60)) < 1e-9


def test_benford_uniform_digits(spark):
    # one value per leading digit, mixed magnitudes; zero/negatives dropped
    vals = [1.5, 23.0, 310.0, 4.2, 55.0, 6000.0, 7.0, 0.85, 9.9, 0.0, -3.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    rows = S.benford_digits(df, "x").collect()
    assert [r.digit for r in rows] == list(range(1, 10))
    for r in rows:
        assert r.n == 1
        assert abs(r.obs_share - 1.0 / 9.0) < 1e-12
        assert abs(r.exp_share - math.log10(1.0 + 1.0 / r.digit)) < 1e-12


def test_two_proportion_known_z(spark):
    # arm a: 4 units, 3 convert; arm b: 4 units, 1 converts.
    rows = []
    for u in range(4):
        rows.append((f"a{u}", "a", u < 3))
        rows.append((f"b{u}", "b", u < 1))
    # repeat rows to prove per-unit collapse (events not independent)
    df = spark.createDataFrame(rows * 3, "unit string, arm string, conv boolean")
    r = S.two_proportion_ztest(df, "unit", "arm", "conv").collect()[0]
    assert (r.n_a, r.x_a, r.n_b, r.x_b) == (4, 3, 4, 1)
    pp = 0.5
    z = (0.75 - 0.25) / math.sqrt(pp * (1 - pp) * (1 / 4 + 1 / 4))
    assert abs(r.z - z) < 1e-12
    assert abs(r.lift - 0.5) < 1e-12


def test_two_proportion_zero_variance_is_null(spark):
    rows = [("u1", "a", True), ("u2", "b", True)]
    df = spark.createDataFrame(rows, "unit string, arm string, conv boolean")
    r = S.two_proportion_ztest(df, "unit", "arm", "conv").collect()[0]
    assert r.z is None and r.lift == 0.0


def test_mann_kendall_monotone_and_flat(spark):
    import datetime as dt

    up = [(dt.date(2024, 1, i + 1), i * 10) for i in range(8)]
    df = spark.createDataFrame(up, "day date, y long")
    r = S.mann_kendall(df).collect()[0]
    # strictly increasing: S = C(8,2) = 28, z > 0
    assert (r.n, r.s) == (8, 28)
    assert abs(r.var_s - (8 * 7 * 21) / 18.0) < 1e-9
    assert abs(r.z - 27 / math.sqrt(r.var_s)) < 1e-12
    flat = spark.createDataFrame(
        [(dt.date(2024, 1, i + 1), 5) for i in range(6)], "day date, y long"
    )
    rf = S.mann_kendall(flat).collect()[0]
    # all ties: S = 0 and the tie correction kills the variance -> z NULL
    assert rf.s == 0 and rf.var_s == 0.0 and rf.z is None


def test_theil_sen_resists_outlier(spark):
    import datetime as dt

    # y = 3x + 2 with one wild outlier
    rows = [(dt.date(2024, 1, i + 1), 3 * i + 2) for i in range(11)]
    rows[5] = (dt.date(2024, 1, 6), 1000)
    df = spark.createDataFrame(rows, "day date, y long")
    r = S.theil_sen(df).collect()[0]
    assert r.n == 11 and r.n_pairs == 55
    assert abs(r.slope - 3.0) < 1e-9  # median slope untouched by the spike
    assert abs(r.intercept - 2.0) < 1e-9


def test_ks_one_empty_side_is_null(spark):
    df = spark.createDataFrame([(1.0, "a"), (2.0, "a")], "v double, g string")
    r = S.ks_test(df, "v", "g", "a", "b").collect()[0]
    assert r.n_b == 0 and r.d_stat is None


def test_chi2_single_category_null_v(spark):
    df = spark.createDataFrame([("x", "u")] * 5, "a string, b string")
    r = S.chi2_independence(df, "a", "b").collect()[0]
    assert r.dof == 0 and abs(r.chi2) < 1e-12 and r.cramers_v is None


def test_welch_known_value(spark):
    rows = [(float(v), "a") for v in (1, 2, 3, 4)] + [
        (float(v), "b") for v in (2, 4, 6, 8, 10)
    ]
    df = spark.createDataFrame(rows, "v double, g string")
    r = S.welch_ttest(df, "v", "g", "a", "b").collect()[0]
    # hand: ma=2.5 va=5/3; mb=6 vb=10; se2=5/12+2=2.41666...
    assert (r.n_a, r.n_b) == (4, 5)
    assert abs(r.mean_a - 2.5) < 1e-12 and abs(r.var_a - 5 / 3) < 1e-12
    assert abs(r.mean_b - 6.0) < 1e-12 and abs(r.var_b - 10.0) < 1e-12
    se2 = 5 / 3 / 4 + 10.0 / 5
    t = (2.5 - 6.0) / math.sqrt(se2)
    dof = se2 * se2 / ((5 / 3 / 4) ** 2 / 3 + (10.0 / 5) ** 2 / 4)
    assert abs(r.t - t) < 1e-12 and abs(r.dof - dof) < 1e-9
    # single-observation side: undefined, NULL not error
    tiny = spark.createDataFrame([(1.0, "a"), (2.0, "b"), (3.0, "b")], "v double, g string")
    rt = S.welch_ttest(tiny, "v", "g", "a", "b").collect()[0]
    assert rt.var_a is None and rt.t is None


def test_anova_known_and_two_group_is_tsq(spark):
    rows = [(float(v), "a") for v in (1, 2, 3)] + [
        (float(v), "b") for v in (4, 5, 6)
    ] + [(float(v), "c") for v in (7, 8, 9)]
    df = spark.createDataFrame(rows, "v double, g string")
    r = S.anova_oneway(df, "v", "g").collect()[0]
    # SS_b = 3*((2-5)^2+(5-5)^2+(8-5)^2)=54; SS_w = 3 groups * 2 = 6
    assert (r.n, r.k) == (9, 3)
    assert abs(r.ss_between - 54.0) < 1e-9 and abs(r.ss_within - 6.0) < 1e-9
    assert abs(r.f_stat - (54 / 2) / (6 / 6)) < 1e-9
    assert abs(r.eta_sq - 54 / 60) < 1e-12
    # two equal-size groups with equal variance: F == t^2 (Student case)
    two = spark.createDataFrame(
        [(float(v), "a") for v in (1, 2, 3)] + [(float(v), "b") for v in (5, 6, 7)],
        "v double, g string",
    )
    fa = S.anova_oneway(two, "v", "g").collect()[0]
    tt = S.welch_ttest(two, "v", "g", "a", "b").collect()[0]
    assert abs(fa.f_stat - tt.t**2) < 1e-9
    # constant values: zero within AND between -> NULL F
    const = spark.createDataFrame([(5.0, "a"), (5.0, "b")], "v double, g string")
    assert S.anova_oneway(const, "v", "g").collect()[0].f_stat is None


def test_ks_matrix_agrees_with_pairwise(spark):
    rows = (
        [(float(v), "a") for v in (1, 2, 3, 4, 5)]
        + [(float(v), "b") for v in (1, 2, 3, 4, 5)]
        + [(float(v), "c") for v in (10, 11, 12)]
    )
    df = spark.createDataFrame(rows, "v double, g string")
    m = {
        (r.group_a, r.group_b): r
        for r in S.ks_matrix(df, "v", "g").collect()
    }
    assert set(m) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert m[("a", "b")].d_stat == 0.0  # identical samples
    assert m[("a", "c")].d_stat == 1.0  # disjoint supports
    # cross-check one pair against the two-sample operator
    two = S.ks_test(df, "v", "g", "b", "c").collect()[0]
    bc = m[("b", "c")]
    assert (bc.n_a, bc.n_b, bc.d_stat, bc.ks_z) == (
        two.n_a, two.n_b, two.d_stat, two.ks_z,
    )


def test_theil_sen_grouped_matches_ungrouped(spark):
    import datetime as dt

    rows = []
    for i in range(9):
        rows.append(("a", dt.date(2024, 1, i + 1), 3 * i + 2))
        rows.append(("b", dt.date(2024, 1, i + 1), -2 * i + 50))
    rows.append(("c", dt.date(2024, 1, 1), 7))  # single day: dropped
    df = spark.createDataFrame(rows, "g string, day date, y long")
    out = {r.group: r for r in S.theil_sen_grouped(df, "g").collect()}
    assert set(out) == {"a", "b"}
    assert abs(out["a"].slope - 3.0) < 1e-9 and abs(out["a"].intercept - 2.0) < 1e-9
    assert abs(out["b"].slope + 2.0) < 1e-9 and abs(out["b"].intercept - 50.0) < 1e-9
    # per-group result equals the ungrouped operator on that slice
    solo = S.theil_sen(df.filter("g = 'a'").select("day", "y")).collect()[0]
    assert (solo.slope, solo.intercept) == (out["a"].slope, out["a"].intercept)


def test_proportion_sample_size_known(spark):
    # base rate 0.2 from 10 units (2 convert), detect +50% -> p2 = 0.3
    rows = [(f"u{i}", i < 2) for i in range(10)]
    df = spark.createDataFrame(rows, "unit string, conv boolean")
    r = S.proportion_sample_size(df, "unit", "conv", [0.5, 100.0]).collect()
    by = {x.rel_lift: x for x in r}
    assert by[0.5].n_units == 10 and abs(by[0.5].base_rate - 0.2) < 1e-12
    p1, p2, pbar = 0.2, 0.3, 0.25
    num = 1.959964 * math.sqrt(2 * pbar * 0.75) + 0.841621 * math.sqrt(
        p1 * 0.8 + p2 * 0.7
    )
    assert by[0.5].n_per_arm == math.ceil(num * num / 0.01)
    # +100x lift pushes p2 past 1: undefined
    assert by[100.0].n_per_arm is None


def test_cuped_reduces_variance_preserves_mean(spark):
    import random

    rnd = random.Random(3)
    rows = []
    for i in range(200):
        x = rnd.gauss(50, 10)
        y = 0.8 * x + rnd.gauss(0, 3)  # strongly covariate-explained
        rows.append((i, y, x))
    df = spark.createDataFrame(rows, "u long, y double, x double")
    out = S.cuped_adjust(df, "u", "y", "x").collect()
    import statistics

    ys = [r.y for r in out]
    ya = [r.y_adj for r in out]
    assert abs(statistics.mean(ys) - statistics.mean(ya)) < 1e-9  # mean preserved
    vr = out[0].var_reduction
    assert vr > 0.8  # rho^2 large by construction
    # realized variance drop matches 1 - rho^2 (population variance identity)
    pv = lambda v: statistics.pvariance(v)  # noqa: E731
    assert abs(pv(ya) / pv(ys) - (1 - vr)) < 1e-9
    # zero-variance covariate: theta NULL, y unchanged
    flat = spark.createDataFrame([(1, 5.0, 7.0), (2, 9.0, 7.0)], "u long, y double, x double")
    fo = S.cuped_adjust(flat, "u", "y", "x").collect()
    assert all(r.theta is None and r.y_adj == r.y for r in fo)


def test_mann_whitney_known(spark):
    # classic small example: a = {1,2,3}, b = {4,5,6}: U_a = 0
    rows = [(float(v), "a") for v in (1, 2, 3)] + [
        (float(v), "b") for v in (4, 5, 6)
    ]
    df = spark.createDataFrame(rows, "v double, g string")
    r = S.mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
    assert (r.n_a, r.n_b, r.u_a) == (3, 3, 0.0)
    # no ties: var = 3*3*7/12; z = (0-4.5)/sqrt(var)
    assert abs(r.z - (-4.5) / math.sqrt(9 * 7 / 12)) < 1e-12
    # heavy ties: all equal -> U at its mean, variance 0 -> NULL z
    tied = spark.createDataFrame(
        [(5.0, "a")] * 3 + [(5.0, "b")] * 3, "v double, g string"
    )
    rt = S.mann_whitney_u(tied, "v", "g", "a", "b").collect()[0]
    assert rt.u_a == 4.5 and rt.z is None


def test_spearman_monotone_and_ties(spark):
    # perfect monotone (nonlinear) relation: rho = 1 exactly
    rows = [(float(i), float(i**3)) for i in range(1, 20)]
    df = spark.createDataFrame(rows, "x double, y double")
    r = S.spearman_corr(df, "x", "y").collect()[0]
    assert r.n == 19 and abs(r.rho - 1.0) < 1e-12
    # reversed: -1; constant y: NULL
    df2 = spark.createDataFrame([(x, -y) for x, y in rows], "x double, y double")
    assert abs(S.spearman_corr(df2, "x", "y").collect()[0].rho + 1.0) < 1e-12
    flat = spark.createDataFrame([(float(i), 7.0) for i in range(5)], "x double, y double")
    assert S.spearman_corr(flat, "x", "y").collect()[0].rho is None
    # hand-computed tie case: x=(1,2,2,3) midranks (1,2.5,2.5,4),
    # y=(1,3,2,4) -> Pearson over ranks = 4.5/sqrt(4.5*5)
    tie = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 3.0), (2.0, 2.0), (3.0, 4.0)], "x double, y double"
    )
    rt = S.spearman_corr(tie, "x", "y").collect()[0]
    assert abs(rt.rho - 4.5 / math.sqrt(22.5)) < 1e-12


def test_kaplan_meier_textbook(spark):
    # classic worked example: events at t=1,3,4; censored at t=2,5
    rows = [(1.0, 1), (2.0, 0), (3.0, 1), (4.0, 1), (5.0, 0)]
    df = spark.createDataFrame(rows, "t double, event int")
    out = {r.t: r for r in S.kaplan_meier(df).collect()}
    # t=1: n=5, d=1 -> S=4/5; t=2: censored only, S unchanged;
    # t=3: n=3, d=1 -> S=4/5*2/3; t=4: n=2, d=1 -> *1/2; t=5: censored
    assert out[1.0].n_risk == 5 and abs(out[1.0].survival - 0.8) < 1e-12
    assert out[2.0].d == 0 and abs(out[2.0].survival - 0.8) < 1e-12
    assert abs(out[3.0].survival - 0.8 * 2 / 3) < 1e-12
    assert abs(out[4.0].survival - 0.8 * 2 / 3 * 0.5) < 1e-12
    assert out[5.0].censored == 1 and abs(out[5.0].survival - out[4.0].survival) < 1e-12
    # everyone dies at the last event time: S hits exactly 0
    rows2 = [(1.0, 1), (2.0, 1), (2.0, 1)]
    out2 = {r.t: r for r in S.kaplan_meier(
        spark.createDataFrame(rows2, "t double, event int")
    ).collect()}
    assert out2[2.0].survival == 0.0
    # all censored: flat S = 1
    cens = spark.createDataFrame([(1.0, 0), (2.0, 0)], "t double, event int")
    assert all(r.survival == 1.0 for r in S.kaplan_meier(cens).collect())


def test_logrank_identical_and_separated(spark):
    # identical arms: O == E exactly, chi2 ~ 0
    rows = []
    for g in ("a", "b"):
        for t in (1.0, 2.0, 3.0, 4.0):
            rows.append((t, 1, g))
    df = spark.createDataFrame(rows, "t double, event int, g string")
    r = S.logrank_test(df).collect()[0]
    assert (r.n_a, r.n_b) == (4, 4)
    assert abs(r.observed_a - r.expected_a) < 1e-12
    assert r.chi2 is not None and r.chi2 < 1e-20
    # fully separated arms (all a-events before any b-event): large chi2
    rows2 = [(float(t), 1, "a") for t in (1, 2, 3, 4, 5)] + [
        (float(t), 1, "b") for t in (10, 11, 12, 13, 14)
    ]
    r2 = S.logrank_test(
        spark.createDataFrame(rows2, "t double, event int, g string")
    ).collect()[0]
    assert r2.chi2 > 5.0
    # no events at all (everything censored): zero variance -> NULL
    cens = spark.createDataFrame(
        [(1.0, 0, "a"), (2.0, 0, "b")], "t double, event int, g string"
    )
    assert S.logrank_test(cens).collect()[0].chi2 is None


def test_kaplan_meier_grouped_matches_ungrouped_slices(spark):
    rows = [
        (1.0, 1, "a"), (2.0, 0, "a"), (3.0, 1, "a"),
        (1.0, 1, "b"), (4.0, 1, "b"), (5.0, 0, "b"),
    ]
    df = spark.createDataFrame(rows, "t double, event int, g string")
    grouped = {
        (r.group, r.t): (r.n_risk, r.survival)
        for r in S.kaplan_meier_grouped(df, "g").collect()
    }
    for g in ("a", "b"):
        solo = {
            r.t: (r.n_risk, r.survival)
            for r in S.kaplan_meier(df.filter(F.col("g") == g).select("t", "event")).collect()
        }
        for t, v in solo.items():
            assert grouped[(g, t)] == v, (g, t)


def test_null_values_excluded_across_rank_family(spark):
    """r9 ADVICE: NULL measurements must not step CDFs / consume ranks /
    enter risk sets — every rank/CDF operator matches its NULL-free
    slice exactly."""
    base = [(1.0, "a"), (2.0, "a"), (3.0, "b"), (4.0, "b")]
    withnull = base + [(None, "a"), (None, "b")]
    clean = spark.createDataFrame(base, "v double, g string")
    dirty = spark.createDataFrame(withnull, "v double, g string")

    for fn in (S.ks_test, S.mann_whitney_u):
        rc = fn(clean, "v", "g", "a", "b").collect()[0]
        rd = fn(dirty, "v", "g", "a", "b").collect()[0]
        assert rc == rd, fn.__name__

    mc = {(r.group_a, r.group_b): r.d_stat for r in S.ks_matrix(clean, "v", "g").collect()}
    md = {(r.group_a, r.group_b): r.d_stat for r in S.ks_matrix(dirty, "v", "g").collect()}
    assert mc == md


def test_spearman_pairwise_complete_ranks(spark):
    """Ranks are computed WITHIN complete pairs: a row whose partner is
    NULL must not shift the other column's ranks (the conventional
    pairwise-complete Spearman)."""
    complete = [(1.0, 10.0), (2.0, 30.0), (3.0, 20.0)]
    dirty = complete + [(0.5, None), (None, 100.0)]
    rc = S.spearman_corr(
        spark.createDataFrame(complete, "x double, y double"), "x", "y"
    ).collect()[0]
    rd = S.spearman_corr(
        spark.createDataFrame(dirty, "x double, y double"), "x", "y"
    ).collect()[0]
    assert rd.n == 3
    assert rd.rho == rc.rho  # identical doubles: same ranks, same sums


def test_kaplan_meier_null_durations_excluded(spark):
    base = [(1.0, 1), (2.0, 0), (3.0, 1)]
    dirty = base + [(None, 1), (None, 0)]
    c = S.kaplan_meier(spark.createDataFrame(base, "t double, event int")).collect()
    d = S.kaplan_meier(spark.createDataFrame(dirty, "t double, event int")).collect()
    assert c == d
    gc = S.kaplan_meier_grouped(
        spark.createDataFrame([(t, e, "a") for t, e in base], "t double, event int, g string"),
        "g",
    ).collect()
    gd = S.kaplan_meier_grouped(
        spark.createDataFrame([(t, e, "a") for t, e in dirty], "t double, event int, g string"),
        "g",
    ).collect()
    assert gc == gd
    rows_a = [(t, e, "a") for t, e in base] + [(None, 1, "a")]
    rows_b = [(10.0, 1, "b"), (11.0, 0, "b"), (None, 0, "b")]
    lr_dirty = S.logrank_test(
        spark.createDataFrame(rows_a + rows_b, "t double, event int, g string")
    ).collect()[0]
    lr_clean = S.logrank_test(
        spark.createDataFrame(
            [r for r in rows_a + rows_b if r[0] is not None],
            "t double, event int, g string",
        )
    ).collect()[0]
    assert lr_dirty == lr_clean


def test_high_cardinality_path_bit_identical(spark):
    """r9 verdict #1: the distributed-prefix rank path must agree with
    the windowed path — bit-identical for the integer-derived
    statistics, last-ulp for the KM float survival."""
    import random

    rng = random.Random(7)
    rows = [
        (round(rng.uniform(0, 1000), 3), "a" if rng.random() < 0.5 else "b")
        for _ in range(2000)
    ]
    df = spark.createDataFrame(rows, "v double, g string").repartition(8)

    for fn in (S.ks_test, S.mann_whitney_u):
        lo = fn(df, "v", "g", "a", "b", high_cardinality=False).collect()[0]
        hi = fn(df, "v", "g", "a", "b", high_cardinality=True).collect()[0]
        assert lo == hi, (fn.__name__, lo, hi)

    xy = spark.createDataFrame(
        [(v, v * 0.5 + (1 if g == "a" else -1)) for v, g in rows],
        "x double, y double",
    ).repartition(8)
    lo = S.spearman_corr(xy, "x", "y", high_cardinality=False).collect()[0]
    hi = S.spearman_corr(xy, "x", "y", high_cardinality=True).collect()[0]
    assert lo.n == hi.n and abs(lo.rho - hi.rho) < 1e-12

    surv = spark.createDataFrame(
        [(float(int(v * 1000) + 1), 1 if g == "a" else 0, "a" if v < 500 else "b")
         for v, g in rows],
        "t double, event int, g string",
    ).repartition(8)
    km_lo = S.kaplan_meier(surv, high_cardinality=False).collect()
    km_hi = S.kaplan_meier(surv, high_cardinality=True).collect()
    assert len(km_lo) == len(km_hi)
    lo_map = {r.t: r for r in km_lo}
    for r in km_hi:
        o = lo_map[r.t]
        assert (r.n_risk, r.d, r.censored) == (o.n_risk, o.d, o.censored)
        assert abs(r.survival - o.survival) < 1e-12
        assert r.hazard == o.hazard
    lr_lo = S.logrank_test(surv, high_cardinality=False).collect()[0]
    lr_hi = S.logrank_test(surv, high_cardinality=True).collect()[0]
    assert (lr_lo.n_a, lr_lo.n_b, lr_lo.observed_a) == (lr_hi.n_a, lr_hi.n_b, lr_hi.observed_a)
    assert abs(lr_lo.chi2 - lr_hi.chi2) < 1e-9


def test_concordance_index_matches_bucketized_brute_force(spark):
    """The reported value is the EXACT Harrell C of the bucketized
    data: brute force over the same (time-bucket, score-bucket) pairs
    must match integer for integer; a perfect model scores ~1 and an
    anti-perfect model ~0."""
    import random

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        sketches as SK,
    )

    rng = random.Random(31)
    rows = [
        (float(rng.randint(1, 500)), rng.randint(0, 1), float(rng.randint(1, 400)))
        for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "t double, event int, score double")
    got = S.concordance_index(df, "t", "event", "score", m=5).collect()[0]

    # brute force on the SAME buckets
    b = df.select(
        SK.qsketch_bucket(F.col("t").cast("long"), 5).alias("tb"),
        SK.qsketch_bucket(F.col("score").cast("long"), 5).alias("sb"),
        F.col("event").alias("e"),
    ).collect()
    conc = tied = disc = 0
    for i in b:
        if i.e != 1:
            continue
        for j in b:
            if j.tb > i.tb:
                if i.sb > j.sb:
                    conc += 1
                elif i.sb == j.sb:
                    tied += 1
                else:
                    disc += 1
    assert (got.concordant, got.tied, got.discordant) == (conc, tied, disc)
    assert got.n_pairs == conc + tied + disc
    assert abs(got.cindex - (conc + 0.5 * tied) / got.n_pairs) < 1e-12

    # a perfect risk model (score = -t, bucket-exact mirror of the
    # time axis): every comparable pair concordant -> C = 1 exactly
    perf = spark.createDataFrame(
        [(t, e, -t) for t, e, _ in rows], "t double, event int, score double"
    )
    cp = S.concordance_index(perf, "t", "event", "score", m=5).collect()[0]
    assert cp.cindex == 1.0 and cp.tied == 0 and cp.discordant == 0
    # the inverted model is all-discordant -> C = 0 exactly
    anti = spark.createDataFrame(
        [(t, e, t) for t, e, _ in rows], "t double, event int, score double"
    )
    ca = S.concordance_index(anti, "t", "event", "score", m=5).collect()[0]
    assert ca.cindex == 0.0 and ca.concordant == 0
    # an affine score with poor relative conditioning (10000 - t lives
    # in a handful of relative-width buckets) degrades ONLY to ties,
    # never to discordance — the documented quantization behavior
    aff = spark.createDataFrame(
        [(t, e, 10000.0 - t) for t, e, _ in rows], "t double, event int, score double"
    )
    cf = S.concordance_index(aff, "t", "event", "score", m=5).collect()[0]
    assert cf.discordant == 0 and 0.5 < cf.cindex <= 1.0
    # no comparable pairs -> NULL
    none = spark.createDataFrame([(1.0, 0, 1.0), (2.0, 0, 2.0)], "t double, event int, score double")
    assert S.concordance_index(none, "t", "event", "score").collect()[0].cindex is None


def test_poisson_bootstrap_ci_deterministic_and_exact(spark):
    """The replicate weights are hash-derived, so the whole estimate is
    a deterministic function of the input: a Python replica using the
    same md5 hash and the same Poisson(1) CDF chain reproduces the CI
    bounds exactly, and repartitioning changes nothing."""
    import hashlib

    rows = [(f"g{(i % 3)}", i, float(i % 17) + (3.0 if i % 3 == 0 else 0.0))
            for i in range(600)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    got = {
        r.g: (r.n, r.mean, r.lo, r.hi)
        for r in S.poisson_bootstrap_ci(df, ["g"], "v", "id", b=32).collect()
    }
    got2 = {
        r.g: (r.n, r.mean, r.lo, r.hi)
        for r in S.poisson_bootstrap_ci(
            df.repartition(13), ["g"], "v", "id", b=32
        ).collect()
    }
    for g in got:
        assert got[g][0] == got2[g][0]
        # float partial sums re-associate across partitionings: the
        # ALS tolerance, not bit equality
        for a, c in zip(got[g][1:], got2[g][1:]):
            assert abs(a - c) < 1e-9, g

    def u(ident, r):
        h = int(hashlib.md5(f"{ident}:{r}:0".encode()).hexdigest()[:15], 16)
        return (h % 1_000_000 + 1) / 1_000_001.0

    def w(ident, r):
        x = u(ident, r)
        for k, c in enumerate(S.POISSON1_CDF):
            if x < c:
                return float(k)
        return float(len(S.POISSON1_CDF))

    import numpy as np

    for g in ("g0", "g1", "g2"):
        grp = [(i, v) for gg, i, v in rows if gg == g]
        means = []
        for r in range(32):
            ws = np.array([w(i, r) for i, _ in grp])
            vs = np.array([v for _, v in grp])
            means.append((ws * vs).sum() / ws.sum() if ws.sum() > 0 else None)
        ms = np.array([m for m in means if m is not None])
        n, mean, lo, hi = got[g]
        assert n == len(grp)
        assert abs(mean - np.mean([v for _, v in grp])) < 1e-12
        # Spark's exact `percentile` (linear interpolation) replica
        def pct(a, q):
            a = np.sort(a)
            pos = (len(a) - 1) * q
            f = int(np.floor(pos))
            c = min(f + 1, len(a) - 1)
            return a[f] + (pos - f) * (a[c] - a[f])
        assert abs(lo - pct(ms, 0.025)) < 1e-9, g
        assert abs(hi - pct(ms, 0.975)) < 1e-9, g
        assert lo <= mean <= hi
    # wider data -> wider interval than a tight constant group
    tight = spark.createDataFrame(
        [("t", i, 5.0) for i in range(300)], "g string, id long, v double"
    )
    rt = S.poisson_bootstrap_ci(tight, ["g"], "v", "id", b=32).collect()[0]
    assert abs(rt.hi - rt.lo) < 1e-12  # constant column: zero-width CI


def test_poisson_bootstrap_lift_detects_and_covers(spark):
    """A planted +2.0 lift: the CI covers it and excludes 0; identical
    arms: the CI straddles 0. Deterministic across partitionings."""
    import random

    rng = random.Random(43)
    rows = [(i, "a" if i % 2 == 0 else "b",
             5.0 + (2.0 if i % 2 == 0 else 0.0) + rng.gauss(0, 1))
            for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, arm string, v double")
    r = S.poisson_bootstrap_lift(df, "arm", "v", "id", "a", "b", b=32).collect()[0]
    assert r.n_a == 1000 and r.n_b == 1000
    assert abs(r.lift - (r.mean_a - r.mean_b)) < 1e-12
    assert r.lo <= r.lift <= r.hi
    assert r.lo < 2.0 < r.hi or abs(r.lift - 2.0) < 0.2  # covers the truth
    assert r.lo > 0.0  # detects the effect
    r2 = S.poisson_bootstrap_lift(
        df.repartition(9), "arm", "v", "id", "a", "b", b=32
    ).collect()[0]
    for a, c in ((r.lo, r2.lo), (r.hi, r2.hi), (r.lift, r2.lift)):
        assert abs(a - c) < 1e-9  # float-sum re-association tolerance
    # identical arms: 0 inside the interval
    null = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b", 5.0 + rng.gauss(0, 1)) for i in range(2000)],
        "id long, arm string, v double",
    )
    rn = S.poisson_bootstrap_lift(null, "arm", "v", "id", "a", "b", b=32).collect()[0]
    assert rn.lo < 0.0 < rn.hi


def test_bootstrap_ci_stream_maintained_live(spark, tmp_path):
    """Live experiment monitoring by composition: bootstrap partial
    sums are plain sums, so the generic streaming rollup maintains the
    bootstrap state with ZERO bootstrap-specific streaming code —
    CIs read BETWEEN micro-batches equal the batch computation over
    the data seen so far (the sliding-HLL/quantile pattern)."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        incremental as INC,
    )

    src, roll, ckpt = (str(tmp_path / p) for p in ("bs", "br", "bc"))
    B = 16
    schema = "g string, n long, sv double, " + ", ".join(
        f"wv{r} double, w{r} double" for r in range(B)
    )

    def batch_rows(lo, hi):
        return spark.createDataFrame(
            [(i, "g" + str(i % 2), float(i % 23)) for i in range(lo, hi)],
            "id long, g string, v double",
        )

    b1, b2 = batch_rows(0, 1500), batch_rows(1500, 4000)
    S.bootstrap_updates(b1, ["g"], "v", "id", b=B).write.mode("append").parquet(src)
    q = INC.stream_rollup_maintenance(
        spark, src, roll, ckpt, ["g"], S.bootstrap_measures(B), schema
    )
    q.processAllAvailable()

    def live():
        return sorted(
            (r.g, r.n, round(r.mean, 9), round(r.lo, 9), round(r.hi, 9))
            for r in S.bootstrap_ci_from_state(
                spark.read.parquet(roll), ["g"], b=B
            ).collect()
        )

    def batch(df):
        return sorted(
            (r.g, r.n, round(r.mean, 9), round(r.lo, 9), round(r.hi, 9))
            for r in S.poisson_bootstrap_ci(df, ["g"], "v", "id", b=B).collect()
        )

    assert live() == batch(b1)  # read BETWEEN micro-batches
    S.bootstrap_updates(b2, ["g"], "v", "id", b=B).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    assert live() == batch(b1.unionByName(b2))


def test_bootstrap_excludes_null_values(spark):
    """Round-10 ADVICE: NULL value rows are excluded up front, so n
    counts non-null measurements and mean == avg(v) semantics —
    polluting a frame with NULL-value rows changes NOTHING."""
    rows = [(f"g{i % 2}", i, float(i % 11)) for i in range(400)]
    clean = spark.createDataFrame(rows, "g string, id long, v double")
    polluted = clean.unionByName(
        spark.createDataFrame(
            [("g0", 10_000, None), ("g1", 10_001, None), ("g0", 10_002, None)],
            "g string, id long, v double",
        )
    )
    a = {r.g: r for r in S.poisson_bootstrap_ci(clean, ["g"], "v", "id", b=16).collect()}
    b = {r.g: r for r in S.poisson_bootstrap_ci(polluted, ["g"], "v", "id", b=16).collect()}
    for g in a:
        assert b[g].n == a[g].n  # NULL rows not counted
        assert abs(b[g].mean - a[g].mean) < 1e-12
        assert abs(b[g].lo - a[g].lo) < 1e-12 and abs(b[g].hi - a[g].hi) < 1e-12
    # mean equals avg(v) exactly
    from pyspark.sql import functions as F

    avgs = {r.g: r.m for r in polluted.groupBy("g").agg(F.avg("v").alias("m")).collect()}
    for g in a:
        assert abs(b[g].mean - avgs[g]) < 1e-12
    # lift twin: same rule
    lrows = [(i, "a" if i % 2 == 0 else "b", 3.0 + (i % 5)) for i in range(600)]
    lc = spark.createDataFrame(lrows, "id long, arm string, v double")
    lp = lc.unionByName(
        spark.createDataFrame(
            [(20_000, "a", None), (20_001, "b", None)],
            "id long, arm string, v double",
        )
    )
    ra = S.poisson_bootstrap_lift(lc, "arm", "v", "id", "a", "b", b=16).collect()[0]
    rb = S.poisson_bootstrap_lift(lp, "arm", "v", "id", "a", "b", b=16).collect()[0]
    assert (ra.n_a, ra.n_b) == (rb.n_a, rb.n_b)
    assert abs(ra.lift - rb.lift) < 1e-12
    assert abs(ra.lo - rb.lo) < 1e-12 and abs(ra.hi - rb.hi) < 1e-12


def test_roc_auc_matches_rank_replica_and_ties(spark):
    """AUC == tie-aware rank statistic: numpy midrank replica, exact
    tie handling, HC-path bit identity, and the degenerate guards."""
    import numpy as np

    rng = __import__("random").Random(31)
    rows = [(round(rng.gauss(1.0 if rng.random() < 0.4 else 0.0, 1.0), 2),
             0) for _ in range(600)]
    # labels correlated with score: re-draw with the truth attached
    rows = []
    for _ in range(600):
        y = 1 if rng.random() < 0.4 else 0
        s = round(rng.gauss(0.8 * y, 1.0), 1)  # coarse: many ties
        rows.append((s, y))
    df = spark.createDataFrame(rows, "score double, y int")
    got = S.roc_auc(df, "score", "y").collect()[0]
    scores = np.array([r[0] for r in rows]); ys = np.array([r[1] for r in rows])
    # midrank replica
    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty(len(scores))
    sorted_s = scores[order]
    i = 0
    while i < len(sorted_s):
        j = i
        while j < len(sorted_s) and sorted_s[j] == sorted_s[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0
        i = j
    n_pos = int(ys.sum()); n_neg = len(ys) - n_pos
    want = (ranks[ys == 1].sum() - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
    assert got.n_pos == n_pos and got.n_neg == n_neg
    assert abs(got.auc - want) < 1e-12, (got.auc, want)
    assert abs(got.gini - (2 * want - 1)) < 1e-12
    # separable scores -> AUC 1; anti-separable -> 0; constant -> 0.5
    sep = spark.createDataFrame([(float(y), y) for y in (0, 1) for _ in range(10)], "score double, y int")
    assert abs(S.roc_auc(sep, "score", "y").collect()[0].auc - 1.0) < 1e-12
    const = spark.createDataFrame([(5.0, y) for y in (0, 1) for _ in range(10)], "score double, y int")
    assert abs(S.roc_auc(const, "score", "y").collect()[0].auc - 0.5) < 1e-12
    # single class -> NULL
    onec = spark.createDataFrame([(1.0, 1), (2.0, 1)], "score double, y int")
    assert S.roc_auc(onec, "score", "y").collect()[0].auc is None
    # NULL rows excluded
    polluted = df.unionByName(spark.createDataFrame(
        [(None, 1), (3.0, None)], "score double, y int"))
    g2 = S.roc_auc(polluted, "score", "y").collect()[0]
    assert (g2.n_pos, g2.n_neg) == (n_pos, n_neg) and abs(g2.auc - got.auc) < 1e-15
    # HC path bit-identical (DECIMAL-exact rank sum)
    hc = S.roc_auc(df, "score", "y", high_cardinality=True).collect()[0]
    lo = S.roc_auc(df, "score", "y", high_cardinality=False).collect()[0]
    assert hc.auc == lo.auc == got.auc
    # grouped == per-group single calls
    gdf = df.withColumn("seg", (F.col("score") > 0).cast("string"))
    per = {r.group: r for r in S.roc_auc_grouped(gdf, "seg", "score", "y").collect()}
    for seg in per:
        one = S.roc_auc(gdf.filter(F.col("seg") == seg), "score", "y").collect()[0]
        assert per[seg].n_pos == one.n_pos and per[seg].n_neg == one.n_neg
        if one.auc is None:
            assert per[seg].auc is None
        else:
            assert abs(per[seg].auc - one.auc) < 1e-15


def test_mutual_information_known_values(spark):
    import math

    # independent uniform 2x2 -> mi 0
    ind = spark.createDataFrame(
        [(x, y) for x in "ab" for y in "cd" for _ in range(25)], "x string, y string"
    )
    r = S.mutual_information(ind, "x", "y").collect()[0]
    assert r.n == 100 and abs(r.mi) < 1e-12 and abs(r.nmi) < 1e-12
    assert abs(r.h_x - math.log(2)) < 1e-12 and abs(r.h_y - math.log(2)) < 1e-12
    # identical columns -> mi == h == ln(k), nmi == 1
    ident = spark.createDataFrame([(c, c) for c in "abcd" for _ in range(10)], "x string, y string")
    r = S.mutual_information(ident, "x", "y").collect()[0]
    assert abs(r.mi - math.log(4)) < 1e-12 and abs(r.nmi - 1.0) < 1e-12
    # constant column -> zero entropy -> NULL nmi, mi 0
    const = spark.createDataFrame([("a", c) for c in "xyxy"], "x string, y string")
    r = S.mutual_information(const, "x", "y").collect()[0]
    assert abs(r.mi) < 1e-12 and r.nmi is None and abs(r.h_x) < 1e-12
    # NULL rows excluded; skewed joint has known MI
    rows = [("a", "c")] * 30 + [("a", "d")] * 10 + [("b", "c")] * 10 + [("b", "d")] * 30
    df = spark.createDataFrame(rows + [(None, "c"), ("a", None)], "x string, y string")
    r = S.mutual_information(df, "x", "y").collect()[0]
    n = 80.0
    want = sum(
        (c / n) * math.log((c / n) / (0.5 * 0.5))
        for c in (30, 10, 10, 30)
    )
    assert r.n == 80 and abs(r.mi - want) < 1e-12


def test_p_adjust_matches_r_reference(spark):
    """R p.adjust reference values (computed by the textbook
    definitions) across bh / holm / bonferroni, with ties and NULLs."""
    ps = [0.01, 0.02, 0.02, 0.04, 0.2, 0.5, 1.0]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(ps)], "test_id int, p double"
    )
    m = len(ps)
    # reference BH: cummin from worst rank of p*m/i, ties share values
    import numpy as np

    order = np.argsort(ps, kind="mergesort")
    raw = np.array([ps[order[i]] * m / (i + 1) for i in range(m)])
    bh_sorted = np.minimum.accumulate(raw[::-1])[::-1]
    bh = np.minimum(1.0, bh_sorted)
    want_bh = {}
    # map back, and tied p must give identical adjusted values
    for rank, idx in enumerate(order):
        want_bh[idx] = bh[rank]
    # tie fix: equal p -> equal adjusted
    for i in range(m):
        for j in range(m):
            if ps[i] == ps[j]:
                want_bh[i] = min(want_bh[i], want_bh[j])
    got = {r.test_id: r.p_adj for r in S.p_adjust(df, "p", "bh").collect()}
    for i in range(m):
        assert abs(got[i] - want_bh[i]) < 1e-12, (i, got[i], want_bh[i])
    # ties identical
    assert got[1] == got[2]
    # holm reference
    raw_h = np.array([ps[order[i]] * (m - i) for i in range(m)])
    holm_sorted = np.minimum(1.0, np.maximum.accumulate(raw_h))
    want_h = {idx: holm_sorted[rank] for rank, idx in enumerate(order)}
    for i in range(m):
        for j in range(m):
            if ps[i] == ps[j]:
                want_h[i] = max(want_h[i], want_h[j])
    got_h = {r.test_id: r.p_adj for r in S.p_adjust(df, "p", "holm").collect()}
    for i in range(m):
        assert abs(got_h[i] - want_h[i]) < 1e-12, (i, got_h[i], want_h[i])
    # bonferroni
    got_b = {r.test_id: r.p_adj for r in S.p_adjust(df, "p", "bonferroni").collect()}
    for i in range(m):
        assert abs(got_b[i] - min(1.0, ps[i] * m)) < 1e-12
    # NULL p passes through NULL and doesn't count toward m
    withnull = df.unionByName(
        spark.createDataFrame([(99, None)], "test_id int, p double")
    )
    gn = {r.test_id: r.p_adj for r in S.p_adjust(withnull, "p", "bh").collect()}
    assert gn[99] is None
    for i in range(m):
        assert abs(gn[i] - want_bh[i]) < 1e-12
    import pytest

    with pytest.raises(ValueError, match="unknown method"):
        S.p_adjust(df, "p", "fdr_by")


def test_kaplan_meier_ci_and_rmst_replicas(spark):
    """Greenwood bands + RMST against a hand/numpy replica on a small
    censored cohort, including the d=n absorbing state."""
    import math

    # cohort: times 1..5; at t=5 everyone remaining dies (absorbing)
    rows = (
        [(1.0, 1)] * 2 + [(1.0, 0)] * 1 + [(2.0, 1)] * 1 + [(3.0, 0)] * 2
        + [(4.0, 1)] * 2 + [(5.0, 1)] * 2
    )
    df = spark.createDataFrame(rows, "t double, event int")
    got = {r.t: r for r in S.kaplan_meier_ci(df).collect()}
    # replica
    n = len(rows)
    S_run, G = 1.0, 0.0
    at_risk = n
    z = 1.959964
    for t in (1.0, 2.0, 3.0, 4.0, 5.0):
        d = sum(1 for tt, e in rows if tt == t and e == 1)
        c = sum(1 for tt, e in rows if tt == t and e == 0)
        r = got[t]
        assert r.n_risk == at_risk and r.d == d and r.censored == c
        if d == at_risk and d > 0:
            S_run = 0.0
        elif d > 0:
            S_run *= 1 - d / at_risk
        if d < at_risk:
            G += d / (at_risk * (at_risk - d))
        assert abs(r.survival - S_run) < 1e-12
        if S_run == 0:
            assert r.se == 0.0 and r.lo == 0.0 and r.hi == 0.0
        elif S_run == 1:
            assert r.lo is None and r.hi is None
        else:
            se = S_run * math.sqrt(G)
            sell = math.sqrt(G) / abs(math.log(S_run))
            assert abs(r.se - se) < 1e-12
            assert abs(r.lo - S_run ** math.exp(z * sell)) < 1e-12
            assert abs(r.hi - S_run ** math.exp(-z * sell)) < 1e-12
            assert 0 <= r.lo <= r.survival <= r.hi <= 1
        at_risk -= d + c
    # plain method stays clipped and ordered
    for r in S.kaplan_meier_ci(df, method="plain").collect():
        if r.survival not in (0.0,):
            assert 0 <= r.lo <= r.survival <= r.hi <= 1
    # RMST: integral of the step curve, tau inside and beyond the data
    km = sorted((r.t, r.survival) for r in S.kaplan_meier(df).collect())

    def ref_rmst(tau):
        area, prev_t, prev_s = 0.0, 0.0, 1.0
        for t, s in km:
            area += prev_s * (min(t, tau) - min(prev_t, tau))
            prev_t, prev_s = t, s
        area += prev_s * max(0.0, tau - prev_t)
        return area

    for tau in (2.5, 4.0, 10.0):
        r = S.rmst(df, tau=tau).collect()[0]
        assert abs(r.rmst - ref_rmst(tau)) < 1e-12, (tau, r.rmst, ref_rmst(tau))
        assert r.n == n and r.n_events == 7
    import pytest

    with pytest.raises(ValueError, match="positive"):
        S.rmst(df, tau=0.0)


def test_pr_auc_matches_sklearn_style_replica(spark):
    """Average precision vs a numpy replica of the step definition
    (sklearn average_precision_score semantics incl. tie groups)."""
    import numpy as np

    rng = __import__("random").Random(13)
    rows = []
    for _ in range(500):
        y = 1 if rng.random() < 0.15 else 0  # imbalanced
        s = round(rng.gauss(1.0 * y, 1.0), 1)  # coarse: tie groups
        rows.append((s, y))
    df = spark.createDataFrame(rows, "score double, y int")
    got = S.pr_auc(df, "score", "y").collect()[0]
    scores = np.array([r[0] for r in rows]); ys = np.array([r[1] for r in rows])
    n_pos = int(ys.sum())

    def ref_ap():
        ap, prev_tp = 0.0, 0
        for v in sorted(set(scores), reverse=True):
            at = scores >= v
            tp = int(ys[at].sum()); pp = int(at.sum())
            ap += (tp - prev_tp) / n_pos * (tp / pp)
            prev_tp = tp
        return ap

    assert got.n_pos == n_pos and got.n_neg == len(rows) - n_pos
    assert abs(got.ap - ref_ap()) < 1e-12, (got.ap, ref_ap())
    assert abs(got.baseline - n_pos / len(rows)) < 1e-12
    # perfect separation -> AP 1; random constant score -> AP == baseline
    sep = spark.createDataFrame([(float(y), y) for y in (0, 1) for _ in range(10)], "score double, y int")
    assert abs(S.pr_auc(sep, "score", "y").collect()[0].ap - 1.0) < 1e-12
    const = spark.createDataFrame([(5.0, y % 4 == 0) for y in range(40)], "score double, y boolean") \
        .selectExpr("score", "cast(y as int) as y")
    r = S.pr_auc(const, "score", "y").collect()[0]
    assert abs(r.ap - r.baseline) < 1e-12
    # no positives -> NULL
    nop = spark.createDataFrame([(1.0, 0), (2.0, 0)], "score double, y int")
    assert S.pr_auc(nop, "score", "y").collect()[0].ap is None
    # HC path identical (integer suffix sums)
    hi = S.pr_auc(df, "score", "y", high_cardinality=True).collect()[0]
    assert abs(hi.ap - got.ap) < 1e-15


def test_cohens_kappa_known_values(spark):
    import math

    # perfect agreement on a varied label set -> kappa 1
    perfect = spark.createDataFrame(
        [(c, c) for c in "aabbbcc"], "x string, y string"
    )
    r = S.cohens_kappa(perfect, "x", "y").collect()[0]
    assert r.p_observed == 1.0 and abs(r.kappa - 1.0) < 1e-12
    # textbook 2x2: po=0.7, marginals A(.5,.5) B(.6,.4) -> pe=0.5, k=0.4
    rows = (
        [("y", "y")] * 20 + [("y", "n")] * 5 + [("n", "y")] * 10 + [("n", "n")] * 15
    )
    df = spark.createDataFrame(rows, "x string, y string")
    r = S.cohens_kappa(df, "x", "y").collect()[0]
    po = 35 / 50.0
    pe = (25 / 50.0) * (30 / 50.0) + (25 / 50.0) * (20 / 50.0)
    assert r.n == 50 and abs(r.p_observed - po) < 1e-12
    assert abs(r.p_expected - pe) < 1e-12
    assert abs(r.kappa - (po - pe) / (1 - pe)) < 1e-12
    # both raters constant on the same label: pe=1 -> NULL kappa
    const = spark.createDataFrame([("a", "a")] * 5, "x string, y string")
    assert S.cohens_kappa(const, "x", "y").collect()[0].kappa is None
    # disjoint label spaces: po=0, pe=0, kappa=0
    disj = spark.createDataFrame([("a", "b")] * 5, "x string, y string")
    r = S.cohens_kappa(disj, "x", "y").collect()[0]
    assert r.p_observed == 0.0 and r.p_expected == 0.0 and r.kappa == 0.0
    # NULL rows excluded
    pol = df.unionByName(
        spark.createDataFrame([(None, "y"), ("y", None)], "x string, y string")
    )
    r2 = S.cohens_kappa(pol, "x", "y").collect()[0]
    assert r2.n == 50
    assert abs(r2.p_observed - po) < 1e-12
    assert abs(r2.kappa - (po - pe) / (1 - pe)) < 1e-12


def test_cmh_matches_replica_and_simpson(spark):
    """CMH against a numpy replica, and the Simpson's-paradox
    demonstration: a pooled 2x2 shows an effect direction that the
    stratified test correctly discounts."""
    import numpy as np

    # strata with very different base rates and arm allocations
    tables = {  # k -> (a, b, c, d): arm-a hit/miss, arm-b hit/miss
        "s1": (60, 40, 30, 70),
        "s2": (10, 90, 5, 45),
        "s3": (200, 200, 120, 80),
    }
    rows = []
    for k, (a, b, c, d) in tables.items():
        rows += [(k, "a", 1)] * a + [(k, "a", 0)] * b
        rows += [(k, "b", 1)] * c + [(k, "b", 0)] * d
    df = spark.createDataFrame(rows, "k string, arm string, hit int")
    got = S.cmh_test(df, "k", "arm", "hit", "a", "b").collect()[0]
    sa = se = sv = ad = bc = 0.0
    for a, b, c, d in tables.values():
        n = a + b + c + d
        sa += a
        se += (a + b) * (a + c) / n
        sv += (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1))
        ad += a * d / n
        bc += b * c / n
    assert got.n == sum(sum(t) for t in tables.values())
    assert got.n_strata == 3
    assert abs(got.chi2 - (sa - se) ** 2 / sv) < 1e-10
    assert abs(got.or_mh - ad / bc) < 1e-12
    # single-subject stratum contributes zero variance, no crash
    one = df.unionByName(spark.createDataFrame([("s4", "a", 1)], "k string, arm string, hit int"))
    r1 = S.cmh_test(one, "k", "arm", "hit", "a", "b").collect()[0]
    assert r1.n_strata == 4 and np.isfinite(r1.chi2)
    # no-effect-within-strata data: chi2 ~ 0 even when the POOLED
    # table shows a spurious effect (allocation confounded with base
    # rate - the Simpson construction)
    simp = []
    # stratum hi: base rate 0.8, arm a gets 90% of subjects
    simp += [("hi", "a", 1)] * 72 + [("hi", "a", 0)] * 18
    simp += [("hi", "b", 1)] * 8 + [("hi", "b", 0)] * 2
    # stratum lo: base rate 0.2, arm b gets 90% of subjects
    simp += [("lo", "a", 1)] * 2 + [("lo", "a", 0)] * 8
    simp += [("lo", "b", 1)] * 18 + [("lo", "b", 0)] * 72
    sdf = spark.createDataFrame(simp, "k string, arm string, hit int")
    rs = S.cmh_test(sdf, "k", "arm", "hit", "a", "b").collect()[0]
    assert rs.chi2 < 1e-10  # no within-stratum effect
    assert abs(rs.or_mh - 1.0) < 1e-9
    # while the POOLED 2x2 is fooled (arm a pooled rate 0.74 vs 0.26 —
    # allocation confounded with base rate): naive pooled z >> 0
    import math

    pa, na = 74, 100
    pb, nb = 26, 100
    p = (pa + pb) / (na + nb)
    z = (pa / na - pb / nb) / math.sqrt(p * (1 - p) * (1 / na + 1 / nb))
    assert abs(z) > 5  # the paradox the stratified test avoids


def test_roc_auc_invariant_under_monotone_transform(spark):
    """Property: AUC depends only on the score ORDERING — any strictly
    increasing transform leaves it bit-unchanged (exp, affine, cube);
    a strictly DECREASING transform flips it to 1 - AUC."""
    rng = __import__("random").Random(77)
    rows = [(round(rng.gauss(0.5 * (1 if rng.random() < 0.3 else 0), 1.0), 2),
             1 if rng.random() < 0.3 else 0) for _ in range(400)]
    rows = [(s, y) for s, y in rows]
    df = spark.createDataFrame(rows, "score double, y int")
    base = S.roc_auc(df, "score", "y").collect()[0].auc
    for expr in ("exp(score)", "3.0*score + 7.0", "score*score*score"):
        t = df.selectExpr(f"{expr} as score", "y")
        assert S.roc_auc(t, "score", "y").collect()[0].auc == base, expr
    neg = df.selectExpr("-score as score", "y")
    assert abs(S.roc_auc(neg, "score", "y").collect()[0].auc - (1 - base)) < 1e-12


def test_wasserstein_1d_replicas_and_shift(spark):
    import numpy as np

    rng = __import__("random").Random(3)
    a = [round(rng.gauss(0, 1), 2) for _ in range(400)]
    b = [round(rng.gauss(0.5, 1), 2) for _ in range(300)]
    rows = [(v, "a") for v in a] + [(v, "b") for v in b]
    df = spark.createDataFrame(rows, "v double, g string")
    got = S.wasserstein_1d(df, "v", "g", "a", "b").collect()[0]

    def ref_w1(xs, ys):
        vals = np.array(sorted(set(xs) | set(ys)))
        fa = np.searchsorted(np.sort(xs), vals, side="right") / len(xs)
        fb = np.searchsorted(np.sort(ys), vals, side="right") / len(ys)
        return float((np.abs(fa - fb)[:-1] * np.diff(vals)).sum())

    want = ref_w1(a, b)
    assert got.n_a == 400 and got.n_b == 300
    assert abs(got.w1 - want) < 1e-12, (got.w1, want)
    # a pure +c shift of identical samples has W1 == c exactly
    shift = spark.createDataFrame(
        [(float(v), "a") for v in range(100)]
        + [(float(v) + 2.5, "b") for v in range(100)],
        "v double, g string",
    )
    r = S.wasserstein_1d(shift, "v", "g", "a", "b").collect()[0]
    assert abs(r.w1 - 2.5) < 1e-9
    # identical samples -> 0; HC path identical
    same = spark.createDataFrame([(float(v % 13), g) for v in range(200) for g in "ab"], "v double, g string")
    assert S.wasserstein_1d(same, "v", "g", "a", "b").collect()[0].w1 == 0.0
    hc = S.wasserstein_1d(df, "v", "g", "a", "b", high_cardinality=True).collect()[0]
    assert abs(hc.w1 - got.w1) < 1e-12
    # and the plan never global-sorts in the HC path (no non-__ptot window)
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.plans.explain import (
        physical_plan,
    )

    plan = physical_plan(S.wasserstein_1d(df, "v", "g", "a", "b", high_cardinality=True))
    for seg in plan.split("\n\n"):
        if seg.startswith("(") and "Window" in seg.splitlines()[0]:
            assert "__ptot" in seg, seg


def test_psi_known_values_and_null_bucket(spark):
    import math

    ref = spark.createDataFrame([(b,) for b in [0] * 50 + [1] * 30 + [2] * 20], "bucket int")
    liv = spark.createDataFrame([(b,) for b in [0] * 20 + [1] * 30 + [2] * 50], "bucket int")
    r = S.psi(ref, liv, "bucket").collect()[0]
    want = (0.5 - 0.2) * math.log(0.5 / 0.2) + 0.0 + (0.2 - 0.5) * math.log(0.2 / 0.5)
    assert r.n_ref == 100 and r.n_live == 100
    assert abs(r.psi_value - want) < 1e-12
    # identical -> 0
    r0 = S.psi(ref, ref, "bucket").collect()[0]
    assert abs(r0.psi_value) < 1e-12
    # a bucket present on one side only: eps floor, large contribution
    only = spark.createDataFrame([(9,)] * 10, "bucket int")
    r1 = S.psi(ref.unionByName(only), ref, "bucket").collect()[0]
    assert r1.psi_value > 0.5
    # NULL bucket is ONE shared "missing" cell
    refn = ref.unionByName(spark.createDataFrame([(None,)] * 10, "bucket int"))
    livn = liv.unionByName(spark.createDataFrame([(None,)] * 10, "bucket int"))
    rn = S.psi(refn, livn, "bucket").collect()[0]
    # the NULL cell has p=10/110, q=10/110 -> contributes ~0; remaining
    # buckets shrink proportionally on both sides
    assert rn.n_ref == 110 and rn.n_live == 110
    assert rn.psi_value < r.psi_value + 1e-9


def test_js_divergence_known_values(spark):
    import math

    # disjoint supports -> ln 2 exactly (js_norm 1)
    dis = spark.createDataFrame(
        [("x", "a")] * 10 + [("y", "b")] * 20, "i string, g string"
    )
    r = S.js_divergence(dis, "i", "g", "a", "b").collect()[0]
    assert abs(r.js - math.log(2)) < 1e-12 and abs(r.js_norm - 1.0) < 1e-12
    # identical distributions -> 0
    same = spark.createDataFrame(
        [(c, g) for c in "xxyz" for g in "ab"], "i string, g string"
    )
    r0 = S.js_divergence(same, "i", "g", "a", "b").collect()[0]
    assert abs(r0.js) < 1e-12
    # hand-computed asymmetric case
    rows = [("x", "a")] * 3 + [("y", "a")] * 1 + [("x", "b")] * 1 + [("y", "b")] * 3
    df = spark.createDataFrame(rows, "i string, g string")
    r2 = S.js_divergence(df, "i", "g", "a", "b").collect()[0]
    p = {"x": 0.75, "y": 0.25}
    q = {"x": 0.25, "y": 0.75}
    want = sum(
        p[i] * math.log(p[i] / ((p[i] + q[i]) / 2)) / 2
        + q[i] * math.log(q[i] / ((p[i] + q[i]) / 2)) / 2
        for i in "xy"
    )
    assert abs(r2.js - want) < 1e-12
    assert r2.n_items == 2 and r2.n_a == 4 and r2.n_b == 4
    # bounded by ln 2
    assert 0 <= r2.js <= math.log(2) + 1e-12


def test_psi_stream_maintained_by_composition(spark, tmp_path):
    """PSI is a function of two bucket-count tables, and bucket counts
    are plain sums — so a LIVE drift monitor needs ZERO psi-specific
    streaming code: stream bucket counts through the generic rollup,
    read psi-from-counts between micro-batches (the sliding-HLL /
    bootstrap composition rule)."""
    import math

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.incremental import (
        read_snapshot,
        stream_rollup_maintenance,
    )

    ref = spark.createDataFrame([(b,) for b in [0] * 50 + [1] * 50], "bucket int")
    # live arrives in two micro-batches with drift
    b1 = [(0,)] * 10 + [(1,)] * 30
    b2 = [(0,)] * 5 + [(1,)] * 55
    src, roll, ck = str(tmp_path / "src"), str(tmp_path / "roll"), str(tmp_path / "ck")
    spark.createDataFrame(b1, "bucket int").write.mode("append").parquet(src)
    q = stream_rollup_maintenance(
        spark,
        src,
        roll,
        ck,
        keys=["bucket"],
        measures={"cl": ("count", "bucket")},
        schema="bucket int",
    )
    q.processAllAvailable()
    live1 = read_snapshot(spark, roll).select("bucket", F.col("cl").alias("n"))
    r1 = S.psi(ref, live1.selectExpr("explode(array_repeat(bucket, cast(n as int))) as bucket"), "bucket").collect()[0]
    batch1 = S.psi(ref, spark.createDataFrame(b1, "bucket int"), "bucket").collect()[0]
    assert abs(r1.psi_value - batch1.psi_value) < 1e-12
    spark.createDataFrame(b2, "bucket int").write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    live2 = read_snapshot(spark, roll)
    r2 = S.psi(ref, live2.selectExpr("explode(array_repeat(bucket, cast(cl as int))) as bucket"), "bucket").collect()[0]
    batch2 = S.psi(ref, spark.createDataFrame(b1 + b2, "bucket int"), "bucket").collect()[0]
    assert abs(r2.psi_value - batch2.psi_value) < 1e-12
    assert r2.psi_value != r1.psi_value  # the drift moved the needle


def test_psi_empty_side_returns_null(spark):
    """An entirely empty reference (or live) side is a caller bug, not
    drift: psi_value must come back NULL, not a fabricated all-eps
    number (r11 ADVICE — greatest() skips NULLs in Spark, so the guard
    must wrap the whole ratio expression)."""
    ref = spark.createDataFrame([(b,) for b in [0] * 5 + [1] * 5], "bucket int")
    empty = spark.createDataFrame([], "bucket int")
    r = S.psi(empty, ref, "bucket").collect()[0]
    assert r.psi_value is None
    r2 = S.psi(ref, empty, "bucket").collect()[0]
    assert r2.psi_value is None
    # non-empty sides still finite
    r3 = S.psi(ref, ref, "bucket").collect()[0]
    assert r3.psi_value is not None and abs(r3.psi_value) < 1e-12


def test_conformal_quantile_exact_order_statistic(spark):
    """qhat must be the EXACT k-th smallest with k=ceil((n+1)(1-a)) —
    replicated in numpy with the same IEEE k formula; the HC and
    windowed paths are bit-identical (integer counts)."""
    import math

    rng = np.random.RandomState(41)
    vals = rng.normal(0, 1, 200).tolist()
    df = spark.createDataFrame([(v,) for v in vals], "score double")
    for alpha in (0.1, 0.25, 0.5):
        r = S.conformal_quantile(df, "score", alpha=alpha).collect()[0]
        k = math.ceil((200 + 1) * (1.0 - alpha))
        want = sorted(vals)[k - 1]
        assert r.n == 200 and r.k == k
        assert r.qhat == want, (alpha, r.qhat, want)
        # both cumsum paths agree exactly
        r2 = S.conformal_quantile(
            df, "score", alpha=alpha, high_cardinality=True
        ).collect()[0]
        r3 = S.conformal_quantile(
            df, "score", alpha=alpha, high_cardinality=False
        ).collect()[0]
        assert r2.qhat == r3.qhat == r.qhat
    # ties: duplicate scores still give the k-th order statistic
    dup = spark.createDataFrame([(1.0,)] * 7 + [(2.0,)] * 3, "score double")
    rd = S.conformal_quantile(dup, "score", alpha=0.2).collect()[0]
    assert rd.k == math.ceil(11 * 0.8) and rd.qhat == sorted([1.0] * 7 + [2.0] * 3)[rd.k - 1]
    # alpha < 1/(n+1): no finite score covers -> NULL (never a clamp)
    tiny = spark.createDataFrame([(1.0,), (2.0,)], "score double")
    rt = S.conformal_quantile(tiny, "score", alpha=0.05).collect()[0]
    assert rt.qhat is None and rt.k == 3
    import pytest as _pt

    with _pt.raises(ValueError, match="alpha"):
        S.conformal_quantile(df, "score", alpha=1.5)


def test_conformal_coverage_guarantee_and_infinite_set(spark):
    """On exchangeable data, empirical test coverage >= 1-alpha (up to
    sampling noise); NULL qhat reports coverage 1.0."""
    rng = np.random.RandomState(42)
    cal = spark.createDataFrame(
        [(float(v),) for v in rng.normal(0, 1, 400)], "score double"
    )
    test = spark.createDataFrame(
        [(float(v),) for v in rng.normal(0, 1, 400)], "score double"
    )
    r = S.conformal_coverage(cal, test, "score", alpha=0.1).collect()[0]
    assert r.n_cal == 400 and r.n_test == 400
    assert abs(r.target - 0.9) < 1e-12
    assert r.coverage >= 0.85, r.coverage  # guarantee minus noise
    tiny = spark.createDataFrame([(1.0,)], "score double")
    r2 = S.conformal_coverage(tiny, test, "score", alpha=0.1).collect()[0]
    assert r2.qhat is None and r2.coverage == 1.0


def test_conformal_grouped_matches_per_group_replica(spark):
    import math

    rng = np.random.RandomState(43)
    rows = []
    for g, n in (("a", 50), ("b", 120), (None, 30), ("tiny", 2)):
        for v in rng.normal(0, 1, n):
            rows.append((g, float(v)))
    df = spark.createDataFrame(rows, "seg string, score double")
    got = {
        r.group: (r.n, r.k, r.qhat)
        for r in S.conformal_quantile_grouped(df, "seg", "score", alpha=0.2).collect()
    }
    for g in ("a", "b", None, "tiny"):
        vals = sorted(v for gg, v in rows if gg == g)
        n = len(vals)
        k = math.ceil((n + 1) * 0.8)
        want = vals[k - 1] if k <= n else None
        assert got[g] == (n, k, want), g
    # the tiny group honestly reports NULL (no finite score covers)
    assert got["tiny"][2] is None


def test_conformal_coverage_grouped_segments_and_null_semantics(spark):
    """Per-group coverage matches a per-group python replica; a test
    group with NO calibration rows reports NULL (never borrows another
    group's threshold); a too-small calibrated group covers 1.0."""
    import math

    rng = np.random.RandomState(44)
    cal_rows, test_rows = [], []
    for g, n in (("a", 60), ("b", 100), ("tiny", 2)):
        for v in rng.normal(0, 1, n):
            cal_rows.append((g, float(v)))
    for g, n in (("a", 50), ("b", 50), ("tiny", 10), ("newgrp", 8)):
        for v in rng.normal(0, 1, n):
            test_rows.append((g, float(v)))
    cal = spark.createDataFrame(cal_rows, "seg string, score double")
    test = spark.createDataFrame(test_rows, "seg string, score double")
    got = {
        r.group: r
        for r in S.conformal_coverage_grouped(
            cal, test, "seg", "score", alpha=0.2
        ).collect()
    }
    for g in ("a", "b"):
        vals = sorted(v for gg, v in cal_rows if gg == g)
        k = math.ceil((len(vals) + 1) * 0.8)
        qhat = vals[k - 1]
        tv = [v for gg, v in test_rows if gg == g]
        want = sum(v <= qhat for v in tv) / len(tv)
        assert abs(got[g].coverage - want) < 1e-12 and got[g].qhat == qhat
    # tiny calibrated group: k > n -> infinite set -> coverage 1.0
    assert got["tiny"].qhat is None and got["tiny"].coverage == 1.0
    # uncalibrated group: cannot certify -> NULLs
    assert got["newgrp"].n_cal is None and got["newgrp"].coverage is None
    assert got["newgrp"].n_test == 8


def test_conformal_empty_calibration_surfaces_not_masks(spark):
    """Empty / all-NULL calibration is a caller bug the psi treatment
    surfaces: n=0 with NULL qhat from the quantile, and a NULL (never
    a vacuous 1.0) coverage from the audit (ADVICE r12).  An empty
    TEST side likewise reports NULL coverage while preserving the
    calibration columns."""
    empty = spark.createDataFrame([], "score double")
    r = S.conformal_quantile(empty, "score", alpha=0.1).collect()[0]
    assert r.n == 0 and r.k == 1 and r.qhat is None
    allnull = spark.createDataFrame([(None,), (None,)], "score double")
    r2 = S.conformal_quantile(allnull, "score", alpha=0.1).collect()[0]
    assert r2.n == 0 and r2.qhat is None
    test = spark.createDataFrame([(1.0,), (2.0,)], "score double")
    c = S.conformal_coverage(empty, test, "score", alpha=0.1).collect()[0]
    assert c.n_cal == 0 and c.n_test == 2
    assert c.coverage is None, c.coverage
    # empty test side: n_cal/qhat survive, coverage NULL with n_test=0
    c2 = S.conformal_coverage(test, empty, "score", alpha=0.5).collect()[0]
    assert c2.n_cal == 2 and c2.n_test == 0
    assert c2.qhat == 2.0 and c2.coverage is None
