"""Known-answer tests for the hypothesis-testing family
(operators/stats.py): hand-computable fixtures, no table deps."""

from __future__ import annotations

import math

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
