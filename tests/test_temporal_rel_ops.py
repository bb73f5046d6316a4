"""Known-answer tests for rolling_time_agg, scd2_intervals, item_cooccurrence."""
from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.temporal import (
    rolling_time_agg,
    scd2_intervals,
)
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.relational import (
    item_cooccurrence,
)


def _ts(sec, micro=0):
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=sec, microseconds=micro)


def test_rolling_time_agg_hand_computed(spark):
    rows = [
        # (event_id, ts, user, value)
        (1, _ts(0), 7, 1.0),
        (2, _ts(30), 7, 2.0),
        (3, _ts(60), 7, 4.0),    # 60s window: includes t=0 (inclusive bound)
        (4, _ts(121), 7, 8.0),   # window [61,121]: only itself
        (5, _ts(10), 9, 1.5),    # other user isolated
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, value double")
    got = {r.event_id: (r.n_window, r.sum_window) for r in
           rolling_time_agg(df, window_sec=60, key_col="user_id").collect()}
    assert got[1] == (1, 1.0)
    assert got[2] == (2, 3.0)
    assert got[3] == (3, 7.0)   # t=0 is exactly 60s before → inside
    assert got[4] == (1, 8.0)
    assert got[5] == (1, 1.5)


def test_rolling_time_agg_microsecond_peers(spark):
    # two events at the identical microsecond are RANGE peers: both see both
    rows = [(1, _ts(0), 1, 1.0), (2, _ts(0), 1, 2.0)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, value double")
    got = {r.event_id: (r.n_window, r.sum_window) for r in
           rolling_time_agg(df, window_sec=10).collect()}
    assert got[1] == (2, 3.0) and got[2] == (2, 3.0)


def test_scd2_intervals_hand_computed(spark):
    rows = [
        (1, _ts(0), 7, "bronze"),
        (2, _ts(100), 7, "silver"),
        (3, _ts(200), 7, "gold"),
        (4, _ts(50), 9, "bronze"),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, tier string")
    out = scd2_intervals(df, attr_cols=["tier"]).collect()
    by = {(r.user_id, r.tier): r for r in out}
    assert by[(7, "bronze")].valid_to == _ts(100) and not by[(7, "bronze")].is_current
    assert by[(7, "silver")].valid_to == _ts(200)
    assert by[(7, "gold")].valid_to is None and by[(7, "gold")].is_current
    assert by[(9, "bronze")].is_current


def test_item_cooccurrence_hand_computed(spark):
    rows = [
        # user 1 touches items 10, 20; user 2 touches 10, 20, 30; user 3 only 10
        (1, 1, '{"k": 10}'), (2, 1, '{"k": 20}'), (3, 1, '{"k": 10}'),  # repeat collapses
        (4, 2, '{"k": 10}'), (5, 2, '{"k": 20}'), (6, 2, '{"k": 30}'),
        (7, 3, '{"k": 10}'),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, props string")
    got = {(r.item_a, r.item_b): r.n_users for r in
           item_cooccurrence(df, min_support=1).collect()}
    assert got[(10, 20)] == 2
    assert got[(10, 30)] == 1
    assert got[(20, 30)] == 1
    # min_support filter
    got2 = {(r.item_a, r.item_b): r.n_users for r in
            item_cooccurrence(df, min_support=2).collect()}
    assert got2 == {(10, 20): 2}


def test_item_cooccurrence_cap_bounds_pairs(spark):
    # one power user touching 10 items; cap=3 keeps the 3 lowest item ids
    rows = [(i, 1, '{"k": %d}' % i) for i in range(10)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, props string")
    got = {(r.item_a, r.item_b) for r in
           item_cooccurrence(df, min_support=1, max_items_per_user=3).collect()}
    assert got == {(0, 1), (0, 2), (1, 2)}
    # cap above the max → exact: C(10,2)=45 pairs
    full = item_cooccurrence(df, min_support=1, max_items_per_user=50).count()
    assert full == 45


def test_decayed_sum_hand_computed(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.temporal import (
        decayed_sum,
    )

    H = 7 * 86400  # half-life in seconds
    rows = [
        (1, _ts(0), 7, 1.0),
        (2, _ts(H), 7, 1.0),      # one half-life later: 1 + 0.5
        (3, _ts(2 * H), 7, 2.0),  # 2 + 1·0.5 + 1·0.25
        (4, _ts(0), 9, 3.0),      # other key isolated
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, value double")
    got = {r.event_id: r.decayed_sum for r in decayed_sum(df).collect()}
    assert abs(got[1] - 1.0) < 1e-9
    assert abs(got[2] - 1.5) < 1e-9
    assert abs(got[3] - 2.75) < 1e-9
    assert abs(got[4] - 3.0) < 1e-9


def test_decayed_sum_partition_invariant(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.temporal import (
        decayed_sum,
    )

    rows = [(i, _ts(i * 3600), i % 3, float(i % 5)) for i in range(60)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, value double")
    a = {r.event_id: round(r.decayed_sum, 9) for r in decayed_sum(df).collect()}
    b = {r.event_id: round(r.decayed_sum, 9) for r in decayed_sum(df.repartition(11)).collect()}
    assert a == b


def test_ohlc_bars_hand_computed(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.temporal import (
        ohlc_bars,
    )

    rows = [
        (1, _ts(0), 7, 10.0),
        (2, _ts(60), 7, 30.0),
        (3, _ts(299), 7, 5.0),   # same 5-min bar: open=10, close=5
        (4, _ts(300), 7, 99.0),  # next bar
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, value double")
    got = {r.bar_start_us: r for r in ohlc_bars(df, bar_sec=300).collect()}
    b0 = got[_ts(0).timestamp() * 0 + 1704067200000000]  # 2024-01-01T00:00Z µs
    assert (b0.open, b0.high, b0.low, b0.close) == (10.0, 30.0, 5.0, 5.0)
    assert b0.n_events == 3 and abs(b0.volume - 45.0) < 1e-9
    b1 = got[1704067200000000 + 300 * 1_000_000]
    assert (b1.open, b1.close, b1.n_events) == (99.0, 99.0, 1)


def test_ohlc_bars_tie_determinism(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.temporal import (
        ohlc_bars,
    )

    # two events at the identical microsecond: event_id breaks the tie
    rows = [(2, _ts(0), 1, 8.0), (1, _ts(0), 1, 3.0)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, value double")
    r = ohlc_bars(df, bar_sec=60).collect()[0]
    assert r.open == 3.0 and r.close == 8.0  # id 1 opens, id 2 closes


def test_event_transitions_hand_computed(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.relational import (
        event_transitions,
    )

    rows = [
        (1, _ts(0), 7, "view"), (2, _ts(1), 7, "click"), (3, _ts(2), 7, "view"),
        (4, _ts(3), 7, "click"), (5, _ts(0), 9, "view"), (6, _ts(1), 9, "buy"),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string")
    got = {(r.from_type, r.to_type): (r.n, r.prob) for r in event_transitions(df).collect()}
    # view→click x2, click→view x1, view→buy x1
    assert got[("view", "click")][0] == 2
    assert abs(got[("view", "click")][1] - 2 / 3) < 1e-12
    assert got[("view", "buy")][0] == 1
    assert got[("click", "view")] == (1, 1.0)
    # no cross-user transition (user 7's last → user 9's first absent)
    assert ("click", "buy") not in got


def test_conversion_latency_hand_computed(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.temporal import (
        conversion_latency,
    )

    rows = [
        (1, _ts(0), 7, "view"),
        (2, _ts(10), 7, "purchase"),   # 10 s after the view
        (3, _ts(20), 7, "view"),
        (4, _ts(25), 7, "view"),       # most RECENT view wins
        (5, _ts(30), 7, "purchase"),   # 5 s after event 4
        (6, _ts(5), 9, "purchase"),    # no prior view → NULL
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string")
    got = {r.event_id: r.latency_sec for r in conversion_latency(df).collect()}
    assert got[2] == 10.0
    assert got[5] == 5.0
    assert got[6] is None
    assert set(got) == {2, 5, 6}  # only purchases emit


def test_session_paths_hand_computed(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.relational import (
        session_paths,
    )

    GAP = 31 * 60
    rows = [
        # user 7, session 1: view>click ; session 2 (after gap): view
        (1, _ts(0), 7, "view"), (2, _ts(60), 7, "click"),
        (3, _ts(GAP + 120), 7, "view"),
        # user 9: view>click
        (4, _ts(0), 9, "view"), (5, _ts(30), 9, "click"),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string")
    got = {r.path: r.n_sessions for r in session_paths(df).collect()}
    assert got == {"view>click": 2, "view": 1}


def test_fuzzy_pairs_hand_computed(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.dedup import (
        fuzzy_pairs,
    )

    rows = [
        (1, "spark"), (2, "spork"),   # dist 1, same prefix 'sp' (len 2)
        (3, "sprk"),                  # dist 1 to spark, same prefix
        (4, "hadoop"),                # different block
        (5, "sparkling"),             # length gap 4 > max_dist → pruned
    ]
    df = spark.createDataFrame(rows, "doc_id long, name string")
    got = {(r.id_a, r.id_b): r.dist for r in
           fuzzy_pairs(df, "name", max_dist=2, prefix_len=2, id_col="doc_id").collect()}
    assert got == {(1, 2): 1, (1, 3): 1, (2, 3): 1}  # spork→sprk: one deletion


def test_dau_wau_hand_computed(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.relational import (
        dau_wau,
    )
    import datetime as dt

    def d(day, uid):
        return (uid * 100 + day, dt.datetime(2024, 1, day, 12, 0), uid, "view")

    # day1: users 1,2 ; day2: user 1 (twice) ; day9: user 3
    rows = [d(1, 1), d(1, 2), d(2, 1), d(2, 1), d(9, 3)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string")
    got = {str(r.day): (r.dau, r.wau, r.stickiness) for r in dau_wau(df).collect()}
    assert got["2024-01-01"][:2] == (2, 2)
    assert got["2024-01-02"][:2] == (1, 2)   # 7-day window still sees both users
    assert got["2024-01-09"][:2] == (1, 1)   # day 1-2 activity aged out
    assert abs(got["2024-01-02"][2] - 0.5) < 1e-12


def test_rfm_scores_hand_computed(spark):
    import datetime as dt

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.relational import (
        rfm_scores,
    )

    # 5 customers, one order each, staggered dates and prices
    rows = [
        (i, 100 + i, dt.datetime(2024, 1, 1 + i * 5), 100.0 * (i + 1))
        for i in range(5)
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate timestamp, o_totalprice double"
    )
    got = {r.o_custkey: r for r in rfm_scores(df, asof_date="2024-02-01").collect()}
    # most recent orderer (cust 104) gets r_score 5; oldest gets 1
    assert got[104].r_score == 5 and got[100].r_score == 1
    # biggest spender gets m_score 5
    assert got[104].m_score == 5 and got[100].m_score == 1
    # equal frequency: unique ranks spread scores but stay in 1..5
    assert all(1 <= got[c].f_score <= 5 for c in got)
    assert got[102].rec_days == (dt.date(2024, 2, 1) - dt.date(2024, 1, 11)).days


def test_cumulative_unique_users_hand_computed(spark):
    import datetime as dt

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        relational as R,
    )

    rows = [
        ("u1", dt.datetime(2024, 1, 1, 9)),
        ("u1", dt.datetime(2024, 1, 3, 9)),   # repeat: not new on day 3
        ("u2", dt.datetime(2024, 1, 1, 10)),
        ("u3", dt.datetime(2024, 1, 3, 11)),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = {str(r.day): (r.n_new, r.n_total) for r in
           R.cumulative_unique_users(df).collect()}
    assert got == {"2024-01-01": (2, 2), "2024-01-03": (1, 3)}


# ---------------------------------------------------------------------------
# round 8: seasonal decomposition + last-touch attribution
# ---------------------------------------------------------------------------


def test_seasonal_decompose_reconstructs_series(spark):
    import datetime

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        temporal as TP,
    )

    base = datetime.date(2024, 1, 1)
    rows = [
        (base + datetime.timedelta(days=i), 100.0 + i + (10.0 if (base + datetime.timedelta(days=i)).weekday() == 5 else 0.0))
        for i in range(28)
    ]
    daily = spark.createDataFrame(rows, "day date, y double")
    got = TP.seasonal_decompose(daily).collect()
    assert len(got) == 28
    for r in got:
        # additive identity holds exactly by construction
        assert abs((r.trend + r.seasonal + r.resid) - r.y) < 1e-9
    # the planted Saturday bump must dominate the seasonal component
    sat = [r.seasonal for r in got if r.day.weekday() == 5]
    rest = [r.seasonal for r in got if r.day.weekday() != 5]
    assert min(sat) > max(rest)


def test_attribution_last_touch_known_answer(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        temporal as TP,
    )

    rows = [
        # user 1: view -> click -> purchase -> purchase (2nd credits click too)
        (1, 100, 10, "view"),
        (1, 200, 11, "click"),
        (1, 300, 12, "purchase"),
        (1, 400, 13, "purchase"),
        # user 2: purchase with NO prior touch -> direct (nulls)
        (2, 100, 20, "purchase"),
        # user 3: touch AFTER the purchase must not count
        (3, 500, 30, "purchase"),
        (3, 600, 31, "click"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts_ns long, event_id long, event_type string"
    )
    got = {
        r.conv_id: (r.touch_id, r.touch_type, r.gap_ns)
        for r in TP.attribution_last_touch(ev).collect()
    }
    assert got == {
        12: (11, "click", 100),
        13: (11, "click", 200),  # purchases are not touchpoints
        20: (None, None, None),
        30: (None, None, None),
    }


# r14: part of the fast driver-gate subset (default `pytest` selection
# per pytest.ini; `-m ''` runs the full suite)
import pytest as _pytest

pytestmark = _pytest.mark.driver_gate
