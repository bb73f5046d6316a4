"""Custom stateful streaming operators (applyInPandasWithState).

The built-in windowed aggregations (pipeline.py) cover tumbling/sliding
stats; inactivity-gap sessionization needs *custom* per-key state: a
session has no fixed window — it closes only when the key goes quiet
for the gap. This is the Structured Streaming analogue of the batch
``events_sessionized`` operator (same gap semantics, verified against
it in tests): per user we hold the open session in state, emit a
session row whenever a new event arrives past the gap, and keep the
still-open session for the next micro-batch.

Scale notes: state is per user_id — partitioned by the grouping key
across executors, size O(active users × one session struct). The gap
rollover logic touches only each user's buffered events, never a
global structure. For production, pair with watermark-based state TTL
(``GroupStateTimeout.EventTimeTimeout``) so dead keys are evicted and
their final sessions emitted; the core rollover path below is the same
either way.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

OUTPUT_SCHEMA = (
    "user_id long, session_id int, n_events long, "
    "session_start_us long, session_end_us long, session_value double"
)
#: open-session carryover: ordinal, bounds, count, value sum
STATE_SCHEMA = "session_id int, start_us long, end_us long, n long, value double"


GAP_US = 30 * 60 * 1_000_000

_OUT_COLS = [
    "user_id", "session_id", "n_events",
    "session_start_us", "session_end_us", "session_value",
]


def _sessionize_user(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state,
    evict: bool = False,
) -> Iterator[pd.DataFrame]:
    """Per-user rollover: merge the micro-batch's events (sorted by
    time) into the open session; every gap break emits the closed
    session and bumps the ordinal. With ``evict``, a key whose
    event-time timeout fired emits its open session as FINAL and drops
    its state — dead keys cost nothing once the watermark passes
    their last event + gap."""
    (user_id,) = key
    if evict and state.hasTimedOut:
        if state.exists:
            sess_id, start_us, end_us, n, value = state.get
            state.remove()
            if start_us is not None:
                yield pd.DataFrame(
                    [(user_id, sess_id, n, start_us, end_us, value)], columns=_OUT_COLS
                )
        return
    events = pd.concat(list(pdfs), ignore_index=True).sort_values(["ts_us", "event_id"])
    if state.exists:
        sess_id, start_us, end_us, n, value = state.get
    else:
        sess_id, start_us, end_us, n, value = 1, None, None, 0, 0.0

    closed = []
    for ts_us, val in zip(events["ts_us"], events["value"]):
        ts_us = int(ts_us)
        if start_us is None:
            start_us, end_us, n, value = ts_us, ts_us, 1, float(val)
        elif ts_us - end_us > GAP_US:
            closed.append((user_id, sess_id, n, start_us, end_us, value))
            sess_id += 1
            start_us, end_us, n, value = ts_us, ts_us, 1, float(val)
        else:
            end_us, n, value = ts_us, n + 1, value + float(val)

    state.update((sess_id, start_us, end_us, n, value))
    if evict:
        # close once the watermark passes last event + gap; the guard
        # keeps Spark's "timeout must exceed watermark" contract when
        # this key's events arrived far behind the global watermark
        timeout_ms = (end_us + GAP_US) // 1000
        state.setTimeoutTimestamp(max(timeout_ms, state.getCurrentWatermarkMs() + 1))
    if closed:
        yield pd.DataFrame(closed, columns=_OUT_COLS)


def _sessionize_user_evicting(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state
) -> Iterator[pd.DataFrame]:
    yield from _sessionize_user(key, pdfs, state, evict=True)


def stream_sessionize(
    spark,
    source_dir: str,
    schema: str = "event_id long, ts_us long, user_id long, value double",
    watermark: str | None = None,
):
    """Streaming inactivity-gap sessionization: file source → grouped
    custom state → closed-session rows. Returns the unstarted streaming
    DataFrame; callers attach a sink (tests use the memory sink with
    ``trigger(availableNow=True)``).

    Emits a session row when the session CLOSES (a later event for the
    same user breaks the gap). Without ``watermark`` the final open
    session per user stays in state forever — identical semantics to
    the reference's append-only insert stream feeding a windowed
    consumer, but state grows with the key set. With ``watermark``
    (e.g. ``"1 hour"``), ``GroupStateTimeout.EventTimeTimeout`` evicts
    each key once the watermark passes its last event + gap: the open
    session is emitted as final and the key's state is dropped — the
    production posture for unbounded key sets.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = spark.readStream.schema(schema).parquet(source_dir)
    if watermark is None:
        return stream.groupBy("user_id").applyInPandasWithState(
            _sessionize_user,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    with_ts = stream.withColumn("ts", F.timestamp_micros(F.col("ts_us"))).withWatermark(
        "ts", watermark
    )
    return with_ts.groupBy("user_id").applyInPandasWithState(
        _sessionize_user_evicting,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


RATE_OUTPUT_SCHEMA = "event_id long, user_id long, ts_us long, win_start_us long, admitted boolean"
RATE_STATE_SCHEMA = "win_start_us long, n long"


def _make_rate_limiter(max_per_window: int, window_us: int):
    def _rate_limit_user(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            cur_win, n = state.get
        else:
            cur_win, n = -1, 0
        # one key's micro-batch may arrive as several chunks whose ts
        # ranges interleave — concatenate before sorting so the
        # admission order matches the batch twin's (ts, id) order
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            pdf = pdf.sort_values(["ts_us", "event_id"])
            wins, admits = [], []
            for ts in pdf["ts_us"]:
                win = int(ts) - int(ts) % window_us
                if win != cur_win:
                    cur_win, n = win, 0
                admits.append(n < max_per_window)
                n += 1
                wins.append(win)
            out = pdf[["event_id", "user_id", "ts_us"]].copy()
            out["win_start_us"] = wins
            out["admitted"] = admits
            yield out
        state.update((int(cur_win), int(n)))

    return _rate_limit_user


def stream_rate_limit(
    spark,
    source_dir: str,
    max_per_window: int = 5,
    window_sec: int = 3600,
    schema: str = "event_id long, ts_us long, user_id long, value double",
):
    """Streaming per-key admission control: file source → grouped
    custom state → every event tagged ``admitted``/rejected against a
    tumbling per-user quota. The decision the batch twin
    (``pipeline.events_rate_limit``) makes offline, made on arrival.

    State per key is ONE ``(window_start, count)`` struct — O(active
    keys), independent of event volume; window rollover resets the
    counter in place. Late events from an already-rolled-over window
    are counted against a fresh counter (bounded state is the contract;
    exact late-data accounting would need per-window counters with
    watermark eviction). On in-order input, stream ≡ batch — asserted
    in tests.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = spark.readStream.schema(schema).parquet(source_dir)
    return stream.groupBy("user_id").applyInPandasWithState(
        _make_rate_limiter(max_per_window, window_sec * 1_000_000),
        outputStructType=RATE_OUTPUT_SCHEMA,
        stateStructType=RATE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
