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


def _sessionize_user(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state,
) -> Iterator[pd.DataFrame]:
    """Per-user rollover: merge the micro-batch's events (sorted by
    time) into the open session; every gap break emits the closed
    session and bumps the ordinal."""
    gap_us = 30 * 60 * 1_000_000
    (user_id,) = key
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
        elif ts_us - end_us > gap_us:
            closed.append((user_id, sess_id, n, start_us, end_us, value))
            sess_id += 1
            start_us, end_us, n, value = ts_us, ts_us, 1, float(val)
        else:
            end_us, n, value = ts_us, n + 1, value + float(val)

    state.update((sess_id, start_us, end_us, n, value))
    if closed:
        yield pd.DataFrame(
            closed,
            columns=[
                "user_id", "session_id", "n_events",
                "session_start_us", "session_end_us", "session_value",
            ],
        )


def stream_sessionize(spark, source_dir: str, schema: str = "event_id long, ts_us long, user_id long, value double"):
    """Streaming inactivity-gap sessionization: file source → grouped
    custom state → closed-session rows. Returns the unstarted streaming
    DataFrame; callers attach a sink (tests use the memory sink with
    ``trigger(availableNow=True)``).

    Emits a session row when the session CLOSES (a later event for the
    same user breaks the gap); the final open session per user stays in
    state — identical semantics to the reference's append-only insert
    stream feeding a windowed consumer.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = spark.readStream.schema(schema).parquet(source_dir)
    return stream.groupBy("user_id").applyInPandasWithState(
        _sessionize_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
