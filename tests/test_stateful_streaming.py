"""Custom stateful streaming sessionization vs the batch operator: the
closed sessions a stream emits must match the batch sessionization of
the same data (minus each user's final, still-open session)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.streaming import (
    pipeline as P,
    stateful as ST,
)

SF_DIR = "/root/testdata/sf0.001"


def test_stream_sessionize_matches_batch_closed_sessions(spark, tables):
    events = tables["events"].select(
        "event_id", F.expr("ts_ns div 1000").alias("ts_us"), "user_id", "value"
    )
    tmp = tempfile.mkdtemp(prefix="stateful_src_")
    try:
        events.write.mode("overwrite").parquet(tmp + "/src")
        sdf = ST.stream_sessionize(spark, tmp + "/src")
        q = (
            sdf.writeStream.format("memory")
            .queryName("stream_sessions")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            (r.user_id, r.session_id): (r.n_events, r.session_start_us, r.session_end_us)
            for r in spark.sql("select * from stream_sessions").collect()
        }
        batch = P.events_sessionized_us(tables["events"], gap_minutes=30).collect()
        # drop each user's last session — it is still open in stream state
        last = {}
        for r in batch:
            last[r.user_id] = max(last.get(r.user_id, 0), r.session_id)
        expect = {
            (r.user_id, r.session_id): (r.n_events, r.session_start_us, r.session_end_us)
            for r in batch
            if r.session_id != last[r.user_id]
        }
        assert got == expect
        assert len(got) > 0  # the dataset must actually exercise rollover
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
