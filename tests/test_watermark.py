"""Watermark conformance (runtime check from SURVEY.md §2-C): in
append mode a window only emits once the watermark passes it, and
events arriving later than the watermark are dropped."""

from __future__ import annotations

import datetime

import pytest

from pyspark.sql import functions as F

from async_event_streams_spark.streaming import run_stream_to_memory, tumbling_counts
from async_event_streams_spark.topics import Topic, TopicRegistry


def ts(h: int, m: int = 0) -> str:
    return datetime.datetime(2024, 3, 1, h, m).isoformat()


def test_append_mode_finalizes_and_drops_late(spark, tmp_path):
    t = Topic(
        spark,
        "wm",
        "ev_ts string, user_id long, value double",
        str(tmp_path / "topics"),
        TopicRegistry(),
    )
    stream = t.subscribe().select(
        F.col("ev_ts").cast("timestamp").alias("ts"), "user_id", "value"
    )
    query, tbl = run_stream_to_memory(
        tumbling_counts(stream, window="1 hour", watermark="10 minutes"),
        output_mode="append",
    )
    t.attach_query(query)
    try:
        # three events in the 10:00 window
        t.send([
            {"ev_ts": ts(10, 0), "user_id": 1, "value": 1.0},
            {"ev_ts": ts(10, 20), "user_id": 1, "value": 1.0},
            {"ev_ts": ts(10, 40), "user_id": 1, "value": 1.0},
        ])
        # nothing final yet: watermark hasn't passed 11:00
        assert spark.sql(f"SELECT * FROM {tbl}").count() == 0

        # event at 12:00 pushes the watermark to 11:50 -> 10:00 window final
        t.send([{"ev_ts": ts(12, 0), "user_id": 1, "value": 1.0}])
        t.send([{"ev_ts": ts(12, 1), "user_id": 1, "value": 1.0}])  # extra batch so the final emit flushes
        final = {
            r.window_start: r.n_events
            for r in spark.sql(f"SELECT * FROM {tbl}").collect()
        }
        key = datetime.datetime(2024, 3, 1, 10, 0)
        assert final.get(key) == 3, final

        # a LATE event for 10:05 (far behind the 11:51 watermark) is dropped:
        # the finalized window is never re-emitted or corrected
        t.send([{"ev_ts": ts(10, 5), "user_id": 1, "value": 1.0}])
        t.send([{"ev_ts": ts(12, 2), "user_id": 1, "value": 1.0}])
        after = [
            r
            for r in spark.sql(f"SELECT * FROM {tbl}").collect()
            if r.window_start == key
        ]
        assert len(after) == 1 and after[0].n_events == 3, after
    finally:
        t.close()
