"""sessionize: completed sessions emit exactly when an event-time gap
closes them, with the open session held in state across micro-batches.
Runs on the compat (applyInPandasWithState) engine everywhere; the
transformWithStateInPandas engine activates automatically where
protobuf is available (gated — absent in this container)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from async_event_streams_spark.streaming import run_stream_to_memory, sessionize
from async_event_streams_spark.streaming.stateful import _protobuf_available
from async_event_streams_spark.topics import Topic, TopicRegistry


def test_tws_engine_gated_cleanly():
    if not _protobuf_available():
        # auto must fall back, and the gate must be the documented one
        import importlib
        with pytest.raises(ImportError):
            importlib.import_module("google.protobuf")


def test_sessionize_across_batches(spark, tmp_path):
    t = Topic(
        spark,
        "sess2",
        "user_id long, ts_sec double, value double",
        str(tmp_path / "topics"),
        TopicRegistry(),
    )
    stream = t.subscribe().select("user_id", "ts_sec", "value")
    query, tbl = run_stream_to_memory(
        sessionize(stream, gap_seconds=60.0), output_mode="append"
    )
    t.attach_query(query)
    try:
        # batch 1: two events 10s apart (one open session)
        t.send([
            {"user_id": 1, "ts_sec": 1000.0, "value": 1.0},
            {"user_id": 1, "ts_sec": 1010.0, "value": 2.0},
        ])
        assert spark.sql(f"SELECT * FROM {tbl}").count() == 0  # still open

        # batch 2: event 100s later -> closes session #1 (across batches!)
        t.send([{"user_id": 1, "ts_sec": 1110.0, "value": 4.0}])
        rows = spark.sql(f"SELECT * FROM {tbl}").collect()
        assert len(rows) == 1
        s = rows[0]
        assert (s.user_id, s.session_start, s.n_events, s.total) == (1, 1000.0, 2, 3.0)

        # batch 3: two users interleaved; user 1 closes again, user 2 stays open
        t.send([
            {"user_id": 1, "ts_sec": 1300.0, "value": 8.0},
            {"user_id": 2, "ts_sec": 1300.0, "value": 16.0},
        ])
        rows = {(r.user_id, r.session_start): (r.n_events, r.total)
                for r in spark.sql(f"SELECT * FROM {tbl}").collect()}
        assert rows == {(1, 1000.0): (2, 3.0), (1, 1110.0): (1, 4.0)}
    finally:
        t.close()


def test_streaming_ewma_matches_batch_fold(spark, tmp_path):
    """streaming_ewma == the c_ewma fold, across micro-batch
    boundaries: frames SPAN batches (the deque state must carry), and
    every input row gets exactly one output row with the exact
    integer arithmetic of the batch query."""
    from async_event_streams_spark.streaming.stateful import streaming_ewma

    t = Topic(
        spark,
        "ewma_t",
        "user_id long, seq long, x_micro long",  # event_id is envelope
        str(tmp_path / "topics"),
        TopicRegistry(),
    )
    stream = t.subscribe().select(
        "user_id", F.col("seq").alias("event_id"), "x_micro"
    )
    query, tbl = run_stream_to_memory(
        streaming_ewma(stream), output_mode="append"
    )
    t.attach_query(query)
    try:
        rows = [
            {"user_id": u, "seq": 100 * i + u, "x_micro": (i * 37 + u * 11) % 500}
            for i in range(12)
            for u in (1, 2)
        ]
        # three waves of 8 — every user's 8-frame spans batches
        for lo in range(0, 24, 8):
            t.send(rows[lo : lo + 8])
        got = {
            (r.user_id, r.event_id): (r.x_micro, r.ewma_pico)
            for r in spark.sql(f"SELECT * FROM {tbl}").collect()
        }
        assert len(got) == len(rows)
        hist: dict[int, list[int]] = {}
        for r in sorted(rows, key=lambda r: r["seq"]):
            h = hist.setdefault(r["user_id"], [])
            h.append(r["x_micro"])
            frame = h[-8:]
            num = sum(v * (1 << i) for i, v in enumerate(frame))
            den = (1 << len(frame)) - 1
            assert got[(r["user_id"], r["seq"])] == (
                r["x_micro"],
                (num * 1_000_000) // den,
            ), r
    finally:
        t.close()
