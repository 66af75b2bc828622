"""Streaming top-k / hot-key monitor (streaming/topk.py): after every
wave the snapshot's top-10 must equal the one-shot batch skew report
over all rows sent so far — with a key whose per-batch counts OVERTAKE
the leader only across batches (the case per-batch top-k state cannot
see), across compaction, and across a stop/restart."""

from __future__ import annotations

from async_event_streams_spark.streaming.topk import (
    topk_batch_twin,
    topk_pipe,
    topk_snapshot,
)
from async_event_streams_spark.topics import Topic, TopicRegistry

_SCHEMA = "user_id long, value double"


def _waves():
    """Three waves engineered so user 7 trails in every single wave
    but leads the cumulative count by the end: a per-batch top-k
    could never report it; the delta-log merge must."""
    w0 = [{"user_id": 1, "value": 1.0}] * 10 + [{"user_id": 7, "value": 1.0}] * 6
    w1 = [{"user_id": 2, "value": 1.0}] * 9 + [{"user_id": 7, "value": 1.0}] * 7
    w2 = [{"user_id": 3, "value": 1.0}] * 8 + [{"user_id": 7, "value": 1.0}] * 9
    filler = [{"user_id": u, "value": 1.0} for u in range(100, 112)]
    return [w0 + filler, w1 + filler, w2 + filler]


def _as_rows(df):
    return [(r.user_id, r.cnt, r.share_ppm) for r in df.collect()]


def test_streaming_topk_equals_batch(spark, tmp_path):
    reg = TopicRegistry()
    src = Topic(spark, "topk_events", _SCHEMA, str(tmp_path / "t"), reg)
    sdir = str(tmp_path / "state")
    h = topk_pipe(src, sdir, compact_every=2)
    try:
        sofar = []
        for wave in _waves():
            src.send(wave, barrier="chain")
            sofar += wave
            got = _as_rows(topk_snapshot(spark, sdir))
            want = _as_rows(
                topk_batch_twin(spark.createDataFrame(sofar, _SCHEMA))
            )
            assert got == want, (got, want)
        # the cross-batch overtake actually happened
        assert got[0][0] == 7
    finally:
        h.stop()
        src.close()


def test_streaming_topk_restart_and_empty_state(spark, tmp_path):
    assert topk_snapshot(spark, str(tmp_path / "nothing")).count() == 0
    reg = TopicRegistry()
    src = Topic(spark, "topk_r", _SCHEMA, str(tmp_path / "t"), reg)
    sdir = str(tmp_path / "state")
    waves = _waves()
    h1 = topk_pipe(src, sdir, name="topk-r")
    src.send(waves[0], barrier="chain")
    h1.stop()
    src.post(waves[1])  # while down
    h2 = topk_pipe(src, sdir, name="topk-r")
    try:
        src.send(waves[2], barrier="chain")
        src.barrier()
        got = _as_rows(topk_snapshot(spark, sdir))
        want = _as_rows(
            topk_batch_twin(
                spark.createDataFrame(sum(waves, []), _SCHEMA)
            )
        )
        assert got == want
    finally:
        h2.stop()
        src.close()
