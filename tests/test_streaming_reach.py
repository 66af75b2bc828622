"""Streaming cumulative reach (streaming/reach.py): after every wave
the snapshot curve equals the one-shot batch curve over all rows sent
so far — with users REAPPEARING in later batches on later days (rows
the MIN-merge must ignore), across compaction and a restart."""

from __future__ import annotations

import datetime

from async_event_streams_spark.streaming.reach import (
    reach_batch_twin,
    reach_pipe,
    reach_snapshot,
)
from async_event_streams_spark.topics import Topic, TopicRegistry

_SCHEMA = "user_id long, event_ts timestamp"


def _waves():
    d = lambda day, h=0: datetime.datetime(2026, 3, day, h, 30)
    w0 = [{"user_id": u, "event_ts": d(1)} for u in (1, 2, 3)]
    # day 2: user 2 REAPPEARS (must not count again), users 4-5 new
    w1 = [{"user_id": 2, "event_ts": d(2)}] + [
        {"user_id": u, "event_ts": d(2)} for u in (4, 5)
    ]
    # day 3: users 1 and 4 reappear, user 6 new; also a user whose
    # FIRST row arrives in a later batch but with an EARLIER day
    # (late data) — min-merge must move them back to day 1
    w2 = [
        {"user_id": 1, "event_ts": d(3)},
        {"user_id": 4, "event_ts": d(3)},
        {"user_id": 6, "event_ts": d(3)},
        {"user_id": 7, "event_ts": d(1, 23)},  # late arrival, day 1
    ]
    return [w0, w1, w2]


def _rows(df):
    return [(r.day, r.new_users, r.cumulative_reach) for r in df.orderBy("day").collect()]


def test_streaming_reach_equals_batch(spark, tmp_path):
    reg = TopicRegistry()
    src = Topic(spark, "reach_ev", _SCHEMA, str(tmp_path / "t"), reg)
    sdir = str(tmp_path / "state")
    h = reach_pipe(src, sdir, compact_every=2)
    try:
        sofar = []
        for wave in _waves():
            src.send(wave, barrier="chain")
            sofar += wave
            got = _rows(reach_snapshot(spark, sdir))
            want = _rows(
                reach_batch_twin(spark.createDataFrame(sofar, _SCHEMA))
            )
            assert got == want, (got, want)
        # late day-1 row moved user 7 back: day 1 has 4 first-seens
        assert got[0][1] == 4
        assert got[-1][2] == 7  # 7 distinct users ever
    finally:
        h.stop()
        src.close()


def test_streaming_reach_restart(spark, tmp_path):
    assert reach_snapshot(spark, str(tmp_path / "none")).count() == 0
    reg = TopicRegistry()
    src = Topic(spark, "reach_r", _SCHEMA, str(tmp_path / "t"), reg)
    sdir = str(tmp_path / "state")
    waves = _waves()
    h1 = reach_pipe(src, sdir, name="reach-r")
    src.send(waves[0], barrier="chain")
    h1.stop()
    src.post(waves[1])  # while down
    h2 = reach_pipe(src, sdir, name="reach-r")
    try:
        src.send(waves[2], barrier="chain")
        src.barrier()
        got = _rows(reach_snapshot(spark, sdir))
        want = _rows(
            reach_batch_twin(spark.createDataFrame(sum(waves, []), _SCHEMA))
        )
        assert got == want
    finally:
        h2.stop()
        src.close()


def test_streaming_sliding_reach_equals_batch(spark, tmp_path):
    """SET-union state: after every wave the sweep-line reach curve
    from merged trio state equals the batch curve — with users
    re-appearing in the same hour across batches (rows DISTINCT must
    absorb) and activity gaps longer than the window."""
    import datetime

    from async_event_streams_spark.streaming.reach import (
        sliding_reach_batch_twin,
        sliding_reach_pipe,
        sliding_reach_snapshot,
    )

    # event_type rides the topic ENVELOPE (post() lifts it from the
    # row dict); the batch twin sees it as a plain column
    schema = "user_id long, event_ts timestamp"
    twin_schema = "user_id long, event_type string, event_ts timestamp"
    t0 = datetime.datetime(2026, 3, 1, 0, 10)

    def ev(u, et, hours):
        return {
            "user_id": u,
            "event_type": et,
            "event_ts": t0 + datetime.timedelta(hours=hours),
        }

    waves = [
        [ev(1, "view", 0), ev(2, "view", 1), ev(1, "click", 0)],
        # duplicate trio re-sent across batches + a 40h gap for user 1
        [ev(1, "view", 0), ev(1, "view", 40), ev(3, "view", 2)],
        [ev(2, "view", 41), ev(1, "click", 30)],
    ]
    reg = TopicRegistry()
    src = Topic(spark, "sreach", schema, str(tmp_path / "t"), reg)
    sdir = str(tmp_path / "state")
    h = sliding_reach_pipe(src, sdir, compact_every=2)
    try:
        sofar = []
        for wave in waves:
            src.send(wave, barrier="chain")
            sofar += wave
            got = {
                (r.event_type, r.win_hour): r.exact_reach
                for r in sliding_reach_snapshot(spark, sdir).collect()
            }
            want = {
                (r.event_type, r.win_hour): r.exact_reach
                for r in sliding_reach_batch_twin(
                    spark.createDataFrame(sofar, twin_schema)
                ).collect()
            }
            assert got == want, (got, want)
        # the 40h gap split user 1's coverage: hour-40 window must not
        # still count the hour-0 activity
        view40 = [v for (et, w), v in got.items() if et == "view" and w >= 490000]
        assert view40  # sanity: windows exist in the gap region
    finally:
        h.stop()
        src.close()
