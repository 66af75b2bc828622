"""The reference's own documented usage scenarios, reproduced on the
engine (citations → /root/reference/):

- README.md:19-31 / src/lib.rs:9-37: create topic, count subscribers,
  send three literal events (42, 451, 1984), drop topic, subscriber
  drains exactly those values then sees end-of-stream;
- src/lib.rs:56-73: the Apply/Close motivating scenario — a Close
  event must not be processed before the Apply cascade it follows
  completes (dependent events give cross-topic happens-before);
- H6 (SURVEY.md §8): one topic carrying multiple event types; sinks
  filter by the event_type discriminator.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from async_event_streams_spark.topics import Topic, TopicRegistry, pipe


@pytest.fixture()
def topic_root(tmp_path):
    return str(tmp_path / "topics")


def test_readme_usage(spark, topic_root):
    """README.md:19-31: count() == 1 after subscribing; the subscriber
    receives exactly 42, 451, 1984 in order; close → end-of-stream."""
    reg = TopicRegistry()
    streams = Topic(spark, "usize", "n long", topic_root, reg)
    received: list[int] = []
    pipe(
        streams,
        sink_fn=lambda df, b: received.extend(
            r.n for r in df.orderBy("event_id").collect()
        ),
        name="reader",
    )
    assert streams.count() == 1
    for v in (42, 451, 1984):
        streams.send([{"n": v}])
    streams.close(drain=True)
    assert received == [42, 451, 1984]
    assert streams.count() == 0  # end-of-stream: subscriber detached


def test_apply_close_happens_before(spark, topic_root):
    """src/lib.rs:56-73: clicking Apply then Close must not destroy the
    dialog before Apply's (slow, fanned-out) cascade completed. Engine
    form: send(Apply, barrier='chain') gates on the derived work; the
    Close handler then always observes the applied result."""
    reg = TopicRegistry()
    buttons = Topic(spark, "buttons", "action string", topic_root, reg)
    applied = Topic(spark, "applied", "result string", topic_root, reg)

    # Apply pipe: derives a result event (the expensive cascade)
    pipe(
        buttons,
        fn=lambda df: df.filter(F.col("action") == "apply").select(
            "source_event_id", F.lit("settings-applied").alias("result")
        ),
        target=applied,
        name="apply-handler",
    )
    state = {"applied_results": 0, "applied_at_close": None}
    pipe(
        applied,
        sink_fn=lambda df, b: state.__setitem__(
            "applied_results", state["applied_results"] + df.count()
        ),
        name="apply-sink",
    )

    def close_handler(df, batch_id):
        if df.filter(F.col("action") == "close").count() > 0:
            state["applied_at_close"] = state["applied_results"]

    pipe(buttons, sink_fn=close_handler, name="close-handler")

    try:
        # Apply gates on its whole cascade; Close is sent after.
        buttons.send([{"action": "apply"}], barrier="chain")
        buttons.send([{"action": "close"}], barrier="chain")
        # the Close handler saw the applied result — never a torn state
        assert state["applied_at_close"] == 1, state
    finally:
        buttons.close()
        applied.close()


def test_multi_type_topic_with_filtered_sinks(spark, topic_root):
    """H6: a single topic carries several event types; each sink
    filters on the event_type discriminator column."""
    reg = TopicRegistry()
    t = Topic(spark, "mixed", "payload string", topic_root, reg)
    clicks: list[str] = []
    keys: list[str] = []
    pipe(
        t,
        sink_fn=lambda df, b: clicks.extend(
            r.payload for r in df.filter(F.col("event_type") == "click").collect()
        ),
        name="click-sink",
    )
    pipe(
        t,
        sink_fn=lambda df, b: keys.extend(
            r.payload for r in df.filter(F.col("event_type") == "key").collect()
        ),
        name="key-sink",
    )
    try:
        t.send(
            [
                {"payload": "btn1", "event_type": "click"},
                {"payload": "esc", "event_type": "key"},
                {"payload": "btn2", "event_type": "click"},
            ]
        )
        assert clicks == ["btn1", "btn2"]
        assert keys == ["esc"]
    finally:
        t.close()
