"""Bulk publish: executor-written parquet flows into the topic through
a marker segment; subscribers see envelope rows with reserved ids."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from async_event_streams_spark.topics import Topic, TopicRegistry, pipe


@pytest.fixture()
def topic_root(tmp_path):
    return str(tmp_path / "topics")


def test_bulk_rows_reach_subscribers_with_envelope(spark, topic_root):
    t = Topic(spark, "bulk", "k long, v double", topic_root, TopicRegistry())
    seen: list[tuple] = []
    pipe(
        t,
        sink_fn=lambda df, b: seen.extend(
            (r.event_id, r.event_type, r.k, r.v) for r in df.collect()
        ),
        name="bulk-sub",
    )
    try:
        df = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 0.5).alias("v")
        )
        first, last = t.send_df(df, event_type="bulk-tick")
        assert (first, last) == (0, 999)
        assert len(seen) == 1000
        ids = sorted(s[0] for s in seen)
        assert ids == list(range(1000))  # reserved contiguous range
        assert all(s[1] == "bulk-tick" for s in seen)
        ks = {s[0]: s[2] for s in seen}
        assert len(set(ks.values())) == 1000  # every payload row delivered
    finally:
        t.close()


def test_bulk_and_row_publishes_interleave(spark, topic_root):
    t = Topic(spark, "mixed_bulk", "k long", topic_root, TopicRegistry())
    t.post([{"k": -1}])  # row segment: id 0
    df = spark.range(0, 50).select(F.col("id").alias("k"))
    base, hi = t.post_df(df)
    assert (base, hi) == (1, 50)
    first, _ = t.post([{"k": -2}])  # row segment after bulk
    assert first == 51
    # restart recovery across a trailing row segment AND a bulk marker
    t2 = Topic(spark, "mixed_bulk", "k long", topic_root, TopicRegistry())
    nxt, _ = t2.post([{"k": -3}])
    assert nxt == 52
    rows = t2.batch_df()
    assert rows.count() == 53


def test_bulk_rejects_unknown_columns(spark, topic_root):
    t = Topic(spark, "bulk_bad", "k long", topic_root, TopicRegistry())
    df = spark.range(3).select(F.col("id").alias("k"), F.col("id").alias("zzz"))
    with pytest.raises(ValueError, match="zzz"):
        t.post_df(df)


def test_bulk_lineage_column_preserved(spark, topic_root):
    t = Topic(spark, "bulk_lin", "k long", topic_root, TopicRegistry())
    df = spark.range(0, 5).select(
        F.col("id").alias("k"), (F.col("id") + 100).alias("source_event_id")
    )
    t.post_df(df)
    rows = {r.k: r.source_event_id for r in t.batch_df().collect()}
    assert rows == {i: i + 100 for i in range(5)}
