"""The reference's hardest observable guarantees, streamed end-to-end:

- per-subscriber FIFO total order (src/lib.rs:41-42): events observed in
  send order, asserted WITHOUT sorting;
- ordered fan-in via causal chaining (tests/event_test.rs:47-128): route
  to evens/odds pipes, merge at a shared sink, and the merged arrival
  order is exactly 0,1,2,… when each send gates on the full downstream
  cascade (SURVEY.md §3.3 / §8-H2);
- per-event barrier fidelity (§8-H1): with one-segment batches every
  micro-batch carries exactly one event.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from async_event_streams_spark.topics import Topic, TopicRegistry, pipe


@pytest.fixture()
def topic_root(tmp_path):
    return str(tmp_path / "topics")


def test_per_subscriber_fifo_order(spark, topic_root):
    """Observed order equals send order — no sort in the assertion."""
    t = Topic(spark, "fifo", "n long", topic_root, TopicRegistry())
    seen: list[int] = []
    pipe(
        t,
        sink_fn=lambda df, b: seen.extend(
            r.n for r in df.orderBy("event_id").collect()
        ),
        name="ordered-sub",
    )
    try:
        for chunk in range(5):  # 5 separate publishes of 10 events each
            t.post([{"n": chunk * 10 + i} for i in range(10)])
        t.barrier()
        assert seen == list(range(50))
    finally:
        t.close()


def test_ordered_fanin_with_chain_barrier(spark, topic_root):
    """The event_test.rs:47-128 topology: numbers fan out to parity
    routes, re-merge at one sink; dependent-event chaining (here: chain
    barrier per send) forces merged arrival order 0,1,2,…"""
    reg = TopicRegistry()
    nums = Topic(spark, "nums", "n long", topic_root, reg)
    evens = Topic(spark, "evens", "n long", topic_root, reg)
    odds = Topic(spark, "odds", "n long", topic_root, reg)

    pipe(
        nums,
        fn=lambda df: df.filter(F.col("n") % 2 == 0).select("source_event_id", "n"),
        target=evens,
        name="route-even",
    )
    pipe(
        nums,
        fn=lambda df: df.filter(F.col("n") % 2 == 1).select("source_event_id", "n"),
        target=odds,
        name="route-odd",
    )
    merged: list[int] = []
    pipe(evens, sink_fn=lambda df, b: merged.extend(r.n for r in df.collect()), name="merge-e")
    pipe(odds, sink_fn=lambda df, b: merged.extend(r.n for r in df.collect()), name="merge-o")

    try:
        n_events = 16
        for n in range(n_events):
            # send_event(n, source): the chain barrier is the engine's
            # dependent-event protocol — n+1 cannot be published until
            # n's full cascade (route -> merge) completed.
            nums.send([{"n": n}], barrier="chain")
        assert merged == list(range(n_events)), merged
    finally:
        for t in (nums, evens, odds):
            t.close()


def test_per_event_batches(spark, topic_root):
    """max_segments_per_batch=1 gives per-event micro-batches — the
    strict per-event barrier granularity of send_event (§8-H1)."""
    t = Topic(spark, "perevent", "n long", topic_root, TopicRegistry())
    batches: list[list[int]] = []
    stream = t.subscribe(max_segments_per_batch=1)
    q = (
        stream.writeStream.foreachBatch(
            lambda df, b: batches.append([r.n for r in df.collect()])
        )
        .option("checkpointLocation", f"{topic_root}/perevent-ckpt")
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    t.attach_query(q)
    try:
        for n in range(6):
            t.post([{"n": n}])
        t.barrier()
        non_empty = [b for b in batches if b]
        assert non_empty == [[n] for n in range(6)], non_empty
    finally:
        t.close()


def test_approx_percentile_within_tolerance(spark, sf_dir):
    """The scale path for percentiles (c_agg_median docstring): GK-sketch
    approx_percentile must land within 1% relative of the exact value."""
    from async_event_streams_spark.tables import table

    orders = table(spark, sf_dir, "orders")
    exact = orders.agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("m")
    ).first().m
    approx = orders.agg(
        F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(10000)).alias("m")
    ).first().m
    assert abs(approx - exact) / exact < 0.01, (exact, approx)


def test_barrier_advances_committed_batches(spark, topic_root):
    """B9 via StreamingQueryProgress: after send() returns, the
    subscriber's committed batch id has advanced past the pre-send id
    (the micro-batch analog of the reference's event-held probe,
    tests/event_test.rs:25-35)."""
    t = Topic(spark, "progress", "v long", topic_root, TopicRegistry())
    h = pipe(t, sink_fn=lambda df, b: None, name="psub")
    try:
        t.send([{"v": 1}])
        before = h.query.lastProgress["batchId"]
        t.send([{"v": 2}])
        after = h.query.lastProgress["batchId"]
        assert after > before, (before, after)
    finally:
        t.close()


def test_approx_distinct_within_error_bound(spark, sf_dir):
    """Companion to c_agg_approx_distinct: HLL++ at rsd=0.01 must land
    within 2% of the exact distinct count."""
    from async_event_streams_spark.tables import table

    events = table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.01).alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(1, 0.02 * n), (k, n, approx[k])


def test_table_profile_sketch_ndv_within_10pct_of_exact(spark, sf_dir):
    """Companion to c_table_profile_sketch: its oracle can only encode
    the cross-sketch agreement verdict (anchoring on exact NDV in the
    query would re-introduce the corpus-NDV shuffle the lane removes),
    so the accuracy contract vs EXACT NDV lives here, where exact is
    affordable — BOTH sketch families within 10% per profiled column."""
    from async_event_streams_spark.queries.relational import _PROFILE_COLS
    from async_event_streams_spark.tables import table

    li = table(spark, sf_dir, "lineitem")
    dtypes = dict(li.dtypes)
    aggs = []
    for c, _ in _PROFILE_COLS:
        # same input selection as the query: native for integer
        # columns, string form otherwise
        ds_in = (
            F.col(c)
            if dtypes.get(c) in ("bigint", "int")
            else F.col(c).cast("string")
        )
        aggs += [
            F.countDistinct(c).alias(f"ex_{c}"),
            F.approx_count_distinct(c, 0.04).alias(f"pp_{c}"),
            F.hll_sketch_estimate(F.hll_sketch_agg(ds_in)).alias(f"ds_{c}"),
        ]
    row = li.agg(*aggs).collect()[0]
    for c, _ in _PROFILE_COLS:
        ex = row[f"ex_{c}"]
        for fam in ("pp", "ds"):
            got = row[f"{fam}_{c}"]
            assert abs(got - ex) <= max(1, 0.10 * ex), (c, fam, ex, got)
