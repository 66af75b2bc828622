"""Streaming materialized-view maintenance: after every wave the
snapshot must equal the one-shot rollup over all rows sent so far —
including groups whose rows span multiple batches — and compaction
must never change the answer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from async_event_streams_spark.streaming import mv_rollup_pipe, mv_snapshot
from async_event_streams_spark.streaming.mv import _rollup
from async_event_streams_spark.tables import table
from async_event_streams_spark.topics import Topic, TopicRegistry


@pytest.fixture()
def topic_root(tmp_path):
    return str(tmp_path / "topics")


def _as_set(df):
    return {
        (r.priority, r.month, r.n_orders, r.revenue_c) for r in df.collect()
    }


@pytest.mark.parametrize("compact_every", [None, 2])
def test_streaming_mv_equals_batch(spark, sf_dir, topic_root, compact_every):
    rows = (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_orderdate", "o_totalprice")
        .orderBy("o_orderkey")  # interleaves priorities/months across
        .limit(300)  # waves -> every group spans batches
        .collect()
    )
    reg = TopicRegistry()
    src = Topic(
        spark,
        f"mv_orders_{compact_every}",
        "o_orderkey long, o_orderpriority string, "
        "o_orderdate timestamp, o_totalprice double",
        topic_root,
        reg,
    )
    sdir = f"{topic_root}/mv-state-{compact_every}"
    h = mv_rollup_pipe(
        src, sdir, name=f"mv-pipe-{compact_every}", compact_every=compact_every
    )
    try:
        sofar = []
        for lo in range(0, 300, 100):
            wave = rows[lo : lo + 100]
            src.send(
                [
                    {
                        "o_orderkey": r.o_orderkey,
                        "o_orderpriority": r.o_orderpriority,
                        "o_orderdate": r.o_orderdate,
                        "o_totalprice": r.o_totalprice,
                    }
                    for r in wave
                ],
                barrier="chain",
            )
            sofar += wave
            batch = _rollup(
                spark.createDataFrame(
                    sofar,
                    "o_orderkey long, o_orderpriority string, "
                    "o_orderdate timestamp, o_totalprice double",
                )
            )
            assert _as_set(mv_snapshot(spark, sdir)) == _as_set(batch)
        # the spanning-group property actually held: fewer groups than
        # rows means groups merged across batches
        n_groups = mv_snapshot(spark, sdir).count()
        assert 0 < n_groups < len(sofar)
    finally:
        h.stop()
        src.close()


def test_mv_pipe_restart_resumes_and_stays_batch_equal(spark, sf_dir, topic_root):
    """Stop the MV pipe mid-stream, publish while down, restart with
    the same name: the snapshot must equal the one-shot rollup — the
    delta log's batch=N overwrite plus checkpoint offsets make the
    partials exactly-once across incarnations."""
    rows = (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_orderdate", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(200)
        .collect()
    )
    def payload(rs):
        return [
            {
                "o_orderkey": r.o_orderkey,
                "o_orderpriority": r.o_orderpriority,
                "o_orderdate": r.o_orderdate,
                "o_totalprice": r.o_totalprice,
            }
            for r in rs
        ]

    reg = TopicRegistry()
    src = Topic(
        spark,
        "mv_orders_r",
        "o_orderkey long, o_orderpriority string, "
        "o_orderdate timestamp, o_totalprice double",
        topic_root,
        reg,
    )
    sdir = f"{topic_root}/mv-state-r"
    h1 = mv_rollup_pipe(src, sdir, name="mv-pipe-r")
    src.send(payload(rows[:100]), barrier="chain")
    h1.stop()
    src.post(payload(rows[100:]))  # while down
    h2 = mv_rollup_pipe(src, sdir, name="mv-pipe-r")
    try:
        src.barrier()
        batch = _rollup(
            spark.createDataFrame(
                rows,
                "o_orderkey long, o_orderpriority string, "
                "o_orderdate timestamp, o_totalprice double",
            )
        )
        assert _as_set(mv_snapshot(spark, sdir)) == _as_set(batch)
    finally:
        h2.stop()
        src.close()


def test_mv_pipe_custom_moments_view_stream_equals_batch(
    spark, sf_dir, topic_root
):
    """The mergeable-moments view (c_moments_mergeable's (n, Σx, Σx²)
    partials) maintained as a STREAM through the generalized MV pipe:
    per-type moment state folds by plain decimal addition, so after
    every wave the merged stream state must equal the one-shot moments
    over all rows so far — bit-exactly, because the partials are exact
    integers (micro-units in DECIMAL(38,0)). This is the streaming
    statistics architecture the batch query's docstring promises."""
    from pyspark.sql import functions as F

    def rollup(df):
        micro = F.floor(F.col("value") * 1000000).cast("long")
        return df.groupBy("etype").agg(
            F.count("*").cast("long").alias("pn"),
            F.sum(micro.cast("decimal(38,0)")).alias("ps"),
            F.sum((micro * micro).cast("decimal(38,0)")).alias("pq"),
        )

    def merge(partials):
        return partials.groupBy("etype").agg(
            F.sum("pn").cast("long").alias("pn"),
            F.sum("ps").cast("decimal(38,0)").alias("ps"),
            F.sum("pq").cast("decimal(38,0)").alias("pq"),
        )

    rows = [
        {"etype": r.event_type, "value": r.value}
        for r in table(spark, sf_dir, "events")
        .select("event_type", "value")
        .orderBy("event_id")
        .limit(300)
        .collect()
    ]
    reg = TopicRegistry()
    src = Topic(
        spark, "moments_ev", "etype string, value double", topic_root, reg
    )
    sdir = f"{topic_root}/moments-state"
    h = mv_rollup_pipe(
        src, sdir, name="moments-pipe", compact_every=2,
        rollup_fn=rollup, merge_fn=merge,
    )

    def as_set(df):
        return {(r.etype, r.pn, str(r.ps), str(r.pq)) for r in df.collect()}

    try:
        sofar = []
        for lo in range(0, 300, 100):
            src.send(rows[lo : lo + 100], barrier="chain")
            sofar += rows[lo : lo + 100]
            batch = rollup(
                spark.createDataFrame(sofar, "etype string, value double")
            )
            got = mv_snapshot(spark, sdir, merge_fn=merge)
            assert as_set(got) == as_set(batch)
        # every type's rows spanned batches (the merge actually merged)
        assert all(r.pn > 1 for r in got.collect())
    finally:
        h.stop()
        src.close()


def test_mv_pipe_streaming_bitmap_index_stream_equals_batch(
    spark, sf_dir, topic_root
):
    """The bitmap INDEX maintained incrementally: bit_or is
    associative/commutative/idempotent, so per-batch per-(type, word)
    mask partials fold through the generalized MV pipe and the merged
    snapshot must equal the one-shot c_bitmap_index build over all
    rows so far — bit-for-bit, including words whose rows arrive in
    different batches (the case a rebuild-only indexer pays a full
    scan for). Popcount is derived at snapshot time, never stored."""
    from pyspark.sql import functions as F

    WORD = 32

    def rollup(df):
        return df.groupBy(
            "etype",
            F.expr(f"row_id DIV {WORD}").cast("long").alias("word_idx"),
        ).agg(
            F.bit_or(
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), CAST(row_id % {WORD} AS INT))"
                )
            )
            .cast("long")
            .alias("mask")
        )

    def merge(partials):
        return partials.groupBy("etype", "word_idx").agg(
            F.bit_or("mask").cast("long").alias("mask")
        )

    rows = [
        {"row_id": r.event_id, "etype": r.event_type}
        for r in table(spark, sf_dir, "events")
        .select("event_id", "event_type")
        .orderBy("event_id")
        .limit(300)
        .collect()
    ]
    reg = TopicRegistry()
    src = Topic(
        spark, "bitmap_ev", "row_id long, etype string", topic_root, reg
    )
    sdir = f"{topic_root}/bitmap-state"
    h = mv_rollup_pipe(
        src, sdir, name="bitmap-pipe", compact_every=2,
        rollup_fn=rollup, merge_fn=merge,
    )

    def as_set(df):
        return {(r.etype, r.word_idx, r.mask) for r in df.collect()}

    try:
        sofar = []
        for lo in range(0, 300, 100):
            src.send(rows[lo : lo + 100], barrier="chain")
            sofar += rows[lo : lo + 100]
            batch = rollup(
                spark.createDataFrame(sofar, "row_id long, etype string")
            )
            got = mv_snapshot(spark, sdir, merge_fn=merge)
            assert as_set(got) == as_set(batch)
        # words actually merged across batches: consecutive event_ids
        # split at 100/200 share words (100 % 32 != 0)
        merged_any = (
            mv_snapshot(spark, sdir, merge_fn=merge)
            .filter(F.bit_count("mask") > 1)
            .count()
        )
        assert merged_any > 0
    finally:
        h.stop()
        src.close()
