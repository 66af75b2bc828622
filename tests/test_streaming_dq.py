"""Streaming data-quality monitor (streaming/dq.py): after every wave
the audit snapshot must equal the one-shot batch audit over all rows
sent so far — with duplicate PKs SPANNING batches (the check a
per-batch counter cannot do), FK and null/range violations present,
across compaction, and across a stop/restart mid-stream."""

from __future__ import annotations

import pytest

from async_event_streams_spark.streaming.dq import (
    dq_batch_twin,
    dq_monitor_pipe,
    dq_snapshot,
)
from async_event_streams_spark.tables import table
from async_event_streams_spark.topics import Topic, TopicRegistry

_SCHEMA = "row_id long, user_id long, value double"


@pytest.fixture()
def topic_root(tmp_path):
    return str(tmp_path / "topics")


def _rows(spark, sf_dir):
    """Events rows seeded with every violation class: duplicate
    event_ids re-sent in LATER waves, a user_id outside the customer
    dimension, a NULL value and an out-of-range value."""
    base = [
        {"row_id": r.event_id, "user_id": r.user_id, "value": r.value}
        for r in table(spark, sf_dir, "events")
        .select("event_id", "user_id", "value")
        .orderBy("event_id")
        .limit(120)
        .collect()
    ]
    base[10] = {**base[10], "user_id": 999_999_999}  # FK miss
    base[20] = {**base[20], "value": None}  # null
    base[30] = {**base[30], "value": 2_000_000.0}  # range
    # duplicates spanning waves (wave size 40): ids from wave 0
    # re-sent in waves 1 and 2, one id sent three times total
    base[50] = {**base[50], "row_id": base[5]["row_id"]}
    base[90] = {**base[90], "row_id": base[5]["row_id"]}
    base[95] = {**base[95], "row_id": base[15]["row_id"]}
    return base


def _as_set(df):
    return {(r.check_name, r.n_checked, r.n_violations) for r in df.collect()}


@pytest.mark.parametrize("compact_every", [None, 2])
def test_streaming_dq_equals_batch(spark, sf_dir, topic_root, compact_every):
    rows = _rows(spark, sf_dir)
    customer = table(spark, sf_dir, "customer").select("c_custkey")
    reg = TopicRegistry()
    src = Topic(spark, f"dq_events_{compact_every}", _SCHEMA, topic_root, reg)
    sdir = f"{topic_root}/dq-state-{compact_every}"
    h = dq_monitor_pipe(
        src,
        sdir,
        customer,
        name=f"dq-pipe-{compact_every}",
        compact_every=compact_every,
    )
    try:
        sofar = []
        for lo in range(0, 120, 40):
            src.send(rows[lo : lo + 40], barrier="chain")
            sofar += rows[lo : lo + 40]
            batch = dq_batch_twin(
                spark.createDataFrame(sofar, _SCHEMA), customer
            )
            got = _as_set(dq_snapshot(spark, sdir))
            assert got == _as_set(batch), got
        # the seeded violations actually register
        final = {r.check_name: r.n_violations for r in dq_snapshot(spark, sdir).collect()}
        assert final["events_pk_unique"] == 3
        assert final["events_fk_customer"] >= 1
        assert final["events_value_not_null"] == 1
        assert final["events_value_in_range"] == 1
    finally:
        h.stop()
        src.close()


def test_dq_pipe_restart_resumes_and_stays_batch_equal(
    spark, sf_dir, topic_root
):
    rows = _rows(spark, sf_dir)
    customer = table(spark, sf_dir, "customer").select("c_custkey")
    reg = TopicRegistry()
    src = Topic(spark, "dq_events_r", _SCHEMA, topic_root, reg)
    sdir = f"{topic_root}/dq-state-r"
    h1 = dq_monitor_pipe(src, sdir, customer, name="dq-pipe-r")
    src.send(rows[:40], barrier="chain")
    h1.stop()
    src.post(rows[40:80])  # while down
    h2 = dq_monitor_pipe(src, sdir, customer, name="dq-pipe-r")
    try:
        src.send(rows[80:], barrier="chain")
        src.barrier()
        batch = dq_batch_twin(spark.createDataFrame(rows, _SCHEMA), customer)
        assert _as_set(dq_snapshot(spark, sdir)) == _as_set(batch)
    finally:
        h2.stop()
        src.close()


def test_dq_snapshot_survives_crash_between_counter_and_pk_write(
    spark, sf_dir, tmp_path
):
    """ADVICE r8: a crash between the counter write and the pk write of
    the FIRST batch leaves the counters root non-empty while pk_counts
    is empty — the snapshot must report the counters plus a zero-keys
    PK row, not raise on spark.read.parquet() with no paths."""
    import os

    from async_event_streams_spark.streaming.dq import (
        _counter_partials,
    )

    rows = _rows(spark, sf_dir)[:40]
    customer = table(spark, sf_dir, "customer").select("c_custkey")
    sdir = str(tmp_path / "dq-crash")
    os.makedirs(os.path.join(sdir, "pk_counts"))  # created, never written
    _counter_partials(
        spark.createDataFrame(rows, _SCHEMA), customer
    ).write.mode("overwrite").parquet(
        os.path.join(sdir, "counters", "batch=0")
    )
    got = {r.check_name: (r.n_checked, r.n_violations) for r in dq_snapshot(spark, sdir).collect()}
    assert got["events_pk_unique"] == (0, 0)
    assert got["events_value_not_null"][0] == 40
