"""frame_values_bucketed == frame_values_plain on adversarial layouts:
frames spanning 2 and 3+ buckets, empty buckets between a user's rows,
single-event users, NULL user keys (own partition, must not drop), and
the adaptive split under a forced hot set."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from async_event_streams_spark.functions.framestitch import (
    ewma_from_frame,
    frame_values,
    frame_values_bucketed,
    frame_values_plain,
    rolling_median_from_frame,
)

_SCHEMA = "user_id long, event_id long, x_micro long"


def _rows():
    rng = random.Random(9)
    rows = []
    eid = 0
    # user 1: dense (frames span consecutive tiny buckets)
    for _ in range(40):
        rows.append((1, eid, rng.randrange(-50, 500)))
        eid += 1
    # user 2: sparse with EMPTY buckets between rows (stride 9 > bucket 4)
    for _ in range(12):
        rows.append((2, eid, rng.randrange(-50, 500)))
        eid += 9
    # user 3: single event
    rows.append((3, eid, 7))
    eid += 1
    # NULL user: two rows (their own partition in the plain window)
    rows.append((None, eid, 11)); eid += 1
    rows.append((None, eid, 13)); eid += 1
    # user 4: exactly frame-length rows straddling a bucket edge
    for _ in range(8):
        rows.append((4, eid, rng.randrange(-50, 500)))
        eid += 1
    rng.shuffle(rows)
    return rows


def _cmp(df_a, df_b):
    a = {(r.user_id, r.event_id): r.frame for r in df_a.collect()}
    b = {(r.user_id, r.event_id): r.frame for r in df_b.collect()}
    assert a == b


def test_bucketed_frames_equal_plain_across_boundaries(spark):
    df = spark.createDataFrame(_rows(), _SCHEMA)
    for L in (5, 8):
        plain = frame_values_plain(df, L)
        for bucket_rows in (4, 7, 64):
            _cmp(frame_values_bucketed(df, L, bucket_rows=bucket_rows), plain)


def test_adaptive_split_with_forced_hot_set(spark):
    df = spark.createDataFrame(_rows(), _SCHEMA)
    plain = frame_values_plain(df, 8)
    _cmp(frame_values(df, 8, bucket_rows=4, hot=[1, 2]), plain)
    _cmp(frame_values(df, 8, hot=[]), plain)  # [] forces plain


def test_frame_consumers_agree_between_shapes(spark):
    df = spark.createDataFrame(_rows(), _SCHEMA)
    for fold in (ewma_from_frame, rolling_median_from_frame):
        a = {
            tuple(r)
            for r in fold(frame_values_bucketed(df, 8, bucket_rows=4)).collect()
        }
        b = {tuple(r) for r in fold(frame_values_plain(df, 8)).collect()}
        assert a == b


def test_anomaly_split_with_forced_hot_set(spark):
    """The r10 c_anomaly_adaptive hot/cold split must be
    answer-invariant under a FORCED hot set (the skew probe pins this
    on the 10M-row corpus; this pins it in CI on the adversarial
    layout): plain-on-everything == union(plain on cold, stitched on
    hot), flags included — moments are per-user, so the per-user
    split is exact by construction, and this test keeps that
    construction from regressing."""
    from async_event_streams_spark.queries.relational import (
        _anomaly_plain_on,
        _anomaly_stitched_on,
    )

    df = spark.createDataFrame(_rows(), _SCHEMA)
    want = {tuple(r) for r in _anomaly_plain_on(df).collect()}
    for hot in ([1], [1, 2]):
        is_hot = F.coalesce(F.col("user_id").isin(hot), F.lit(False))
        got = {
            tuple(r)
            for r in _anomaly_plain_on(df.filter(~is_hot))
            .unionByName(_anomaly_stitched_on(df.filter(is_hot), hot))
            .collect()
        }
        assert got == want, hot
