"""Bucket-and-stitch SCD2 build (functions/scd2.py): the two-round
local/stitch implementation must equal the plain two-window semantics
on every corpus shape — especially type runs that CROSS bucket
boundaries (single and chained through empty buckets), changes exactly
at a bucket edge, and same-timestamp ties resolved by event_id."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from async_event_streams_spark.functions.scd2 import scd2_intervals_bucketed

EPOCH = dt.datetime(2024, 1, 1)


def reference_intervals(rows):
    """Pure-Python twin of the plain two-window SCD2 build: per user,
    order by (ts, event_id), collapse consecutive type repeats, close
    each interval at the next start's valid_from."""
    by_user: dict[int, list[tuple[dt.datetime, int, str]]] = {}
    for uid, eid, ts, etype in rows:
        by_user.setdefault(uid, []).append((ts, eid, etype))
    out = set()
    for uid, evs in by_user.items():
        evs.sort()
        starts = []
        prev_type = None
        for ts, _eid, etype in evs:
            if prev_type is None or etype != prev_type:
                starts.append((ts, etype))
            prev_type = etype
        for i, (ts, etype) in enumerate(starts):
            nxt = starts[i + 1][0] if i + 1 < len(starts) else None
            out.add((uid, etype, ts, nxt, nxt is None))
    return out


def run_bucketed(spark, rows, bucket_sec):
    df = spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts timestamp, event_type string",
    )
    got = scd2_intervals_bucketed(df, bucket_sec=bucket_sec)
    return {
        (r.user_id, r.event_type, r.valid_from, r.valid_to, r.is_current)
        for r in got.collect()
    }


def _ts(sec: float) -> dt.datetime:
    return EPOCH + dt.timedelta(seconds=sec)


def test_run_chains_across_many_buckets(spark):
    # one type held for 5 hours of 10-min events: with hourly buckets
    # every bucket-head "local start" after the first is spurious and
    # must be suppressed by the last-type stitch — one interval total
    rows = [(1, i, _ts(i * 600), "view") for i in range(30)]
    got = run_bucketed(spark, rows, bucket_sec=3600)
    assert got == reference_intervals(rows)
    assert got == {(1, "view", _ts(0), None, True)}


def test_change_exactly_at_bucket_edge(spark):
    rows = [
        (1, 0, _ts(0), "view"),
        (1, 1, _ts(3599), "view"),  # last of bucket 0, same type
        (1, 2, _ts(3600), "click"),  # bucket 1 opens with a REAL change
        (1, 3, _ts(7200), "click"),  # bucket 2 opens with a spurious one
        (1, 4, _ts(7300), "view"),  # change inside bucket 2
    ]
    got = run_bucketed(spark, rows, bucket_sec=3600)
    assert got == reference_intervals(rows)
    assert got == {
        (1, "view", _ts(0), _ts(3600), False),
        (1, "click", _ts(3600), _ts(7300), False),
        (1, "view", _ts(7300), None, True),
    }


def test_interval_close_skips_startless_buckets(spark):
    # bucket 1 contains only a continuation (no start): the interval
    # opened in bucket 0 must close at bucket 2's start, which the
    # first-start LEAD reaches only because start-free buckets are
    # absent from the round-2 summary
    rows = [
        (1, 0, _ts(0), "view"),
        (1, 1, _ts(3700), "view"),  # bucket 1: continuation only
        (1, 2, _ts(7300), "click"),  # bucket 2: the closing start
    ]
    got = run_bucketed(spark, rows, bucket_sec=3600)
    assert got == reference_intervals(rows)
    assert got == {
        (1, "view", _ts(0), _ts(7300), False),
        (1, "click", _ts(7300), None, True),
    }


def test_same_timestamp_tie_and_distant_buckets(spark):
    rows = [
        # tie at the boundary: event_id orders 'view' before 'click'
        (1, 0, _ts(3600), "view"),
        (1, 1, _ts(3600), "click"),
        # a week later — empty buckets between; same type still merges
        # (SCD2 has no gap tolerance)
        (1, 2, _ts(7 * 86400), "click"),
        (2, 3, _ts(0), "view"),  # single-event user
    ]
    got = run_bucketed(spark, rows, bucket_sec=3600)
    assert got == reference_intervals(rows)
    assert got == {
        (1, "view", _ts(3600), _ts(3600), False),
        (1, "click", _ts(3600), None, True),
        (2, "view", _ts(0), None, True),
    }


def test_null_types_and_null_users_match_plain(spark):
    """r8 (r7 advice): NULL event_type must not be mistaken for a
    bucket head (the old __chg-IS-NULL overload), and NULL user_id
    rows must survive the stitch join-back. The contract here is
    bucketed ≡ the plain Spark shape — NOT the Python reference,
    whose `!=` is two-valued while SQL's `<>` is three-valued (a
    NULL-typed row after 'a' is a start in Python but NOT in SQL)."""
    from async_event_streams_spark.functions.scd2 import scd2_intervals_plain

    rows = [
        # user 1: mid-bucket NULL type, then successor-of-NULL (a
        # start under prev IS NULL), then a cross-bucket repeat
        (1, 0, _ts(0), "a"),
        (1, 1, _ts(60), None),
        (1, 2, _ts(120), "a"),
        (1, 3, _ts(3700), "a"),
        # user 2: bucket CLOSES on a NULL type; next bucket's head
        # must be a start (prev IS NULL), matching plain
        (2, 4, _ts(0), "x"),
        (2, 5, _ts(300), None),
        (2, 6, _ts(3800), "x"),
        # NULL user: its own partition in the plain window
        (None, 7, _ts(0), "a"),
        (None, 8, _ts(4000), "b"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    key = lambda r: (  # noqa: E731
        r.user_id,
        r.event_type,
        r.valid_from,
        r.valid_to,
        r.is_current,
    )
    want = {key(r) for r in scd2_intervals_plain(df).collect()}
    got = {
        key(r)
        for r in scd2_intervals_bucketed(df, bucket_sec=3600).collect()
    }
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),  # user
            st.integers(min_value=0, max_value=40_000),  # seconds offset
            st.sampled_from(["a", "b", "c"]),  # event type
        ),
        min_size=1,
        max_size=40,
    ),
    st.sampled_from([900, 3600, 86400]),  # bucket
)
@settings(max_examples=12, deadline=None)
def test_matches_reference_on_random_corpora(spark, corpus, bucket_sec):
    rows = [
        (uid, eid, _ts(sec), etype)
        for eid, (uid, sec, etype) in enumerate(corpus)
    ]
    got = run_bucketed(spark, rows, bucket_sec=bucket_sec)
    assert got == reference_intervals(rows)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_adaptive_dispatch_both_ends(spark):
    """The adaptive entry must pick the plain shape on uniform keys
    and bucket-and-stitch past the hot-share threshold — and both
    dispatches must agree with the pure-Python reference."""
    from async_event_streams_spark.functions.scd2 import scd2_intervals

    uniform = [
        (u, u * 10 + i, _ts(i * 600), "ab"[i % 2])
        for u in range(1, 11)
        for i in range(5)
    ]
    hot = [(1, i, _ts(i * 600), "ab"[i % 2]) for i in range(30)] + [
        (u, 100 + u * 10 + i, _ts(i * 600), "a")
        for u in range(2, 12)
        for i in range(3)
    ]
    for rows, expect_bucketed in ((uniform, False), (hot, True)):
        df = spark.createDataFrame(
            rows, "user_id long, event_id long, ts timestamp, event_type string"
        )
        out = scd2_intervals(df)
        assert ("__b" in _plan(out)) is expect_bucketed
        got = {
            (r.user_id, r.event_type, r.valid_from, r.valid_to, r.is_current)
            for r in out.collect()
        }
        assert got == reference_intervals(rows)
    # precomputed hot-set override skips the probe and pins the shape
    df = spark.createDataFrame(
        uniform, "user_id long, event_id long, ts timestamp, event_type string"
    )
    assert "__b" in _plan(scd2_intervals(df, hot=[1]))
    assert "__b" not in _plan(scd2_intervals(df, hot=[]))
    # hot/cold split: only the hot user's rows ride the stitch, and the
    # union must still equal the plain semantics for every user
    mixed = uniform + [(1, 900 + i, _ts(4000 + i * 10), "ab"[i % 2]) for i in range(4)]
    dfm = spark.createDataFrame(
        mixed, "user_id long, event_id long, ts timestamp, event_type string"
    )
    out = scd2_intervals(dfm, hot=[1])
    got = {
        (r.user_id, r.event_type, r.valid_from, r.valid_to, r.is_current)
        for r in out.collect()
    }
    assert got == reference_intervals(mixed)
