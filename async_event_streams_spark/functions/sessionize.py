"""Skew-resistant gap sessionization: bucket-and-stitch.

The plain lag+cumsum sessionizer (`c_sessionize_gaps`) rides ONE
user-keyed window — correct, single-exchange, but a zipfian key kills
it: a user owning 30% of a 100 TB event log serializes 30% of the
corpus through one task's sort (tools/skew_probe.py measured 2.3× at
local[32]; at 1000 executors the hot task IS the job). AQE cannot split
a window partition.

`sessionize_bucketed` removes the hot partition by splitting every
user's timeline into fixed time buckets and sessionizing in two
phases:

1. LOCAL: per (user_id, bucket) window — lag/cumsum exactly as the
   plain shape, but partitions are bounded by the bucket's data rate,
   not the user's corpus share. Emits each event's local session
   number `1..n_b`.
2. STITCH: a per-(user_id, bucket) summary (first/last event time,
   local session count — 1 row per bucket the user touched, ≪ events)
   decides whether a bucket's FIRST local session continues the
   previous bucket's last session (boundary gap ≤ gap_sec; summary
   rows are consecutive per user, so distant buckets fail the gap test
   naturally). The user-keyed window needed for the running offset runs
   over THIS summary table only. A session spanning many buckets is a
   chain of merges; the running sum of `n_b - merged_b` telescopes the
   chain, so global numbering needs no iterative propagation:

       session_id(event) = offset(bucket) + local_session - merged

   matches the plain sessionizer's running count exactly (proved by
   the shared oracle: `c_sessionize_bucketed` checks THIS
   implementation against the same straightforward lag+cumsum SQL that
   checks `c_sessionize_gaps`, plus the boundary unit tests in
   tests/test_sessionize.py).

Shuffle inventory: one (user_id, bucket) exchange for the local window,
one user-keyed exchange over the tiny summary, one equi-join of events
to the summary on (user_id, bucket), one partial-agg rollup — every
corpus-sized exchange is keyed by (user_id, bucket), which a hot user
cannot flood.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..util import materialize

DEFAULT_GAP_SEC = 1800
DEFAULT_BUCKET_SEC = 3600


def sessionize_bucketed(
    events: DataFrame,
    gap_sec: int = DEFAULT_GAP_SEC,
    bucket_sec: int = DEFAULT_BUCKET_SEC,
) -> DataFrame:
    """(user_id, session_id, n_events, session_start, session_end) with
    session_id the per-user running count of session starts — the same
    contract as c_sessionize_gaps, minus the hot-key window."""
    sec = lambda c: F.col(c).cast("timestamp").cast("long")  # noqa: E731
    e = events.select("user_id", "event_id", "ts").withColumn(
        "__b", F.floor(sec("ts") / bucket_sec)
    )
    w_local = Window.partitionBy("user_id", "__b").orderBy("ts", "event_id")
    gap = sec("ts") - F.lag(sec("ts")).over(w_local)
    new_s = F.when(gap.isNull() | (gap > gap_sec), 1).otherwise(0)
    # PINNED: `loc` feeds two plan branches (the summary aggregation
    # and the final events join); unpinned, ReusedExchange dedups only
    # the shuffle write and the corpus-sized window sort runs TWICE —
    # the repo's recurrent double-compute flaw (x_dup_spans, q11).
    # On a cluster this role is a written intermediate table.
    loc = materialize(
        e.withColumn(
            "__ls",
            F.sum(new_s).over(
                w_local.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    summ = loc.groupBy("user_id", "__b").agg(
        F.min(sec("ts")).alias("__first"),
        F.max(sec("ts")).alias("__last"),
        F.max("__ls").alias("__n"),
    )
    w_user = Window.partitionBy("user_id").orderBy("__b")
    merged = F.when(
        F.col("__first") - F.lag("__last").over(w_user) <= gap_sec, 1
    ).otherwise(0)
    stitched = summ.withColumn("__m", merged).withColumn(
        "__off",
        F.coalesce(
            F.sum(F.col("__n") - F.col("__m")).over(
                w_user.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    sid = (F.col("__off") + F.col("__ls") - F.col("__m")).alias("session_id")
    return (
        loc.join(
            stitched.select("user_id", "__b", "__m", "__off"),
            ["user_id", "__b"],
        )
        .select("user_id", "ts", sid)
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )
