"""Streaming cumulative-reach maintenance: the `c_cumulative_reach`
contract run as a pipe — the third decomposable-state family on the
mv delta-log discipline, and the one that proves MIN-merge.

The batch rewrite (reach(d) = running sum of |users first seen on d|)
hinges on per-user FIRST-SEEN days, and MIN is decomposable: each
micro-batch writes its own per-user min-day partials, the snapshot
re-merges by MIN, compaction folds the log and provably cannot change
the answer (min is idempotent + commutative + associative — unlike
the additive counters, even REPLAYED rows merge harmlessly, which is
why min-state is the easiest exactly-once family of all).

State is |users|-sized slim (user, day) rows — the streaming-dedup
cost class, map-side combinable. The snapshot derives the daily
new-user counts and the running curve from the merged min table; the
stream never re-scans history and the curve never re-deduplicates.

Stream==batch asserted wave-by-wave in tests/test_streaming_reach.py
with users REAPPEARING in later batches (the rows MIN must ignore),
across compaction and a restart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .mv import mv_rollup_pipe, mv_snapshot
from .state import state_dirs


def _minday_rollup(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    # `ts` is a topic ENVELOPE column, so streamed payloads carry the
    # event time under another name (the pipe passes it through)
    return df.groupBy("user_id").agg(
        F.min(F.col(ts_col).cast("date")).alias("day")
    )


def _minday_merge(partials: DataFrame) -> DataFrame:
    return partials.groupBy("user_id").agg(F.min("day").alias("day"))


def reach_pipe(
    source,
    state_dir: str,
    name: str = "reach",
    compact_every=None,
    ts_col: str = "event_ts",
):
    """Maintain per-user first-seen-day partials over an event-row
    stream (MIN delta log). Returns the PipeHandle. `ts_col` names the
    payload event-time column (`ts` itself is the topic envelope)."""
    return mv_rollup_pipe(
        source,
        state_dir,
        name=name,
        compact_every=compact_every,
        rollup_fn=lambda df: _minday_rollup(df, ts_col),
        merge_fn=_minday_merge,
    )


def _curve(first_seen: DataFrame) -> DataFrame:
    daily = first_seen.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.select(
        F.col("day").cast("string").alias("day"),
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cumulative_reach"),
    )


def reach_snapshot(spark: SparkSession, state_dir: str) -> DataFrame:
    """The CURRENT reach curve over every row seen so far."""
    if not state_dirs(state_dir):
        return spark.createDataFrame(
            [], "day string, new_users long, cumulative_reach long"
        )
    return _curve(mv_snapshot(spark, state_dir, merge_fn=_minday_merge))


def reach_batch_twin(rows: DataFrame, ts_col: str = "event_ts") -> DataFrame:
    """The one-shot batch curve over the same rows."""
    return _curve(_minday_rollup(rows, ts_col))


# ---------------------------------------------------------------------------
# Sliding reach (round 9): SET-UNION state — the fourth decomposable
# family on the delta log (additive counts, MIN, bounded deque, and
# now distinct-set union, which like MIN is idempotent: replayed rows
# merge harmlessly).
# ---------------------------------------------------------------------------


def _trio_rollup(df: DataFrame, ts_col: str = "event_ts") -> DataFrame:
    return df.select(
        "event_type",
        F.expr(
            f"CAST(CAST(CAST({ts_col} AS TIMESTAMP) AS LONG) DIV 3600"
            " AS BIGINT)"
        ).alias("hour"),
        "user_id",
    ).distinct()


def _trio_merge(partials: DataFrame) -> DataFrame:
    return partials.distinct()


def sliding_reach_pipe(
    source,
    state_dir: str,
    name: str = "sliding-reach",
    compact_every=None,
    ts_col: str = "event_ts",
):
    """Maintain distinct (type, hour, user) trios over an event
    stream. State is |trios|-sized slim rows (the streaming-dedup
    class); merge is DISTINCT — idempotent, so compaction and crash
    replay provably cannot change the snapshot."""
    return mv_rollup_pipe(
        source,
        state_dir,
        name=name,
        compact_every=compact_every,
        rollup_fn=lambda df: _trio_rollup(df, ts_col),
        merge_fn=_trio_merge,
    )


def sliding_reach_snapshot(spark: SparkSession, state_dir: str) -> DataFrame:
    """The CURRENT trailing-24h reach curve — the SAME sweep-line
    serving code the batch query runs (queries.relational.
    sliding_reach_exact), over the merged trio state."""
    from ..queries.relational import sliding_reach_exact

    if not state_dirs(state_dir):
        return spark.createDataFrame(
            [], "event_type string, win_hour long, exact_reach long"
        )
    return sliding_reach_exact(
        mv_snapshot(spark, state_dir, merge_fn=_trio_merge)
    )


def sliding_reach_batch_twin(rows: DataFrame, ts_col: str = "event_ts") -> DataFrame:
    from ..queries.relational import sliding_reach_exact

    return sliding_reach_exact(_trio_rollup(rows, ts_col))
