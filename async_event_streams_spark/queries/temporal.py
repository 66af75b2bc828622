"""Event-time windowed operators (SURVEY.md §2-C "streaming windows").

The reference has no time concept (ordering is arrival-only,
/root/reference/src/lib.rs:41-42); these are engine extensions. Each is
written as a batch DataFrame program using the SAME window functions the
streaming path uses (`F.window`, `F.session_window`), so the streaming
variants in `streaming/` reuse these transformations verbatim — batch
here is the oracle-checkable twin of the streaming topology.

Value sums run in decimal: per-row CAST(value AS DECIMAL(18,6)) is the
same deterministic quantization of the same double in both engines, and
the decimal sum is exact, so no partial-agg order can flip the rounded
result (the c_tpch_q10 half-cent lesson from round 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import table
from . import query

# ---------------------------------------------------------------------------
# Tumbling window
# ---------------------------------------------------------------------------


@query(
    "c_stream_tumbling",
    oracle=(
        "SELECT date_trunc('hour', ts) AS window_start, "
        "COUNT(*) AS n_events, CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) "
        "AS DOUBLE) AS sum_value "
        "FROM events GROUP BY 1"
    ),
)
def c_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h window via F.window — identical code runs under
    readStream with a watermark; window.start == date_trunc('hour')."""
    return (
        table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


# ---------------------------------------------------------------------------
# Sliding window
# ---------------------------------------------------------------------------


@query(
    "c_stream_sliding",
    oracle=(
        "SELECT time_bucket(INTERVAL '30 minutes', ts) "
        "  - k * INTERVAL '30 minutes' AS window_start, "
        "COUNT(*) AS n_events, CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) "
        "AS DOUBLE) AS sum_value "
        "FROM events CROSS JOIN (VALUES (0), (1)) offs(k) "
        "GROUP BY 1"
    ),
)
def c_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1h length, 30min slide): every event lands in
    exactly 2 windows; Spark's F.window replicates rows internally, the
    oracle does the same with an explicit 2-row cross join."""
    return (
        table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


# ---------------------------------------------------------------------------
# Session window
# ---------------------------------------------------------------------------

_SESSION_GAP_MIN = 30

_SESSION_ORACLE = f"""
WITH marked AS (
  SELECT user_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts - lag(ts) OVER w >= INTERVAL '{_SESSION_GAP_MIN} minutes'
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT user_id, ts, value,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
  FROM marked
)
SELECT user_id, MIN(ts) AS session_start,
  COUNT(*) AS n_events,
  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
FROM numbered GROUP BY user_id, session_no
"""


@query("c_stream_session", oracle=_SESSION_ORACLE)
def c_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window (30min gap) per user via F.session_window: events
    merge while consecutive gaps are < 30min; the oracle replays the same
    merge with a lag/cumulative-sum session numbering. Spark merges
    overlapping [ts, ts+gap) intervals, i.e. a gap of exactly 30min
    starts a NEW session — hence `>=` in the oracle."""
    return (
        table(spark, sf_dir, "events")
        .groupBy(
            F.col("user_id"),
            F.session_window("ts", f"{_SESSION_GAP_MIN} minutes").alias("sw"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# Streaming dedup (batch twin of dropDuplicates-on-stream)
# ---------------------------------------------------------------------------


@query(
    "c_stream_dedup",
    oracle=(
        "SELECT user_id, event_type, MIN(event_id) AS first_event_id, "
        "COUNT(*) AS n_occurrences "
        "FROM events GROUP BY user_id, event_type"
    ),
)
def c_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first dedup on (user_id, event_type): deterministic batch
    twin of streaming dropDuplicates (which keeps the first arrival —
    here 'first' is pinned to min event_id = arrival order)."""
    return (
        table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(
            F.min("event_id").alias("first_event_id"),
            F.count("*").alias("n_occurrences"),
        )
    )
