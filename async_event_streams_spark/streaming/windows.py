"""Watermarked event-time windows over streaming DataFrames.

The reference has no event-time (SURVEY.md §1.2); these are the
driver-mandated streaming extensions. Transformations are written
against a plain DataFrame so the exact same function serves the
streaming path (topic.subscribe()) and the oracle-checked batch path
(queries/temporal.py) — batch == streaming-accumulated is asserted in
tests/test_streaming.py.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    df: DataFrame, window: str = "1 hour", watermark: str = "10 minutes"
) -> DataFrame:
    """Tumbling event-time window aggregation. On a stream, the
    watermark bounds state: windows older than (max ts − watermark)
    finalize and evict — this is what keeps per-key state finite over
    an unbounded stream (the 100 TB correctness condition)."""
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", window).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


def session_counts(
    df: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Session windows per user with a gap timeout; watermark finalizes
    sessions once no earlier event can arrive."""
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.col("user_id"), F.session_window("ts", gap).alias("sw"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def run_stream_to_memory(
    stream_df: DataFrame,
    name: str | None = None,
    output_mode: str = "update",
):
    """Start a streaming query writing to the in-memory sink (test/
    debug harness). Returns (query, table_name)."""
    table = name or f"mem_{uuid.uuid4().hex[:8]}"
    query = (
        stream_df.writeStream.format("memory")
        .queryName(table)
        .outputMode(output_mode)
        .start()
    )
    return query, table
