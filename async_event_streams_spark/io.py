"""Table sinks: partitioned/bucketed parquet writers and topic archival.

The scale-side write path (SURVEY.md §2-C "Sinks"): partition columns
give partition pruning to every downstream reader; bucketing gives
shuffle-free joins on the bucket key. The topic archival pipe moves the
control-plane event channel into the analytical store, where the full
relational surface applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .topics.topic import Topic


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    mode: str = "overwrite",
) -> None:
    """Parquet partitioned by the given columns — downstream filters on
    them become directory pruning (no file even opened)."""
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_by: list[str],
    n_buckets: int = 32,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: joins/aggregations on the bucket columns
    skip their shuffle entirely (co-located by construction)."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.format("parquet").saveAsTable(name)


def archive_topic(
    topic: Topic, path: str, partition_by: list[str] | None = None
) -> int:
    """Snapshot a topic's retained events to parquet (partitioned by
    event_type unless told otherwise); returns rows written."""
    df = topic.batch_df()
    n = df.count()
    write_partitioned(df, path, partition_by or ["event_type"])
    return n


def read_archive(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
