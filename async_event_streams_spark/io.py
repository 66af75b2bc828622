"""Table sinks: partitioned/bucketed parquet writers and topic archival.

The scale-side write path (SURVEY.md §2-C "Sinks"): partition columns
give partition pruning to every downstream reader; bucketing gives
shuffle-free joins on the bucket key. The topic archival pipe moves the
control-plane event channel into the analytical store, where the full
relational surface applies.
"""

from __future__ import annotations

from pyspark.storagelevel import StorageLevel as _SL
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


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema,
    quarantine_col: str = "_corrupt_record",
) -> DataFrame:
    """Schema-enforced JSONL ingestion — the raw-corpus entry path (web
    dumps and crawl derivatives ship as JSONL long before anything is
    parquet). An EXPLICIT schema is required on purpose: at 100 TB,
    schema inference is a full extra pass over the corpus, and a
    drifting inferred schema silently changes every downstream plan.
    PERMISSIVE mode + a corrupt-record column turns malformed lines
    into quarantinable rows instead of job failures — split on
    `quarantine_col IS NOT NULL` and route the bad lines to a review
    sink; the good rows carry NULL there and drop the column."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructType

    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if quarantine_col not in [f.name for f in schema.fields]:
        schema = schema.add(quarantine_col, StringType())
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", quarantine_col)
        .json(path)
    )


def split_quarantine(df: DataFrame, quarantine_col: str = "_corrupt_record"):
    """(good_rows_without_the_column, quarantined_rows) from a
    read_jsonl frame. The frame is pinned first: Spark refuses
    referencing ONLY the corrupt-record column of a raw JSON scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — and the
    pin also guarantees both halves come from the same parse, so a
    row can't flip sides between the two reads."""
    from pyspark.sql import functions as F

    pinned = df.localCheckpoint(eager=False, storageLevel=_SL.DISK_ONLY)
    good = pinned.filter(F.col(quarantine_col).isNull()).drop(quarantine_col)
    bad = pinned.filter(F.col(quarantine_col).isNotNull())
    return good, bad
