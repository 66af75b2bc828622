#!/usr/bin/env python
"""End-to-end LLM training-data prep on the synthetic corpus:
quality gate → exact dedup → near-dup removal → chunking.
Run: python examples/training_pipeline.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from async_event_streams_spark.pipelines import (
    chunk,
    dedup_exact,
    dedup_near,
    quality_filter,
)
from async_event_streams_spark.session import get_spark
from async_event_streams_spark.tables import table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="training-pipeline-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = table(spark, sf_dir, "documents")
    q = quality_filter(docs)
    d = dedup_near(dedup_exact(q))
    chunks = chunk(d)

    print(f"docs={docs.count()} after_quality={q.count()} "
          f"after_dedup={d.count()} chunks={chunks.count()}")

    # Mixture report: what the cleaned corpus looks like per language —
    # the table a data recipe is tuned against.
    chunks.groupBy("lang").agg(
        F.count("*").alias("n_chunks"),
        F.sum("chunk_tokens").alias("total_tokens"),
    ).orderBy("lang").show()

    # Pack chunks into fixed token-budget training sequences with the
    # scalable two-phase prefix-sum (never a single-partition window).
    from async_event_streams_spark.functions.order import global_running_sum

    budget = 64
    packed = global_running_sum(
        chunks.select("doc_id", "chunk_idx", "chunk_tokens"),
        ["doc_id", "chunk_idx"],
        "chunk_tokens",
        "cum",
    ).select(
        "doc_id",
        "chunk_idx",
        F.floor((F.col("cum") - F.col("chunk_tokens")) / budget)
        .cast("long")
        .alias("seq_id"),
    )
    n_seqs = packed.agg(F.max("seq_id")).collect()[0][0] + 1
    print(f"packed into {n_seqs} sequences of <= {budget} tokens")
    spark.stop()


if __name__ == "__main__":
    main()
