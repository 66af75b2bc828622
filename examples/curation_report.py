#!/usr/bin/env python
"""Round-8 curation surface in one pass: score every document with
the model-based quality classifier and the Flesch readability bands,
check the embedding table's hygiene, then derive the corpus-level
decisions — vocabulary coverage (tokenizer design), the
temperature-smoothed mixing schedule (how many tokens each source
contributes to the budget), balanced output shards (write side) and
the ANN recall dial. Every number here is a registered, oracle-checked
query — this example only composes them.
Run: python examples/curation_report.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from async_event_streams_spark.queries import QUERIES
from async_event_streams_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="curation-report-example")
    spark.sparkContext.setLogLevel("ERROR")

    quality = QUERIES["x_quality_classifier"](spark, sf_dir)
    readability = QUERIES["x_readability"](spark, sf_dir)

    # Per-document gate: keep docs the classifier accepts, banded by
    # readability — the routing table a curation pipeline writes.
    gates = (
        quality.select("doc_id", "score", "keep")
        .join(readability.select("doc_id", "band"), "doc_id")
        .groupBy("band", "keep")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("score"), 4).alias("avg_score"),
        )
        .orderBy("band", "keep")
    )
    print("== quality gate x readability band ==")
    gates.show(20, truncate=False)

    print("== vocabulary coverage (top 10 terms) ==")
    QUERIES["x_vocab_coverage"](spark, sf_dir).orderBy("rank").show(10)

    print("== embedding hygiene (outliers flagged) ==")
    qc = QUERIES["x_embedding_qc"](spark, sf_dir)
    qc.groupBy("outlier").agg(
        F.count("*").alias("n_vecs"),
        F.round(F.avg("l2_norm"), 4).alias("avg_norm"),
    ).orderBy("outlier").show()

    print("== mixing schedule (token budget per source) ==")
    QUERIES["x_mix_schedule"](spark, sf_dir).orderBy(
        F.col("share_ppm").desc()
    ).show(10)

    print("== output shard balance ==")
    QUERIES["x_shard_assign"](spark, sf_dir).groupBy("shard").agg(
        F.count("*").alias("n_docs"), F.sum("n_tokens").alias("n_tokens")
    ).orderBy("shard").show()

    print("== ANN recall@5 (query_id=-1 is the corpus row) ==")
    QUERIES["x_ann_recall"](spark, sf_dir).orderBy("query_id").show(12)


if __name__ == "__main__":
    main()
