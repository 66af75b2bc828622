#!/usr/bin/env python
"""Streaming training-data ingestion: documents arrive on a topic in
waves and flow through exact-dedup → near-dedup pipes, each carrying
its seen-set as an incremental parquet state table; unique documents
land on the output topic with lineage intact.

This is the reference's pipe composition (source → pipe → pipe → sink)
applied to the LLM-pipeline mandate: the same dedup semantics the batch
queries (x_dedup_exact, pipelines.dedup_near) define, produced
incrementally as data arrives. State compaction keeps the on-disk
seen-set at one directory regardless of how many micro-batches ran.

Run: python examples/streaming_dedup_ingest.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from async_event_streams_spark.session import get_spark
from async_event_streams_spark.streaming import (
    compact_state,
    exact_dedup_pipe,
    minhash_dedup_pipe,
    state_dirs,
)
from async_event_streams_spark.topics import Topic, TopicRegistry


def main() -> None:
    spark = get_spark(app_name="streaming-dedup-ingest", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="sdedup-")
    reg = TopicRegistry()

    raw = Topic(spark, "raw_docs", "doc_id long, text string", root, reg)
    exact = Topic(spark, "exact_unique", "doc_id long, text string", root, reg)
    clean = Topic(spark, "near_unique", "doc_id long, text string", root, reg)

    h1 = exact_dedup_pipe(raw, exact, state_dir=f"{root}/exact-state")
    h2 = minhash_dedup_pipe(exact, clean, state_dir=f"{root}/near-state")

    base = "large scale training corpora need careful duplicate removal before use"
    waves = [
        [(0, base), (1, base), (2, "a wholly different document about stream processing")],
        [(3, base + " indeed"), (4, "a wholly different document about stream processing")],
        [(5, "fresh third topic no overlap with anything published before now")],
    ]
    for i, wave in enumerate(waves):
        raw.send([{"doc_id": d, "text": t} for d, t in wave], barrier="chain")
        kept = sorted(r.doc_id for r in clean.batch_df().select("doc_id").collect())
        print(f"wave {i}: published {[d for d, _ in wave]}, corpus now {kept}")

    # Periodic maintenance: fold per-batch state dirs into one.
    for h, sdir in ((h1, f"{root}/exact-state"), (h2, f"{root}/near-state")):
        h.stop()
        merged = compact_state(spark, sdir, upto_batch=10_000)
        print(f"compacted {merged} state dirs -> {len(state_dirs(sdir))} in {sdir}")

    raw.close()
    exact.close()
    clean.close()
    print("done: doc 1 (exact dup), 3 (near dup), 4 (cross-wave exact dup) removed")


if __name__ == "__main__":
    main()
