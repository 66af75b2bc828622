#!/usr/bin/env python
"""Horizon-bounded streaming near-dedup: documents arrive on a topic
with event times; near-duplicates only count within a sliding
event-time horizon, so the pipe's sketch state is PRUNED as the
watermark advances — bounded state for an unbounded stream, the shape
a 100 TB continuous ingest needs (the unbounded-seen-set variant is
examples/streaming_dedup_ingest.py).

Watch the state directory count: waves keep arriving, old per-batch
sketch dirs disappear once max-event-time moves 2x the horizon past
them, and a text reappearing AFTER the horizon is (correctly) admitted
again.

Run: python examples/horizon_dedup_stream.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from async_event_streams_spark.session import get_spark
from async_event_streams_spark.streaming import (
    state_dirs,
    windowed_minhash_dedup_pipe,
)
from async_event_streams_spark.topics import Topic, TopicRegistry

HORIZON = 60  # seconds: duplicates only count within this window


def main() -> None:
    spark = get_spark(app_name="horizon-dedup-example")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="horizon-dedup-")
    reg = TopicRegistry()
    docs = Topic(spark, "docs", "doc_id long, text string, et long", root, reg)
    uniq = Topic(spark, "uniq", "doc_id long, text string, et long", root, reg)
    sdir = os.path.join(root, "state")
    handle = windowed_minhash_dedup_pipe(
        docs, uniq, state_dir=sdir, horizon_sec=HORIZON, name="horizon-dedup"
    )

    press_release = "company announces quarterly results beating expectations again"
    blog_post = "completely different words about spark streaming engines here now"
    waves = [
        # (doc_id, text, event time): the press release is syndicated
        # twice within the horizon, then republished much later
        [(0, press_release, 1_000), (1, blog_post, 1_010)],
        [(2, press_release, 1_030)],          # dup within 30s -> dropped
        [(3, press_release, 1_055)],          # shadowed by doc 2 -> dropped
        [(4, press_release, 5_000)],          # far outside horizon -> kept
        [(5, blog_post, 5_020)],              # its dup aged out too -> kept
    ]
    try:
        for i, wave in enumerate(waves):
            docs.send(
                [{"doc_id": d, "text": t, "et": et} for d, t, et in wave],
                barrier="chain",
            )
            kept = sorted(
                r.doc_id for r in uniq.batch_df().select("doc_id").collect()
            )
            print(
                f"wave {i}: kept={kept} state_dirs={len(state_dirs(sdir))}"
            )
        assert kept == [0, 1, 4, 5], kept
        assert len(state_dirs(sdir)) <= 2  # waves 1-3 pruned by watermark
        print("horizon dedup OK: duplicates dropped inside the window, "
              "re-admitted after it; state stayed bounded")
    finally:
        handle.stop()
        docs.close()
        uniq.close()
        spark.stop()


if __name__ == "__main__":
    main()
