#!/usr/bin/env python
"""The r11 live as-of enrichment: events and orders stream through ONE
topic as a tagged-union merged timeline into the streaming as-of join
(streaming/asof.py) — each event row is emitted enriched with the
user's latest at-or-before order, from O(keys) state (one watermark
triple + last order key per user; a whale's order history never
accumulates, only its maximum survives). The emitted log equals the
registered, oracle-checked c_join_asof on the same rows — one
semantics, two execution shapes.
Run: python examples/live_asof_enrichment.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from async_event_streams_spark.session import get_spark
from async_event_streams_spark.streaming import (
    asof_batch_twin,
    asof_stream,
    merged_timeline,
    run_stream_to_memory,
)
from async_event_streams_spark.tables import table
from async_event_streams_spark.topics import Topic, TopicRegistry

_PAYLOAD = (
    "user_id long, t long, is_event long, sid long, eid long, okey long"
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(
        app_name="live-asof", master="local[4]", shuffle_partitions=4
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="asof-")
    t = Topic(spark, "timeline", _PAYLOAD, root, TopicRegistry())
    query, tbl = run_stream_to_memory(
        asof_stream(t.subscribe()), output_mode="append"
    )
    t.attach_query(query)

    from pyspark.sql import functions as F

    # a handful of users' FULL timelines (a global time-prefix would be
    # all orders: order dates precede every event timestamp at this sf)
    merged = merged_timeline(
        table(spark, sf_dir, "events").filter(F.col("user_id") < 12),
        table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 12),
    )
    rows = merged.orderBy("t", "is_event", "sid").collect()
    # ship the merged timeline in three waves (per-key order holds
    # because the waves cut the globally ordered timeline)
    step = (len(rows) + 2) // 3
    sent = []
    for i in range(0, len(rows), step):
        wave = [r.asDict() for r in rows[i : i + step]]
        t.send(wave)
        sent += wave
        n = spark.sql(f"SELECT COUNT(*) c FROM {tbl}").collect()[0].c
        print(f"wave {i // step + 1}: {len(sent)} timeline rows in, "
              f"{n} enriched events out")

    emitted = {tuple(r) for r in spark.sql(
        f"SELECT user_id, event_id, asof_orderkey FROM {tbl}").collect()}
    sofar = spark.createDataFrame(
        [tuple(w[c] for c in
               ("user_id", "t", "is_event", "sid", "eid", "okey"))
         for w in sent],
        _PAYLOAD,
    )
    want = {tuple(r) for r in asof_batch_twin(sofar).select(
        "user_id", "event_id", "asof_orderkey").collect()}
    assert emitted == want, "stream != batch twin"
    print(f"stream == batch twin on {len(emitted)} enriched events ✓")
    enriched = sum(1 for r in emitted if r[2] is not None)
    print(f"{enriched} events carry an as-of order key, "
          f"{len(emitted) - enriched} precede their user's first order")
    t.close()
    spark.stop()


if __name__ == "__main__":
    main()
