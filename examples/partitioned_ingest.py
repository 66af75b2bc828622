#!/usr/bin/env python
"""Sharded event ingestion with per-key ordering: four concurrent
producers publish user-activity events into a 4-partition topic while
one streaming pipe consumes the unioned partition stream and folds the
events into a running per-user aggregate.

What this demonstrates (the scale story of the topic layer):
- producers never contend — each partition has its own lock and log;
- a user's events stay in publish order (same key → same partition);
- one subscriber query sees every partition (broadcast fan-out intact);
- send() still gives the reference's completion barrier across shards.

Run: python examples/partitioned_ingest.py
"""

import os
import sys
import tempfile
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from async_event_streams_spark.session import get_spark
from async_event_streams_spark.topics import PartitionedTopic, TopicRegistry, pipe


def main() -> None:
    spark = get_spark(app_name="partitioned-ingest", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="pingest-")

    activity = PartitionedTopic(
        spark,
        "activity",
        "user string, action string, amount long",
        root,
        key_col="user",
        num_partitions=4,
        registry=TopicRegistry(),
    )

    totals: dict[str, int] = {}
    lock = threading.Lock()

    def fold(df, batch_id):
        for r in df.groupBy("user").agg(F.sum("amount").alias("amt")).collect():
            with lock:
                totals[r.user] = totals.get(r.user, 0) + r.amt

    handle = pipe(activity, sink_fn=fold, name="fold-activity")

    users = [f"user-{i}" for i in range(8)]

    def produce(worker: int) -> None:
        for step in range(5):
            activity.post(
                [
                    {"user": u, "action": "click", "amount": step}
                    for u in users[worker * 2 : worker * 2 + 2]
                ]
            )

    threads = [threading.Thread(target=produce, args=(w,)) for w in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    activity.barrier()  # reference semantics: all shards drained

    expect = sum(range(5))
    assert totals == {u: expect for u in users}, totals
    spread = (
        activity.batch_df().groupBy("partition").count().orderBy("partition").collect()
    )
    print(f"per-user totals all == {expect} across {len(totals)} users")
    print("events per partition:", {r.partition: r["count"] for r in spread})

    handle.stop()
    activity.close()
    print("OK")


if __name__ == "__main__":
    main()
