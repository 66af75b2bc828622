#!/usr/bin/env python
"""Multi-PROCESS producer benchmark for the partitioned topic lane.

The r12 profile proved the in-process producer pool is GIL-bound at
~97k ev/s produce-only: every bench.py producer is a thread of the
driver process, so JSON serialization of all N shards contends on one
interpreter. The cluster-realistic shape is one producer PROCESS per
shard (producers are separate services holding only a channel handle
— reference/src/lib.rs:31-40); this harness measures that shape:

- parent: owns the SparkSession, creates the PartitionedTopic, runs
  the drain-side subscriber, and coordinates via ready/go files;
- P child processes: each opens a PRODUCER-ONLY Topic handle
  (spark=None) on its own shard's segment log and appends batches —
  no Spark, no shared interpreter, same envelope fast path.

Prints one JSON line: produce-only aggregate rate (go→last-exit) and
the end-to-end rate including the drain catching up (go→barrier).

Usage: python tools/mp_producer_bench.py [P] [n_batches] [batch_size]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCHEMA = "k string, n long, v double"


def worker(topic_dir: str, part_name: str, n_batches: int, batch_size: int,
           ctl_dir: str, idx: int) -> None:
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from async_event_streams_spark.topics import TopicRegistry
    from async_event_streams_spark.topics.topic import Topic

    # build the schema programmatically: StructType.fromDDL needs a
    # live SparkSession/JVM, which a producer-only process doesn't have
    schema = StructType(
        [
            StructField("k", StringType()),
            StructField("n", LongType()),
            StructField("v", DoubleType()),
        ]
    )
    t = Topic(None, part_name, schema, topic_dir, registry=TopicRegistry())
    # handshake: signal ready, then spin until the parent says go —
    # process spawn/import cost stays out of the measured window
    open(os.path.join(ctl_dir, f"ready-{idx}"), "w").write("1")
    go = os.path.join(ctl_dir, "go")
    while not os.path.exists(go):
        time.sleep(0.005)
    for b in range(n_batches):
        t.post(
            [
                {"k": f"w{idx}-{i % 64}", "n": b * batch_size + i, "v": float(i)}
                for i in range(batch_size)
            ]
        )


def main() -> None:
    if sys.argv[1:2] == ["--worker"]:
        _, _, topic_dir, part_name, nb, bs, ctl, idx = sys.argv
        worker(topic_dir, part_name, int(nb), int(bs), ctl, int(idx))
        return

    p = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    batch_size = int(sys.argv[3]) if len(sys.argv) > 3 else 500

    from async_event_streams_spark.session import get_spark
    from async_event_streams_spark.topics import (
        PartitionedTopic,
        TopicRegistry,
        pipe,
    )

    spark = get_spark(app_name="mp-producer-bench")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="bench-mp-")
    ctl = tempfile.mkdtemp(prefix="bench-mp-ctl-")
    t = PartitionedTopic(
        spark, "benchmp", SCHEMA, root,
        key_col="k", num_partitions=p, registry=TopicRegistry(),
    )
    seen: list[int] = []
    pipe(t, sink_fn=lambda df, b: seen.append(df.count()), name="benchmp-sub")
    t.post([{"k": "warm", "n": -1, "v": 0.0}])
    t.barrier()

    procs = [
        subprocess.Popen(
            [
                sys.executable, os.path.abspath(__file__), "--worker",
                t.dir, f"benchmp#p{i}", str(n_batches), str(batch_size),
                ctl, str(i),
            ],
            cwd=REPO,
        )
        for i in range(p)
    ]
    while not all(
        os.path.exists(os.path.join(ctl, f"ready-{i}")) for i in range(p)
    ):
        time.sleep(0.01)
    t0 = time.perf_counter()
    open(os.path.join(ctl, "go"), "w").write("1")
    for pr in procs:
        pr.wait()
    t_produce = time.perf_counter() - t0
    t.barrier()
    t_e2e = time.perf_counter() - t0
    total = p * n_batches * batch_size
    drained = sum(seen)
    t.close()
    assert drained == total + 1, f"drained {drained} != {total + 1}"
    print(
        json.dumps(
            {
                "metric": "mp_producer_topic",
                "partitions": p,
                "events": total,
                "produce_only_ev_s": round(total / t_produce, 1),
                "end_to_end_ev_s": round(total / t_e2e, 1),
                "produce_sec": round(t_produce, 3),
                "e2e_sec": round(t_e2e, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
