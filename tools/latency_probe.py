#!/usr/bin/env python
"""Decompose the per-event fidelity lane's latency floor (r11 verdict
#3): where do the ~60-77 ms p50 per blocking send go?

Runs the bench.py per-event lane (max_segments_per_batch=1, 0 ms
trigger, post -> barrier round trips) while capturing BOTH sides:

- the engine's own per-micro-batch `durationMs` components from
  StreamingQuery.recentProgress (triggerExecution = the whole batch;
  latestOffset = Python-DataSource offset poll; queryPlanning =
  incremental physical re-plan; walCommit/commitOffsets = checkpoint
  fsyncs; addBatch = job run incl. foreachBatch sink work), and
- the client-visible post->arrival and post->barrier-return times.

The gap between client p50 and the busy-batch triggerExecution median
is scheduling dead time: the micro-batch engine's idle pollingDelay
(spark.sql.streaming.pollingDelay, default 10 ms) before it notices
the new segment, plus empty-batch trigger cycles that hold the
trigger lock while a fresh post waits.

Usage: python tools/latency_probe.py [n_events] [pollingDelayMs]
Prints one JSON line with component medians (ms).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    polling_ms = sys.argv[2] if len(sys.argv) > 2 else None

    from async_event_streams_spark.session import get_spark
    from async_event_streams_spark.topics import Topic, TopicRegistry, pipe

    spark = get_spark(app_name="latency-probe", master="local[8]",
                      shuffle_partitions=8)
    if polling_ms is not None:
        spark.conf.set("spark.sql.streaming.pollingDelay", polling_ms)

    root = tempfile.mkdtemp(prefix="latprobe-")
    t = Topic(spark, "latprobe", "n long, v double", root, TopicRegistry())
    arrivals: dict[int, float] = {}

    def on_batch(df, batch_id):
        now = time.perf_counter()
        for r in df.select("n").collect():
            arrivals[int(r.n)] = now

    handle = pipe(
        t,
        sink_fn=on_batch,
        name="latprobe-sub",
        max_segments_per_batch=1,
        trigger_interval="0 milliseconds",
    )
    query = handle.query if hasattr(handle, "query") else None
    if query is None:  # PipeHandle stores the StreamingQuery somewhere
        for attr in ("query", "_query", "streaming_query"):
            query = getattr(handle, attr, None)
            if query is not None:
                break
    try:
        t.post([{"n": -1, "v": 0.0}])
        t.barrier()
        e2e, barrier_rt = [], []
        for i in range(n_events):
            sent = time.perf_counter()
            t.post([{"n": i, "v": float(i)}])
            t.barrier()
            back = time.perf_counter()
            e2e.append((arrivals[i] - sent) * 1000.0)
            barrier_rt.append((back - sent) * 1000.0)

        comp: dict[str, list[float]] = {}
        busy = empty = 0
        if query is not None:
            for p in query.recentProgress:
                rows = p.get("numInputRows", 0) if isinstance(p, dict) else 0
                d = p.get("durationMs", {}) if isinstance(p, dict) else {}
                if rows and rows > 0:
                    busy += 1
                    for k, v in d.items():
                        comp.setdefault(k, []).append(float(v))
                else:
                    empty += 1
                    comp.setdefault("emptyTriggerExecution", []).append(
                        float(d.get("triggerExecution", 0))
                    )

        def med(xs):
            return round(statistics.median(xs), 1) if xs else None

        out = {
            "n_events": n_events,
            "pollingDelayMs": polling_ms or "default(10)",
            "client_p50_post_to_arrival_ms": med(e2e),
            "client_p50_post_to_barrier_ms": med(barrier_rt),
            "busy_batches": busy,
            "empty_batches": empty,
            "engine_median_ms": {k: med(v) for k, v in sorted(comp.items())},
        }
        print(json.dumps(out))
    finally:
        t.close()


if __name__ == "__main__":
    main()
