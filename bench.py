#!/usr/bin/env python
"""Benchmark harness: runs the engine's query suite at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints the contract JSON line

    {"metric": "suite_wall_sec", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

followed by a compact tail-safe summary line (same headline fields,
per-query dict replaced by slowest5 + a pointer to BENCH_DETAIL.json,
which carries min/median per query and artifact-memo usage).

Each query is forced end-to-end with the `noop` sink (full computation,
no driver-side collect) so the timing measures the distributed plan, not
result transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from async_event_streams_spark.queries import QUERIES  # noqa: E402
from async_event_streams_spark.session import get_spark  # noqa: E402


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.removeprefix("sf"))
    except ValueError:
        return -1.0


def _host_sample() -> dict:
    """One host-telemetry sample (Linux): 1/5-min load average and the
    aggregate /proc/stat cpu counters. Emitted at start and end of the
    run so a contended measurement window is self-evident from the
    bench output alone (r13 verdict item 1: the 173s-vs-108s driver gap
    needed cross-referencing three artifacts to adjudicate)."""
    out: dict = {}
    try:
        with open("/proc/loadavg") as f:
            la = f.read().split()
        out["load1"], out["load5"] = float(la[0]), float(la[1])
        with open("/proc/stat") as f:
            v = [int(x) for x in f.readline().split()[1:]]
        # user nice system idle iowait irq softirq steal ...
        out["cpu_jiffies_total"] = sum(v)
        out["cpu_jiffies_idle"] = v[3] + v[4]
        out["cpu_jiffies_steal"] = v[7] if len(v) > 7 else 0
    except Exception:
        pass
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="aes-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm one-time session costs (JVM/codegen spin-up, Python UDF
    # worker pool spawn) so per-query timings reflect steady state.
    for warm in ("b4_classify_fizzbuzz", "c_pandas_udf"):
        QUERIES[warm](spark, sf_dir).write.mode("overwrite").format("noop").save()

    # Three passes; min AND median per query: single-pass local timings
    # are ±20% noisy (JIT/GC/page-cache). The min reflects the plan's
    # steady state (what extrapolates to a cluster); the median shows
    # whether a cross-round drift is noise (median ≈ min) or a real
    # regression (median and min both moved). Artifact memo traffic is
    # recorded per query so readers can tell which timings paid a
    # build-once artifact and which rode a warm memo (those per-query
    # numbers are not standalone costs).
    from async_event_streams_spark.util import drain_artifact_events

    # SPARK_GRAFT_BENCH_PASSES overrides for expensive off-default
    # runs (e.g. a full-registry pass at sf1, where 3 passes cost an
    # hour and min-of-2 already separates plan cost from noise).
    N_PASSES = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
    runs: dict[str, list[float]] = {}
    artifact_uses: dict[str, dict[str, list[str]]] = {}
    host_start = _host_sample()
    t_suite = time.perf_counter()
    for _pass in range(N_PASSES):
        for name in sorted(QUERIES):
            drain_artifact_events()
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            runs.setdefault(name, []).append(
                round(time.perf_counter() - t0, 3)
            )
            events = [f"{what}:{key}" for key, what in drain_artifact_events()]
            if events:
                artifact_uses.setdefault(name, {})[
                    "cold" if _pass == 0 else "warm"
                ] = events
    timings = {n: min(ts) for n, ts in runs.items()}
    medians = {n: sorted(ts)[len(ts) // 2] for n, ts in runs.items()}
    total = round(sum(timings.values()), 3)
    wall = round(time.perf_counter() - t_suite, 3)
    host_end = _host_sample()
    # Per-pass suite totals. pass_totals[0] is the COLD total: it pays
    # every build-once artifact (LSH bands, IVF cells, gram tables —
    # per-key build seconds in BENCH_DETAIL's artifact_build_secs), so
    # the one-time index cost is a headline number beside the warm
    # min-of-N, never a footnote (r13 verdict items 1-2).
    pass_totals = [
        round(sum(ts[p] for ts in runs.values() if len(ts) > p), 3)
        for p in range(N_PASSES)
    ]
    telemetry = {
        "pass_totals": pass_totals,
        "value_cold": pass_totals[0],
        "load1_start": host_start.get("load1"),
        "load1_end": host_end.get("load1"),
        "load5_start": host_start.get("load5"),
        "load5_end": host_end.get("load5"),
    }
    if "cpu_jiffies_total" in host_start and "cpu_jiffies_total" in host_end:
        d_total = host_end["cpu_jiffies_total"] - host_start["cpu_jiffies_total"]
        if d_total > 0:
            d_idle = host_end["cpu_jiffies_idle"] - host_start["cpu_jiffies_idle"]
            d_steal = (
                host_end["cpu_jiffies_steal"] - host_start["cpu_jiffies_steal"]
            )
            telemetry["cpu_busy_frac"] = round(1.0 - d_idle / d_total, 3)
            telemetry["cpu_steal_frac"] = round(d_steal / d_total, 4)

    # Best-of-2 for the same reason the query suite is min-of-2: the
    # first run pays one-time streaming-query/codegen spin-up (measured
    # ~3x noise), and the steady state is what extrapolates to a
    # long-running cluster deployment. The first-run figure is reported
    # too, so spin-up cost stays visible and rounds stay comparable.
    topic_runs = [_topic_throughput(spark) for _ in range(2)]
    ptopic_runs = [_partitioned_topic_throughput(spark) for _ in range(2)]
    pe_rate, pe_p50_ms = _per_event_fidelity(spark)

    # Output layout is tail-robust: the recording harness keeps only
    # the last ~2000 chars of stdout and tries to parse the final line.
    # Line 1 is the full contract JSON ({"metric", ..., "queries":
    # {...}}), too long to survive a 2000-char tail with 98 queries;
    # the LAST line is a compact summary that fits the tail whole and
    # parses. Full per-query detail (min + median + artifact memo
    # usage) is also written to BENCH_DETAIL.json next to this script.
    headline = {
        "metric": "suite_wall_sec",
        "value": total,
        "unit": "sec",
        "sf": _sf_from_dir(sf_dir),
        "n_queries": len(timings),
        "sec_per_query": round(total / len(timings), 3),
        "passes": N_PASSES,
        "wall_sec_all_passes": wall,
        **telemetry,
        "topic_events_per_sec": max(topic_runs),
        "topic_events_per_sec_first": topic_runs[0],
        "partitioned_topic_events_per_sec": max(ptopic_runs),
        "partitioned_topic_events_per_sec_first": ptopic_runs[0],
        "per_event_mode_events_per_sec": pe_rate,
        "per_event_mode_p50_latency_ms": pe_p50_ms,
    }
    from async_event_streams_spark.util import artifact_build_secs

    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump(
            dict(
                headline,
                queries=timings,
                queries_median=medians,
                artifact_uses=artifact_uses,
                artifact_build_secs=artifact_build_secs(),
            ),
            f,
            indent=1,
            sort_keys=True,
        )
    print(json.dumps(dict(headline, queries=timings)))
    print(
        json.dumps(
            dict(
                headline,
                queries_detail="BENCH_DETAIL.json",
                slowest5=dict(
                    sorted(timings.items(), key=lambda kv: -kv[1])[:5]
                ),
            )
        )
    )


def _topic_throughput(spark, n_batches: int = 20, batch_size: int = 500) -> float:
    """Topic-layer throughput: publish→subscribe→drain events/sec
    through the custom streaming source with one subscriber."""
    import tempfile

    from async_event_streams_spark.topics import Topic, TopicRegistry, pipe

    root = tempfile.mkdtemp(prefix="bench-topic-")
    t = Topic(spark, "bench", "n long, v double", root, TopicRegistry())
    seen = []
    pipe(t, sink_fn=lambda df, b: seen.append(df.count()), name="bench-sub")
    try:
        # Warm the pipe INSIDE the call: each call creates a fresh
        # topic + streaming query, and the query's spin-up (~1.4 s on
        # this box) otherwise dominates the 2 s measurement window —
        # r3->r4 "drift" in this metric was spin-up variance, not the
        # drain path (profiled r5; see BASELINE.md). The steady-state
        # drain is what a long-running deployment sees; the _first
        # variant (pass 0, no warm benefit beyond its own) keeps
        # spin-up visible.
        t.post([{"n": -1, "v": 0.0}])
        t.barrier()
        t0 = time.perf_counter()
        for b in range(n_batches):
            t.post(
                [
                    {"n": b * batch_size + i, "v": float(i)}
                    for i in range(batch_size)
                ]
            )
        t.barrier()
        dt = time.perf_counter() - t0
        assert sum(seen) == n_batches * batch_size + 1
        return round(n_batches * batch_size / dt, 1)
    finally:
        t.close()


def _per_event_fidelity(spark, n_events: int = 30) -> tuple[float, float]:
    """PER-EVENT FIDELITY mode (SURVEY §8-H1): the reference's
    `send_event` blocks per event (src/lib.rs:47-52); the engine's
    conformance lane is `max_segments_per_batch=1` — every micro-batch
    admits exactly ONE published segment, so barrier and ordering
    granularity match the reference exactly. This measures what that
    fidelity costs: single-event posts through a 1-segment-per-batch
    pipe, returning (events/sec, p50 end-to-end latency ms) — the
    number BASELINE.md keeps beside the bulk lanes so the relaxation
    is a measured trade, not a sentence."""
    import tempfile

    from async_event_streams_spark.topics import Topic, TopicRegistry, pipe

    root = tempfile.mkdtemp(prefix="bench-pe-")
    t = Topic(spark, "benchpe", "n long, v double", root, TopicRegistry())
    arrivals: dict[int, float] = {}

    def on_batch(df, batch_id):
        now = time.perf_counter()
        for r in df.select("n").collect():
            arrivals[int(r.n)] = now

    pipe(
        t,
        sink_fn=on_batch,
        name="bench-pe-sub",
        max_segments_per_batch=1,
        trigger_interval="0 milliseconds",
    )
    try:
        t.post([{"n": -1, "v": 0.0}])  # spin-up outside the window
        t.barrier()
        # the reference's send_event BLOCKS per event: post, await the
        # delivery barrier, only then produce the next — so latency is
        # a round-trip, never queueing
        lats = []
        t0 = time.perf_counter()
        for i in range(n_events):
            sent = time.perf_counter()
            t.post([{"n": i, "v": float(i)}])
            t.barrier()
            lats.append((arrivals[i] - sent) * 1000.0)
        dt = time.perf_counter() - t0
        lats.sort()
        return (
            round(n_events / dt, 1),
            round(lats[len(lats) // 2], 1),
        )
    finally:
        t.close()


def _partitioned_topic_throughput(
    spark, n_batches: int = 20, batch_size: int = 500, partitions: int = 4
) -> float:
    """Publish→subscribe→drain through the N-way sharded topic with N
    CONCURRENT producers (one per partition's key range) — the workload
    sharding exists for: a single FIFO serializes all producers on one
    lock, the partitioned log appends in parallel. A single driver
    thread posting sequentially would only measure sharding overhead."""
    import tempfile
    from concurrent.futures import ThreadPoolExecutor

    from async_event_streams_spark.topics import PartitionedTopic, TopicRegistry, pipe

    root = tempfile.mkdtemp(prefix="bench-ptopic-")
    t = PartitionedTopic(
        spark, "benchp", "k string, n long, v double", root,
        key_col="k", num_partitions=partitions, registry=TopicRegistry(),
    )
    seen = []
    pipe(t, sink_fn=lambda df, b: seen.append(df.count()), name="benchp-sub")

    def produce(worker: int) -> None:
        for b in range(n_batches):
            t.post(
                [
                    {
                        "k": f"w{worker}-{i % 64}",
                        "n": b * batch_size + i,
                        "v": float(i),
                    }
                    for i in range(batch_size)
                ]
            )

    try:
        # same in-call warm-up as _topic_throughput: exclude the
        # streaming queries' spin-up from the steady-state figure
        t.post([{"k": "warm", "n": -1, "v": 0.0}])
        t.barrier()
        total = partitions * n_batches * batch_size
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=partitions) as pool:
            list(pool.map(produce, range(partitions)))
        t.barrier()
        dt = time.perf_counter() - t0
        assert sum(seen) == total + 1
        return round(total / dt, 1)
    finally:
        t.close()


if __name__ == "__main__":
    main()
