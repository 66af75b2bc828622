"""`pipe` ≈ `spawn_event_pipe` (/root/reference/src/pipes.rs:99-154) and
`@sink` ≈ the `EventSink` trait + derive macro (src/pipes.rs:43-94,
async-event-streams-derive/src/lib.rs:36-87).

A pipe is source-topic → transform → (target-topic | sink-fn), realized
as one streaming query with a foreachBatch handler. Two reference
behaviors are threaded through automatically:

- **causality** (src/pipes.rs:116): before the user transform runs, the
  consumed event's id is exposed as `source_event_id`, so anything the
  pipe re-emits downstream carries its cause — the lineage column the
  chain barrier and b10_lineage_join rely on;
- **error handling** (src/pipes.rs:117-124): the first transform/sink
  error stops the pipe and invokes `error_handler(exc)`.
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .topic import ENVELOPE_NAMES, Topic


class PipeHandle:
    """Joinable pipe handle (≈ spawn_event_pipe_with_handle,
    src/pipes.rs:127-154): exposes the underlying StreamingQuery."""

    def __init__(self, query, name: str):
        self.query = query
        self.name = name

    def await_idle(self) -> None:
        self.query.processAllAvailable()

    def stop(self) -> None:
        if self.query.isActive:
            self.query.stop()
        try:
            # stop() can return before the run releases its checkpoint;
            # a same-name restart would then see "concurrently using".
            self.query.awaitTermination(30)
        except Exception:
            pass

    @property
    def is_active(self) -> bool:
        return self.query.isActive

    def exception(self):
        return self.query.exception()


class MultiPipeHandle(list):
    """Consumer-group handle: one `PipeHandle` per topic partition (the
    elements), aggregated behind the single-handle interface so code
    written against `pipe()`'s return value works unchanged whether the
    source was a plain Topic or a PartitionedTopic."""

    def await_idle(self) -> None:
        for h in self:
            h.await_idle()

    def stop(self) -> None:
        for h in self:
            h.stop()

    @property
    def is_active(self) -> bool:
        return any(h.is_active for h in self)

    def exception(self):
        for h in self:
            exc = h.exception()
            if exc is not None:
                return exc
        return None


def pipe(
    source: Topic,
    fn: Callable[[DataFrame], DataFrame] | None = None,
    target: Topic | None = None,
    sink_fn: Callable[[DataFrame, int], None] | None = None,
    name: str | None = None,
    error_handler: Callable[[Exception], None] | None = None,
    subscribe_from: str = "latest",
    trigger_interval: str = "50 milliseconds",
    bulk_threshold: int = 10_000,
    max_segments_per_batch: int = 1000,
) -> PipeHandle:
    """Wire source → fn → (target and/or sink_fn) as a streaming query.

    `fn` maps a micro-batch DataFrame to a DataFrame (None = identity);
    a two-parameter `fn(df, batch_id)` also receives the micro-batch id
    (foreachBatch's second argument — what stateful transforms key
    their replay-safe state versions on). Rows re-emitted to `target`
    get fresh event ids on the target topic but keep `source_event_id`
    lineage (auto-set to the consumed event_id before `fn`; `fn` may
    override it).

    `max_segments_per_batch=1` is PER-EVENT FIDELITY mode (SURVEY
    §8-H1): every micro-batch admits exactly one published segment, so
    barrier/ordering granularity matches the reference's per-event
    `send_event` — at micro-batch-rate throughput cost (measured in
    BASELINE.md's per-event lane).

    Republish path is size-dependent: batches up to `bulk_threshold`
    rows go through the driver-side segment log (control-plane FIFO);
    larger batches are written by EXECUTORS via `target.post_df` with
    only a marker in the log — a pipe carrying data-plane volume never
    materializes its rows on the driver. Both paths record the same
    `{pipe}:{batch_id}` txn header, so exactly-once across crash
    replays is preserved regardless of which path a batch took.
    """
    if target is None and sink_fn is None:
        raise ValueError("pipe needs a target topic and/or a sink_fn")
    if getattr(source, "partitions", None) is not None:
        # PartitionedTopic: default to the consumer-group drain — one
        # independent pipe per partition (own checkpoint, own txn line,
        # partitions progress independently) instead of one query over
        # the N-way source union, whose every micro-batch must poll all
        # N sources in lock-step (measured ~2x slower at N=4 and worse
        # as N grows).
        return source.pipe_per_partition(
            fn=fn,
            target=target,
            sink_fn=sink_fn,
            name=name,
            error_handler=error_handler,
            subscribe_from=subscribe_from,
            trigger_interval=trigger_interval,
            bulk_threshold=bulk_threshold,
            max_segments_per_batch=max_segments_per_batch,
        )
    pipe_name = name or f"pipe-{source.name}-{uuid.uuid4().hex[:8]}"
    checkpoint = os.path.join(source.dir, "_checkpoints", pipe_name)
    fn_wants_batch_id = False
    if fn is not None:
        import inspect

        try:
            fn_wants_batch_id = len(inspect.signature(fn).parameters) >= 2
        except (TypeError, ValueError):  # builtins/partials: assume 1-arg
            fn_wants_batch_id = False
    # Exactly-once re-publish across crash replays: foreachBatch replays
    # the last uncommitted batch after a restart; the txn header recorded
    # inside the target's (atomically renamed) segment tells us which
    # batches already published. Resolved lazily on the first batch.
    publish_state = {"last": None}

    def batch_fn(df: DataFrame, batch_id: int) -> None:
        try:
            # Auto-causality: the consumed event is the source of
            # whatever this pipe re-emits (pipes.rs:116).
            out = df.withColumn("source_event_id", F.col("event_id"))
            if fn is not None:
                out = fn(out, batch_id) if fn_wants_batch_id else fn(out)
            if target is not None:
                if publish_state["last"] is None:
                    publish_state["last"] = target.last_txn(pipe_name)
                if batch_id > publish_state["last"]:
                    txn = f"{pipe_name}:{batch_id}"
                    keep = [
                        c
                        for c in out.columns
                        if c in ("source_event_id", "event_type")
                        or c not in ENVELOPE_NAMES
                    ]
                    # Pin the transformed batch BEFORE the limit-probe:
                    # partitions the probe computes land in the cache, so
                    # a bulk batch's executor-side write re-reads them
                    # instead of re-running `fn` end-to-end — the
                    # transform executes ~once per batch on both paths.
                    # Small batches still cost one job (the probe).
                    pub = out.select(*keep).persist()
                    try:
                        rows = pub.limit(bulk_threshold + 1).collect()
                        if len(rows) > bulk_threshold:
                            target.post_df(pub, txn=txn)
                        elif rows:
                            target.post(
                                [r.asDict(recursive=True) for r in rows],
                                txn=txn,
                            )
                    finally:
                        pub.unpersist()
                    publish_state["last"] = batch_id
            if sink_fn is not None:
                sink_fn(out, batch_id)
        except Exception as exc:  # first error terminates the pipe (A14)
            if error_handler is not None:
                error_handler(exc)
            raise

    stream = source.subscribe(
        subscribe_from=subscribe_from,
        max_segments_per_batch=max_segments_per_batch,
    )
    query = (
        stream.writeStream.foreachBatch(batch_fn)
        .queryName(pipe_name)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=trigger_interval)
        .start()
    )
    source.attach_query(query)
    if target is not None:
        source.registry.add_edge(source.name, target.name)
    return PipeHandle(query, pipe_name)


def sink(
    *topics: Topic,
    name: str | None = None,
    error_handler: Callable[[Exception], None] | None = None,
) -> Callable:
    """Decorator registering a batch handler as a sink on one or more
    topics (multi-event sinks mirror the derive macro's multi-`event`
    attribute). The decorated function keeps a `.handles` list of
    PipeHandles; the function itself is returned unchanged."""

    def deco(fn: Callable[[DataFrame, int], None]):
        handles = [
            pipe(
                t,
                sink_fn=fn,
                name=f"{name or fn.__name__}-{t.name}",
                error_handler=error_handler,
            )
            for t in topics
        ]
        fn.handles = handles
        return fn

    return deco
