"""Streaming exact dedup: the mandate's `x_dedup_exact` semantics wired
through the reference's pipe composition (/root/reference/src/pipes.rs:99-125)
— a topic of documents in, a topic of FIRST-SEEN documents out, with the
seen-set carried as an incremental on-disk artifact table.

Batch twin: `queries/llm.py::x_dedup_exact` (sha2-keyed exact dedup).
The accumulated streaming output over any prefix of the input equals the
batch dedup of that prefix, keeping the earliest occurrence — asserted
by `tests/test_streaming_advanced.py::test_streaming_dedup_pipe_equals_batch`.

Scale shape: per batch, one column-pruned anti-join of the new batch
against the seen-hash table. The state is parquet, one directory per
micro-batch — at cluster scale the same layout is a partitioned table
(compact periodically); nothing is driver-resident and the batch side
of the join is the small one. Replay safety: batch N's state dir is
written with overwrite and the anti-join reads only batches < N, so a
crash-replayed batch reproduces exactly its original novel set — which
the pipe's txn header then refuses to double-publish.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .state import recover_compaction, compact_state, reject_partitioned_source
from .state import state_dirs as _state_dirs


def exact_dedup_pipe(
    source,
    target,
    state_dir: str,
    text_col: str = "text",
    name: str = "dedup",
    compact_every: int | None = None,
):
    """Wire `source` → exact-dedup → `target`: each micro-batch keeps
    only documents whose sha2(text) was never seen — not in any earlier
    batch (anti-join against the state table) nor earlier in the same
    batch (first occurrence by event_id) — and appends the survivors'
    hashes to the state. Returns the PipeHandle.

    `compact_every=K` auto-compacts the state every K batches: batch N
    (N a multiple of K) first folds all dirs < N into one. Everything
    below the current batch id is COMMITTED (foreachBatch replays at
    most the current batch), so the merge can never swallow a
    replayable batch's own rows — the `compact_state` safety rule,
    applied with the committed-batch watermark the pipe gets for free.
    A replayed batch N re-runs the compaction as a no-op (≤1 dir)."""
    from ..topics.pipe import pipe
    from ..util import materialize

    reject_partitioned_source(source, "exact_dedup_pipe")
    os.makedirs(state_dir, exist_ok=True)
    recover_compaction(state_dir)  # crash-interrupted swap, if any

    def dedup_batch(df, batch_id: int):
        spark = df.sparkSession
        if compact_every and batch_id and batch_id % compact_every == 0:
            compact_state(spark, state_dir, upto_batch=batch_id)
        hashed = df.withColumn(
            "__h", F.sha2(F.col(text_col).cast("binary"), 256)
        )
        # first occurrence within the batch (event_id is the topic's
        # arrival order); hash cardinality ~ row count, so the window
        # partitioning is fine at scale
        w = Window.partitionBy("__h").orderBy("event_id")
        first = (
            hashed.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        prior = _state_dirs(state_dir, batch_id)
        if prior:
            # Null-safe join: sha2(null) is null, and a plain equi-join
            # never matches null keys — a null-text document would be
            # re-published every micro-batch, diverging from the batch
            # twin (whose groupBy collapses nulls to one group).
            # eqNullSafe keeps null==null while staying an equi-join
            # (Catalyst hash-joins EqualNullSafe keys).
            seen = spark.read.parquet(*prior).withColumnRenamed("__h", "__h_seen")
            novel = first.join(
                seen, F.col("__h").eqNullSafe(F.col("__h_seen")), "left_anti"
            )
        else:
            novel = first
        # Pin before the two consumers (state write + downstream
        # publish) so both see the same materialized rows.
        novel = materialize(novel)
        (
            novel.select("__h")
            .write.mode("overwrite")  # replay-safe: batch N owns its dir
            .parquet(os.path.join(state_dir, f"batch={batch_id}"))
        )
        return novel.drop("__h")

    return pipe(source, fn=dedup_batch, target=target, name=name)


def partitioned_exact_dedup_pipes(
    source,
    target,
    state_root: str,
    text_col: str = "text",
    name: str = "dedup",
    compact_every: int | None = None,
):
    """Scale-out exact dedup for a CONTENT-KEYED PartitionedTopic: when
    the routing key is the dedup content (or deterministically derived
    from it — e.g. the text itself or its hash), every copy of a text
    lands in ONE partition, so one dedup pipe per sub-topic with its
    own state directory is globally correct — N fully independent
    dedup streams, no shared state, no cross-partition coordination.
    This is the sound per-partition shape the single-state pipes'
    partitioned-source guard points at.

    The key==content contract is the caller's: with an unrelated
    routing key, copies of one text can land in different partitions
    and dedup only per partition. Returns a MultiPipeHandle."""
    parts = getattr(source, "partitions", None)
    if parts is None:
        raise ValueError(
            "partitioned_exact_dedup_pipes needs a PartitionedTopic; "
            "use exact_dedup_pipe for a plain Topic"
        )
    from ..topics.pipe import MultiPipeHandle

    handles = MultiPipeHandle(
        exact_dedup_pipe(
            p,
            target,
            state_dir=os.path.join(state_root, f"p{i}"),
            text_col=text_col,
            name=f"{name}-p{i}",
            compact_every=compact_every,
        )
        for i, p in enumerate(parts)
    )
    if target is not None:
        # The per-partition pipes register sub-topic → target edges;
        # the chain barrier walks from the PARENT's name, so it needs
        # the parent → target edge too (same as pipe_per_partition).
        source.registry.add_edge(source.name, target.name)
    return handles
