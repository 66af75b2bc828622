"""Streaming hot-key / top-k maintenance: the `c_skew_report` contract
run as a pipe over the generalized MV delta log.

Per-key COUNT partials are the textbook decomposable state (additive
under any merge order), so the mv_rollup_pipe discipline applies
verbatim: each micro-batch writes its own per-key counts, compaction
folds the log without changing the answer, and the SNAPSHOT derives
the top-10 hot keys with integer-ppm shares — exactly the rows the
batch c_skew_report computes over all rows seen so far.

Why this earns its own module: skew is a RUNTIME property. The skew
probes and the adaptive dispatch lanes (functions/skew.py) decide
plans from key-share estimates; a streaming hot-key view is how those
estimates stay current between batch jobs — the same counts feed
`share_ppm` here and the hot/cold split thresholds there, so the
dispatcher can consult a continuously-maintained table instead of
paying a probe scan per run.

Scale: per batch the work is one map-side-combinable per-key count
over the batch's rows; state is |keys|-sized partials (the streaming
dedup cost class); the snapshot reads slim partials and TakeOrdered's
the top-k — the stream never re-scans history.

Stream==batch asserted wave-by-wave in tests/test_streaming_topk.py,
including a key whose counts span batches overtaking the leader, a
restart mid-stream, and compaction no-op-ness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .mv import mv_rollup_pipe, mv_snapshot
from .state import state_dirs

_TOPK = 10


def _count_rollup(df: DataFrame) -> DataFrame:
    return df.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def _count_merge(partials: DataFrame) -> DataFrame:
    return partials.groupBy("user_id").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def topk_pipe(source, state_dir: str, name: str = "topk", compact_every=None):
    """Maintain per-key count partials over an event-row stream.
    Returns the PipeHandle. State/compaction/replay semantics are
    mv_rollup_pipe's (delta log + crash-recoverable swap)."""
    return mv_rollup_pipe(
        source,
        state_dir,
        name=name,
        compact_every=compact_every,
        rollup_fn=_count_rollup,
        merge_fn=_count_merge,
    )


def topk_snapshot(spark: SparkSession, state_dir: str, k: int = _TOPK) -> DataFrame:
    """The CURRENT top-k hot keys with integer-ppm shares — the
    c_skew_report rows over every row seen so far. Empty state yields
    an empty report, not an error (the dq_snapshot lesson)."""
    if not state_dirs(state_dir):
        return spark.createDataFrame(
            [], "user_id long, cnt long, share_ppm long"
        )
    counts = mv_snapshot(spark, state_dir, merge_fn=_count_merge)
    total = counts.agg(F.sum("cnt").cast("long").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "user_id",
            "cnt",
            F.expr("CAST(cnt * 1000000 DIV total AS BIGINT)").alias(
                "share_ppm"
            ),
        )
        .orderBy(F.desc("cnt"), "user_id")
        .limit(k)
    )


def topk_batch_twin(rows: DataFrame, k: int = _TOPK) -> DataFrame:
    """The one-shot batch report over the same rows — what the
    snapshot must equal after every wave."""
    counts = _count_rollup(rows)
    total = counts.agg(F.sum("cnt").cast("long").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "user_id",
            "cnt",
            F.expr("CAST(cnt * 1000000 DIV total AS BIGINT)").alias(
                "share_ppm"
            ),
        )
        .orderBy(F.desc("cnt"), "user_id")
        .limit(k)
    )
