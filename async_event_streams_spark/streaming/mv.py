"""Streaming materialized-view maintenance: the batch invariant
`c_mv_incremental` proves — merge(base, agg(delta)) == agg(all rows)
for decomposable aggregates — run as a pipe.

Each micro-batch aggregates ONLY its own rows into view partials
(COUNT and integer-cents SUM — the decomposable pair, exact under any
merge order) and appends them as `batch=N` parquet: the view IS its
delta log, which is exactly how production streaming MVs store
incremental state (a delta log + periodic compaction). The snapshot
re-merges on read (one groupBy over |keys| x |dirs| slim partial
rows, never the fact stream); `compact_every` folds the log so the
snapshot's input stays bounded — and because the merge is
algebraically exact, compaction can never change the answer
(asserted). Replay discipline: batch N owns its dir with overwrite,
so a crash replay reproduces identical partials.

Stream==batch equality (tests/test_streaming_mv.py): after every
wave, the snapshot equals the one-shot rollup over all rows sent so
far — and the boundary case a real MV must get right (a group whose
rows span multiple batches) is exercised by construction.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .state import (
    recover_compaction,
    reject_partitioned_source,
    reject_stale_state,
    state_dirs,
    swap_compacted,
)

# Default view: the monthly revenue-by-priority rollup — the same
# shape c_mv_incremental maintains in batch.
_KEYS = ("priority", "month")


def _rollup(df: DataFrame) -> DataFrame:
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return df.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month"),
    ).agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(cents).cast("long").alias("revenue_c"),
    )


def _merge(partials: DataFrame) -> DataFrame:
    return partials.groupBy(*_KEYS).agg(
        F.sum("n_orders").cast("long").alias("n_orders"),
        F.sum("revenue_c").cast("long").alias("revenue_c"),
    )


def mv_rollup_pipe(
    source,
    state_dir: str,
    name: str = "mv-rollup",
    compact_every: int | None = None,
    rollup_fn=None,
    merge_fn=None,
):
    """Maintain a decomposable-aggregate view over a row stream.
    Defaults maintain the monthly revenue-by-priority view over order
    rows (the c_mv_incremental shape); pass `rollup_fn` (batch rows →
    view partials) and `merge_fn` (partials → view) for any other
    view whose aggregates are decomposable — the pair must satisfy
    merge(p1 ∪ p2) == merge(rollup(r1 ∪ r2) ...), which COUNT/SUM/
    MIN/MAX give for free (functions/skew.py lists the exact set).
    Returns the PipeHandle."""
    from ..topics.pipe import pipe

    _rollup_fn = rollup_fn or _rollup
    _merge_fn = merge_fn or _merge
    reject_partitioned_source(source, "mv_rollup_pipe")
    os.makedirs(state_dir, exist_ok=True)
    recover_compaction(state_dir)  # finish/abort any crash-interrupted swap

    def fold_batch(df, batch_id: int):
        spark = df.sparkSession
        reject_stale_state(state_dir, batch_id, "mv_rollup_pipe")
        if compact_every and batch_id and batch_id % compact_every == 0:
            # fold the delta log: MERGE the partials below the
            # committed-batch watermark into one |keys|-row dir — the
            # decomposability that makes MVs work guarantees the
            # snapshot cannot change (asserted in the test). Shared
            # crash-recoverable swap (state.swap_compacted marker
            # protocol; transactional-table commit at cluster scale).
            dirs = state_dirs(state_dir, batch_id)
            if len(dirs) > 1:
                swap_compacted(
                    state_dir,
                    dirs,
                    lambda tmp: _merge_fn(spark.read.parquet(*dirs))
                    .write.mode("overwrite")
                    .parquet(tmp),
                )
        partials = _rollup_fn(df)
        partials.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"batch={batch_id}")
        )
        return partials

    return pipe(source, fn=fold_batch, sink_fn=lambda df, b: None, name=name)


def mv_snapshot(
    spark: SparkSession, state_dir: str, merge_fn=None
) -> DataFrame:
    """The CURRENT view: re-merge the delta log's partial rows (slim —
    |view keys| x |dirs|, never fact rows). Pass the same `merge_fn`
    the pipe was built with for non-default views."""
    dirs = state_dirs(state_dir)
    if not dirs:
        return spark.createDataFrame(
            [],
            "priority string, month timestamp, n_orders long, revenue_c long",
        )
    return (merge_fn or _merge)(spark.read.parquet(*dirs))
