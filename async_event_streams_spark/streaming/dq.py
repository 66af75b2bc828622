"""Streaming data-quality monitoring: the `c_dq_audit` contract run as
a pipe — every micro-batch folds its rows into audit state, and the
snapshot reports the SAME (check, n_checked, n_violations) rows a
one-shot batch audit over all rows seen so far would.

The checks split into two state classes, and keeping them straight is
the whole design:

- **Additive checks** (null, range, FK-against-static-dimension): a
  violation is decided per ROW, so per-batch (checked, violations)
  counter partials merge by plain addition — the `streaming/mv.py`
  delta-log discipline, state is O(checks × batches) and compaction
  folds it to O(checks).
- **PK uniqueness is NOT row-decomposable**: a key sent once in batch
  1 and again in batch 9 is a violation no per-batch counter can see.
  It IS key-decomposable: state = per-key count partials (key, n per
  batch); the snapshot merges counts per key and reports
  Σ(n_k) − |keys with n_k ≥ 1| = duplicates, exactly
  COUNT(*) − COUNT(DISTINCT key). Per-key state is the honest price
  of an exact cross-batch uniqueness check — the same |keys|-sized
  state streaming dedup (`streaming/dedup.py`) carries, map-side
  combinable, foldable by key at compaction.

The FK check resolves each batch against the customer DIMENSION
(broadcast-sized by assumption, re-read per batch so late dimension
loads are picked up): violations are decided per event row, so the
counter stays additive.

Scale notes (100 TB): per batch the work is one partial-agg over the
batch's rows (counters) + one per-key rollup (PK partials) — the
stream never re-scans history; snapshot/compaction read only slim
partial rows. At cluster scale the state dirs are a transactional
table and the swap in compaction is a commit, same as
`state.compact_state`.

Stream==batch equality asserted wave-by-wave in
tests/test_streaming_dq.py, including duplicate keys that SPAN
batches, a restart mid-stream, and compaction no-op-ness.
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

_COUNTER_SUB = "counters"
_PK_SUB = "pk_counts"

_SNAPSHOT_SCHEMA = "check_name string, n_checked long, n_violations long"


def _counter_partials(df: DataFrame, customer: DataFrame) -> DataFrame:
    """Per-batch additive (check, checked, violations) rows for the
    row-decidable checks."""
    base = df.select(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("null_value"),
        F.sum(F.when((F.col("value") < 0) | (F.col("value") > 1_000_000), 1).otherwise(0))
        .cast("long")
        .alias("range_value"),
    )
    fk = (
        df.join(
            F.broadcast(customer.select(F.col("c_custkey").alias("user_id"))),
            "user_id",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("missing"))
    )
    counters = base.crossJoin(fk)
    rows = [
        ("events_value_not_null", F.col("n"), F.col("null_value")),
        ("events_value_in_range", F.col("n"), F.col("range_value")),
        ("events_fk_customer", F.col("n"), F.col("missing")),
    ]
    out = None
    for name, checked, viol in rows:
        r = counters.select(
            F.lit(name).alias("check_name"),
            checked.alias("n_checked"),
            viol.alias("n_violations"),
        )
        out = r if out is None else out.unionAll(r)
    return out


def _pk_partials(df: DataFrame) -> DataFrame:
    return df.groupBy(F.col("row_id").alias("pk")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


def dq_monitor_pipe(
    source,
    state_dir: str,
    customer: DataFrame,
    name: str = "dq-monitor",
    compact_every: int | None = None,
):
    """Maintain streaming audit state over an event-row stream.
    `customer` is the static FK dimension (broadcast-sized). Returns
    the PipeHandle."""
    from ..topics.pipe import pipe

    reject_partitioned_source(source, "dq_monitor_pipe")
    cdir = os.path.join(state_dir, _COUNTER_SUB)
    pdir = os.path.join(state_dir, _PK_SUB)
    os.makedirs(cdir, exist_ok=True)
    os.makedirs(pdir, exist_ok=True)
    recover_compaction(cdir)  # finish/abort any crash-interrupted swap
    recover_compaction(pdir)

    def _compact(spark: SparkSession, batch_id: int) -> None:
        # Fold both state roots below the watermark. Counters merge by
        # check; PK partials merge by key — both decomposable, so the
        # snapshot provably cannot change (asserted in the test).
        # Shared crash-recoverable swap (state.swap_compacted).
        for sub, merge in (
            (cdir, _merge_counters),
            (pdir, _merge_pk),
        ):
            dirs = state_dirs(sub, batch_id)
            if len(dirs) <= 1:
                continue
            swap_compacted(
                sub,
                dirs,
                lambda tmp, dirs=dirs, merge=merge: merge(
                    spark.read.parquet(*dirs)
                )
                .write.mode("overwrite")
                .parquet(tmp),
            )

    def fold_batch(df, batch_id: int):
        spark = df.sparkSession
        # Both state roots are always written together, but guard each
        # independently: a checkpoint reset must be rejected even if
        # only one root retained later batches.
        reject_stale_state(cdir, batch_id, "dq_monitor_pipe")
        reject_stale_state(pdir, batch_id, "dq_monitor_pipe")
        if compact_every and batch_id and batch_id % compact_every == 0:
            _compact(spark, batch_id)
        # Batch N owns its dirs with overwrite: crash replay reproduces
        # identical partials (exactly-once via idempotent rewrite).
        _counter_partials(df, customer).write.mode("overwrite").parquet(
            os.path.join(cdir, f"batch={batch_id}")
        )
        _pk_partials(df).write.mode("overwrite").parquet(
            os.path.join(pdir, f"batch={batch_id}")
        )
        return df

    return pipe(source, fn=fold_batch, sink_fn=lambda df, b: None, name=name)


def _merge_counters(partials: DataFrame) -> DataFrame:
    return partials.groupBy("check_name").agg(
        F.sum("n_checked").cast("long").alias("n_checked"),
        F.sum("n_violations").cast("long").alias("n_violations"),
    )


def _merge_pk(partials: DataFrame) -> DataFrame:
    return partials.groupBy("pk").agg(F.sum("n").cast("long").alias("n"))


def dq_snapshot(spark: SparkSession, state_dir: str) -> DataFrame:
    """The CURRENT audit: additive counters re-merged by check, plus
    the PK-uniqueness row derived from merged per-key counts
    (Σn − |keys| = COUNT(*) − COUNT(DISTINCT key))."""
    cdirs = state_dirs(os.path.join(state_dir, _COUNTER_SUB))
    pdirs = state_dirs(os.path.join(state_dir, _PK_SUB))
    if not cdirs:
        return spark.createDataFrame([], _SNAPSHOT_SCHEMA)
    counters = _merge_counters(spark.read.parquet(*cdirs))
    if not pdirs:
        # A crash between the counter write and the pk write of the
        # first batch leaves cdirs non-empty while pdirs is empty;
        # an empty pk root means zero keys checked, not an error.
        pk_row = spark.createDataFrame(
            [("events_pk_unique", 0, 0)], _SNAPSHOT_SCHEMA
        )
        return counters.unionAll(pk_row)
    keys = _merge_pk(spark.read.parquet(*pdirs))
    pk_row = keys.agg(
        F.lit("events_pk_unique").alias("check_name"),
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_checked"),
        (F.coalesce(F.sum("n"), F.lit(0)) - F.count(F.lit(1)))
        .cast("long")
        .alias("n_violations"),
    )
    return counters.unionAll(pk_row)


def dq_batch_twin(rows: DataFrame, customer: DataFrame) -> DataFrame:
    """The one-shot batch audit over the same rows — what the snapshot
    must equal after every wave (the stream==batch differential)."""
    counters = _counter_partials(rows, customer)
    pk = rows.agg(
        F.lit("events_pk_unique").alias("check_name"),
        F.count(F.lit(1)).cast("long").alias("n_checked"),
        (F.count(F.lit(1)) - F.countDistinct("row_id"))
        .cast("long")
        .alias("n_violations"),
    )
    return counters.unionAll(pk)
