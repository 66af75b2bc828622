"""Scalable global ordering: total-order row numbers without a
single-partition window.

`ROW_NUMBER() OVER (ORDER BY ...)` with no PARTITION BY collapses the
whole dataset into ONE task — the classic plan that works in tests and
dies at 100 TB. This module computes the same numbering with a
range-partitioned sort (parallel), per-partition local numbering, and a
broadcast prefix-sum of partition counts: every stage is distributed,
and the only single-point data is the tiny (n_partitions)-row offset
table.

This is the engine's answer to SURVEY.md §8-H2 (the reference's causal
total order re-established after parallel fan-out): ordering keys must
form a total order (include a unique tie-break) so the range partition
boundaries are unambiguous.
"""

from __future__ import annotations

from pyspark.storagelevel import StorageLevel as _SL
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's size estimate for `df`'s optimized logical plan, in
    bytes — file-size-derived for parquet scans, propagated through
    projections/filters — or None when the estimate is unavailable.
    Costs no Spark job, which is why the adaptive helpers below can
    consult it per call. When Catalyst cannot estimate, it reports a
    huge default, which correctly steers `auto` to the scalable path.

    Pinned intermediates (materialize()/artifact() localCheckpoints)
    surface as LogicalRDD leaves, where Catalyst substitutes that huge
    default even for a kilobyte frame — so every ranked/summed consumer
    of a pinned artifact paid the prefix machinery regardless of size
    (r13 measured 0.67 vs 0.35 s on a 5 000-row frame). When the
    checkpoint blocks are already materialized the block manager knows
    the TRUE bytes: if every leaf is either a measured LogicalRDD or a
    Catalyst-estimable relation, the leaf-sum is an honest input-size
    signal and the helpers use min(estimate, leaf-sum). Fail-safe both
    ways: an unmaterialized checkpoint has no storage entry (huge
    default stands → scalable path), and a corpus-sized artifact's
    measured bytes are large → scalable path."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        est = int(str(plan.stats().sizeInBytes()))
        leaves = plan.collectLeaves()
        sizes = None
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            if leaf.getClass().getSimpleName() != "LogicalRDD":
                leaf_est = int(str(leaf.stats().sizeInBytes()))
                sizes = (sizes or 0) + leaf_est
                continue
            rid = leaf.rdd().id()
            true_size = None
            for info in (
                df.sparkSession.sparkContext._jsc.sc().getRDDStorageInfo()
            ):
                if info.id() == rid:
                    true_size = info.diskSize() + info.memSize()
                    break
            if true_size is None:  # not materialized yet: keep the
                return est  # fail-safe huge default
            sizes = (sizes or 0) + int(true_size)
        return est if sizes is None else min(est, sizes)
    except Exception:
        return None


# Inputs estimated at or under this take the plain-window fast path in
# mode="auto": one task per group sorting ≤ this many bytes is cheaper
# than the prefix-sum machinery's extra checkpoint + join. Above it, the
# 100-TB question dominates and the range-partitioned path wins.
# Calibration note: Catalyst's estimate derives from (compressed)
# parquet bytes × projection ratio and understates deserialized row
# size ~5-10×, so 32 MiB estimated ≈ a few hundred MB / ~5M rows in a
# sort task — measured at the crossover where the two shapes cost the
# same (100× probe: 10M-row sort, window 4.3 s vs prefix 5.6 s); past
# it the single task only gets worse while prefix stays flat.
SMALL_INPUT_BYTES = 32 << 20


def global_row_number(
    df: DataFrame,
    order_cols: list[str | Column],
    pos_col: str = "pos",
    n_partitions: int | None = None,
    mode: str = "auto",
    small_input_bytes: int = SMALL_INPUT_BYTES,
) -> DataFrame:
    """Append `pos_col` = 1-based global rank by `order_cols`.

    Equivalent to ROW_NUMBER() OVER (ORDER BY order_cols) but scalable:
    rows never leave their range partition; only partition row-counts
    are centralized (one tiny aggregate + broadcast join).

    Contract: `pos_col` is int32 (matching every consumer's INTEGER
    oracle schema) — ranks cap at ~2.1B rows per ranked input. The
    consumers that rank the full corpus (shuffle order, sharding,
    packing) would swap this cast to long past that bound; the
    mechanics (local row_number + broadcast offsets, both already
    long-safe) are unchanged.

    mode="auto" (default) takes the plain single-partition window when
    Catalyst estimates the input at <= `small_input_bytes` — one task
    sorting a few MB beats the checkpoint + broadcast join — and the
    range-partitioned prefix-sum otherwise (unknown estimate counts as
    big). mode="prefix"/"window" force a shape."""
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    if mode not in ("auto", "prefix", "window"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode == "auto":
        est = plan_size_bytes(df)
        mode = "window" if est is not None and est <= small_input_bytes else "prefix"
    if mode == "window":
        return df.withColumn(
            pos_col,
            F.row_number().over(Window.orderBy(*order_cols)).cast("int"),
        )
    parts = df.repartitionByRange(n, *order_cols).sortWithinPartitions(*order_cols)
    # Pin ONE physical partitioning: range boundaries come from sampling,
    # so the counts branch and the main branch would otherwise each
    # re-sample and could disagree on partition membership. The
    # checkpoint materializes the sorted partitions once; both branches
    # (and the final window) reuse them.
    with_pid = parts.withColumn(
        "__pid", F.spark_partition_id()
    ).localCheckpoint(eager=False, storageLevel=_SL.DISK_ONLY)

    counts = with_pid.groupBy("__pid").agg(F.count("*").alias("__cnt"))
    w_off = (
        Window.orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )  # windows over n_partitions rows — trivially small
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__offset"),
    )

    w_local = Window.partitionBy("__pid").orderBy(*order_cols)
    return (
        with_pid.join(F.broadcast(offsets), "__pid")
        .withColumn(
            pos_col,
            (F.row_number().over(w_local) + F.col("__offset")).cast("int"),
        )
        .drop("__pid", "__offset")
    )


def global_running_sum(
    df: DataFrame,
    order_cols: list[str | Column],
    value_col: str,
    sum_col: str = "running_sum",
    n_partitions: int | None = None,
    mode: str = "auto",
    small_input_bytes: int = SMALL_INPUT_BYTES,
) -> DataFrame:
    """Append `sum_col` = inclusive running SUM(value_col) in global
    `order_cols` order — SUM() OVER (ORDER BY ...) without the
    single-partition window, same two-phase shape as global_row_number:
    range-partitioned local running sums plus a broadcast prefix-sum of
    per-partition totals (the only centralized data is n_partitions
    rows). Same mode="auto" small-input fast path as
    global_row_number."""
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    if mode not in ("auto", "prefix", "window"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode == "auto":
        est = plan_size_bytes(df)
        mode = "window" if est is not None and est <= small_input_bytes else "prefix"
    if mode == "window":
        w = Window.orderBy(*order_cols).rowsBetween(
            Window.unboundedPreceding, 0
        )
        return df.withColumn(sum_col, F.sum(value_col).over(w))
    parts = df.repartitionByRange(n, *order_cols).sortWithinPartitions(*order_cols)
    with_pid = parts.withColumn(
        "__pid", F.spark_partition_id()
    ).localCheckpoint(eager=False, storageLevel=_SL.DISK_ONLY)

    totals = with_pid.groupBy("__pid").agg(F.sum(value_col).alias("__tot"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__pid",
        F.coalesce(F.sum("__tot").over(w_off), F.lit(0)).alias("__offset"),
    )

    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        with_pid.join(F.broadcast(offsets), "__pid")
        .withColumn(sum_col, F.sum(value_col).over(w_local) + F.col("__offset"))
        .drop("__pid", "__offset")
    )


def grouped_rank(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str | Column],
    rank_col: str = "rnk",
    n_partitions: int | None = None,
    mode: str = "auto",
    approx_groups: int | None = None,
    small_input_bytes: int = SMALL_INPUT_BYTES,
) -> DataFrame:
    """Append `rank_col` = 1-based ROW_NUMBER() OVER (PARTITION BY
    group_cols ORDER BY order_cols) — scalable for LOW-CARDINALITY
    groups. A plain window with partitionBy(low_card_key) gives exactly
    |groups| tasks: with 5 priority classes over 100 TB, 5 tasks sort
    everything (measured ~linear growth in the 100x probe). The
    prefix-sum path range-partitions the sort on (group, order) —
    parallelism is n_partitions regardless of group cardinality — rows
    are numbered locally per (partition, group), and each group's
    per-partition counts are prefix-summed into broadcast offsets: the
    only centralized data is the (n_partitions x |groups|)-row offset
    table. Requires order_cols to total-order rows within each group
    (include a unique tie-break).

    The machinery only pays off when a big input meets few groups, so
    `mode="auto"` (default) picks per call, costing no extra jobs:

    - plain window when the caller hints `approx_groups >=
      2 x n_partitions` (high-cardinality keys don't cap parallelism —
      the window is already the right plan at any scale), or when
      Catalyst estimates the input at <= `small_input_bytes` (|groups|
      tasks each sorting a few MB beat the extra checkpoint + join;
      this is the sf0.1-style small-data case);
    - range-partitioned prefix-sum otherwise (the 100-TB case — an
      unknown estimate counts as big).

    `mode="prefix"` / `mode="window"` force a shape (plan tests pin
    both)."""
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    if mode not in ("auto", "prefix", "window"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode == "auto":
        high_card = approx_groups is not None and approx_groups >= 2 * n
        est = plan_size_bytes(df)
        small = est is not None and est <= small_input_bytes
        mode = "window" if (high_card or small) else "prefix"
    if mode == "window":
        w = Window.partitionBy(*group_cols).orderBy(*order_cols)
        return df.withColumn(rank_col, F.row_number().over(w).cast("long"))
    keys = [*group_cols, *order_cols]
    parts = df.repartitionByRange(n, *keys).sortWithinPartitions(*keys)
    # Pin one physical partitioning (range boundaries come from
    # sampling) so the counts branch and the data branch agree.
    with_pid = parts.withColumn(
        "__pid", F.spark_partition_id()
    ).localCheckpoint(eager=False, storageLevel=_SL.DISK_ONLY)

    counts = with_pid.groupBy("__pid", *group_cols).agg(F.count("*").alias("__cnt"))
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "__pid",
        *group_cols,
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__offset"),
    )

    w_local = Window.partitionBy("__pid", *group_cols).orderBy(*order_cols)
    return (
        with_pid.join(F.broadcast(offsets), ["__pid", *group_cols])
        .withColumn(
            rank_col,
            (F.row_number().over(w_local) + F.col("__offset")).cast("long"),
        )
        .drop("__pid", "__offset")
    )
