"""global_row_number must equal the single-partition window numbering
for any total order, at any partitioning."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from async_event_streams_spark.functions.order import global_row_number


@pytest.mark.parametrize("n_parts", [1, 3, 16])
def test_matches_window_row_number(spark, n_parts):
    df = (
        spark.range(0, 5000)
        .select(
            (F.col("id") * 37 % 4999).alias("k"),  # scrambled unique keys
            F.col("id").alias("payload"),
        )
        .repartition(8)
    )
    expected = {
        r.k: r.pos
        for r in df.select(
            "k", F.row_number().over(Window.orderBy("k")).alias("pos")
        ).collect()
    }
    got = {
        r.k: r.pos
        for r in global_row_number(df, ["k"], n_partitions=n_parts).collect()
    }
    assert got == expected


def test_data_path_never_single_partitions(spark):
    """The point of the prefix shape: the data path is hash/range
    partitioned; the only SinglePartition exchange is the
    (n_partitions)-row offsets aggregate, never the data."""
    df = spark.range(0, 1000).select(F.col("id").alias("k"))
    plan = (
        global_row_number(df, ["k"], n_partitions=4, mode="prefix")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # data window runs per __pid bucket (hash partitioning), and at most
    # one SinglePartition exchange exists (the tiny offsets branch)
    assert "hashpartitioning(__pid" in plan
    assert plan.count("SinglePartition") <= 1


def test_global_helpers_auto_pick_by_size(spark):
    """auto: a tiny input compiles to the plain single-partition window
    (no __pid machinery); forcing the estimate to count as big engages
    the prefix shape. Values must agree between the two shapes."""
    from async_event_streams_spark.functions.order import global_running_sum

    df = spark.range(0, 200).selectExpr("id AS k", "id % 7 AS v")
    small = (
        global_row_number(df, ["k"], n_partitions=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "__pid" not in small
    big = (
        global_row_number(df, ["k"], n_partitions=4, small_input_bytes=0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "hashpartitioning(__pid" in big
    for mode in ("window", "prefix"):
        got = {
            r.k: r.rs
            for r in global_running_sum(
                df, ["k"], "v", "rs", n_partitions=4, mode=mode
            ).collect()
        }
        expect, acc = {}, 0
        for k in range(200):
            acc += k % 7
            expect[k] = acc
        assert got == expect, mode


def test_multi_column_order_with_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, "b"), (1, "a"), (0, "z"), (2, "a")], "g long, s string"
    )
    got = [
        (r.g, r.s, r.pos)
        for r in global_row_number(df, ["g", "s"]).orderBy("pos").collect()
    ]
    assert got == [(0, "z", 1), (1, "a", 2), (1, "b", 3), (2, "a", 4)]


@pytest.mark.parametrize("mode", ["prefix", "window", "auto"])
def test_grouped_rank_matches_plain_window(spark, mode):
    """grouped_rank == ROW_NUMBER() OVER (PARTITION BY g ORDER BY v, id)
    on a skewed low-cardinality group column, in every mode — the two
    physical shapes (and whatever auto picks) must agree exactly."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from async_event_streams_spark.functions.order import grouped_rank

    rnd = random.Random(7)
    rows = [(i % 3, rnd.randrange(1000), i) for i in range(500)]
    df = spark.createDataFrame(rows, "g long, v long, id long")
    got = {
        (r.g, r.id): r.rnk
        for r in grouped_rank(
            df, ["g"], ["v", "id"], n_partitions=8, mode=mode
        ).collect()
    }
    w = Window.partitionBy("g").orderBy("v", "id")
    want = {
        (r.g, r.id): r.rnk
        for r in df.select("g", "id", F.row_number().over(w).alias("rnk")).collect()
    }
    assert got == want


def test_grouped_rank_plan_has_no_single_partition_data_path(spark):
    """Prefix shape: the data path must stay range/hash partitioned; the
    only SinglePartition exchange allowed is the tiny per-(pid, group)
    offsets branch."""
    from async_event_streams_spark.functions.order import grouped_rank

    df = spark.range(0, 1000).selectExpr("id % 3 AS g", "id AS v")
    plan = (
        grouped_rank(df, ["g"], ["v"], n_partitions=4, mode="prefix")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the range partition lives inside the pinned checkpoint's RDD
    # lineage; the visible plan must window per (pid, group) with no
    # SinglePartition exchange anywhere
    assert "hashpartitioning(__pid" in plan
    assert "SinglePartition" not in plan


def test_grouped_rank_auto_picks_by_size_and_cardinality(spark):
    """auto mode, both decision axes: a small input (Catalyst estimate
    under the threshold) compiles to the plain window — no __pid
    machinery; a big-or-unknown input with low-cardinality groups
    compiles to the prefix shape; a high-cardinality hint stays on the
    plain window regardless of size (parallelism isn't capped)."""
    from async_event_streams_spark.functions.order import grouped_rank

    df = spark.range(0, 1000).selectExpr("id % 3 AS g", "id AS v")

    def plan(**kw):
        return (
            grouped_rank(df, ["g"], ["v"], n_partitions=4, **kw)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    small = plan()  # range(1000): tiny estimate -> window
    assert "__pid" not in small and "windowpartitionspecdefinition" not in small.lower()
    big = plan(small_input_bytes=0)  # every estimate counts as big -> prefix
    assert "hashpartitioning(__pid" in big
    high_card = plan(small_input_bytes=0, approx_groups=10_000)
    assert "__pid" not in high_card


def test_plan_size_bytes_sees_through_materialized_checkpoints(
    spark, sf_dir
):
    """A pinned localCheckpoint surfaces as a LogicalRDD leaf, where
    Catalyst substitutes a huge default size — which steered every
    ranked/summed consumer of a pinned artifact onto the prefix
    machinery regardless of true size (r13: 0.67 vs 0.35 s on a
    5 000-row frame). plan_size_bytes must (a) keep the fail-safe huge
    default while the checkpoint is UNmaterialized, and (b) report the
    block manager's measured bytes once the blocks exist, so auto mode
    can take the plain-window path for genuinely small pinned frames."""
    from async_event_streams_spark.functions.order import (
        SMALL_INPUT_BYTES,
        plan_size_bytes,
    )
    from async_event_streams_spark.queries.llm import tokens
    from async_event_streams_spark.tables import table
    from async_event_streams_spark.util import materialize
    from pyspark.sql import functions as F

    # the REAL build shape whose inflated origin stats motivated the
    # fix (the _unigram_doc_bits kernel: tokenize/explode over the
    # corpus, estimated at ~425 GB at sf0.1 while the true pinned size
    # is tens of KB — steering every ranked consumer onto the prefix
    # machinery, 0.67 vs 0.35 s measured). Built FRESH via materialize
    # rather than the artifact() memo so a previously-run test cannot
    # have warmed the checkpoint (the memo is session-keyed).
    from async_event_streams_spark.functions.order import global_row_number

    docs = table(spark, sf_dir, "documents")
    df = materialize(
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_tokens"))
    )
    # UNmaterialized: must not throw, and must return Catalyst's own
    # estimate unchanged (no storage entry exists yet to measure)
    lazy_est = plan_size_bytes(df)
    assert lazy_est is not None and lazy_est > 0
    n = df.count()  # materialize the checkpoint blocks
    assert n > 0
    # materialized: the estimate is capped by the block manager's
    # MEASURED bytes for the checkpoint RDD (min(est, leaf-sum))
    rid = df._jdf.queryExecution().optimizedPlan().collectLeaves().apply(0).rdd().id()
    true_size = next(
        int(i.diskSize() + i.memSize())
        for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
        if i.id() == rid
    )
    warm_est = plan_size_bytes(df)
    assert warm_est is not None and 0 < warm_est <= max(true_size, lazy_est)
    assert warm_est <= true_size or warm_est <= lazy_est
    # and the behavioral consequence: auto mode over the small warmed
    # frame takes the plain window (no __pid machinery), while a
    # forced-big threshold still takes the scalable prefix shape
    small = (
        global_row_number(df, ["doc_id"], "rn")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "__pid" not in small
    big = (
        global_row_number(df, ["doc_id"], "rn", small_input_bytes=0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "hashpartitioning(__pid" in big
