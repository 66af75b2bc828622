#!/usr/bin/env python
"""Warehouse + event-analytics tour: the round-5 maintenance surface
end to end — CDC merge, SCD2 history (batch AND streaming), funnel
conversion (batch AND streaming), retention cohorts, date-spine
report.

Run: python examples/warehouse_maintenance.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from async_event_streams_spark.queries import QUERIES
from async_event_streams_spark.session import get_spark
from async_event_streams_spark.streaming import (
    funnel_stage_stream,
    run_stream_to_memory,
    scd2_intervals_stream,
)
from async_event_streams_spark.tables import table
from async_event_streams_spark.topics import Topic, TopicRegistry


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="warehouse-tour")
    spark.sparkContext.setLogLevel("ERROR")

    for name in (
        "c_merge_upsert",
        "c_scd2_intervals",
        "c_scd2_bucketed",  # the skew-resistant twin (same answer)
        "c_mv_incremental",  # incremental MV == full recompute
        "c_zorder_layout",  # OPTIMIZE ZORDER file assignment
        "c_funnel_steps",
        "c_retention_cohorts",
        "c_date_spine",
        # r8 maintenance surface
        "c_table_profile_sketch",  # ANALYZE via HLL registers
        "c_compaction_plan",  # OPTIMIZE scheduling from metadata
        "c_bitmap_filter",  # predicate grid from the bitmap index alone
        "c_zonemap_scan",  # prune-then-scan, skip contract checked
        "c_skew_report",  # whale-key watch for the adaptive lanes
        "c_join_estimate",  # CBO join size from statistics only
        "c_dq_audit",  # the dbt-test suite as one scale-shaped op
    ):
        rows = QUERIES[name](spark, sf_dir).limit(3).collect()
        print(f"{name:>20}: {'; '.join(str(tuple(r)) for r in rows[:2])[:90]}")

    # Streaming twins: feed a slice of the event log through a topic
    # and watch the SCD2 history and funnel stages accrue live.
    src = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 300)
        .select("user_id", "event_type", "ts", "event_id")
        .orderBy("ts", "event_id")
    )
    rows = [
        {"user_id": r.user_id, "etype": r.event_type, "ets": r.ts, "eid": r.event_id}
        for r in src.collect()
    ]
    root = tempfile.mkdtemp()
    reg = TopicRegistry()
    schema = "user_id long, etype string, ets timestamp, eid long"

    def feed(name, pipe_fn):
        t = Topic(spark, name, schema, root, reg)
        stream = t.subscribe().select(
            "user_id",
            F.col("etype").alias("event_type"),
            F.col("ets").alias("ts"),
            F.col("eid").alias("event_id"),
        )
        q, tbl = run_stream_to_memory(pipe_fn(stream), output_mode="append")
        t.attach_query(q)
        t.post(rows[:150])
        t.send(rows[150:])
        n = spark.sql(f"SELECT COUNT(*) AS n FROM {tbl}").collect()[0].n
        t.close()
        return n

    print("streaming scd2 closed intervals:", feed("tour_scd2", scd2_intervals_stream))
    print("streaming funnel stage advances:", feed("tour_funnel", funnel_stage_stream))

    # Streaming MV: the monthly revenue view as a delta log of
    # per-batch partials; the snapshot re-merges slim partials only.
    from async_event_streams_spark.streaming import mv_rollup_pipe, mv_snapshot

    orders = (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_orderdate", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(200)
        .collect()
    )
    t = Topic(
        spark,
        "tour_mv",
        "o_orderkey long, o_orderpriority string, "
        "o_orderdate timestamp, o_totalprice double",
        root,
        reg,
    )
    h = mv_rollup_pipe(t, f"{root}/mv-state", name="tour-mv", compact_every=2)
    for lo in (0, 100):
        t.send(
            [
                {
                    "o_orderkey": r.o_orderkey,
                    "o_orderpriority": r.o_orderpriority,
                    "o_orderdate": r.o_orderdate,
                    "o_totalprice": r.o_totalprice,
                }
                for r in orders[lo : lo + 100]
            ],
            barrier="chain",
        )
    mv = mv_snapshot(spark, f"{root}/mv-state")
    print("streaming MV groups:", mv.count(), "orders folded:",
          mv.agg(F.sum("n_orders")).first()[0])
    h.stop()
    t.close()


if __name__ == "__main__":
    main()
