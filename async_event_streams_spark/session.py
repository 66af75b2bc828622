"""SparkSession factory with scale-oriented defaults.

Tested on local[N]; the config is written for a real multi-executor
cluster at ~100 TB: AQE handles skew + partition coalescing at runtime,
Arrow keeps the Python boundary vectorized, and broadcast threshold
covers the dimension tables (region/nation/customer/supplier/part are
all tiny relative to fact tables, so star joins broadcast).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "async-event-streams-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Defaults chosen for scale-out behavior, not just local runs:
    - AQE on (runtime partition coalescing, skew-join splitting, plan
      re-optimization from observed shuffle stats);
    - Arrow on for every Python<->JVM exchange (pandas UDFs, toPandas);
    - broadcast threshold 64 MB: every TPC-H-style dimension broadcasts,
      so star-schema joins are shuffle-free on the fact side.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Runtime bloom-filter join pruning: on a fact⋈filtered-dim
        # shuffle join, the dim side's keys seed a bloom filter applied
        # at the fact scan — at 100 TB this skips most row groups before
        # the shuffle. No-op at test SF (application-side threshold);
        # tests/test_plans.py proves injection with thresholds lowered.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # AQE sort-merge -> shuffled-hash rewrite (guide §3.1): when
        # every post-shuffle partition of the build side is observed
        # below this threshold at runtime, the sort on both sides is
        # dropped and each partition builds a hash table instead. The
        # guard is AQE's own measured partition sizes, so at 100 TB
        # (partitions >> 128 MB) the plan stays SortMergeJoin and
        # nothing can OOM; on small/medium shuffles it removes two
        # Sorts per join. Measured on the 15 SMJ queries at sf0.1:
        # suite slice 9.21 -> 8.91 s (x_corpus_diff 0.78x,
        # x_dedup_windowed 0.85x, x_knn_triangles 0.88x).
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_LOCAL_MAP", "134217728"),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or int(cpus) * 1),
        )
        .config("spark.sql.session.timeZone", "UTC")
        # The driver's events.parquet uses TIMESTAMP(NANOS), which the
        # vectorized reader rejects; read as long and convert in tables.py.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # 32g default: local mode conflates driver + executor memory in
        # ONE JVM, so pinned localCheckpoint blocks (the materialize/
        # artifact discipline) and broadcast builds share a heap. The
        # 8g default OOM'd a broadcast at sf10 (500k docs) on the
        # second pass while the first pass's ~3-4 GB of checkpoint
        # blocks awaited the ContextCleaner (r13 sf10 probe); the box
        # has 128 GiB. On a real cluster these budgets are separate
        # per-executor settings and none of this conflation exists.
        .config(
            "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "32g")
        )
        # The ContextCleaner only reclaims dropped checkpoint/broadcast/
        # shuffle blocks after a driver GC collects their weak refs; in
        # a 32g heap full GCs are rare, so a long session (the 240-query
        # bench, the sf10 probe) accumulates gigabytes of dead blocks —
        # the pressure behind the r13 broadcast OOM and a measured 5x
        # late-session slowdown on x_pipeline_report. Spark's standard
        # mitigation: periodic driver GC (default 30min) tightened to
        # 5min so multi-query sessions reclaim between queries.
        .config("spark.cleaner.periodicGC.interval", "5min")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
