#!/usr/bin/env python
"""Adversarial-skew probe (r5 VERDICT item 6): the user-keyed analytics
are scale-probed on UNIFORM keys only — this lane re-keys the 100×
events corpus zipf-style so ONE hot user owns ~30% of all events, then
times the user-keyed queries on the skewed corpus vs the uniform corpus
at IDENTICAL volume. A healthy plan degrades mildly (one partition
holds the hot user's rows; partial aggregation absorbs groupBys, and a
window's hot partition is one big in-task sort); a sick plan goes
super-linear or OOMs.

Hot-key rule (deterministic): pmod(event_id, 10) < 3 → user_id 0.

Usage: python tools/skew_probe.py [K]   (default 100)
Prints one JSON line: per-query uniform_sec / skew_sec / skew_ratio.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from async_event_streams_spark.session import get_spark
from tools.scale_probe import BASE, OFFSETS, replicate, time_query

SKEW_QUERIES = [
    "c_funnel_steps",
    "c_retention_cohorts",
    "c_sessionize_gaps",
    "c_sessionize_bucketed",  # the bucket-and-stitch answer to the hot key
    "c_sessionize_adaptive",  # r7.2: hot/cold split (production entry)
    "c_scd2_intervals",
    "c_scd2_bucketed",  # r7: bucket-and-stitch SCD2 (same mitigation)
    "c_scd2_adaptive",  # r7.2: hot/cold split (production entry)
    # r7 lane widening: the remaining user-keyed windows over events
    "c_window_running_sum",
    "c_window_lag",
    "c_window_lag_bucketed",  # r7.2: bucket-and-stitch LAG twin
    "c_window_lag_adaptive",  # r7.2: hot/cold split (production entry)
    "c_join_asof",  # union + user-keyed window: same bounded family
    "c_join_asof_bucketed",  # r7.2: bucket-and-stitch as-of twin
    "c_join_asof_adaptive",  # r7.2: hot/cold split (production entry)
    # r9: the bounded-frame folds (per-row work is frame-constant, so
    # the hot partition is one big sort, not super-linear state) and
    # the salted join (exists FOR the hot key: ratio should be ~1)
    "c_ewma",
    "c_ewma_bucketed",
    "c_ewma_adaptive",
    "c_window_rolling_median",
    "c_rolling_median_bucketed",
    "c_rolling_median_adaptive",
    "c_join_salted",
    "c_join_interval_banded",
    "c_anomaly_ewma",
    "c_anomaly_adaptive",
]


def build_skew_dir(spark, uniform_dir: str, skew_dir: str) -> None:
    os.makedirs(skew_dir, exist_ok=True)
    for name in OFFSETS:
        src = f"{uniform_dir}/{name}.parquet"
        dst = f"{skew_dir}/{name}.parquet"
        if name != "events":
            # Re-copy when the uniform source is newer: keying on bare
            # existence silently pairs regenerated skewed events with
            # stale side-table copies (r6 ADVICE item 4).
            if os.path.exists(dst) and os.path.getmtime(dst) < os.path.getmtime(
                src
            ):
                shutil.rmtree(dst)
            if not os.path.exists(dst):
                shutil.copytree(src, dst)
            continue
        df = spark.read.parquet(src)
        skewed = df.withColumn(
            "user_id",
            F.when(F.pmod("event_id", F.lit(10)) < 3, F.lit(0)).otherwise(
                F.col("user_id")
            ),
        )
        skewed.write.mode("overwrite").parquet(dst)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    uniform_dir = f"/tmp/scale_probe_sf{k}"
    skew_dir = f"/tmp/skew_probe_sf{k}"
    spark = get_spark(app_name="skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    replicate(spark, uniform_dir, k)
    build_skew_dir(spark, uniform_dir, skew_dir)
    hot = (
        spark.read.parquet(f"{skew_dir}/events.parquet")
        .agg(
            (
                F.sum(F.when(F.col("user_id") == 0, 1).otherwise(0))
                / F.count("*")
            ).alias("hot_frac")
        )
        .first()
        .hot_frac
    )

    only = os.environ.get("SKEW_PROBE_ONLY")
    names = [n for n in only.split(",") if n] if only else SKEW_QUERIES
    results = {}
    for name in names:
        uni = min(time_query(name, uniform_dir, spark) for _ in range(2))
        skew = min(time_query(name, skew_dir, spark) for _ in range(2))
        results[name] = {
            "uniform_sec": uni,
            "skew_sec": skew,
            "skew_ratio": round(skew / uni, 2) if uni > 0 else None,
        }
    print(
        json.dumps(
            {"k": k, "hot_user_frac": round(float(hot), 4), "results": results}
        )
    )


if __name__ == "__main__":
    main()
