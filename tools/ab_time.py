#!/usr/bin/env python
"""Isolated interleaved A/B timing for registered queries.

Usage: python tools/ab_time.py name [name ...]
Times each named query with the noop sink, N_PASSES interleaved passes
(env SPARK_GRAFT_AB_PASSES, default 3), one engine session, warm-up
pass excluded from stats. Artifact memo is drained/attributed per run
so warm/cold is visible. Prints min/median per query.
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from async_event_streams_spark.queries import QUERIES  # noqa: E402
from async_event_streams_spark.session import get_spark  # noqa: E402
from async_event_streams_spark.util import drain_artifact_events  # noqa: E402


def main() -> int:
    names = sys.argv[1:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_passes = int(os.environ.get("SPARK_GRAFT_AB_PASSES", "3"))
    spark = get_spark(app_name="ab-time")
    spark.sparkContext.setLogLevel("ERROR")
    # Warm the session (codegen, python workers) + build artifacts once.
    for name in names:
        QUERIES[name](spark, sf).write.mode("overwrite").format("noop").save()
        ev = drain_artifact_events()
        if ev:
            print(f"# warmup {name}: {ev}")
    runs: dict[str, list[float]] = {n: [] for n in names}
    for _p in range(n_passes):
        for name in names:
            spark.sparkContext.setJobDescription(f"ab:{name}:pass{_p}")
            t0 = time.perf_counter()
            QUERIES[name](spark, sf).write.mode("overwrite").format(
                "noop"
            ).save()
            runs[name].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
    for name in names:
        r = runs[name]
        print(
            f"{name}: min={min(r):.3f} med={statistics.median(r):.3f} "
            f"all={[round(x, 3) for x in r]}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
