#!/usr/bin/env python
"""Dump .explain('formatted') for every registered query (or the named
ones) to plans/<tag>/<name>_<suffix>.txt — the optimization-round
evidence files the judge diffs plan claims against.

Usage: python tools/dump_plans.py <tag> <suffix> [name ...]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from async_event_streams_spark.queries import QUERIES
    from async_event_streams_spark.session import get_spark

    spark = get_spark(app_name=f"dump-plans-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names or sorted(QUERIES):
        df = QUERIES[name](spark, sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(name)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
