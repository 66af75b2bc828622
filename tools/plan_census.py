#!/usr/bin/env python
"""Physical-plan census over the ENTIRE query registry: for every
registered query, count the scale-relevant operators in its formatted
plan (scans, exchanges, joins by strategy, windows, expands,
Python-eval nodes, cartesians) and write one JSON line per round to
PLAN_CENSUS.json. tests/test_plans.py pins ~40 critical properties by
hand; the census covers the other ~135 queries so a silent plan
regression (a broadcast that became a sort-merge join, a new Python
eval in a hot path, a cartesian anywhere) diffs loudly round-over-
round instead of waiting for a cluster bill.

Usage: python tools/plan_census.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OPS = (
    "Scan parquet",
    "Exchange",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "Window",
    "WindowGroupLimit",
    "Expand",
    "Sort",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
)


def census_of(plan: str) -> dict[str, int]:
    counts = {}
    for op in OPS:
        n = len(re.findall(rf"^\(\d+\) {re.escape(op)}", plan, flags=re.M))
        if n:
            counts[op] = n
    return counts


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from async_event_streams_spark.queries import QUERIES
    from async_event_streams_spark.session import get_spark

    spark = get_spark(app_name="plan-census")
    spark.sparkContext.setLogLevel("ERROR")
    out, errors = {}, {}
    for name in sorted(QUERIES):
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            out[name] = census_of(plan)
        except Exception as e:  # noqa: BLE001 - census must cover the rest
            errors[name] = repr(e)[:200]
    summary = {
        "n_queries": len(out),
        "cartesians": sorted(
            n for n, c in out.items() if c.get("CartesianProduct")
        ),
        "python_eval": sorted(
            n
            for n, c in out.items()
            if c.get("BatchEvalPython") or c.get("ArrowEvalPython")
        ),
        "sort_merge_joins": sorted(
            n for n, c in out.items() if c.get("SortMergeJoin")
        ),
        "errors": errors,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PLAN_CENSUS.json",
    )
    with open(path, "w") as f:
        json.dump({"sf_dir": sf_dir, "summary": summary, "queries": out}, f,
                  indent=0, sort_keys=True)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
