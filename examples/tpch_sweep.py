#!/usr/bin/env python
"""Run the full TPC-H query sweep (all 22 classic numbers as adapted
shapes — see queries/tpch.py and queries/relational.py docstrings for
the schema adaptations) against a scale-factor directory and print
each result's first rows.

Run: python examples/tpch_sweep.py [sf_dir]   (default sf0.001)

This is the "switching user" smoke: every classic TPC-H workload a
user of a relational engine runs today has a one-call counterpart
here, each of which is also hash-checked against DuckDB by the test
suite (tests/test_oracle.py)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from async_event_streams_spark.queries import QUERIES
from async_event_streams_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="tpch-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    names = sorted(
        (n for n in QUERIES if n.startswith("c_tpch_q")),
        key=lambda n: int(n.removeprefix("c_tpch_q")),
    )
    t_all = time.perf_counter()
    for name in names:
        t0 = time.perf_counter()
        rows = QUERIES[name](spark, sf_dir).limit(2).collect()
        dt = time.perf_counter() - t0
        head = "; ".join(str(tuple(r)) for r in rows) or "(empty)"
        print(f"{name:>12} {dt:6.2f}s  {head[:100]}")
    print(f"total {time.perf_counter() - t_all:.1f}s over {len(names)} queries")


if __name__ == "__main__":
    main()
