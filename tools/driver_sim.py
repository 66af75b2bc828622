#!/usr/bin/env python
"""Exact driver simulation: run registered queries the way the
external checker does — a VANILLA SparkSession (none of session.py's
confs), a foreign cwd, DuckDB value-hash comparison at any sf.

This is the de-risk harness behind the round-8/9 "N/N green under
driver simulation" records: if a query passes here, the driver's
correctness row cannot differ for session-config or cwd reasons.

Usage:
  python tools/driver_sim.py [--sf DIR] [name ...]   # default: all
Prints one line per query (rows/schema/hash) and a FAILURES total;
exit code 1 on any failure.
"""

from __future__ import annotations

import hashlib
import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if args and args[0] == "--sf":
        sf = args[1]
        args = args[2:]
    os.chdir("/tmp")  # foreign cwd on purpose (pickle-by-value check)

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
        )
    qs, oracles = mod.queries(), mod.oracle_sql()
    names = args or list(qs)

    def vhash(df):
        df = df[sorted(df.columns)]
        df = df.sort_values(list(df.columns)).reset_index(drop=True)
        return hashlib.md5(df.round(6).to_csv(index=False).encode()).hexdigest()

    fails = 0
    for name in names:
        try:
            s = qs[name](spark, sf).toPandas()
            o = con.execute(oracles[name]).df()
            ok = (
                len(s) == len(o)
                and sorted(s.columns) == sorted(o.columns)
                and vhash(s) == vhash(o)
            )
            print(f"{name}: rows={len(s)}/{len(o)} hash={'OK' if ok else 'MISMATCH'}")
            fails += 0 if ok else 1
        except Exception as ex:  # noqa: BLE001 - report and continue
            fails += 1
            print(f"{name}: ERROR {type(ex).__name__}: {str(ex)[:300]}")
    print("FAILURES:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
