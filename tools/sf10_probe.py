#!/usr/bin/env python
"""Fresh-draw sf10 probe: the heaviest registry queries at a TRUE
100× data step (vs sf0.1), hash-checked against DuckDB and timed.

The sf1 step earned its keep by catching a boundary bug replicated
probes missed (r11 sessionize truncation); this is the next decade:
60M lineitem / 500k documents / 200k embeddings stress DECIMAL/
HUGEINT widenings, corpus-adaptive plane counts, and artifact sizes
at true cardinalities.

Usage: python tools/sf10_probe.py [--sf DIR] [name ...]
Prints one JSON line per query and a summary line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

DEFAULT_NAMES = [
    # sf1 heavy tail (BENCH_SF1_r12 + the r13 rewrites); the three
    # brutal-oracle lanes run LAST so cheap results accumulate first
    "x_kneser_ney",
    "x_bigram_logprob", "x_ann_pq", "x_extract_text", "x_cosine_topk",
    "x_repetition", "x_ann_recall", "x_fingerprint", "x_ngram_novelty",
    "c_join_asof_bucketed", "c_sliding_reach", "c_table_profile",
    "x_dedup_keepbest", "x_char_entropy", "x_chunk_documents",
    # scale-sensitive adaptive lanes (fixed-capacity bugs live here)
    "x_dedup_semantic", "x_dedup_embedding", "x_knn_graph",
    # this round's rewrites at one more decade
    "x_prep_pipeline", "x_decontaminate", "x_source_overlap",
    "x_distinct_ngrams", "x_rerank_exact",
    "x_pipeline_report", "x_span_scrub", "x_dup_spans",
]


def oracle_child(sf: str, name: str) -> int:
    """Child-process mode: run ONE DuckDB oracle and print its row
    count + value hash. Isolated in a process because DuckDB holds the
    GIL through result materialization - an in-process timer thread
    cannot interrupt it, and a runaway oracle at 500k docs was
    measured at >30 GB RSS; the parent enforces a hard timeout+kill."""
    from oracle_compare import duckdb_conn, value_hash

    from async_event_streams_spark.queries import ORACLES

    con = duckdb_conn(sf)
    pdf = con.execute(ORACLES[name]).fetchdf()
    print(json.dumps({"rows": len(pdf), "hash": value_hash(pdf)}))
    return 0


def main() -> int:
    args = sys.argv[1:]
    if args[:1] == ["--oracle-one"]:
        return oracle_child(args[1], args[2])
    sf = os.path.join(REPO, ".testdata", "sf10")
    if args and args[0] == "--sf":
        sf = args[1]
        args = args[2:]
    names = args or DEFAULT_NAMES

    from oracle_compare import value_hash

    from async_event_streams_spark.queries import ORACLES, QUERIES
    from async_event_streams_spark.session import get_spark

    spark = get_spark(app_name="sf10-probe")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["b4_classify_fizzbuzz"](spark, sf).write.mode(
        "overwrite"
    ).format("noop").save()
    fails = 0
    total_sec = 0.0
    for name in names:
        row = {"name": name}
        try:
            ts = []
            for _ in range(2):
                t0 = time.perf_counter()
                QUERIES[name](spark, sf).write.mode("overwrite").format(
                    "noop"
                ).save()
                ts.append(round(time.perf_counter() - t0, 2))
            row["spark_sec"] = min(ts)
            total_sec += min(ts)
            if name in ORACLES:
                spark_pdf = QUERIES[name](spark, sf).toPandas()
                t0 = time.perf_counter()
                # per-oracle time budget: single-node DuckDB pays the
                # full corpus cost with no cluster to spread it over
                # (the LSH self-join SQL measured >20 CPU-min at 500k
                # docs) — a budget-exceeded oracle is recorded as
                # SCALE-SKIPPED (correctness for those lanes stands on
                # the sf0.001/0.01/0.1/sf1 hash-greens), never a red.
                budget = float(os.environ.get("SF10_ORACLE_BUDGET", "300"))
                try:
                    out = subprocess.run(
                        [sys.executable, os.path.abspath(__file__),
                         "--oracle-one", sf, name],
                        capture_output=True, text=True, timeout=budget,
                        cwd=REPO,
                    )
                    res = json.loads(out.stdout.strip().splitlines()[-1])
                except subprocess.TimeoutExpired:
                    row["oracle_sec"] = round(time.perf_counter() - t0, 2)
                    row["hash_match"] = "oracle_budget_exceeded"
                except Exception as e:  # noqa: BLE001 - child crash
                    row["oracle_sec"] = round(time.perf_counter() - t0, 2)
                    row["hash_match"] = "oracle_error"
                    row["oracle_note"] = f"{type(e).__name__}: {e}"[:200]
                    fails += 1
                else:
                    row["oracle_sec"] = round(time.perf_counter() - t0, 2)
                    row["rows"] = f"{len(spark_pdf)}/{res['rows']}"
                    row["hash_match"] = value_hash(spark_pdf) == res["hash"]
                    if not row["hash_match"]:
                        fails += 1
            else:
                row["hash_match"] = None
        except Exception as e:  # noqa: BLE001 — probe must finish the list
            row["err"] = f"{type(e).__name__}: {e}"[:300]
            fails += 1
        print(json.dumps(row), flush=True)
    print(
        json.dumps(
            {
                "summary": True,
                "sf_dir": sf,
                "n": len(names),
                "failures": fails,
                "spark_total_sec": round(total_sec, 1),
            }
        )
    )
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
