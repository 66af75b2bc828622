#!/usr/bin/env python
"""Generate a synthetic dataset at an arbitrary scale factor, matching
the driver testdata's schema and distributions (TESTDATA.md; verified
against /root/testdata/sf{0.001,0.01,0.1} by tools-side probes:
row-count scaling, key ranges, per-column physical types, value
distributions, dup-document rate, embedding cluster geometry).

The driver's own sf dirs are read-only and stop at sf0.1; the r10
verdict (#3) asks for a TRUE 10x data step — fresh draws at sf1, not
replication — so growth ratios and DECIMAL-overflow guards are
validated on real cardinalities. Deterministic at a given (sf, seed):
seed=42 to match the driver recipe.

Scaling rules (rows at scale factor sf):
  customer 150k*sf   supplier 10k*sf   part 200k*sf
  orders   1.5M*sf   lineitem 6M*sf    events 1M*sf (15k*sf users)
  documents max(500, 50k*sf)           embeddings max(500, 20k*sf)
  region 5, nation 25 (fixed)

Usage: python tools/gen_sf.py SF OUT_DIR  [--seed 42]
e.g.   python tools/gen_sf.py 1 /root/repo/.testdata/sf1
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
ADJS = ["large", "hot", "blue", "old", "cold", "small", "new", "red"]
NOUNS = ["ring", "bolt", "plate", "screw", "cap", "case", "tube", "box"]
LANGS = (["en", "de", "es", "fr", "zh"], [0.40, 0.15, 0.15, 0.15, 0.15])
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
EPOCH_1995 = np.datetime64("1995-01-01", "us")
EPOCH_2024 = np.datetime64("2024-01-01", "us")
ORDER_DAYS = 2405  # 1995-01-01 .. 2001-08-01 inclusive
EVENT_SPAN_US = 30 * 86400 * 1_000_000  # 30 days of Jan 2024
EMB_DIM, EMB_CLUSTERS, EMB_PULL = 64, 10, 0.56
DUP_DOC_RATE = 0.0016  # exact-dup pairs (the dedup queries' prey)


def _write(out_dir: str, name: str, cols: dict) -> int:
    t = pa.table(cols)
    pq.write_table(t, f"{out_dir}/{name}.parquet")
    return t.num_rows


def _money(rng: np.random.Generator, n: int, lo: float, hi: float):
    return np.round(rng.uniform(lo, hi, n), 2)


def generate(sf: float, out_dir: str, seed: int = 42) -> dict[str, int]:
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_doc = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))
    rows: dict[str, int] = {}

    rows["region"] = _write(out_dir, "region", {
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    })
    rows["nation"] = _write(out_dir, "nation", {
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    })
    rows["customer"] = _write(out_dir, "customer", {
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust, dtype=np.int32),
        "c_acctbal": _money(rng, n_cust, -1000, 10000),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
    })
    rows["supplier"] = _write(out_dir, "supplier", {
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp, dtype=np.int32),
        "s_acctbal": _money(rng, n_supp, -1000, 10000),
    })
    rows["part"] = _write(out_dir, "part", {
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": [
            f"{ADJS[a]} {NOUNS[b]}"
            for a, b in zip(
                rng.integers(0, len(ADJS), n_part),
                rng.integers(0, len(NOUNS), n_part),
            )
        ],
        "p_brand": np.array([f"Brand#{i}" for i in range(1, 26)])[
            rng.integers(0, 25, n_part)
        ],
        "p_type": np.array(PTYPES)[rng.integers(0, 6, n_part)],
        "p_size": rng.integers(1, 51, n_part, dtype=np.int32),
        # the driver's lattice: 900.0, 900.1, ... 999.9 by key
        "p_retailprice": 900.0 + (np.arange(n_part) % 1000) / 10.0,
    })
    rows["orders"] = _write(out_dir, "orders", {
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord, dtype=np.int64),
        "o_orderstatus": np.array(["F", "O", "P"])[rng.integers(0, 3, n_ord)],
        "o_totalprice": _money(rng, n_ord, 1000, 500_000),
        "o_orderdate": EPOCH_1995
        + rng.integers(0, ORDER_DAYS, n_ord) * np.timedelta64(86400_000_000, "us"),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)],
    })
    ship_days = rng.integers(0, ORDER_DAYS, n_li) + rng.integers(1, 96, n_li)
    rows["lineitem"] = _write(out_dir, "lineitem", {
        "l_orderkey": rng.integers(0, n_ord, n_li, dtype=np.int64),
        "l_partkey": rng.integers(0, n_part, n_li, dtype=np.int64),
        "l_suppkey": rng.integers(0, n_supp, n_li, dtype=np.int64),
        "l_linenumber": rng.integers(1, 8, n_li, dtype=np.int32),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": _money(rng, n_li, 900, 105_000),
        "l_discount": rng.integers(0, 11, n_li) / 100.0,
        "l_tax": rng.integers(0, 9, n_li) / 100.0,
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
        "l_shipdate": EPOCH_1995
        + ship_days * np.timedelta64(86400_000_000, "us"),
    })
    # events: ts uniform over the span, event_id = ts rank (the FIFO
    # contract: event_id order == time order, verified on the driver set)
    ts = np.sort(rng.integers(0, EVENT_SPAN_US, n_ev))
    rows["events"] = _write(out_dir, "events", {
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": EPOCH_2024 + ts * np.timedelta64(1, "us"),
        "user_id": rng.integers(0, n_users, n_ev, dtype=np.int64),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
    })
    # documents: bag-of-words text over the 31-word vocab, ~0.16%
    # exact-dup pairs injected (what the dedup family hunts)
    lens = rng.integers(10, 101, n_doc)
    vocab = np.array(VOCAB)
    texts = [
        " ".join(vocab[rng.integers(0, len(vocab), ln)]) for ln in lens
    ]
    for j in rng.integers(1, n_doc, max(1, int(DUP_DOC_RATE * n_doc))):
        texts[j] = texts[rng.integers(0, j)]
    rows["documents"] = _write(out_dir, "documents", {
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": np.array(LANGS[0])[
            rng.choice(len(LANGS[0]), n_doc, p=LANGS[1])
        ],
        "source": [f"src{i % 20}" for i in range(n_doc)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    })
    # embeddings: 10 weak gaussian clusters on the unit sphere
    # (mean cos-to-own-centroid ~= 0.07 on the driver set)
    cents = rng.standard_normal((EMB_CLUSTERS, EMB_DIM))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    label = rng.integers(0, EMB_CLUSTERS, n_emb, dtype=np.int32)
    v = rng.standard_normal((n_emb, EMB_DIM)) + EMB_PULL * cents[label]
    v = (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)
    rows["embeddings"] = _write(out_dir, "embeddings", {
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.array(list(v), pa.list_(pa.float32())),
        "label": label,
    })
    return rows


if __name__ == "__main__":
    sf = float(sys.argv[1])
    out = sys.argv[2]
    seed = int(sys.argv[sys.argv.index("--seed") + 1]) if "--seed" in sys.argv else 42
    print(json.dumps({"sf": sf, "out": out, "rows": generate(sf, out, seed)}))
