"""Third-implementation triangulation for the r7.2 prep operators: the
DuckDB differential proves Spark==DuckDB; these tests add an
independent pure-Python reference (the BPE/graph-consumer discipline)
so a shared misreading of the spec can't hide behind engine agreement."""

from __future__ import annotations

import hashlib
import re

import pandas as pd

from async_event_streams_spark.queries import QUERIES
from async_event_streams_spark.queries.llm import (
    _MASK_MOD,
    _MASK_SPAN,
    _SPLIT_SEED,
    _SQ_LEVELS,
    _SQ_SCALE,
)


def _py_span_mask(doc_id: int, text: str):
    """Reference span-corruption: independent re-derivation of the
    (input, target) construction from the spec, not from the SQL."""
    words = re.split(r"\s+", text.strip())

    def start(p):
        return p >= 0 and (doc_id * 1000003 + p * 7919) % _MASK_MOD == 0

    def masked(p):
        return any(start(p - o) for o in range(_MASK_SPAN))

    inp, tgt, k, n_masked, n_spans = [], [], 0, 0, 0
    for p, w in enumerate(words):
        if not masked(p):
            inp.append(w)
            continue
        n_masked += 1
        if not masked(p - 1):  # new span
            n_spans += 1
            s = f"<extra_id_{k}>"
            k += 1
            inp.append(s)
            tgt.extend([s, w])
        else:
            tgt.append(w)
    return {
        "n_words": len(words),
        "n_masked": n_masked,
        "n_spans": n_spans,
        "input_text": " ".join(inp),
        "target_text": " ".join(tgt),
    }


def test_span_mask_matches_python_reference(spark, sf_dir):
    got = {
        r["doc_id"]: r.asDict()
        for r in QUERIES["x_span_mask"](spark, sf_dir).collect()
    }
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    checked = 0
    for _, row in docs.iterrows():
        if not str(row.text).strip():
            assert row.doc_id not in got
            continue
        exp = _py_span_mask(int(row.doc_id), str(row.text))
        g = got[int(row.doc_id)]
        for key, val in exp.items():
            assert g[key] == val, (row.doc_id, key, g[key], val)
        checked += 1
    assert checked == len(got)


def test_quantizer_roundtrip_error_is_bounded(spark, sf_dir):
    """Floor-based SQ8 guarantees per-dim |x - decode(encode(x))| <
    span/LEVELS + 1 micro-unit; the summed bound must hold for every
    vector, and codes must stay in [0, LEVELS]."""
    import math

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    spans = None
    for v in emb.embedding:
        xi = [math.floor(float(x) * _SQ_SCALE) for x in v]
        if spans is None:
            mn = list(xi)
            mx = list(xi)
        else:
            mn = [min(a, b) for a, b in zip(mn, xi)]
            mx = [max(a, b) for a, b in zip(mx, xi)]
        spans = True
    bound = sum((hi - lo) // _SQ_LEVELS + 1 for lo, hi in zip(mn, mx))
    rows = QUERIES["x_embedding_quantize"](spark, sf_dir).collect()
    assert len(rows) == len(emb)
    for r in rows:
        codes = [int(c) for c in r.codes_str.split(" ")]
        assert all(0 <= c <= _SQ_LEVELS for c in codes), r.vec_id
        assert 0 <= r.sum_abs_err_micro <= bound, (r.vec_id, bound)


def test_train_split_no_cluster_spans_splits(spark, sf_dir):
    """The leakage invariant, derived independently: assign every
    near-dup cluster member its cluster's split via the same seeded
    md5 and confirm members of one cluster always agree — then check
    the query's per-split totals against this reference rollup."""
    labels = {
        r.doc_id: r.canonical_id
        for r in QUERIES["x_dedup_clusters"](spark, sf_dir).collect()
    }
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")

    def split_of(cid: int) -> str:
        h = hashlib.md5(f"{_SPLIT_SEED}{cid}".encode()).hexdigest()[0]
        return "train" if h <= "b" else ("val" if h <= "d" else "test")

    agg = {}
    cluster_splits = {}
    for _, row in docs.iterrows():
        cid = labels.get(int(row.doc_id), int(row.doc_id))
        sp = split_of(cid)
        cluster_splits.setdefault(cid, set()).add(sp)
        key = (sp, row.source)
        a = agg.setdefault(key, [0, set(), 0])
        a[0] += 1
        a[1].add(cid)
        a[2] += int(row.n_chars)
    assert all(len(v) == 1 for v in cluster_splits.values())
    got = QUERIES["x_train_split"](spark, sf_dir).collect()
    assert len(got) == len(agg)
    for r in got:
        n_docs, cids, n_chars = agg[(r.split, r.source)]
        assert (r.n_docs, r.n_clusters, r.n_chars) == (
            n_docs,
            len(cids),
            n_chars,
        ), (r.split, r.source)
