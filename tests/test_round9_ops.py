"""Pure-Python triangulation of the round-9 operators (the r8
discipline): each spec re-derived with plain dict/list code from the
parquet, independent of BOTH engines, so a shared misunderstanding in
the Spark query and its DuckDB oracle can't hide."""

from __future__ import annotations

import collections
import math

import pandas as pd

from async_event_streams_spark.queries import QUERIES


def _toks(text: str) -> list[str]:
    return text.strip().split()


def test_kneser_ney_matches_python_reference(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    c2: collections.Counter = collections.Counter()
    doc_bgs = {}
    for _, r in docs.iterrows():
        t = _toks(r.text)
        bgs = list(zip(t, t[1:]))
        doc_bgs[int(r.doc_id)] = bgs
        c2.update(bgs)
    c1 = collections.Counter()
    n1fwd = collections.Counter()
    n1bwd = collections.Counter()
    for (w1, w2), c in c2.items():
        c1[w1] += c
        n1fwd[w1] += 1
        n1bwd[w2] += 1
    nbi = len(c2)
    D = 0.75
    want = {}
    for doc_id, bgs in doc_bgs.items():
        if not bgs:
            continue
        nano = []
        for w1, w2 in bgs:
            p = max(c2[(w1, w2)] - D, 0.0) / c1[w1] + (
                D * n1fwd[w1] / c1[w1]
            ) * (n1bwd[w2] / nbi)
            nano.append(round(-math.log2(p) * 1e9))
        want[doc_id] = (len(nano), round(sum(nano) / len(nano) / 1e9, 6))
    got = QUERIES["x_kneser_ney"](spark, sf_dir).collect()
    assert len(got) == len(want)
    for r in got:
        n, bits = want[r.doc_id]
        assert r.n_transitions == n, r.doc_id
        assert abs(r.kn_bits - bits) < 1e-9, r.doc_id


def test_ewma_and_rolling_median_match_python_reference(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values("event_id")
    hist: dict[int, list[int]] = collections.defaultdict(list)
    want_ewma = {}
    want_med = {}
    for _, r in ev.iterrows():
        x = math.floor(r.value * 1_000_000)
        h = hist[r.user_id]
        h.append(x)
        frame = h[-8:]
        num = sum(v * (1 << i) for i, v in enumerate(frame))
        den = (1 << len(frame)) - 1
        want_ewma[int(r.event_id)] = (num * 1_000_000) // den
        mf = sorted(h[-5:])
        n = len(mf)
        want_med[int(r.event_id)] = (
            2 * mf[(n - 1) // 2] if n % 2 else mf[n // 2 - 1] + mf[n // 2]
        )
    for r in QUERIES["c_ewma"](spark, sf_dir).collect():
        assert r.ewma_pico == want_ewma[r.event_id], r.event_id
    for r in QUERIES["c_window_rolling_median"](spark, sf_dir).collect():
        assert r.med2_micro == want_med[r.event_id], r.event_id


def test_distinct_ngrams_matches_python_reference(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    want = {}
    for n in (1, 2, 3):
        total, seen = 0, set()
        for t in docs.text:
            toks = _toks(t)
            grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
            total += len(grams)
            seen.update(grams)
        want[n] = (total, len(seen), len(seen) * 1_000_000 // total)
    rows = QUERIES["x_distinct_ngrams"](spark, sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        t, d, ppm = want[r.n]
        assert (r.total_ngrams, r.distinct_ngrams, r.distinct_ppm) == (t, d, ppm)
        assert r.sketch_ok  # rsd 0.04 must sit well within the 10% gate here


def test_dataset_card_matches_python_reference(spark, sf_dir):
    import hashlib

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    want = {}
    for src, g in docs.groupby("source"):
        n = len(g)
        n_tokens = sum(len(_toks(t)) for t in g.text)
        nd = len({hashlib.md5(t.encode()).hexdigest() for t in g.text})
        langs = collections.Counter(g.lang)
        top_lang, top_cnt = sorted(
            langs.items(), key=lambda kv: (-kv[1], kv[0])
        )[0]
        want[src] = (
            n,
            n_tokens,
            n_tokens * 1000 // n,
            (n - nd) * 1_000_000 // n,
            len(langs),
            top_lang,
            top_cnt * 1_000_000 // n,
        )
    rows = QUERIES["x_dataset_card"](spark, sf_dir).collect()
    assert len(rows) == len(want)
    for r in rows:
        assert (
            r.n_docs,
            r.n_tokens,
            r.tokens_per_doc_milli,
            r.dup_ppm,
            r.n_langs,
            r.top_lang,
            r.top_lang_ppm,
        ) == want[r.source], r.source


def test_keyword_search_matches_python_reference(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    terms = ["spark", "join", "data"]
    k1, b = 1.2, 0.75
    dls, tfs = {}, {}
    for _, r in docs.iterrows():
        t = _toks(r.text)
        dls[int(r.doc_id)] = len(t)
        c = collections.Counter(t)
        tfs[int(r.doc_id)] = [c.get(term, 0) for term in terms]
    n_docs = len(dls)
    avgdl = sum(dls.values()) / n_docs
    dfs = [sum(1 for v in tfs.values() if v[i] > 0) for i in range(len(terms))]
    scored = []
    for doc_id, v in tfs.items():
        if not all(x > 0 for x in v):
            continue
        s = 0.0
        for i in range(len(terms)):
            idf = math.log((n_docs - dfs[i] + 0.5) / (dfs[i] + 0.5) + 1.0)
            s += (
                idf
                * (v[i] * (k1 + 1.0))
                / (v[i] + k1 * (1.0 - b + b * dls[doc_id] / avgdl))
            )
        scored.append((round(s, 6), doc_id))
    scored.sort(key=lambda t: (-t[0], t[1]))
    want = scored[:10]
    got = QUERIES["x_keyword_search"](spark, sf_dir).collect()
    assert [(r.bm25, r.doc_id) for r in sorted(got, key=lambda r: r.rank)] == [
        (s, d) for s, d in want
    ]


def test_anomaly_ewma_matches_python_reference(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values("event_id")
    hist: dict[int, list[int]] = collections.defaultdict(list)
    fc = {}  # event_id -> forecast (prev row's ewma_pico) or None
    prev_ewma: dict[int, int] = {}
    xs: dict[int, list[int]] = collections.defaultdict(list)
    order = []
    for _, r in ev.iterrows():
        x = math.floor(r.value * 1_000_000)
        u = int(r.user_id)
        fc[int(r.event_id)] = prev_ewma.get(u)
        h = hist[u]
        h.append(x)
        frame = h[-8:]
        num = sum(v * (1 << i) for i, v in enumerate(frame))
        den = (1 << len(frame)) - 1
        prev_ewma[u] = (num * 1_000_000) // den
        xs[u].append(x)
        order.append((u, int(r.event_id), x))
    stats = {
        u: (len(v), float(sum(v)), float(sum(q * q for q in v)))
        for u, v in xs.items()
    }
    got = {
        r.event_id: (r.x_micro, r.residual_pico, r.anomaly)
        for r in QUERIES["c_anomaly_ewma"](spark, sf_dir).collect()
    }
    n_flagged = 0
    for u, eid, x in order:
        f = fc[eid]
        if f is None:
            assert got[eid] == (x, None, 0), eid
            continue
        residual = x * 1_000_000 - f
        n, s, q = stats[u]
        var = (q - s * s / n) / n
        want_flag = int((residual / 1_000_000) * (residual / 1_000_000) > 4.0 * var)
        assert got[eid] == (x, residual, want_flag), eid
        n_flagged += want_flag
    assert 0 < n_flagged < len(order)  # the rule actually discriminates


def test_sample_balanced_matches_python_reference(spark, sf_dir):
    import hashlib

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    counts = collections.Counter(int(x) for x in emb.label)
    k = min(counts.values())
    want = set()
    for lbl in counts:
        rows = sorted(
            (int(v) for v in emb[emb.label == lbl].vec_id),
            key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v),
        )
        want.update((v, lbl) for v in rows[:k])
    got = {(r.vec_id, r.label) for r in QUERIES["x_sample_balanced"](spark, sf_dir).collect()}
    assert got == want
    per_label = collections.Counter(lbl for _, lbl in got)
    assert set(per_label.values()) == {k}  # exactly k per label


def test_oov_rate_matches_python_reference(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    tf = collections.Counter()
    toks_by_doc = {}
    for _, r in docs.iterrows():
        t = _toks(r.text)
        toks_by_doc[int(r.doc_id)] = t
        tf.update(t)
    vocab = {
        t for t, _ in sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
    }
    got = {
        r.doc_id: (r.n_tokens, r.n_oov, r.oov_ppm)
        for r in QUERIES["x_oov_rate"](spark, sf_dir).collect()
    }
    want_docs = {d: t for d, t in toks_by_doc.items() if t}
    assert len(got) == len(want_docs)
    for d, t in want_docs.items():
        oov = sum(1 for x in t if x not in vocab)
        assert got[d] == (len(t), oov, oov * 1_000_000 // len(t)), d
