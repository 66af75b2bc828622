"""x_span_scrub semantics vs a brute-force pure-Python reference on
the real corpus sample: canonical occurrence survives corpus-wide,
every other duplicated-span copy is cut, overlapping spans merge via
covered positions, and the kept-text md5 matches a from-scratch
rewrite."""

from __future__ import annotations

import hashlib

from async_event_streams_spark.queries import QUERIES
from async_event_streams_spark.queries.llm import _SPAN_K


def _reference(texts: dict[int, str]):
    k = _SPAN_K
    toks = {d: t.strip().split() for d, t in texts.items()}
    occs: dict[str, list[tuple[int, int]]] = {}
    for d in sorted(toks):
        ws = toks[d]
        for p in range(len(ws) - k + 1):
            gram = " ".join(ws[p : p + k])
            occs.setdefault(gram, []).append((d, p + 1))
    covered: dict[int, set[int]] = {d: set() for d in toks}
    for gram, lst in occs.items():
        if len({d for d, _ in lst}) < 2:
            continue
        canon = min(lst)
        for d, p in lst:
            if (d, p) == canon:
                continue
            covered[d].update(range(p, p + k))
    out = {}
    for d, ws in toks.items():
        kept = [w for i, w in enumerate(ws, start=1) if i not in covered[d]]
        out[d] = (
            len(ws),
            len(covered[d] & set(range(1, len(ws) + 1))),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
    return out


def test_scrub_matches_brute_force(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    texts = {r.doc_id: r.text for r in docs.collect()}
    want = _reference(texts)
    got = {
        r.doc_id: (r.n_words, r.n_removed, r.kept_md5)
        for r in QUERIES["x_span_scrub"](spark, sf_dir).collect()
    }
    assert got == want


def test_scrub_invariants(spark, sf_dir):
    rows = QUERIES["x_span_scrub"](spark, sf_dir).collect()
    assert rows
    empty_md5 = hashlib.md5(b"").hexdigest()
    for r in rows:
        assert 0 <= r.n_removed <= r.n_words
        assert r.removed_ppm == (r.n_removed * 1000000) // r.n_words
        if r.n_removed == r.n_words:
            assert r.kept_md5 == empty_md5

def test_scrub_boilerplate_wall(spark, tmp_path):
    """Pathological shape from the r11 verdict: a boilerplate wall
    where EVERY span is removable (whole docs covered). The r11
    per-word array_contains probe was O(n·|covered|) = quadratic here;
    the interval rewrite is O(n) — 4000-word walls must finish in
    seconds, and the canonical-survivor semantics must hold exactly:
    doc 1 keeps only its first word (span 1 is corpus-canonical, spans
    2.. cover positions 2..n), every other doc is scrubbed empty."""
    import time

    n = 4000
    wall = " ".join(["wall"] * n)
    sf = str(tmp_path / "sf_wall")
    spark.createDataFrame(
        [(d, wall) for d in range(1, 4)], "doc_id int, text string"
    ).write.parquet(f"{sf}/documents.parquet")
    t0 = time.monotonic()
    rows = {r.doc_id: r for r in QUERIES["x_span_scrub"](spark, sf).collect()}
    dt = time.monotonic() - t0
    empty_md5 = hashlib.md5(b"").hexdigest()
    one_word_md5 = hashlib.md5(b"wall").hexdigest()
    assert rows[1].n_words == n and rows[1].n_removed == n - 1
    assert rows[1].kept_md5 == one_word_md5
    for d in (2, 3):
        assert rows[d].n_removed == n and rows[d].kept_md5 == empty_md5
    assert dt < 60, f"boilerplate wall took {dt:.1f}s — probe regressed"
