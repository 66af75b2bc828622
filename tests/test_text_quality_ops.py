"""Third-implementation triangulation for the round-8 text/embedding/
prep operators: the DuckDB differential proves Spark==DuckDB; these
add an independent pure-Python reference derived from the SPEC (not
from either engine's SQL), so a shared misreading cannot hide behind
engine agreement."""

from __future__ import annotations

import math
import re

import pandas as pd

from async_event_streams_spark.queries import QUERIES
from async_event_streams_spark.queries.llm import (
    _MIX_BUDGET_TOKENS,
    _N_SHARDS,
    _QC_AWL_TARGET,
    _QC_BIAS,
    _QC_LEN_CAP,
    _QC_W_LEN,
    _QC_W_PUNCT,
    _QC_W_STOP,
    _QC_W_TTR,
    _STOPWORDS,
)


def _toks(text: str) -> list[str]:
    return re.split(r"\s+", text.strip())


def _py_quality(doc_id: int, text: str) -> dict:
    toks = _toks(text)
    n = len(toks)
    stop_ppm = sum(1 for t in toks if t in _STOPWORDS) * 1000000 // n
    ttr_ppm = len(set(toks)) * 1000000 // n
    awl_micro = len(text) * 1000000 // n
    punct_ppm = (
        len(re.findall(r"[.,!?;:]", text)) * 1000000 // max(len(text), 1)
    )
    logit = (
        _QC_BIAS
        + _QC_W_STOP * stop_ppm
        + _QC_W_TTR * ttr_ppm
        + _QC_W_LEN * min(n, _QC_LEN_CAP)
        - abs(awl_micro - _QC_AWL_TARGET) // 4
        - _QC_W_PUNCT * punct_ppm
    )
    return {
        "n_toks": n,
        "stop_ppm": stop_ppm,
        "ttr_ppm": ttr_ppm,
        "awl_micro": awl_micro,
        "logit_micro": logit,
        "keep": int(logit >= 0),
    }


def test_quality_classifier_matches_python_reference(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    ref = {int(r.doc_id): _py_quality(int(r.doc_id), r.text) for _, r in docs.iterrows()}
    got = QUERIES["x_quality_classifier"](spark, sf_dir).collect()
    assert len(got) == len(ref)
    kept = 0
    for r in got:
        e = ref[r.doc_id]
        assert (
            r.n_toks, r.stop_ppm, r.ttr_ppm, r.awl_micro, r.logit_micro, r.keep
        ) == (
            e["n_toks"], e["stop_ppm"], e["ttr_ppm"], e["awl_micro"],
            e["logit_micro"], e["keep"],
        ), r.doc_id
        # sigmoid display value is the rounded exact-integer logit
        assert abs(r.score - 1 / (1 + math.exp(-e["logit_micro"] / 1e6))) < 1e-6
        kept += r.keep
    # the model actually separates: some docs kept, some dropped
    assert 0 < kept < len(got)


def test_readability_matches_python_reference(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    got = {r.doc_id: r for r in QUERIES["x_readability"](spark, sf_dir).collect()}
    assert len(got) == len(docs)
    bands = set()
    for _, row in docs.iterrows():
        toks = _toks(row.text)
        words = len(toks)
        sents = max(len(re.findall(r"[.!?]", row.text)), 1)
        syll = sum(max(len(re.findall(r"[aeiouy]+", t)), 1) for t in toks)
        flesch = round(206.835 - 1.015 * (words / sents) - 84.6 * (syll / words), 4)
        r = got[int(row.doc_id)]
        assert (r.n_words, r.n_sentences, r.n_syllables) == (words, sents, syll)
        assert abs(r.flesch - flesch) < 1e-9, row.doc_id
        bands.add(r.band)
    assert len(bands) > 1  # the banding is not degenerate on this corpus


def test_vocab_coverage_matches_python_reference(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    counts: dict[str, int] = {}
    total = 0
    for _, row in docs.iterrows():
        for t in _toks(row.text):
            counts[t] = counts.get(t, 0) + 1
            total += 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    got = sorted(
        QUERIES["x_vocab_coverage"](spark, sf_dir).collect(),
        key=lambda r: r.rank,
    )
    cum = 0
    for i, r in enumerate(got):
        term, cnt = ranked[i]
        cum += cnt
        assert (r.term, r.cnt, r.cum_cnt) == (term, cnt, cum), r.rank
        assert r.cum_ppm == cum * 1000000 // total
    # coverage is monotone and ends at most at 1e6
    assert got[-1].cum_ppm <= 1000000


def test_embedding_qc_flags_match_python_reference(spark, sf_dir):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    micros = {}
    for _, row in emb.iterrows():
        v = [float(x) for x in row.embedding]
        s = 0.0
        for x in v:  # sequential fold, the engines' shared order
            s += x * x
        micros[int(row.vec_id)] = math.floor(math.sqrt(s) * 1000000)
    n = len(micros)
    tot = sum(micros.values())
    totsq = sum(m * m for m in micros.values())
    mu = tot / n
    var = (totsq - tot * tot / n) / n
    got = QUERIES["x_embedding_qc"](spark, sf_dir).collect()
    assert len(got) == n
    n_out = 0
    for r in got:
        m = micros[r.vec_id]
        assert r.l2_micro == m, r.vec_id
        assert r.outlier == int((m - mu) * (m - mu) > 4.0 * var), r.vec_id
        n_out += r.outlier
    assert n_out < n  # 2-sigma can never flag everything


def test_mix_schedule_matches_python_reference(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    per = {}
    for _, row in docs.iterrows():
        d, t = per.setdefault(row.source, [0, 0]), len(_toks(row.text))
        d[0] += 1
        d[1] += t
    w = {s: math.floor(math.sqrt(nt) * 1000000) for s, (_, nt) in per.items()}
    w_total = sum(w.values())
    got = QUERIES["x_mix_schedule"](spark, sf_dir).collect()
    assert len(got) == len(per)
    for r in got:
        nd, nt = per[r.source]
        share = w[r.source] * 1000000 // w_total
        target = _MIX_BUDGET_TOKENS * share // 1000000
        assert (r.n_docs, r.n_tokens, r.w_micro, r.share_ppm) == (
            nd, nt, w[r.source], share,
        ), r.source
        assert (r.target_tokens, r.epochs_milli) == (target, target * 1000 // nt)
    # temperature actually flattens: every source's share exceeds half
    # its proportional share only if small — sanity: shares sum ~1e6
    assert abs(sum(r.share_ppm for r in got) - 1000000) <= len(got)


def test_shard_assign_balances_token_totals(spark, sf_dir):
    """Independent invariant check: shard = (size-rank - 1) mod N, and
    the resulting per-shard token totals are near-balanced (the LPT
    round-robin guarantee: spread <= the largest document)."""
    got = QUERIES["x_shard_assign"](spark, sf_dir).collect()
    by_rank = sorted(got, key=lambda r: r.rank)
    # rank order == token-count-desc order with doc_id tiebreak
    for a, b in zip(by_rank, by_rank[1:]):
        assert (a.n_tokens, -a.doc_id) >= (b.n_tokens, -b.doc_id)
        assert b.rank == a.rank + 1
    totals = [0] * _N_SHARDS
    for r in got:
        assert r.shard == (r.rank - 1) % _N_SHARDS
        totals[r.shard] += r.n_tokens
    biggest_doc = by_rank[0].n_tokens
    assert max(totals) - min(totals) <= biggest_doc


def test_embedding_qc_oracle_moment_survives_blowup_norms():
    """ADVICE r8: DuckDB does not widen BIGINT multiplication, so the
    oracle's per-row micro-squared must be HUGEINT-widened BEFORE the
    product or the differential CRASHES (overflow error) at exactly
    the encoder-blowup norms (>= ~3037, l2_micro >= ~3.04e9) this QC
    exists to flag. Evaluate the registered oracle's moment expression
    at such a value."""
    import duckdb

    from async_event_streams_spark.queries import ORACLES

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE f AS SELECT * FROM (VALUES "
        "(1, CAST(4000000000000 AS BIGINT)), "  # norm 4e6: deep blowup
        "(2, CAST(1000000 AS BIGINT))) t(vec_id, l2_micro)"
    )
    # the exact moment expression the registered oracle uses
    frag = "SUM(CAST(l2_micro AS HUGEINT) * l2_micro)"
    assert frag in ORACLES["x_embedding_qc"]
    (q,) = con.execute(
        f"SELECT CAST(CAST({frag} AS DECIMAL(38,0)) AS DOUBLE) FROM f"
    ).fetchone()
    assert q == float(4000000000000**2 + 1000000**2)
