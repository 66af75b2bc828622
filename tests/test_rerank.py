"""x_rerank_exact semantics on a constructed corpus — the driver
testdata has every doc embedded and term positions are arbitrary, so
the oracle check there pins engine equality but not the interesting
paths. This corpus pins: an UNEMBEDDED candidate (sem_ppm must fall
back to 0, not drop the row), a partial-coverage candidate nominated
only by the ANN side (no proximity bonus), and the proximity bonus
ordering a tight phrase above a spread one. Also asserts Spark ==
DuckDB on this corpus directly (the constructed-corpus discipline of
tests/test_lang_segments.py)."""

from __future__ import annotations

import duckdb

from async_event_streams_spark.queries import ORACLES, QUERIES

from .oracle_compare import value_hash

DIM = 64

FILLER = "alpha beta gamma delta epsilon zeta eta theta"


def _vec(hot: int, val: float = 1.0) -> list[float]:
    v = [0.0] * DIM
    v[hot] = val
    return v


def _corpus(spark, tmp_path):
    sf = str(tmp_path / "sf_rerank")
    docs = [
        # 0..4, 6..9: all three query terms, spread span (positions
        # 1, 4, 7 -> span 7), embedded orthogonal to the query
        *[
            (i, f"spark {FILLER.split()[0]} w{i} join x{i} y{i} data {FILLER}")
            for i in (0, 1, 2, 4, 6, 7)
        ],
        # 3: all terms spread, embedding CLOSE to the query
        (3, f"spark a b c join d e f data {FILLER}"),
        # 5: ONLY 'spark' (fails the conjunctive keyword gate; enters
        # the shortlist through the ANN side: identical to the query)
        (5, f"spark {FILLER} {FILLER}"),
        # 10: tight adjacent phrase, NO embedding row
        (10, f"spark join data {FILLER} {FILLER}"),
        # 11: no query terms at all, embedded far; should not surface
        (11, f"{FILLER} {FILLER} {FILLER}"),
    ]
    spark.createDataFrame(
        [(i, t, len(t)) for i, t in docs],
        "doc_id long, text string, n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")
    emb = [
        (0, 0, _vec(0)),          # the query vector
        (1, 0, _vec(1)),
        (2, 0, _vec(2)),
        (3, 0, [0.9] + [0.1] * 1 + [0.0] * (DIM - 2)),  # cos≈0.994
        (4, 0, _vec(4)),
        (5, 1, _vec(0)),          # identical to the query -> cos 1.0
        (6, 1, _vec(6)),
        (7, 1, _vec(7)),
        # docs 10 and 11 have NO embedding rows
    ]
    spark.createDataFrame(
        emb, "vec_id long, label long, embedding array<float>"
    ).write.parquet(f"{sf}/embeddings.parquet")
    return sf


def test_rerank_exact_semantics(spark, tmp_path):
    sf = _corpus(spark, tmp_path)
    out = QUERIES["x_rerank_exact"](spark, sf)
    rows = {r.doc_id: r for r in out.collect()}

    # the unembedded tight-phrase doc: full coverage, span 3,
    # sem_ppm exactly 0 (left-join fallback, row NOT dropped)
    r10 = rows[10]
    assert r10.sem_ppm == 0
    assert r10.coverage == 3 and r10.span == 3
    assert r10.score_micro == 3 * 400_000 + (200_000 - 3 * 2_000)

    # the ANN-only candidate: coverage 1, no proximity bonus, cos 1.0
    r5 = rows[5]
    assert r5.sem_ppm == 1_000_000
    assert (r5.coverage, r5.span) == (1, 0)
    assert r5.score_micro == 1_000_000 + 400_000

    # near-query embedded doc: full coverage, spread span 9
    # ("spark a b c join d e f data": first positions 1, 5, 9)
    r3 = rows[3]
    assert r3.coverage == 3 and r3.span == 9
    assert r3.sem_ppm > 990_000

    # interaction ordering: r3 (sem + coverage + spread-prox) beats
    # both the unembedded tight phrase and the ANN-only candidate
    assert r3.rank_re < r10.rank_re
    assert r3.rank_re < r5.rank_re

    # ranks are 1..n dense and ordered by score desc, doc_id asc
    got = sorted(rows.values(), key=lambda r: r.rank_re)
    assert [r.rank_re for r in got] == list(range(1, len(got) + 1))
    keys = [(-r.score_micro, r.doc_id) for r in got]
    assert keys == sorted(keys)


def test_rerank_exact_matches_duckdb_on_constructed_corpus(spark, tmp_path):
    sf = _corpus(spark, tmp_path)
    spark_pdf = QUERIES["x_rerank_exact"](spark, sf).toPandas()
    con = duckdb.connect()
    for name in ("documents", "embeddings"):
        # Spark wrote a parquet DIRECTORY; DuckDB needs the part glob
        con.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM '{sf}/{name}.parquet/*.parquet'"
        )
    oracle_pdf = con.execute(ORACLES["x_rerank_exact"]).fetchdf()
    assert len(spark_pdf) == len(oracle_pdf)
    assert value_hash(spark_pdf) == value_hash(oracle_pdf)
