"""x_dsir_select semantics on a constructed corpus — the driver
corpus draws every doc's text from one shared vocabulary, so the DSIR
scores there are near-noise (correct, oracle-checked, but not
discriminative). This corpus gives the target domain its own
vocabulary so importance ranking must actually separate the slices."""

from __future__ import annotations

import duckdb

from async_event_streams_spark.queries import ORACLES, QUERIES

# target-domain (en) docs speak one vocabulary, the rest another
EN_A = "alpha beta gamma alpha beta gamma alpha beta"
EN_B = "beta gamma alpha beta gamma alpha beta gamma"
DE_A = "zeta eta theta zeta eta theta zeta eta"
DE_B = "eta theta zeta eta theta zeta eta theta"
MIX = "alpha beta zeta eta alpha beta zeta eta"


def _run(spark, tmp_path, rows):
    sf = str(tmp_path / "sf_dsir")
    spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    ).write.parquet(f"{sf}/documents.parquet")
    return {
        r.doc_id: r for r in QUERIES["x_dsir_select"](spark, sf).collect()
    }


def test_dsir_separates_target_domain(spark, tmp_path):
    rows = [
        (1, "en", "s0", EN_A),
        (2, "en", "s0", EN_B),
        (3, "de", "s0", DE_A),
        (4, "de", "s0", DE_B),
        (5, "de", "s0", MIX),  # halfway: must land between the slices
        (6, "de", "s0", ""),  # no bigrams: score 0 on 0 grams
    ]
    got = _run(spark, tmp_path, rows)
    assert set(got) == {1, 2, 3, 4, 5, 6}

    # target-vocabulary docs outscore off-target; the mixed doc sits
    # strictly between the two pure slices
    en_scores = [got[i].score_nanobits for i in (1, 2)]
    de_scores = [got[i].score_nanobits for i in (3, 4)]
    assert min(en_scores) > got[5].score_nanobits > max(de_scores)

    # selection: ceil(6/10) = 1 doc selected, and it is sel_rank 1
    sel = [r for r in got.values() if r.selected]
    assert len(sel) == 1 and sel[0].sel_rank == 1
    assert sel[0].doc_id in (1, 2)

    # ranks are a permutation of 1..n; the empty doc has 0 grams
    assert sorted(r.sel_rank for r in got.values()) == list(range(1, 7))
    assert got[6].n_grams == 0 and got[6].score_nanobits == 0


def test_dsir_oracle_on_constructed(spark, tmp_path):
    """The DuckDB oracle must agree on the discriminative corpus too
    (the driver corpus never separates the slices)."""
    rows = [
        (1, "en", "s0", EN_A),
        (2, "de", "s0", DE_A),
        (3, "de", "s0", MIX),
        (4, "en", "s0", EN_B),
        (5, "zh", "s1", "alpha zeta alpha zeta"),
    ]
    sf = str(tmp_path / "sf_dsir_o")
    spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    ).write.parquet(f"{sf}/documents.parquet")
    spark_rows = {
        r.doc_id: (r.n_grams, r.score_nanobits, r.sel_rank, r.selected)
        for r in QUERIES["x_dsir_select"](spark, sf).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{sf}/documents.parquet/*.parquet'"
    )
    duck_rows = {
        int(r[0]): (int(r[1]), int(r[2]), int(r[3]), bool(r[4]))
        for r in con.execute(ORACLES["x_dsir_select"]).fetchall()
    }
    assert spark_rows == duck_rows
