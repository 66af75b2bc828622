"""x_lang_segments semantics on a constructed multilingual corpus —
the driver testdata has no sentence punctuation (every doc is one
segment there, so the oracle check pins engine equality but not the
interesting paths). This corpus exercises switching, unknown
interleave, argmax ties, majority ties, and the minority share."""

from __future__ import annotations

from async_event_streams_spark.queries import QUERIES

EN = "the cat and a dog of note"          # en stopword hits
DE = "der hund und die katze ist da"      # de hits
ES = "el perro y la casa que canta"       # es hits
XX = "zzz qqq www"                        # no lexicon hits -> unknown


def _run(spark, tmp_path, rows):
    sf = str(tmp_path / "sf_lang")
    spark.createDataFrame(rows, "doc_id int, text string").write.parquet(
        f"{sf}/documents.parquet"
    )
    return {r.doc_id: r for r in QUERIES["x_lang_segments"](spark, sf).collect()}


def test_lang_segments_semantics(spark, tmp_path):
    rows = [
        # 1: pure English, 3 sentences -> 1 segment, not mixed
        (1, f"{EN}. {EN}! {EN}?"),
        # 2: en en de de en -> 3 segments, mixed, minority 2/5
        (2, f"{EN}. {EN}. {DE}. {DE}. {EN}."),
        # 3: en unknown en -> unknown is a label: 3 segments, NOT
        #    mixed (only one non-unknown language), minority 1/3
        (3, f"{EN}. {XX}. {EN}."),
        # 4: perfectly alternating en/de/en/de -> 4 segments, mixed,
        #    majority tie (2 vs 2) breaks to en by lexicon order
        (4, f"{EN}. {DE}. {EN}. {DE}."),
        # 5: single Spanish sentence, no terminal punctuation
        (5, ES),
        # 6: punctuation-only text -> zero sentences -> no output row
        (6, "... !!! ???"),
    ]
    got = _run(spark, tmp_path, rows)

    assert set(got) == {1, 2, 3, 4, 5}  # doc 6 has no sentences

    r1 = got[1]
    assert (r1.n_sentences, r1.n_segments, r1.primary_lang) == (3, 1, "en")
    assert r1.minority_ppm == 0 and not r1.mixed

    r2 = got[2]
    assert (r2.n_sentences, r2.n_segments, r2.primary_lang) == (5, 3, "en")
    assert r2.minority_ppm == (2 * 1_000_000) // 5 and r2.mixed

    r3 = got[3]
    assert (r3.n_sentences, r3.n_segments, r3.primary_lang) == (3, 3, "en")
    assert r3.minority_ppm == (1 * 1_000_000) // 3
    assert not r3.mixed  # unknown is not a language for the mixed flag

    r4 = got[4]
    assert (r4.n_sentences, r4.n_segments) == (4, 4)
    assert r4.primary_lang == "en"  # 2-2 count tie -> lexicon order
    assert r4.minority_ppm == 500_000 and r4.mixed

    r5 = got[5]
    assert (r5.n_sentences, r5.n_segments, r5.primary_lang) == (1, 1, "es")
    assert r5.minority_ppm == 0 and not r5.mixed


def test_lang_segments_oracle_on_multilingual(spark, tmp_path):
    """The DuckDB oracle must agree on the constructed corpus too —
    the driver testdata never exercises multi-segment docs."""
    import duckdb

    from async_event_streams_spark.queries import ORACLES

    rows = [
        (1, f"{EN}. {DE}. {EN}."),
        (2, f"{ES}! {XX}? {ES}. {DE}."),
        (3, f"{EN} {DE}"),  # one sentence, merged-vocab argmax
    ]
    sf = str(tmp_path / "sf_lang_o")
    spark.createDataFrame(rows, "doc_id int, text string").write.parquet(
        f"{sf}/documents.parquet"
    )
    spark_rows = {
        r.doc_id: (
            r.n_sentences,
            r.n_segments,
            r.primary_lang,
            r.minority_ppm,
            r.mixed,
        )
        for r in QUERIES["x_lang_segments"](spark, sf).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'"
    )
    duck_rows = {
        int(r[0]): (int(r[1]), int(r[2]), r[3], int(r[4]), bool(r[5]))
        for r in con.execute(ORACLES["x_lang_segments"]).fetchall()
    }
    assert spark_rows == duck_rows
