"""Streaming lang-segments (streaming/langseg.py): after every wave
the per-doc snapshot equals the batch report over all documents sent
so far — on a constructed code-switched corpus (the driver testdata
has no sentence punctuation), across compaction and a restart — and
the shared kernel equals the REGISTERED x_lang_segments on both the
real documents table and the constructed corpus."""

from __future__ import annotations

from async_event_streams_spark.streaming.langseg import (
    lang_mix_rollup,
    lang_mix_snapshot,
    lang_segment_report,
    lang_segments_pipe,
    lang_segments_snapshot,
)
from async_event_streams_spark.topics import Topic, TopicRegistry

_SCHEMA = "doc_id long, text string"

EN = "the cat and a dog of note"
DE = "der hund und die katze ist da"
ES = "el perro y la casa que canta"
XX = "zzz qqq www"


def _waves():
    return [
        # wave 0: pure en, mixed en/de, unknown interleave
        [
            {"doc_id": 1, "text": f"{EN}. {EN}! {EN}?"},
            {"doc_id": 2, "text": f"{EN}. {DE}. {DE}. {EN}."},
            {"doc_id": 3, "text": f"{EN}. {XX}. {EN}."},
        ],
        # wave 1: majority tie, single-sentence es, ZERO-sentence doc
        # (punctuation only -> no report row, the posexplode contract)
        [
            {"doc_id": 4, "text": f"{EN}. {DE}. {EN}. {DE}."},
            {"doc_id": 5, "text": ES},
            {"doc_id": 6, "text": "... !!! ???"},
        ],
        # wave 2: heavy minority + fr arrival
        [
            {"doc_id": 7, "text": f"{DE}. {DE}. {EN}."},
            {"doc_id": 8, "text": "le chat et les gens. une les des et le."},
        ],
    ]


def _report_rows(df):
    return sorted(
        (
            r.doc_id,
            r.n_sentences,
            r.n_segments,
            r.primary_lang,
            r.minority_ppm,
            r.mixed,
        )
        for r in df.collect()
    )


def _mix_rows(df):
    return sorted(
        (r.primary_lang, r.n_docs, r.n_mixed, r.mixed_ppm, r.mean_minority_ppm)
        for r in df.collect()
    )


def test_streaming_langseg_equals_batch(spark, tmp_path):
    reg = TopicRegistry()
    src = Topic(spark, "langseg", _SCHEMA, str(tmp_path / "t"), reg)
    sdir = str(tmp_path / "state")
    h = lang_segments_pipe(src, sdir, compact_every=2)
    try:
        sofar = []
        for wave in _waves():
            src.send(wave, barrier="chain")
            sofar += wave
            batch = lang_segment_report(
                spark.createDataFrame(sofar, _SCHEMA)
            )
            got = _report_rows(lang_segments_snapshot(spark, sdir))
            want = _report_rows(batch)
            assert got == want, (got, want)
            # dashboard rides the same rollup on both sides
            assert _mix_rows(lang_mix_snapshot(spark, sdir)) == _mix_rows(
                lang_mix_rollup(batch)
            )
        # the zero-sentence doc produced no row anywhere
        assert all(row[0] != 6 for row in got)
        # doc 4's 2-2 majority tie broke to en by lexicon order
        assert [r for r in got if r[0] == 4][0][3] == "en"

        # the final snapshot ALSO equals the registered x_lang_segments
        # run over the same corpus (the multi-sentence paths — segment
        # collapse, ties, ppm — cross-checked against the registry, not
        # just kernel-vs-itself)
        from async_event_streams_spark.queries import QUERIES

        sf = str(tmp_path / "sf_langseg")
        spark.createDataFrame(sofar, _SCHEMA).write.parquet(
            f"{sf}/documents.parquet"
        )
        assert got == _report_rows(QUERIES["x_lang_segments"](spark, sf))
    finally:
        h.stop()
        src.close()


def test_streaming_langseg_restart(spark, tmp_path):
    assert lang_segments_snapshot(spark, str(tmp_path / "none")).count() == 0
    assert lang_mix_snapshot(spark, str(tmp_path / "none")).count() == 0
    reg = TopicRegistry()
    src = Topic(spark, "langseg_r", _SCHEMA, str(tmp_path / "t"), reg)
    sdir = str(tmp_path / "state")
    waves = _waves()
    h1 = lang_segments_pipe(src, sdir, name="langseg-r")
    src.send(waves[0], barrier="chain")
    h1.stop()
    src.post(waves[1])  # while down
    h2 = lang_segments_pipe(src, sdir, name="langseg-r")
    try:
        src.send(waves[2], barrier="chain")
        src.barrier()
        got = _report_rows(lang_segments_snapshot(spark, sdir))
        want = _report_rows(
            lang_segment_report(
                spark.createDataFrame(sum(waves, []), _SCHEMA)
            )
        )
        assert got == want
    finally:
        h2.stop()
        src.close()


def test_langseg_kernel_matches_registered_query(spark, sf_dir):
    """The shared kernel == the registered x_lang_segments, bit for
    bit, on the real documents table (delegation means this can only
    break if the registered query stops delegating)."""
    from async_event_streams_spark.queries import QUERIES
    from async_event_streams_spark.tables import table

    got = _report_rows(
        lang_segment_report(
            table(spark, sf_dir, "documents").select("doc_id", "text")
        )
    )
    want = _report_rows(QUERIES["x_lang_segments"](spark, sf_dir))
    assert got and got == want
