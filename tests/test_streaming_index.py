"""Streaming inverted index (streaming/index.py): after every wave the
snapshot's block-partitioned postings — md5 content included — equal
the one-shot batch index over all documents sent so far, with terms
whose postings SPAN batches, across compaction and a restart."""

from __future__ import annotations

from async_event_streams_spark.streaming.index import (
    index_batch_twin,
    index_pipe,
    index_snapshot,
)
from async_event_streams_spark.topics import Topic, TopicRegistry

_SCHEMA = "doc_id long, text string"


def _waves():
    w0 = [
        {"doc_id": 1, "text": "spark joins data with spark"},
        {"doc_id": 2, "text": "data flows"},
        {"doc_id": 250, "text": "spark again"},  # second block for 'spark'
    ]
    w1 = [
        {"doc_id": 3, "text": "spark data spark data"},  # spans batches
        {"doc_id": 251, "text": "flows again"},
    ]
    w2 = [
        {"doc_id": 4, "text": "entirely new terms here"},
        {"doc_id": 452, "text": "spark in a third block"},
    ]
    return [w0, w1, w2]


def _rows(df):
    return {
        (r.term, r.block_id): (r.df_block, r.cf_block, r.postings_md5)
        for r in df.collect()
    }


def test_streaming_index_equals_batch(spark, tmp_path):
    reg = TopicRegistry()
    src = Topic(spark, "idx_docs", _SCHEMA, str(tmp_path / "t"), reg)
    sdir = str(tmp_path / "state")
    h = index_pipe(src, sdir, compact_every=2)
    try:
        sofar = []
        for wave in _waves():
            src.send(wave, barrier="chain")
            sofar += wave
            got = _rows(index_snapshot(spark, sdir))
            want = _rows(
                index_batch_twin(spark.createDataFrame(sofar, _SCHEMA))
            )
            assert got == want, (got, want)
        # 'spark' postings genuinely span batches and blocks
        spark_blocks = [k for k in got if k[0] == "spark"]
        assert len(spark_blocks) == 3
    finally:
        h.stop()
        src.close()


def test_streaming_index_restart(spark, tmp_path):
    assert index_snapshot(spark, str(tmp_path / "none")).count() == 0
    reg = TopicRegistry()
    src = Topic(spark, "idx_r", _SCHEMA, str(tmp_path / "t"), reg)
    sdir = str(tmp_path / "state")
    waves = _waves()
    h1 = index_pipe(src, sdir, name="idx-r")
    src.send(waves[0], barrier="chain")
    h1.stop()
    src.post(waves[1])  # while down
    h2 = index_pipe(src, sdir, name="idx-r")
    try:
        src.send(waves[2], barrier="chain")
        src.barrier()
        got = _rows(index_snapshot(spark, sdir))
        want = _rows(
            index_batch_twin(spark.createDataFrame(sum(waves, []), _SCHEMA))
        )
        assert got == want
    finally:
        h2.stop()
        src.close()


def test_search_from_streamed_index_equals_batch_search(spark, sf_dir, tmp_path):
    """The composed serving path: stream the REAL documents table
    through the index pipe, then answer the conjunctive BM25 search
    from the streamed postings snapshot — results must equal the
    registered batch x_keyword_search (same bm25_search code path,
    index built by stream instead of scan)."""
    from pyspark.sql import functions as F

    from async_event_streams_spark.queries import QUERIES
    from async_event_streams_spark.queries.llm import (
        _search_terms,
        bm25_search,
    )
    from async_event_streams_spark.streaming.index import postings_snapshot
    from async_event_streams_spark.tables import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    rows = [r.asDict() for r in docs.collect()]
    reg = TopicRegistry()
    src = Topic(spark, "idx_serve", _SCHEMA, str(tmp_path / "t"), reg)
    sdir = str(tmp_path / "state")
    h = index_pipe(src, sdir, name="idx-serve", compact_every=2)
    try:
        for lo in range(0, len(rows), 200):  # several waves
            src.send(rows[lo : lo + 200], barrier="chain")
        tf = postings_snapshot(spark, sdir)
        dl = docs.select(
            "doc_id",
            F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("dl"),
        )
        got = [
            (r.rank, r.doc_id, r.bm25)
            for r in bm25_search(tf, dl, _search_terms()).collect()
        ]
        want = [
            (r.rank, r.doc_id, r.bm25)
            for r in QUERIES["x_keyword_search"](spark, sf_dir).collect()
        ]
        assert got == want and got
    finally:
        h.stop()
        src.close()
