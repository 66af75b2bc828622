"""Inverted index + keyword search (round 9): the index is a pinned
build-once artifact; search resolves entirely from it (never re-reads
document text); ranking is deterministic."""

from __future__ import annotations

from async_event_streams_spark.queries import QUERIES
from async_event_streams_spark.util import clear_artifacts, drain_artifact_events


def test_search_rides_the_pinned_index_and_never_rescans_text(spark, sf_dir):
    clear_artifacts(spark)
    drain_artifact_events()
    QUERIES["x_inverted_index"](spark, sf_dir).collect()
    ev = dict(drain_artifact_events())
    assert ev.get(f"invindex:{sf_dir}") == "build"

    rows = QUERIES["x_keyword_search"](spark, sf_dir).collect()
    ev = dict(drain_artifact_events())
    assert ev.get(f"invindex:{sf_dir}") == "hit"  # reused, not rebuilt

    # the search plan reads pinned index tables only — no parquet scan
    # of the documents table (text is never touched at query time)
    df = QUERIES["x_keyword_search"](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "documents.parquet" not in plan

    # deterministic ranking contract
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert len(rows) <= 10


def test_posting_blocks_bounded_by_block_width(spark, sf_dir):
    """No block's df can exceed the block width — the property that
    bounds the heaviest task at any term frequency."""
    rows = QUERIES["x_inverted_index"](spark, sf_dir).collect()
    assert rows
    assert max(r.df_block for r in rows) <= 200
    assert all(r.cf_block >= r.df_block for r in rows)
