"""Streaming IVF index maintenance: the incrementally-built index must
equal the batch-built one — same cell assignments, same search results
— no matter how the embedding stream was split into micro-batches."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from async_event_streams_spark.queries.llm import ivf_assign
from async_event_streams_spark.streaming import (
    compact_state,
    ivf_index_pipe,
    search_ivf_index,
    state_dirs,
)
from async_event_streams_spark.tables import table
from async_event_streams_spark.topics import Topic, TopicRegistry


@pytest.fixture()
def topic_root(tmp_path):
    return str(tmp_path / "topics")


def test_streaming_ivf_index_equals_batch(spark, sf_dir, topic_root):
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    rows = emb.orderBy("vec_id").limit(30).collect()
    centroids = [list(r.embedding) for r in rows[:8]]

    reg = TopicRegistry()
    vecs = Topic(
        spark, "ann_vecs", "vec_id long, embedding array<double>", topic_root, reg
    )
    sdir = f"{topic_root}/ivf-state"
    h = ivf_index_pipe(vecs, sdir, centroids, name="ann-pipe")
    try:
        for lo in range(0, 30, 10):  # three waves of 10
            vecs.send(
                [
                    {"vec_id": r.vec_id, "embedding": list(r.embedding)}
                    for r in rows[lo : lo + 10]
                ],
                barrier="chain",
            )
        # 1) incremental index == batch assignment over all vectors
        streamed = {
            r.vec_id: r.cell
            for r in spark.read.parquet(*state_dirs(sdir)).collect()
        }
        v = spark.createDataFrame(
            [(r.vec_id, list(r.embedding)) for r in rows],
            "vec_id long, e array<double>",
        )
        batch = {r.vec_id: r.cell for r in ivf_assign(v, centroids).collect()}
        assert streamed == batch and len(streamed) == 30

        # 2) search over the incremental index == search over a
        #    batch-built index dir; stable under compaction
        queries = spark.createDataFrame(
            [(r.vec_id, list(r.embedding)) for r in rows[:5]],
            "query_id long, embedding array<double>",
        )
        got = sorted(
            map(tuple, search_ivf_index(spark, sdir, queries, centroids).collect())
        )
        bdir = f"{topic_root}/ivf-batch"
        ivf_assign(v, centroids).write.parquet(f"{bdir}/batch=0")
        want = sorted(
            map(tuple, search_ivf_index(spark, bdir, queries, centroids).collect())
        )
        assert got == want and len({g[0] for g in got}) == 5
        h.stop()
        assert compact_state(spark, sdir, upto_batch=10_000) >= 2
        after = sorted(
            map(tuple, search_ivf_index(spark, sdir, queries, centroids).collect())
        )
        assert after == got
    finally:
        h.stop()
        vecs.close()
