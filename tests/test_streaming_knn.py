"""Streaming kNN-graph maintenance: the incrementally-maintained edge
list must equal the batch build over the vectors sent so far — after
EVERY wave, and (once the full corpus is in) against the registered
x_knn_graph query itself — including re-sent vectors that move
between LSH buckets."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from async_event_streams_spark.functions.similarity import lsh_bucket, lsh_planes
from async_event_streams_spark.streaming import knn_edges_snapshot, knn_graph_pipe
from async_event_streams_spark.streaming.knn import bucket_edges
from async_event_streams_spark.tables import table
from async_event_streams_spark.topics import Topic, TopicRegistry
from async_event_streams_spark.util import cap_buckets

_PLANES = lsh_planes(10, 64, seed=43)  # the batch build's planes


@pytest.fixture()
def topic_root(tmp_path):
    return str(tmp_path / "topics")


def _batch_reference(spark, vecs, k=3, cap=64):
    """Batch edge list over an explicit (vec_id, e) corpus — the same
    bucket/cap/join shape as x_knn_graph."""
    df = spark.createDataFrame(vecs, "vec_id long, e array<double>")
    b = cap_buckets(
        df.withColumn("bucket", lsh_bucket(F.col("e"), _PLANES)),
        ["bucket"],
        cap,
    )
    return {
        (r.vec_id, r.neighbor_id, r.rnk, r.score)
        for r in bucket_edges(b, k).collect()
    }


def _snapshot(spark, sdir):
    return {
        (r.vec_id, r.neighbor_id, r.rnk, r.score)
        for r in knn_edges_snapshot(spark, sdir).collect()
    }


def test_streaming_knn_graph_equals_batch(spark, sf_dir, topic_root):
    rows = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
        .orderBy("vec_id")
        .collect()
    )
    corpus = [(r.vec_id, list(r.e)) for r in rows]
    n = len(corpus)
    cut1, cut2 = n // 3, 2 * n // 3

    reg = TopicRegistry()
    vecs = Topic(
        spark, "knn_vecs", "vec_id long, embedding array<double>", topic_root, reg
    )
    sdir = f"{topic_root}/knn-state"
    h = knn_graph_pipe(vecs, sdir, dim=64, name="knn-pipe")
    try:
        sofar: list = []
        for lo, hi in ((0, cut1), (cut1, cut2), (cut2, n)):
            wave = corpus[lo:hi]
            vecs.send(
                [{"vec_id": v, "embedding": e} for v, e in wave],
                barrier="chain",
            )
            sofar += wave
            assert _snapshot(spark, sdir) == _batch_reference(spark, sofar)

        # full corpus in: the snapshot must ALSO match the registered
        # batch query bit-for-bit (independent of this module's code)
        from async_event_streams_spark.queries.llm import x_knn_graph

        want = {
            (r.vec_id, r.neighbor_id, r.rnk, r.score)
            for r in x_knn_graph(spark, sf_dir).collect()
        }
        assert _snapshot(spark, sdir) == want

        # re-send one vector with a changed embedding: it moves
        # position (possibly buckets); old and new buckets recompute
        moved_id, old_e = corpus[0]
        new_e = [-x for x in old_e]  # flips every projection sign
        vecs.send(
            [{"vec_id": moved_id, "embedding": new_e}], barrier="chain"
        )
        updated = [(moved_id, new_e)] + [
            (v, e) for v, e in corpus if v != moved_id
        ]
        assert _snapshot(spark, sdir) == _batch_reference(spark, updated)
    finally:
        h.stop()
        vecs.close()


def test_moved_vector_not_resurrected_in_old_bucket(spark, sf_dir, topic_root):
    """r7 advice (high): after a vector moves bucket A→B, a LATER
    batch that touches A but not B must not resurrect the stale
    (vec, A) state row — latest-wins has to be resolved over the full
    vector state before the touched-bucket filter. The move and the
    A-only follow-up land in SEPARATE waves (the equality test above
    only covers the wave where both buckets recompute together)."""
    rows = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
        .orderBy("vec_id")
        .limit(60)
        .collect()
    )
    corpus = [(r.vec_id, list(r.e)) for r in rows]
    max_id = max(v for v, _ in corpus)
    reg = TopicRegistry()
    vecs = Topic(
        spark, "knn_vecs_m", "vec_id long, embedding array<double>", topic_root, reg
    )
    sdir = f"{topic_root}/knn-state-m"
    h = knn_graph_pipe(vecs, sdir, dim=64, name="knn-pipe-m")
    try:
        vecs.send(
            [{"vec_id": v, "embedding": e} for v, e in corpus],
            barrier="chain",
        )
        # wave 2: move corpus[0] to the antipodal bucket (negation
        # flips every SRP projection sign, so old and new buckets
        # always differ)
        moved_id, old_e = corpus[0]
        new_e = [-x for x in old_e]
        vecs.send([{"vec_id": moved_id, "embedding": new_e}], barrier="chain")
        # wave 3: a brand-new vector into the OLD bucket only —
        # positive scaling preserves every projection sign, so
        # 1.5 * old_e hashes to exactly the moved vector's old bucket,
        # and nothing in this wave touches the new bucket
        probe_id, probe_e = max_id + 1, [1.5 * x for x in old_e]
        vecs.send([{"vec_id": probe_id, "embedding": probe_e}], barrier="chain")
        updated = (
            [(moved_id, new_e), (probe_id, probe_e)]
            + [(v, e) for v, e in corpus if v != moved_id]
        )
        assert _snapshot(spark, sdir) == _batch_reference(spark, updated)
    finally:
        h.stop()
        vecs.close()


def test_streaming_knn_graph_with_compaction(spark, sf_dir, topic_root):
    """compact_every folds all three state roots; snapshot equality is
    unaffected because latest-touch resolution keys on the ROW-level
    __batch stamps, not directory names."""
    from async_event_streams_spark.streaming import state_dirs

    rows = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
        .orderBy("vec_id")
        .limit(90)
        .collect()
    )
    corpus = [(r.vec_id, list(r.e)) for r in rows]
    reg = TopicRegistry()
    vecs = Topic(
        spark, "knn_vecs_c", "vec_id long, embedding array<double>", topic_root, reg
    )
    sdir = f"{topic_root}/knn-state-c"
    h = knn_graph_pipe(vecs, sdir, dim=64, name="knn-pipe-c", compact_every=2)
    try:
        sofar: list = []
        for lo in range(0, 90, 30):
            wave = corpus[lo : lo + 30]
            vecs.send(
                [{"vec_id": v, "embedding": e} for v, e in wave],
                barrier="chain",
            )
            sofar += wave
            assert _snapshot(spark, sdir) == _batch_reference(spark, sofar)
        # batch 2 compacted batches 0-1: vector root folded to 2 dirs
        assert len(state_dirs(f"{sdir}/vectors")) == 2
    finally:
        h.stop()
        vecs.close()


def test_knn_pipe_restart_resumes_and_stays_batch_equal(spark, sf_dir, topic_root):
    """Stop the kNN pipe mid-corpus, publish while down, restart with
    the same name (same checkpoint + state dir): the drained snapshot
    must still equal the batch build — replay-safe batch=N overwrite
    plus checkpoint offsets give exactly-once state maintenance."""
    rows = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
        .orderBy("vec_id")
        .limit(120)
        .collect()
    )
    corpus = [(r.vec_id, list(r.e)) for r in rows]
    reg = TopicRegistry()
    vecs = Topic(
        spark, "knn_vecs_r", "vec_id long, embedding array<double>", topic_root, reg
    )
    sdir = f"{topic_root}/knn-state-r"
    h1 = knn_graph_pipe(vecs, sdir, dim=64, name="knn-pipe-r")
    vecs.send(
        [{"vec_id": v, "embedding": e} for v, e in corpus[:60]],
        barrier="chain",
    )
    h1.stop()
    # published while the pipe is down
    vecs.post([{"vec_id": v, "embedding": e} for v, e in corpus[60:]])
    h2 = knn_graph_pipe(vecs, sdir, dim=64, name="knn-pipe-r")
    try:
        vecs.barrier()
        assert _snapshot(spark, sdir) == _batch_reference(spark, corpus)
    finally:
        h2.stop()
        vecs.close()
