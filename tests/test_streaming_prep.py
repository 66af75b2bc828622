"""Streaming prep-pipeline twin (streaming/prep.py): the incrementally
maintained quality → decontaminate → cluster-split manifest must equal
the batch composition over the documents published so far — after
EVERY wave, across a full stop/restart mid-stream, and (once the whole
documents table is in) against the registered x_prep_pipeline query
itself."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from async_event_streams_spark.functions.graph import connected_components
from async_event_streams_spark.functions.text import shingles, tokens
from async_event_streams_spark.pipelines import quality_filter
from async_event_streams_spark.streaming import (
    prep_manifest_snapshot,
    prep_pipeline_pipe,
)
from async_event_streams_spark.streaming.prep import (
    DECON_MOD,
    LSH_BUCKET_CAP,
    SPLIT_CASE,
    SPLIT_SEED,
    VERIFY_THRESHOLD,
    _decon_grams,
    _minhash_bands,
)
from async_event_streams_spark.tables import table
from async_event_streams_spark.topics import Topic, TopicRegistry
from async_event_streams_spark.util import cap_buckets

_DOC_SCHEMA = "doc_id long, source string, n_chars long, text string"


@pytest.fixture()
def topic_root(tmp_path):
    return str(tmp_path / "topics")


def _batch_manifest(spark, rows) -> set:
    """The batch composition over an explicit corpus — the same stage
    semantics as x_prep_pipeline / its DuckDB oracle, re-derived here
    from the shared kernels."""
    docs = spark.createDataFrame(rows, _DOC_SCHEMA)
    is_bench = F.col("doc_id") % DECON_MOD == 0
    q = quality_filter(docs).select("doc_id", "source", "n_chars", "text")
    train = q.filter(~is_bench)
    bench = _decon_grams(docs.filter(is_bench)).select("g").distinct()
    hits = (
        _decon_grams(train)
        .join(bench, "g", "left_semi")
        .select("doc_id")
        .distinct()
    )
    clean = train.join(hits, "doc_id", "left_anti")
    bands = cap_buckets(
        _minhash_bands(docs), ["band_idx", "band_key"], LSH_BUCKET_CAP
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sh = docs.select(
        "doc_id",
        F.array_distinct(shingles(tokens(F.col("text")))).alias("sh"),
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sha"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("shb"))
    inter = F.size(F.array_intersect(F.col("sha"), F.col("shb")))
    union = F.size("sha") + F.size("shb") - inter
    pairs = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(F.round(inter.cast("double") / union, 6) >= VERIFY_THRESHOLD)
        .select("doc_a", "doc_b")
    )
    if pairs.limit(1).count():
        labels, _ = connected_components(pairs, src="doc_a", dst="doc_b")
        labels = labels.select(
            F.col("node").alias("doc_id"),
            F.col("label").cast("long").alias("canonical_id"),
        )
    else:
        labels = spark.createDataFrame([], "doc_id long, canonical_id long")
    sp = (
        clean.join(labels, "doc_id", "left")
        .select(
            "n_chars",
            F.md5(
                F.concat(
                    F.lit(SPLIT_SEED),
                    F.coalesce("canonical_id", "doc_id").cast("string"),
                ).cast("binary")
            )
            .substr(1, 1)
            .alias("__h"),
        )
        .select(
            F.concat(F.lit("split_"), F.expr(SPLIT_CASE)).alias("stage"),
            "n_chars",
        )
        .groupBy("stage")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
    )

    def row(stage, df):
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        ).select(F.lit(stage).alias("stage"), "n_docs", "n_chars")

    out = row("a_input", docs)
    for st, df in (("b_quality", q), ("c_train_pool", train), ("d_decontaminated", clean)):
        out = out.unionAll(row(st, df))
    return {(r.stage, r.n_docs, r.n_chars) for r in out.unionAll(sp).collect()}


def _snapshot(spark, sdir) -> set:
    return {
        (r.stage, r.n_docs, r.n_chars)
        for r in prep_manifest_snapshot(spark, sdir).collect()
    }


def test_streaming_prep_manifest_equals_batch_with_restart(
    spark, sf_dir, topic_root
):
    rows = [
        (r.doc_id, r.source, r.n_chars, r.text)
        for r in table(spark, sf_dir, "documents")
        .select("doc_id", "source", "n_chars", "text")
        .orderBy("doc_id")
        .collect()
    ]
    n = len(rows)
    cut1, cut2 = n // 3, 2 * n // 3
    waves = [rows[:cut1], rows[cut1:cut2], rows[cut2:]]

    reg = TopicRegistry()
    docs = Topic(spark, "prep_docs", _DOC_SCHEMA, topic_root, reg)
    sdir = f"{topic_root}/prep-state"

    def payload(wave):
        return [
            {"doc_id": d, "source": s, "n_chars": c, "text": t}
            for d, s, c, t in wave
        ]

    h = prep_pipeline_pipe(docs, sdir, name="prep-pipe")
    published: list = []
    try:
        docs.send(payload(waves[0]), barrier="chain")
        published += waves[0]
        assert _snapshot(spark, sdir) == _batch_manifest(spark, published)

        # full-chain restart: wave 2 arrives while the pipe is down
        h.stop()
        docs.post(payload(waves[1]))
        h = prep_pipeline_pipe(docs, sdir, name="prep-pipe")
        docs.barrier()
        published += waves[1]
        assert _snapshot(spark, sdir) == _batch_manifest(spark, published)

        docs.send(payload(waves[2]), barrier="chain")
        published += waves[2]
        assert _snapshot(spark, sdir) == _batch_manifest(spark, published)

        # the whole table is in: the snapshot must ALSO match the
        # registered batch query bit-for-bit
        from async_event_streams_spark.queries.llm import x_prep_pipeline

        want = {
            (r.stage, r.n_docs, r.n_chars)
            for r in x_prep_pipeline(spark, sf_dir).collect()
        }
        assert _snapshot(spark, sdir) == want
    finally:
        h.stop()
        docs.close()
