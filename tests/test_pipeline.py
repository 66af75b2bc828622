"""The composed training-data pipeline: stage invariants and
end-to-end consistency on the synthetic corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from async_event_streams_spark.pipelines import (
    chunk,
    dedup_exact,
    dedup_near,
    prepare_training_corpus,
    quality_filter,
)
from async_event_streams_spark.tables import table


def test_stagewise_invariants(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    n0 = docs.count()

    q = quality_filter(docs)
    n1 = q.count()
    assert 0 < n1 <= n0
    assert q.filter(F.col("n_tokens") < 10).count() == 0

    d1 = dedup_exact(q)
    n2 = d1.count()
    assert n2 <= n1
    # post-condition: texts are unique
    assert d1.select(F.md5("text")).distinct().count() == n2

    d2 = dedup_near(d1)
    n3 = d2.count()
    assert 0 < n3 <= n2

    ch = chunk(d2)
    assert ch.count() >= n3  # every surviving doc yields >= 1 chunk
    assert ch.filter(F.col("chunk_tokens") < 1).count() == 0
    # chunk indexes are dense from 1 per doc
    agg = ch.groupBy("doc_id").agg(
        F.min("chunk_idx").alias("lo"), F.max("chunk_idx").alias("hi"),
        F.count("*").alias("n"),
    )
    assert agg.filter((F.col("lo") != 1) | (F.col("hi") != F.col("n"))).count() == 0


def test_near_dup_removal_drops_known_pairs(spark, sf_dir):
    """The synthetic corpus contains planted near-dups (J≈0.99); after
    dedup_near no surviving pair may exceed the threshold."""
    from async_event_streams_spark.queries.llm import x_dedup_verified

    verified = x_dedup_verified(spark, sf_dir)
    n_pairs = verified.count()
    if n_pairs == 0:
        return  # nothing planted at this SF
    docs = table(spark, sf_dir, "documents")
    survivors = dedup_near(dedup_exact(quality_filter(docs)))
    surviving_pairs = (
        verified.join(
            survivors.select(F.col("doc_id").alias("doc_a")), "doc_a"
        )
        .join(survivors.select(F.col("doc_id").alias("doc_b")), "doc_b")
        .count()
    )
    assert surviving_pairs == 0, f"{surviving_pairs} near-dup pairs survived"


def test_lsh_bucket_guard_bounds_degenerate_buckets(spark):
    """A boilerplate flood (one band key shared by 200 docs) must NOT
    produce a quadratic candidate join: the oversized bucket is dropped,
    while a genuine near-dup pair in a small bucket is still removed."""
    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        "padding tokens keep the shingle count realistic for this corpus"
    )
    rows = [(i, base, "en") for i in range(200)]
    ta = (
        "unique alpha beta gamma delta epsilon zeta eta theta iota "
        "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    tb = ta + " phi"
    rows += [(1000, ta, "en"), (1001, tb, "en")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = dedup_near(docs)
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    # flood passes through untouched — its bucket was dropped, so no
    # 200*199/2 pair explosion and nothing got anti-joined away
    assert set(range(200)) <= ids
    # the genuine near-dup pair still dedups (small bucket survives)
    assert 1000 in ids and 1001 not in ids


def test_end_to_end_runs(spark, sf_dir):
    corpus = prepare_training_corpus(spark, sf_dir)
    assert corpus.count() > 0
    assert set(corpus.columns) == {
        "doc_id",
        "lang",
        "chunk_idx",
        "chunk_text",
        "chunk_tokens",
    }
