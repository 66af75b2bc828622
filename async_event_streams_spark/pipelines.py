"""End-to-end LLM training-data pipeline composed from the engine's
operators: quality filter → exact dedup → near-dup removal →
chunking → token accounting.

This is the 100 TB shape: every stage is a DataFrame transformation
(filters push to scans, dedup joins are hash/equi-joins on sketches),
intermediates that feed multiple branches are materialized once, and
nothing ever collects to the driver.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.text import minhash_component, shingle_digests, shingles, tokens
from .tables import table
from .util import materialize

QUALITY_MIN_TOKENS = 10
QUALITY_MAX_PUNCT_RATIO = 0.2
NEAR_DUP_JACCARD = 0.8
LSH_BUCKET_CAP = 64

logger = logging.getLogger(__name__)


def extract_text(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Optional stage 0 for markup-bearing corpora: replace ``text``
    with the main text extracted from ``html_col`` (functions/extract.py
    block heuristics — script/style dropped, blocks kept by word count
    and link density). Pages with no body copy are dropped here, before
    any downstream stage hashes them. Pure per-row expressions: pushes
    into the scan projection, zero shuffles."""
    from .functions.extract import extract_main_text

    return (
        pages.withColumn("text", extract_main_text(F.col(html_col)))
        .filter(F.length("text") > 0)
        .drop(html_col)
    )


def quality_filter(docs: DataFrame) -> DataFrame:
    """Cheap quality gates first — they prune before any hashing."""
    toks = tokens(F.col("text"))
    n_tokens = F.size(toks)
    punct_ratio = F.regexp_count("text", F.lit("[.,!?;:]")).cast(
        "double"
    ) / F.length("text")
    return (
        docs.withColumn("n_tokens", n_tokens)
        .filter(
            (F.col("n_tokens") >= QUALITY_MIN_TOKENS)
            & (punct_ratio <= QUALITY_MAX_PUNCT_RATIO)
        )
    )


def dedup_exact(docs: DataFrame) -> DataFrame:
    """Keep the first (min doc_id) copy of each exact text."""
    keep = docs.groupBy(F.md5("text").alias("__h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    return docs.join(keep, "doc_id", "left_semi")


def dedup_near(
    docs: DataFrame,
    jaccard_threshold: float = NEAR_DUP_JACCARD,
    lsh_bucket_cap: int = LSH_BUCKET_CAP,
) -> DataFrame:
    """Remove near-duplicates: minhash/LSH candidates → exact Jaccard
    verify → drop the higher doc_id of each verified pair. Everything is
    equi-joins over materialized sketches — O(n + candidates).

    Band buckets larger than ``lsh_bucket_cap`` are dropped before the
    self-join (a degenerate band key squares the candidate set — the
    round-1 100x dup-heavy probe grew 44.8x without this). Oversized
    buckets hold exact/boilerplate duplicates that ``dedup_exact``
    already owns; the drop count is logged."""
    # Bind the shingle array ONCE: the digest and distinct columns
    # both derive from it, and inlining the tokenize+zip_with chain
    # into each (the collapsed-projection form) evaluated it twice —
    # the sk build measured 8.8 s at sf1 inlined vs ~5 s bound (r13
    # stage profile; same fix as x_distinct_ngrams' bound tokens).
    sk = materialize(
        docs.select(
            "doc_id", shingles(tokens(F.col("text"))).alias("__raw")
        ).select(
            "doc_id",
            shingle_digests(F.col("__raw")).alias("hs"),
            F.array_distinct(F.col("__raw")).alias("sh"),
        )
    )
    # sig is PINNED too: the band self-join reads it as BOTH sides,
    # and each side re-evaluated the four minhash array transforms
    # over the full digest table (~5.7 s of the sf1 pipeline_report
    # cost). 4 short strings per doc — checkpoint-cheap.
    sig = materialize(
        sk.select(
            "doc_id",
            *[
                minhash_component(F.col("hs"), k).alias(f"h{k}")
                for k in range(4)
            ],
        )
    )
    # Band rows stay SLIM (doc_id, bi, bk): the shingle arrays never
    # ride the band shuffle or the self-join. Verification re-attaches
    # them to the (much smaller) DISTINCT candidate-pair set via two
    # doc_id equi-joins — one exact Jaccard per pair instead of one
    # per band collision (the r11 cand_jaccard lesson; the array-
    # carrying form measured 25.8 s cold / 10.9 s warm at sf1, this
    # one 7.5 / 8.2 — the remaining floor is the pinned sketch build).
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("bi"), F.concat("h0", "h1").alias("bk")),
                F.struct(F.lit(1).alias("bi"), F.concat("h2", "h3").alias("bk")),
            )
        ).alias("band"),
    ).select("doc_id", "band.bi", "band.bk")
    # Bucket-size guard: find degenerate band keys (slim partial-agg
    # count, column-pruned to the keys) and anti-join them away with a
    # broadcast — the big side never shuffles for the guard.
    oversized = materialize(
        bands.groupBy("bi", "bk")
        .agg(F.count("*").alias("bsz"))
        .filter(F.col("bsz") > lsh_bucket_cap)
        .select("bi", "bk")
    )
    n_over = oversized.count()
    if n_over:
        logger.info(
            "dedup_near: dropping %d oversized LSH buckets (cap=%d)",
            n_over,
            lsh_bucket_cap,
        )
    bands = bands.join(F.broadcast(oversized), ["bi", "bk"], "left_anti")
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.bi") == F.col("b.bi"))
            & (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db")
        )
        .distinct()
    )
    sh_tbl = sk.select("doc_id", "sh")
    cand = pairs.join(
        sh_tbl.select(F.col("doc_id").alias("da"), F.col("sh").alias("sha")),
        "da",
    ).join(
        sh_tbl.select(F.col("doc_id").alias("db"), F.col("sh").alias("shb")),
        "db",
    )
    inter = F.size(F.array_intersect(F.col("sha"), F.col("shb")))
    union = F.size("sha") + F.size("shb") - inter
    dup_ids = (
        cand.filter(inter.cast("double") / union >= jaccard_threshold)
        .select(F.col("db").alias("doc_id"))  # drop the later copy
        .distinct()
    )
    return docs.join(dup_ids, "doc_id", "left_anti")


def chunk(docs: DataFrame, chunk_tokens: int = 20, stride: int = 15) -> DataFrame:
    toks = tokens(F.col("text"))
    starts = F.sequence(F.lit(1), F.size(toks), F.lit(stride))
    chunks = F.transform(
        starts, lambda s: F.concat_ws(" ", F.slice(toks, s, chunk_tokens))
    )
    return docs.select(
        "doc_id",
        "lang",
        F.posexplode(chunks).alias("idx0", "chunk_text"),
    ).select(
        "doc_id",
        "lang",
        (F.col("idx0") + 1).cast("int").alias("chunk_idx"),
        "chunk_text",
        F.size(F.split("chunk_text", r"\s+")).alias("chunk_tokens"),
    )


def prepare_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → quality gate → exact dedup → near-dup removal →
    sliding-window chunks with token counts."""
    docs = table(spark, sf_dir, "documents")
    return chunk(dedup_near(dedup_exact(quality_filter(docs))))
