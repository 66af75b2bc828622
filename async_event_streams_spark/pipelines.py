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


def neardup_sketch(docs: DataFrame) -> DataFrame:
    """The per-doc near-dup sketch rows dedup_near works over:
    (doc_id, sh = distinct 3-gram shingles, h0..h3 = minhash signature).
    Pure per-row expressions (tokenize → shingle → digest → min), no
    shuffle at any scale. The shingle array is bound ONCE and the digest
    array once (inlining re-evaluated the tokenize+zip_with chain —
    8.8 s vs ~5 s at sf1, r13 stage profile); the 32-hex digests
    themselves are consumed here and never leave this projection, so a
    pin of this frame stores only the slim signature + shingle set."""
    raw = docs.select(
        "doc_id", shingles(tokens(F.col("text"))).alias("__raw")
    ).select(
        "doc_id",
        shingle_digests(F.col("__raw")).alias("hs"),
        F.array_distinct(F.col("__raw")).alias("sh"),
    )
    return raw.select(
        "doc_id",
        "sh",
        *[minhash_component(F.col("hs"), k).alias(f"h{k}") for k in range(4)],
    )


def dedup_near(
    docs: DataFrame,
    jaccard_threshold: float = NEAR_DUP_JACCARD,
    lsh_bucket_cap: int = LSH_BUCKET_CAP,
    sketch: DataFrame | None = None,
) -> DataFrame:
    """Remove near-duplicates: minhash/LSH candidates → exact Jaccard
    verify → drop the higher doc_id of each verified pair. Everything is
    equi-joins over materialized sketches — O(n + candidates).

    Band buckets larger than ``lsh_bucket_cap`` are dropped before the
    self-join (a degenerate band key squares the candidate set — the
    round-1 100x dup-heavy probe grew 44.8x without this). Oversized
    buckets hold exact/boilerplate duplicates that ``dedup_exact``
    already owns; the drop count is logged.

    ``sketch``: optional precomputed ``neardup_sketch`` rows for a
    SUPERSET of ``docs`` (e.g. the build-once full-corpus artifact) —
    the sketch of a doc is a pure function of its text, so restricting
    the superset sketch to ``docs``'s ids is value-identical to
    re-sketching ``docs``, and the per-call tokenize+shingle+digest
    pass (the dominant dedup_near cost: ~5 s of the sf1
    x_pipeline_report profile) collapses to one doc_id semi-join.
    Bucket caps and candidate pairs are still computed strictly within
    ``docs``'s scope, so results are unchanged."""
    # One slim pinned frame carries both the shingle sets (verify
    # stage) and the minhash signature (band stage). r14: previously
    # TWO pins — sk carrying the full 32-hex digest arrays and a
    # second sig pin derived from it; folding the signature into the
    # sketch projection drops the digest payload from the checkpoint
    # entirely (digests are consumed inside the projection).
    if sketch is not None:
        sk = materialize(
            sketch.join(docs.select("doc_id"), "doc_id", "left_semi")
        )
    else:
        sk = materialize(neardup_sketch(docs))
    sig = sk
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
    # The drop-count log line costs one extra action per call; only
    # pay it when someone is listening (the pin materializes either
    # way, at the first real action).
    if logger.isEnabledFor(logging.INFO):
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
