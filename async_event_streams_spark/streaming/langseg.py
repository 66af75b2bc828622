"""Streaming language-segment maintenance: the `x_lang_segments`
code-switch report (queries/llm.py) maintained incrementally as
documents arrive — the r13-verdict follow-on to the batch query
("a streaming twin for x_lang_segments", VERDICT r12 #7).

Streaming shape: a document arrives WHOLE (the documents-table
contract — doc_ids unique across the stream), so the per-doc report
is STATELESS at arrival: sentence split → per-sentence LID → segment
collapse → one report row, computed once on the micro-batch and never
revisited. The delta-log state (streaming/mv.py discipline) is the
REPORT ITSELF — |docs|-sized slim rows; the text is never retained.
That is the 100 TB deployment story: classify on ingest, store only
the per-doc mixing report, and the corpus dashboard is a slim rollup
over it at serving time.

Merge is DISTINCT: a replayed batch reproduces bit-identical report
rows (the kernel is deterministic), so like MIN/set-union state this
is the idempotent exactly-once family — compaction and crash replay
provably cannot change the snapshot.

`lang_segment_report` below is the ONE canonical kernel — the
registered x_lang_segments (queries/llm.py) delegates to it, so
stream and batch agree by shared code rather than by a copied twin
(lexicons live in functions/text.py). tests/test_streaming_langseg.py
asserts bit-equality against the registered query on both the
driver's documents table and a constructed code-switched corpus,
wave-by-wave stream==batch equality, and equality across compaction
and a full pipe restart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .mv import mv_rollup_pipe, mv_snapshot
from .state import state_dirs

_REPORT_SCHEMA = (
    "doc_id long, n_sentences long, n_segments long, "
    "primary_lang string, minority_ppm long, mixed boolean"
)


def lang_segment_report(docs: DataFrame) -> DataFrame:
    """(doc_id, text) → the per-doc code-switch report — THE kernel
    behind x_lang_segments (queries/llm.py delegates here): sentence
    split on [.!?]+ with empties dropped, per-sentence stopword-lexicon
    argmax (ties break by lexicon order, zero hits → 'unknown'),
    consecutive same-language sentences collapsed to segments, and
    the per-doc report (sentence count, segment count, majority
    language with count ties broken by lexicon order, minority
    sentence share as an integer-DIV ppm, mixed flag). A doc whose
    text has no non-empty sentences produces NO row (the posexplode
    contract)."""
    from ..functions.text import LEXICONS as _LEXICONS
    from ..functions.text import stopword_count, tokens

    sents = docs.select(
        "doc_id",
        F.posexplode(
            F.filter(
                F.transform(
                    F.split(F.col("text"), r"[.!?]+"),
                    lambda s: F.trim(s),
                ),
                lambda s: s != "",
            )
        ).alias("i", "s"),
    )
    toks = tokens(F.col("s"))
    scored = sents.select(
        "doc_id",
        "i",
        *[
            stopword_count(toks, lex).alias(f"sc_{lg}")
            for lg, lex in _LEXICONS.items()
        ],
    )
    m = F.greatest(*[F.col(f"sc_{lg}") for lg in _LEXICONS])
    lang = F.when(m == 0, F.lit("unknown"))
    for lg in _LEXICONS:
        lang = lang.when(F.col(f"sc_{lg}") == m, F.lit(lg))
    slang = scored.select("doc_id", "i", lang.alias("lang"))
    w = Window.partitionBy("doc_id").orderBy("i")
    seg = (
        slang.withColumn("prev", F.lag("lang").over(w))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sentences"),
            (
                F.lit(1)
                + F.sum(
                    F.when(
                        F.col("prev").isNotNull()
                        & (F.col("lang") != F.col("prev")),
                        1,
                    ).otherwise(0)
                )
            )
            .cast("long")
            .alias("n_segments"),
            F.countDistinct(
                F.when(F.col("lang") != "unknown", F.col("lang"))
            )
            .cast("long")
            .alias("n_langs"),
        )
    )
    prio = F.when(F.lit(False), F.lit(0))
    for idx, lg in enumerate(_LEXICONS):
        prio = prio.when(F.col("lang") == lg, F.lit(idx))
    prio = prio.otherwise(F.lit(len(_LEXICONS)))
    wp = Window.partitionBy("doc_id").orderBy(F.desc("c"), prio.asc())
    primary = (
        slang.groupBy("doc_id", "lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("primary_lang"), "c")
    )
    return seg.join(primary, "doc_id").select(
        "doc_id",
        "n_sentences",
        "n_segments",
        "primary_lang",
        F.expr(
            "((n_sentences - c) * CAST(1000000 AS BIGINT)) DIV n_sentences"
        )
        .cast("long")
        .alias("minority_ppm"),
        (F.col("n_langs") >= 2).alias("mixed"),
    )


def _merge(partials: DataFrame) -> DataFrame:
    # idempotent: a replayed doc reproduces its identical report row
    return partials.distinct()


def lang_segments_pipe(
    source,
    state_dir: str,
    name: str = "lang-segments",
    compact_every: int | None = None,
):
    """Maintain the per-doc code-switch report over a document stream
    (doc_id, text, ...). Returns the PipeHandle. State per batch is
    report rows only — text never persists past its micro-batch."""
    return mv_rollup_pipe(
        source,
        state_dir,
        name=name,
        compact_every=compact_every,
        rollup_fn=lambda df: lang_segment_report(
            df.select("doc_id", "text")
        ),
        merge_fn=_merge,
    )


def lang_segments_snapshot(spark: SparkSession, state_dir: str) -> DataFrame:
    """The CURRENT per-doc report over every document seen so far —
    bit-equal to running x_lang_segments over the same corpus."""
    if not state_dirs(state_dir):
        return spark.createDataFrame([], _REPORT_SCHEMA)
    return mv_snapshot(spark, state_dir, merge_fn=_merge)


def lang_mix_rollup(report: DataFrame) -> DataFrame:
    """The corpus dashboard over a per-doc report: per primary
    language — doc count, code-switched doc count, mixed share and
    mean contamination in ppm (integer DIV, deterministic). Serving-
    side aggregation over |docs| slim rows; the same function rolls
    up the streaming snapshot and the batch report, so the dashboards
    are comparable by construction."""
    return (
        report.groupBy("primary_lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("mixed"), 1).otherwise(0))
            .cast("long")
            .alias("n_mixed"),
            F.sum("minority_ppm").cast("long").alias("__ppm_sum"),
        )
        .select(
            "primary_lang",
            "n_docs",
            "n_mixed",
            F.expr("(n_mixed * CAST(1000000 AS BIGINT)) DIV n_docs")
            .cast("long")
            .alias("mixed_ppm"),
            F.expr("__ppm_sum DIV n_docs")
            .cast("long")
            .alias("mean_minority_ppm"),
        )
    )


def lang_mix_snapshot(spark: SparkSession, state_dir: str) -> DataFrame:
    """The CURRENT corpus code-switch dashboard."""
    if not state_dirs(state_dir):
        return spark.createDataFrame(
            [],
            "primary_lang string, n_docs long, n_mixed long, "
            "mixed_ppm long, mean_minority_ppm long",
        )
    return lang_mix_rollup(lang_segments_snapshot(spark, state_dir))
