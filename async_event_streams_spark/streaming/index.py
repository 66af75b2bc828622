"""Streaming inverted-index maintenance: x_inverted_index's posting
table kept current over a document stream through the mv delta-log
discipline.

Posting state is additive by (term, doc_id): each micro-batch
tokenizes ONLY its own documents into (term, doc_id, tf) partials;
the merge sums tf per key (a re-posted doc_id adds, matching what
re-tokenizing the union would produce for distinct doc ids — the
contract is append-only document arrival, the corpus-ingest shape).
Compaction folds the delta log without changing any posting (additive
merge), and the SNAPSHOT lays the merged postings out exactly like
the batch query: block-partitioned per (term, doc block), df/cf and
the md5 over the ordered "doc_id:tf" list — so stream==batch is
asserted on the INDEX CONTENT, md5s included, not just counts.

Scale: per batch the work is one tokenize + (term, doc)-keyed partial
agg over the batch's documents; state is postings-sized (the index
itself — there is no cheaper faithful state); the snapshot reads slim
posting rows and never re-tokenizes history. The block layout keeps
the heaviest snapshot group bounded by block width at any term
frequency (the batch query's argument).

Stream==batch asserted wave-by-wave in tests/test_streaming_index.py,
including a term whose postings SPAN batches, across compaction and a
restart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens
from .mv import mv_rollup_pipe, mv_snapshot
from .state import state_dirs

BLOCK = 200  # docs per posting block (x_inverted_index's layout)


def _posting_rollup(df: DataFrame) -> DataFrame:
    return (
        df.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def _posting_merge(partials: DataFrame) -> DataFrame:
    return partials.groupBy("term", "doc_id").agg(
        F.sum("tf").cast("long").alias("tf")
    )


def index_pipe(source, state_dir: str, name: str = "invindex", compact_every=None):
    """Maintain (term, doc_id, tf) posting partials over a document
    stream (rows need doc_id + text). Returns the PipeHandle."""
    return mv_rollup_pipe(
        source,
        state_dir,
        name=name,
        compact_every=compact_every,
        rollup_fn=_posting_rollup,
        merge_fn=_posting_merge,
    )


def _blocks(tf: DataFrame) -> DataFrame:
    return tf.groupBy(
        "term",
        F.expr(f"CAST(doc_id DIV {BLOCK} AS BIGINT)").alias("block_id"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("df_block"),
        F.sum("tf").cast("long").alias("cf_block"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "tf"))),
                    lambda s: F.concat_ws(
                        ":", s.doc_id.cast("string"), s.tf.cast("string")
                    ),
                ),
                " ",
            ).cast("binary")
        ).alias("postings_md5"),
    )


def postings_snapshot(spark: SparkSession, state_dir: str) -> DataFrame:
    """The CURRENT merged (term, doc_id, tf) posting table — the
    index-table input the BM25 serving path (queries.llm.bm25_search)
    consumes directly."""
    if not state_dirs(state_dir):
        return spark.createDataFrame([], "term string, doc_id long, tf long")
    return mv_snapshot(spark, state_dir, merge_fn=_posting_merge)


def index_snapshot(spark: SparkSession, state_dir: str) -> DataFrame:
    """The CURRENT block-partitioned index over every document seen."""
    if not state_dirs(state_dir):
        return spark.createDataFrame(
            [],
            "term string, block_id long, df_block long, cf_block long,"
            " postings_md5 string",
        )
    return _blocks(mv_snapshot(spark, state_dir, merge_fn=_posting_merge))


def index_batch_twin(docs: DataFrame) -> DataFrame:
    """The one-shot batch index over the same documents."""
    return _blocks(_posting_rollup(docs))
