"""Streaming near-dedup: the batch `pipelines.dedup_near` semantics
(minhash/LSH candidates → exact Jaccard verify → drop the later copy)
run as a pipe, with the corpus's sketches as an incremental on-disk
state table.

Batch semantics being mirrored (pipelines.py::dedup_near): a document
is dropped iff ANY earlier document — kept or itself dropped — verifies
at Jaccard ≥ threshold with it. "Earlier" here is arrival order
(event_id), which equals the batch's doc_id order when producers
publish in id order. Because dropped documents still shadow later ones,
every batch document's sketch is appended to state, survivor or not.

Scale shape: per micro-batch, the batch's band rows (2 per doc)
equi-join the accumulated band table — the LSH reduction, never
all-pairs — then one Jaccard verify on the candidates. State is
parquet, one directory per micro-batch, same replay discipline as
`streaming/dedup.py`: batch N overwrites its own dir and probes only
batches < N, so a crash replay reproduces the original survivor set and
the pipe's txn header refuses the double-publish. At cluster scale the
state is a partitioned table bucketed by band key; compact
periodically.

Per-prefix cap caveat: the degenerate-bucket guard (`cap_buckets`)
sees only the state accumulated so far, so a bucket that exceeds the
cap only at full-corpus scale may admit earlier pairs a batch run over
the final corpus would have dropped. Equality with the batch result
holds whenever no bucket crosses the cap mid-stream (the common case —
oversized buckets are boilerplate that exact-dedup upstream owns).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..functions.text import minhash_component, shingle_digests, shingles, tokens
from .state import reject_partitioned_source
from .state import state_dirs as _state_dirs


def _band_rows(df, text_col: str, ord_col: str):
    """(ord, id_cols..., sh, bi, bk): two LSH band rows per document —
    the same 4-component/2-band minhash construction as
    pipelines.dedup_near, so stream and batch agree on candidates."""
    toks = tokens(F.col(text_col))
    sk = df.withColumn("__hs", shingle_digests(shingles(toks))).withColumn(
        "sh", F.array_distinct(shingles(toks))
    )
    sig = sk.select(
        "*", *[minhash_component(F.col("__hs"), k).alias(f"__h{k}") for k in range(4)]
    )
    return (
        sig.select(
            "*",
            F.explode(
                F.array(
                    F.struct(
                        F.lit(0).alias("bi"), F.concat("__h0", "__h1").alias("bk")
                    ),
                    F.struct(
                        F.lit(1).alias("bi"), F.concat("__h2", "__h3").alias("bk")
                    ),
                )
            ).alias("__band"),
        )
        .select(
            F.col(ord_col).alias("ord"),
            *[c for c in df.columns if c != ord_col],
            "sh",
            F.col("__band.bi").alias("bi"),
            F.col("__band.bk").alias("bk"),
        )
    )


def minhash_dedup_pipe(
    source,
    target,
    state_dir: str,
    text_col: str = "text",
    jaccard_threshold: float = 0.8,
    lsh_bucket_cap: int = 64,
    name: str = "neardedup",
):
    """Wire `source` → near-dedup → `target`: each micro-batch drops
    documents that Jaccard-verify (≥ threshold) against any earlier
    document — in the accumulated state or earlier in the same batch —
    and appends every batch document's band/sketch rows to the state.
    Returns the PipeHandle."""
    from ..topics.pipe import pipe
    from ..util import cap_buckets, materialize

    reject_partitioned_source(source, "minhash_dedup_pipe")
    os.makedirs(state_dir, exist_ok=True)

    def dedup_batch(df, batch_id: int):
        from ..topics.topic import ENVELOPE_NAMES

        spark = df.sparkSession
        payload_cols = [c for c in df.columns if c not in ENVELOPE_NAMES]
        batch = materialize(
            _band_rows(
                df.select("event_id", "source_event_id", *payload_cols),
                text_col,
                "event_id",
            )
        )
        prior = _state_dirs(state_dir, batch_id)
        state = (
            spark.read.parquet(*prior).select("ord", "sh", "bi", "bk")
            if prior
            else None
        )
        pool = (
            batch.select("ord", "sh", "bi", "bk").unionByName(state)
            if state is not None
            else batch.select("ord", "sh", "bi", "bk")
        )
        pool = cap_buckets(pool, ["bi", "bk"], lsh_bucket_cap)
        a, b = pool.alias("a"), batch.alias("b")
        inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
        union = F.size("a.sh") + F.size("b.sh") - inter
        dropped = (
            a.join(
                b,
                (F.col("a.bi") == F.col("b.bi"))
                & (F.col("a.bk") == F.col("b.bk"))
                & (F.col("a.ord") < F.col("b.ord")),
            )
            .filter(inter.cast("double") / union >= jaccard_threshold)
            .select(F.col("b.ord").alias("ord"))
            .distinct()
        )
        survivors = materialize(
            batch.filter(F.col("bi") == 0)  # one row per doc again
            .drop("bi", "bk", "sh")
            .join(dropped, "ord", "left_anti")
        )
        (
            batch.select("ord", "sh", "bi", "bk")
            .write.mode("overwrite")  # replay-safe: batch N owns its dir
            .parquet(os.path.join(state_dir, f"batch={batch_id}"))
        )
        # ord was event_id; the pipe's envelope filter keeps
        # source_event_id lineage + payload for the republish
        return survivors.drop("ord")

    return pipe(source, fn=dedup_batch, target=target, name=name)
