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
The exact divergence is a TESTED contract, not just a comment:
`tests/test_streaming_advanced.py::test_neardedup_cap_divergence_is_exactly_the_under_cap_admits`
constructs a cap-crossing corpus and asserts the streaming-minus-batch
difference is precisely the pairs admitted while the bucket was still
under the cap.

`windowed_minhash_dedup_pipe` is the BOUNDED-STATE variant (SURVEY §9b
candidate (b), r3 VERDICT item 3): duplicates only count within an
event-time horizon, which is what lets state be pruned — the unbounded
seen-set becomes a sliding window whose size tracks the horizon's data
rate, not corpus size.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..functions.text import minhash_component, shingle_digests, shingles, tokens
from .state import recover_compaction, compact_state, reject_partitioned_source
from .state import state_dirs as _state_dirs


def _dir_maxet(spark, path: str, memo: dict[str, int]) -> int | None:
    """Max `__et` in a state dir, from parquet footer statistics when
    available (no Spark job), memoized per dir. Any row group WITHOUT
    min/max stats forces a one-off Spark max(__et) scan of the dir — a
    partial-stats max could UNDERSTATE the true max and prune a dir
    still holding in-horizon rows, and returning None would silently
    degrade the bounded-state guarantee back to unbounded growth
    (ADVICE r5). Only if the fallback scan itself fails is None
    returned, with a RuntimeWarning so the operator sees the pruning
    stall."""
    got = memo.get(path)
    if got is not None:
        return got
    import pyarrow.parquet as pq

    hi: int | None = None
    partial = False
    try:
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(path, f))
            idx = md.schema.names.index("__et")
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is not None and st.has_min_max:
                    v = int(st.max)
                    hi = v if hi is None else max(hi, v)
                else:
                    partial = True
    except (OSError, ValueError):
        partial = True
    if partial:
        try:
            row = spark.read.parquet(path).agg(F.max("__et")).head()
            hi = None if row is None or row[0] is None else int(row[0])
        except Exception:
            import warnings

            warnings.warn(
                "windowed_minhash_dedup_pipe: cannot determine "
                f"max __et for {path}; dir not pruned this batch",
                RuntimeWarning,
                stacklevel=2,
            )
            return None
    if hi is not None:
        memo[path] = hi
    return hi


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
    compact_every: int | None = None,
):
    """Wire `source` → near-dedup → `target`: each micro-batch drops
    documents that Jaccard-verify (≥ threshold) against any earlier
    document — in the accumulated state or earlier in the same batch —
    and appends every batch document's band/sketch rows to the state.
    Returns the PipeHandle.

    `compact_every=K` folds the per-batch sketch dirs every K batches
    (committed-batch watermark: everything below the current batch id
    is committed, so the merge can't swallow a replayable batch's own
    rows). NOTE the cap caveat above: compaction merges DIRS, it does
    not re-evaluate `cap_buckets` — the per-prefix divergence contract
    pinned by the cap test is unchanged by compaction."""
    from ..topics.pipe import pipe
    from ..util import cap_buckets, materialize

    reject_partitioned_source(source, "minhash_dedup_pipe")
    os.makedirs(state_dir, exist_ok=True)
    recover_compaction(state_dir)  # crash-interrupted swap, if any

    def dedup_batch(df, batch_id: int):
        from ..topics.topic import ENVELOPE_NAMES

        spark = df.sparkSession
        if compact_every and batch_id and batch_id % compact_every == 0:
            compact_state(spark, state_dir, upto_batch=batch_id)
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


def windowed_minhash_dedup_pipe(
    source,
    target,
    state_dir: str,
    horizon_sec: int,
    text_col: str = "text",
    time_col: str = "et",
    jaccard_threshold: float = 0.8,
    lsh_bucket_cap: int = 64,
    name: str = "wneardedup",
):
    """Near-dedup bounded by an EVENT-TIME horizon: a document is
    dropped iff some earlier-arriving document within `horizon_sec` of
    its event time Jaccard-verifies at >= threshold (dropped documents
    still shadow later ones, like the batch semantics). Because matches
    beyond the horizon don't count, state needs only a sliding window
    of sketches — the watermark contract that keeps a 100 TB streaming
    dedup's state proportional to the horizon's data rate instead of
    corpus size (the unbounded seen-set is `minhash_dedup_pipe`).

    This is the engine's answer to SURVEY §8-H5: the reference buffers
    without bound and its only flow control is the send barrier
    (/root/reference/src/event_queue.rs:8, src/lib.rs:44-52); at scale
    we must NOT replicate that, so the horizon contract is what turns
    the naturally-unbounded dedup seen-set into bounded state.

    Watermark mechanics (mirrors Spark's `withWatermark` contract,
    allowed lateness = horizon): watermark W = max event time seen -
    horizon; rows arriving with event time older than W may be deduped
    nondeterministically (exactly the rows Spark would drop). State
    dirs whose max event time falls behind W - horizon (= maxET -
    2*horizon) can no longer match any in-contract arrival and are
    DELETED after each batch — per-dir max event times come from the
    parquet footers (driver metadata reads, no Spark job), memoized per
    dir. Pruning is therefore replay-safe for in-contract data: a
    replayed batch joins against a superset of the state that can
    match it, and the horizon predicate discards the rest.

    `time_col` is a payload column (timestamp or numeric seconds).
    Returns the PipeHandle."""
    from ..topics.pipe import pipe
    from ..util import cap_buckets, materialize

    reject_partitioned_source(source, "windowed_minhash_dedup_pipe")
    os.makedirs(state_dir, exist_ok=True)
    recover_compaction(state_dir)  # crash-interrupted swap, if any
    maxet_memo: dict[str, int] = {}  # state-dir path -> max __et

    def dedup_batch(df, batch_id: int):
        import shutil

        from ..topics.topic import ENVELOPE_NAMES

        spark = df.sparkSession
        payload_cols = [c for c in df.columns if c not in ENVELOPE_NAMES]
        batch = materialize(
            _band_rows(
                df.select("event_id", "source_event_id", *payload_cols),
                text_col,
                "event_id",
            ).withColumn("__et", F.col(time_col).cast("long"))
        )
        prior = _state_dirs(state_dir, batch_id)
        cols = ["ord", "sh", "bi", "bk", "__et"]
        pool = batch.select(*cols)
        if prior:
            pool = pool.unionByName(spark.read.parquet(*prior).select(*cols))
        pool = cap_buckets(pool, ["bi", "bk"], lsh_bucket_cap)
        a, b = pool.alias("a"), batch.alias("b")
        inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
        union = F.size("a.sh") + F.size("b.sh") - inter
        dropped = (
            a.join(
                b,
                (F.col("a.bi") == F.col("b.bi"))
                & (F.col("a.bk") == F.col("b.bk"))
                & (F.col("a.ord") < F.col("b.ord"))
                # the horizon predicate — matches beyond it don't count,
                # which is exactly what makes pruned state irrelevant
                & (F.abs(F.col("b.__et") - F.col("a.__et")) <= horizon_sec),
            )
            .filter(inter.cast("double") / union >= jaccard_threshold)
            .select(F.col("b.ord").alias("ord"))
            .distinct()
        )
        survivors = materialize(
            batch.filter(F.col("bi") == 0)
            .drop("bi", "bk", "sh", "__et")
            .join(dropped, "ord", "left_anti")
        )
        own_dir = os.path.join(state_dir, f"batch={batch_id}")
        (
            batch.select(*cols)
            .write.mode("overwrite")  # replay-safe: batch N owns its dir
            .parquet(own_dir)
        )
        maxet_memo.pop(own_dir, None)  # overwrite invalidates the memo
        # Advance the watermark and prune: global max event time is the
        # max over current dirs (the dir holding it is never prunable).
        dirs = _state_dirs(state_dir, batch_id + 1)
        maxets = {d: _dir_maxet(spark, d, maxet_memo) for d in dirs}
        known = [v for v in maxets.values() if v is not None]
        if known:
            cutoff = max(known) - 2 * horizon_sec
            for d, hi in maxets.items():
                if d != own_dir and hi is not None and hi < cutoff:
                    shutil.rmtree(d, ignore_errors=True)
                    maxet_memo.pop(d, None)
        return survivors.drop("ord")

    return pipe(source, fn=dedup_batch, target=target, name=name)
