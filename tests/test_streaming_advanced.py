"""Advanced streaming conformance: checkpoint restart recovery,
stream-stream joins with time bounds, and streaming dedup."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from async_event_streams_spark.streaming import run_stream_to_memory
from async_event_streams_spark.topics import Topic, TopicRegistry, pipe


@pytest.fixture()
def topic_root(tmp_path):
    return str(tmp_path / "topics")


def test_pipe_restart_resumes_from_checkpoint(spark, topic_root):
    """Stop a pipe mid-stream and restart it with the same name: the
    checkpoint (plus the source's readBetweenOffsets replay) must give
    every event exactly once across the two incarnations."""
    reg = TopicRegistry()
    t = Topic(spark, "restart", "n long", topic_root, reg)
    seen: list[int] = []
    sink_fn = lambda df, b: seen.extend(r.n for r in df.collect())  # noqa: E731

    h1 = pipe(t, sink_fn=sink_fn, name="resumable")
    t.send([{"n": i} for i in range(10)])
    h1.stop()

    t.post([{"n": i} for i in range(10, 20)])  # published while down

    # same pipe name -> same checkpoint; subscribe offsets come from the
    # checkpoint, not from the fresh "latest" subscription point
    h2 = pipe(t, sink_fn=sink_fn, name="resumable")
    try:
        t.barrier()
        assert sorted(seen) == list(range(20)), sorted(seen)
        assert len(seen) == 20  # exactly once, no replay duplicates
    finally:
        t.close()


def test_pipe_replay_publishes_exactly_once(spark, topic_root):
    """Simulated crash replay: delete the pipe's latest checkpoint
    commit so the restarted query re-runs its last batch. The txn
    header in the target topic must dedupe the re-publish — downstream
    sees every event exactly once."""
    import glob
    import os

    reg = TopicRegistry()
    src = Topic(spark, "eo_src", "n long", topic_root, reg)
    dst = Topic(spark, "eo_dst", "n long", topic_root, reg)
    h = pipe(
        src,
        fn=lambda df: df.select("source_event_id", "n"),
        target=dst,
        name="eo-pipe",
    )
    src.send([{"n": i} for i in range(10)], barrier="chain")
    h.stop()

    # forge the crash: the last batch is now "uncommitted"
    commit_dir = os.path.join(src.dir, "_checkpoints", "eo-pipe", "commits")
    real_commits = sorted(
        c
        for c in glob.glob(os.path.join(commit_dir, "*"))
        if not c.endswith((".tmp", ".crc"))
    )
    last = real_commits[-1]
    os.remove(last)
    # remove the checksum sidecar too, or the restarted run treats the
    # mismatch as another query using its checkpoint
    crc = os.path.join(commit_dir, f".{os.path.basename(last)}.crc")
    if os.path.exists(crc):
        os.remove(crc)

    h2 = pipe(
        src,
        fn=lambda df: df.select("source_event_id", "n"),
        target=dst,
        name="eo-pipe",
    )
    try:
        src.send([{"n": 10}], barrier="chain")
        rows = [r.n for r in dst.batch_df().collect()]
        assert sorted(rows) == list(range(11)), sorted(rows)
        assert len(rows) == 11  # the replayed batch did NOT re-publish
    finally:
        src.close()
        dst.close()


def test_pipe_bulk_republish_skips_driver(spark, topic_root):
    """A batch above bulk_threshold must republish via post_df — the
    target segment holds only a txn header + bulk marker (executors
    wrote the payload parquet), and lineage/event ids stay intact."""
    import glob
    import json
    import os

    reg = TopicRegistry()
    src = Topic(spark, "bulk_src", "n long", topic_root, reg)
    dst = Topic(spark, "bulk_dst", "n long", topic_root, reg)
    h = pipe(
        src,
        fn=lambda df: df.select("source_event_id", "n"),
        target=dst,
        name="bulk-pipe",
        bulk_threshold=5,
    )
    try:
        src.send([{"n": i} for i in range(20)], barrier="chain")
        rows = dst.batch_df().collect()
        assert sorted(r.n for r in rows) == list(range(20))
        # lineage survived the bulk path
        assert all(r.source_event_id is not None for r in rows)
        # the dst log contains a bulk marker with the pipe's txn header,
        # and no inline event rows for those 20 events
        segs = sorted(glob.glob(os.path.join(dst.dir, "segment-*.jsonl")))
        recs = [
            json.loads(line)
            for s in segs
            for line in open(s)
            if line.strip()
        ]
        assert any(r.get("__txn__", "").startswith("bulk-pipe:") for r in recs)
        bulk = [r for r in recs if r.get("__bulk__")]
        assert len(bulk) == 1 and bulk[0]["n"] == 20
        assert not any("event_id" in r for r in recs)
    finally:
        h.stop()
        src.close()
        dst.close()


def test_stream_stream_join_with_time_bounds(spark, topic_root):
    """Two topic streams joined on key with a time-bound condition and
    watermarks — the streaming as-of building block (SURVEY.md §2-C)."""
    reg = TopicRegistry()
    clicks = Topic(spark, "clicks", "user long, cts string", topic_root, reg)
    buys = Topic(spark, "buys", "user long, bts string", topic_root, reg)

    c = (
        clicks.subscribe()
        .select("user", F.col("cts").cast("timestamp").alias("click_time"))
        .withWatermark("click_time", "1 hour")
    )
    b = (
        buys.subscribe()
        .select(
            F.col("user").alias("buyer"),
            F.col("bts").cast("timestamp").alias("buy_time"),
        )
        .withWatermark("buy_time", "1 hour")
    )
    joined = c.join(
        b,
        (F.col("user") == F.col("buyer"))
        & (F.col("buy_time") >= F.col("click_time"))
        & (F.col("buy_time") <= F.col("click_time") + F.expr("INTERVAL 30 minutes")),
    ).select("user", "click_time", "buy_time")

    query, tbl = run_stream_to_memory(joined, output_mode="append")
    clicks.attach_query(query)
    buys.attach_query(query)
    try:
        clicks.post(
            [
                {"user": 1, "cts": "2024-03-01T10:00:00"},
                {"user": 2, "cts": "2024-03-01T10:00:00"},
            ]
        )
        buys.post(
            [
                {"user": 1, "bts": "2024-03-01T10:10:00"},  # within 30min -> match
                {"user": 2, "bts": "2024-03-01T11:30:00"},  # too late -> no match
            ]
        )
        clicks.barrier()
        buys.barrier()
        rows = spark.sql(f"SELECT user FROM {tbl}").collect()
        assert [r.user for r in rows] == [1], rows
    finally:
        clicks.close()
        buys.close()


def test_streaming_drop_duplicates(spark, topic_root):
    """dropDuplicates on a stream: re-published events (same key) are
    suppressed across micro-batches — state carries between batches."""
    reg = TopicRegistry()
    t = Topic(spark, "dd", "k long, v string", topic_root, reg)
    stream = t.subscribe().select("k", "v").dropDuplicates(["k"])
    query, tbl = run_stream_to_memory(stream, output_mode="append")
    t.attach_query(query)
    try:
        t.send([{"k": 1, "v": "a"}, {"k": 2, "v": "b"}])
        t.send([{"k": 1, "v": "a-again"}, {"k": 3, "v": "c"}])  # k=1 is a dup
        rows = {r.k: r.v for r in spark.sql(f"SELECT * FROM {tbl}").collect()}
        assert set(rows) == {1, 2, 3}
        assert rows[1] == "a"  # first arrival wins
    finally:
        t.close()


def test_streaming_dedup_pipe_equals_batch(spark, topic_root):
    """VERDICT r2 item 7: an LLM-pipeline operator (exact dedup) run as
    the reference's pipe composition, with the seen-hash set as an
    incremental on-disk artifact table. The accumulated streaming output
    after each barrier must equal the batch x_dedup_exact semantics over
    everything published so far: one survivor per distinct text, the
    earliest occurrence, regardless of how the input was split into
    micro-batches."""
    from async_event_streams_spark.streaming import exact_dedup_pipe

    reg = TopicRegistry()
    docs = Topic(spark, "dd_docs", "doc_id long, text string", topic_root, reg)
    uniq = Topic(spark, "dd_uniq", "doc_id long, text string", topic_root, reg)
    h = exact_dedup_pipe(
        docs, uniq, state_dir=f"{topic_root}/dedup-state", name="dd-pipe"
    )
    try:
        # 3 waves with duplicates inside a wave, across waves, and
        # texts reappearing after a gap
        waves = [
            [(0, "alpha"), (1, "beta"), (2, "alpha")],
            [(3, "beta"), (4, "gamma"), (5, "gamma"), (6, "delta")],
            [(7, "alpha"), (8, "epsilon"), (9, "delta"), (10, "zeta")],
        ]
        published: list[tuple[int, str]] = []
        for wave in waves:
            docs.send(
                [{"doc_id": i, "text": t} for i, t in wave], barrier="chain"
            )
            published.extend(wave)
            # batch spec: first doc_id per distinct text, in publish order
            expect = {}
            for i, t in published:
                expect.setdefault(t, i)
            got = {
                r.text: r.doc_id
                for r in uniq.batch_df().select("doc_id", "text").collect()
            }
            assert got == {t: i for t, i in expect.items()}, got
        # lineage survived the dedup transform (pipe auto-causality)
        assert all(
            r.source_event_id is not None
            for r in uniq.batch_df().select("source_event_id").collect()
        )
    finally:
        h.stop()
        docs.close()
        uniq.close()


def test_streaming_neardedup_pipe_equals_batch(spark, topic_root):
    """Streaming minhash/LSH near-dedup with incremental sketch state
    must equal the batch pipelines.dedup_near over everything published
    so far (same band construction, same Jaccard verify, same
    drop-the-later-copy semantics) after every barrier — including
    exact dups, near dups (one-token edits), and cross-wave shadowing
    by documents that were themselves dropped."""
    from async_event_streams_spark.pipelines import dedup_near
    from async_event_streams_spark.streaming import minhash_dedup_pipe

    base = "the quick brown fox jumps over the lazy dog tonight"
    other = "completely different words about spark streaming engines here now"
    texts = {
        0: base,
        1: base + " extra",  # near-dup of 0
        2: other,
        3: base,  # exact dup of 0 (0 already shadowed 1 -> both drop)
        4: other + " indeed",  # near-dup of 2
        5: "unrelated third topic sentence with its own tokens entirely fresh",
    }
    waves = [[0, 1, 2], [3, 4], [5]]

    reg = TopicRegistry()
    docs = Topic(spark, "nd_docs", "doc_id long, text string", topic_root, reg)
    uniq = Topic(spark, "nd_uniq", "doc_id long, text string", topic_root, reg)
    h = minhash_dedup_pipe(
        docs, uniq, state_dir=f"{topic_root}/nd-state", name="nd-pipe"
    )
    try:
        published: list[int] = []
        for wave in waves:
            docs.send(
                [{"doc_id": i, "text": texts[i]} for i in wave], barrier="chain"
            )
            published += wave
            bdf = spark.createDataFrame(
                [(i, texts[i]) for i in published], "doc_id long, text string"
            )
            want = sorted(r.doc_id for r in dedup_near(bdf, 0.8).collect())
            got = sorted(
                r.doc_id for r in uniq.batch_df().select("doc_id").collect()
            )
            assert got == want, (got, want)
        assert got == [0, 2, 5]  # the expected survivor set, explicitly
    finally:
        h.stop()
        docs.close()
        uniq.close()


def test_compact_state_preserves_dedup_across_restart(spark, topic_root):
    """compact_state folds the per-batch state dirs into one (keyed by
    the minimum index, so future probes idx < batch_id still see it).
    Dedup semantics must be identical across stop -> compact -> restart:
    texts seen before compaction still dedup after it."""
    from async_event_streams_spark.streaming import (
        compact_state,
        exact_dedup_pipe,
        state_dirs,
    )

    reg = TopicRegistry()
    docs = Topic(spark, "cs_docs", "doc_id long, text string", topic_root, reg)
    uniq = Topic(spark, "cs_uniq", "doc_id long, text string", topic_root, reg)
    sdir = f"{topic_root}/cs-state"
    h = exact_dedup_pipe(docs, uniq, state_dir=sdir, name="cs-pipe")
    try:
        docs.send([{"doc_id": 0, "text": "aa"}, {"doc_id": 1, "text": "bb"}])
        docs.send([{"doc_id": 2, "text": "cc"}])
        docs.barrier(chain=True)
        n_dirs = len(state_dirs(sdir))
        assert n_dirs >= 2
        h.stop()
        merged = compact_state(spark, sdir, upto_batch=10_000)
        assert merged == n_dirs and len(state_dirs(sdir)) == 1

        h = exact_dedup_pipe(docs, uniq, state_dir=sdir, name="cs-pipe")
        docs.send(
            [
                {"doc_id": 3, "text": "aa"},  # dup of pre-compaction doc
                {"doc_id": 4, "text": "cc"},  # dup of pre-compaction doc
                {"doc_id": 5, "text": "dd"},  # novel
            ],
            barrier="chain",
        )
        got = sorted(r.doc_id for r in uniq.batch_df().select("doc_id").collect())
        assert got == [0, 1, 2, 5], got
    finally:
        h.stop()
        docs.close()
        uniq.close()


def test_stateful_pipes_reject_partitioned_source(spark, topic_root):
    """A PartitionedTopic source would drain as N pipes clobbering one
    state table — the stateful pipes must fail fast with guidance
    instead of corrupting state silently."""
    from async_event_streams_spark.streaming import (
        exact_dedup_pipe,
        ivf_index_pipe,
        minhash_dedup_pipe,
    )
    from async_event_streams_spark.topics import PartitionedTopic

    reg = TopicRegistry()
    src = PartitionedTopic(
        spark, "guard_src", "k string, text string", topic_root,
        key_col="k", num_partitions=2, registry=reg,
    )
    dst = Topic(spark, "guard_dst", "k string, text string", topic_root, reg)
    try:
        with pytest.raises(ValueError, match="single-FIFO"):
            exact_dedup_pipe(src, dst, state_dir=f"{topic_root}/g1")
        with pytest.raises(ValueError, match="single-FIFO"):
            minhash_dedup_pipe(src, dst, state_dir=f"{topic_root}/g2")
        with pytest.raises(ValueError, match="single-FIFO"):
            ivf_index_pipe(src, f"{topic_root}/g3", [[1.0]])
    finally:
        src.close()
        dst.close()


def test_partitioned_exact_dedup_pipes_content_keyed(spark, topic_root):
    """The sound scale-out dedup shape: a content-keyed PartitionedTopic
    (key == text) routes every copy of a text to one partition, so N
    per-partition dedup pipes with independent state give GLOBAL
    keep-first semantics — across waves and across partitions."""
    from async_event_streams_spark.streaming import partitioned_exact_dedup_pipes
    from async_event_streams_spark.topics import PartitionedTopic

    reg = TopicRegistry()
    src = PartitionedTopic(
        spark, "pk_docs", "text string, doc_id long", topic_root,
        key_col="text", num_partitions=3, registry=reg,
    )
    dst = Topic(spark, "pk_uniq", "text string, doc_id long", topic_root, reg)
    h = partitioned_exact_dedup_pipes(
        src, dst, state_root=f"{topic_root}/pk-state"
    )
    try:
        assert len(h) == 3
        waves = [
            [(0, "aa"), (1, "bb"), (2, "aa")],
            [(3, "cc"), (4, "bb"), (5, "dd")],
            [(6, "aa"), (7, "dd"), (8, "ee")],
        ]
        published: list[tuple[int, str]] = []
        for wave in waves:
            src.send(
                [{"doc_id": i, "text": t} for i, t in wave], barrier="chain"
            )
            published.extend(wave)
            expect = {}
            for i, t in published:
                expect.setdefault(t, i)
            got = {
                r.text: r.doc_id
                for r in dst.batch_df().select("doc_id", "text").collect()
            }
            assert got == expect, (got, expect)
    finally:
        h.stop()
        src.close()
        dst.close()


def test_streaming_dedup_null_text_dedups_across_batches(spark, topic_root):
    """ADVICE r4: sha2(null) is null and a plain equi-anti-join never
    matches null keys — a null-text document would re-publish every
    micro-batch. The null-safe join keeps exactly ONE null-text
    survivor, matching the batch twin's groupBy (nulls are one group)."""
    from async_event_streams_spark.streaming import exact_dedup_pipe

    reg = TopicRegistry()
    docs = Topic(spark, "ndd_docs", "doc_id long, text string", topic_root, reg)
    uniq = Topic(spark, "ndd_uniq", "doc_id long, text string", topic_root, reg)
    h = exact_dedup_pipe(
        docs, uniq, state_dir=f"{topic_root}/ndd-state", name="ndd-pipe"
    )
    try:
        docs.send(
            [{"doc_id": 0, "text": None}, {"doc_id": 1, "text": "a"}],
            barrier="chain",
        )
        docs.send(
            [{"doc_id": 2, "text": None}, {"doc_id": 3, "text": "b"}],
            barrier="chain",
        )
        docs.send([{"doc_id": 4, "text": None}], barrier="chain")
        got = sorted(
            (r.doc_id, r.text)
            for r in uniq.batch_df().select("doc_id", "text").collect()
        )
        assert got == [(0, None), (1, "a"), (3, "b")], got
    finally:
        h.stop()
        docs.close()
        uniq.close()


def test_partitioned_dedup_chain_barrier_reaches_downstream(spark, topic_root):
    """ADVICE r4: partitioned_exact_dedup_pipes must add the parent
    topic -> target registry edge, so barrier(chain=True) on the
    partitioned source also awaits the target's OWN downstream cascade
    (a second pipe off the dedup output)."""
    from async_event_streams_spark.streaming import partitioned_exact_dedup_pipes
    from async_event_streams_spark.topics import PartitionedTopic

    reg = TopicRegistry()
    src = PartitionedTopic(
        spark, "pkc_docs", "text string, doc_id long", topic_root,
        key_col="text", num_partitions=2, registry=reg,
    )
    mid = Topic(spark, "pkc_uniq", "text string, doc_id long", topic_root, reg)
    out = Topic(spark, "pkc_out", "text string, doc_id long", topic_root, reg)
    h1 = partitioned_exact_dedup_pipes(
        src, mid, state_root=f"{topic_root}/pkc-state"
    )
    h2 = pipe(mid, fn=lambda df: df.select("text", "doc_id"),
              target=out, name="pkc-downstream")
    try:
        src.send(
            [
                {"doc_id": 0, "text": "aa"},
                {"doc_id": 1, "text": "bb"},
                {"doc_id": 2, "text": "aa"},
            ],
            barrier="chain",
        )
        # chain barrier returned -> the SECOND hop must already be done
        got = sorted(
            (r.doc_id, r.text)
            for r in out.batch_df().select("doc_id", "text").collect()
        )
        assert got == [(0, "aa"), (1, "bb")], got
    finally:
        h2.stop()
        h1.stop()
        src.close()
        mid.close()
        out.close()


def test_windowed_neardedup_bounded_state_equals_batch_over_window(
    spark, topic_root
):
    """VERDICT r3 item 3: event-time-bounded streaming near-dedup. A
    document is dropped iff an earlier arrival within `horizon_sec` of
    its event time verifies as a near-dup (dropped docs still shadow).
    The accumulated output must match a pure-Python batch-over-window
    oracle after every wave, and the state directory count must stay
    BOUNDED (old dirs pruned once the watermark passes them) instead of
    growing with the corpus."""
    from async_event_streams_spark.streaming import (
        state_dirs,
        windowed_minhash_dedup_pipe,
    )

    A = "the quick brown fox jumps over the lazy dog tonight"
    B = "completely different words about spark streaming engines here now"
    C = "unrelated third topic sentence with its own tokens entirely fresh"
    HORIZON = 100
    # (doc_id, text, event-time seconds), in arrival order
    waves = [
        [(0, A, 1000), (1, B, 1010)],
        [(2, A, 1050), (3, B, 1200)],  # 2 dups 0 (dt=50); 3 outlives 1 (dt=190)
        [(4, A, 1130), (5, C, 1300)],  # 4 dups 2 (dt=80, a DROPPED doc shadows)
        [(6, A, 2000)],                # nearest A is 4 (dt=870) -> survives
        [(7, A, 2050)],                # dups 6 (dt=50) AFTER pruning
    ]

    def oracle(published):
        kept, log = [], []  # log: (text, et) of every arrival (shadowing)
        for i, txt, et in published:
            dup = any(t == txt and abs(et - e) <= HORIZON for t, e in log)
            log.append((txt, et))
            if not dup:
                kept.append(i)
        return kept

    reg = TopicRegistry()
    docs = Topic(spark, "wnd_docs", "doc_id long, text string, et long",
                 topic_root, reg)
    uniq = Topic(spark, "wnd_uniq", "doc_id long, text string, et long",
                 topic_root, reg)
    sdir = f"{topic_root}/wnd-state"
    h = windowed_minhash_dedup_pipe(
        docs, uniq, state_dir=sdir, horizon_sec=HORIZON, name="wnd-pipe"
    )
    try:
        published = []
        for wave in waves:
            docs.send(
                [{"doc_id": i, "text": t, "et": et} for i, t, et in wave],
                barrier="chain",
            )
            published += wave
            got = sorted(
                r.doc_id for r in uniq.batch_df().select("doc_id").collect()
            )
            assert got == oracle(published), (got, oracle(published))
        assert got == [0, 1, 3, 5, 6]
        # bounded state: dirs for waves 1-3 (max event times 1010/1200/
        # 1300) fell behind maxET - 2*horizon = 1850 and were pruned;
        # only the last two waves' dirs remain
        assert len(state_dirs(sdir)) == 2, state_dirs(sdir)
    finally:
        h.stop()
        docs.close()
        uniq.close()


def test_neardedup_cap_divergence_is_exactly_the_under_cap_admits(
    spark, topic_root
):
    """VERDICT r3 item 4: pin the per-prefix LSH cap caveat as a tested
    contract. A bucket that crosses `lsh_bucket_cap` only mid-stream
    admits pairs while still under the cap; a batch run over the full
    corpus caps the bucket up front and admits none. The divergence must
    be EXACTLY the docs dropped during the under-cap prefix — nothing
    more (capped buckets admit nothing once over), nothing less."""
    from async_event_streams_spark.pipelines import dedup_near
    from async_event_streams_spark.streaming import minhash_dedup_pipe

    CAP = 4
    text = "six identical boilerplate documents sharing every band bucket"
    waves = [[0, 1], [2, 3], [4, 5]]  # bucket size 2 -> 4 -> 6 (crosses cap)

    reg = TopicRegistry()
    docs = Topic(spark, "cap_docs", "doc_id long, text string", topic_root, reg)
    uniq = Topic(spark, "cap_uniq", "doc_id long, text string", topic_root, reg)
    h = minhash_dedup_pipe(
        docs, uniq, state_dir=f"{topic_root}/cap-state",
        lsh_bucket_cap=CAP, name="cap-pipe",
    )
    try:
        for wave in waves:
            docs.send(
                [{"doc_id": i, "text": text} for i in wave], barrier="chain"
            )
        stream_kept = sorted(
            r.doc_id for r in uniq.batch_df().select("doc_id").collect()
        )
        bdf = spark.createDataFrame(
            [(i, text) for i in range(6)], "doc_id long, text string"
        )
        batch_kept = sorted(
            r.doc_id
            for r in dedup_near(bdf, 0.8, lsh_bucket_cap=CAP).collect()
        )
        # batch: bucket size 6 > cap from the start -> nothing dropped
        assert batch_kept == [0, 1, 2, 3, 4, 5], batch_kept
        # stream: waves 1-2 ran under the cap (pool sizes 2 and 4) and
        # dropped 1,2,3; wave 3 crossed the cap (6 > 4) so 4,5 survived
        assert stream_kept == [0, 4, 5], stream_kept
        # the divergence is exactly the under-cap admits
        assert sorted(set(batch_kept) - set(stream_kept)) == [1, 2, 3]
    finally:
        h.stop()
        docs.close()
        uniq.close()


def test_exact_dedup_auto_compaction_bounds_state(spark, topic_root):
    """VERDICT r3 item 5: compact_every=K folds the per-batch state
    dirs inside the pipe itself (committed-batch watermark), so a
    long-running dedup's state directory count stays bounded while
    stream==batch equality and restart exactly-once keep holding."""
    from async_event_streams_spark.streaming import exact_dedup_pipe, state_dirs

    reg = TopicRegistry()
    docs = Topic(spark, "ac_docs", "doc_id long, text string", topic_root, reg)
    uniq = Topic(spark, "ac_uniq", "doc_id long, text string", topic_root, reg)
    sdir = f"{topic_root}/ac-state"
    h = exact_dedup_pipe(docs, uniq, state_dir=sdir, name="ac-pipe",
                         compact_every=2)
    try:
        # 6 waves; texts repeat across waves (t0..t2 cycle + novel per wave)
        published = []
        for w in range(3):
            wave = [(10 * w, f"t{w}"), (10 * w + 1, f"t{(w + 1) % 3}")]
            docs.send([{"doc_id": i, "text": t} for i, t in wave],
                      barrier="chain")
            published += wave
        h.stop()
        # restart with the same name: checkpoint + state resume
        h = exact_dedup_pipe(docs, uniq, state_dir=sdir, name="ac-pipe",
                             compact_every=2)
        for w in range(3, 6):
            wave = [(10 * w, f"t{w}"), (10 * w + 1, f"t{(w + 1) % 3}")]
            docs.send([{"doc_id": i, "text": t} for i, t in wave],
                      barrier="chain")
            published += wave
        expect = {}
        for i, t in published:
            expect.setdefault(t, i)
        got = {
            r.text: r.doc_id
            for r in uniq.batch_df().select("doc_id", "text").collect()
        }
        assert got == {t: i for t, i in expect.items()}, got
        # 6 batches ran; compaction at batches 2 and 4 folded the tail —
        # without it there would be 6 dirs
        assert len(state_dirs(sdir)) <= 3, state_dirs(sdir)
    finally:
        h.stop()
        docs.close()
        uniq.close()


def test_windowed_pipe_equals_batch_twin_on_corpus(spark, sf_dir, topic_root):
    """The two halves of the r4 horizon-dedup surface must agree: the
    watermark-bounded streaming pipe (windowed_minhash_dedup_pipe) run
    over the real documents corpus, published in doc_id order with the
    batch twin's synthetic event time, accumulates exactly the
    x_dedup_windowed survivor set (same bands, same Jaccard verify,
    same horizon, same shadowing) — one semantics, two execution
    shapes."""
    from async_event_streams_spark.queries.llm import (
        _WINDOWED_HORIZON_SEC,
        x_dedup_windowed,
    )
    from async_event_streams_spark.streaming import windowed_minhash_dedup_pipe
    from async_event_streams_spark.tables import table

    docs_rows = (
        table(spark, sf_dir, "documents")
        .selectExpr("doc_id", "text", "(doc_id * 37) % 997 AS et")
        .orderBy("doc_id")
        .collect()
    )
    reg = TopicRegistry()
    docs = Topic(spark, "bt_docs", "doc_id long, text string, et long",
                 topic_root, reg)
    uniq = Topic(spark, "bt_uniq", "doc_id long, text string, et long",
                 topic_root, reg)
    h = windowed_minhash_dedup_pipe(
        docs, uniq, state_dir=f"{topic_root}/bt-state",
        horizon_sec=_WINDOWED_HORIZON_SEC, name="bt-pipe",
    )
    try:
        third = (len(docs_rows) + 2) // 3
        for lo in range(0, len(docs_rows), third):
            docs.send(
                [
                    {"doc_id": r.doc_id, "text": r.text, "et": r.et}
                    for r in docs_rows[lo : lo + third]
                ],
                barrier="chain",
            )
        got = sorted(
            r.doc_id for r in uniq.batch_df().select("doc_id").collect()
        )
        want = sorted(
            r.doc_id for r in x_dedup_windowed(spark, sf_dir).collect()
        )
        assert got == want, (len(got), len(want))
    finally:
        h.stop()
        docs.close()
        uniq.close()


def test_composed_pipeline_stream_equals_batch(spark, topic_root):
    """VERDICT r5 item 4, extended with the r6 stage 0: the full
    training-data pipeline — markup extraction → quality gate → exact
    dedup → horizon-bounded near-dedup — run as ONE pipe topology
    (four chained topics), not stage-by-stage. After every wave the
    ACCUMULATED per-stage survivor sets must equal the batch
    composition (x_pipeline_report's actual stage functions, plus
    pipelines.extract_text) over everything published so far, and the
    equality must survive a full stop/restart of all pipes mid-stream
    (checkpoints + state dirs + txn replay). The horizon is wider than
    the test's event-time span, so the windowed stage's contract
    coincides with the batch dedup_near it twins."""
    from pyspark.sql import functions as SF

    from async_event_streams_spark.functions.extract import synth_html
    from async_event_streams_spark.pipelines import (
        dedup_exact,
        dedup_near,
        extract_text,
        quality_filter,
    )
    from async_event_streams_spark.streaming import (
        exact_dedup_pipe,
        windowed_minhash_dedup_pipe,
    )

    base = "the quick brown fox jumps over the lazy dog tonight"
    other = "completely different words about spark streaming engines here now always"
    third = "unrelated third topic sentence with its own tokens entirely fresh"
    texts = {
        0: base,
        1: "too short",  # < 10 words: its only paragraph dies at EXTRACTION
        2: base + " extra",  # near-dup of 0
        3: other,
        4: base,  # exact dup of 0
        5: "!!!! ???? .... ;;;; aaaa bbbb cccc dddd eeee ffff gggg",
        # ^ extraction keeps it (11 words, no links) but the quality
        #   punct-ratio gate kills it
        6: other + " indeed",  # near-dup of 3
        7: third,
        8: third,  # exact dup of 7
    }
    waves = [[0, 1, 2], [3, 4, 5], [6, 7, 8]]
    # deterministic pages around each text — the SAME synthesizer the
    # oracle-checked x_extract_text uses
    html = {
        r.doc_id: r.h
        for r in spark.createDataFrame(
            [(i, t) for i, t in texts.items()], "doc_id long, text string"
        )
        .select("doc_id", synth_html(SF.col("text"), SF.col("doc_id")).alias("h"))
        .collect()
    }

    page_schema = "doc_id long, html string, et long"
    doc_schema = "doc_id long, text string, et long"
    reg = TopicRegistry()
    docs = Topic(spark, "cp_docs", page_schema, topic_root, reg)
    x = Topic(spark, "cp_x", doc_schema, topic_root, reg)
    q = Topic(spark, "cp_q", doc_schema, topic_root, reg)
    e = Topic(spark, "cp_e", doc_schema, topic_root, reg)
    fin = Topic(spark, "cp_fin", doc_schema, topic_root, reg)

    def make_pipes():
        # NB: wrap — pipe() feeds a two-parameter fn the batch_id, and
        # extract_text's second parameter is html_col
        h0 = pipe(docs, fn=lambda df: extract_text(df), target=x, name="cp-extract")
        h1 = pipe(
            x,
            fn=lambda df: quality_filter(df).drop("n_tokens"),
            target=q,
            name="cp-quality",
        )
        h2 = exact_dedup_pipe(
            q, e, state_dir=f"{topic_root}/cp-estate", name="cp-exact"
        )
        h3 = windowed_minhash_dedup_pipe(
            e,
            fin,
            state_dir=f"{topic_root}/cp-nstate",
            horizon_sec=10_000,
            name="cp-near",
        )
        return [h0, h1, h2, h3]

    def batch_funnel(ids):
        pages = spark.createDataFrame(
            [(i, html[i], i) for i in ids], page_schema
        )
        sx = extract_text(pages)
        sq = quality_filter(sx)
        se = dedup_exact(sq)
        sf_ = dedup_near(se)
        return tuple(
            sorted(r.doc_id for r in s.select("doc_id").collect())
            for s in (sx, sq, se, sf_)
        )

    handles = make_pipes()
    published: list[int] = []
    try:
        for wi, wave in enumerate(waves):
            if wi == 2:  # full-chain restart before the last wave;
                for h in handles:  # doc 6 arrives while the chain is down
                    h.stop()
                docs.post([{"doc_id": 6, "html": html[6], "et": 6}])
                wave = wave[1:]
                handles = make_pipes()
            docs.send(
                [{"doc_id": i, "html": html[i], "et": i} for i in wave],
                barrier="chain",
            )
            published.extend(waves[wi])
            want = batch_funnel(published)
            got = tuple(
                sorted(r.doc_id for r in t.batch_df().select("doc_id").collect())
                for t in (x, q, e, fin)
            )
            assert got == want, (wi, got, want)
        # the expected funnel, explicitly: extraction drops 1 (no body
        # copy), quality drops 5 (punct), exact drops 4 & 8, near-dup
        # drops 2 & 6
        assert got == (
            [0, 2, 3, 4, 5, 6, 7, 8],
            [0, 2, 3, 4, 6, 7, 8],
            [0, 2, 3, 6, 7],
            [0, 3, 7],
        )
        # the extracted text that flowed through the chain is the
        # original body copy, verbatim (markup fully boiled off)
        flowed = {r.doc_id: r.text for r in fin.batch_df().collect()}
        assert flowed == {0: base, 3: other, 7: third}
    finally:
        for h in handles:
            h.stop()
        for t in (docs, x, q, e, fin):
            t.close()
