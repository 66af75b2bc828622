"""Crash-window audits for the r9 streaming state families (r9 VERDICT
#6): the interrupted-swap / partial-write / uncommitted-replay analysis
that produced the dq and state ADVICE fixes (streaming/state.py:101,
streaming/dq.py:184), applied to cumulative reach, the inverted index,
and the funnel tracker — each family's concrete crash windows encoded
as a test.

The delta-log families (reach, index — both on mv_rollup_pipe) have
three windows:
  (w1) crash DURING the compaction merge write → a `.compact-N.
       inprogress` leftover whose sources are intact (must be
       discarded at restart);
  (w2) crash AFTER the ready-rename but mid source-removal → a
       `.ready` dir that is the ONLY complete copy of some state
       (must be COMPLETED, never discarded — the r8 swap fix);
  (w3) crash AFTER the state-root write but BEFORE the checkpoint
       commit → the restarted pipe REPLAYS the batch; replay safety
       is dir ownership (batch=N rewritten with overwrite produces
       identical content), for the additive index merge just as for
       idempotent MIN.
The funnel family keeps its state in the streaming checkpoint, not
file roots, so its one window is (w3)'s analogue: state-store version
and offsets commit together, so a forged uncommitted batch re-runs
against the rolled-back state and the file sink's own transaction log
absorbs the duplicate output files.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

from pyspark.sql import functions as F

from async_event_streams_spark.streaming.reach import (
    reach_batch_twin,
    reach_pipe,
    reach_snapshot,
)
from async_event_streams_spark.streaming.state import state_dirs
from async_event_streams_spark.tables import table
from async_event_streams_spark.topics import Topic, TopicRegistry

_REACH_SCHEMA = "user_id long, event_ts timestamp"


def _reach_waves():
    import datetime

    d = lambda day: datetime.datetime(2026, 4, day, 9, 0)  # noqa: E731
    return [
        [{"user_id": u, "event_ts": d(1)} for u in (1, 2, 3)],
        [{"user_id": u, "event_ts": d(2)} for u in (2, 4)],
        [{"user_id": u, "event_ts": d(3)} for u in (1, 5)],
    ]


def _reach_rows(df):
    return [
        (r.day, r.new_users, r.cumulative_reach)
        for r in df.orderBy("day").collect()
    ]


def _interrupt_swap_after_ready(spark, sdir, merge_fn, upto=None):
    """Forge crash window (w2): replicate swap_compacted steps 1-2 for
    the dirs on disk (only those below `upto` — the committed-batch
    watermark the real pipe compacts under; merging an UNCOMMITTED
    batch would be a protocol violation, not a crash window), then
    remove only the FIRST source dir (step 3 interrupted mid-loop).
    The .ready dir is now the only complete copy of that source's
    state."""
    dirs = state_dirs(sdir, upto)
    assert len(dirs) >= 2, dirs
    inprog = os.path.join(sdir, ".compact-0.inprogress")
    merge_fn(spark.read.parquet(*dirs)).write.mode("overwrite").parquet(
        inprog
    )
    with open(os.path.join(inprog, "_sources.json"), "w") as f:
        json.dump([os.path.basename(d) for d in dirs], f)
    os.rename(inprog, os.path.join(sdir, ".compact-0.ready"))
    shutil.rmtree(dirs[0])


def test_reach_recovers_interrupted_compaction_windows(spark, tmp_path):
    """Windows (w1) and (w2) for the MIN-merge reach family: a stale
    .inprogress AND a ready-but-half-swapped compaction are both on
    disk at restart; the restarted pipe must discard the former,
    complete the latter, and the snapshot curve must equal the batch
    twin over every row ever sent."""
    from async_event_streams_spark.streaming.reach import _minday_merge

    reg = TopicRegistry()
    src = Topic(spark, "cr_reach", _REACH_SCHEMA, str(tmp_path / "t"), reg)
    sdir = str(tmp_path / "state")
    waves = _reach_waves()
    h = reach_pipe(src, sdir, name="cr-reach")
    src.send(waves[0], barrier="chain")
    src.send(waves[1], barrier="chain")
    h.stop()
    # forge (w2): ready dir present, first source dir already gone
    _interrupt_swap_after_ready(spark, sdir, _minday_merge)
    # forge (w1): an unrelated incomplete write from an older crash
    os.makedirs(os.path.join(sdir, ".compact-9.inprogress"))
    h2 = reach_pipe(src, sdir, name="cr-reach")
    try:
        src.send(waves[2], barrier="chain")
        got = _reach_rows(reach_snapshot(spark, sdir))
        want = _reach_rows(
            reach_batch_twin(
                spark.createDataFrame(sum(waves, []), _REACH_SCHEMA)
            )
        )
        assert got == want, (got, want)
        leftovers = [
            n for n in os.listdir(sdir) if n.startswith(".compact-")
        ]
        assert leftovers == [], leftovers
    finally:
        h2.stop()
        src.close()


def _docs_waves(spark, sf_dir, n=32, k=4):
    rows = [
        {"doc_id": r.doc_id, "text": r.text}
        for r in table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < n)
        .select("doc_id", "text")
        .collect()
    ]
    step = (len(rows) + k - 1) // k
    return [rows[i : i + step] for i in range(0, len(rows), step)]


def _index_set(df):
    return {
        (r.term, r.block_id, r.df_block, r.cf_block, r.postings_md5)
        for r in df.collect()
    }


def test_index_recovers_interrupted_compaction_and_replay(
    spark, sf_dir, tmp_path
):
    """Windows (w2) and (w3) for the ADDITIVE index family — the
    riskiest merge (a double-applied batch would inflate tf, unlike
    idempotent MIN): forge a half-swapped compaction AND an
    uncommitted last batch (checkpoint commit deleted), restart, keep
    streaming. Recovery must complete the swap; the replayed batch
    must rewrite its own `batch=N` dir (ownership, not append) so no
    posting is double-counted; the snapshot index — md5s included —
    must equal the batch twin."""
    from async_event_streams_spark.streaming.index import (
        _posting_merge,
        index_batch_twin,
        index_pipe,
        index_snapshot,
    )

    reg = TopicRegistry()
    src = Topic(
        spark, "cr_idx", "doc_id long, text string", str(tmp_path / "t"), reg
    )
    sdir = str(tmp_path / "state")
    waves = _docs_waves(spark, sf_dir)
    h = index_pipe(src, sdir, name="cr-idx")
    for w in waves[:3]:
        src.send(w, barrier="chain")
    h.stop()
    # forge (w2) over batches 0-1 ONLY (the committed-batch watermark:
    # batch 2 is about to be forged uncommitted, and the real pipe
    # never compacts a batch whose commit it hasn't seen)
    _interrupt_swap_after_ready(spark, sdir, _posting_merge, upto=2)
    # forge (w3): batch 2 is now "uncommitted" — the restarted pipe
    # will re-run it against the already-written batch=2 dir
    commit_dir = os.path.join(src.dir, "_checkpoints", "cr-idx", "commits")
    real = sorted(
        c
        for c in glob.glob(os.path.join(commit_dir, "*"))
        if not c.endswith((".tmp", ".crc"))
    )
    os.remove(real[-1])
    crc = os.path.join(commit_dir, f".{os.path.basename(real[-1])}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    h2 = index_pipe(src, sdir, name="cr-idx")
    try:
        src.send(waves[3], barrier="chain")
        src.barrier()
        all_docs = spark.createDataFrame(
            [(r["doc_id"], r["text"]) for w in waves for r in w],
            "doc_id long, text string",
        )
        got = _index_set(index_snapshot(spark, sdir))
        want = _index_set(index_batch_twin(all_docs))
        assert got == want
        leftovers = [
            n for n in os.listdir(sdir) if n.startswith(".compact-")
        ]
        assert leftovers == [], leftovers
    finally:
        h2.stop()
        src.close()


def test_funnel_replay_after_forged_crash_is_exactly_once(
    spark, sf_dir, tmp_path
):
    """The funnel family's window (w3) analogue: state lives in the
    streaming checkpoint, so a crash between sink write and commit is
    simulated by deleting the last commit — the restarted query rolls
    the state store back and re-runs the batch. The parquet sink's
    transaction log must absorb the duplicate files: final output has
    each (user, stage) AT MOST ONCE with strictly increasing stages,
    and membership equals the batch funnel."""
    from async_event_streams_spark.streaming.funnel import (
        funnel_stage_stream,
    )

    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 400)
        .select("user_id", "event_type", "ts", "event_id")
        .orderBy("ts", "event_id")
        .collect()
    )
    rows = [
        {"user_id": r.user_id, "etype": r.event_type, "ets": r.ts,
         "eid": r.event_id}
        for r in ev
    ]
    reg = TopicRegistry()
    t = Topic(
        spark,
        "cr_fun",
        "user_id long, etype string, ets timestamp, eid long",
        str(tmp_path / "t"),
        reg,
    )
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def start():
        q = (
            funnel_stage_stream(
                t.subscribe().select(
                    "user_id",
                    F.col("etype").alias("event_type"),
                    F.col("ets").alias("ts"),
                    F.col("eid").alias("event_id"),
                )
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        t.attach_query(q)
        return q

    q1 = start()
    try:
        t.send(rows[:200])
    finally:
        q1.stop()
    commit_dir = os.path.join(ckpt, "commits")
    real = sorted(
        c
        for c in glob.glob(os.path.join(commit_dir, "*"))
        if not c.endswith((".tmp", ".crc"))
    )
    os.remove(real[-1])
    crc = os.path.join(commit_dir, f".{os.path.basename(real[-1])}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    q2 = start()
    try:
        t.send(rows[200:])
        got = spark.read.schema(
            "user_id long, stage int, reached_at timestamp"
        ).parquet(out)
        pairs = [(r.user_id, r.stage) for r in got.collect()]
        assert len(pairs) == len(set(pairs)), "duplicate stage rows"
        # per-user stages are a prefix 1..k (advance-only)
        by_user: dict[int, set] = {}
        for u, s in pairs:
            by_user.setdefault(u, set()).add(s)
        for u, stages in by_user.items():
            assert stages == set(range(1, max(stages) + 1)), (u, stages)
        # membership equals the batch funnel on the same rows
        src_df = spark.createDataFrame(
            [(r["user_id"], r["etype"], r["ets"], r["eid"]) for r in rows],
            "user_id long, event_type string, ts timestamp, event_id long",
        )
        w = {}
        for r in src_df.orderBy("ts", "event_id").collect():
            st = w.setdefault(r.user_id, [None, None, None])
            if r.event_type == "view" and st[0] is None:
                st[0] = r.ts
            elif (
                r.event_type == "click"
                and st[1] is None
                and st[0] is not None
                and r.ts > st[0]
            ):
                st[1] = r.ts
            elif (
                r.event_type == "purchase"
                and st[2] is None
                and st[1] is not None
                and r.ts > st[1]
            ):
                st[2] = r.ts
        want = {
            (u, i + 1)
            for u, st in w.items()
            for i in range(3)
            if st[i] is not None
        }
        assert set(pairs) == want
    finally:
        q2.stop()
        t.close()
