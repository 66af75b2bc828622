"""Batch-versioned parquet state for stateful pipes (exact/near dedup).

Layout: `{state_dir}/batch={N}/` parquet written by micro-batch N with
overwrite (replay-safe: a replayed batch reproduces its own dir), and
readers probe only batches strictly below their own id.

`compact_state` folds the per-batch directories into one so a
long-running pipe's state doesn't accumulate thousands of directories
(listing + tiny-file reads dominate otherwise). The compacted output
keeps the MINIMUM batch index so every future probe (idx < batch_id)
still sees it.
"""

from __future__ import annotations

import os
import re
import shutil

_BATCH_DIR_RE = re.compile(r"^batch=(\d+)$")


def reject_stale_state(state_dir: str, batch_id: int, op_name: str) -> None:
    """A fresh pipe checkpoint numbers its first batch 0; if the state
    dir already holds LATER batches, this is an existing state table
    paired with the wrong (new) checkpoint — letting batch 0 proceed
    would overwrite `batch=0` (possibly a compacted dir holding most of
    the corpus) and silently corrupt the index. A legitimate
    crash-replay re-runs only the last uncommitted batch, so its id is
    always >= every existing dir's id. Fail fast with the fix."""
    if batch_id == 0:
        later = state_dirs(state_dir)
        if any(
            int(_BATCH_DIR_RE.match(os.path.basename(d)).group(1)) > 0
            for d in later
        ):
            raise ValueError(
                f"{op_name}: fresh checkpoint (batch 0) but {state_dir} "
                "already holds later batches — reuse the original pipe "
                "name (its checkpoint resumes where it left off), or "
                "point the new pipe at a fresh state_dir."
            )


def reject_partitioned_source(source, op_name: str) -> None:
    """Stateful pipes keep ONE batch-versioned state table, but a
    PartitionedTopic source drains as N independent pipes whose batch
    ids all start at 0 — they would clobber each other's `batch=N`
    dirs, and cross-partition duplicates would race the shared state.
    Fail fast with the two sound alternatives instead."""
    if getattr(source, "partitions", None) is not None:
        raise ValueError(
            f"{op_name} needs a single-FIFO source: a PartitionedTopic "
            "drains as one pipe per partition, which would share (and "
            "clobber) one state table. Either drain the partitioned "
            "topic into a plain Topic first, or — when the partition "
            "key equals the dedup key, so duplicates can never span "
            f"partitions — run one {op_name} per sub-topic "
            "(source.partitions[i]) with its own state_dir."
        )


def state_dirs(state_dir: str, below_batch: int | None = None) -> list[str]:
    """Batch state directories, optionally only those with index <
    `below_batch`, sorted by index."""
    try:
        names = os.listdir(state_dir)
    except FileNotFoundError:
        return []
    out = []
    for n in names:
        m = _BATCH_DIR_RE.match(n)
        if m and (below_batch is None or int(m.group(1)) < below_batch):
            out.append((int(m.group(1)), os.path.join(state_dir, n)))
    return [p for _, p in sorted(out)]


def swap_compacted(state_dir: str, dirs: list[str], write_tmp) -> None:
    """Crash-recoverable compaction swap, shared by every delta-log
    module (compact_state here, streaming/mv.py, streaming/dq.py).

    Protocol (each step atomic on a local filesystem):
      1. write the merged output into `.compact-{lo}.inprogress/`
         (plus a `_sources.json` manifest naming the merged dirs);
      2. rename it to `.compact-{lo}.ready/` — the write is now known
         complete;
      3. remove the source dirs;
      4. rename ready → `batch={lo}`.
    A crash at any point is repaired by `recover_compaction`: an
    `.inprogress` dir is an incomplete write (discard — sources are
    intact), a `.ready` dir has the manifest to finish steps 3–4. At
    cluster scale the same protocol is a transactional-table commit.

    Recovery runs HERE too, not only at pipe start: a leftover `.ready`
    may be the only complete copy of state whose source dirs were
    already partially dropped (steps 3–4 interrupted). Discarding it
    and re-merging only the surviving sources would silently lose
    state, so finish the old swap before starting a new one."""
    import json

    if recover_compaction(state_dir) is not None and not all(
        os.path.isdir(d) for d in dirs
    ):
        # Recovery completed an older swap that consumed some of the
        # caller's source dirs — the dirs list is stale. Skip this
        # cycle; the caller's next compaction recomputes it. (In-repo
        # pipes recover at start, so this branch is the direct-caller
        # hazard path only.)
        return
    lo = int(_BATCH_DIR_RE.match(os.path.basename(dirs[0])).group(1))
    inprog = os.path.join(state_dir, f".compact-{lo}.inprogress")
    ready = os.path.join(state_dir, f".compact-{lo}.ready")
    write_tmp(inprog)
    with open(os.path.join(inprog, "_sources.json"), "w") as f:
        json.dump([os.path.basename(d) for d in dirs], f)
    os.rename(inprog, ready)
    for d in dirs:
        shutil.rmtree(d)
    os.rename(ready, os.path.join(state_dir, f"batch={lo}"))


def recover_compaction(state_dir: str) -> str | None:
    """Repair swaps interrupted by a crash. Call at pipe (re)start,
    before the first batch touches the state dir. Repairs EVERY
    leftover found (defensive — the protocol leaves at most one per
    dir, but recovery must not depend on that); returns a short
    description of the repairs, or None if state was clean."""
    import json

    try:
        names = os.listdir(state_dir)
    except FileNotFoundError:
        return None
    msgs = []
    for n in names:
        if n.startswith(".compact-") and n.endswith(".inprogress"):
            # incomplete write: sources are untouched — discard it
            shutil.rmtree(os.path.join(state_dir, n))
            msgs.append(f"discarded incomplete {n}")
    for n in names:
        if not (n.startswith(".compact-") and n.endswith(".ready")):
            continue
        ready = os.path.join(state_dir, n)
        with open(os.path.join(ready, "_sources.json")) as f:
            sources = json.load(f)
        for s in sources:
            shutil.rmtree(os.path.join(state_dir, s), ignore_errors=True)
        lo = n[len(".compact-") : -len(".ready")]
        dest = os.path.join(state_dir, f"batch={lo}")
        # a ready dir plus an existing dest cannot happen within one
        # protocol run (dest is created FROM ready); treat dest as the
        # completed swap and drop the leftover
        if os.path.exists(dest):
            shutil.rmtree(ready)
            msgs.append(f"dropped superseded {n}")
        else:
            os.rename(ready, dest)
            msgs.append(f"completed {n}")
    return "; ".join(msgs) if msgs else None


def compact_state(spark, state_dir: str, upto_batch: int) -> int:
    """Merge every `batch=N` directory with N < `upto_batch` into one
    directory keyed by the smallest merged index. Returns the number of
    directories merged (0/1 = nothing to do).

    Run this BETWEEN micro-batches (e.g. with the pipe stopped, or from
    the pipe's own batch fn before processing) and only up to the last
    COMMITTED batch: a replayed batch must never find its own rows
    pre-merged into earlier state, or it would classify its entire
    input as already-seen. Crash-recoverable via the swap_compacted
    marker protocol (+ recover_compaction at restart); at cluster
    scale the same protocol is a transactional-table commit."""
    dirs = state_dirs(state_dir, upto_batch)
    if len(dirs) <= 1:
        return 0

    def write_tmp(tmp: str) -> None:
        # mergeSchema: ANN state dirs may mix legacy and __batch-stamped
        # files; a single-footer schema pick would silently DROP the
        # stamp from the merged dir, permanently erasing latest-wins
        # lineage.
        (
            spark.read.option("mergeSchema", "true")
            .parquet(*dirs)
            .write.mode("overwrite")
            .parquet(tmp)
        )

    swap_compacted(state_dir, dirs, write_tmp)
    return len(dirs)
