"""Custom stateful streaming operators via applyInPandasWithState and
transformWithStateInPandas.

Re-expresses the reference's stateful max-merge sink
(/root/reference/tests/fizz_buzz.rs:31-43: `set_value` keeps the max
label per position) as a first-class streaming operator: arbitrary
per-key state, Arrow-batched, with the state store handling
checkpointing — the Spark shape of the reference's `EventSink` + RwLock
state pattern (src/pipes.rs:43-94).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "pos long, max_priority int, max_label string"
STATE_SCHEMA = "max_priority int, max_label string"


def running_max_by_key(df: DataFrame) -> DataFrame:
    """Streaming running max-merge per key: input rows
    (pos, priority, label) → one updated (pos, max_priority, max_label)
    row per key per micro-batch. State is one tuple per key — O(keys),
    not O(events), so it holds at any stream length."""

    def update(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        best_p, best_l = state.get if state.exists else (-1, None)
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            idx = pdf["priority"].idxmax()
            p = int(pdf["priority"][idx])
            if p > best_p:
                best_p, best_l = p, str(pdf["label"][idx])
        state.update((best_p, best_l))
        yield pd.DataFrame(
            {
                "pos": [key[0]],
                "max_priority": [best_p],
                "max_label": [best_l],
            }
        )

    return df.groupBy("pos").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Sessionization via transformWithStateInPandas (Spark 4 state API v2)
# ---------------------------------------------------------------------------

SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start double, n_events int, total double"
)


def _protobuf_available() -> bool:
    """transformWithStateInPandas speaks to the JVM state server over
    protobuf; absent in this container, so the v2 path is gated."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def sessionize(
    df: DataFrame, gap_seconds: float = 1800.0, engine: str = "auto"
) -> DataFrame:
    """Emit COMPLETED sessions per user: a session closes when the next
    event arrives more than `gap_seconds` after the previous one. The
    open session is held in per-key state (O(keys)) across
    micro-batches; closure is driven by event time in the data, so the
    operator is deterministic (no wall-clock timers).

    engine="tws" uses transformWithStateInPandas (the v2 arbitrary-state
    API: typed state handles, RocksDB-backed) — requires protobuf;
    engine="compat" uses applyInPandasWithState with identical
    semantics; "auto" picks tws when available.
    """
    if engine == "auto":
        engine = "tws" if _protobuf_available() else "compat"
    if engine == "compat":
        return _sessionize_compat(df, gap_seconds)
    if engine != "tws":
        raise ValueError(f"unknown engine {engine!r} (tws|compat|auto)")
    return _sessionize_tws(df, gap_seconds)


def _sessionize_compat(df: DataFrame, gap_seconds: float) -> DataFrame:
    """applyInPandasWithState sessionizer (same semantics as the tws
    path; works without protobuf)."""

    def update(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        events: list[tuple[float, float]] = []
        for pdf in pdf_iter:
            events.extend(
                zip(pdf["ts_sec"].astype(float), pdf["value"].astype(float))
            )
        events.sort()
        cur = tuple(state.get) if state.exists else None
        completed = []
        for ts, v in events:
            if cur is None:
                cur = (ts, ts, 1, v)
            elif ts - cur[1] >= gap_seconds:
                completed.append(cur)
                cur = (ts, ts, 1, v)
            else:
                cur = (cur[0], ts, cur[2] + 1, cur[3] + v)
        if cur is not None:
            state.update(cur)
        if completed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(completed),
                    "session_start": [c[0] for c in completed],
                    "n_events": [c[2] for c in completed],
                    "total": [c[3] for c in completed],
                }
            )

    return df.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType="start double, last double, n int, total double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _sessionize_tws(df: DataFrame, gap_seconds: float) -> DataFrame:
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Sessionizer(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "open_session", "start double, last double, n int, total double"
            )

        def handleInputRows(self, key, rows, timerValues):
            events: list[tuple[float, float]] = []
            for pdf in rows:
                events.extend(
                    zip(pdf["ts_sec"].astype(float), pdf["value"].astype(float))
                )
            events.sort()
            cur = self._state.get() if self._state.exists() else None
            completed = []
            for ts, v in events:
                if cur is None:
                    cur = (ts, ts, 1, v)
                elif ts - cur[1] >= gap_seconds:
                    completed.append(cur)
                    cur = (ts, ts, 1, v)
                else:
                    cur = (cur[0], ts, cur[2] + 1, cur[3] + v)
            if cur is not None:
                self._state.update(cur)
            if completed:
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]] * len(completed),
                        "session_start": [c[0] for c in completed],
                        "n_events": [c[2] for c in completed],
                        "total": [c[3] for c in completed],
                    }
                )

        def close(self) -> None:
            pass

    return df.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=Sessionizer(),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


# ---------------------------------------------------------------------------
# Bounded-frame EWMA (round 9): per-key SLIDING-FRAME state
# ---------------------------------------------------------------------------

EWMA_L = 8  # must track relational.c_ewma's frame

EWMA_OUTPUT_SCHEMA = "user_id long, event_id long, x_micro long, ewma_pico long"
# state = the last (up to) 8 (event_id, x_micro) pairs, oldest first —
# the one state family the max-merge (1 tuple) and dedup (set) shapes
# don't cover: a bounded DEQUE per key.
EWMA_STATE_SCHEMA = "event_ids array<long>, xs array<long>"


def streaming_ewma(df: DataFrame) -> DataFrame:
    """Streaming twin of `c_ewma`: per-user decay-1/2 EWMA over the
    last EWMA_L events, emitted for EVERY input row with the exact
    integer arithmetic of the batch query (power-of-two weights,
    (num·10^6) DIV den — a replay reproduces identical outputs).

    State is a bounded deque of the last EWMA_L (event_id, value)
    pairs per key — O(keys · L), the frame-operator state class; the
    store checkpoints it, so the frame survives restarts mid-window.
    Rows are folded in event_id order WITHIN each batch; cross-batch
    order is the arrival order, matching the batch query whenever the
    stream delivers per-key rows in event order (the topic FIFO
    guarantee)."""

    def update(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        ids, xs = state.get if state.exists else ([], [])
        ids, xs = list(ids), list(xs)
        out_rows = []
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values("event_id")
            for eid, x in zip(pdf["event_id"], pdf["x_micro"]):
                ids.append(int(eid))
                xs.append(int(x))
                ids, xs = ids[-EWMA_L:], xs[-EWMA_L:]
                num = sum(v * (1 << i) for i, v in enumerate(xs))
                den = (1 << len(xs)) - 1
                # SQL DIV truncation, not Python floor — they differ
                # on negative numerators (see timeseries._trunc_div)
                q = abs(num * 1_000_000) // den
                out_rows.append(
                    (key[0], int(eid), int(x), q if num >= 0 else -q)
                )
        state.update((ids, xs))
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=["user_id", "event_id", "x_micro", "ewma_pico"],
            )

    return df.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
