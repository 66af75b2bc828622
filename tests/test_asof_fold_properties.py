"""Property tests for the streaming as-of fold (streaming/asof.py
`_update`) against a brute-force pure-Python reference — Spark-free,
so hypothesis can hammer what the corpus never produces: negative
times, exact time ties on both sides (orders-before-events, larger
order key wins), keys with no orders at all (NULL as-of), replayed
rows (the watermark drop), arbitrary micro-batch boundaries, and
reversed Arrow-chunk order within a batch.

The reference recomputes each event's as-of key FROM SCRATCH: the
maximum (t, okey) order at-or-before the event's time — the oracle
SQL's correlated-subquery reading. Equality across random inputs
proves the one-tuple state transition implements exactly that."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from async_event_streams_spark.streaming.asof import _update


class _FakeState:
    def __init__(self):
        self.exists = False
        self._t = None

    @property
    def get(self):
        return self._t

    def update(self, t):
        self._t = tuple(t)
        self.exists = True


def _frame(rows):
    return pd.DataFrame(
        {
            "t": [r[0] for r in rows],
            "is_event": [r[1] for r in rows],
            "sid": [r[2] for r in rows],
            "eid": pd.array(
                [r[2] if r[1] == 1 else None for r in rows], dtype="Int64"
            ),
            "okey": pd.array(
                [r[2] if r[1] == 0 else None for r in rows], dtype="Int64"
            ),
        }
    )


def _run_stream(rows, batch_sizes):
    """Drive _update, cutting the ordered rows into batches of the
    given sizes (remainder in a final batch), each batch delivered as
    two chunks in REVERSED order (the concat-then-sort hazard)."""
    state = _FakeState()
    out = []
    i = 0
    cuts = list(batch_sizes) + [len(rows)]
    for size in cuts:
        batch = rows[i : i + size]
        i += size
        if not batch:
            continue
        mid = len(batch) // 2
        chunks = [_frame(batch[mid:]), _frame(batch[:mid])]
        chunks = [c for c in chunks if len(c)]
        for pdf in _update((7,), iter(chunks), state):
            out.extend(
                (int(r.event_id), None if pd.isna(r.asof_orderkey) else int(r.asof_orderkey))
                for r in pdf.itertuples()
            )
        if i >= len(rows):
            break
    return out


def _reference(rows):
    """Brute force: for each event, max-(t, okey) order at-or-before."""
    orders = [(t, sid) for t, is_event, sid in rows if is_event == 0]
    out = []
    for t, is_event, sid in rows:
        if is_event != 1:
            continue
        prior = [(ot, ok) for ot, ok in orders if ot <= t]
        out.append((sid, max(prior)[1] if prior else None))
    return out


@st.composite
def timelines(draw):
    n = draw(st.integers(1, 40))
    ts = draw(
        st.lists(
            st.integers(-5, 8), min_size=n, max_size=n
        )
    )  # tiny range forces heavy time ties
    sides = draw(st.lists(st.integers(0, 1), min_size=n, max_size=n))
    rows = sorted(
        (t, side, sid) for sid, (t, side) in enumerate(zip(ts, sides))
    )
    return rows


@given(
    timelines(),
    st.lists(st.integers(1, 7), max_size=6),
)
@settings(max_examples=200, deadline=None)
def test_fold_matches_brute_force(rows, batch_sizes):
    assert _run_stream(rows, batch_sizes) == _reference(rows)


@given(timelines(), st.integers(1, 5))
@settings(max_examples=100, deadline=None)
def test_replayed_rows_are_dropped(rows, replay_every):
    """Re-deliver every k-th already-processed row in a later batch:
    the watermark must drop them, leaving the output identical."""
    state = _FakeState()
    out = []
    mid = max(1, len(rows) // 2)
    first, second = rows[:mid], rows[mid:]
    for pdf in _update((7,), iter([_frame(first)]), state):
        out.extend(
            (int(r.event_id), None if pd.isna(r.asof_orderkey) else int(r.asof_orderkey))
            for r in pdf.itertuples()
        )
    replayed = first[::replay_every]
    for pdf in _update((7,), iter([_frame(second + replayed)]), state):
        out.extend(
            (int(r.event_id), None if pd.isna(r.asof_orderkey) else int(r.asof_orderkey))
            for r in pdf.itertuples()
        )
    assert out == _reference(rows)


def test_ties_order_beats_event_and_larger_key_wins():
    """The c_join_asof tie contract, pinned explicitly: at equal t an
    order is visible to the event (<= semantics), and among equal-t
    orders the larger key wins."""
    rows = [
        (5, 0, 10),  # order 10 at t=5
        (5, 0, 20),  # order 20 at t=5 — larger key, same time
        (5, 1, 100),  # event at t=5 sees order 20
        (6, 1, 101),  # later event still sees order 20
    ]
    assert _reference(rows) == [(100, 20), (101, 20)]
    assert _run_stream(rows, [2]) == [(100, 20), (101, 20)]


def test_no_orders_yields_null():
    rows = [(1, 1, 100), (2, 1, 101)]
    assert _run_stream(rows, []) == [(100, None), (101, None)]
