"""Custom stateful streaming operator via applyInPandasWithState.

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
