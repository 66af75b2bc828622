#!/usr/bin/env python
"""The r10 live ops dashboard: metric events stream through a topic
into ONE applyInPandasWithState pass (streaming/timeseries.py) that
maintains per-user O(keys) state — the bounded EWMA frame deque, the
running peak, the one-step-ahead forecast — and emits every
frame-local metric per event; the anomaly flags are then served from
the emitted log with `anomaly_view` (the snapshot-time derivation,
since whole-history variance keeps moving). The final frame equals the
registered batch queries (c_ewma / c_window_drawdown /
c_window_bollinger / c_window_rolling_median / c_anomaly_ewma) on the
same rows — one semantics, two execution shapes.
Run: python examples/live_timeseries_dashboard.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from async_event_streams_spark.session import get_spark
from async_event_streams_spark.streaming import (
    anomaly_view,
    run_stream_to_memory,
    timeseries_stream,
)
from async_event_streams_spark.topics import Topic, TopicRegistry


def main() -> None:
    spark = get_spark(app_name="live-timeseries", master="local[4]",
                      shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="ts-dash-")
    t = Topic(spark, "metrics", "user_id long, eid long, xm long",
              root, TopicRegistry())
    query, tbl = run_stream_to_memory(
        timeseries_stream(
            t.subscribe().select(
                "user_id",
                F.col("eid").alias("event_id"),
                F.col("xm").alias("x_micro"),
            )
        ),
        output_mode="append",
    )
    t.attach_query(query)

    # a smooth series per user, with one injected spike for user 2
    waves = []
    for w in range(3):
        wave = []
        for i in range(20 * w, 20 * (w + 1)):
            for u in (1, 2):
                x = 500000 + 1000 * (i % 7) * u
                if u == 2 and i == 47:
                    x = 5000000  # the spike the 2-sigma rule must flag
                wave.append({"user_id": u, "eid": i, "xm": x})
        waves.append(wave)

    for wave in waves:
        t.send(wave)  # publish → subscribe → completion barrier
        emitted = spark.sql(f"SELECT * FROM {tbl}")
        flags = anomaly_view(emitted)
        n_anom = flags.filter(F.col("anomaly") == 1).count()
        top = (
            emitted.orderBy(F.desc("event_id")).limit(2)
            .select("user_id", "event_id", "ewma_pico", "drawdown_micro",
                    "band_break")
            .collect()
        )
        print(f"after {emitted.count():3d} events: {n_anom} anomalies; "
              f"latest per-metric rows: {[tuple(r) for r in top]}")

    flagged = {
        (r.user_id, r.event_id)
        for r in anomaly_view(spark.sql(f"SELECT * FROM {tbl}"))
        .filter(F.col("anomaly") == 1)
        .collect()
    }
    assert (2, 47) in flagged, flagged
    print(f"OK: spike (user 2, event 47) flagged; all flags: {sorted(flagged)}")

    t.close()
    spark.stop()


if __name__ == "__main__":
    main()
