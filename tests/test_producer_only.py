"""Producer-only Topic mode (spark=None) — the r13 API behind the
multi-process producer benchmark: a producer service appends to a
shard's segment log with no SparkSession, and a session-owning
consumer drains exactly those events. Pins: envelope compatibility
(the consumer parses producer-written segments), event-id recovery
(a fresh producer handle continues after prior appends), and the
subprocess shape itself (a real second interpreter, not a thread)."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import textwrap

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from async_event_streams_spark.topics import TopicRegistry
from async_event_streams_spark.topics.topic import Topic

SCHEMA_DDL = "k string, n long, v double"
SCHEMA = StructType(
    [
        StructField("k", StringType()),
        StructField("n", LongType()),
        StructField("v", DoubleType()),
    ]
)


def test_producer_only_handle_appends_consumer_drains(spark, tmp_path):
    root = str(tmp_path)
    consumer = Topic(spark, "po", SCHEMA_DDL, root, registry=TopicRegistry())
    # a consumer-side publish first, so the producer handle must
    # RECOVER the next event id from disk instead of starting at 0
    consumer.post([{"k": "a", "n": 0, "v": 0.0}])

    producer = Topic(None, "po", SCHEMA, root, registry=TopicRegistry())
    first, last = producer.post(
        [{"k": "b", "n": 1, "v": 1.5}, {"k": "c", "n": 2, "v": 2.5}]
    )
    assert (first, last) == (1, 2)  # id continuity across processes

    rows = {r["n"]: r for r in consumer.batch_df().collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[2]["k"] == "c" and rows[2]["v"] == 2.5
    assert rows[1]["event_id"] == 1 and rows[2]["event_id"] == 2


def test_producer_only_real_subprocess_roundtrip(spark, tmp_path):
    """The cluster shape for real: a SEPARATE interpreter (no JVM, no
    SparkSession) appends, this session's consumer reads it back."""
    root = str(tmp_path)
    consumer = Topic(spark, "pop", SCHEMA_DDL, root, registry=TopicRegistry())
    child = textwrap.dedent(
        """
        import sys
        sys.path.insert(0, %r)
        from pyspark.sql.types import (
            DoubleType, LongType, StringType, StructField, StructType,
        )
        from async_event_streams_spark.topics import TopicRegistry
        from async_event_streams_spark.topics.topic import Topic
        schema = StructType([
            StructField("k", StringType()),
            StructField("n", LongType()),
            StructField("v", DoubleType()),
        ])
        t = Topic(None, "pop", schema, %r, registry=TopicRegistry())
        print(t.post([{"k": "w", "n": 7, "v": 7.0}]))
        """
    ) % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))), root)
    out = subprocess.run(
        [sys.executable, "-c", child], capture_output=True, text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rows = consumer.batch_df().collect()
    assert len(rows) == 1 and rows[0]["n"] == 7


def test_producer_only_segments_parse_as_plain_json(tmp_path):
    """Segment lines written by a producer-only handle are plain JSON
    with the envelope fast path — no Spark involved on either side."""
    root = str(tmp_path)
    t = Topic(None, "raw", SCHEMA, root, registry=TopicRegistry())
    t.post([{"k": "x", "n": 1, "v": 0.25}], event_type="custom")
    seg_files = [
        os.path.join(t.dir, f)
        for f in sorted(os.listdir(t.dir))
        if f.endswith(".jsonl")
    ]
    assert seg_files, os.listdir(t.dir)
    lines = [
        json.loads(line)
        for f in seg_files
        for line in open(f)
        if line.strip()
    ]
    assert lines[0]["event_type"] == "custom"
    assert lines[0]["event_id"] == 0 and lines[0]["k"] == "x"
