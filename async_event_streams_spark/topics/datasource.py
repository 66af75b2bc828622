"""Custom PySpark streaming DataSource backing topics.

The one custom execution component in the engine (SURVEY.md §4.2): a
file-channel source with explicit offsets, plugging in at the Spark 4
`pyspark.sql.datasource` API — no custom Catalyst rules. It provides
what the built-in file source can't: **latest-offset subscribe**
(a new subscriber sees only events published after it subscribed —
`create_event_stream` semantics, /root/reference/src/event_streams.rs:66-72)
and **bounded per-batch admission** (`max_segments_per_batch`, the
analog of maxOffsetsPerTrigger; flow control the reference only gets
from its send-barrier).

Topic layout on disk (any shared filesystem at scale):

    {topic_dir}/segment-00000042.jsonl   # one atomic publish = one segment
    {topic_dir}/clear-marker             # max cleared segment (A6 clear())

Offsets are segment indices: {"segment": N} means "segments < N
consumed". Segments are written tmp+rename, so a listed segment is
always complete.
"""

from __future__ import annotations

import json
import os
import re
from collections.abc import Iterator
from datetime import datetime, timezone

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

SEGMENT_RE = re.compile(r"^segment-(\d{8})\.jsonl$")
CLEAR_MARKER = "clear-marker"


def segment_path(topic_dir: str, idx: int) -> str:
    return os.path.join(topic_dir, f"segment-{idx:08d}.jsonl")


def list_segments(topic_dir: str) -> list[int]:
    try:
        names = os.listdir(topic_dir)
    except FileNotFoundError:
        return []
    return sorted(
        int(m.group(1)) for n in names if (m := SEGMENT_RE.match(n))
    )


def next_segment_index(topic_dir: str) -> int:
    segs = list_segments(topic_dir)
    return (segs[-1] + 1) if segs else 0


def cleared_before(topic_dir: str) -> int:
    """Segments with index < this value were dropped by clear()."""
    try:
        with open(os.path.join(topic_dir, CLEAR_MARKER)) as f:
            return int(f.read().strip() or 0)
    except (FileNotFoundError, ValueError):
        return 0


def write_clear_marker(topic_dir: str, upto: int) -> None:
    tmp = os.path.join(topic_dir, f".{CLEAR_MARKER}.tmp")
    with open(tmp, "w") as f:
        f.write(str(upto))
    os.replace(tmp, os.path.join(topic_dir, CLEAR_MARKER))


def write_segment_lines(topic_dir: str, idx: int, lines: list[str]) -> str:
    """Atomically write one segment (tmp + rename) from pre-serialized
    JSON lines — the publish hot path hands us strings so the envelope
    prefix is serialized once per batch, not once per row."""
    os.makedirs(topic_dir, exist_ok=True)
    path = segment_path(topic_dir, idx)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        # empty batch -> empty file (not a single blank line): readers
        # skip blanks today, but a blank-line segment is a latent format
        # change for any future consumer (r12 ADVICE).
        f.write("\n".join(lines) + "\n" if lines else "")
    os.replace(tmp, path)
    return path


def write_segment(topic_dir: str, idx: int, rows: list[dict]) -> str:
    """Atomically write one segment (tmp + rename)."""
    return write_segment_lines(
        topic_dir,
        idx,
        [
            json.dumps(row, default=_json_default, separators=(",", ":"))
            for row in rows
        ],
    )


def _json_default(v):
    if isinstance(v, datetime):
        return v.isoformat()
    raise TypeError(f"unserializable {type(v)}")


def _parse_value(v, data_type_name: str):
    if v is None:
        return None
    if data_type_name == "timestamp":
        dt = datetime.fromisoformat(v)
        return dt if dt.tzinfo else dt.replace(tzinfo=timezone.utc)
    return v


class TopicStreamReader(SimpleDataSourceStreamReader):
    """Driver-side reader: offsets are segment counts; each micro-batch
    consumes at most `max_segments_per_batch` pending segments."""

    def __init__(self, schema: StructType, options: dict):
        self._schema = schema
        self._dir = options["path"]
        self._max_per_batch = int(options.get("max_segments_per_batch", "1000"))
        # The subscription point is pinned by Topic.subscribe() at CALL
        # time (start_segment option) — computing "latest" here would
        # race with publishes that happen between subscribe() and the
        # engine lazily instantiating this reader.
        if "start_segment" in options:
            self._initial = int(options["start_segment"])
        else:
            self._initial = cleared_before(self._dir)

    def initialOffset(self) -> dict:
        return {"segment": self._initial}

    def _rows_between(self, start: int, end: int) -> list[tuple]:
        # Materialized list, not a generator: the engine caches (copies)
        # the prefetched records between planPartitions and execution.
        rows: list[tuple] = []
        fields = [(f.name, f.dataType.typeName()) for f in self._schema.fields]
        for idx in range(start, end):
            path = segment_path(self._dir, idx)
            try:
                f = open(path)
            except FileNotFoundError:
                continue  # dropped by clear()
            with f:
                for line in f:
                    if not line.strip():
                        continue
                    obj = json.loads(line)
                    if obj.get("__txn__"):
                        continue  # transaction header, not an event
                    if obj.get("__bulk__"):
                        rows.extend(self._expand_bulk(obj, fields))
                        continue
                    rows.append(
                        tuple(
                            _parse_value(obj.get(name), tname)
                            for name, tname in fields
                        )
                    )
        return rows

    def _expand_bulk(self, marker: dict, fields: list[tuple]) -> list[tuple]:
        """A bulk marker references an executor-written parquet
        directory; expand it to envelope rows with ids assigned
        sequentially from the reserved range (file order is pinned by
        sorting part names)."""
        import pyarrow.parquet as pq

        ts = _parse_value(marker["ts"], "timestamp")
        event_type = marker.get("event_type")
        next_id = marker["base_id"]
        out: list[tuple] = []
        part_files = sorted(
            os.path.join(marker["path"], n)
            for n in os.listdir(marker["path"])
            if n.endswith(".parquet")
        )
        for pf in part_files:
            tbl = pq.read_table(pf)
            cols = {name: tbl.column(name).to_pylist() for name in tbl.column_names}
            n = tbl.num_rows
            for i in range(n):
                row = []
                for name, tname in fields:
                    if name == "event_id":
                        row.append(next_id + i)
                    elif name == "ts":
                        row.append(ts)
                    elif name == "event_type":
                        v = cols.get("event_type", [None] * n)[i]
                        row.append(v if v is not None else event_type)
                    else:
                        v = cols.get(name, [None] * n)[i]
                        if name == "source_event_id" and v is not None:
                            v = int(v)
                        row.append(v)
                out.append(tuple(row))
            next_id += n
        return out

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = max(start["segment"], cleared_before(self._dir))
        hi = next_segment_index(self._dir)
        hi = min(hi, lo + self._max_per_batch)  # bounded admission (H5)
        # iter(list), not a generator: the engine's prefetch cache needs
        # an iterator it can copy.copy (generators can't) that also
        # supports next() for the offset-advance check (lists don't).
        return iter(self._rows_between(lo, hi)), {"segment": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter(self._rows_between(start["segment"], end["segment"]))

    def commit(self, end: dict) -> None:
        pass  # retention is the publisher's concern; nothing to ack


class TopicDataSource(DataSource):
    """`format("aes_topic")` — options: path, schema_json,
    start_segment (pinned subscription point), max_segments_per_batch."""

    @classmethod
    def name(cls) -> str:
        return "aes_topic"

    def schema(self):
        return StructType.fromJson(json.loads(self.options["schema_json"]))

    def simpleStreamReader(self, schema: StructType) -> TopicStreamReader:
        return TopicStreamReader(schema, dict(self.options))
