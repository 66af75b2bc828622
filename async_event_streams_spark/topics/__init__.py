"""Topic/pipe pub-sub layer: the reference-faithful streaming core.

Re-expresses the reference's pub/sub primitives on Structured Streaming
(mapping table in SURVEY.md §1.1/§2-A):

- ``Topic``            ≈ `EventStreams<EVT>` (typed topic, broadcast fan-out)
- ``Topic.post``       ≈ `post_event` (fire-and-forget publish)
- ``Topic.send``       ≈ `send_event` (publish + completion barrier)
- ``Topic.subscribe``  ≈ `create_event_stream` (future events only)
- ``Topic.count``      ≈ `EventStreams::count` (live subscribers)
- ``Topic.clear``      ≈ `EventStreams::clear` (drop pending events)
- ``pipe``             ≈ `spawn_event_pipe` (source→fn→sink with auto-lineage)
- ``@sink``            ≈ `EventSink` / derive macro (batch-handler registration)

The transport is a file-channel custom PySpark DataSource
(`topics/datasource.py`): events spool to segment files (bounded memory,
unlike the reference's unbounded in-memory queues — SURVEY.md §8-H5) and
every subscriber is an independent streaming query with latest-offset
subscribe semantics.
"""

from .topic import SentEvent, Topic, TopicRegistry  # noqa: F401
from .partitioned import PartitionedSentEvent, PartitionedTopic  # noqa: F401
from .pipe import pipe, sink  # noqa: F401
from .datasource import TopicDataSource  # noqa: F401
