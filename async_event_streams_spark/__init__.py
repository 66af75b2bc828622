"""async_event_streams_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of `milyin/async-event-streams`
(reference surveyed in SURVEY.md; citations therein are `/root/reference/`
file:line).

Architecture (Spark-first, NOT a port):
- Batch relational surface: plain DataFrame programs (Catalyst optimizes).
- Topic/pipe pub-sub layer: Structured Streaming + a custom Python
  `DataSource` (`topics/`), re-expressing EventStreams/EventStream/pipes.
- LLM-pipeline extensions (dedup, similarity, text, multimodal): built-in
  `pyspark.sql.functions` wherever possible; Arrow-batched pandas UDFs only
  where built-ins can't express the semantics.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
