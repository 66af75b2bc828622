"""util.artifact memo discipline: build-once/hit-after, LRU bound,
explicit clear, and the event log bench.py uses to attribute warm-memo
timings (round-2 advice: eviction + visibility for the artifact cache)."""

from __future__ import annotations

from async_event_streams_spark import util
from async_event_streams_spark.util import (
    artifact,
    clear_artifacts,
    drain_artifact_events,
)


def _builds_counter(spark, key, calls):
    def build():
        calls.append(key)
        return spark.range(3).toDF("n")

    return build


def test_artifact_builds_once_then_hits(spark):
    clear_artifacts(spark)
    drain_artifact_events()
    calls: list[str] = []
    a1 = artifact(spark, "t:k1", _builds_counter(spark, "t:k1", calls))
    a2 = artifact(spark, "t:k1", _builds_counter(spark, "t:k1", calls))
    assert calls == ["t:k1"]  # second call is a memo hit
    assert a1 is a2
    assert drain_artifact_events() == [("t:k1", "build"), ("t:k1", "hit")]
    assert drain_artifact_events() == []  # drained


def test_artifact_lru_bound_evicts_oldest(spark, monkeypatch):
    clear_artifacts(spark)
    monkeypatch.setattr(util, "MAX_ARTIFACTS_PER_SESSION", 2)
    calls: list[str] = []
    for k in ("t:a", "t:b", "t:c"):
        artifact(spark, k, _builds_counter(spark, k, calls))
    # t:a (oldest) was evicted when t:c arrived -> re-access rebuilds;
    # t:c (recent) is still a hit
    artifact(spark, "t:c", _builds_counter(spark, "t:c", calls))
    artifact(spark, "t:a", _builds_counter(spark, "t:a", calls))
    assert calls == ["t:a", "t:b", "t:c", "t:a"]


def test_artifact_hit_refreshes_lru_position(spark, monkeypatch):
    clear_artifacts(spark)
    monkeypatch.setattr(util, "MAX_ARTIFACTS_PER_SESSION", 2)
    calls: list[str] = []
    artifact(spark, "t:a", _builds_counter(spark, "t:a", calls))
    artifact(spark, "t:b", _builds_counter(spark, "t:b", calls))
    artifact(spark, "t:a", _builds_counter(spark, "t:a", calls))  # touch a
    artifact(spark, "t:c", _builds_counter(spark, "t:c", calls))  # evicts b
    artifact(spark, "t:a", _builds_counter(spark, "t:a", calls))  # still hit
    assert calls == ["t:a", "t:b", "t:c"]


def test_clear_artifacts_releases_session_entries(spark):
    clear_artifacts(spark)
    calls: list[str] = []
    artifact(spark, "t:x", _builds_counter(spark, "t:x", calls))
    assert clear_artifacts(spark) >= 1
    artifact(spark, "t:x", _builds_counter(spark, "t:x", calls))
    assert calls == ["t:x", "t:x"]  # rebuilt after clear
