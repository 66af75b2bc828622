"""Multimodal plumbing: binary assets → content ids → feature extraction
via mapInPandas (stubbed codec, real distributed data flow)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from async_event_streams_spark.functions.multimodal import (
    decode_image,
    extract_features,
    to_assets,
)


@pytest.fixture()
def assets(spark):
    raw = spark.createDataFrame(
        [(i, bytes([i % 256]) * (100 + i)) for i in range(50)],
        "id long, blob binary",
    )
    return to_assets(raw, "blob", "image")


def test_assets_are_content_addressed(spark, assets):
    rows = assets.collect()
    assert len(rows) == 50
    assert all(len(r.asset_id) == 64 for r in rows)  # sha256 hex
    assert all(r.n_bytes == 100 + i for i, r in enumerate(sorted(rows, key=lambda r: r.n_bytes)))
    # identical payloads -> identical asset ids (dedup key)
    dup = assets.unionByName(assets).select("asset_id").distinct().count()
    assert dup == 50


def test_extract_features_runs_distributed(spark, assets):
    feats = extract_features(assets.repartition(4), fake_decode=True)
    rows = feats.collect()
    assert len(rows) == 50
    assert all(16 <= r.width < 80 and 16 <= r.height < 80 for r in rows)
    assert all(len(r.feature) == 8 for r in rows)
    # deterministic: same payload, same feature
    again = {r.asset_id: r.feature for r in extract_features(assets, fake_decode=True).collect()}
    assert all(again[r.asset_id] == r.feature for r in rows)


def test_real_decode_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError, match="not available"):
        decode_image(b"\x89PNG...")
