"""Multimodal column plumbing: opaque binary payloads with typed
metadata, processed via Arrow-batched mapInPandas (driver mandate,
SURVEY.md §2-C).

The Spark-side machinery is real — schemas, content addressing,
batch-shaped UDF signatures, partition-aware iteration; only the codec
itself is stubbed (image/audio libraries are not available in this
environment). `decode_image` raises NotImplementedError unless
`fake=True`, which substitutes a deterministic structural decode so the
pipeline shape (binary → features) is testable end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The mapInPandas batch function references module-level helpers
# (decode_image); ship this module BY VALUE inside the UDF pickle so
# executors don't need an importable copy of the package.
try:
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:
    pass

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Canonical multimodal asset schema: opaque payload + typed metadata.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", StringType(), False),  # content-addressed
        StructField("modality", StringType(), False),  # image|audio|video|text
        StructField("payload", BinaryType(), True),  # opaque bytes
        StructField("mime", StringType(), True),
        StructField("n_bytes", LongType(), False),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", StringType(), False),
        StructField("modality", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def to_assets(df: DataFrame, payload_col: str, modality: str) -> DataFrame:
    """Wrap a binary column as canonical assets: content-addressed id
    (sha256 of the bytes — dedup/join key), modality tag, byte size.
    All built-in expressions; no Python in this step."""
    payload = F.col(payload_col).cast("binary")
    return df.select(
        F.sha2(payload, 256).alias("asset_id"),
        F.lit(modality).alias("modality"),
        payload.alias("payload"),
        F.lit(None).cast("string").alias("mime"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


def decode_image(payload: bytes, fake: bool = False) -> tuple[int, int, list[float]]:
    """STUB: real image decode (PIL/OpenCV) is unavailable in this
    container. fake=True yields a deterministic structural stand-in
    (dimensions and a tiny 'feature' derived from the digest) so the
    distributed plumbing is exercised with real data flow."""
    if not fake:
        raise NotImplementedError(
            "image codecs not available in this environment; "
            "pass fake=True for the deterministic structural decode"
        )
    digest = hashlib.sha256(payload or b"").digest()
    width = 16 + digest[0] % 64
    height = 16 + digest[1] % 64
    feature = [b / 255.0 for b in digest[:8]]
    return width, height, feature


def extract_features(assets: DataFrame, fake_decode: bool = False) -> DataFrame:
    """binary → features via mapInPandas: Arrow-batched, partition-
    parallel, constant memory per batch (never materializes a partition
    of payloads at once). At scale the decode cost dominates, so
    parallelism == input partitions — repartition upstream to match
    cluster cores."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                decode_image(p, fake=fake_decode) for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "feature": [d[2] for d in decoded],
                }
            )

    return assets.mapInPandas(decode_batches, schema=FEATURE_SCHEMA)
