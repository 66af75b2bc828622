"""Multimodal column plumbing: opaque binary payloads with typed
metadata, processed via Arrow-batched mapInPandas (driver mandate,
SURVEY.md §2-C).

The Spark-side machinery is real — schemas, content addressing,
batch-shaped UDF signatures, partition-aware iteration. Real decode has
TWO backends per modality: Pillow / PyAV when importable (production —
any format), and the pure-stdlib PNG / YUV4MPEG2 codecs in
functions/codecs.py (always importable — the conformance anchor that
keeps the decode → feature arithmetic tested on real pixel data even
in codec-less containers). `fake=True` additionally substitutes a
deterministic structural decode so the pipeline shape (binary →
features, video → frame fan-out) is testable independent of any codec,
and a missing optional backend fails fast ON THE DRIVER with an
actionable message (never per-row on executors).
"""

from __future__ import annotations

import hashlib
import io
from collections.abc import Iterator

import pandas as pd

from . import codecs as _codecs

try:  # optional dependency: real image codec when available
    from PIL import Image as _PILImage
except Exception:  # pragma: no cover - environment-dependent
    _PILImage = None

try:  # optional dependency: real video codec when available
    import av as _av
except Exception:  # pragma: no cover - environment-dependent
    _av = None

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The mapInPandas batch function references module-level helpers
# (decode_image); ship this module BY VALUE inside the UDF pickle so
# executors don't need an importable copy of the package.
try:
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
    _cloudpickle.register_pickle_by_value(_codecs)
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


def _resolve_image_codec(codec: str) -> str:
    """codec= backends: "pillow" (any format Pillow reads — the
    production lane), "pure" (the stdlib PNG codec in
    functions/codecs.py — always importable, the conformance anchor
    that keeps the real-decode arithmetic tested in codec-less
    containers), "auto" (pillow when importable, else pure)."""
    if codec == "auto":
        return "pillow" if _PILImage is not None else "pure"
    if codec not in ("pillow", "pure"):
        raise ValueError(f"unknown image codec {codec!r} (pillow|pure|auto)")
    if codec == "pillow" and _PILImage is None:
        raise NotImplementedError(
            "image codec needs the optional Pillow dependency "
            "(pip install Pillow); pass fake=True for the deterministic "
            "structural decode, or codec='pure' for the stdlib PNG lane"
        )
    return codec


def decode_image(
    payload: bytes, fake: bool = False, codec: str = "pillow"
) -> tuple[int, int, list[float]]:
    """Decode image bytes → (width, height, feature): true dimensions
    plus a deterministic 16-float feature (4x4 box-averaged grayscale
    thumbnail, /255). Backends per `_resolve_image_codec` — the "pure"
    stdlib PNG lane is the normative integer definition of the feature
    contract (codecs.gray_thumb); the Pillow lane matches it up to
    resampling filter differences. fake=True forces the structural
    stand-in (dimensions and a tiny 'feature' derived from the digest)
    — used by the oracle-checked plumbing tests."""
    if fake:
        digest = hashlib.sha256(payload or b"").digest()
        width = 16 + digest[0] % 64
        height = 16 + digest[1] % 64
        feature = [b / 255.0 for b in digest[:8]]
        return width, height, feature
    if _resolve_image_codec(codec) == "pure":
        width, height, ch, pix = _codecs.png_decode(payload or b"")
        return width, height, _codecs.gray_thumb(width, height, ch, pix)
    with _PILImage.open(io.BytesIO(payload or b"")) as im:
        width, height = im.size
        thumb = im.convert("L").resize((4, 4))
        feature = [p / 255.0 for p in thumb.getdata()]
    return width, height, feature


def extract_features(
    assets: DataFrame, fake_decode: bool = False, codec: str = "pillow"
) -> DataFrame:
    """binary → features via mapInPandas: Arrow-batched, partition-
    parallel, constant memory per batch (never materializes a partition
    of payloads at once). At scale the decode cost dominates, so
    parallelism == input partitions — repartition upstream to match
    cluster cores.

    Backend availability is checked HERE, driver-side, so a missing
    codec fails at plan construction with one clear error instead of N
    executor task failures (codec="pure" is always available but only
    reads PNG payloads — bad rows surface as task errors, which is data
    quality, not a missing dependency)."""
    if not fake_decode:
        codec = _resolve_image_codec(codec)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                decode_image(p, fake=fake_decode, codec=codec)
                for p in pdf["payload"]
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

    # Prune to exactly what decode_batches reads BEFORE entering the
    # opaque UDF: Catalyst cannot prune through mapInPandas, so unused
    # asset columns (mime, n_bytes) would otherwise ride the Arrow
    # transfer for nothing (measured 3.5x on the frame lane at sf1).
    return assets.select("asset_id", "modality", "payload").mapInPandas(
        decode_batches, schema=FEATURE_SCHEMA
    )


def resize_payload(
    payload: bytes, width: int, height: int, fake: bool = False,
    codec: str = "pillow",
) -> bytes:
    """Resize image bytes to (width, height). Real resize via Pillow
    when importable (PNG-encoded output — deterministic given fixed
    Pillow). fake=True produces a deterministic stand-in of the RIGHT
    SHAPE — output size scales with the target dimensions (3
    bytes/pixel, content seeded by the source digest) so partition-size/
    memory behavior downstream is realistic. Without Pillow and without
    fake=True raises NotImplementedError. codec="pure" resizes PNG
    payloads with the stdlib codec (box-average, PNG filter-0 output —
    bit-deterministic with no dependency at all)."""
    if fake:
        seed = hashlib.sha256(
            (payload or b"") + f"{width}x{height}".encode()
        ).digest()
        n = width * height * 3
        return (seed * (n // len(seed) + 1))[:n]
    if _resolve_image_codec(codec) == "pure":
        w0, h0, ch, pix = _codecs.png_decode(payload or b"")
        return _codecs.png_encode(
            width, height, _codecs.box_resize_rgb(w0, h0, ch, pix, width, height)
        )
    with _PILImage.open(io.BytesIO(payload or b"")) as im:
        out = io.BytesIO()
        im.convert("RGB").resize((width, height)).save(out, format="PNG")
        return out.getvalue()


def resize_images(
    assets: DataFrame, width: int, height: int, fake_codec: bool = False,
    codec: str = "pillow",
) -> DataFrame:
    """Asset → asset transform (image resize): mapInPandas, output
    re-content-addressed (resized bytes get their own sha256 asset_id,
    so the resized corpus dedups/joins independently of the originals).
    Arrow-batched; memory per task bounded by the Arrow batch size, not
    the partition — safe when payloads are MBs each.

    Backend availability is checked driver-side (fail fast at plan
    construction, not per-row on executors); see extract_features for
    the codec="pure" envelope."""
    if not fake_codec:
        codec = _resolve_image_codec(codec)

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                resize_payload(p, width, height, fake=fake_codec, codec=codec)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": [hashlib.sha256(b).hexdigest() for b in out],
                    "modality": pdf["modality"],
                    "payload": out,
                    "mime": pdf["mime"],
                    "n_bytes": [len(b) for b in out],
                }
            )

    # Column-prune before the opaque UDF (see extract_features): the
    # batch fn reads modality/payload/mime only — never ship asset_id/
    # n_bytes of the SOURCE asset through Arrow (the output re-derives
    # both from the resized bytes).
    return assets.select("modality", "payload", "mime").mapInPandas(
        resize_batches, schema=ASSET_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", StringType(), False),  # source video
        StructField("frame_index", IntegerType(), False),
        StructField("frame_payload", BinaryType(), True),
        StructField("n_bytes", LongType(), False),
    ]
)

_FAKE_FRAME_BYTES = 256  # the stub codec's fixed 'frame' stride


def _resolve_video_codec(codec: str) -> str:
    """Backends: "pyav" (any container/codec FFmpeg reads), "pure"
    (the stdlib YUV4MPEG2 demuxer in functions/codecs.py — always
    importable), "auto" (pyav when importable, else pure)."""
    if codec == "auto":
        return "pyav" if _av is not None else "pure"
    if codec not in ("pyav", "pure"):
        raise ValueError(f"unknown video codec {codec!r} (pyav|pure|auto)")
    if codec == "pyav" and _av is None:
        raise NotImplementedError(
            "video codec needs the optional PyAV dependency "
            "(pip install av); pass fake_codec=True for the "
            "fixed-stride structural sampler, or codec='pure' for the "
            "stdlib YUV4MPEG2 lane"
        )
    return codec


def decode_video_frames(
    payload: bytes, every_n: int, max_frames: int, codec: str = "pyav"
) -> list[tuple[int, bytes]]:
    """Real video decode: demux + decode the first video stream, keep
    every `every_n`-th frame up to `max_frames`, each as raw RGB24
    bytes. Backends per `_resolve_video_codec` — PyAV for real
    containers, the stdlib Y4M demuxer as the always-available
    conformance lane. Returns [(frame_index, rgb_bytes)]."""
    if _resolve_video_codec(codec) == "pure":
        out: list[tuple[int, bytes]] = []
        for i, _w, _h, rgb in _codecs.y4m_frames(payload or b""):
            if i % every_n:
                continue
            if len(out) >= max_frames:
                break
            out.append((i, rgb))
        return out
    out: list[tuple[int, bytes]] = []
    with _av.open(io.BytesIO(payload or b"")) as container:
        stream = container.streams.video[0]
        for i, frame in enumerate(container.decode(stream)):
            if i % every_n:
                continue
            if len(out) >= max_frames:
                break
            out.append((i, frame.to_ndarray(format="rgb24").tobytes()))
    return out


def sample_frames(
    assets: DataFrame,
    every_n: int = 10,
    max_frames: int = 8,
    fake_codec: bool = False,
    codec: str = "pyav",
) -> DataFrame:
    """Video → frames (1→N row fan-out): every `every_n`-th frame, at
    most `max_frames` per video, one output row per sampled frame.

    Real codec via the optional PyAV dependency (decode_video_frames:
    demux → decode → RGB24 bytes per sampled frame); checked driver-
    side so a missing codec fails at plan construction, not per-row on
    executors. `fake_codec=True` keeps the deterministic stand-in (the
    payload treated as fixed-stride frames) the oracle-checked
    `x_frame_sample` replays. Either way the fan-out mechanics are the
    same deliverable — mapInPandas yielding MORE rows than it consumes,
    per-frame rows independently repartitionable downstream, memory
    bounded per Arrow batch (frames of one video never co-reside)."""
    if not fake_codec:
        codec = _resolve_video_codec(codec)
    if every_n < 1 or max_frames < 1:
        raise ValueError("every_n and max_frames must be >= 1")

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                payload = payload or b""
                if fake_codec:
                    n_frames = len(payload) // _FAKE_FRAME_BYTES
                    taken = 0
                    frames = []
                    for fi in range(0, n_frames, every_n):
                        if taken >= max_frames:
                            break
                        frames.append(
                            (
                                fi,
                                payload[
                                    fi * _FAKE_FRAME_BYTES : (fi + 1)
                                    * _FAKE_FRAME_BYTES
                                ],
                            )
                        )
                        taken += 1
                else:
                    frames = decode_video_frames(
                        payload, every_n, max_frames, codec=codec
                    )
                for fi, fp in frames:
                    ids.append(aid)
                    idxs.append(fi)
                    payloads.append(fp)
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "frame_index": pd.array(idxs, dtype="int32"),
                    "frame_payload": payloads,
                    "n_bytes": pd.array([len(p) for p in payloads], dtype="int64"),
                }
            )

    # Column-prune before the opaque UDF (see extract_features): the
    # frame fan-out reads (asset_id, payload) only; shipping the other
    # asset columns through Arrow measured 2.02 -> 0.58 s at sf1.
    return assets.select("asset_id", "payload").mapInPandas(
        frame_batches, schema=FRAME_SCHEMA
    )
