"""Multimodal column plumbing: opaque binary payloads + typed
metadata, decoded/feature-extracted via Arrow-batched mapInPandas.

Image/audio/video payloads are `binary` columns; real decoders
(PIL/ffmpeg/torchaudio) are NOT available in this environment, so the
decode step is a clearly-marked stub behind `decoder=`:
  * "fake"  — deterministic pseudo-decoder (metadata and features are
    pure functions of the bytes via md5) so the Spark-side plumbing
    (schemas, batching, partitioning, UDF signatures) is fully
    testable;
  * "pil" / any real decoder — raises NotImplementedError with the
    integration point documented.

At scale: payload columns should live in their own parquet files
(Iceberg column projection keeps metadata-only queries from touching
bytes), batches stay bounded by `spark.sql.execution.arrow.
maxRecordsPerBatch`, and partitioning follows the storage layout —
these operators add no shuffle.
"""

from __future__ import annotations

import hashlib
import struct

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("format", StringType()),
        StructField("n_bytes", IntegerType()),
    ]
)

FEATURE_DIM = 8
# double, not float: float32 storage would truncate the rounded values
# the exact-compare oracle checks
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)

_FORMATS = ("jpeg", "png", "webp", "gif")


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for an image header parse."""
    h = hashlib.md5(payload).digest()
    w = 64 + (h[0] | (h[1] << 8)) % 1985
    ht = 64 + (h[2] | (h[3] << 8)) % 1985
    fmt = _FORMATS[h[4] % len(_FORMATS)]
    return w, ht, fmt


def _fake_features(payload: bytes) -> list[float]:
    h = hashlib.md5(b"feat:" + payload).digest()
    return [
        struct.unpack("<H", h[2 * i : 2 * i + 2])[0] / 65535.0
        for i in range(FEATURE_DIM)
    ]


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Test-fixture helper: synthesize a binary payload column from
    text (stands in for a real image-bytes column)."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def decode_image_metadata(
    df: DataFrame, payload_col: str = "payload", decoder: str = "fake"
) -> DataFrame:
    """binary payload -> (doc_id, width, height, format, n_bytes)."""
    if decoder != "fake":
        raise NotImplementedError(
            f"decoder {decoder!r}: real image decoding needs PIL/libvips on "
            "executors; plug it into _fake_decode's slot (same signature)"
        )

    proj = df.select("doc_id", payload_col)

    def gen(batches):
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "width", "height", "format", "n_bytes")}
            for did, payload in zip(pdf["doc_id"], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                w, h, fmt = _fake_decode(b)
                rows["doc_id"].append(int(did))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["format"].append(fmt)
                rows["n_bytes"].append(len(b))
            yield pd.DataFrame(rows)

    return proj.mapInPandas(gen, IMAGE_META_SCHEMA)


def extract_features(
    df: DataFrame, payload_col: str = "payload", decoder: str = "fake"
) -> DataFrame:
    """binary payload -> (doc_id, features: array<double>[8])."""
    if decoder != "fake":
        raise NotImplementedError(
            f"decoder {decoder!r}: plug a real embedding model into "
            "_fake_features (Arrow batch in, list[float] out)"
        )

    proj = df.select("doc_id", payload_col)

    def gen(batches):
        for pdf in batches:
            dids, feats = [], []
            for did, payload in zip(pdf["doc_id"], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                dids.append(int(did))
                feats.append(_fake_features(b))
            yield pd.DataFrame({"doc_id": dids, "features": feats})

    return proj.mapInPandas(gen, FEATURE_SCHEMA)


def frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    n_frames: int = 4,
    decoder: str = "fake",
) -> DataFrame:
    """video payload -> one row per sampled frame
    (doc_id, frame_idx, frame: binary) — the explode-shaped op a video
    pipeline needs; fake decoder slices the payload deterministically."""
    if decoder != "fake":
        raise NotImplementedError("plug ffmpeg keyframe extraction here")

    proj = df.select("doc_id", payload_col)
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame", BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame": []}
            for did, payload in zip(pdf["doc_id"], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                step = max(1, len(b) // n_frames)
                for i in range(n_frames):
                    rows["doc_id"].append(int(did))
                    rows["frame_idx"].append(i)
                    rows["frame"].append(b[i * step : (i + 1) * step])
            yield pd.DataFrame(rows)

    return proj.mapInPandas(gen, schema)
