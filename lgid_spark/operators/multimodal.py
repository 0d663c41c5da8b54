"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata (training-data-pipeline requirement).

The Spark-side mechanics — schema, Arrow batch shape, partitioning,
mapInPandas signatures — are real and tested; the actual media decode
is stubbed (this container ships no image/audio libs) behind
`decode_image`, which either raises NotImplementedError (strict mode)
or produces a deterministic fake decode so the downstream plumbing can
be exercised end-to-end.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),        # image | audio | video
    T.StructField("payload", T.BinaryType()),     # opaque encoded bytes
    T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])

FEATURE_DIM = 16


def decode_image(payload: bytes, strict: bool = False) -> tuple[int, int, list[float]]:
    """STUB — a real deployment plugs Pillow/ffmpeg here.

    strict=True raises (the honest production posture when the codec is
    missing); otherwise returns a deterministic fake decode derived
    from the payload bytes, so batch shapes / schemas / partitioning
    are exercised for real."""
    if strict:
        raise NotImplementedError(
            "media codecs not available in this environment; "
            "install Pillow/ffmpeg and replace decode_image")
    h = hashlib.md5(payload).digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    feat = [
        struct.unpack(">H", hashlib.md5(payload + bytes([k])).digest()[:2])[0]
        / 65535.0
        for k in range(FEATURE_DIM)
    ]
    return width, height, feat


def extract_media_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """mapInPandas over binary payloads → typed feature rows.

    Arrow moves the binary column zero-copy into the worker; at scale
    this runs per-partition with bounded memory (payloads stream batch
    by batch, maxRecordsPerBatch caps the batch bytes)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                w, h, feat = decode_image(bytes(r.payload), strict=strict)
                rows.append((
                    int(r.media_id), r.kind, w, h, len(r.payload),
                    feat,
                ))
            yield pd.DataFrame(
                rows, columns=FEATURE_SCHEMA.fieldNames())

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def synthetic_media(spark, n: int) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                payload = hashlib.md5(f"media|{i}".encode()).digest() * (4 + i % 8)
                kind = ["image", "audio", "video"][i % 3]
                rows.append((i, kind, payload, {"src": f"s{i % 5}"}))
            yield pd.DataFrame(rows, columns=MEDIA_SCHEMA.fieldNames())

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)
