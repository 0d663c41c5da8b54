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


def _pillow():
    """Capability probe: the real codec when the environment has one."""
    try:
        from PIL import Image
        return Image
    except ImportError:
        return None


def decode_image(payload: bytes, strict: bool = False) -> tuple[int, int, list[float]]:
    """Real decode when Pillow is installed, honest stub otherwise.

    With Pillow present and a decodable payload: true (width, height)
    and a FEATURE_DIM-dim feature = 4×4 grayscale thumbnail intensities
    — a deterministic, library-version-stable embedding stand-in. With
    Pillow absent (this container) or the payload undecodable:
    strict=True raises (the honest production posture when the codec
    is missing); otherwise a deterministic fake decode derived from
    the payload bytes, so batch shapes / schemas / partitioning are
    exercised for real."""
    Image = _pillow()
    if Image is not None:
        import io

        try:
            with Image.open(io.BytesIO(payload)) as img:
                width, height = img.size
                thumb = img.convert("L").resize((4, 4))
                feat = [p / 255.0 for p in thumb.getdata()]
            return width, height, feat[:FEATURE_DIM]
        except Exception:
            pass  # not an image this codec understands → stub path
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


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("payload", T.BinaryType()),
])


def resize_media(media: DataFrame, width: int, height: int,
                 strict: bool = False) -> DataFrame:
    """Resize with REAL plumbing: mapInPandas binary→binary, output
    schema carries the target dims. When Pillow is installed and the
    payload decodes, the resize is real (PNG re-encode); otherwise the
    stub payload's size scales with the target pixel count
    (deterministic bytes derived from the source payload; strict
    raises when no codec can handle the row)."""

    def run(batches: Iterator) -> Iterator:
        import io

        import pandas as pd

        Image = _pillow()
        n_bytes = max(8, (width * height) // 64)
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if Image is not None:
                    try:
                        with Image.open(io.BytesIO(bytes(r.payload))) as img:
                            buf = io.BytesIO()
                            img.resize((width, height)).save(
                                buf, format="PNG")
                        rows.append((int(r.media_id), r.kind, width,
                                     height, buf.getvalue()))
                        continue
                    except Exception:
                        pass  # undecodable → stub path below
                if strict:
                    raise NotImplementedError(
                        "media codecs not available; plug Pillow resize")
                seed = bytes(r.payload) + struct.pack(">II", width, height)
                out = b""
                k = 0
                while len(out) < n_bytes:
                    out += hashlib.md5(seed + bytes([k % 256])).digest()
                    k += 1
                rows.append((int(r.media_id), r.kind, width, height,
                             out[:n_bytes]))
            yield pd.DataFrame(rows, columns=RESIZED_SCHEMA.fieldNames())

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("ts_ms", T.IntegerType()),
    T.StructField("frame", T.BinaryType()),
])


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  strict: bool = False) -> DataFrame:
    """Frame sampling for video rows: ONE input row fans out to N frame
    rows (the batch shape that matters at scale — Arrow output batches
    are larger than input batches, and downstream ops see a frame-grain
    table partitioned like its parent media). Frame count comes from the
    row's `duration_ms` metadata; payload decode is the honest stub."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "video":
                    continue
                if strict:
                    raise NotImplementedError(
                        "video codecs not available; plug ffmpeg here")
                duration = int((r.meta or {}).get("duration_ms", "0"))
                payload = bytes(r.payload)
                for idx, ts in enumerate(range(0, duration, every_ms)):
                    frame = hashlib.md5(
                        payload + struct.pack(">I", ts)).digest()
                    rows.append((int(r.media_id), idx, ts, frame))
            yield pd.DataFrame(rows, columns=FRAME_SCHEMA.fieldNames())

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


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
                meta = {"src": f"s{i % 5}"}
                if kind == "video":
                    meta["duration_ms"] = str(1000 * (2 + i % 5))
                rows.append((i, kind, payload, meta))
            yield pd.DataFrame(rows, columns=MEDIA_SCHEMA.fieldNames())

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)
