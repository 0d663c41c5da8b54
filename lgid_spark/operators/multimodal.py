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


def _video_codec():
    """Capability probe for video decode (the optional-Pillow pattern):
    PyAV if importable, else imageio(+ffmpeg plugin), else None.
    Returns an adapter ``payload -> iterator of (ts_ms, frame_png)``
    so the sampling logic below is codec-agnostic and unit-testable
    with an injected fake adapter."""
    try:
        import av

        def _av_frames(payload: bytes):
            import io

            with av.open(io.BytesIO(payload)) as container:
                stream = container.streams.video[0]
                tb = float(stream.time_base) if stream.time_base else 0.0
                for frame in container.decode(stream):
                    ts = frame.time
                    if ts is None:
                        ts = (frame.pts or 0) * tb
                    buf = io.BytesIO()
                    frame.to_image().save(buf, format="PNG")
                    yield int(ts * 1000), buf.getvalue()

        return _av_frames
    except ImportError:
        pass
    try:
        import imageio.v3 as iio

        def _iio_frames(payload: bytes):
            # no plugin pin: this branch runs exactly when PyAV is NOT
            # importable, so pinning plugin="pyav" would guarantee a
            # call-time ImportError — let imageio resolve whatever
            # video backend it ships (e.g. imageio-ffmpeg)
            meta = iio.immeta(payload)
            fps = float(meta.get("fps") or 0.0) or 25.0
            for i, frame in enumerate(iio.imiter(payload)):
                try:
                    data = iio.imwrite("<bytes>", frame, extension=".png")
                except Exception:
                    # no still-image backend for PNG: raw pixel bytes
                    data = frame.tobytes()
                yield int(i * 1000 / fps), data

        return _iio_frames
    except ImportError:
        return None


def sample_decoded_frames(frames, every_ms: int):
    """Timestamp-grid sampling over a real decoded (ts_ms, bytes)
    stream: for each tick t = 0, every_ms, 2*every_ms, … emit the
    FIRST frame whose timestamp reaches t (a frame can satisfy at most
    one tick; ticks the stream never reaches emit nothing). Pure logic
    shared by every codec adapter — unit-tested with a fake stream so
    the real path's sampling is pinned even where no codec ships."""
    out = []
    next_tick = 0
    for ts, data in frames:
        if ts >= next_tick:
            out.append((len(out), int(ts), data))
            next_tick = next_tick + every_ms
            if ts >= next_tick:  # sparse stream skipped whole ticks
                next_tick = (ts // every_ms + 1) * every_ms
    return out


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  strict: bool = False, decoder=None) -> DataFrame:
    """Frame sampling for video rows: ONE input row fans out to N frame
    rows (the batch shape that matters at scale — Arrow output batches
    are larger than input batches, and downstream ops see a frame-grain
    table partitioned like its parent media).

    When a video codec is importable on the executors (PyAV/imageio —
    `_video_codec`), frames are REALLY decoded and sampled on the
    every_ms timestamp grid (`sample_decoded_frames`), PNG-encoded.
    Without one (this container) the honest stub derives frame count
    from the row's `duration_ms` metadata and deterministic bytes from
    the payload; strict=True then raises instead. ``decoder`` overrides
    the probe with an explicit ``payload -> iter[(ts_ms, bytes)]``
    adapter (tests; custom codecs) — monkeypatching can't reach the
    Python workers, a closure-captured callable can."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        decode = decoder if decoder is not None else _video_codec()
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "video":
                    continue
                payload = bytes(r.payload)
                if decode is not None:
                    try:
                        for idx, ts, data in sample_decoded_frames(
                                decode(payload), every_ms):
                            rows.append((int(r.media_id), idx, ts, data))
                        continue
                    except Exception:
                        pass  # undecodable payload → stub path below
                if strict:
                    raise NotImplementedError(
                        "video codecs not available; install av or "
                        "imageio[pyav] for real frame decode")
                duration = int((r.meta or {}).get("duration_ms", "0"))
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
