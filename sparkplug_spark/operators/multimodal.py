"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step is STUBBED (no image/audio libraries in this container):
``decoder="fake"`` produces a deterministic pseudo-decode derived from the
payload's md5 so the full Spark pipeline — schema, partition sizing, Arrow
batch shape, UDF signature — is real and testable; ``decoder="real"``
raises ``NotImplementedError`` at the exact point a PIL/ffmpeg call would
slot in.

Scale notes: media payloads are large, so batch size is controlled by
``spark.sql.execution.arrow.maxRecordsPerBatch`` and partitions should be
sized by BYTES (``repartition_for_media``), not row count — 10k rows of
4 MB images is 40 GB in one task otherwise.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_META_SCHEMA",
    "attach_media_meta",
    "repartition_for_media",
    "decode_image_features",
    "resize_images",
    "extract_audio_features",
    "sample_video_frames",
]

#: Typed metadata struct carried beside the binary payload.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("size_bytes", T.LongType()),
    ]
)


def attach_media_meta(
    df: DataFrame, binary_col: str = "payload", mime: str = "application/octet-stream"
) -> DataFrame:
    """Add a typed ``media_meta`` struct (size from the payload; other
    fields null until a decoder fills them)."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length(F.col(binary_col)).cast("long").alias("size_bytes"),
        ),
    )


def repartition_for_media(
    df: DataFrame, binary_col: str = "payload", target_bytes_per_partition: int = 256 << 20
) -> DataFrame:
    """Repartition by PAYLOAD BYTES, not rows — the knob that keeps media
    tasks memory-bounded at 100 TB."""
    total = df.select(F.sum(F.length(F.col(binary_col))).alias("b")).first()["b"] or 0
    parts = max(1, int(total / target_bytes_per_partition) + 1)
    return df.repartition(parts)


def _real_image_decode(payload: bytes, dim: int) -> list[float]:
    """Actual pixel decode via Pillow: grayscale thumbnail grid, flattened
    to ``dim`` [0,1] floats.  Import is deferred so the fake path never
    needs the library."""
    import io
    import math

    import numpy as np
    from PIL import Image

    g = max(1, math.isqrt(dim - 1) + 1)  # smallest grid covering dim
    img = Image.open(io.BytesIO(payload)).convert("L").resize((g, g))
    arr = (np.asarray(img, dtype=np.float32) / 255.0).reshape(-1)[:dim]
    if arr.size < dim:
        arr = np.pad(arr, (0, dim - arr.size))
    return [float(x) for x in arr]


def _fake_image_decode(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real decode+embed: md5-seeded floats."""
    import hashlib

    out: list[float] = []
    seed = payload if payload is not None else b""
    h = hashlib.md5(seed).digest()
    for i in range(dim):
        j = i % len(h)
        out.append((h[j] + i) % 256 / 255.0)
    return out


def decode_image_features(
    df: DataFrame,
    binary_col: str = "payload",
    feature_dim: int = 16,
    decoder: str = "fake",
) -> DataFrame:
    """payload binary → ``features array<float>`` via Arrow-batched
    ``mapInPandas``.  The UDF boundary, output schema, and batch iteration
    are production-shaped; ``decoder="real"`` decodes pixels with Pillow
    when it is installed (checked eagerly on the driver, so a missing
    library fails fast with a clear error instead of mid-job), while
    ``decoder="fake"`` runs the identical pipeline with a deterministic
    md5-seeded stand-in — no image libraries required."""
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")
    if decoder == "real":
        try:
            import PIL  # noqa: F401  (driver-side availability probe)
        except ImportError as e:
            raise ImportError(
                "decode_image_features(decoder='real') requires Pillow; "
                "install it on driver and executors, or use "
                "decoder='fake' for the deterministic stand-in"
            ) from e
    decode = _real_image_decode if decoder == "real" else _fake_image_decode

    out_schema = T.StructType(
        df.schema.fields + [T.StructField("features", T.ArrayType(T.FloatType()))]
    )
    cols = df.columns

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf["features"] = [
                decode(p, feature_dim) for p in pdf[binary_col]
            ]
            yield pdf[cols + ["features"]]

    return df.mapInPandas(batches, schema=out_schema)


def _real_image_resize(payload: bytes, w: int, h: int) -> bytes:
    """Actual resize via Pillow, re-encoded as PNG bytes."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload)).resize((w, h))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def _fake_image_resize(payload: bytes, w: int, h: int) -> bytes:
    """Deterministic stand-in: md5-keyed bytes sized like a tiny grayscale
    (w*h) buffer — same shape/nullability as the real path, no library."""
    import hashlib

    seed = payload if payload is not None else b""
    h0 = hashlib.md5(seed).digest()
    n = max(1, (w * h) // 16)
    return (h0 * (n // len(h0) + 1))[:n]


def resize_images(
    df: DataFrame,
    size: tuple[int, int] = (64, 64),
    binary_col: str = "payload",
    out_col: str = "payload_resized",
    decoder: str = "fake",
) -> DataFrame:
    """payload binary → resized payload binary + declared (width, height)
    columns, via the same Arrow-batched ``mapInPandas`` plumbing as
    :func:`decode_image_features` — the preprocessing step in front of a
    vision-model featurizer.  ``decoder="real"`` resizes pixels with
    Pillow (probed eagerly driver-side); ``decoder="fake"`` runs the
    identical batch pipeline with a deterministic md5-keyed byte stub.
    Pair with :func:`repartition_for_media` so tasks stay byte-bounded."""
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")
    if decoder == "real":
        try:
            import PIL  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "resize_images(decoder='real') requires Pillow; use "
                "decoder='fake' for the deterministic stand-in"
            ) from e
    resize = _real_image_resize if decoder == "real" else _fake_image_resize
    w, h = int(size[0]), int(size[1])
    if w <= 0 or h <= 0:
        raise ValueError("size must be positive")

    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField(out_col, T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )
    cols = df.columns

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf[out_col] = [resize(p, w, h) for p in pdf[binary_col]]
            pdf["width"] = w
            pdf["height"] = h
            yield pdf[cols + [out_col, "width", "height"]]

    return df.mapInPandas(batches, schema=out_schema)


def extract_audio_features(
    df: DataFrame,
    binary_col: str = "payload",
    frame_ms: int = 25,
    n_mels: int = 8,
    decoder: str = "fake",
) -> DataFrame:
    """payload audio → per-clip mel-style feature matrix
    (``features array<array<float>>``, one row of ``n_mels`` floats per
    ``frame_ms`` frame) via Arrow-batched ``mapInPandas``.

    Fake decoder derives frame count from payload size (1 KB ≅ 1 s) and
    fills deterministic md5-seeded values; ``decoder="real"`` raises at the
    exact point a librosa/torchaudio call would slot in."""
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")

    out_schema = T.StructType(
        df.schema.fields
        + [T.StructField("features", T.ArrayType(T.ArrayType(T.FloatType())))]
    )
    cols = df.columns

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            if decoder == "real":
                raise NotImplementedError(
                    "real audio decode requires librosa/torchaudio — not in "
                    "this container; plug the mel-spectrogram call here"
                )
            feats = []
            for p in pdf[binary_col]:
                payload = p if p is not None else b""
                duration_ms = max(len(payload), 1)
                n_frames = max(1, duration_ms // frame_ms)
                h = hashlib.md5(payload).digest()
                feats.append(
                    [
                        [((h[(f + m) % len(h)] + f) % 256) / 255.0 for m in range(n_mels)]
                        for f in range(min(n_frames, 1000))
                    ]
                )
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf[cols + ["features"]]

    return df.mapInPandas(batches, schema=out_schema)


def sample_video_frames(
    df: DataFrame,
    binary_col: str = "payload",
    every_ms: int = 1000,
    decoder: str = "fake",
) -> DataFrame:
    """payload → exploded (frame_idx, frame_ts_ms, frame binary) rows.
    Fake decoder emits one pseudo-frame per ``every_ms`` of a pretend
    duration derived from the payload size (1 KB ≅ 1 s)."""
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_ts_ms", T.LongType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )
    cols = df.columns

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            if decoder == "real":
                raise NotImplementedError(
                    "real frame sampling requires ffmpeg — not in this "
                    "container; plug the demux call here"
                )
            rows = []
            for _, r in pdf.iterrows():
                payload = r[binary_col] or b""
                duration_ms = max(len(payload), 1)
                for idx, ts in enumerate(range(0, duration_ms, every_ms)):
                    frame = hashlib.md5(payload + str(idx).encode()).digest()
                    rows.append({**{c: r[c] for c in cols}, "frame_idx": idx, "frame_ts_ms": ts, "frame": frame})
            yield pd.DataFrame(rows, columns=cols + ["frame_idx", "frame_ts_ms", "frame"])

    return df.mapInPandas(batches, schema=out_schema)
