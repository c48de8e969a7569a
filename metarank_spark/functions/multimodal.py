"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, Arrow batch shape,
partitioning, UDF signatures. The actual codec calls are STUBBED: this
container has no image/audio libraries, so ``decode_media`` raises
NotImplementedError for real codecs and tests use the deterministic fake
(``fake=True``) which derives a fixed-size feature vector from the bytes.
Swapping in PIL/torchaudio/decord is a body-of-one-function change; the
distributed plan is unchanged.

Plan shape at scale:
- media rows are heavy (KB–MB): process with ``mapInPandas`` so each Arrow
  batch bounds memory (`spark.sql.execution.arrow.maxRecordsPerBatch`
  applies); repartition by size beforehand so batches are even;
- decode → feature-extract stays columnar end-to-end: bytes in, fixed-dim
  float arrays out; no per-row Python calls outside the batch loop.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def decode_media(media_type: str, content: bytes, fake: bool = False) -> np.ndarray:
    """Decode one media payload to a FEATURE_DIM feature vector.

    Real codecs are not available in this environment — the ``fake`` path
    is a deterministic stand-in (SHA-256 of the bytes → 16 floats in
    [0, 1)) that keeps every distributed aspect testable."""
    if not fake:
        raise NotImplementedError(
            f"no codec for {media_type!r} in this environment; "
            "install PIL/torchaudio/decord and replace this branch"
        )
    digest = hashlib.sha256(content or b"").digest()
    arr = np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
    return arr / np.float32(65536.0)


def extract_features(df: DataFrame, fake: bool = False, batch_rows: int = 256) -> DataFrame:
    """media table → (media_id, media_type, n_bytes, features[FEATURE_DIM]).

    Arrow-batched ``mapInPandas``; decode happens per batch with numpy
    output assembly (no row-at-a-time Python beyond the codec call the
    stub replaces)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_media(mt, ct, fake=fake).tolist()
                for mt, ct in zip(pdf["media_type"], pdf["content"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(c or b"") for c in pdf["content"]],
                    "features": feats,
                }
            )

    return df.mapInPandas(run, schema=FEATURES_SCHEMA)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (binary payload derived
    from the id)."""
    rows = [
        (
            f"m{i}",
            ("image", "audio", "video")[i % 3],
            (f"payload-{i}".encode()) * (i % 7 + 1),
            {"w": str(64 + i), "h": str(64 + i)},
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def resize_images(
    df: DataFrame, width: int, height: int, fake: bool = False
) -> DataFrame:
    """Image resize plumbing: (media table) → (media_id, width, height,
    resized bytes). The Spark side is real — Arrow-batched mapInPandas,
    binary out, exact width*height-byte payload contract — while the pixel
    work is the stubbed codec (fake = deterministic bytes derived from a
    SHA-256 keystream over the input, sized w*h like a grayscale buffer)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = width * height
        for pdf in batches:
            out = []
            for mid, ct in zip(pdf["media_id"], pdf["content"]):
                if not fake:
                    raise NotImplementedError(
                        "no image codec in this environment; install PIL "
                        "and replace this branch"
                    )
                seed = hashlib.sha256((ct or b"") + mid.encode()).digest()
                reps = n // len(seed) + 1
                out.append((seed * reps)[:n])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "content": out,
                }
            )

    return df.filter(df.media_type == "image").mapInPandas(run, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(df: DataFrame, every_ms: int = 1000, fake: bool = False) -> DataFrame:
    """Video frame sampling plumbing: one input row fans out to one row
    per sampled frame at ``every_ms`` stride over the clip duration
    (``meta['duration_ms']``, default one frame). The row explosion,
    timestamps, and binary-out schema are the real distributed shape;
    frame decode is the stubbed codec (fake = per-frame SHA-256 bytes)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for mid, ct, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                if not fake:
                    raise NotImplementedError(
                        "no video codec in this environment; install "
                        "decord/ffmpeg and replace this branch"
                    )
                dur = int((meta or {}).get("duration_ms", 0))
                n = max(1, dur // every_ms)
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    frames.append(
                        hashlib.sha256((ct or b"") + f"{mid}:{i}".encode()).digest()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_ts_ms": tss, "frame": frames}
            )

    return df.filter(df.media_type == "video").mapInPandas(run, schema=FRAMES_SCHEMA)
