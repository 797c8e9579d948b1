"""Multimodal (image/audio/video) column plumbing.

Media lives as opaque ``binary`` columns with typed metadata, exactly like
the engine's ``content`` column. Decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages so bytes never
take the row-at-a-time Python path.

The decode kernels themselves are STUBBED (no image/audio libs in this
container): ``decode=fake`` produces a deterministic fake decode from the
bytes (so the Spark-side plumbing — schema, partitioning, UDF signature,
batch shape — is real and testable); ``decode=real`` raises
NotImplementedError where PIL/librosa/av would be called.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("data", T.BinaryType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES_DDL = (
    "media_id long, width int, height int, channels int, feature array<float>"
)


def _fake_decode_image(data: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for a real decoder: dims and a 16-d feature
    derived from the sha256 of the bytes. Replace with PIL + model when
    the libs exist."""
    h = hashlib.sha256(data or b"").digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    feature = [((b / 255.0) * 2.0 - 1.0) for b in h[:16]]
    return width, height, 3, feature


def extract_image_features(
    df: DataFrame, data_col: str = "data", id_col: str = "media_id",
    decode: str = "fake",
) -> DataFrame:
    """binary → (dims, feature vector) via mapInPandas (Arrow batches).

    Partitioning: rows are processed in-place per input partition — no
    shuffle. At 100 TB, upstream should repartition by size so a batch of
    large blobs doesn't exceed executor memory (same per-task byte budget
    as the ingest walker).
    """
    if decode == "real":
        raise NotImplementedError(
            "real image decode requires PIL/torchvision (not in this container)"
        )
    if decode != "fake":
        raise ValueError(f"unknown decode mode {decode!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [_fake_decode_image(d) for d in pdf[data_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].values,
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "channels": [d[2] for d in decoded],
                    "feature": [d[3] for d in decoded],
                }
            )

    return df.select(id_col, data_col).mapInPandas(batches, IMAGE_FEATURES_DDL)


AUDIO_FEATURES_DDL = (
    "media_id long, sample_rate int, n_samples long, duration_s double, "
    "mfcc array<float>"
)


def _fake_decode_audio(data: bytes) -> tuple[int, int, float, list[float]]:
    """Deterministic stand-in for a real audio decoder (librosa/soundfile
    absent): sample rate / length / a 13-d MFCC-shaped feature derived
    from the byte hash."""
    h = hashlib.sha256(data or b"").digest()
    sample_rate = (8000, 16000, 22050, 44100)[h[0] % 4]
    n_samples = 1000 + int.from_bytes(h[1:4], "big") % 1_000_000
    duration = n_samples / sample_rate
    mfcc = [((b / 255.0) * 40.0 - 20.0) for b in h[4:17]]
    return sample_rate, n_samples, duration, mfcc


def extract_audio_features(
    df: DataFrame, data_col: str = "data", id_col: str = "media_id",
    decode: str = "fake",
) -> DataFrame:
    """audio binary → (sample_rate, n_samples, duration, mfcc-shaped
    feature) via mapInPandas. Same partitioning/batch contract as
    extract_image_features; real path would call soundfile + librosa."""
    if decode == "real":
        raise NotImplementedError(
            "real audio decode requires soundfile/librosa (not in this container)"
        )
    if decode != "fake":
        raise ValueError(f"unknown decode mode {decode!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [_fake_decode_audio(d) for d in pdf[data_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].values,
                    "sample_rate": [d[0] for d in decoded],
                    "n_samples": [d[1] for d in decoded],
                    "duration_s": [d[2] for d in decoded],
                    "mfcc": [d[3] for d in decoded],
                }
            )

    return df.select(id_col, data_col).mapInPandas(batches, AUDIO_FEATURES_DDL)


def sample_video_frames(
    df: DataFrame, data_col: str = "data", id_col: str = "media_id",
    every_n: int = 30, decode: str = "fake",
) -> DataFrame:
    """video binary → exploded frame rows (frame_idx, frame binary).

    Fake decode: derives a deterministic pseudo-frame count from the blob
    and emits sha256-derived 'frames'; the real path would use PyAV.
    """
    if decode == "real":
        raise NotImplementedError("real video decode requires PyAV")

    out_ddl = "media_id long, frame_idx int, frame binary"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, data in zip(pdf[id_col], pdf[data_col]):
                data = data or b""
                n_frames = 1 + (len(data) % 120)
                for fi in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(
                        hashlib.sha256(data + fi.to_bytes(4, "big")).digest()
                    )
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, data_col).mapInPandas(batches, out_ddl)


def media_table_from_entries(entries: DataFrame) -> DataFrame:
    """Adapt the canonical entries table into the media schema (content →
    data), classifying kind from magic bytes JVM-side."""
    magic = F.substring("content", 1, 12)
    kind = (
        F.when(magic.startswith(bytes([0x89]) + b"PNG"), "image")
        .when(magic.substr(1, 3) == F.lit(b"\xff\xd8\xff"), "image")
        .when(magic.substr(1, 4) == F.lit(b"RIFF"), "audio")
        .when(magic.substr(5, 4) == F.lit(b"ftyp"), "video")
        .otherwise("unknown")
    )
    return entries.select(
        F.xxhash64("source", "path").alias("media_id"),
        kind.alias("kind"),
        F.lit(None).cast("string").alias("mime"),
        F.col("content").alias("data"),
        F.create_map(F.lit("path"), F.col("path")).alias("meta"),
    )
