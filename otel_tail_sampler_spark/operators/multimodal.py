"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas stages over ``mapInPandas``. The decode kernels are
STUBBED (the container has no image/audio libs): ``decode_fn`` defaults to a
clearly-marked deterministic fake, and passing ``real=True`` raises
NotImplementedError where a real libjpeg/ffmpeg call would go. The Spark-side
plumbing — schema, partitioning, UDF signature, batch shape — is real and
tested.

Scale notes: payload columns are wide, so every transform here keeps the
binary column OUT of shuffles (mapInPandas is narrow); metadata-only plans
should select struct fields so Parquet column pruning drops the payload read
entirely.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, "
    "meta struct<width:int, height:int, n_frames:int, sample_rate:int, codec:string>"
)

FEATURE_DDL = (
    "media_id string, kind string, feat_dim int, features array<float>, "
    "payload_bytes int, payload_crc long"
)

RESIZE_DDL = "media_id string, kind string, out_width int, out_height int, payload_crc long"

FRAME_SAMPLE_DDL = "media_id string, frame_idx int, frame_crc long"


def synthetic_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic opaque payloads standing in for real image/video bytes."""
    rng = np.random.Generator(np.random.PCG64(seed))
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=256 + (i % 7) * 64, dtype=np.uint8).tobytes()
        meta = {
            "width": 64 + 16 * (i % 4) if kind != "audio" else None,
            "height": 48 + 16 * (i % 3) if kind != "audio" else None,
            "n_frames": 1 if kind == "image" else 24 + i % 10,
            "sample_rate": 16000 if kind == "audio" else None,
            "codec": {"image": "fake-jpeg", "audio": "fake-pcm", "video": "fake-h264"}[kind],
        }
        rows.append((f"m-{i:04d}", kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake 'decode+embed': sha256-seeded pseudo-features.
    A real implementation would decode via PIL/ffmpeg — NOT available here."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal(dim).astype(np.float32)


def extract_features(media: DataFrame, dim: int = 16, real: bool = False) -> DataFrame:
    """payload -> feature vector via Arrow-batched mapInPandas (batch shape:
    pandas DataFrames of full rows; payload stays in-task, never shuffled)."""
    if real:
        raise NotImplementedError(
            "real decoders (libjpeg/ffmpeg) are not installed in this "
            "environment; the plumbing below runs with the deterministic fake"
        )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(p, dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feat_dim": dim,
                    "features": [f.tolist() for f in feats],
                    "payload_bytes": pdf["payload"].map(len),
                    "payload_crc": pdf["payload"].map(
                        lambda b: zlib.crc32(b) & 0xFFFFFFFF
                    ),
                }
            )

    return media.mapInPandas(fn, FEATURE_DDL)


def resize_images(media: DataFrame, width: int, height: int, real: bool = False) -> DataFrame:
    """Resize stub: validates schema/flow; real kernel would be PIL.resize."""
    if real:
        raise NotImplementedError("image resize requires PIL — stubbed")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            img = pdf[pdf["kind"] == "image"]
            if len(img) == 0:
                continue
            yield pd.DataFrame(
                {
                    "media_id": img["media_id"],
                    "kind": img["kind"],
                    "out_width": width,
                    "out_height": height,
                    "payload_crc": img["payload"].map(
                        lambda b: zlib.crc32(b) & 0xFFFFFFFF
                    ),
                }
            )

    return media.mapInPandas(fn, RESIZE_DDL)


def sample_frames(media: DataFrame, every_n: int = 8, real: bool = False) -> DataFrame:
    """Frame sampling stub for video rows: emits one row per sampled frame
    index (UDTF-ish fan-out via mapInPandas)."""
    if real:
        raise NotImplementedError("frame extraction requires ffmpeg — stubbed")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vid = pdf[pdf["kind"] == "video"]
            out_ids, out_idx, out_crc = [], [], []
            for _, row in vid.iterrows():
                n = row["meta"]["n_frames"] or 0
                for fi in range(0, n, every_n):
                    out_ids.append(row["media_id"])
                    out_idx.append(fi)
                    out_crc.append(
                        zlib.crc32(row["payload"] + fi.to_bytes(4, "big")) & 0xFFFFFFFF
                    )
            if out_ids:
                yield pd.DataFrame(
                    {"media_id": out_ids, "frame_idx": out_idx, "frame_crc": out_crc}
                )

    return media.mapInPandas(fn, FRAME_SAMPLE_DDL)
