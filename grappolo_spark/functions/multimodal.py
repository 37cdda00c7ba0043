"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` passes. The decode step itself is STUBBED
(no image/audio libs in this container): ``decode_stub=True`` produces a
deterministic fake feature vector from the payload bytes, and
``decode_stub=False`` raises ``NotImplementedError`` at the point where a
real codec (PIL/ffmpeg) would be called. Everything Spark-side — schema,
batch iteration, partitioning, output contract — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, mime string, width int, height int, "
    "duration_ms int, payload binary"
)

FEATURE_SCHEMA = "media_id long, kind string, feature array<float>, n_bytes int"


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * 4  # 128 bytes
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 if kind != "audio" else None,
                64 if kind != "audio" else None,
                1000 if kind != "image" else None,
                bytearray(payload),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder+encoder: bytes -> R^dim."""
    h = hashlib.sha256(payload).digest()
    arr = np.frombuffer(h[: dim * 4], dtype=np.uint32).astype(np.float64)
    return (arr / np.float64(2**32)).astype(np.float32).tolist()


def extract_features(
    df: DataFrame, dim: int = 8, decode_stub: bool = True
) -> DataFrame:
    """media table → (media_id, kind, feature, n_bytes) via mapInPandas.

    With ``decode_stub=False`` this is where PIL/librosa/ffmpeg would decode
    the payload; the container has none of them, so it raises — the marked
    extension point for a real deployment.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/librosa/ffmpeg — "
                    "not available in this environment"
                )
            feats = [_fake_feature(bytes(p), dim) for p in b["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "kind": b["kind"],
                    "feature": feats,
                    "n_bytes": b["payload"].map(len),
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(
        gen, schema=FEATURE_SCHEMA
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 200) -> DataFrame:
    """For video rows: the (media_id, frame_ts_ms) sampling plan — pure
    column math (sequence), ready to feed a decoder UDF."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
