"""Multimodal columns: opaque binary payloads + typed metadata, processed
by Arrow-batched ``mapInPandas`` passes.

Payloads are ``binary`` columns with a typed metadata struct (kind, mime,
dimensions, duration). The container ships no media codecs (PIL / librosa /
ffmpeg), so compressed formats can't be decoded here — but RAW formats can,
with real array math:

- ``image/raw8``  : width*height uint8 grayscale buffer → decode, block-mean
  resize, 16-bin intensity histogram — genuine numpy image ops.
- ``audio/pcm16`` : int16 little-endian PCM → RMS, zero-crossing rate, and
  FFT spectral centroid — genuine numpy DSP.
- ``video/raw8``  : concatenated raw8 frames → the frame-sample plan (pure
  column math) selects timestamps, and the decoder slices exactly those
  frames by offset — a real frame extractor.

``decode_external()`` is the marked injection point where PIL/ffmpeg would
handle compressed mimes; it raises ``NotImplementedError`` in this
environment. Everything Spark-side (schema, batch iteration, partitioning,
output contract) and everything numpy-side above is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, mime string, width int, height int, "
    "duration_ms int, fps int, payload binary"
)

FEATURE_SCHEMA = "media_id long, kind string, feature array<float>, n_bytes int"

HIST_BINS = 16


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic raw-format media table (decodable without codecs):
    gradient-pattern raw8 images, sine-wave pcm16 audio, multi-frame raw8
    video. Seeded arithmetic only — reproducible everywhere."""
    rows = []
    w = h = 16
    sr = 8000  # samples/sec for pcm16
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            img = _gradient_image(w, h, phase=seed + i)
            rows.append(
                (i, kind, "image/raw8", w, h, None, None, bytearray(img.tobytes()))
            )
        elif kind == "audio":
            dur_ms = 250
            t = np.arange(int(sr * dur_ms / 1000))
            freq = 100 + 37 * ((seed + i) % 8)
            pcm = (10000 * np.sin(2 * np.pi * freq * t / sr)).astype("<i2")
            rows.append(
                (i, kind, "audio/pcm16", None, None, dur_ms, None,
                 bytearray(pcm.tobytes()))
            )
        else:
            fps, dur_ms = 5, 1000
            frames = [
                _gradient_image(w, h, phase=seed + i + f)
                for f in range(fps * dur_ms // 1000)
            ]
            rows.append(
                (i, kind, "video/raw8", w, h, dur_ms, fps,
                 bytearray(b"".join(fr.tobytes() for fr in frames)))
            )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _gradient_image(w: int, h: int, phase: int) -> np.ndarray:
    x = np.arange(w)[None, :] + np.arange(h)[:, None] + phase
    return (x % 256).astype(np.uint8)


def decode_external(mime: str, payload: bytes):
    """Injection point for real codecs (PIL/librosa/ffmpeg). The container
    has none, so compressed mimes are explicitly unsupported here."""
    raise NotImplementedError(
        f"decoding {mime} requires an external codec (PIL/librosa/ffmpeg) — "
        "not available in this environment; raw8/pcm16 decode natively"
    )


def _image_hist(img: np.ndarray) -> np.ndarray:
    hist = np.bincount(img.reshape(-1) >> 4, minlength=HIST_BINS).astype(np.float64)
    return (hist / img.size).astype(np.float32)


def _audio_features(pcm: np.ndarray, pad: int = HIST_BINS) -> np.ndarray:
    x = pcm.astype(np.float64) / 32768.0
    rms = float(np.sqrt((x * x).mean())) if len(x) else 0.0
    zcr = float((np.diff(np.signbit(x)) != 0).mean()) if len(x) > 1 else 0.0
    spec = np.abs(np.fft.rfft(x))
    centroid = float((spec * np.arange(len(spec))).sum() / spec.sum()) if spec.sum() else 0.0
    out = np.zeros(pad, dtype=np.float32)
    out[0], out[1], out[2] = rms, zcr, centroid / max(len(spec), 1)
    return out


def extract_features(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """media table → (media_id, kind, feature, n_bytes).

    Raw mimes decode and featurize with real numpy math (image histogram /
    audio DSP / first-frame histogram for video); other mimes route to
    :func:`decode_external`. ``decode_stub`` kept for API compatibility:
    False forces the external-codec path for every row.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = []
            for mime, w, h, p in zip(
                b["mime"], b["width"], b["height"], b["payload"]
            ):
                p = bytes(p)
                if not decode_stub or mime not in (
                    "image/raw8", "audio/pcm16", "video/raw8"
                ):
                    decode_external(mime, p)
                if mime == "image/raw8":
                    img = np.frombuffer(p, dtype=np.uint8).reshape(int(h), int(w))
                    feats.append(_image_hist(img))
                elif mime == "audio/pcm16":
                    feats.append(_audio_features(np.frombuffer(p, dtype="<i2")))
                else:  # video/raw8: featurize frame 0
                    fsz = int(w) * int(h)
                    img = np.frombuffer(p[:fsz], dtype=np.uint8).reshape(int(h), int(w))
                    feats.append(_image_hist(img))
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "kind": b["kind"],
                    "feature": feats,
                    "n_bytes": b["payload"].map(len),
                }
            )

    return df.select(
        "media_id", "kind", "mime", "width", "height", "payload"
    ).mapInPandas(gen, schema=FEATURE_SCHEMA)


def resize_images(df: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """(media_id, pixels array<float>): block-mean downsample of raw8 images
    — a real resize kernel (exact for integer scale factors)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out_px = []
            for w, h, p in zip(b["width"], b["height"], b["payload"]):
                img = np.frombuffer(bytes(p), dtype=np.uint8).reshape(int(h), int(w))
                fy, fx = int(h) // out_h, int(w) // out_w
                small = img[: fy * out_h, : fx * out_w].reshape(
                    out_h, fy, out_w, fx
                ).mean(axis=(1, 3))
                out_px.append((small.reshape(-1) / 255.0).astype(np.float32))
            yield pd.DataFrame({"media_id": b["media_id"], "pixels": out_px})

    return (
        df.filter(F.col("mime") == "image/raw8")
        .select("media_id", "width", "height", "payload")
        .mapInPandas(gen, schema="media_id long, pixels array<float>")
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 200) -> DataFrame:
    """For video rows: the (media_id, frame_ts_ms) sampling plan — pure
    column math (sequence), ready to feed the frame decoder."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


def sample_frames(df: DataFrame, every_ms: int = 200) -> DataFrame:
    """(media_id, frame_ts_ms, feature): execute the sampling plan — join it
    back to the payloads and slice exactly the sampled raw8 frames by byte
    offset (frame index = ts * fps / 1000), featurizing each."""
    plan = frame_sample_plan(df, every_ms)
    joined = plan.join(
        df.select("media_id", "width", "height", "fps", "payload"), "media_id"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = []
            for ts, w, h, fps, p in zip(
                b["frame_ts_ms"], b["width"], b["height"], b["fps"], b["payload"]
            ):
                fsz = int(w) * int(h)
                idx = int(ts) * int(fps) // 1000
                off = idx * fsz
                img = np.frombuffer(
                    bytes(p)[off : off + fsz], dtype=np.uint8
                ).reshape(int(h), int(w))
                feats.append(_image_hist(img))
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "frame_ts_ms": b["frame_ts_ms"],
                    "feature": feats,
                }
            )

    return joined.mapInPandas(
        gen, schema="media_id long, frame_ts_ms int, feature array<float>"
    )
