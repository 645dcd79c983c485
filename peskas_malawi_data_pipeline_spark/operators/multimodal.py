"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The pattern for 100 TB multimodal training data: payloads are ``binary``
columns (or object-store pointers once they exceed a few MB) carried next to
a typed metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` stages so the heavy per-item work is
vectorized Python over columnar batches, never row-at-a-time.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so the
decode kernels are stubbed: ``decode=fake`` produces a deterministic fake
feature vector from the payload bytes (pipeline plumbing — schema, batch
shape, partitioning — is real and tested); ``decode=real`` raises
NotImplementedError at the point where the codec would run.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, LongType, StringType, StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("modality", StringType(), False),     # image | audio | video
    StructField("mime_type", StringType(), True),
    StructField("payload", BinaryType(), True),        # inline bytes …
    StructField("uri", StringType(), True),            # … or object-store pointer
    StructField("meta", StructType([                   # typed, modality-specific
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_s", DoubleType(), True),
        StructField("sample_rate", LongType(), True),
    ]), True),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("modality", StringType(), False),
    StructField("n_bytes", LongType(), True),
    StructField("feature", ArrayType(DoubleType()), True),
])

_FEATURE_DIM = 8


def _fake_feature(payload: bytes | None) -> list[float] | None:
    """Deterministic stand-in for a decoded feature vector: bytes of
    sha256(payload) scaled to [0,1). Stable across runs/engines."""
    if payload is None:
        return None
    digest = hashlib.sha256(payload).digest()
    return [b / 256.0 for b in digest[:_FEATURE_DIM]]


def extract_features(df: DataFrame, decode: str = "fake",
                     batch_size_hint: int | None = None) -> DataFrame:
    """Decode/feature-extract stage over a MEDIA_SCHEMA DataFrame via
    ``mapInPandas`` (Arrow batches). ``decode='real'`` marks where an actual
    codec (PIL / torchaudio / pyav) would be called per batch.
    """
    if decode not in {"fake", "real"}:
        raise ValueError("decode must be 'fake' or 'real'")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError(
                    "media codecs (PIL/ffmpeg/torchaudio) unavailable in this "
                    "environment; use decode='fake' for plumbing tests")
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "modality": pdf["modality"],
                "n_bytes": pdf["payload"].map(lambda p: len(p) if p is not None else None),
                "feature": pdf["payload"].map(_fake_feature),
            })
            yield out

    return df.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_s: float = 1.0) -> DataFrame:
    """Frame-sampling *plan* for video rows: expands each video into the
    timestamps that would be decoded (one row per sampled frame) using only
    metadata — the decode itself happens in extract_features. Pure Spark:
    sequence + explode, no Python.
    """
    n_frames = F.greatest(
        F.floor(F.col("meta.duration_s") / F.lit(every_s)).cast("long"), F.lit(1))
    frames = F.sequence(F.lit(0), n_frames - 1)
    return (df.filter(F.col("modality") == "video")
            .select("media_id", "uri",
                    F.posexplode(frames).alias("frame_index", "__i"))
            .withColumn("sample_ts_s", F.col("frame_index") * every_s)
            .drop("__i"))


def resize_images(df: DataFrame, max_side: int = 512,
                  decode: str = "fake") -> DataFrame:
    """Resize stage over MEDIA_SCHEMA image rows via ``mapInPandas``.

    The metadata arithmetic is real: aspect-preserving integer downscale so
    the longer side equals ``max_side`` (``new_w = w*max_side // max(w,h)``);
    images already within bounds pass through untouched (no upscale). The
    pixel kernel is stubbed (no PIL in this container): ``decode='fake'``
    replaces a downscaled payload with the deterministic 32-byte
    ``sha256(payload + b"|WxH")`` digest, keeping the plumbing —
    batch shape, struct metadata rewrite, binary output schema — real and
    oracle-checkable; ``decode='real'`` raises where the codec would run.
    """
    if decode not in {"fake", "real"}:
        raise ValueError("decode must be 'fake' or 'real'")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError(
                    "image codecs (PIL) unavailable in this environment; "
                    "use decode='fake' for plumbing tests")
            rows = []
            for rec in pdf.to_dict("records"):
                had_meta = rec["meta"] is not None
                meta = dict(rec["meta"]) if had_meta else {}
                w, h = meta.get("width"), meta.get("height")
                payload = rec["payload"]
                if (w is not None and h is not None
                        and max(w, h) > max_side and payload is not None):
                    m = max(w, h)
                    new_w = max(1, (w * max_side) // m)
                    new_h = max(1, (h * max_side) // m)
                    payload = hashlib.sha256(
                        bytes(payload) + f"|{new_w}x{new_h}".encode()).digest()
                    meta["width"], meta["height"] = new_w, new_h
                rows.append({**rec, "payload": payload,
                             "meta": meta if had_meta else None})
            yield pd.DataFrame(rows, columns=pdf.columns)

    return df.mapInPandas(run, MEDIA_SCHEMA)
