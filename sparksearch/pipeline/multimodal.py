"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas stages.

The decode step is environment-gated: PIL / torchaudio / av are not in
this container, so decode falls back to a clearly-marked DETERMINISTIC
FAKE (features derived from the bytes' hash) — the Spark-side plumbing
(schemas, mapInPandas batch shape, partition sizing) is real and tested;
swap ``_decode_image_real`` in when the codec libs exist.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("kind", T.StringType()),       # image | audio | video
    T.StructField("mime", T.StringType()),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
])

IMAGE_FEATURES_SCHEMA = ("media_id string, width int, height int, "
                         "channels int, embedding array<float>")
AUDIO_FEATURES_SCHEMA = ("media_id string, sample_rate int, n_samples long, "
                         "mfcc array<float>")
FRAME_SAMPLE_SCHEMA = ("media_id string, frame_idx int, frame_bytes binary")

_HAVE_PIL = False
try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401
    _HAVE_PIL = True
except ImportError:
    pass


def _fake_floats(data: bytes, n: int, tag: bytes) -> list:
    """Deterministic pseudo-features from content bytes (NOT a real
    decode — stands in for the codec stage)."""
    out = []
    h = hashlib.sha256(tag + (data or b""))
    for i in range(n):
        h = hashlib.sha256(h.digest() + bytes([i & 0xFF]))
        out.append(int.from_bytes(h.digest()[:4], "big") / 2**32 - 0.5)
    return out


def decode_images(media: DataFrame, embed_dim: int = 16) -> DataFrame:
    """binary image column → (width, height, channels, embedding).

    Real decode requires PIL (absent here) — the fake path derives
    deterministic dimensions/features from the content hash so the
    pipeline shape is exercised end-to-end.
    """

    def batches(it):
        for pdf in it:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["bytes"]):
                if _HAVE_PIL:  # pragma: no cover
                    raise NotImplementedError(
                        "real decode path: PIL present but intentionally "
                        "unwired in this environment-gated stub")
                hv = int.from_bytes(hashlib.sha256(data or b"").digest()[:8],
                                    "big")
                rows.append({
                    "media_id": mid,
                    "width": 64 + (hv % 512),
                    "height": 64 + ((hv >> 16) % 512),
                    "channels": 3,
                    "embedding": _fake_floats(data, embed_dim, b"img"),
                })
            yield pd.DataFrame(rows)

    return (media.filter(F.col("kind") == "image")
            .select("media_id", "bytes")
            .mapInPandas(batches, schema=IMAGE_FEATURES_SCHEMA))


def extract_audio_features(media: DataFrame, n_mfcc: int = 13) -> DataFrame:
    """binary audio → (sample_rate, n_samples, mfcc). Deterministic fake."""

    def batches(it):
        for pdf in it:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["bytes"]):
                hv = int.from_bytes(hashlib.sha256(data or b"").digest()[:8],
                                    "big")
                rows.append({
                    "media_id": mid,
                    "sample_rate": 16000,
                    "n_samples": 16000 + (hv % 160000),
                    "mfcc": _fake_floats(data, n_mfcc, b"aud"),
                })
            yield pd.DataFrame(rows)

    return (media.filter(F.col("kind") == "audio")
            .select("media_id", "bytes")
            .mapInPandas(batches, schema=AUDIO_FEATURES_SCHEMA))


def sample_video_frames(media: DataFrame, every_n: int = 30,
                        max_frames: int = 4) -> DataFrame:
    """binary video → sampled frame rows (deterministic fake frames)."""

    def batches(it):
        for pdf in it:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["bytes"]):
                hv = int.from_bytes(hashlib.sha256(data or b"").digest()[:4],
                                    "big")
                n = 1 + hv % max_frames
                for i in range(n):
                    fb = hashlib.sha256((data or b"") + bytes([i])).digest()
                    rows.append({"media_id": mid, "frame_idx": i * every_n,
                                 "frame_bytes": fb})
            yield pd.DataFrame(rows)

    return (media.filter(F.col("kind") == "video")
            .select("media_id", "bytes")
            .mapInPandas(batches, schema=FRAME_SAMPLE_SCHEMA))


def synth_media(spark, n: int = 24, seed: int = 3) -> DataFrame:
    """Deterministic synthetic media table for tests."""
    import random
    rng = random.Random(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        rows.append({
            "media_id": f"m{i:04d}", "kind": kind,
            "mime": {"image": "image/png", "audio": "audio/wav",
                     "video": "video/mp4"}[kind],
            "bytes": rng.randbytes(64 + rng.randrange(192)),
            "meta": {"source": "synth", "i": str(i)},
        })
    return spark.createDataFrame(pd.DataFrame(rows), schema=MEDIA_SCHEMA)
