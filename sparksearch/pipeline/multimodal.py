"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas stages.

Decode is REAL for the formats a pure-python/numpy stack can handle —
PNG (zlib inflate + unfilter), BMP, baseline JPEG (full ITU-T T.81
decoder in pipeline.codecs), and WAV PCM — with real features
(block-mean image embeddings, numpy MFCCs).  Compressed audio (MP3/AAC)
and video-container decode are DECLARED NON-GOALS (like CJK dictionary
tokenizers; COVERAGE.md "Known gaps"): they fall back to a
clearly-marked DETERMINISTIC FAKE so arbitrary bytes still flow through
the same Spark plumbing; swap a PIL/av-backed decoder into
``_decode_any_image`` / ``_decode_any_audio`` when those libs exist.
"""

from __future__ import annotations

import hashlib
import struct

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
                         "channels int, decoded boolean, embedding array<float>")
AUDIO_FEATURES_SCHEMA = ("media_id string, sample_rate int, n_samples long, "
                         "decoded boolean, mfcc array<float>")
FRAME_SAMPLE_SCHEMA = ("media_id string, frame_idx int, frame_bytes binary")


def _fake_floats(data: bytes, n: int, tag: bytes) -> list:
    """Deterministic pseudo-features from content bytes (NOT a real
    decode — the fallback for formats needing external codecs)."""
    out = []
    h = hashlib.sha256(tag + (data or b""))
    for i in range(n):
        h = hashlib.sha256(h.digest() + bytes([i & 0xFF]))
        out.append(int.from_bytes(h.digest()[:4], "big") / 2**32 - 0.5)
    return out


def _decode_any_image(data: bytes):
    """bytes → uint8 array, or None when no pure-python codec applies."""
    from sparksearch.pipeline import codecs
    try:
        if codecs.is_png(data):
            return codecs.decode_png(data)
        if codecs.is_bmp(data):
            return codecs.decode_bmp(data)
        if codecs.is_jpeg(data):
            # baseline sequential JPEG decodes for real (pure python);
            # progressive/arithmetic raise → fallback
            return codecs.decode_jpeg(data)
    except (ValueError, IndexError, KeyError, struct.error):
        # malformed/truncated container (bad huffman state, short reads,
        # missing tables) → labeled fallback path, never a UDF crash
        return None
    return None


def _decode_any_audio(data: bytes):
    from sparksearch.pipeline import codecs
    try:
        if codecs.is_wav(data):
            return codecs.decode_wav(data)
    except Exception:  # malformed container → fallback path
        return None
    return None


def decode_images(media: DataFrame, embed_dim: int = 16) -> DataFrame:
    """binary image column → (width, height, channels, decoded, embedding).

    PNG/BMP decode for real (``decoded=true``); other formats fall back
    to hash-derived pseudo-features (``decoded=false``)."""
    from sparksearch.pipeline import codecs

    def batches(it):
        for pdf in it:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["bytes"]):
                data = bytes(data) if data is not None else b""
                px = _decode_any_image(data)
                if px is not None:
                    rows.append({
                        "media_id": mid,
                        "width": int(px.shape[1]),
                        "height": int(px.shape[0]),
                        "channels": int(px.shape[2]) if px.ndim == 3 else 1,
                        "decoded": True,
                        "embedding": codecs.image_embedding(px, embed_dim),
                    })
                else:
                    hv = int.from_bytes(
                        hashlib.sha256(data).digest()[:8], "big")
                    rows.append({
                        "media_id": mid,
                        "width": 64 + (hv % 512),
                        "height": 64 + ((hv >> 16) % 512),
                        "channels": 3,
                        "decoded": False,
                        "embedding": _fake_floats(data, embed_dim, b"img"),
                    })
            yield pd.DataFrame(rows)

    return (media.filter(F.col("kind") == "image")
            .select("media_id", "bytes")
            .mapInPandas(batches, schema=IMAGE_FEATURES_SCHEMA))


def extract_audio_features(media: DataFrame, n_mfcc: int = 13) -> DataFrame:
    """binary audio → (sample_rate, n_samples, decoded, mfcc).  WAV PCM
    decodes for real with numpy MFCCs; other codecs fall back."""
    from sparksearch.pipeline import codecs

    def batches(it):
        for pdf in it:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["bytes"]):
                data = bytes(data) if data is not None else b""
                decoded = _decode_any_audio(data)
                if decoded is not None:
                    sr, x = decoded
                    rows.append({
                        "media_id": mid, "sample_rate": int(sr),
                        "n_samples": int(len(x)), "decoded": True,
                        "mfcc": codecs.mfcc(x, sr, n_mfcc),
                    })
                else:
                    hv = int.from_bytes(
                        hashlib.sha256(data).digest()[:8], "big")
                    rows.append({
                        "media_id": mid, "sample_rate": 16000,
                        "n_samples": 16000 + (hv % 160000), "decoded": False,
                        "mfcc": _fake_floats(data, n_mfcc, b"aud"),
                    })
            yield pd.DataFrame(rows)

    return (media.filter(F.col("kind") == "audio")
            .select("media_id", "bytes")
            .mapInPandas(batches, schema=AUDIO_FEATURES_SCHEMA))


def sample_video_frames(media: DataFrame, every_n: int = 30,
                        max_frames: int = 4) -> DataFrame:
    """binary video → sampled frame rows.  Video containers need external
    demuxers — this stage is a DETERMINISTIC FAKE end to end (frame bytes
    derived from the content hash); the Spark plumbing is real."""

    def batches(it):
        for pdf in it:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["bytes"]):
                data = bytes(data) if data is not None else b""
                hv = int.from_bytes(hashlib.sha256(data).digest()[:4], "big")
                n = 1 + hv % max_frames
                for i in range(n):
                    fb = hashlib.sha256(data + bytes([i])).digest()
                    rows.append({"media_id": mid, "frame_idx": i * every_n,
                                 "frame_bytes": fb})
            yield pd.DataFrame(rows)

    return (media.filter(F.col("kind") == "video")
            .select("media_id", "bytes")
            .mapInPandas(batches, schema=FRAME_SAMPLE_SCHEMA))


def synth_media(spark, n: int = 24, seed: int = 3) -> DataFrame:
    """Deterministic synthetic media table: REAL encoded PNG images and
    WAV clips (exercising the real decode path), plus random-byte 'video'
    blobs for the fake-gated stage."""
    import random

    import numpy as np

    from sparksearch.pipeline import codecs
    rng = random.Random(seed)
    nprng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            w, h = 8 + rng.randrange(24), 8 + rng.randrange(24)
            ch = rng.choice([1, 3, 4])
            px = nprng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)
            data = codecs.encode_png(px)
        elif kind == "audio":
            sr = 16000
            t = np.arange(sr // 4) / sr
            freq = 200 + rng.randrange(2000)
            data = codecs.encode_wav(0.5 * np.sin(2 * np.pi * freq * t), sr)
        else:
            data = rng.randbytes(64 + rng.randrange(192))
        rows.append({
            "media_id": f"m{i:04d}", "kind": kind,
            "mime": {"image": "image/png", "audio": "audio/wav",
                     "video": "video/mp4"}[kind],
            "bytes": data,
            "meta": {"source": "synth", "i": str(i)},
        })
    return spark.createDataFrame(pd.DataFrame(rows), schema=MEDIA_SCHEMA)
