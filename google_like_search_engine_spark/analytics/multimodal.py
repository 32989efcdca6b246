"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing — schema, partitioning, Arrow batch shapes, UDF
signatures — is real and tested; the actual media decoding is STUBBED
(this environment ships no image/audio libraries). Each decoder either
raises NotImplementedError (strict mode) or produces a deterministic
fake derived from the payload bytes (fake mode, used by tests), so the
pipeline shape can be validated end-to-end and a real decoder drops in
by replacing one function.

Asset table schema:
  asset_id: long, kind: string (image|audio|video), payload: binary,
  meta: map<string,string>   (e.g. width/height/sample_rate as strings)
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

ASSETS_SCHEMA = "asset_id long, kind string, payload binary, meta map<string,string>"

IMAGE_FEATURES_SCHEMA = (
    "asset_id long, width int, height int, channels int, features array<float>"
)
AUDIO_FEATURES_SCHEMA = (
    "asset_id long, sample_rate int, n_samples long, features array<float>"
)
FRAME_SAMPLE_SCHEMA = "asset_id long, frame_idx int, frame binary"


def _fake_floats(payload: bytes, n: int) -> list:
    """Deterministic pseudo-features from payload bytes (md5 stream)."""
    out = []
    counter = 0
    while len(out) < n:
        d = hashlib.md5(payload + counter.to_bytes(4, "little")).digest()
        out.extend(b / 255.0 for b in d)
        counter += 1
    return [float(x) for x in out[:n]]


def decode_image_batch(payload: bytes, meta: dict, fake: bool):
    """STUB: real implementation decodes payload (PNG/JPEG) to HxWxC.

    Replace with e.g. PIL/torchvision in production. Raises unless
    ``fake`` — the deterministic fake derives dims from meta and
    features from an md5 stream over the payload."""
    if not fake:
        raise NotImplementedError(
            "image decode requires an image library not present in this "
            "environment; run with fake=True or plug in a real decoder"
        )
    w = int(meta.get("width", 16))
    h = int(meta.get("height", 16))
    return w, h, 3, _fake_floats(payload, 8)


def image_features(assets: DataFrame, fake: bool = False) -> DataFrame:
    """images -> (asset_id, width, height, channels, features).

    Arrow-batched; at scale run over a table partitioned by a
    size-balanced bucket of asset_id so batches have bounded byte size
    (media payloads dominate memory, not row counts)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload, meta in zip(pdf["asset_id"], pdf["payload"], pdf["meta"]):
                w, h, c, feats = decode_image_batch(bytes(payload), dict(meta or {}), fake)
                rows.append((aid, w, h, c, feats))
            yield pd.DataFrame(
                rows, columns=["asset_id", "width", "height", "channels", "features"]
            )

    return (
        assets.where(F.col("kind") == "image")
        .select("asset_id", "payload", "meta")
        .mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)
    )


def audio_features(assets: DataFrame, fake: bool = False) -> DataFrame:
    """audio -> (asset_id, sample_rate, n_samples, features). STUB decode."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload, meta in zip(pdf["asset_id"], pdf["payload"], pdf["meta"]):
                meta = dict(meta or {})
                if not fake:
                    raise NotImplementedError(
                        "audio decode requires an audio library not present; "
                        "run with fake=True or plug in a real decoder"
                    )
                sr = int(meta.get("sample_rate", 16000))
                payload = bytes(payload)
                rows.append((aid, sr, len(payload) // 2, _fake_floats(payload, 8)))
            yield pd.DataFrame(
                rows, columns=["asset_id", "sample_rate", "n_samples", "features"]
            )

    return (
        assets.where(F.col("kind") == "audio")
        .select("asset_id", "payload", "meta")
        .mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)
    )


def sample_frames(assets: DataFrame, every_n: int = 10, fake: bool = False) -> DataFrame:
    """video -> one row per sampled frame (asset_id, frame_idx, frame).

    STUB: the fake treats the payload as fixed-size 256-byte 'frames'.
    Demonstrates the 1->N explode shape a real frame sampler has."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                if not fake:
                    raise NotImplementedError(
                        "video decode requires a media library not present; "
                        "run with fake=True or plug in a real decoder"
                    )
                payload = bytes(payload)
                n_frames = max(len(payload) // 256, 1)
                for idx in range(0, n_frames, every_n):
                    rows.append((aid, idx, payload[idx * 256 : (idx + 1) * 256]))
            yield pd.DataFrame(rows, columns=["asset_id", "frame_idx", "frame"])

    return (
        assets.where(F.col("kind") == "video")
        .select("asset_id", "payload")
        .mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)
    )


def synth_assets(spark, n: int = 30, seed: int = 42) -> DataFrame:
    """Deterministic fake asset table for tests."""
    import random

    rng = random.Random(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.randrange(256) for _ in range(rng.randrange(512, 4096)))
        meta = (
            {"width": str(8 * (1 + i % 4)), "height": str(8 * (1 + i % 3))}
            if kind == "image"
            else {"sample_rate": "16000"}
            if kind == "audio"
            else {"fps": "30"}
        )
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, ASSETS_SCHEMA)
