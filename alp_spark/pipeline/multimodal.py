"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct; decode / feature-extract / resize / frame-sample
run as Arrow-batched ``mapInPandas`` stages. The actual codec step is
STUBBED (no image/audio libs in this container): ``decode=`` selects
either the deterministic fake decoder (for tests — pixels derived from
the payload bytes, so downstream math is real and repeatable) or the
real-decoder placeholder that raises ``NotImplementedError`` with the
integration point documented. The Spark-side plumbing — schema,
partitioning, batch iteration, output shapes — is real and tested.

Scale notes: payloads never shuffle — every stage is mapInPandas
(narrow, partition-local); only extracted features (small fixed-size
arrays) flow into joins/aggregations downstream.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

#: canonical media-table schema: payload is opaque bytes + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_payload", T.BinaryType(), True),
    ]
)


def _fake_decode(payload: bytes, n: int = 64) -> np.ndarray:
    """Deterministic stand-in for a codec: n pseudo-pixels in [0, 1)
    derived from sha256(payload) — stable across runs and executors."""
    if payload is None:
        return np.zeros(n, dtype=np.float32)
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * (n // len(h) + 1))[:n], dtype=np.uint8)
    return raw.astype(np.float32) / 256.0


def _real_decode(payload: bytes, n: int = 64) -> np.ndarray:
    raise NotImplementedError(
        "real media decode requires Pillow/ffmpeg/torchaudio — plug the "
        "codec in here; the Spark plumbing (mapInPandas batching, schema, "
        "partitioning) is unchanged"
    )


def extract_features(media: DataFrame, decode: str = "fake") -> DataFrame:
    """binary payload → fixed-size float feature vector, Arrow-batched.

    The feature here is a 16-bin histogram of decoded intensities —
    real downstream-shaped math (vectorized numpy over the whole batch)
    on top of the stubbed decode.
    """
    decoder = _fake_decode if decode == "fake" else _real_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pixels = np.stack([decoder(p) for p in pdf["payload"]])
            edges = np.linspace(0.0, 1.0, FEATURE_DIM + 1)
            feats = [
                np.histogram(row, bins=edges)[0].astype(np.float32)
                / max(len(row), 1)
                for row in pixels
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": [f.tolist() for f in feats],
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every: int = 2, decode: str = "fake") -> DataFrame:
    """video rows → one row per sampled frame (frame_idx stepped by
    ``every``), payload sliced per frame. Fan-out stays partition-local."""
    if decode != "fake":
        _real_decode(b"")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for _, row in pdf.iterrows():
                n = int(row["n_frames"] or 0)
                payload = row["payload"] or b""
                if n <= 0:
                    continue
                step = max(len(payload) // n, 1)
                for f in range(0, n, every):
                    ids.append(row["media_id"])
                    idxs.append(f)
                    payloads.append(payload[f * step : (f + 1) * step])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_payload": payloads}
            )

    return media.where("kind = 'video'").mapInPandas(run, schema=FRAME_SCHEMA)


def synthesize_media(spark, n: int = 20, seed: int = 13) -> DataFrame:
    """Deterministic fake media table for tests/benches."""
    rng = np.random.RandomState(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.randint(0, 256, size=32 + (i % 5) * 16, dtype=np.uint8))
        rows.append(
            (
                i,
                kind,
                payload,
                64 if kind == "image" else None,
                48 if kind == "image" else None,
                8 + i % 4 if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
