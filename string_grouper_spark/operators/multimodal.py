"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side machinery (schemas, Arrow batching via ``mapInPandas``,
partition sizing) is REAL and tested; the codec layer is stubbed because no
image/audio libraries exist in this container:

  * ``decode_image`` raises ``NotImplementedError`` unless ``fake=True``,
    in which case a deterministic fake decoder (bytes -> seeded ndarray)
    exercises the full pipeline shape.

At 100 TB the pattern matters more than the codec: binary payloads ride in
their own column so Parquet column pruning keeps them unread unless a stage
actually touches them; ``mapInPandas`` streams Arrow record batches so one
task never holds more than ``maxRecordsPerBatch`` frames in memory.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image|audio|video
        StructField("payload", StringType(), True),  # -> BinaryType in real tables
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("feature", ArrayType(FloatType()), True),
        StructField("feat_dim", IntegerType(), False),
    ]
)


def _fake_decode(payload: bytes, shape: tuple) -> np.ndarray:
    """Deterministic fake codec: seeded by payload digest; stands in for
    PIL/ffmpeg so the Arrow plumbing is testable in this container."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:4], "big")
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=shape).astype(np.uint8)


def decode_image(payload: bytes, width: int, height: int, fake: bool = False) -> np.ndarray:
    if not fake:
        raise NotImplementedError(
            "real image decoding requires PIL/opencv (not in this container); "
            "pass fake=True for the deterministic stub"
        )
    return _fake_decode(payload, (height, width, 3))


def extract_features(
    media: DataFrame, feat_dim: int = 16, fake: bool = True
) -> DataFrame:
    """Binary media -> fixed-dim features via mapInPandas (Arrow-batched).

    Feature = per-channel histogram moments of the (fake-)decoded array —
    deterministic, so downstream ANN/dedup over media features is testable.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            # itertuples, not iterrows: no per-row Series construction — the
            # only per-row Python left is the codec call itself, which is
            # irreducibly per-item (one decode per payload)
            for row in pdf.itertuples(index=False):
                payload = row.payload
                payload = payload.encode() if isinstance(payload, str) else bytes(payload)
                if row.kind == "image":
                    arr = decode_image(payload, row.width or 8, row.height or 8, fake=fake)
                elif row.kind == "audio":
                    arr = _fake_decode(payload, (int(row.sample_rate or 800),))
                else:  # video: frame-sampled
                    n = int(row.n_frames or 4)
                    arr = _fake_decode(payload, (min(n, 4), 8, 8, 3))
                flat = arr.astype(np.float64).ravel()
                # histogram-moment feature, padded/truncated to feat_dim
                hist, _ = np.histogram(flat, bins=feat_dim, range=(0, 256))
                f = (hist / max(1, flat.size)).astype(np.float32)
                feats.append(f.tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "feat_dim": feat_dim,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-JVM metadata pass — must NOT read the payload column (column
    pruning keeps the binary bytes on disk)."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.avg(F.coalesce("width", F.lit(0))).alias("avg_width"),
        F.avg(F.coalesce("n_frames", F.lit(0))).alias("avg_frames"),
    )
