"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side machinery (schemas, Arrow batching via ``mapInPandas``,
partition sizing) is REAL and tested, and as of round 4 so are the codecs
for every format the standard library + numpy can express
(``functions.codecs``): PNG / PPM / PGM / BMP and baseline + progressive
JPEG images (``functions.jpeg``), PCM WAV audio, and MJPEG-AVI video all
decode for real — ``decode_image``/``decode_audio`` sniff the payload's
magic bytes and dispatch, and the featurizer's video branch walks RIFF.
MP4/MOV and MKV/WebM get CONTAINER-level treatment (``media_metadata`` /
``functions.containers``): codec, dimensions, duration and track layout
parse without decoding, so the 100 TB selection pass runs in-sandbox;
only their FRAME decode (H.26x/VP9/AV1 entropy machinery) and
arithmetic-coded/lossless JPEG still raise ``NotImplementedError``.
``fake=True`` keeps the deterministic stub for pipeline-shape tests.

At 100 TB the pattern matters more than the codec: binary payloads ride in
their own column so Parquet column pruning keeps them unread unless a stage
actually touches them; ``mapInPandas`` streams Arrow record batches so one
task never holds more than ``maxRecordsPerBatch`` frames in memory.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
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
    """Decode an image payload.  ``fake=False`` (default) runs the REAL
    pure-numpy codecs (PNG/PPM/PGM/BMP/baseline-JPEG via magic-byte
    sniffing); arithmetic-coded JPEG and unknown formats raise.
    ``fake=True`` keeps the deterministic stub whose shape comes from the
    metadata columns."""
    if fake:
        return _fake_decode(payload, (height, width, 3))
    from ..functions.codecs import sniff_and_decode_image

    return sniff_and_decode_image(payload)


def decode_audio(payload: bytes, fake: bool = False, n_samples: int = 800):
    """Decode an audio payload -> (samples ndarray, sample_rate).  Real
    path: PCM WAV via the stdlib ``wave`` parser; ``fake=True`` keeps the
    seeded stub."""
    if fake:
        return _fake_decode(payload, (int(n_samples),)), 16_000
    from ..functions.codecs import decode_wav

    return decode_wav(payload)


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
                    arr, _rate = decode_audio(
                        payload, fake=fake, n_samples=int(row.sample_rate or 800)
                    )
                    if arr.dtype != np.uint8:  # int16 PCM -> byte scale so
                        # the histogram featurizer sees one value range
                        arr = ((arr.astype(np.int32) + 32768) >> 8).astype(np.uint8)
                else:  # video: frame-sampled
                    if not fake:
                        if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
                            # the REAL path: MJPEG-AVI decodes in-sandbox
                            # (RIFF walk + the pure-numpy JPEG codec)
                            from ..functions.codecs import decode_avi_mjpeg

                            vid = decode_avi_mjpeg(payload)
                            step = max(1, len(vid) // 4)
                            arr = vid[::step][:4]  # deterministic frame sample
                        else:
                            raise NotImplementedError(
                                "frame decode for non-AVI video containers "
                                "(MP4/MKV/WebM) requires external codecs; "
                                "media_metadata probes them without decoding, "
                                "or pass fake=True for the pipeline-shape stub"
                            )
                    else:
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


def _hash_schema(id_type) -> StructType:
    # the output id column is always named media_id, but its TYPE follows
    # the input id column — a string id (this repo's natural url key)
    # previously hit an Arrow cast error against a hard-coded LongType
    return StructType(
        [
            StructField("media_id", id_type, False),
            StructField("img_hash", LongType(), True),
        ]
    )


def image_hashes(
    media: DataFrame,
    method: str = "dhash",
    fake: bool = False,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Perceptual 64-bit hash per image: (media_id, img_hash).

    One Arrow-batched ``mapInPandas`` pass — payload column pruning still
    holds for metadata-only consumers (this operator is the one that pays
    the payload read).  ``method``: 'dhash' (gradient signs, fastest) or
    'phash' (32x32 DCT vs median, most robust to tone curves).  The codec
    call is irreducibly per-item; everything around it is numpy.  An
    undecodable payload yields a NULL hash (and is excluded from pairing)
    rather than failing the scan — at web scale some fraction of crawled
    images is always corrupt.
    """
    from ..functions.imagehash import dhash64, phash64

    if method not in ("dhash", "phash"):
        raise ValueError(f"method must be 'dhash' or 'phash', got {method!r}")
    kernel = dhash64 if method == "dhash" else phash64

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for row in pdf.itertuples(index=False):
                payload = row.payload
                payload = payload.encode() if isinstance(payload, str) else bytes(payload)
                try:
                    arr = decode_image(
                        payload,
                        getattr(row, "width", None) or 8,
                        getattr(row, "height", None) or 8,
                        fake=fake,
                    )
                    h = kernel(arr)
                except (ValueError, NotImplementedError, struct.error,
                        zlib.error, IndexError, KeyError):
                    # truncated/corrupt payloads surface as any of these
                    # from the pure-python codecs; at web scale some
                    # fraction of crawled images is ALWAYS corrupt, so
                    # they yield a NULL hash instead of failing the scan
                    h = None
                hashes.append(h)
            yield pd.DataFrame({"media_id": pdf[id_col], "img_hash": hashes})

    cols = [F.col(id_col), F.col(payload_col).alias("payload")]
    for opt in ("width", "height"):
        if opt in media.columns:
            cols.append(F.col(opt))
    id_type = media.schema[id_col].dataType
    return media.select(*cols).mapInPandas(run, _hash_schema(id_type))


def image_near_dup_pairs(
    media: DataFrame,
    method: str = "dhash",
    max_hamming: int = 6,
    num_blocks: int = 8,
    max_bucket_size: Optional[int] = 1000,
    fake: bool = False,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Image near-duplicate PAIRS (master_side < dupe_side): perceptual
    hash + the text SimHash machinery's pigeonhole block join
    (``candidates.hamming_ball_pairs`` — exhaustive for
    max_hamming <= num_blocks-1, skew-capped, bit_count-filtered JVM-side).
    Default radius 6/64 with 8 blocks: re-encodings of one picture at
    different JPEG qualities land well inside; unrelated pictures sit
    ~32 bits out."""
    from .candidates import hamming_ball_pairs

    sigs = image_hashes(
        media, method=method, fake=fake, id_col=id_col, payload_col=payload_col
    ).where(F.col("img_hash").isNotNull())
    return hamming_ball_pairs(
        sigs, max_hamming=max_hamming, num_blocks=num_blocks,
        max_bucket_size=max_bucket_size, id_col="media_id", sig_col="img_hash",
    )


def image_near_dup_clusters(
    media: DataFrame,
    method: str = "dhash",
    max_hamming: int = 6,
    num_blocks: int = 8,
    max_bucket_size: Optional[int] = 1000,
    fake: bool = False,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Image near-dup CLUSTERING: (media_id, component), component = min id
    — same single-linkage CC contract as the text dedup pipelines, so media
    dedup output is interchangeable with document dedup output downstream."""
    from .grouping import connected_components

    pairs = image_near_dup_pairs(
        media, method=method, max_hamming=max_hamming, num_blocks=num_blocks,
        max_bucket_size=max_bucket_size, fake=fake,
        id_col=id_col, payload_col=payload_col,
    )
    nodes = media.select(F.col(id_col).cast("long").alias(id_col))
    return connected_components(
        pairs.select(F.col("master_side").alias("u"), F.col("dupe_side").alias("v")),
        nodes,
    ).withColumnRenamed("node", id_col)


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-JVM metadata pass — must NOT read the payload column (column
    pruning keeps the binary bytes on disk)."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.avg(F.coalesce("width", F.lit(0))).alias("avg_width"),
        F.avg(F.coalesce("n_frames", F.lit(0))).alias("avg_frames"),
    )


METADATA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("container", StringType(), True),
        StructField("brand", StringType(), True),
        StructField("duration_s", FloatType(), True),
        StructField("n_tracks", IntegerType(), True),
        StructField("video_codec", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("audio_codec", StringType(), True),
        StructField("sample_rate", FloatType(), True),
        StructField("channels", IntegerType(), True),
        StructField("err", StringType(), True),
    ]
)


def media_metadata(media: DataFrame, id_col: str = "media_id",
                   payload_col: str = "payload") -> DataFrame:
    """Container-level metadata for every payload WITHOUT decoding a frame
    (``functions.containers.probe_media``: MP4/MOV box walk, MKV/WebM EBML
    walk, AVI/WAV RIFF walk).

    This is the 100 TB selection pass — "which payloads are >10 s 1080p?"
    — that must run before any real decode: a narrow ``mapInPandas`` over
    (id, payload), one probe per row, slim typed rows out.  Unrecognized
    or malformed containers land in ``err`` instead of failing the scan
    (at crawl scale malformed media is data, not an exception)."""
    from ..functions.containers import probe_media

    slim = media.select(
        F.col(id_col).alias("media_id"), F.col(payload_col).alias("payload")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = (
                    payload.encode() if isinstance(payload, str) else bytes(payload)
                )
                row = {
                    "media_id": mid, "container": None, "brand": None,
                    "duration_s": None, "n_tracks": None, "video_codec": None,
                    "width": None, "height": None, "audio_codec": None,
                    "sample_rate": None, "channels": None, "err": None,
                }
                try:
                    info = probe_media(payload)
                    row.update(
                        container=info["container"], brand=info["brand"],
                        duration_s=info["duration_s"],
                        n_tracks=len(info["tracks"]),
                    )
                    # the visual track: video for containers, the image
                    # itself for still formats — one width/height contract
                    vids = [
                        t for t in info["tracks"] if t["kind"] in ("video", "image")
                    ]
                    auds = [t for t in info["tracks"] if t["kind"] == "audio"]
                    if vids:
                        row.update(
                            video_codec=vids[0]["codec"], width=vids[0]["width"],
                            height=vids[0]["height"],
                        )
                    if auds:
                        row.update(
                            audio_codec=auds[0]["codec"],
                            sample_rate=auds[0]["sample_rate"],
                            channels=auds[0]["channels"],
                        )
                except (ValueError, struct.error, IndexError, KeyError) as exc:
                    # truncated headers index past the buffer (IndexError)
                    # or miss required fields (KeyError) — same corrupt-
                    # payload class as ValueError/struct.error
                    row["err"] = f"{type(exc).__name__}: {exc}"
                rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in METADATA_SCHEMA])

    return slim.mapInPandas(run, METADATA_SCHEMA)
