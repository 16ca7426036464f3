"""Perceptual image dedup: dHash/pHash kernels + Hamming-ball clustering.

The media counterpart of text SimHash dedup: synthetic smooth images are
re-encoded at different JPEG qualities (the classic web near-dup case:
same picture, different CDN compression) plus lossless PNG copies; the
clusters must group every re-encoding with its source and keep unrelated
images apart.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from string_grouper_spark.functions.imagehash import (
    dhash64,
    phash64,
    resize_area,
    to_gray,
)
from string_grouper_spark.functions.jpeg import encode_jpeg
from string_grouper_spark.functions.codecs import encode_png


def _smooth_image(seed: int, h: int = 48, w: int = 64) -> np.ndarray:
    """Deterministic smooth RGB test image (JPEG-friendly: low frequency)."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    chans = []
    for _ in range(3):
        a, b, c = rng.uniform(0.02, 0.2, 3)
        p, q = rng.uniform(0, 2 * np.pi, 2)
        chan = 128 + 90 * np.sin(a * xx + p) * np.cos(b * yy + q) + 20 * np.sin(c * (xx + yy))
        chans.append(chan)
    return np.clip(np.stack(chans, axis=2), 0, 255).astype(np.uint8)


def test_resize_area_exact_on_divisible_grid():
    img = np.arange(64, dtype=np.float64).reshape(8, 8)
    out = resize_area(img, 4, 4)
    # each 2x2 block's mean
    want = img.reshape(4, 2, 4, 2).mean(axis=(1, 3))
    assert np.allclose(out, want)


def test_to_gray_luma_and_shapes():
    rgb = np.zeros((2, 2, 3), dtype=np.uint8)
    rgb[..., 1] = 255  # pure green
    g = to_gray(rgb)
    assert np.allclose(g, 0.587 * 255)
    assert to_gray(np.ones((3, 4), dtype=np.uint8)).shape == (3, 4)
    with pytest.raises(ValueError):
        to_gray(np.zeros((2, 2, 2), dtype=np.uint8))


@pytest.mark.parametrize("kernel", [dhash64, phash64])
def test_hash_invariance_across_reencodings(kernel):
    # same picture via PNG (lossless), JPEG q90, JPEG q40: tiny Hamming
    # distances; a different picture: far away
    from string_grouper_spark.functions.jpeg import decode_jpeg
    from string_grouper_spark.functions.codecs import decode_png

    img = _smooth_image(3)
    other = _smooth_image(4)
    h_src = kernel(img)
    h_png = kernel(decode_png(encode_png(img)))
    h_q90 = kernel(decode_jpeg(encode_jpeg(img, quality=90)))
    h_q40 = kernel(decode_jpeg(encode_jpeg(img, quality=40)))
    h_oth = kernel(other)

    def dist(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert dist(h_src, h_png) == 0  # lossless copy: identical hash
    assert dist(h_src, h_q90) <= 6
    assert dist(h_src, h_q40) <= 6
    assert dist(h_src, h_oth) >= 16


def test_image_near_dup_clusters_end_to_end(spark):
    # 4 source pictures x {PNG, JPEG q90, JPEG q40} = 12 payloads; clusters
    # must be exactly the 4 source groups — run for BOTH hash methods
    from string_grouper_spark.operators.multimodal import image_near_dup_clusters

    rows = []
    mid = 0
    for src in range(4):
        img = _smooth_image(10 + src)
        for payload in (
            encode_png(img),
            encode_jpeg(img, quality=90),
            encode_jpeg(img, quality=40),
        ):
            rows.append((mid, src, bytearray(payload)))
            mid += 1
    pdf = pd.DataFrame(rows, columns=["media_id", "src", "payload"])
    media = spark.createDataFrame(pdf)
    # method-specific radii (measured on these fixtures: dHash drifts <= 3
    # bits at q40, pHash up to 12; unrelated pictures sit >= 26 bits out):
    # num_blocks sized so the pigeonhole join stays exhaustive
    # (max_hamming <= num_blocks - 1)
    for method, radius, blocks in (("dhash", 6, 8), ("phash", 14, 16)):
        out = image_near_dup_clusters(
            media, method=method, max_hamming=radius, num_blocks=blocks
        ).toPandas()
        got = dict(zip(out.media_id, out.component))
        assert len(got) == 12
        for src in range(4):
            ids = [r[0] for r in rows if r[1] == src]
            assert len({got[i] for i in ids}) == 1, (method, src)
        assert len(set(got.values())) == 4, method


def test_image_hashes_null_on_corrupt_payload(spark):
    # corrupt payloads must yield NULL hashes (excluded from pairing), not
    # fail the scan
    from string_grouper_spark.operators.multimodal import image_hashes

    img = _smooth_image(1)
    pdf = pd.DataFrame(
        {
            "media_id": [0, 1],
            "payload": [bytearray(encode_png(img)), bytearray(b"not an image")],
        }
    )
    out = image_hashes(spark.createDataFrame(pdf)).toPandas().set_index("media_id")
    assert out.loc[0, "img_hash"] is not None and not pd.isna(out.loc[0, "img_hash"])
    assert pd.isna(out.loc[1, "img_hash"])
