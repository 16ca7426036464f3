"""Real pure-python/numpy media codecs (functions/codecs.py): exact
round-trips, filter reconstruction against hand-forward-filtered PNG
streams, magic-byte dispatch, and the Spark featurizer end-to-end on REAL
payloads."""

import struct
import zlib

import numpy as np
import pandas as pd
import pytest

from string_grouper_spark.functions import codecs


def _img(h, w, ch=3, seed=7):
    rng = np.random.RandomState(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    return rng.randint(0, 256, size=shape).astype(np.uint8)


def test_ppm_pgm_roundtrip_exact():
    rgb = _img(11, 7)
    assert np.array_equal(codecs.decode_ppm(codecs.encode_ppm(rgb)), rgb)
    gray = _img(5, 9, ch=1)
    assert np.array_equal(codecs.decode_ppm(codecs.encode_ppm(gray)), gray)


def test_ppm_header_comments_and_whitespace():
    rgb = _img(2, 3)
    raw = b"P6\n# a comment\n 3 \t2\n# more\n255\n" + rgb.tobytes()
    assert np.array_equal(codecs.decode_ppm(raw), rgb)


def test_bmp_roundtrip_exact_with_row_padding():
    # width 5 -> 15-byte rows padded to 16: the stride math must hold
    rgb = _img(4, 5, seed=13)
    assert np.array_equal(codecs.decode_bmp(codecs.encode_bmp(rgb)), rgb)


def test_png_roundtrip_exact_all_colortypes():
    for ch in (1, 3, 4):
        img = _img(6, 5, ch=ch, seed=ch)
        got = codecs.decode_png(codecs.encode_png(img))
        assert np.array_equal(got, img), f"ch={ch}"


def _forward_filter(img, ftype):
    """Apply a PNG filter FORWARD (encoder side) so decode must invert it."""
    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int32)
    out = np.zeros((h, stride + 1), dtype=np.uint8)
    for y in range(h):
        out[y, 0] = ftype
        for x in range(stride):
            a = int(flat[y, x - ch]) if x >= ch else 0
            b = int(flat[y - 1, x]) if y else 0
            c = int(flat[y - 1, x - ch]) if (y and x >= ch) else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[y, x + 1] = (int(flat[y, x]) - pred) & 0xFF
    return out


def test_png_decodes_every_filter_type():
    img = _img(5, 4, seed=3)
    for ftype in range(5):
        scan = _forward_filter(img, ftype)
        ihdr = struct.pack(">IIBBBBB", 4, 5, 8, 2, 0, 0, 0)

        def chunk(ctype, body):
            return (
                struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
            )

        payload = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(scan.tobytes()))
            + chunk(b"IEND", b"")
        )
        got = codecs.decode_png(payload)
        assert np.array_equal(got, img), f"filter {ftype}"


def test_wav_roundtrip_mono_stereo_8bit():
    rng = np.random.RandomState(5)
    mono = rng.randint(-32768, 32767, size=400).astype(np.int16)
    arr, rate = codecs.decode_wav(codecs.encode_wav(mono, 16_000))
    assert rate == 16_000 and np.array_equal(arr, mono)
    stereo = rng.randint(-32768, 32767, size=(200, 2)).astype(np.int16)
    arr2, _ = codecs.decode_wav(codecs.encode_wav(stereo, 8_000))
    assert np.array_equal(arr2, stereo)
    byte = rng.randint(0, 256, size=100).astype(np.uint8)
    arr3, _ = codecs.decode_wav(codecs.encode_wav(byte, 8_000))
    assert np.array_equal(arr3, byte)


def test_sniff_dispatch_and_honest_failures():
    rgb = _img(3, 3)
    assert np.array_equal(codecs.sniff_and_decode_image(codecs.encode_png(rgb)), rgb)
    assert np.array_equal(codecs.sniff_and_decode_image(codecs.encode_ppm(rgb)), rgb)
    assert np.array_equal(codecs.sniff_and_decode_image(codecs.encode_bmp(rgb)), rgb)
    with pytest.raises(ValueError):  # truncated/garbage JPEG is a loud error
        codecs.sniff_and_decode_image(b"\xff\xd8\xff\xe0fakejpeg")
    with pytest.raises(ValueError):
        codecs.sniff_and_decode_image(b"not an image at all")


def test_resize_nearest():
    img = _img(8, 8)
    small = codecs.resize_nearest(img, 4, 4)
    assert small.shape == (4, 4, 3)
    assert np.array_equal(small, img[::2, ::2])


def test_extract_features_on_real_payloads(spark):
    # end-to-end: REAL encoded payloads through the Spark featurizer
    # (BinaryType payload column, fake=False), deterministic output
    from string_grouper_spark.operators.multimodal import extract_features

    from string_grouper_spark.functions.jpeg import encode_jpeg

    png = codecs.encode_png(_img(8, 8, seed=1))
    bmp = codecs.encode_bmp(_img(8, 6, seed=2))
    jpg = encode_jpeg(_img(16, 16, seed=4), quality=90)
    wav = codecs.encode_wav(
        np.random.RandomState(3).randint(-32768, 32767, size=500).astype(np.int16),
        16_000,
    )
    pdf = pd.DataFrame(
        {
            "media_id": [0, 1, 2, 3],
            "kind": ["image", "image", "audio", "image"],
            "payload": [png, bmp, wav, jpg],
            "width": [8, 6, None, 16],
            "height": [8, 8, None, 16],
            "sample_rate": [None, None, 16_000, None],
            "n_frames": [None, None, None, None],
        }
    )
    schema = (
        "media_id long, kind string, payload binary, width int, "
        "height int, sample_rate int, n_frames int"
    )
    media = spark.createDataFrame(pdf, schema)
    out1 = extract_features(media, fake=False).toPandas().sort_values("media_id")
    out2 = extract_features(media, fake=False).toPandas().sort_values("media_id")
    assert out1["feat_dim"].tolist() == [16, 16, 16, 16]
    assert all(len(f) == 16 for f in out1["feature"])
    for a, b in zip(out1["feature"], out2["feature"]):
        assert list(a) == list(b)
    # histograms are probability masses over real pixel/sample bytes
    assert all(abs(sum(f) - 1.0) < 1e-5 for f in out1["feature"])

    # a video row without fake=True must surface the honest stub error
    vid = media.withColumn("kind", __import__("pyspark").sql.functions.lit("video"))
    with pytest.raises(Exception, match="video containers"):
        extract_features(vid, fake=False).collect()


# ---------------------------------------------------------------------------
# Baseline JPEG (functions/jpeg.py)
# ---------------------------------------------------------------------------

def _smooth(h, w, seed=0):
    """Smooth gradient + mild noise: a realistic photographic-ish signal
    (JPEG quality bounds are meaningless on white noise)."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        128
        + 80 * np.sin(yy / 9.0)
        + 60 * np.cos(xx / 7.0)
        + rng.normal(0, 4, size=(h, w))
    )
    return np.clip(base, 0, 255).astype(np.uint8)


def test_jpeg_dct_matrix_orthonormal():
    from string_grouper_spark.functions.jpeg import dct_matrix

    C = dct_matrix()
    assert np.allclose(C @ C.T, np.eye(8), atol=1e-12)


def test_jpeg_zigzag_is_the_published_order():
    from string_grouper_spark.functions.jpeg import ZIGZAG

    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # spec spot checks: start 0,1,8,16,9,2; end ...,47,55,62,63
    assert ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]
    assert ZIGZAG[-4:].tolist() == [47, 55, 62, 63]


def test_jpeg_huffman_tables_are_wellformed():
    from string_grouper_spark.functions.jpeg import (
        AC_CHROM, AC_LUM, DC_CHROM, DC_LUM, _huff_codes,
    )

    for bits, vals in (DC_LUM, DC_CHROM, AC_LUM, AC_CHROM):
        assert sum(bits) == len(vals)
        codes = _huff_codes(bits, vals)
        # prefix-free: no code is a prefix of a longer one
        as_bits = {format(c, f"0{l}b") for (c, l) in codes.values()}
        assert len(as_bits) == len(codes)
        for a in as_bits:
            for b in as_bits:
                assert a == b or not b.startswith(a)
    assert sum(AC_LUM[0]) == 162 and sum(AC_CHROM[0]) == 162


def test_jpeg_roundtrip_grayscale():
    from string_grouper_spark.functions.jpeg import decode_jpeg, encode_jpeg

    img = _smooth(24, 17, seed=1)  # odd width: pad/crop path
    got = decode_jpeg(encode_jpeg(img, quality=90))
    assert got.shape == img.shape
    assert np.abs(got.astype(float) - img.astype(float)).mean() < 4.0


def test_jpeg_roundtrip_rgb_444_and_420():
    from string_grouper_spark.functions.jpeg import decode_jpeg, encode_jpeg

    img = np.stack([_smooth(21, 19, seed=s) for s in (2, 3, 4)], axis=-1)
    for sub in (False, True):
        got = decode_jpeg(encode_jpeg(img, quality=90, subsample=sub))
        assert got.shape == img.shape
        mae = np.abs(got.astype(float) - img.astype(float)).mean()
        assert mae < (6.0 if not sub else 10.0), (sub, mae)


def test_jpeg_quality_monotone():
    from string_grouper_spark.functions.jpeg import decode_jpeg, encode_jpeg

    img = _smooth(32, 32, seed=5)
    maes = []
    for q in (95, 70, 30):
        got = decode_jpeg(encode_jpeg(img, quality=q))
        maes.append(np.abs(got.astype(float) - img.astype(float)).mean())
    assert maes[0] < maes[1] < maes[2]


def test_jpeg_via_sniff_dispatch_and_arithmetic_raises():
    from string_grouper_spark.functions.jpeg import encode_jpeg

    img = _smooth(16, 16, seed=6)
    payload = encode_jpeg(img, quality=92)
    got = codecs.sniff_and_decode_image(payload)
    assert np.abs(got.astype(float) - img.astype(float)).mean() < 4.0
    # flip SOF0 -> SOF9 (arithmetic-coded): the remaining honest stub —
    # must raise, not mis-decode.  (SOF2 progressive now decodes for real;
    # see test_progressive_* below.)
    arith = payload.replace(b"\xff\xc0", b"\xff\xc9", 1)
    with pytest.raises(NotImplementedError):
        codecs.sniff_and_decode_image(arith)


@pytest.mark.parametrize(
    "shape,subsample", [("gray", False), ("rgb", False), ("rgb", True)]
)
@pytest.mark.parametrize("quality", [90, 50])
def test_progressive_roundtrip_equals_baseline(shape, subsample, quality):
    # encode_jpeg_progressive emits a real SOF2 multi-scan stream (DC
    # first Al=1, per-comp AC first Al=1, DC refine, per-comp AC refine);
    # the decoder must reconstruct EXACTLY the baseline coefficients, so
    # the decoded pixels are bit-identical to the baseline path
    from string_grouper_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    if shape == "gray":
        img = _smooth(40, 56, seed=9)
    else:
        img = np.stack([_smooth(40, 56, seed=9 + i) for i in range(3)], axis=2)
    base = decode_jpeg(encode_jpeg(img, quality=quality, subsample=subsample))
    payload = encode_jpeg_progressive(img, quality=quality, subsample=subsample)
    assert b"\xff\xc2" in payload  # really SOF2
    prog = decode_jpeg(payload)
    assert np.array_equal(base, prog)
    # and the sniff dispatch handles progressive payloads
    assert np.array_equal(codecs.sniff_and_decode_image(payload), base)


def test_progressive_eobrun_fixture():
    # spec-constructed stream covering the EOBn (run > 1) decode path the
    # in-repo encoder never emits: 16x16 gray, quant all-ones, DC scan of
    # zeros, then one AC scan where block 1 starts an EOBRUN of 2 (EOB1 +
    # one 0 extension bit) covering blocks 1-2, with a custom huffman
    # table that actually contains the 0x10 symbol (Annex K tables don't)
    import struct as _struct

    from string_grouper_spark.functions.jpeg import (
        DC_LUM,
        ZIGZAG,
        _BitWriter,
        _huff_codes,
        dct_matrix,
        decode_jpeg,
    )

    ac_bits = [0, 0, 4] + [0] * 13  # four 3-bit codes
    ac_vals = [0x00, 0x03, 0x10, 0x12]
    dc_codes = _huff_codes(*DC_LUM)
    ac_codes = _huff_codes(ac_bits, ac_vals)

    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xdb" + _struct.pack(">HB", 67, 0) + bytes([1] * 64)
    out += b"\xff\xc2" + _struct.pack(">HBHHB", 11, 8, 16, 16, 1)
    out += _struct.pack("BBB", 1, 0x11, 0)
    out += b"\xff\xc4" + _struct.pack(">HB", 19 + 12, 0x00)
    out += bytes(DC_LUM[0]) + bytes(DC_LUM[1])
    out += b"\xff\xc4" + _struct.pack(">HB", 19 + 4, 0x10)
    out += bytes(ac_bits) + bytes(ac_vals)
    # scan 1: DC first, Al=0, all four DC diffs = 0 (category-0 symbol)
    out += b"\xff\xda" + _struct.pack(">HB", 8, 1) + _struct.pack("BBBBB", 1, 0x00, 0, 0, 0)
    w = _BitWriter()
    for _ in range(4):
        code, ln = dc_codes[0]
        w.write(code, ln)
    out += w.flush()
    # scan 2: AC first, band 1..63, Ah=Al=0
    out += b"\xff\xda" + _struct.pack(">HB", 8, 1) + _struct.pack("BBBBB", 1, 0x00, 1, 63, 0)
    w = _BitWriter()
    code, ln = ac_codes[0x03]  # block 0: k=1 gets category-3 value 5
    w.write(code, ln)
    w.write(5, 3)
    code, ln = ac_codes[0x00]  # EOB0 ends block 0
    w.write(code, ln)
    code, ln = ac_codes[0x10]  # EOB1: run = (1<<1) + bits(1)=0 -> blocks 1,2
    w.write(code, ln)
    w.write(0, 1)
    code, ln = ac_codes[0x12]  # block 3: skip 1 zero, k=2 category-2 = -3
    w.write(code, ln)
    w.write(0b00, 2)  # extend(-3): -3 + (1<<2) - 1 = 0
    code, ln = ac_codes[0x00]
    w.write(code, ln)
    out += w.flush()
    out += b"\xff\xd9"

    got = decode_jpeg(bytes(out))
    # expected: IDCT of the planned coefficients (natural order via ZIGZAG)
    C = dct_matrix()
    want = np.zeros((16, 16))
    for bi, (r, c) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        zz = np.zeros(64)
        if bi == 0:
            zz[1] = 5
        if bi == 3:
            zz[2] = -3
        nat = np.zeros(64)
        nat[ZIGZAG] = zz
        block = C.T @ nat.reshape(8, 8) @ C
        want[8 * r : 8 * r + 8, 8 * c : 8 * c + 8] = np.clip(
            np.round(block + 128), 0, 255
        )
    assert np.array_equal(got, want.astype(np.uint8))


# ---------------------------------------------------------------------------
# MJPEG AVI (functions/codecs.py round-5: the one REAL video container)
# ---------------------------------------------------------------------------

def test_avi_mjpeg_roundtrip_equals_per_frame_jpeg():
    from string_grouper_spark.functions.jpeg import decode_jpeg, encode_jpeg

    frames = np.stack(
        [np.stack([_smooth(24, 32, seed=s)] * 3, axis=2) for s in range(3)]
    )
    payload = codecs.encode_avi_mjpeg(frames, fps=5, quality=85)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
    got = codecs.decode_avi_mjpeg(payload)
    want = np.stack(
        [decode_jpeg(encode_jpeg(f, quality=85)) for f in frames]
    )
    assert np.array_equal(got, want)  # container adds NO loss beyond JPEG


def test_avi_mjpeg_honest_failures():
    with pytest.raises(ValueError):
        codecs.decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")  # not AVI
    # an AVI whose video chunks aren't MJPEG must raise, not mis-decode
    frames = np.stack([np.stack([_smooth(8, 8, seed=1)] * 3, axis=2)])
    payload = bytearray(codecs.encode_avi_mjpeg(frames))
    soi = payload.find(b"\xff\xd8\xff")
    payload[soi : soi + 2] = b"\x00\x00"  # corrupt the frame's SOI
    with pytest.raises(NotImplementedError):
        codecs.decode_avi_mjpeg(bytes(payload))


def test_extract_features_real_video_path(spark):
    # the multimodal featurizer's video branch now decodes MJPEG-AVI for
    # real (fake=False); non-AVI containers still surface the honest stub
    from string_grouper_spark.operators.multimodal import extract_features

    frames = np.stack(
        [np.stack([_smooth(16, 16, seed=s)] * 3, axis=2) for s in range(6)]
    )
    avi = codecs.encode_avi_mjpeg(frames, quality=90)
    pdf = pd.DataFrame(
        {
            "media_id": [0],
            "kind": ["video"],
            "payload": [avi],
            "width": [16],
            "height": [16],
            "sample_rate": [None],
            "n_frames": [6],
        }
    )
    schema = (
        "media_id long, kind string, payload binary, width int, "
        "height int, sample_rate int, n_frames int"
    )
    media = spark.createDataFrame(pdf, schema)
    out1 = extract_features(media, fake=False).toPandas()
    out2 = extract_features(media, fake=False).toPandas()
    assert len(out1) == 1 and len(out1["feature"].iloc[0]) == 16
    assert list(out1["feature"].iloc[0]) == list(out2["feature"].iloc[0])
    mp4ish = media.withColumn(
        "payload",
        __import__("pyspark").sql.functions.lit(b"\x00\x00\x00 ftypisom"),
    )
    with pytest.raises(Exception, match="non-AVI video containers"):
        extract_features(mp4ish, fake=False).collect()


def test_bmp_8bit_palette_lookup():
    """8-bit BMP pixels are palette indices: decode must map through the
    color table, not return raw indices as intensities."""
    import struct as _s

    w, h = 4, 2
    pal = [(10, 20, 30), (200, 100, 50), (0, 0, 0), (255, 255, 255)]  # RGB
    pal_bytes = b"".join(bytes([b, g, r, 0]) for (r, g, b) in pal)
    data_off = 54 + len(pal_bytes)
    rows = [bytes([0, 1, 2, 3]), bytes([3, 2, 1, 0])]  # stride == w here
    data = rows[1] + rows[0]  # bottom-up
    payload = (
        _s.pack("<2sIHHI", b"BM", data_off + len(data), 0, 0, data_off)
        + _s.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(data), 0, 0, 4, 0)
        + pal_bytes + data
    )
    img = codecs.decode_bmp(payload)
    assert img.shape == (2, 4, 3)
    assert img[0].tolist() == [list(p) for p in pal]
    assert img[1].tolist() == [list(p) for p in reversed(pal)]
    # genuinely gray palette -> 2-D intensity plane
    gray_pal = b"".join(bytes([v, v, v, 0]) for v in (0, 85, 170, 255))
    payload_g = payload[:54] + gray_pal + data
    img_g = codecs.decode_bmp(payload_g)
    assert img_g.shape == (2, 4)
    assert img_g[0].tolist() == [0, 85, 170, 255]


def test_jpeg_fill_bytes_before_marker():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may pad a marker — the
    decoder and header probe must skip them, not desync."""
    from string_grouper_spark.functions import containers as C
    from string_grouper_spark.functions.jpeg import decode_jpeg, encode_jpeg

    img = (np.arange(16 * 16 * 3) % 251).reshape(16, 16, 3).astype(np.uint8)
    payload = encode_jpeg(img, quality=90)
    padded = payload[:2] + b"\xff\xff" + payload[2:]
    assert np.array_equal(decode_jpeg(padded), decode_jpeg(payload))
    info = C.probe_jpeg(padded)
    assert info["tracks"][0]["width"] == 16


def test_image_hashes_corrupt_payload_yields_null(spark):
    from string_grouper_spark.operators.multimodal import image_hashes

    good = codecs.encode_png(_img(16, 16, seed=3))
    bad_png = good[:40]  # valid signature, truncated IDAT -> zlib/struct
    bad_bmp = codecs.encode_bmp(_img(8, 8, seed=4))[:20]
    pdf = pd.DataFrame(
        {"media_id": [0, 1, 2], "payload": [good, bad_png, bad_bmp]}
    )
    out = (
        image_hashes(spark.createDataFrame(pdf))
        .toPandas().set_index("media_id").sort_index()
    )
    assert out.loc[0, "img_hash"] is not None
    assert pd.isna(out.loc[1, "img_hash"]) and pd.isna(out.loc[2, "img_hash"])
