"""Container probes: hand-constructed ISO BMFF / EBML fixtures (spec-pinned
byte layouts), the repo's own AVI/WAV encoders as round-trip sources, and
the Spark media_metadata scan (errors are data, not exceptions)."""

import struct

import numpy as np
import pandas as pd
import pytest

from string_grouper_spark.functions import containers as C


# -- fixture builders (ISO/IEC 14496-12 box layout) -------------------------

def box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def full(btype: bytes, body: bytes, version: int = 0) -> bytes:
    return box(btype, bytes([version, 0, 0, 0]) + body)


def _visual_entry(fourcc: bytes, w: int, h: int) -> bytes:
    body = (
        b"\x00" * 6 + struct.pack(">H", 1)          # reserved + data_ref_index
        + b"\x00" * 16                               # pre_defined/reserved
        + struct.pack(">HH", w, h)                   # width, height
        + struct.pack(">II", 0x00480000, 0x00480000) # 72 dpi horiz/vert
        + b"\x00" * 4 + struct.pack(">H", 1)         # reserved + frame_count
        + b"\x00" * 32                               # compressorname
        + struct.pack(">Hh", 24, -1)                 # depth, pre_defined
    )
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _audio_entry(fourcc: bytes, channels: int, rate: int) -> bytes:
    body = (
        b"\x00" * 6 + struct.pack(">H", 1)
        + b"\x00" * 8                                # reserved
        + struct.pack(">HH", channels, 16)           # channelcount, samplesize
        + b"\x00" * 4                                # pre_defined + reserved
        + struct.pack(">I", rate << 16)              # samplerate 16.16
    )
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _trak(handler: bytes, timescale: int, duration: int, entry: bytes,
          n_samples: int) -> bytes:
    mdhd = full(b"mdhd", struct.pack(">IIII", 0, 0, timescale, duration)
                + struct.pack(">HH", 0x55C4, 0))     # lang 'und'
    hdlr = full(b"hdlr", b"\x00" * 4 + handler + b"\x00" * 12 + b"h\x00")
    stsd = full(b"stsd", struct.pack(">I", 1) + entry)
    stsz = full(b"stsz", struct.pack(">II", 0, n_samples))
    stbl = box(b"stbl", stsd + stsz)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    return box(b"trak", mdia)


def make_mp4() -> bytes:
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isommp41")
    mvhd = full(b"mvhd", struct.pack(">IIII", 0, 0, 1000, 12000) + b"\x00" * 80)
    vid = _trak(b"vide", 90000, 900000, _visual_entry(b"avc1", 640, 360), 300)
    aud = _trak(b"soun", 44100, 441000, _audio_entry(b"mp4a", 2, 44100), 430)
    moov = box(b"moov", mvhd + vid + aud)
    return ftyp + moov + box(b"mdat", b"\x00" * 32)


# -- fixture builders (Matroska/WebM EBML) ----------------------------------

def _eid(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _esize(n: int) -> bytes:
    if n < 0x7F:
        return bytes([0x80 | n])
    assert n < 0x3FFF
    return struct.pack(">H", 0x4000 | n)


def el(eid: int, body: bytes) -> bytes:
    return _eid(eid) + _esize(len(body)) + body


def make_mkv(doctype: bytes = b"webm") -> bytes:
    header = el(0x1A45DFA3, el(C._E_DOCTYPE, doctype))
    info = el(
        C._E_INFO,
        el(C._E_TIMESTAMP_SCALE, (1_000_000).to_bytes(3, "big"))
        + el(C._E_DURATION, struct.pack(">d", 12345.0)),  # ms at this scale
    )
    video = el(
        C._E_TRACK_ENTRY,
        el(C._E_TRACK_TYPE, b"\x01") + el(C._E_CODEC_ID, b"V_VP9")
        + el(C._E_VIDEO,
             el(C._E_PIXEL_W, struct.pack(">H", 1920))
             + el(C._E_PIXEL_H, struct.pack(">H", 1080))),
    )
    audio = el(
        C._E_TRACK_ENTRY,
        el(C._E_TRACK_TYPE, b"\x02") + el(C._E_CODEC_ID, b"A_OPUS")
        + el(C._E_AUDIO,
             el(C._E_SAMPLING_FREQ, struct.pack(">f", 48000.0))
             + el(C._E_CHANNELS, b"\x02")),
    )
    tracks = el(C._E_TRACKS, video + audio)
    return header + el(C._E_SEGMENT, info + tracks)


# -- probes ------------------------------------------------------------------

def test_mp4_probe_spec_fields():
    info = C.probe_media(make_mp4())
    assert info["container"] == "mp4" and info["brand"] == "isom"
    assert info["duration_s"] == pytest.approx(12.0)
    v, a = info["tracks"]
    assert v["kind"] == "video" and v["codec"] == "avc1"
    assert (v["width"], v["height"]) == (640, 360)
    assert v["duration_s"] == pytest.approx(10.0) and v["n_samples"] == 300
    assert a["kind"] == "audio" and a["codec"] == "mp4a"
    assert a["sample_rate"] == pytest.approx(44100.0) and a["channels"] == 2
    assert a["duration_s"] == pytest.approx(10.0) and a["n_samples"] == 430


def test_mkv_probe_spec_fields():
    info = C.probe_media(make_mkv())
    assert info["container"] == "webm" and info["brand"] == "webm"
    assert info["duration_s"] == pytest.approx(12.345)
    v, a = info["tracks"]
    assert v["kind"] == "video" and v["codec"] == "V_VP9"
    assert (v["width"], v["height"]) == (1920, 1080)
    assert a["kind"] == "audio" and a["codec"] == "A_OPUS"
    assert a["sample_rate"] == pytest.approx(48000.0) and a["channels"] == 2
    # matroska doctype keeps container=mkv
    assert C.probe_media(make_mkv(b"matroska"))["container"] == "mkv"


def test_avi_probe_matches_encoder():
    from string_grouper_spark.functions.codecs import encode_avi_mjpeg

    frames = np.zeros((6, 16, 16, 3), dtype=np.uint8)
    info = C.probe_media(encode_avi_mjpeg(frames, fps=3))
    assert info["container"] == "avi"
    (v,) = info["tracks"]
    assert v["kind"] == "video" and v["codec"] == "MJPG"
    assert v["n_samples"] == 6
    assert info["duration_s"] == pytest.approx(2.0)
    assert (v["width"], v["height"]) == (16, 16)


def test_wav_probe_matches_encoder():
    from string_grouper_spark.functions.codecs import encode_wav

    samples = np.zeros(8000, dtype=np.int16)
    info = C.probe_media(encode_wav(samples, 16000))
    assert info["container"] == "wav"
    (a,) = info["tracks"]
    assert a["sample_rate"] == 16000.0 and a["channels"] == 1
    assert a["n_samples"] == 8000
    assert info["duration_s"] == pytest.approx(0.5)


def test_unknown_container_raises():
    with pytest.raises(ValueError) as ei:
        C.probe_media(b"\x00" * 64)
    assert "unrecognized media container" in str(ei.value)


def test_truncated_mp4_raises():
    payload = make_mp4()
    with pytest.raises(ValueError):
        C.probe_mp4(payload[:-40] + struct.pack(">I", 1 << 30) + b"free")


# -- the Spark scan ------------------------------------------------------------

def test_media_metadata_scan(spark):
    from string_grouper_spark.functions.codecs import encode_avi_mjpeg, encode_wav
    from string_grouper_spark.operators.multimodal import media_metadata

    payloads = [
        make_mp4(),
        make_mkv(),
        encode_avi_mjpeg(np.zeros((4, 8, 8, 3), dtype=np.uint8), fps=2),
        encode_wav(np.zeros(100, dtype=np.int16), 8000),
        b"not media at all",
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": range(5), "payload": payloads})
    )
    out = media_metadata(df).toPandas().set_index("media_id").sort_index()
    assert list(out["container"])[:4] == ["mp4", "webm", "avi", "wav"]
    assert out.loc[0, "video_codec"] == "avc1" and out.loc[0, "width"] == 640
    assert out.loc[1, "video_codec"] == "V_VP9" and out.loc[1, "height"] == 1080
    assert out.loc[2, "video_codec"] == "MJPG"
    assert out.loc[3, "audio_codec"] == "pcm_s16le"
    assert out.loc[3, "channels"] == 1
    # malformed media is DATA: err populated, no job failure
    assert out.loc[4, "container"] is None or pd.isna(out.loc[4, "container"])
    assert "unrecognized" in out.loc[4, "err"]
    assert out["err"][:4].isna().all()


def test_image_probes_match_encoders():
    from string_grouper_spark.functions.codecs import (
        encode_bmp, encode_png, encode_ppm,
    )
    from string_grouper_spark.functions.jpeg import (
        encode_jpeg, encode_jpeg_progressive,
    )

    img = np.zeros((24, 32, 3), dtype=np.uint8)
    for payload, container, codec in [
        (encode_png(img), "png", "png/rgb"),
        (encode_bmp(img), "bmp", "bmp"),
        (encode_ppm(img), "ppm", "ppm"),
        (encode_jpeg(img), "jpeg", "jpeg/baseline"),
        (encode_jpeg_progressive(img), "jpeg", "jpeg/progressive"),
    ]:
        info = C.probe_media(payload)
        assert info["container"] == container, container
        (t,) = info["tracks"]
        assert t["kind"] == "image" and t["codec"] == codec
        assert (t["width"], t["height"]) == (32, 24), codec
    # GIF: hand-built logical screen descriptor (no encoder in-repo)
    gif = b"GIF89a" + struct.pack("<HH", 640, 480) + b"\x00\x00\x00\x3b"
    info = C.probe_media(gif)
    assert info["tracks"][0]["width"] == 640
    # JPEG with the SOF segment stripped must raise, not desync silently
    with pytest.raises(ValueError):
        C.probe_jpeg(b"\xff\xd8\xff\xd9")


def test_media_metadata_truncated_headers_land_in_err(spark):
    """Truncated headers raise IndexError from the probes — they must land
    in `err`, not kill the scan (the documented contract)."""
    from string_grouper_spark.operators.multimodal import media_metadata

    trunc_png = b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR" + struct.pack(">II", 4, 4)
    empty_mvhd_mp4 = (
        box(b"ftyp", b"isom" + struct.pack(">I", 512))
        + struct.pack(">I", 8) + b"moov"[:4]
    ) + struct.pack(">I", 8) + b"mvhd"
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": [0, 1, 2],
                      "payload": [trunc_png, empty_mvhd_mp4, make_mp4()]})
    )
    out = media_metadata(df).toPandas().set_index("media_id").sort_index()
    assert out.loc[0, "err"] is not None and "IndexError" in out.loc[0, "err"]
    assert out.loc[2, "err"] is None or pd.isna(out.loc[2, "err"])
    assert out.loc[2, "container"] == "mp4"


def test_probe_depth_guard_on_adversarial_nesting():
    # a crafted few-KB payload of deeply nested master elements must land in
    # a caught error, never a RecursionError that would kill the whole task
    import pytest

    # MKV: 200 nested TrackEntry masters
    body = el(C._E_CODEC_ID, b"V_X")
    for _ in range(200):
        body = el(C._E_TRACK_ENTRY, body)
    payload = C._EBML_MAGIC + _esize(0) + body
    with pytest.raises(ValueError, match="nested deeper"):
        C.probe_mkv(payload)

    # MP4: 200 nested moov containers
    b = box(b"mvhd", b"\x00" * 100)
    for _ in range(200):
        b = box(b"moov", b)
    with pytest.raises(ValueError, match="nested deeper"):
        C.probe_mp4(b"\x00" * 0 + b)
