"""Media-container metadata probes in pure stdlib — no ffmpeg/libav.

``probe_media`` walks the container structure of MP4/MOV (ISO BMFF box
tree), MKV/WebM (EBML element tree), AVI (RIFF chunk tree) and WAV, and
returns typed metadata (container, duration, per-track codec/dimensions/
rate) WITHOUT decoding a single frame.  This is the piece of the video
story that IS buildable in-sandbox: at 100 TB the metadata scan — "which
of these 10^9 payloads are >10s 1080p H.264?" — runs as a narrow Arrow
pass over the binary column, and only the selected rows ever reach a real
decoder (MJPEG-AVI decodes here via ``codecs.decode_avi_mjpeg``; other
codecs' FRAME decode honestly raises in ``operators.multimodal``).

Still images get the same header-only treatment (PNG IHDR, JPEG SOFn
marker walk — baseline vs progressive without touching the entropy
stream, GIF logical screen, BMP BITMAPINFOHEADER, PGM/PPM), so one
``media-probe`` pass triages EVERY payload column.

Parsers are spec-pinned by tests against hand-constructed fixtures and
the repo's own encoders: ISO/IEC 14496-12 box layout
(ftyp/mvhd/tkhd/mdhd/hdlr/stsd/stsz), Matroska/WebM EBML vint coding +
the public element IDs, and the RIFF/AVI ``avih``/``strh`` headers.

No counterpart in the reference repo (string_grouper is strings-only);
this extends the multimodal column story of ``operators/multimodal.py``.
"""

from __future__ import annotations

import struct
from typing import Optional


# ---------------------------------------------------------------------------
# ISO BMFF (MP4 / MOV / 3GP)
# ---------------------------------------------------------------------------

# boxes whose payload is a sequence of child boxes (the ones we descend)
_BMFF_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _iter_boxes(data: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for each box in [start, end)."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", data, pos)[0]
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize follows the type
            if pos + 16 > end:
                raise ValueError("truncated BMFF largesize box")
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            body = pos + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(f"malformed BMFF box {btype!r} (size {size})")
        yield btype, body, pos + size
        pos += size


def _full_box(data: bytes, start: int):
    """FullBox header: returns (version, body offset past version+flags)."""
    return data[start], start + 4


def _parse_mvhd(data: bytes, start: int, end: int) -> Optional[float]:
    v, p = _full_box(data, start)
    if v == 1:
        timescale = struct.unpack_from(">I", data, p + 16)[0]
        duration = struct.unpack_from(">Q", data, p + 20)[0]
    else:
        timescale = struct.unpack_from(">I", data, p + 8)[0]
        duration = struct.unpack_from(">I", data, p + 12)[0]
    return duration / timescale if timescale else None


def _parse_mdhd(data: bytes, start: int, end: int):
    v, p = _full_box(data, start)
    if v == 1:
        timescale = struct.unpack_from(">I", data, p + 16)[0]
        duration = struct.unpack_from(">Q", data, p + 20)[0]
    else:
        timescale = struct.unpack_from(">I", data, p + 8)[0]
        duration = struct.unpack_from(">I", data, p + 12)[0]
    return timescale, duration


def _parse_stsd_entry(data: bytes, start: int, end: int, handler: str):
    """First sample entry: codec fourcc + video dims / audio rate+channels."""
    if start + 8 > end:
        return {}
    fourcc = data[start + 4 : start + 8].decode("latin-1")
    out = {"codec": fourcc}
    body = start + 8 + 6 + 2  # SampleEntry: 6 reserved + data_ref_index
    if handler == "vide" and body + 70 <= end:
        # VisualSampleEntry: pre_defined(2) reserved(2) pre_defined(12)
        # width(2) height(2) ...
        out["width"] = struct.unpack_from(">H", data, body + 16)[0]
        out["height"] = struct.unpack_from(">H", data, body + 18)[0]
    elif handler == "soun" and body + 20 <= end:
        # AudioSampleEntry: reserved(8) channelcount(2) samplesize(2)
        # pre_defined(2) reserved(2) samplerate(4, 16.16 fixed)
        out["channels"] = struct.unpack_from(">H", data, body + 8)[0]
        out["sample_rate"] = struct.unpack_from(">I", data, body + 16)[0] / 65536.0
    return out


# spec-realistic trees are < 10 deep; 32 bounds adversarial nesting
_MAX_PROBE_DEPTH = 32


def probe_mp4(payload: bytes) -> dict:
    """Walk the ISO BMFF box tree; returns container/brand/duration/tracks."""
    n = len(payload)
    info: dict = {"container": "mp4", "brand": None, "duration_s": None, "tracks": []}

    def walk(start: int, end: int, track: Optional[dict], depth: int = 0) -> None:
        # crawled payloads are adversarial: a crafted few-KB file of nested
        # container boxes must raise a caught ValueError, not RecursionError
        # (which would escape media_metadata's except tuple and fail the task)
        if depth > _MAX_PROBE_DEPTH:
            raise ValueError("BMFF box tree nested deeper than "
                             f"{_MAX_PROBE_DEPTH} levels")
        for btype, b0, b1 in _iter_boxes(payload, start, end):
            if btype == b"ftyp":
                info["brand"] = payload[b0 : b0 + 4].decode("latin-1")
            elif btype == b"mvhd":
                info["duration_s"] = _parse_mvhd(payload, b0, b1)
            elif btype == b"trak":
                t: dict = {
                    "kind": None, "codec": None, "duration_s": None,
                    "n_samples": None, "width": None, "height": None,
                    "sample_rate": None, "channels": None,
                }
                info["tracks"].append(t)
                walk(b0, b1, t, depth + 1)
            elif btype == b"mdhd" and track is not None:
                ts, dur = _parse_mdhd(payload, b0, b1)
                track["duration_s"] = dur / ts if ts else None
            elif btype == b"hdlr" and track is not None:
                handler = payload[b0 + 8 : b0 + 12].decode("latin-1")
                track["kind"] = {"vide": "video", "soun": "audio"}.get(
                    handler, handler.strip()
                )
                track["_handler"] = handler
            elif btype == b"stsd" and track is not None:
                _, p = _full_box(payload, b0)
                n_entries = struct.unpack_from(">I", payload, p)[0]
                if n_entries:
                    entry_end = min(
                        b1, p + 4 + struct.unpack_from(">I", payload, p + 4)[0]
                    )
                    track.update(
                        _parse_stsd_entry(
                            payload, p + 4, entry_end, track.get("_handler", "")
                        )
                    )
            elif btype == b"stsz" and track is not None:
                _, p = _full_box(payload, b0)
                track["n_samples"] = struct.unpack_from(">I", payload, p + 4)[0]
            elif btype in _BMFF_CONTAINERS:
                walk(b0, b1, track, depth + 1)

    walk(0, n, None)
    for t in info["tracks"]:
        t.pop("_handler", None)
    return info


# ---------------------------------------------------------------------------
# EBML (Matroska / WebM)
# ---------------------------------------------------------------------------

_EBML_MAGIC = b"\x1a\x45\xdf\xa3"

# element IDs (raw, marker bits kept — the Matroska convention)
_E_SEGMENT = 0x18538067
_E_INFO = 0x1549A966
_E_TIMESTAMP_SCALE = 0x2AD7B1
_E_DURATION = 0x4489
_E_TRACKS = 0x1654AE6B
_E_TRACK_ENTRY = 0xAE
_E_TRACK_TYPE = 0x83
_E_CODEC_ID = 0x86
_E_VIDEO = 0xE0
_E_PIXEL_W = 0xB0
_E_PIXEL_H = 0xBA
_E_AUDIO = 0xE1
_E_SAMPLING_FREQ = 0xB5
_E_CHANNELS = 0x9F
_E_DOCTYPE = 0x4282

_E_EBML_HEADER = 0x1A45DFA3  # the header master holds DocType

_EBML_MASTERS = {
    _E_EBML_HEADER, _E_SEGMENT, _E_INFO, _E_TRACKS,
    _E_TRACK_ENTRY, _E_VIDEO, _E_AUDIO,
}


def _read_vint(data: bytes, pos: int, strip_marker: bool):
    """EBML variable-length int.  IDs keep the length-marker bits (class-A
    convention); sizes strip them.  Returns (value, next_pos)."""
    if pos >= len(data):
        raise ValueError("truncated EBML vint")
    first = data[pos]
    if first == 0:
        raise ValueError("invalid EBML vint (>8 bytes)")
    length = 9 - first.bit_length()  # leading-zeros + 1
    if pos + length > len(data):
        raise ValueError("truncated EBML vint body")
    val = first & ((1 << (8 - length)) - 1) if strip_marker else first
    for i in range(1, length):
        val = (val << 8) | data[pos + i]
    return val, pos + length


def _ebml_uint(data: bytes, start: int, end: int) -> int:
    return int.from_bytes(data[start:end], "big")


def _ebml_float(data: bytes, start: int, end: int) -> float:
    size = end - start
    if size == 4:
        return struct.unpack(">f", data[start:end])[0]
    if size == 8:
        return struct.unpack(">d", data[start:end])[0]
    raise ValueError(f"EBML float of width {size}")


def probe_mkv(payload: bytes) -> dict:
    """Walk the EBML tree; returns container/doctype/duration/tracks."""
    info: dict = {
        "container": "mkv", "brand": None, "duration_s": None, "tracks": [],
    }
    scale = [1_000_000]  # TimestampScale default: 1 ms in ns
    raw_duration = [None]

    def walk(start: int, end: int, track: Optional[dict], depth: int = 0) -> None:
        if depth > _MAX_PROBE_DEPTH:  # see probe_mp4: adversarial nesting
            raise ValueError("EBML tree nested deeper than "
                             f"{_MAX_PROBE_DEPTH} levels")
        pos = start
        while pos < end:
            eid, p = _read_vint(payload, pos, strip_marker=False)
            size, body = _read_vint(payload, p, strip_marker=True)
            # "unknown size" (all value bits set) only legal on Segment:
            # treat as to-end-of-scope
            if size == (1 << (7 * (body - p))) - 1:
                b1 = end
            else:
                b1 = body + size
            if b1 > end:
                raise ValueError(f"malformed EBML element 0x{eid:x}")
            if eid == _E_DOCTYPE:
                info["brand"] = payload[body:b1].decode("latin-1")
            elif eid == _E_TIMESTAMP_SCALE:
                scale[0] = _ebml_uint(payload, body, b1)
            elif eid == _E_DURATION:
                raw_duration[0] = _ebml_float(payload, body, b1)
            elif eid == _E_TRACK_ENTRY:
                t = {
                    "kind": None, "codec": None, "duration_s": None,
                    "n_samples": None, "width": None, "height": None,
                    "sample_rate": None, "channels": None,
                }
                info["tracks"].append(t)
                walk(body, b1, t, depth + 1)
            elif eid == _E_TRACK_TYPE and track is not None:
                track["kind"] = {1: "video", 2: "audio", 17: "subtitle"}.get(
                    _ebml_uint(payload, body, b1), "other"
                )
            elif eid == _E_CODEC_ID and track is not None:
                track["codec"] = payload[body:b1].decode("latin-1")
            elif eid == _E_PIXEL_W and track is not None:
                track["width"] = _ebml_uint(payload, body, b1)
            elif eid == _E_PIXEL_H and track is not None:
                track["height"] = _ebml_uint(payload, body, b1)
            elif eid == _E_SAMPLING_FREQ and track is not None:
                track["sample_rate"] = _ebml_float(payload, body, b1)
            elif eid == _E_CHANNELS and track is not None:
                track["channels"] = _ebml_uint(payload, body, b1)
            elif eid in _EBML_MASTERS:
                walk(body, b1, track, depth + 1)
            pos = b1

    walk(0, len(payload), None)
    if raw_duration[0] is not None:
        info["duration_s"] = raw_duration[0] * scale[0] / 1e9
    if info["brand"] == "webm":
        info["container"] = "webm"
    return info


# ---------------------------------------------------------------------------
# RIFF (AVI) and WAV headers
# ---------------------------------------------------------------------------

def probe_avi(payload: bytes) -> dict:
    from .codecs import _riff_chunks

    info: dict = {"container": "avi", "brand": None, "duration_s": None, "tracks": []}
    us_per_frame = [None]

    def walk(start: int, end: int, depth: int = 0) -> None:
        if depth > _MAX_PROBE_DEPTH:  # see probe_mp4: adversarial nesting
            raise ValueError("RIFF LIST tree nested deeper than "
                             f"{_MAX_PROBE_DEPTH} levels")
        for fourcc, b0, sz in _riff_chunks(payload, start, end):
            b1 = b0 + sz
            if fourcc == b"LIST":
                walk(b0 + 4, b1, depth + 1)
            elif fourcc == b"avih":
                us_per_frame[0] = struct.unpack_from("<I", payload, b0)[0]
            elif fourcc == b"strh":
                st = payload[b0 : b0 + 4]
                kind = {b"vids": "video", b"auds": "audio"}.get(st, "other")
                handler = payload[b0 + 4 : b0 + 8].decode("latin-1").strip("\x00")
                scale_, rate = struct.unpack_from("<II", payload, b0 + 20)
                length = struct.unpack_from("<I", payload, b0 + 32)[0]
                info["tracks"].append(
                    {
                        "kind": kind, "codec": handler or None,
                        "duration_s": (length * scale_ / rate) if rate else None,
                        "n_samples": length, "width": None, "height": None,
                        "sample_rate": (rate / scale_) if kind == "audio" and scale_ else None,
                        "channels": None,
                    }
                )
            elif fourcc == b"strf" and info["tracks"]:
                t = info["tracks"][-1]
                if t["kind"] == "video" and t["width"] is None and b1 - b0 >= 12:
                    t["width"] = struct.unpack_from("<i", payload, b0 + 4)[0]
                    t["height"] = abs(struct.unpack_from("<i", payload, b0 + 8)[0])

    walk(12, len(payload))
    vids = [t for t in info["tracks"] if t["kind"] == "video"]
    if vids and vids[0]["duration_s"] is not None:
        info["duration_s"] = vids[0]["duration_s"]
    elif vids and us_per_frame[0] and vids[0]["n_samples"]:
        info["duration_s"] = vids[0]["n_samples"] * us_per_frame[0] / 1e6
    return info


def probe_wav(payload: bytes) -> dict:
    # header-only parse (don't materialize samples): fmt + data chunk sizes
    from .codecs import _riff_chunks

    info: dict = {"container": "wav", "brand": None, "duration_s": None, "tracks": []}
    fmt = {}
    data_len = 0
    for fourcc, b0, sz in _riff_chunks(payload, 12, len(payload)):
        if fourcc == b"fmt ":
            ch, rate = struct.unpack_from("<HI", payload, b0 + 2)
            bits = struct.unpack_from("<H", payload, b0 + 14)[0]
            fmt = {"channels": ch, "rate": rate, "bits": bits}
        elif fourcc == b"data":
            data_len = sz
    if fmt:
        frame = fmt["channels"] * max(1, fmt["bits"] // 8)
        n = data_len // frame if frame else 0
        info["tracks"].append(
            {
                "kind": "audio", "codec": f"pcm_s{fmt['bits']}le",
                "duration_s": n / fmt["rate"] if fmt["rate"] else None,
                "n_samples": n, "width": None, "height": None,
                "sample_rate": float(fmt["rate"]), "channels": fmt["channels"],
            }
        )
        info["duration_s"] = info["tracks"][0]["duration_s"]
    return info


# ---------------------------------------------------------------------------
# image headers (dims without decode)
# ---------------------------------------------------------------------------

_IMG_KINDS = {0: "gray", 2: "rgb", 3: "palette", 4: "gray+a", 6: "rgba"}


def probe_png(payload: bytes) -> dict:
    """IHDR is mandatory-first: width/height/bit depth/color type at fixed
    offsets — no inflate, no filter pass."""
    if payload[12:16] != b"IHDR":
        raise ValueError("PNG without leading IHDR chunk")
    w, h = struct.unpack_from(">II", payload, 16)
    depth, ctype = payload[24], payload[25]
    codec = f"png/{_IMG_KINDS.get(ctype, ctype)}"
    return _image_info("png", codec, w, h)


def probe_jpeg(payload: bytes) -> dict:
    """Dimensions + baseline/progressive from the first SOFn, without
    running the entropy decoder.  The marker walk lives in
    ``functions.jpeg.find_sof`` (shared with the decoder module, so
    T.81 marker-handling fixes land exactly once)."""
    from .jpeg import find_sof

    marker, h, w, _ncomp = find_sof(payload)
    kind = {0xC0: "baseline", 0xC1: "extended", 0xC2: "progressive"}.get(
        marker, f"sof{marker - 0xC0}"
    )
    return _image_info("jpeg", f"jpeg/{kind}", w, h)


def probe_gif(payload: bytes) -> dict:
    w, h = struct.unpack_from("<HH", payload, 6)
    return _image_info("gif", "gif", w, h)


def probe_bmp(payload: bytes) -> dict:
    w = struct.unpack_from("<i", payload, 18)[0]
    h = abs(struct.unpack_from("<i", payload, 22)[0])
    return _image_info("bmp", "bmp", w, h)


def probe_pnm(payload: bytes) -> dict:
    from .codecs import _pnm_header

    w, h, _maxval, _off = _pnm_header(payload)
    kind = {b"P5": "pgm", b"P6": "ppm"}[payload[:2]]
    return _image_info(kind, kind, w, h)


def _image_info(container: str, codec: str, w: int, h: int) -> dict:
    return {
        "container": container, "brand": None, "duration_s": None,
        "tracks": [
            {
                "kind": "image", "codec": codec, "duration_s": None,
                "n_samples": 1, "width": w, "height": h,
                "sample_rate": None, "channels": None,
            }
        ],
    }


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

def probe_media(payload: bytes) -> dict:
    """Sniff magic bytes and return container metadata without decoding.

    Returns ``{container, brand, duration_s, tracks:[{kind, codec,
    duration_s, n_samples, width, height, sample_rate, channels}]}``.
    Raises ``ValueError`` for unrecognized payloads — callers decide
    whether unknown media is an error or a skip.
    """
    payload = bytes(payload)
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        return probe_mp4(payload)
    if payload[:4] == _EBML_MAGIC:
        return probe_mkv(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return probe_avi(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return probe_wav(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return probe_png(payload)
    if payload[:2] == b"\xff\xd8":
        return probe_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return probe_gif(payload)
    if payload[:2] == b"BM":
        return probe_bmp(payload)
    if payload[:2] in (b"P5", b"P6"):
        return probe_pnm(payload)
    raise ValueError(
        f"unrecognized media container (magic {payload[:12]!r}); "
        "probe_media handles MP4/MOV, MKV/WebM, AVI, WAV, PNG, JPEG, "
        "GIF, BMP and PGM/PPM"
    )
