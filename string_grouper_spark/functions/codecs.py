"""REAL pure-python/numpy media codecs — no PIL/opencv/ffmpeg required.

Earlier rounds stubbed the codec layer ("no image/audio libs in this
container"), but several production formats need nothing beyond the
standard library and numpy:

  * PPM (P6) / PGM (P5) — header parse + ``np.frombuffer``;
  * BMP — 8/24/32-bit uncompressed BI_RGB windows bitmaps (struct parse,
    4-byte row padding, bottom-up row order);
  * PNG — chunk walk, IHDR, concatenated IDAT -> ``zlib.decompress``,
    per-scanline filter reconstruction (None/Sub/Up/Average/Paeth) for
    8-bit gray/RGB/RGBA (the overwhelming web-PNG case);
  * WAV — stdlib ``wave`` -> int16/uint8 PCM samples + sample rate.

Baseline AND progressive (SOF2) JPEG also decode for real via the
pure-numpy codec in ``functions.jpeg`` (``sniff_and_decode_image``
dispatches on the SOI magic), and MJPEG-in-AVI video decodes via the RIFF
walk below.  The only formats that still raise ``NotImplementedError``
are arithmetic-coded/lossless JPEG and non-AVI video containers
(MP4/MKV/WebM — H.26x/VP9 entropy machinery) — the stub surface is now
only where the container truly lacks the capability.

Encoders for PPM/BMP/PNG/WAV are included so tests can synthesize
deterministic payloads and assert decode(encode(x)) == x exactly.

All decoders return numpy arrays (images: uint8 HxW or HxWxC; audio:
(samples[, channels]) int16/uint8) — the shapes the multimodal
featurizer consumes.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib
from typing import Tuple

import numpy as np


# --------------------------------------------------------------------------
# PPM / PGM (netpbm binary)
# --------------------------------------------------------------------------

def _pnm_header(payload: bytes):
    """Parse 'P6\\n<w> <h>\\n<maxval>\\n' allowing comments/any whitespace."""
    pos = 2
    fields = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    return fields[0], fields[1], fields[2], pos + 1  # w, h, maxval, data_off


def decode_ppm(payload: bytes) -> np.ndarray:
    """P6 (RGB) / P5 (gray) binary netpbm -> uint8 array (h,w,3) / (h,w)."""
    magic = payload[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError(f"not a binary PPM/PGM payload (magic {magic!r})")
    w, h, maxval, off = _pnm_header(payload)
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm not supported")
    ch = 3 if magic == b"P6" else 1
    arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch, offset=off)
    if maxval != 255:
        # netpbm samples are relative to maxval; rescale to the uint8
        # convention the featurizer assumes (round-half-up like most viewers)
        arr = ((arr.astype(np.uint32) * 255 + maxval // 2) // maxval).astype(np.uint8)
    return arr.reshape((h, w, 3)) if ch == 3 else arr.reshape((h, w))


def encode_ppm(img: np.ndarray) -> bytes:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 3 and img.shape[2] == 3:
        magic = b"P6"
    elif img.ndim == 2:
        magic = b"P5"
    else:
        raise ValueError("encode_ppm expects (h,w,3) or (h,w) uint8")
    h, w = img.shape[:2]
    return magic + b"\n%d %d\n255\n" % (w, h) + img.tobytes()


# --------------------------------------------------------------------------
# BMP (uncompressed BI_RGB)
# --------------------------------------------------------------------------

def decode_bmp(payload: bytes) -> np.ndarray:
    """8/24/32-bit uncompressed BMP -> uint8 (h,w[,3|4]); bottom-up or
    top-down row order handled; rows are 4-byte padded per the spec."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP not supported")
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0:
        raise NotImplementedError(f"compressed BMP (method {compression})")
    if bpp not in (8, 24, 32):
        raise NotImplementedError(f"{bpp}-bit BMP")
    top_down = h < 0
    h = abs(h)
    ch = bpp // 8
    stride = (w * ch + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)[:, : w * ch]
    img = rows.reshape(h, w, ch) if ch > 1 else rows.reshape(h, w)
    if ch == 1:
        # 8-bit pixels are PALETTE LOOKUPS, not intensities: two visually
        # identical images with permuted palettes would otherwise decode to
        # unrelated "gray" planes and break perceptual hashing.  The color
        # table (BGRA quads) sits between the DIB header and the pixel data.
        clr_used = struct.unpack_from("<I", payload, 46)[0] or 256
        pal_off = 14 + hdr_size
        if data_off - pal_off >= clr_used * 4:
            pal = np.frombuffer(
                payload, dtype=np.uint8, count=clr_used * 4, offset=pal_off
            ).reshape(-1, 4)[:, [2, 1, 0]]  # BGRA -> RGB
            img = pal[np.minimum(img, clr_used - 1)]
            if (pal[:, 0] == pal[:, 1]).all() and (pal[:, 1] == pal[:, 2]).all():
                img = img[..., 0]  # genuinely gray palette -> (h, w)
            ch = img.shape[2] if img.ndim == 3 else 1
        # else: no color table stored (non-conformant writer) — raw indices
        # as intensities is the only available reading
        if not top_down:
            img = img[::-1]
        return np.ascontiguousarray(img)
    if not top_down:
        img = img[::-1]
    # stored BGR(A) -> return RGB(A)
    img = img[..., [2, 1, 0] + ([3] if ch == 4 else [])]
    return np.ascontiguousarray(img)


def encode_bmp(img: np.ndarray) -> bytes:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_bmp expects (h,w,3) uint8")
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    padded = np.zeros((h, stride), dtype=np.uint8)
    padded[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = padded.tobytes()
    file_hdr = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return file_hdr + dib + data


# --------------------------------------------------------------------------
# PNG (8-bit gray / RGB / RGBA, all five scanline filters)
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, rgb, gray+a, rgba


def decode_png(payload: bytes) -> np.ndarray:
    """8-bit non-interlaced PNG -> uint8 (h,w[,c]).  Walks chunks, inflates
    the concatenated IDAT stream, and reconstructs the five scanline
    filters exactly per the spec (the Paeth predictor included)."""
    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    ihdr = None
    idat = []
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack_from(">I", payload, pos), payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + body + crc
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG depth={depth} color={color} interlace={interlace} "
            "(only 8-bit non-interlaced gray/RGB/RGBA supported)"
        )
    ch = _PNG_CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype, line = lines[y, 0], lines[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:  # None
            out[y] = line
        elif ftype == 2:  # Up
            out[y] = (line + prev) & 0xFF
        elif ftype == 1:  # Sub: per-channel prefix sum (mod 256), vectorized
            out[y] = np.cumsum(line.reshape(w, ch), axis=0).reshape(stride) & 0xFF
        elif ftype in (3, 4):  # Average / Paeth need a sequential left scan
            cur = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - ch] & 0xFF if x >= ch else 0
                b = prev[x]
                if ftype == 3:
                    cur[x] = line[x] + ((a + b) >> 1)
                else:
                    c = prev[x - ch] if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[x] = line[x] + pred
            out[y] = cur & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
    img = out.reshape(h, w, ch)
    return img[..., 0] if ch == 1 else img


def encode_png(img: np.ndarray) -> bytes:
    """Minimal PNG writer (filter 0 scanlines) for tests/synthesis."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color, ch = 0, 1
        img = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        color, ch = 2, 3
    elif img.ndim == 3 and img.shape[2] == 4:
        color, ch = 6, 4
    else:
        raise ValueError("encode_png expects (h,w), (h,w,3) or (h,w,4) uint8")
    h, w = img.shape[:2]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    scan = np.zeros((h, w * ch + 1), dtype=np.uint8)
    scan[:, 1:] = img.reshape(h, w * ch)
    idat = zlib.compress(scan.tobytes(), 6)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


# --------------------------------------------------------------------------
# AVI / MJPEG video (RIFF container walk + the pure-numpy JPEG codec)
# --------------------------------------------------------------------------

def _riff_chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_size) over a RIFF chunk run."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def decode_avi_mjpeg(payload: bytes) -> np.ndarray:
    """Motion-JPEG AVI -> uint8 (n_frames, h, w, 3) RGB.

    The one video container this sandbox can decode for REAL: RIFF walk to
    the ``movi`` list, every ``..dc``/``..db`` chunk that starts with a
    JPEG SOI runs through ``functions.jpeg.decode_jpeg`` (baseline or
    progressive).  Other codecs inside AVI, and non-RIFF containers
    (MP4/MKV/WebM — all need H.26x/VP9 entropy machinery), still raise
    ``NotImplementedError``."""
    from .jpeg import decode_jpeg

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    frames = []
    saw_video_chunk = False

    def walk(start: int, end: int) -> None:
        nonlocal saw_video_chunk
        for fourcc, body, size in _riff_chunks(payload, start, end):
            if fourcc == b"LIST":
                walk(body + 4, body + size)  # skip the list-type fourcc
            elif fourcc[2:4] in (b"dc", b"db") and size > 0:
                saw_video_chunk = True
                chunk = payload[body : body + size]
                if chunk[:2] == b"\xff\xd8":
                    img = decode_jpeg(chunk)
                    if img.ndim == 2:
                        img = np.stack([img] * 3, axis=2)
                    frames.append(img)
                else:
                    raise NotImplementedError(
                        "AVI video chunk is not MJPEG (needs an external codec)"
                    )

    walk(12, len(payload))
    if not frames:
        raise ValueError(
            "AVI has no decodable video frames"
            if saw_video_chunk
            else "AVI contains no video chunks"
        )
    return np.stack(frames)


def encode_avi_mjpeg(frames: np.ndarray, fps: int = 10, quality: int = 85) -> bytes:
    """(n, h, w, 3) or (n, h, w) uint8 -> minimal MJPEG AVI (RIFF/hdrl/movi
    + idx1), each frame a baseline JPEG — so tests can synthesize real video
    payloads and pin decode(encode(x)) == per-frame JPEG round-trip exactly."""
    from .jpeg import encode_jpeg

    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    if frames.ndim == 3:  # grayscale -> RGB
        frames = np.stack([frames] * 3, axis=3)
    n, h, w = frames.shape[:3]
    payloads = [encode_jpeg(f, quality=quality) for f in frames]

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    usec_per_frame = max(1, 1_000_000 // max(1, fps))
    max_bytes = max(len(p) for p in payloads)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        usec_per_frame, max_bytes * fps, 0, 0x10,  # HASINDEX
        n, 0, 1, max_bytes, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, max_bytes, 0, 0, 0)
        + struct.pack("<hhhh", 0, 0, w, h)
    )
    # BITMAPINFOHEADER, biCompression = 'MJPG'
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_chunks = b"".join(chunk(b"00dc", p) for p in payloads)
    movi = lst(b"movi", movi_chunks)
    # idx1: offsets relative to the start of the movi list data
    idx, off = bytearray(), 4
    for p in payloads:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(p))
        off += 8 + len(p) + (len(p) & 1)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


# --------------------------------------------------------------------------
# WAV (PCM via stdlib wave)
# --------------------------------------------------------------------------

def decode_wav(payload: bytes) -> Tuple[np.ndarray, int]:
    """PCM WAV -> (samples, sample_rate).  8-bit -> uint8, 16-bit -> int16;
    stereo returns shape (n, channels)."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        n, ch, width, rate = (
            wf.getnframes(), wf.getnchannels(), wf.getsampwidth(), wf.getframerate(),
        )
        raw = wf.readframes(n)
    if width == 1:
        arr = np.frombuffer(raw, dtype=np.uint8)
    elif width == 2:
        arr = np.frombuffer(raw, dtype="<i2")
    else:
        raise NotImplementedError(f"{8 * width}-bit WAV")
    if ch > 1:
        arr = arr.reshape(-1, ch)
    return arr, rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    samples = np.asarray(samples)
    ch = 1 if samples.ndim == 1 else samples.shape[1]
    width = 1 if samples.dtype == np.uint8 else 2
    if width == 2:
        samples = samples.astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(ch)
        wf.setsampwidth(width)
        wf.setframerate(int(sample_rate))
        wf.writeframes(np.ascontiguousarray(samples).tobytes())
    return buf.getvalue()


# --------------------------------------------------------------------------
# Sniffing dispatcher + array ops the featurizer uses
# --------------------------------------------------------------------------

def sniff_and_decode_image(payload: bytes) -> np.ndarray:
    """Magic-byte dispatch to the real decoders (PNG/PPM/PGM/BMP and both
    baseline and progressive JPEG — all pure numpy); unknown formats raise
    loudly."""
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] in (b"P6", b"P5"):
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:3] == b"\xff\xd8\xff":
        from .jpeg import decode_jpeg  # baseline + progressive (SOF0/1/2)

        return decode_jpeg(payload)
    raise ValueError(f"unrecognized image payload (head {payload[:4]!r})")


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize via index arithmetic — no interpolation lib."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys[:, None], xs[None, :]]
