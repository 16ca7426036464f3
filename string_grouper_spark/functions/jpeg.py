"""Baseline JPEG codec in pure numpy — no libjpeg/PIL.

Completes the real-codec story (`functions.codecs`): baseline sequential
DCT JPEG (SOI/APP0/DQT/SOF0/DHT/SOS/EOI), 8-bit, grayscale or YCbCr with
4:4:4 or 4:2:0 chroma subsampling, optional restart markers on decode.
Progressive (SOF2) and arithmetic coding raise ``NotImplementedError``.

The encoder exists so tests can synthesize deterministic payloads and
assert lossy round-trip quality (decode(encode(x, q=90)) ~ x within a
mean-abs-error bound) — JPEG is lossy, so exact equality is impossible by
design; component-level tests pin the DCT matrix, the zigzag order, and
the Annex-K tables structurally instead.

Entropy decode is a per-symbol python loop (JPEG's huffman stream is
inherently sequential); block math (DCT/IDCT/quantization) is vectorized
over all blocks at once.  That makes this codec correctness-grade for the
multimodal pipeline's tests and small payloads; a production deployment
with libjpeg available should prefer it via the same ``decode_image``
dispatch point.
"""

from __future__ import annotations

import struct
from typing import Dict, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# Constants (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64).reshape(8, 8)

Q_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64).reshape(8, 8)

# (bits[1..16], values) — Annex K.3
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
          list(range(12)))
DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
            list(range(12)))
AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])
AC_CHROM = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])


def dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix C: block_dct = C @ B @ C.T."""
    k = np.arange(8)
    C = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) / 2.0
    C[0, :] = 1.0 / np.sqrt(8.0)
    return C


_C = dct_matrix()


def _quality_tables(quality: int) -> Tuple[np.ndarray, np.ndarray]:
    """libjpeg's quality scaling of the Annex-K tables (clamped 1..255)."""
    q = max(1, min(100, int(quality)))
    s = 5000 // q if q < 50 else 200 - 2 * q
    def scale(t):
        return np.clip(np.floor((t * s + 50) / 100), 1, 255)
    return scale(Q_LUM), scale(Q_CHROM)


# ---------------------------------------------------------------------------
# Huffman helpers
# ---------------------------------------------------------------------------

def _huff_codes(bits, values) -> Dict[int, Tuple[int, int]]:
    """symbol -> (code, length), canonical JPEG assignment."""
    out, code = {}, 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _huff_decoder(bits, values) -> Dict[Tuple[int, int], int]:
    """(length, code) -> symbol."""
    return {(l, c): s for s, (c, l) in _huff_codes(bits, values).items()}


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1s
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        while self.n <= 24 and self.pos < len(self.data):
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # unstuff
                else:
                    self.pos -= 1  # a marker: stop feeding bits
                    return
            self.acc = (self.acc << 8) | b
            self.n += 8

    def bits(self, length: int) -> int:
        if length == 0:
            return 0
        self._fill()
        if self.n < length:
            # pad with zeros at stream end (spec: pad bits after last MCU)
            self.acc <<= (length - self.n)
            self.n = length
        v = (self.acc >> (self.n - length)) & ((1 << length) - 1)
        self.n -= length
        self.acc &= (1 << self.n) - 1
        return v

    def huff(self, table: Dict[Tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("bad huffman code in JPEG stream")

    def align_to_marker(self) -> None:
        self.acc = 0
        self.n = 0


def _extend(v: int, t: int) -> int:
    """DIFF/AC value decoding (T.81 F.2.2.1 EXTEND)."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def _blockify(plane: np.ndarray) -> np.ndarray:
    """(H, W) padded to /8 by edge replication -> (n_blocks, 8, 8)."""
    h, w = plane.shape
    H, W = (h + 7) & ~7, (w + 7) & ~7
    p = np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")
    return (
        p.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8),
        H // 8,
        W // 8,
    )


def _encode_plane_blocks(blocks: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """(n, 8, 8) uint8 -> (n, 64) quantized zigzag coefficients."""
    f = blocks.astype(np.float64) - 128.0
    coef = np.einsum("ij,njk,lk->nil", _C, f, _C)
    q = np.round(coef / qtab[None]).astype(np.int64)
    return q.reshape(-1, 64)[:, ZIGZAG]


def _write_block(w: _BitWriter, zz: np.ndarray, pred: int, dc_codes, ac_codes) -> int:
    diff = int(zz[0]) - pred
    t = _category(diff)
    code, ln = dc_codes[t]
    w.write(code, ln)
    if t:
        w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = int(np.nonzero(zz[1:])[0][-1]) + 1 if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        t = _category(v)
        code, ln = ac_codes[(run << 4) | t]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << t) - 1, t)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        w.write(code, ln)
    return int(zz[0])


def encode_jpeg(img: np.ndarray, quality: int = 90, subsample: bool = False) -> bytes:
    """uint8 (h,w) grayscale or (h,w,3) RGB -> baseline JFIF bytes.

    ``subsample=True`` writes 4:2:0 (2x2 Y sampling, chroma halved by
    2x2 mean) — exercises the decoder's MCU-interleaved upsampling path.
    """
    img = np.ascontiguousarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    ql, qc = _quality_tables(quality)

    if gray:
        planes = [(img.astype(np.float64), ql, 1, 1)]
    else:
        r, g, b = (img[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            H2, W2 = (h + 1) & ~1, (w + 1) & ~1
            def half(p):
                pp = np.pad(p, ((0, H2 - h), (0, W2 - w)), mode="edge")
                return pp.reshape(H2 // 2, 2, W2 // 2, 2).mean(axis=(1, 3))
            planes = [(y, ql, 2, 2), (half(cb), qc, 1, 1), (half(cr), qc, 1, 1)]
        else:
            planes = [(y, ql, 1, 1), (cb, qc, 1, 1), (cr, qc, 1, 1)]

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, tab in ((0, ql), (1, qc)) if not gray else ((0, ql),):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(v) for v in tab.reshape(64)[ZIGZAG])
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for i, (_, _, hs, vs) in enumerate(planes):
        out += struct.pack("BBB", i + 1, (hs << 4) | vs, 0 if i == 0 else 1)
    for cls, tid, (bits, vals) in (
        (0, 0, DC_LUM), (1, 0, AC_LUM), (0, 1, DC_CHROM), (1, 1, AC_CHROM)
    )[: 2 if gray else 4]:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), (cls << 4) | tid)
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for i in range(ncomp):
        out += struct.pack("BB", i + 1, 0x00 if i == 0 else 0x11)
    out += b"\x00\x3f\x00"

    dc_l, ac_l = _huff_codes(*DC_LUM), _huff_codes(*AC_LUM)
    dc_c, ac_c = _huff_codes(*DC_CHROM), _huff_codes(*AC_CHROM)
    writer = _BitWriter()
    comp_blocks = []
    for ci, (plane, qtab, hs, vs) in enumerate(planes):
        blocks, bh, bw = _blockify(plane)
        comp_blocks.append((_encode_plane_blocks(blocks, qtab), bh, bw, hs, vs))

    # MCU-interleaved emission
    hmax = max(p[3] for p in comp_blocks)
    vmax = max(p[4] for p in comp_blocks)
    mcu_rows = (h + 8 * vmax - 1) // (8 * vmax)
    mcu_cols = (w + 8 * hmax - 1) // (8 * hmax)
    preds = [0] * len(comp_blocks)
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            for ci, (zzs, bh, bw, hs, vs) in enumerate(comp_blocks):
                dc_codes = dc_l if ci == 0 else dc_c
                ac_codes = ac_l if ci == 0 else ac_c
                for by in range(vs):
                    for bx in range(hs):
                        r = min(my * vs + by, bh - 1)
                        c = min(mx * hs + bx, bw - 1)
                        preds[ci] = _write_block(
                            writer, zzs[r * bw + c], preds[ci], dc_codes, ac_codes
                        )
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> uint8 (h,w) or (h,w,3) RGB."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: Dict[int, np.ndarray] = {}
    htabs: Dict[Tuple[int, int], Dict] = {}
    comps = None
    h = w = 0
    restart_interval = 0
    scan = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (may hold several tables)
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0xF
                if prec != 0:
                    raise NotImplementedError("16-bit quant tables")
                t = np.zeros(64)
                t[ZIGZAG] = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8)
                qtabs[tid] = t.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT (may hold several tables)
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                htabs[(cls, tid)] = _huff_decoder(bits, vals)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            _prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for i in range(nc):
                cid, sf, qid = struct.unpack_from("BBB", body, 6 + 3 * i)
                comps.append({"id": cid, "h": sf >> 4, "v": sf & 0xF, "q": qid})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError("non-baseline JPEG (progressive/arithmetic)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            for i in range(ns):
                cid, tids = body[1 + 2 * i], body[2 + 2 * i]
                for c in comps:
                    if c["id"] == cid:
                        c["dc"] = tids >> 4
                        c["ac"] = tids & 0xF
            scan = payload[pos + seglen :]
            break
        pos += seglen
    if comps is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_rows = (h + 8 * vmax - 1) // (8 * vmax)
    mcu_cols = (w + 8 * hmax - 1) // (8 * hmax)
    for c in comps:
        c["bw"] = mcu_cols * c["h"]
        c["bh"] = mcu_rows * c["v"]
        c["zz"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int64)

    reader = _BitReader(scan)
    preds = [0] * len(comps)
    mcu_index = 0
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                reader.align_to_marker()
                p = reader.pos
                while p + 1 < len(reader.data) and not (
                    reader.data[p] == 0xFF and 0xD0 <= reader.data[p + 1] <= 0xD7
                ):
                    p += 1
                reader.pos = p + 2
                preds = [0] * len(comps)
            mcu_index += 1
            for ci, c in enumerate(comps):
                dct = htabs[(0, c["dc"])]
                act = htabs[(1, c["ac"])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = c["zz"][(my * c["v"] + by) * c["bw"] + mx * c["h"] + bx]
                        t = reader.huff(dct)
                        diff = _extend(reader.bits(t), t)
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k <= 63:
                            sym = reader.huff(act)
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += sym >> 4
                            if k > 63:
                                raise ValueError("AC index overrun")
                            t = sym & 0xF
                            zz[k] = _extend(reader.bits(t), t)
                            k += 1

    planes = []
    for c in comps:
        coef = np.zeros((len(c["zz"]), 64), dtype=np.float64)
        coef[:, ZIGZAG] = c["zz"]
        coef = coef.reshape(-1, 8, 8) * qtabs[c["q"]][None]
        blocks = np.einsum("ji,njk,kl->nil", _C, coef, _C)  # C.T @ B @ C
        blocks = np.clip(np.round(blocks + 128.0), 0, 255)
        plane = (
            blocks.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        # upsample to full resolution (nearest) then crop
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return planes[0].astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
