"""Baseline + progressive JPEG codec in pure numpy — no libjpeg/PIL.

Completes the real-codec story (`functions.codecs`): sequential DCT JPEG
(SOI/APP0/DQT/SOF0/DHT/SOS/EOI) AND progressive DCT JPEG (SOF2 —
multi-scan spectral selection + successive approximation: DC first/refine
scans, per-component AC band scans with EOB-run decoding, AC refinement
with correction bits, per ITU-T T.81 G.1/G.2), 8-bit, grayscale or YCbCr
with 4:4:4 or 4:2:0 chroma subsampling, optional restart markers.
Arithmetic coding and lossless JPEG raise ``NotImplementedError``.

The encoders exist so tests can synthesize deterministic payloads:
``encode_jpeg`` (baseline) asserts lossy round-trip quality bounds, and
``encode_jpeg_progressive`` emits a real SOF2 multi-scan stream whose
decode must EXACTLY equal the baseline decode of the same image at the
same quality (both reconstruct identical quantized coefficients), pinning
every progressive scan kind without an external encoder in the sandbox.

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


def _enc_dc_first(w: _BitWriter, zz0: int, pred: int, al: int, dc_codes) -> int:
    """DC first scan: diff-code the point-transformed DC (T.81 G.1.2.1 —
    DC point transform is an ARITHMETIC shift, unlike AC's magnitude
    shift).  Returns the new predictor."""
    v = int(zz0) >> al
    diff = v - pred
    t = _category(diff)
    code, ln = dc_codes[t]
    w.write(code, ln)
    if t:
        w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    return v


def _pt_ac(v: int, al: int) -> int:
    """AC point transform: magnitude shift, sign kept (T.81 G.1.2.2)."""
    return (abs(int(v)) >> al) * (1 if v >= 0 else -1)


def _enc_ac_first(w: _BitWriter, zz: np.ndarray, ss: int, se: int, al: int, ac_codes) -> None:
    """AC band, first scan.  EOB runs are never accumulated across blocks
    (every block ends with EOB0 when it has trailing zeros), so the
    Annex-K tables — which lack the EOBn (r>0, s=0) symbols — suffice."""
    run = 0
    for k in range(ss, se + 1):
        t = _pt_ac(zz[k], al)
        if t == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            w.write(code, ln)
            run -= 16
        s = _category(t)
        code, ln = ac_codes[(run << 4) | s]
        w.write(code, ln)
        w.write(t if t >= 0 else t + (1 << s) - 1, s)
        run = 0
    if run > 0:
        code, ln = ac_codes[0x00]  # EOB0
        w.write(code, ln)


def _enc_ac_refine(w: _BitWriter, zz: np.ndarray, ss: int, se: int, al: int, ac_codes) -> None:
    """AC band, successive-approximation refinement (T.81 G.1.2.3, the
    libjpeg-equivalent correction-bit algorithm): newly-significant
    coefficients (|coef|>>al == 1) emit (run, 1) symbols + a sign bit;
    already-nonzero coefficients contribute one buffered correction bit,
    flushed after the next emitted symbol (the decoder consumes them while
    advancing).  EOB runs are again per-block (EOB0 only)."""
    vals = [(abs(int(zz[k])) >> al) for k in range(ss, se + 1)]
    eob = -1  # index (into band) of the last NEWLY-significant coefficient
    for i, t in enumerate(vals):
        if t == 1:
            eob = i
    run = 0
    br: list = []

    def flush_br():
        for b in br:
            w.write(b, 1)
        br.clear()

    for i, t in enumerate(vals):
        if t == 0:
            run += 1
            continue
        while run > 15 and i <= eob:
            code, ln = ac_codes[0xF0]
            w.write(code, ln)
            run -= 16
            flush_br()
        if t > 1:  # history coefficient: correction bit only
            br.append(t & 1)
            continue
        # newly significant (t == 1)
        code, ln = ac_codes[(run << 4) | 1]
        w.write(code, ln)
        w.write(1 if zz[ss + i] >= 0 else 0, 1)
        flush_br()
        run = 0
    if run > 0 or br:
        code, ln = ac_codes[0x00]  # EOB0: rest of band is runs + corrections
        w.write(code, ln)
        flush_br()


def encode_jpeg_progressive(
    img: np.ndarray, quality: int = 90, subsample: bool = False
) -> bytes:
    """uint8 (h,w) grayscale or (h,w,3) RGB -> PROGRESSIVE (SOF2) JFIF.

    Scan script (exercises every progressive scan kind the decoder
    implements, with successive approximation Al=1 -> 0):

      1. interleaved DC first scan       (Ss=0, Se=0, Ah=0, Al=1)
      2. per component: AC first scan    (Ss=1, Se=63, Ah=0, Al=1)
      3. interleaved DC refinement       (Ss=0, Se=0, Ah=1, Al=0)
      4. per component: AC refinement    (Ss=1, Se=63, Ah=1, Al=0)

    The quantized coefficients reconstructed by the decoder are EXACTLY the
    baseline encoder's at the same quality, so
    ``decode_jpeg(encode_jpeg_progressive(x, q)) ==
    decode_jpeg(encode_jpeg(x, q))`` bit-for-bit — the in-sandbox
    round-trip oracle for the progressive path."""
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

    ncomp = 1 if gray else 3
    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, tab in ((0, ql), (1, qc)) if not gray else ((0, ql),):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(v) for v in tab.reshape(64)[ZIGZAG])
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)  # SOF2
    for i, (_, _, hs, vs) in enumerate(planes):
        out += struct.pack("BBB", i + 1, (hs << 4) | vs, 0 if i == 0 else 1)
    for cls, tid, (bits, vals) in (
        (0, 0, DC_LUM), (1, 0, AC_LUM), (0, 1, DC_CHROM), (1, 1, AC_CHROM)
    )[: 2 if gray else 4]:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), (cls << 4) | tid)
        out += bytes(bits) + bytes(vals)

    dc_codes = [_huff_codes(*DC_LUM)] + [_huff_codes(*DC_CHROM)] * (ncomp - 1)
    ac_codes = [_huff_codes(*AC_LUM)] + [_huff_codes(*AC_CHROM)] * (ncomp - 1)
    comp_blocks = []
    for plane, qtab, hs, vs in planes:
        blocks, bh, bw = _blockify(plane)
        comp_blocks.append((_encode_plane_blocks(blocks, qtab), bh, bw, hs, vs))
    hmax = max(p[3] for p in comp_blocks)
    vmax = max(p[4] for p in comp_blocks)
    mcu_rows = (h + 8 * vmax - 1) // (8 * vmax)
    mcu_cols = (w + 8 * hmax - 1) // (8 * hmax)

    def sos_header(comp_ids, ss, se, ah, al):
        seg = bytearray()
        seg += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comp_ids), len(comp_ids))
        for ci in comp_ids:
            # DC table id in high nibble, AC in low — same table layout as
            # the baseline writer (luma tables 0, chroma tables 1)
            seg += struct.pack("BB", ci + 1, 0x00 if ci == 0 else 0x11)
        seg += struct.pack("BBB", ss, se, (ah << 4) | al)
        return seg

    def iter_mcu_blocks(ci):
        zzs, bh, bw, hs, vs = comp_blocks[ci]
        for my in range(mcu_rows):
            for mx in range(mcu_cols):
                for by in range(vs):
                    for bx in range(hs):
                        r = min(my * vs + by, bh - 1)
                        c = min(mx * hs + bx, bw - 1)
                        yield zzs[r * bw + c]

    # scan 1: interleaved DC first (Al=1)
    out += sos_header(list(range(ncomp)), 0, 0, 0, 1)
    wtr = _BitWriter()
    preds = [0] * ncomp
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            for ci in range(ncomp):
                zzs, bh, bw, hs, vs = comp_blocks[ci]
                for by in range(vs):
                    for bx in range(hs):
                        r = min(my * vs + by, bh - 1)
                        c = min(mx * hs + bx, bw - 1)
                        preds[ci] = _enc_dc_first(
                            wtr, zzs[r * bw + c][0], preds[ci], 1, dc_codes[ci]
                        )
    out += wtr.flush()

    # scans 2..: per-component AC first (Al=1), non-interleaved ceil-grid
    for ci in range(ncomp):
        zzs, bh, bw, hs, vs = comp_blocks[ci]
        out += sos_header([ci], 1, 63, 0, 1)
        wtr = _BitWriter()
        for zz in zzs:  # _blockify grid IS the component's ceil-grid
            _enc_ac_first(wtr, zz, 1, 63, 1, ac_codes[ci])
        out += wtr.flush()

    # DC refinement (interleaved, raw bits)
    out += sos_header(list(range(ncomp)), 0, 0, 1, 0)
    wtr = _BitWriter()
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            for ci in range(ncomp):
                zzs, bh, bw, hs, vs = comp_blocks[ci]
                for by in range(vs):
                    for bx in range(hs):
                        r = min(my * vs + by, bh - 1)
                        c = min(mx * hs + bx, bw - 1)
                        wtr.write(int(zzs[r * bw + c][0]) & 1, 1)
    out += wtr.flush()

    # per-component AC refinement (Al=0)
    for ci in range(ncomp):
        zzs, bh, bw, hs, vs = comp_blocks[ci]
        out += sos_header([ci], 1, 63, 1, 0)
        wtr = _BitWriter()
        for zz in zzs:
            _enc_ac_refine(wtr, zz, 1, 63, 0, ac_codes[ci])
        out += wtr.flush()

    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def _dec_ac_first(reader, zz, act, ks: int, se: int, al: int, eobrun: list) -> None:
    """AC coefficients, first scan of the band (T.81 G.2 / F.2.2.2 with
    EOB-run extension).  In a baseline full scan (ks=1, se=63, al=0) the
    only EOB symbol that appears is EOB0, so this reduces exactly to the
    sequential AC decode."""
    if eobrun[0] > 0:
        eobrun[0] -= 1
        return
    k = ks
    while k <= se:
        sym = reader.huff(act)
        r, s = sym >> 4, sym & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun[0] = (1 << r) - 1  # EOBn: run includes this block
            if r:
                eobrun[0] += reader.bits(r)
            return
        k += r
        if k > se:
            raise ValueError("AC index overrun")
        zz[k] = _extend(reader.bits(s), s) << al
        k += 1


def _dec_ac_refine(reader, zz, act, ks: int, se: int, al: int, eobrun: list) -> None:
    """AC successive-approximation refinement scan (T.81 G.2): newly
    significant coefficients arrive as ±1<<al; every already-nonzero
    coefficient passed on the way consumes one correction bit that may add
    1<<al toward larger magnitude.  All history values are multiples of
    1<<al, so the two's-complement ``& p1`` test reads the pending bit
    exactly for either sign."""
    p1, m1 = 1 << al, -1 << al
    k = ks
    if eobrun[0] == 0:
        while k <= se:
            sym = reader.huff(act)
            r, s = sym >> 4, sym & 0xF
            s_val = 0
            if s == 0:
                if r != 15:
                    eobrun[0] = 1 << r
                    if r:
                        eobrun[0] += reader.bits(r)
                    break
                # r == 15: ZRL — skip 16 zero-history positions below
            else:
                if s != 1:
                    raise ValueError("refinement scan symbol with s > 1")
                s_val = p1 if reader.bits(1) else m1
            while k <= se:
                if zz[k] != 0:
                    if reader.bits(1) and (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s_val and k <= se:
                zz[k] = s_val
            k += 1
    if eobrun[0] > 0:
        while k <= se:
            if zz[k] != 0:
                if reader.bits(1) and (zz[k] & p1) == 0:
                    zz[k] += p1 if zz[k] >= 0 else m1
            k += 1
        eobrun[0] -= 1


def _decode_scan(
    payload: bytes,
    start: int,
    comps: list,
    scan_comps: list,
    htabs: Dict,
    restart_interval: int,
    ss: int,
    se: int,
    ah: int,
    al: int,
    h: int,
    w: int,
    hmax: int,
    vmax: int,
) -> int:
    """Decode ONE entropy-coded scan (baseline full scan or any progressive
    scan kind); returns the payload offset of the next marker."""
    reader = _BitReader(payload)
    reader.pos = start
    preds = [0] * len(scan_comps)
    eobrun = [0]

    def restart_sync():
        reader.align_to_marker()
        p = reader.pos
        while p + 1 < len(payload) and not (
            payload[p] == 0xFF and 0xD0 <= payload[p + 1] <= 0xD7
        ):
            p += 1
        reader.pos = p + 2
        preds[:] = [0] * len(scan_comps)
        eobrun[0] = 0

    def decode_block(ci: int, c: dict, zz) -> None:
        if ss == 0:  # DC (progressive DC-only scan, or baseline's k=0)
            if ah == 0:
                t = reader.huff(htabs[(0, c["dc"])])
                preds[ci] += _extend(reader.bits(t), t)
                zz[0] = preds[ci] << al
            else:  # DC refinement: one raw bit per block
                if reader.bits(1):
                    zz[0] |= 1 << al
        if se > 0:
            act = htabs[(1, c["ac"])]
            ks = max(ss, 1)
            if ah == 0:
                _dec_ac_first(reader, zz, act, ks, se, al, eobrun)
            else:
                _dec_ac_refine(reader, zz, act, ks, se, al, eobrun)

    unit = 0  # restart counting: MCUs (interleaved) or blocks
    if len(scan_comps) > 1:  # interleaved (baseline, or progressive DC)
        mcu_rows = (h + 8 * vmax - 1) // (8 * vmax)
        mcu_cols = (w + 8 * hmax - 1) // (8 * hmax)
        for my in range(mcu_rows):
            for mx in range(mcu_cols):
                if restart_interval and unit and unit % restart_interval == 0:
                    restart_sync()
                unit += 1
                for ci, c in enumerate(scan_comps):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            zz = c["zz"][(my * c["v"] + by) * c["bw"] + mx * c["h"] + bx]
                            decode_block(ci, c, zz)
    else:  # non-interleaved: the component's own ceil-grid, row-major
        c = scan_comps[0]
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        nbw, nbh = -(-cw // 8), -(-ch // 8)
        for r in range(nbh):
            for col in range(nbw):
                if restart_interval and unit and unit % restart_interval == 0:
                    restart_sync()
                unit += 1
                decode_block(0, c, c["zz"][r * c["bw"] + col])

    # advance to the next marker (skip pad bits and any trailing RSTs)
    p = reader.pos
    while p + 1 < len(payload):
        if payload[p] == 0xFF and payload[p + 1] != 0x00:
            if 0xD0 <= payload[p + 1] <= 0xD7:
                p += 2
                continue
            return p
        p += 1
    return len(payload)


def find_sof(payload: bytes):
    """Marker walk to the first SOFn frame header — the ONE shared
    implementation of the pre-entropy segment scan (T.81 B.1.1.2 fill
    bytes included), used by the header probe (``containers.probe_jpeg``)
    so marker-handling fixes land once.  Returns ``(sof_marker, height,
    width, n_components)``; raises ``ValueError`` on desync or if the
    stream ends (EOI / SOS) before any frame header."""
    pos, n = 2, len(payload)
    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker stream desynchronized")
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte padding a marker
            pos += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:  # standalone markers
            pos += 2
            continue
        if marker in (0xD9, 0xDA):  # EOI / entropy start: no frame header
            break
        if pos + 4 > n:
            break
        seglen = struct.unpack_from(">H", payload, pos + 2)[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack_from(">HH", payload, pos + 5)
            return marker, h, w, payload[pos + 9]
        pos += 2 + seglen
    raise ValueError("JPEG without SOF segment")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline OR progressive JFIF bytes -> uint8 (h,w) or (h,w,3) RGB."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: Dict[int, np.ndarray] = {}
    htabs: Dict[Tuple[int, int], Dict] = {}
    comps = None
    h = w = 0
    hmax = vmax = 1
    restart_interval = 0
    got_scan = False
    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker == 0xFF:  # T.81 B.1.1.2: any number of 0xFF fill bytes
            pos += 1        # may pad a marker — skip one pad, re-read
            continue
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            _prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for i in range(nc):
                cid, sf, qid = struct.unpack_from("BBB", body, 6 + 3 * i)
                comps.append({"id": cid, "h": sf >> 4, "v": sf & 0xF, "q": qid})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcu_rows = (h + 8 * vmax - 1) // (8 * vmax)
            mcu_cols = (w + 8 * hmax - 1) // (8 * hmax)
            for c in comps:
                c["bw"] = mcu_cols * c["h"]
                c["bh"] = mcu_rows * c["v"]
                c["zz"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int64)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError("unsupported JPEG (lossless/arithmetic)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — decode this scan, then keep parsing
            if comps is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan_comps = []
            for i in range(ns):
                cid, tids = body[1 + 2 * i], body[2 + 2 * i]
                for c in comps:
                    if c["id"] == cid:
                        c["dc"] = tids >> 4
                        c["ac"] = tids & 0xF
                        scan_comps.append(c)
            ss = body[1 + 2 * ns]
            se = body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            pos = _decode_scan(
                payload, pos + seglen, comps, scan_comps, htabs,
                restart_interval, ss, se, ahal >> 4, ahal & 0xF,
                h, w, hmax, vmax,
            )
            got_scan = True
            continue
        pos += seglen
    if comps is None or not got_scan:
        raise ValueError("JPEG missing SOF/SOS")

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
