"""Baseline JPEG codec (grayscale + YCbCr color) — pure numpy/stdlib, ITU T.81.

Closes the image-codec gap (round-2 VERDICT F25, color extension round-3
VERDICT #6): PNG is handled by operators/raster.py; this module implements
BASELINE sequential-DCT JPEG — decode for corpus payloads (grayscale and
interleaved 3-component YCbCr at 4:4:4 / 4:2:2 / 4:2:0 sampling), plus
encoder twins (grayscale and color 4:2:0/4:4:4) for fixtures/round-trips,
exactly like the EXIF/MVT/PNG/WARC wire codecs in this repo. Everything is
from the public spec: the zigzag order, the Annex K.1/K.2 quantization
tables, the Annex K.3 typical Huffman tables, and the JFIF YCbCr <-> RGB
matrices.

Scope (documented, checked loudly): baseline DCT (SOF0, interleaved or
per-component scans) AND progressive DCT (SOF2, spectral selection +
successive approximation per Annex G — DC first/refine, AC first/refine,
EOB runs), 1 or 3 components, sampling factors 1-2, no restart markers,
no hierarchical/lossless/arithmetic coding. Out-of-scope payloads raise
ValueError — callers treat them as undecodable, the same contract as the
PNG path. The DCT is the exact orthonormal matrix form (float64 matmul),
so encode->decode error is bounded by quantization alone (chroma planes
additionally by the 2x2 box subsample where 4:2:0 is chosen); the
progressive encoder stages the same quantized coefficients, so its decode
is bit-identical to the baseline encoder's at equal settings.
"""

from __future__ import annotations

import struct

import numpy as np

#: decode-side allocation guard: refuse images beyond 64 MPix (forged
#: headers in crawled payloads must fail loudly, not OOM the executor)
MAX_PIXELS = 64 * 1024 * 1024

# -- spec constants ---------------------------------------------------------

#: zigzag scan order: ZIGZAG[i] = (row*8 + col) of the i-th coefficient
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

#: Annex K.1 luminance quantization table (quality 50 base), zigzag order
QTABLE_LUMA = np.array(
    [
        16, 11, 12, 14, 12, 10, 16, 14, 13, 14, 18, 17, 16, 19, 24, 40,
        26, 24, 22, 22, 24, 49, 35, 37, 29, 40, 58, 51, 61, 60, 57, 51,
        56, 55, 64, 72, 92, 78, 64, 68, 87, 69, 55, 56, 80, 109, 81, 87,
        95, 98, 103, 104, 103, 62, 77, 113, 121, 112, 100, 120, 92, 101,
        103, 99,
    ],
    dtype=np.int64,
)

#: Annex K.3.1: typical luminance DC table — BITS (codes per length 1..16)
#: and HUFFVAL (symbols in code order)
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
#: Annex K.3.2: typical luminance AC table
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
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
]


#: Annex K.2 chrominance quantization table, NATURAL (raster) order
_QTABLE_CHROMA_NAT = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)
#: same table in zigzag order (the storage convention of QTABLE_LUMA)
QTABLE_CHROMA = _QTABLE_CHROMA_NAT[ZIGZAG]

#: Annex K.3.3: typical chrominance DC table
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
#: Annex K.3.4: typical chrominance AC table
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
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
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix C: dct2(B) = C @ B @ C.T."""
    k = np.arange(8).reshape(-1, 1)
    n = np.arange(8).reshape(1, -1)
    c = np.cos((2 * n + 1) * k * np.pi / 16.0) * 0.5
    c[0, :] *= 1.0 / np.sqrt(2.0)
    return c


_C = _dct_matrix()


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: symbol -> (code, length), per spec Annex C."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_CODES = _build_codes(DC_BITS, DC_VALS)
_AC_CODES = _build_codes(AC_BITS, AC_VALS)
_DC_CHROMA_CODES = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
_AC_CHROMA_CODES = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol lookup for the decoder."""
    return {(ln, code): sym for sym, (code, ln) in _build_codes(bits, vals).items()}


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (size, size-bit code)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    code = v if v > 0 else v + (1 << size) - 1
    return size, code


def _extend(code: int, size: int) -> int:
    """Inverse of _magnitude."""
    if size == 0:
        return 0
    if code < (1 << (size - 1)):
        return code - (1 << size) + 1
    return code


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-pad per spec
        return bytes(self.out)


def _scale_qtable(table_zz: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of an Annex K table (zigzag order)."""
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table_zz * s + 50) // 100
    return np.clip(q, 1, 255)


def _scaled_qtable(quality: int) -> np.ndarray:
    return _scale_qtable(QTABLE_LUMA, quality)


def _natural(q_zz: np.ndarray) -> np.ndarray:
    """Zigzag-order table -> natural-order 8x8 matrix for the DCT divide."""
    q_raster = np.empty(64, dtype=np.int64)
    q_raster[ZIGZAG] = q_zz
    return q_raster.reshape(8, 8)


def _encode_block(
    writer: "_BitWriter",
    block: np.ndarray,
    qmat: np.ndarray,
    dc_codes: dict,
    ac_codes: dict,
    prev_dc: int,
) -> int:
    """DCT + quantize + huffman one level-shifted 8x8 block; returns the
    new DC predictor."""
    coef = _C @ block @ _C.T
    quant = np.round(coef / qmat).astype(np.int64)
    zz = quant.flatten()[ZIGZAG]
    dc = int(zz[0])
    size, code = _magnitude(dc - prev_dc)
    hc, hl = dc_codes[size]
    writer.write(hc, hl)
    if size:
        writer.write(code, size)
    run = 0
    for i in range(1, 64):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            hc, hl = ac_codes[0xF0]  # ZRL
            writer.write(hc, hl)
            run -= 16
        size, code = _magnitude(v)
        hc, hl = ac_codes[(run << 4) | size]
        writer.write(hc, hl)
        writer.write(code, size)
        run = 0
    if run:
        hc, hl = ac_codes[0x00]  # EOB
        writer.write(hc, hl)
    return dc


def _edge_pad(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Edge-replicate pad a 2-D float plane to (ph, pw)."""
    h, w = plane.shape
    out = np.empty((ph, pw), dtype=np.float64)
    out[:h, :w] = plane
    out[h:, :w] = plane[h - 1 : h, :]
    out[:, w:] = out[:, w - 1 : w]
    return out


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


_APP0_JFIF = _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")


def encode_jpeg_gray(img: np.ndarray, quality: int = 85) -> bytes:
    """2-D uint8 array -> baseline JFIF bytes (grayscale, SOF0)."""
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError("need a 2-D uint8 array")
    if img.shape[0] == 0 or img.shape[1] == 0:
        raise ValueError("empty image")  # SOF h=0 is invalid on the wire
    h, w = img.shape
    q = _scaled_qtable(quality)
    qmat = _natural(q)
    bh, bw = (h + 7) // 8, (w + 7) // 8
    padded = _edge_pad(img.astype(np.float64), bh * 8, bw * 8)

    writer = _BitWriter()
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            prev_dc = _encode_block(writer, block, qmat, _DC_CODES, _AC_CODES, prev_dc)
    scan = writer.flush()

    dqt = _seg(0xFFDB, b"\x00" + bytes(int(x) for x in q))
    sof = _seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    dht = _seg(
        0xFFC4,
        b"\x00" + bytes(DC_BITS) + bytes(DC_VALS)
        + b"\x10" + bytes(AC_BITS) + bytes(AC_VALS),
    )
    sos = _seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
    return b"\xff\xd8" + _APP0_JFIF + dqt + sof + dht + sos + scan + b"\xff\xd9"


def _rgb_to_ycbcr(img: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """JFIF (ITU-R BT.601 full-range) RGB -> Y/Cb/Cr float64 planes."""
    r = img[..., 0].astype(np.float64)
    g = img[..., 1].astype(np.float64)
    b = img[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def rgb_luma(img: np.ndarray) -> np.ndarray:
    """HxWx3 uint8 -> BT.601 luma as uint8 — the codec's own Y plane
    (single source of the 0.299/0.587/0.114 coefficients for consumers
    like pHash)."""
    return np.clip(np.round(_rgb_to_ycbcr(img)[0]), 0, 255).astype(np.uint8)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    """JFIF Y/Cb/Cr planes -> HxWx3 uint8 RGB (clipped + rounded)."""
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _color_setup(img: np.ndarray, quality: int, subsample: str):
    """Shared front half of BOTH color encoders (baseline + progressive):
    validation, quality-scaled tables, YCbCr planes padded to the MCU
    grid, chroma box-subsample. Returns
    (yp, cbp, crp, qy, qc, hs, vs, mcuy, mcux)."""
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("need an HxWx3 uint8 array")
    if img.shape[0] == 0 or img.shape[1] == 0:
        raise ValueError("empty image")  # SOF h=0 is invalid on the wire
    if subsample not in ("420", "444"):
        raise ValueError("subsample must be '420' or '444'")
    hs = vs = 2 if subsample == "420" else 1
    h, w = img.shape[:2]
    qy = _scaled_qtable(quality)
    qc = _scale_qtable(QTABLE_CHROMA, quality)
    y, cb, cr = _rgb_to_ycbcr(img)
    mh, mw = 8 * vs, 8 * hs  # MCU pixel dims
    mcuy, mcux = (h + mh - 1) // mh, (w + mw - 1) // mw
    yp = _edge_pad(y, mcuy * mh, mcux * mw)
    cbp = _edge_pad(cb, mcuy * mh, mcux * mw)
    crp = _edge_pad(cr, mcuy * mh, mcux * mw)
    if hs == 2:  # 2x2 box mean at full-pad resolution -> one 8x8 block/MCU
        cbp = (cbp[0::2, 0::2] + cbp[0::2, 1::2] + cbp[1::2, 0::2] + cbp[1::2, 1::2]) / 4.0
        crp = (crp[0::2, 0::2] + crp[0::2, 1::2] + crp[1::2, 0::2] + crp[1::2, 1::2]) / 4.0
    return yp, cbp, crp, qy, qc, hs, vs, mcuy, mcux


def _color_table_segs(qy: np.ndarray, qc: np.ndarray) -> tuple[bytes, bytes]:
    """(DQT segments, DHT payload) shared by both color encoders."""
    dqt = _seg(0xFFDB, b"\x00" + bytes(int(x) for x in qy)) + _seg(
        0xFFDB, b"\x01" + bytes(int(x) for x in qc)
    )
    dht = (
        b"\x00" + bytes(DC_BITS) + bytes(DC_VALS)
        + b"\x10" + bytes(AC_BITS) + bytes(AC_VALS)
        + b"\x01" + bytes(DC_CHROMA_BITS) + bytes(DC_CHROMA_VALS)
        + b"\x11" + bytes(AC_CHROMA_BITS) + bytes(AC_CHROMA_VALS)
    )
    return dqt, dht


def encode_jpeg_color(
    img: np.ndarray, quality: int = 85, subsample: str = "420"
) -> bytes:
    """HxWx3 uint8 RGB -> baseline JFIF bytes (SOF0, YCbCr, interleaved).

    ``subsample``: '420' (2x2 box-averaged chroma, the web default) or
    '444' (full-resolution chroma). Luma uses the Annex K.1 table +
    K.3.1/K.3.2 Huffman tables; chroma K.2 + K.3.3/K.3.4, both scaled by
    ``quality`` libjpeg-style.
    """
    h, w = img.shape[:2]
    yp, cbp, crp, qy, qc, hs, vs, mcuy, mcux = _color_setup(img, quality, subsample)
    qy_mat, qc_mat = _natural(qy), _natural(qc)

    writer = _BitWriter()
    prev = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for v in range(vs):  # Y blocks of the MCU in raster order
                for hh in range(hs):
                    by, bx = my * vs + v, mx * hs + hh
                    block = yp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                    prev[0] = _encode_block(
                        writer, block, qy_mat, _DC_CODES, _AC_CODES, prev[0]
                    )
            for ci, plane in ((1, cbp), (2, crp)):
                block = plane[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] - 128.0
                prev[ci] = _encode_block(
                    writer, block, qc_mat, _DC_CHROMA_CODES, _AC_CHROMA_CODES, prev[ci]
                )
    scan = writer.flush()

    samp = (hs << 4) | vs
    dqt, dht = _color_table_segs(qy, qc)
    sof = _seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, samp, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    sos = _seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 0x3F, 0]))
    return (
        b"\xff\xd8" + _APP0_JFIF + dqt + sof + _seg(0xFFC4, dht) + sos
        + scan + b"\xff\xd9"
    )


# ---------------------------------------------------------------------------
# Progressive encoder (SOF2) — the decoder's round-trip twin. Scan script:
# DC first (Al=1, interleaved) -> per-component AC first (1..63, Al=1) ->
# DC refine (Ah=1, raw bits) -> per-component AC refine (Ah=1, Al=0), so
# every progressive scan type the decoder implements is exercised. EOB
# runs are never batched across blocks (EOB0 only): the Annex K tables
# carry no EOBn symbols, and per-block EOB is fully conformant.
# ---------------------------------------------------------------------------


def _plane_zz(padded: np.ndarray, qmat: np.ndarray) -> np.ndarray:
    """Quantized zigzag coefficients [bh, bw, 64] of a padded plane."""
    bh, bw = padded.shape[0] // 8, padded.shape[1] // 8
    out = np.empty((bh, bw, 64), dtype=np.int64)
    for by in range(bh):
        for bx in range(bw):
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            q = np.round((_C @ block @ _C.T) / qmat).astype(np.int64)
            out[by, bx] = q.flatten()[ZIGZAG]
    return out


def _emit_dc_first(writer: "_BitWriter", dc: int, pred: int, dc_codes: dict, al: int) -> int:
    v = int(dc) >> al  # arithmetic shift per T.81 G.1.2.1
    size, code = _magnitude(v - pred)
    hc, hl = dc_codes[size]
    writer.write(hc, hl)
    if size:
        writer.write(code, size)
    return v


def _emit_ac_first(writer: "_BitWriter", band: np.ndarray, ac_codes: dict, al: int) -> None:
    """AC first scan for one block's band (T.81 G.1.2.2: magnitudes are
    divided by 2^Al with truncation toward zero)."""
    run = 0
    for v in band:
        v = int(v)
        t = abs(v) >> al
        v2 = t if v >= 0 else -t
        if v2 == 0:
            run += 1
            continue
        while run > 15:
            hc, hl = ac_codes[0xF0]
            writer.write(hc, hl)
            run -= 16
        size, code = _magnitude(v2)
        hc, hl = ac_codes[(run << 4) | size]
        writer.write(hc, hl)
        writer.write(code, size)
        run = 0
    if run:
        hc, hl = ac_codes[0x00]  # EOB0
        writer.write(hc, hl)


def _emit_ac_refine(writer: "_BitWriter", band: np.ndarray, ac_codes: dict, al: int) -> None:
    """AC refinement scan for one block's band (Ah = Al+1): newly-nonzero
    coefficients code as (run<<4)|1 + sign; already-nonzero ones append
    their correction bit after the next emitted symbol (G.1.2.3)."""
    r = 0
    pending: list[int] = []

    def flush() -> None:
        for b in pending:
            writer.write(b, 1)
        pending.clear()

    for v in band:
        v = int(v)
        cur = abs(v) >> al
        if cur > 1:  # nonzero before this scan: correction bit
            pending.append(cur & 1)
        elif cur == 0:
            r += 1
        else:  # cur == 1: newly nonzero in this scan
            while r > 15:
                hc, hl = ac_codes[0xF0]
                writer.write(hc, hl)
                r -= 16
                flush()
            hc, hl = ac_codes[(r << 4) | 1]
            writer.write(hc, hl)
            writer.write(1 if v > 0 else 0, 1)
            flush()
            r = 0
    if r or pending:
        hc, hl = ac_codes[0x00]  # EOB0
        writer.write(hc, hl)
        flush()


def encode_jpeg_progressive(
    img: np.ndarray, quality: int = 85, subsample: str = "420"
) -> bytes:
    """uint8 image (2-D grayscale or HxWx3 RGB) -> PROGRESSIVE JFIF bytes
    (SOF2). Transmits exactly the same quantized coefficients as the
    baseline encoders, staged over spectral-selection + one level of
    successive approximation — so decode(progressive(img)) is bit-equal
    to decode(baseline(img)) at the same quality/subsample."""
    gray = img.ndim == 2
    if img.dtype != np.uint8 or (not gray and (img.ndim != 3 or img.shape[2] != 3)):
        raise ValueError("need a 2-D or HxWx3 uint8 array")
    if img.shape[0] == 0 or img.shape[1] == 0:
        raise ValueError("empty image")
    h, w = img.shape[:2]
    qy = _scaled_qtable(quality)
    qy_mat = _natural(qy)

    if gray:
        padded = _edge_pad(img.astype(np.float64), ((h + 7) // 8) * 8, ((w + 7) // 8) * 8)
        comps = [
            {"id": 1, "h": 1, "v": 1, "tq": 0,
             "dc": _DC_CODES, "ac": _AC_CODES,
             "zz": _plane_zz(padded, qy_mat)}
        ]
        qc = None
    else:
        yp, cbp, crp, qy, qc, hs, vs, _, _ = _color_setup(img, quality, subsample)
        qc_mat = _natural(qc)
        comps = [
            {"id": 1, "h": hs, "v": vs, "tq": 0,
             "dc": _DC_CODES, "ac": _AC_CODES, "zz": _plane_zz(yp, qy_mat)},
            {"id": 2, "h": 1, "v": 1, "tq": 1,
             "dc": _DC_CHROMA_CODES, "ac": _AC_CHROMA_CODES,
             "zz": _plane_zz(cbp, qc_mat)},
            {"id": 3, "h": 1, "v": 1, "tq": 1,
             "dc": _DC_CHROMA_CODES, "ac": _AC_CHROMA_CODES,
             "zz": _plane_zz(crp, qc_mat)},
        ]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    def comp_grid(c: dict) -> tuple[int, int]:
        ch = (h * c["v"] + vmax - 1) // vmax
        cw = (w * c["h"] + hmax - 1) // hmax
        return (ch + 7) // 8, (cw + 7) // 8

    def sos(scan_comps: list[dict], ss: int, se: int, ah: int, al: int,
            body: bytes) -> bytes:
        hdr = bytes([len(scan_comps)])
        for c in scan_comps:
            # Td/Ta = component index's own table pair (0 luma, 1 chroma)
            t = 0 if c["id"] == 1 else 1
            hdr += bytes([c["id"], (t << 4) | t])
        hdr += bytes([ss, se, (ah << 4) | al])
        return _seg(0xFFDA, hdr) + body

    scans: list[bytes] = []

    # -- scan 1: DC first, Al=1, all components -----------------------------
    writer = _BitWriter()
    preds = {c["id"]: 0 for c in comps}
    if len(comps) == 1:
        c = comps[0]
        bh, bw = comp_grid(c)
        for by in range(bh):
            for bx in range(bw):
                preds[c["id"]] = _emit_dc_first(
                    writer, c["zz"][by, bx, 0], preds[c["id"]], c["dc"], 1
                )
    else:
        for my in range(mcuy):
            for mx in range(mcux):
                for c in comps:
                    for v in range(c["v"]):
                        for hh in range(c["h"]):
                            preds[c["id"]] = _emit_dc_first(
                                writer,
                                c["zz"][my * c["v"] + v, mx * c["h"] + hh, 0],
                                preds[c["id"]],
                                c["dc"],
                                1,
                            )
    scans.append(sos(comps, 0, 0, 0, 1, writer.flush()))

    # -- per component: AC first 1..63, Al=1 --------------------------------
    for c in comps:
        writer = _BitWriter()
        bh, bw = comp_grid(c)
        for by in range(bh):
            for bx in range(bw):
                _emit_ac_first(writer, c["zz"][by, bx, 1:], c["ac"], 1)
        scans.append(sos([c], 1, 63, 0, 1, writer.flush()))

    # -- DC refine, Ah=1 Al=0 (raw bits, no huffman) ------------------------
    writer = _BitWriter()
    if len(comps) == 1:
        c = comps[0]
        bh, bw = comp_grid(c)
        for by in range(bh):
            for bx in range(bw):
                writer.write(int(c["zz"][by, bx, 0]) & 1, 1)
    else:
        for my in range(mcuy):
            for mx in range(mcux):
                for c in comps:
                    for v in range(c["v"]):
                        for hh in range(c["h"]):
                            writer.write(
                                int(c["zz"][my * c["v"] + v, mx * c["h"] + hh, 0]) & 1,
                                1,
                            )
    scans.append(sos(comps, 0, 0, 1, 0, writer.flush()))

    # -- per component: AC refine 1..63, Ah=1 Al=0 --------------------------
    for c in comps:
        writer = _BitWriter()
        bh, bw = comp_grid(c)
        for by in range(bh):
            for bx in range(bw):
                _emit_ac_refine(writer, c["zz"][by, bx, 1:], c["ac"], 0)
        scans.append(sos([c], 1, 63, 1, 0, writer.flush()))

    # -- headers ------------------------------------------------------------
    if gray:
        dqt = _seg(0xFFDB, b"\x00" + bytes(int(x) for x in qy))
        dht = (
            b"\x00" + bytes(DC_BITS) + bytes(DC_VALS)
            + b"\x10" + bytes(AC_BITS) + bytes(AC_VALS)
        )
    else:
        dqt, dht = _color_table_segs(qy, qc)
    sof_payload = struct.pack(">BHHB", 8, h, w, len(comps))
    for c in comps:
        sof_payload += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    sof = _seg(0xFFC2, sof_payload)
    return (
        b"\xff\xd8" + _APP0_JFIF + dqt + sof + _seg(0xFFC4, dht)
        + b"".join(scans) + b"\xff\xd9"
    )


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24 and self.pos < len(self.data):
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1  # un-stuff
                else:
                    self.pos -= 1  # marker: stop feeding
                    break
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read(self, n: int) -> int:
        self._fill()
        if n > self.nbits:
            # trailing pad bits: treat missing bits as 1s (spec pad)
            self.acc = (self.acc << (n - self.nbits)) | ((1 << (n - self.nbits)) - 1)
            self.nbits = n
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_code(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")


def _coef_block_baseline(
    reader: "_BitReader", dc_tbl: dict, ac_tbl: dict, coef: np.ndarray, prev_dc: int
) -> int:
    """Baseline full-band huffman decode into a natural-order coefficient
    vector; returns the new DC predictor."""
    size = reader.read_code(dc_tbl)
    dc = prev_dc + _extend(reader.read(size), size)
    coef[0] = dc
    k = 1
    while k < 64:
        sym = reader.read_code(ac_tbl)
        if sym == 0x00:  # EOB
            break
        run, size = sym >> 4, sym & 0x0F
        if size == 0:
            if run != 15:
                raise ValueError("invalid AC symbol")
            k += 16  # ZRL
            continue
        k += run
        if k > 63:
            raise ValueError("AC coefficient overrun")
        coef[ZIGZAG[k]] = _extend(reader.read(size), size)
        k += 1
    return dc


def _coef_block_ac_first(
    reader: "_BitReader",
    ac_tbl: dict,
    coef: np.ndarray,
    ss: int,
    se: int,
    al: int,
    eobrun: int,
) -> int:
    """Progressive AC first scan (Ah=0) for one block (T.81 G.2.2);
    returns the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = reader.read_code(ac_tbl)
        r, s = sym >> 4, sym & 0x0F
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.read(r)
            break
        k += r
        if k > se:
            raise ValueError("AC coefficient overrun")
        coef[ZIGZAG[k]] = _extend(reader.read(s), s) << al
        k += 1
    return eobrun


def _coef_block_ac_refine(
    reader: "_BitReader",
    ac_tbl: dict,
    coef: np.ndarray,
    ss: int,
    se: int,
    al: int,
    eobrun: int,
) -> int:
    """Progressive AC refinement scan (Ah>0) for one block — the
    correction-bit algorithm of T.81 G.2.3 (the jdphuff shape); returns
    the remaining EOB run."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = reader.read_code(ac_tbl)
            r, s = sym >> 4, sym & 0x0F
            if s == 0:
                if r != 15:
                    # EOB run INCLUDING the current block: its remaining
                    # nonzero-history positions still carry correction
                    # bits, consumed by the tail loop below (jdphuff's
                    # EOBRUN = 1<<r convention)
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read(r)
                    break
                val = 0  # ZRL: 16 zero-history positions, no new coef
            elif s == 1:
                val = p1 if reader.read(1) else m1
            else:
                raise ValueError("invalid AC refinement symbol")
            # advance past r zero-HISTORY coefficients, applying correction
            # bits to nonzero-history ones encountered on the way
            while k <= se:
                z = int(ZIGZAG[k])
                if coef[z] != 0:
                    if reader.read(1) and (coef[z] & p1) == 0:
                        coef[z] += p1 if coef[z] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                coef[int(ZIGZAG[k])] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            z = int(ZIGZAG[k])
            if coef[z] != 0:
                if reader.read(1) and (coef[z] & p1) == 0:
                    coef[z] += p1 if coef[z] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _scan_end(blob: bytes, start: int) -> int:
    """Offset of the marker terminating the entropy-coded segment."""
    i = start
    n = len(blob)
    while i < n - 1:
        if blob[i] == 0xFF and blob[i + 1] != 0x00:
            if 0xD0 <= blob[i + 1] <= 0xD7:
                raise ValueError("restart markers unsupported")
            return i
        i += 1
    return n


def decode_jpeg(blob: bytes) -> np.ndarray:
    """JFIF bytes -> pixels: 2-D uint8 (grayscale file) or HxWx3 uint8
    RGB (3-component YCbCr, sampling factors 1-2 — 4:4:4 / 4:2:2 / 4:2:0,
    chroma upsampled by replication). Handles BASELINE (SOF0, interleaved
    or per-component scans) and PROGRESSIVE (SOF2, spectral selection +
    successive approximation: DC first/refine, AC first/refine with EOB
    runs — T.81 Annex G).

    Raises ValueError for anything outside the documented scope (>3 or 2
    components, sampling factors > 2, restart intervals, hierarchical /
    lossless / arithmetic frames, 12-bit precision) — loud, never garbage
    pixels."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    i = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    h = w = None
    progressive = False
    comps: list[tuple[int, int, int, int]] = []  # (cid, hi, vi, tq)
    coefs: dict[int, np.ndarray] = {}
    preds: dict[int, int] = {}
    hmax = vmax = mcux = mcuy = 0
    n_scans = 0
    seen_dc: set[int] = set()  # components whose DC has been scanned

    def _comp_grid(hi: int, vi: int) -> tuple[int, int]:
        """(block rows, block cols) of a component's OWN sample grid (the
        non-interleaved scan extent, T.81 A.2.2)."""
        ch = (h * vi + vmax - 1) // vmax
        cw = (w * hi + hmax - 1) // hmax
        return (ch + 7) // 8, (cw + 7) // 8

    def _run_scan(scan_comps: list[tuple[int, tuple[int, int]]],
                  ss: int, se: int, ah: int, al: int,
                  reader: "_BitReader") -> None:
        by_id = {cid: (cid, hi, vi, tq) for cid, hi, vi, tq in comps}
        for cid, _ in scan_comps:
            preds[cid] = 0  # DC predictor resets per scan
        eobrun = 0

        def one_block(cid: int, td: int, ta: int, by: int, bx: int) -> None:
            nonlocal eobrun
            coef = coefs[cid][by, bx]
            if not progressive:
                preds[cid] = _coef_block_baseline(
                    reader, dc_tables[td], ac_tables[ta], coef, preds[cid]
                )
            elif ss == 0 and ah == 0:  # DC first
                size = reader.read_code(dc_tables[td])
                preds[cid] += _extend(reader.read(size), size)
                coef[0] = preds[cid] << al
            elif ss == 0:  # DC refine: one raw bit per block
                if reader.read(1):
                    coef[0] |= 1 << al
            elif ah == 0:
                eobrun = _coef_block_ac_first(
                    reader, ac_tables[ta], coef, ss, se, al, eobrun
                )
            else:
                eobrun = _coef_block_ac_refine(
                    reader, ac_tables[ta], coef, ss, se, al, eobrun
                )

        if len(scan_comps) == 1:  # non-interleaved: component's own raster
            cid, (td, ta) = scan_comps[0]
            _, hi, vi, _ = by_id[cid]
            bh, bw = _comp_grid(hi, vi)
            for by in range(bh):
                for bx in range(bw):
                    one_block(cid, td, ta, by, bx)
        else:  # interleaved MCU order
            for my in range(mcuy):
                for mx in range(mcux):
                    for cid, (td, ta) in scan_comps:
                        _, hi, vi, _ = by_id[cid]
                        for v in range(vi):
                            for hh in range(hi):
                                one_block(cid, td, ta, my * vi + v, mx * hi + hh)

    while i < len(blob) - 1:
        if blob[i] != 0xFF:
            raise ValueError("marker desync")
        marker = blob[i + 1]
        if marker == 0xD9:  # EOI
            break
        (ln,) = struct.unpack_from(">H", blob, i + 2)
        payload = blob[i + 4 : i + 2 + ln]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qtables[tq] = np.frombuffer(
                    payload[p + 1 : p + 65], dtype=np.uint8
                ).astype(np.int64)
                p += 65
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(
                f"unsupported SOF marker 0xFF{marker:02X} (baseline/progressive only)"
            )
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            if comps:
                raise ValueError("multiple SOF segments")
            progressive = marker == 0xC2
            if len(payload) < 6:
                raise ValueError("truncated SOF segment")
            precision, h, w, ncomp = struct.unpack_from(">BHHB", payload, 0)
            if precision != 8:
                raise ValueError("8-bit only")
            if ncomp not in (1, 3):
                raise ValueError(f"{ncomp}-component frames unsupported")
            if h * w > MAX_PIXELS or h == 0 or w == 0:
                # a forged SOF claiming 65535x65535 would otherwise drive a
                # multi-GB allocation before any scan-data validation
                raise ValueError(f"image dimensions {w}x{h} outside sane bounds")
            if len(payload) < 6 + 3 * ncomp:
                raise ValueError("truncated SOF component list")
            for c in range(ncomp):
                cid = payload[6 + 3 * c]
                hv = payload[6 + 3 * c + 1]
                hi, vi = hv >> 4, hv & 0x0F
                if hi not in (1, 2) or vi not in (1, 2):
                    raise ValueError(f"sampling factors {hi}x{vi} unsupported")
                if ncomp == 1 and hv != 0x11:
                    raise ValueError("subsampling on a single component unsupported")
                comps.append((cid, hi, vi, payload[6 + 3 * c + 2]))
            if len({cid for cid, _, _, _ in comps}) != len(comps):
                # a forged SOF with duplicate ids would dict-dedup and
                # decode garbage; the contract is loud failure
                raise ValueError("duplicate component ids in SOF")
            hmax = max(hi for _, hi, _, _ in comps)
            vmax = max(vi for _, _, vi, _ in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            for cid, hi, vi, _ in comps:
                coefs[cid] = np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int32)
                preds[cid] = 0
        elif marker == 0xC4:  # DHT (possibly several tables, keyed by
            # destination id Th — the SOS Td/Ta selectors pick the right
            # ones even when a file carries extra unused tables)
            p = 0
            while p < len(payload):
                if p + 17 > len(payload):
                    raise ValueError("truncated DHT segment")
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(payload[p + 17 : p + 17 + nv])
                if tc == 0:
                    dc_tables[th] = _decode_table(bits, vals)
                else:
                    ac_tables[th] = _decode_table(bits, vals)
                p += 17 + nv
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS header then entropy-coded data
            if not comps:
                raise ValueError("SOS before SOF")
            ns = payload[0]
            if len(payload) < 1 + 2 * ns + 3:
                raise ValueError("truncated SOS segment")
            by_id = {cid for cid, _, _, _ in comps}
            scan_comps: list[tuple[int, tuple[int, int]]] = []
            for c in range(ns):
                cid = payload[1 + 2 * c]
                if cid not in by_id:
                    raise ValueError("SOS component ids do not match SOF")
                scan_comps.append(
                    (cid, (payload[2 + 2 * c] >> 4, payload[2 + 2 * c] & 0x0F))
                )
            ss, se = payload[1 + 2 * ns], payload[2 + 2 * ns]
            ahl = payload[3 + 2 * ns]
            ah, al = ahl >> 4, ahl & 0x0F
            if not progressive and (ss, se, ah, al) != (0, 63, 0, 0):
                raise ValueError("spectral selection in a baseline frame")
            if progressive:
                if ss == 0 and se != 0:
                    raise ValueError("progressive DC scan must have Se=0")
                if ss > 0 and ns != 1:
                    raise ValueError("progressive AC scans must be single-component")
                if ss > 63 or se > 63 or ss > se:
                    raise ValueError("bad spectral selection range")
            # validate table selectors for the bands this scan needs
            for cid, (td, ta) in scan_comps:
                needs_dc = ss == 0 and not (progressive and ah > 0)
                needs_ac = se > 0 or not progressive
                if needs_dc and td not in dc_tables:
                    raise ValueError("SOS selects an undefined Huffman table")
                if needs_ac and ta not in ac_tables:
                    raise ValueError("SOS selects an undefined Huffman table")
            if progressive and ss > 0:
                # T.81 G.1.1.1.1: a component's DC scan precedes its AC scans
                if scan_comps[0][0] not in seen_dc:
                    raise ValueError("AC scan before the component's DC scan")
            if ss == 0:
                seen_dc.update(cid for cid, _ in scan_comps)
            data_start = i + 2 + ln
            data_end = _scan_end(blob, data_start)
            _run_scan(scan_comps, ss, se, ah, al, _BitReader(blob[data_start:data_end]))
            n_scans += 1
            i = data_end
            continue
        i += 2 + ln
    if h is None or n_scans == 0:
        raise ValueError("missing SOF/DHT/SOS")
    if seen_dc != {cid for cid, _, _, _ in comps}:
        # a partial-coverage file would otherwise synthesize pixels from
        # all-zero coefficients — the loud-never-garbage contract
        raise ValueError("scans do not cover every SOF component")

    # ---- shared finish: dequantize + IDCT + crop + upsample ---------------
    planes = {}
    for cid, hi, vi, tq in comps:
        if tq not in qtables:
            raise ValueError("missing quantization table")
        qmat = _natural(qtables[tq])
        arr = coefs[cid]
        bh, bw = arr.shape[:2]
        plane = np.empty((bh * 8, bw * 8), dtype=np.float64)
        for by in range(bh):
            for bx in range(bw):
                coef = arr[by, bx].astype(np.int64).reshape(8, 8) * qmat
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _C.T @ coef @ _C + 128.0
                )
        planes[cid] = plane

    if len(comps) == 1:
        out = planes[comps[0][0]]
        return np.clip(np.round(out[:h, :w]), 0, 255).astype(np.uint8)

    full = []
    for cid, hi, vi, _ in comps:
        # crop to the component's own sample grid, then replicate up
        ch = (h * vi + vmax - 1) // vmax
        cw = (w * hi + hmax - 1) // hmax
        p = planes[cid][:ch, :cw]
        p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        full.append(p[:h, :w])
    return _ycbcr_to_rgb(full[0], full[1], full[2])


def decode_jpeg_gray(blob: bytes) -> np.ndarray:
    """Baseline grayscale JFIF bytes -> 2-D uint8 array; raises ValueError
    for color files (use :func:`decode_jpeg` for those) and anything
    outside baseline scope."""
    out = decode_jpeg(blob)
    if out.ndim != 2:
        raise ValueError("grayscale 8-bit baseline only (color file)")
    return out


def jpeg_dims(blob: bytes) -> tuple[int, int] | None:
    """(width, height) from any JPEG's SOFn marker, or None if not a JPEG
    — real metadata extraction without a full decode (works for color and
    progressive files too)."""
    if blob is None or len(blob) < 4 or blob[:2] != b"\xff\xd8":
        return None
    i = 2
    while i < len(blob) - 9:
        if blob[i] != 0xFF:
            return None
        marker = blob[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            _, h, w = struct.unpack_from(">BHH", blob, i + 4)
            return (w, h)
        (ln,) = struct.unpack_from(">H", blob, i + 2)
        i += 2 + ln
    return None
