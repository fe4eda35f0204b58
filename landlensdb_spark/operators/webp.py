"""From-scratch WebP-lossless (VP8L) codec — numpy only, no libwebp/PIL.

Extends the F25 media family (PNG/JPEG/GIF/TIFF/MJPEG, all in-repo) with
the WebP lossless format, the slice of the round-6 "remaining codecs" gap
that is implementable and testable in this environment. The reference
thumbnails anything PIL decodes (/root/reference/landlensdb/handlers/
image.py:95-138), and PIL reads WebP; this module gives the engine native
VP8L metadata, decode and encode so WebP payloads flow through the same
multimodal operators as the other codecs.

Implemented from the PUBLIC "WebP Lossless Bitstream Specification"
(Google, also shipped as libwebp's docs) and the RIFF container spec:

- RIFF/WEBP container with a VP8L chunk (decode also accepts the
  extended VP8X layout far enough to find the VP8L chunk);
- LSB-first bitstream, canonical prefix (huffman) codes, including the
  "simple" 1/2-symbol form and the code-length code with repeats
  (16/17/18), in the spec's code-length-code order;
- LZ77 backward references with the prefix-coded length/distance scheme
  (24 length / 40 distance codes, extra bits), the 120-entry 2-D
  short-distance neighborhood map, and the color cache (multiplicative
  hash 0x1e35a7bd, 1..11 bits);
- the meta-prefix (entropy) image: per-block prefix-code groups;
- all four transforms, applied in reverse read order on decode:
  predictor (all 14 modes, block-based, including Select and
  ClampAddSubtract), color (signed 3.5 fixed-point cross-channel
  deltas), subtract-green, and color-indexing (palette) including the
  sub-byte pixel bundling for palettes of <= 16 colors.

The encoder twin emits spec-shaped streams — optional subtract-green,
optional palette (with bundling), one prefix-code group, literal or
greedy-LZ77 + color-cache entropy coding — so every decoder path above
except meta-prefix groups and the predictor/color transforms is exercised
by exact encode -> decode roundtrips; those remaining paths are covered
by hand-assembled streams built with the same low-level bit writer in the
tests. HONESTY NOTE: byte-level interop with libwebp cannot be verified
in this sandbox (no libwebp/PIL/network); correctness is established by
roundtrips, spec-derived hand-built streams and property tests, and the
interop claim is exactly that — spec-faithful, not libwebp-diffed.

Like the sibling codecs, everything raises ValueError on corrupt framing
(never crashing an Arrow stage — multimodal turns raises into ok=false).
Pixels are (h, w, 4) uint8 RGBA on decode (alpha 255 unless the stream
says otherwise) and accepted as (h, w[, 3|4]) uint8 on encode.
"""

from __future__ import annotations

import struct

import numpy as np

#: spec: VP8L streams start with this signature byte after the chunk header
_VP8L_MAGIC = 0x2F
#: spec: code-length codes are stored in this fixed order
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
#: number of length prefix symbols appended to the green alphabet
_NUM_LENGTH_CODES = 24
_NUM_DIST_CODES = 40
#: green alphabet = 256 literals + 24 length codes + color-cache slots
_GREEN_BASE = 256 + _NUM_LENGTH_CODES
#: spec: the 120 short distance codes map to this (dx, dy) neighborhood
#: (dy rows up, dx in [-8, 7]), ordered by increasing dy then |dx|
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)


# ---------------------------------------------------------------------------
# bit I/O (LSB-first, like DEFLATE)
# ---------------------------------------------------------------------------
class _BitReader:
    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("vp8l: bitstream exhausted")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.nbits -= n
        return v


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


# ---------------------------------------------------------------------------
# canonical prefix codes
# ---------------------------------------------------------------------------
def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length); canonical assignment (shorter first, then
    symbol order), code bits emitted/walked most-significant-first."""
    max_len = max(lengths, default=0)
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 1)
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out: dict[int, tuple[int, int]] = {}
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = (next_code[ln], ln)
            next_code[ln] += 1
            if next_code[ln] > (1 << ln):
                raise ValueError("vp8l: over-subscribed prefix code")
    return out


class _PrefixDecoder:
    """Walks canonical codes bit-by-bit (MSB of the code first). Small
    alphabets + short codes, so a dict keyed by (length, code) is fast
    enough and simple to reason about."""

    __slots__ = ("table", "max_len", "single")

    def __init__(self, lengths: list[int]):
        used = [(s, l) for s, l in enumerate(lengths) if l]
        if not used:
            raise ValueError("vp8l: empty prefix code")
        if len(used) == 1:
            # degenerate: one symbol, zero bits read
            self.single = used[0][0]
            self.table = None
            self.max_len = 0
            return
        self.single = None
        codes = _canonical_codes(lengths)
        self.table = {(ln, code): sym for sym, (code, ln) in codes.items()}
        self.max_len = max(ln for _, (c, ln) in codes.items())
        # completeness check: a prefix code must fill its tree exactly
        total = sum(1 << (self.max_len - ln) for _, (c, ln) in codes.items())
        if total != (1 << self.max_len):
            raise ValueError("vp8l: incomplete prefix code")

    def next(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        ln = 0
        while True:
            code = (code << 1) | br.read(1)
            ln += 1
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
            if ln > self.max_len:
                raise ValueError("vp8l: invalid prefix code in stream")


def _write_code_lengths(bw: _BitWriter, lengths: list[int]) -> None:
    """Emit a 'normal' (code-length-coded) prefix code description.

    Run-length symbols 16/17/18 are NOT used — every length is written
    literally through the code-length code. Simple and always valid; the
    encoder's streams stay small because alphabets are small."""
    # histogram of code lengths 0..15 -> code-length-code lengths
    used = sorted({ln for ln in lengths})
    # build a canonical code over the code-length alphabet: give every
    # distinct value the same length L (power-of-two padding), L bits
    n_distinct = len(used)
    if n_distinct == 1:
        # all lengths equal (possibly all zero is invalid upstream); the
        # code-length code still needs >= 1 symbol with length 1... spec
        # allows a complete 1-symbol code via length... use 2 symbols by
        # splitting: write the value plus a dummy never-emitted 0 length.
        if used[0] == 0:
            raise ValueError("vp8l: cannot describe an all-zero code")
        clc_lengths = {used[0]: 1, 0 if used[0] != 0 else 1: 1}
    else:
        bits = max(1, (n_distinct - 1).bit_length())
        clc_lengths = {v: bits for v in used}
        # pad to a complete code: give the first value shorter codes is
        # complex; instead widen the set with unused values at max depth
        deficit = (1 << bits) - n_distinct
        filler = (v for v in range(16) if v not in clc_lengths)
        for _ in range(deficit):
            clc_lengths[next(filler)] = bits
    bw.write(0, 1)  # not simple
    # code-length-code lengths, 3 bits each, in _CLC_ORDER; trailing
    # zeros can be truncated via num_code_lengths
    clc_by_sym = [clc_lengths.get(s, 0) for s in range(19)]
    order_vals = [clc_by_sym[s] for s in _CLC_ORDER]
    n = len(order_vals)
    while n > 4 and order_vals[n - 1] == 0:
        n -= 1
    bw.write(n - 4, 4)
    for v in order_vals[:n]:
        bw.write(v, 3)
    bw.write(0, 1)  # no explicit max_symbol
    enc = _canonical_codes(
        [clc_lengths.get(s, 0) for s in range(19)]
    )
    for ln in lengths:
        code, nbits = enc[ln]
        bw.write(_reverse_bits(code, nbits), nbits)


def _reverse_bits(code: int, n: int) -> int:
    """The writer emits LSB-first; prefix codes are walked MSB-of-code
    first, so emit the reversed code through the LSB-first writer."""
    r = 0
    for _ in range(n):
        r = (r << 1) | (code & 1)
        code >>= 1
    return r


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixDecoder:
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        first_bits = 8 if br.read(1) else 1
        symbols = [br.read(first_bits)]
        if num_symbols == 2:
            symbols.append(br.read(8))
        for s in symbols:
            if s >= alphabet_size:
                raise ValueError("vp8l: simple-code symbol beyond alphabet")
        # spec: codes are assigned in LISTED order (first symbol -> 0),
        # not canonically by symbol value
        dec = _PrefixDecoder.__new__(_PrefixDecoder)
        if num_symbols == 1:
            dec.single = symbols[0]
            dec.table = None
            dec.max_len = 0
        else:
            dec.single = None
            dec.table = {(1, 0): symbols[0], (1, 1): symbols[1]}
            dec.max_len = 1
        return dec
    num_code_lengths = 4 + br.read(4)
    if num_code_lengths > len(_CLC_ORDER):
        raise ValueError("vp8l: bad code-length-code count")
    clc = [0] * 19
    for i in range(num_code_lengths):
        clc[_CLC_ORDER[i]] = br.read(3)
    clc_dec = _PrefixDecoder(clc)
    if br.read(1):  # explicit max symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    i = 0
    while i < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        sym = clc_dec.next(br)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev_len = sym
        elif sym == 16:
            rep = 3 + br.read(2)
            lengths[i : i + rep] = [prev_len] * rep
            i += rep
        elif sym == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 3 + br.read(7)
        if i > alphabet_size:
            raise ValueError("vp8l: code-length repeat overruns alphabet")
    return _PrefixDecoder(lengths)


# ---------------------------------------------------------------------------
# LZ77 prefix-coded values (lengths and distances share the scheme)
# ---------------------------------------------------------------------------
def _read_lz77_value(br: _BitReader, prefix_code: int) -> int:
    if prefix_code < 4:
        return prefix_code + 1
    extra_bits = (prefix_code - 2) >> 1
    offset = (2 + (prefix_code & 1)) << extra_bits
    return offset + br.read(extra_bits) + 1


def _lz77_prefix(value: int) -> tuple[int, int, int]:
    """value (>=1) -> (prefix_code, extra_bits, extra_value); exact inverse
    of _read_lz77_value: code c >= 4 covers v = value-1 in
    [(2 + (c&1)) << eb, ...) with eb = (c-2) >> 1."""
    v = value - 1
    if v < 4:
        return v, 0, 0
    hb = v.bit_length() - 1
    eb = hb - 1
    base = v >> eb  # 2 or 3 (top two bits)
    code = 2 * hb + (base & 1)
    offset = base << eb
    return code, eb, v - offset


def _hash_argb(r: int, g: int, b: int, a: int, cache_bits: int) -> int:
    argb = (a << 24) | (r << 16) | (g << 8) | b
    return (0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - cache_bits)


# ---------------------------------------------------------------------------
# entropy-coded image decode (used for the main image, transform images,
# the palette and the meta-prefix image)
# ---------------------------------------------------------------------------
def _read_prefix_group(br: _BitReader, cache_bits: int) -> list[_PrefixDecoder]:
    green = _read_prefix_code(
        br, _GREEN_BASE + ((1 << cache_bits) if cache_bits else 0)
    )
    red = _read_prefix_code(br, 256)
    blue = _read_prefix_code(br, 256)
    alpha = _read_prefix_code(br, 256)
    dist = _read_prefix_code(br, _NUM_DIST_CODES)
    return [green, red, blue, alpha, dist]


def _decode_image(
    br: _BitReader, w: int, h: int, allow_meta: bool
) -> np.ndarray:
    """Decode one spatially-coded ARGB image into (h, w, 4) uint8
    [r, g, b, a] — the shared core of VP8L (spec 'decoding the image
    data'). ``allow_meta`` is False for auxiliary images (transform data,
    palettes), which the spec codes without meta-prefix images."""
    meta_img = None
    meta_bits = 0
    if allow_meta and br.read(1):
        meta_bits = 2 + br.read(3)
        mw = _subsample_size(w, meta_bits)
        mh = _subsample_size(h, meta_bits)
        meta_img = _decode_image(br, mw, mh, allow_meta=False)
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not (1 <= cache_bits <= 11):
            raise ValueError("vp8l: bad color cache size")
    if meta_img is not None:
        n_groups = int(
            (meta_img[:, :, 0].astype(np.int64) << 8 | meta_img[:, :, 1]).max()
        ) + 1
    else:
        n_groups = 1
    groups = [_read_prefix_group(br, cache_bits) for _ in range(n_groups)]
    cache = (
        np.zeros((1 << cache_bits, 4), dtype=np.uint8) if cache_bits else None
    )
    out = np.zeros((h * w, 4), dtype=np.uint8)
    out[:, 3] = 0  # filled below; alpha defaults come from the stream
    pos = 0
    npix = h * w
    while pos < npix:
        x, y = pos % w, pos // w
        if meta_img is not None:
            mx, my = x >> meta_bits, y >> meta_bits
            g_idx = int(meta_img[my, mx, 0]) << 8 | int(meta_img[my, mx, 1])
            green, red, blue, alpha, dist_dec = groups[g_idx]
        else:
            green, red, blue, alpha, dist_dec = groups[0]
        sym = green.next(br)
        if sym < 256:  # literal
            g = sym
            r = red.next(br)
            b = blue.next(br)
            a = alpha.next(br)
            out[pos] = (r, g, b, a)
            if cache is not None:
                cache[_hash_argb(r, g, b, a, cache_bits)] = (r, g, b, a)
            pos += 1
        elif sym < _GREEN_BASE:  # backward reference
            length = _read_lz77_value(br, sym - 256)
            dist_code = _read_lz77_value(br, dist_dec.next(br))
            if dist_code <= 120:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            else:
                dist = dist_code - 120
            if dist > pos or pos + length > npix:
                raise ValueError("vp8l: backward reference out of range")
            for i in range(length):
                out[pos + i] = out[pos + i - dist]
            if cache is not None:
                for i in range(pos, pos + length):
                    r, g, b, a = (int(v) for v in out[i])
                    cache[_hash_argb(r, g, b, a, cache_bits)] = out[i]
            pos += length
        else:  # color cache hit
            if cache is None:
                raise ValueError("vp8l: cache symbol without a color cache")
            out[pos] = cache[sym - _GREEN_BASE]
            pos += 1
    return out.reshape(h, w, 4)


def _subsample_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


# ---------------------------------------------------------------------------
# transforms (decode direction)
# ---------------------------------------------------------------------------
def _apply_predictor_inverse(
    img: np.ndarray, pred_img: np.ndarray, bits: int
) -> np.ndarray:
    h, w, _ = img.shape
    out = img.astype(np.int32)

    def px(y, x):
        return out[y, x]

    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([0, 0, 0, 255], dtype=np.int32)
            elif y == 0:
                pred = px(0, x - 1)  # mode 1 (left) on the top row
            elif x == 0:
                pred = px(y - 1, 0)  # mode 2 (top) on the left column
            else:
                mode = int(pred_img[y >> bits, x >> bits, 1])
                L = px(y, x - 1)
                T = px(y - 1, x)
                TL = px(y - 1, x - 1)
                # spec reads pixels from the contiguous scanline buffer, so
                # the top-right of the rightmost column is the CURRENT
                # row's leftmost (already decoded) pixel
                TR = px(y - 1, x + 1) if x + 1 < w else px(y, 0)
                if mode == 0:
                    pred = np.array([0, 0, 0, 255], dtype=np.int32)
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = _avg2(_avg2(L, TR), T)
                elif mode == 6:
                    pred = _avg2(L, TL)
                elif mode == 7:
                    pred = _avg2(L, T)
                elif mode == 8:
                    pred = _avg2(TL, T)
                elif mode == 9:
                    pred = _avg2(T, TR)
                elif mode == 10:
                    pred = _avg2(_avg2(L, TL), _avg2(T, TR))
                elif mode == 11:  # Select
                    pm = T.astype(np.int64) + L.astype(np.int64) - TL.astype(np.int64)
                    p_l = int(np.abs(pm - L).sum())
                    p_t = int(np.abs(pm - T).sum())
                    pred = L if p_l < p_t else T
                elif mode == 12:  # ClampAddSubtractFull
                    pred = np.clip(L + T - TL, 0, 255)
                elif mode == 13:  # ClampAddSubtractHalf (C-truncating /2)
                    ave = _avg2(L, T)
                    diff = ave - TL
                    half = np.where(diff >= 0, diff // 2, -((-diff) // 2))
                    pred = np.clip(ave + half, 0, 255)
                else:
                    raise ValueError(f"vp8l: predictor mode {mode} out of range")
            out[y, x] = (out[y, x] + pred) & 0xFF
    return out.astype(np.uint8)


def _avg2(a, b):
    return (a.astype(np.int64) + b.astype(np.int64)) // 2


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta: signed 3.5 fixed-point multiply (spec)."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _apply_color_transform_inverse(
    img: np.ndarray, ct_img: np.ndarray, bits: int
) -> np.ndarray:
    h, w, _ = img.shape
    out = img.astype(np.int32)
    for y in range(h):
        for x in range(w):
            cx, cy = x >> bits, y >> bits
            g2r = int(ct_img[cy, cx, 2])  # blue channel holds green_to_red
            g2b = int(ct_img[cy, cx, 1])  # green channel holds green_to_blue
            r2b = int(ct_img[cy, cx, 0])  # red channel holds red_to_blue
            g = int(out[y, x, 1])
            r = (int(out[y, x, 0]) + _ct_delta(g2r, g)) & 0xFF
            b = (int(out[y, x, 2]) + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
            out[y, x, 0] = r
            out[y, x, 2] = b
    return out.astype(np.uint8)


def _apply_subtract_green_inverse(img: np.ndarray) -> np.ndarray:
    out = img.astype(np.int32)
    out[:, :, 0] = (out[:, :, 0] + out[:, :, 1]) & 0xFF
    out[:, :, 2] = (out[:, :, 2] + out[:, :, 1]) & 0xFF
    return out.astype(np.uint8)


def _apply_palette_inverse(
    img: np.ndarray, palette: np.ndarray, orig_w: int
) -> np.ndarray:
    n_colors = len(palette)
    if n_colors <= 2:
        width_bits = 3
    elif n_colors <= 4:
        width_bits = 2
    elif n_colors <= 16:
        width_bits = 1
    else:
        width_bits = 0
    h = img.shape[0]
    idx = img[:, :, 1].astype(np.int64)  # indices ride the GREEN channel
    if width_bits:
        per = 1 << width_bits  # pixels bundled per coded pixel
        bits = 8 >> width_bits  # bits per palette index
        unpacked = np.zeros((h, img.shape[1] * per), dtype=np.int64)
        for k in range(per):
            unpacked[:, k::per] = (idx >> (k * bits)) & ((1 << bits) - 1)
        idx = unpacked[:, :orig_w]
    if idx.size and int(idx.max()) >= n_colors:
        raise ValueError("vp8l: palette index out of range")
    return palette[idx]


# ---------------------------------------------------------------------------
# container + top-level decode
# ---------------------------------------------------------------------------
def webp_dims(blob: bytes) -> tuple[int, int] | None:
    """(width, height) for a lossless WebP, or None if the payload is not
    a RIFF/WEBP container with a VP8L chunk."""
    stream = _find_vp8l(blob)
    if stream is None or len(stream) < 5 or stream[0] != _VP8L_MAGIC:
        return None
    br = _BitReader(stream[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    return (w, h)


def _find_vp8l(blob: bytes) -> bytes | None:
    if blob is None or len(blob) < 20 or blob[:4] != b"RIFF" or blob[8:12] != b"WEBP":
        return None
    pos = 12
    n = len(blob)
    while pos + 8 <= n:
        tag = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        body = blob[pos + 8 : pos + 8 + size]
        if tag == b"VP8L":
            return body
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    return None


def decode_webp(blob: bytes) -> np.ndarray:
    """Decode a lossless WebP to (h, w, 4) uint8 RGBA."""
    stream = _find_vp8l(bytes(blob))
    if stream is None:
        raise ValueError("webp: not a RIFF/WEBP container with a VP8L chunk")
    if len(stream) < 5 or stream[0] != _VP8L_MAGIC:
        raise ValueError("vp8l: bad signature byte")
    br = _BitReader(stream[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha-is-used hint (informational)
    if br.read(3) != 0:
        raise ValueError("vp8l: unsupported version")
    # transforms, in stream order; applied in REVERSE on decode
    transforms: list[tuple] = []
    seen = set()
    coded_w = w
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("vp8l: duplicate transform")
        seen.add(ttype)
        if ttype == 0:  # predictor
            bits = 2 + br.read(3)
            pw = _subsample_size(coded_w, bits)
            ph = _subsample_size(h, bits)
            pred_img = _decode_image(br, pw, ph, allow_meta=False)
            transforms.append(("predictor", bits, pred_img))
        elif ttype == 1:  # color transform
            bits = 2 + br.read(3)
            cw = _subsample_size(coded_w, bits)
            ch = _subsample_size(h, bits)
            ct_img = _decode_image(br, cw, ch, allow_meta=False)
            transforms.append(("color", bits, ct_img))
        elif ttype == 2:  # subtract green
            transforms.append(("subtract_green",))
        else:  # color indexing (palette)
            n_colors = br.read(8) + 1
            pal_img = _decode_image(br, n_colors, 1, allow_meta=False)
            # palette entries are DELTA-coded component-wise
            pal = np.cumsum(pal_img[0].astype(np.int64), axis=0) & 0xFF
            pal = pal.astype(np.uint8)
            transforms.append(("palette", pal, coded_w))
            if n_colors <= 2:
                coded_w = _subsample_size(coded_w, 3)
            elif n_colors <= 4:
                coded_w = _subsample_size(coded_w, 2)
            elif n_colors <= 16:
                coded_w = _subsample_size(coded_w, 1)
    img = _decode_image(br, coded_w, h, allow_meta=True)
    for t in reversed(transforms):
        if t[0] == "predictor":
            img = _apply_predictor_inverse(img, t[2], t[1])
        elif t[0] == "color":
            img = _apply_color_transform_inverse(img, t[2], t[1])
        elif t[0] == "subtract_green":
            img = _apply_subtract_green_inverse(img)
        else:
            img = _apply_palette_inverse(img, t[1], t[2])
    return img


# ---------------------------------------------------------------------------
# encoder twin
# ---------------------------------------------------------------------------
def _build_lengths(freqs: dict[int, int], alphabet_size: int) -> list[int]:
    """Length-limited (15) prefix code lengths from symbol frequencies —
    package-merge is overkill at these alphabet sizes; plain huffman depth
    rarely exceeds 15 here, and we re-balance by flooring at 15 and
    re-normalizing via the canonical over-subscription check."""
    syms = [s for s, f in freqs.items() if f > 0]
    if not syms:
        raise ValueError("vp8l: empty alphabet")
    if len(syms) == 1:
        lengths = [0] * alphabet_size
        lengths[syms[0]] = 1
        return lengths
    import heapq

    heap = [(f, i, (s,)) for i, (s, f) in enumerate(sorted(freqs.items())) if f > 0]
    heapq.heapify(heap)
    depth = dict.fromkeys(syms, 0)
    tie = len(heap)
    while len(heap) > 1:
        f1, _, g1 = heapq.heappop(heap)
        f2, _, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, tie, g1 + g2))
        tie += 1
    if max(depth.values()) > 15:
        # flatten into a two-level complete code: with n symbols and
        # bits = ceil(log2 n), giving x = 2^bits - n symbols length
        # bits-1 and the rest length bits satisfies Kraft exactly
        n = len(syms)
        bits = (n - 1).bit_length()
        x = (1 << bits) - n
        lengths = [0] * alphabet_size
        for i, s in enumerate(sorted(syms)):
            lengths[s] = (bits - 1) if i < x else bits
        return lengths
    lengths = [0] * alphabet_size
    for s, d in depth.items():
        lengths[s] = d
    return lengths


def _write_prefix_code(bw: _BitWriter, lengths: list[int]) -> dict[int, tuple[int, int]]:
    nonzero = [s for s, ln in enumerate(lengths) if ln]
    # the simple form stores symbols in 1 or 8 bits, so it cannot express
    # green symbols >= 256 (length / cache codes) — fall back to the
    # code-length-coded form for those
    if (
        len(nonzero) <= 2
        and all(lengths[s] == 1 for s in nonzero)
        and all(s <= 255 for s in nonzero)
    ):
        # simple code
        bw.write(1, 1)
        bw.write(len(nonzero) - 1, 1)
        first = nonzero[0]
        if first <= 1:
            bw.write(0, 1)
            bw.write(first, 1)
        else:
            bw.write(1, 1)
            bw.write(first, 8)
        if len(nonzero) == 2:
            bw.write(nonzero[1], 8)
        if len(nonzero) == 1:
            return {nonzero[0]: (0, 0)}
        return {nonzero[0]: (0, 1), nonzero[1]: (1, 1)}
    _write_code_lengths(bw, lengths)
    if len(nonzero) == 1:
        # the decoder's degenerate single-symbol code reads ZERO bits per
        # symbol — emit must match, not the canonical 1-bit code
        return {nonzero[0]: (0, 0)}
    return _canonical_codes(lengths)


def _emit(bw: _BitWriter, codes: dict[int, tuple[int, int]], sym: int) -> None:
    code, ln = codes[sym]
    if ln:
        bw.write(_reverse_bits(code, ln), ln)


def encode_webp(
    img: np.ndarray,
    use_palette: bool | None = None,
    subtract_green: bool = False,
    cache_bits: int = 0,
    lz77: bool = True,
) -> bytes:
    """Encode (h, w[, 3|4]) uint8 pixels as a lossless WebP.

    - ``use_palette``: force the color-indexing transform on/off; default
      auto (on when <= 256 distinct colors and it would shrink the data,
      i.e. small images with few colors). Palettes of <= 16 colors use
      the spec's sub-byte pixel bundling.
    - ``subtract_green``: apply the subtract-green transform first.
    - ``cache_bits``: color cache size (0 disables, 1..11 enable).
    - ``lz77``: greedy single-row backward references (distance 1..8
      window plus plain distances) — exact, just smaller output.

    Exact by construction: decode_webp returns the input bit-for-bit
    (RGBA; RGB input decodes with alpha 255)."""
    px = np.ascontiguousarray(img)
    if px.dtype != np.uint8 or px.ndim not in (2, 3):
        raise ValueError("webp: need (h, w[, 3|4]) uint8 pixels")
    if px.ndim == 2:
        px = np.stack([px, px, px], axis=-1)
    if px.shape[2] == 3:
        alpha = np.full(px.shape[:2] + (1,), 255, dtype=np.uint8)
        px = np.concatenate([px, alpha], axis=2)
    elif px.shape[2] != 4:
        raise ValueError("webp: need 3 or 4 channels")
    h, w, _ = px.shape
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise ValueError("webp: dims out of the 14-bit range")

    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    has_alpha = bool((px[:, :, 3] != 255).any())
    bw.write(1 if has_alpha else 0, 1)
    bw.write(0, 3)  # version

    coded = px
    # ---- transforms (stream order; decoder applies them in reverse) ----
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
        t = coded.astype(np.int32)
        t[:, :, 0] = (t[:, :, 0] - t[:, :, 1]) & 0xFF
        t[:, :, 2] = (t[:, :, 2] - t[:, :, 1]) & 0xFF
        coded = t.astype(np.uint8)

    flat = coded.reshape(-1, 4)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if use_palette is None:
        use_palette = len(colors) <= 256 and len(colors) < (h * w) // 4
    if use_palette and len(colors) > 256:
        raise ValueError("webp: palette requested but > 256 distinct colors")
    if use_palette:
        bw.write(1, 1)
        bw.write(3, 2)
        n_colors = len(colors)
        bw.write(n_colors - 1, 8)
        deltas = np.diff(
            np.vstack([np.zeros((1, 4), np.int64), colors.astype(np.int64)]), axis=0
        ) & 0xFF
        _encode_image_literals(bw, deltas.astype(np.uint8).reshape(1, n_colors, 4))
        idx = inverse.reshape(h, w).astype(np.int64)
        if n_colors <= 2:
            width_bits = 3
        elif n_colors <= 4:
            width_bits = 2
        elif n_colors <= 16:
            width_bits = 1
        else:
            width_bits = 0
        if width_bits:
            per = 1 << width_bits
            bits = 8 >> width_bits
            cw = _subsample_size(w, width_bits)
            packed = np.zeros((h, cw), dtype=np.int64)
            for k in range(per):
                col = idx[:, k::per]
                packed[:, : col.shape[1]] |= col << (k * bits)
            idx_img = packed
        else:
            idx_img = idx
        coded_img = np.zeros(idx_img.shape + (4,), dtype=np.uint8)
        coded_img[:, :, 1] = idx_img.astype(np.uint8)  # green channel
        coded_img[:, :, 3] = 255
        bw.write(0, 1)  # no more transforms
        _encode_image_entropy(bw, coded_img, cache_bits=0, lz77=lz77)
    else:
        bw.write(0, 1)  # no more transforms
        _encode_image_entropy(bw, coded, cache_bits=cache_bits, lz77=lz77)

    stream = bytes([_VP8L_MAGIC]) + bw.finish()
    chunk = b"VP8L" + struct.pack("<I", len(stream)) + stream
    if len(stream) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _encode_image_literals(bw: _BitWriter, img: np.ndarray) -> None:
    """All-literal entropy image (used for the palette deltas)."""
    _encode_image_entropy(bw, img, cache_bits=0, lz77=False, allow_meta=False)


def _tokenize(
    flat: np.ndarray, cache_bits: int, lz77: bool
) -> list[tuple]:
    """Greedy tokens: ('lit', r,g,b,a) | ('cache', idx) | ('copy', len, dist)."""
    n = len(flat)
    tokens: list[tuple] = []
    cache = {} if cache_bits else None
    pos = 0
    as_int = (
        flat[:, 0].astype(np.int64) << 24
        | flat[:, 1].astype(np.int64) << 16
        | flat[:, 2].astype(np.int64) << 8
        | flat[:, 3].astype(np.int64)
    )
    while pos < n:
        if lz77 and pos >= 1:
            # greedy: try distances 1..8, keep the longest run >= 3
            best_len, best_dist = 0, 0
            for dist in range(1, min(9, pos + 1)):
                ln = 0
                max_ln = min(n - pos, 4096)
                while ln < max_ln and as_int[pos + ln] == as_int[pos + ln - dist]:
                    ln += 1
                if ln > best_len:
                    best_len, best_dist = ln, dist
            if best_len >= 3:
                tokens.append(("copy", best_len, best_dist))
                if cache is not None:
                    for i in range(pos, pos + best_len):
                        r, g, b, a = (int(v) for v in flat[i])
                        cache[_hash_argb(r, g, b, a, cache_bits)] = int(as_int[i])
                pos += best_len
                continue
        r, g, b, a = (int(v) for v in flat[pos])
        if cache is not None:
            hidx = _hash_argb(r, g, b, a, cache_bits)
            if cache.get(hidx) == int(as_int[pos]):
                tokens.append(("cache", hidx))
                pos += 1
                continue
            cache[hidx] = int(as_int[pos])
        tokens.append(("lit", r, g, b, a))
        pos += 1
    return tokens


def _encode_image_entropy(
    bw: _BitWriter,
    img: np.ndarray,
    cache_bits: int,
    lz77: bool,
    allow_meta: bool = True,
) -> None:
    h, w, _ = img.shape
    flat = img.reshape(-1, 4)
    if allow_meta:
        bw.write(0, 1)  # no meta-prefix image
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    tokens = _tokenize(flat, cache_bits, lz77)
    green_size = _GREEN_BASE + ((1 << cache_bits) if cache_bits else 0)
    fg: dict[int, int] = {}
    fr: dict[int, int] = {}
    fb: dict[int, int] = {}
    fa: dict[int, int] = {}
    fd: dict[int, int] = {}
    for t in tokens:
        if t[0] == "lit":
            _, r, g, b, a = t
            fg[g] = fg.get(g, 0) + 1
            fr[r] = fr.get(r, 0) + 1
            fb[b] = fb.get(b, 0) + 1
            fa[a] = fa.get(a, 0) + 1
        elif t[0] == "cache":
            s = _GREEN_BASE + t[1]
            fg[s] = fg.get(s, 0) + 1
        else:
            _, ln, dist = t
            lc, _, _ = _lz77_prefix(ln)
            fg[256 + lc] = fg.get(256 + lc, 0) + 1
            dc, _, _ = _lz77_prefix(dist + 120)
            fd[dc] = fd.get(dc, 0) + 1
    # every prefix code must exist even if unused: give empties a 1-symbol code
    for f in (fr, fb, fa):
        if not f:
            f[0] = 1
    if not fd:
        fd[0] = 1
    cg = _write_prefix_code(bw, _build_lengths(fg, green_size))
    cr = _write_prefix_code(bw, _build_lengths(fr, 256))
    cb = _write_prefix_code(bw, _build_lengths(fb, 256))
    ca = _write_prefix_code(bw, _build_lengths(fa, 256))
    cd = _write_prefix_code(bw, _build_lengths(fd, _NUM_DIST_CODES))
    for t in tokens:
        if t[0] == "lit":
            _, r, g, b, a = t
            _emit(bw, cg, g)
            _emit(bw, cr, r)
            _emit(bw, cb, b)
            _emit(bw, ca, a)
        elif t[0] == "cache":
            _emit(bw, cg, _GREEN_BASE + t[1])
        else:
            _, ln, dist = t
            lc, leb, lev = _lz77_prefix(ln)
            _emit(bw, cg, 256 + lc)
            if leb:
                bw.write(lev, leb)
            dc, deb, dev = _lz77_prefix(dist + 120)
            _emit(bw, cd, dc)
            if deb:
                bw.write(dev, deb)


def webp_thumbnail(blob: bytes, max_w: int = 128, max_h: int = 128) -> bytes:
    """Format-preserving WebP thumbnail: decode, nearest-neighbor shrink
    (aspect-preserving, never upscale), re-encode losslessly."""
    img = decode_webp(blob)
    h, w = img.shape[:2]
    scale = min(max_w / w, max_h / h, 1.0)
    ow, oh = max(int(w * scale), 1), max(int(h * scale), 1)
    rows = np.minimum((np.arange(oh) + 0.5) * h / oh, h - 1).astype(np.int64)
    cols = np.minimum((np.arange(ow) + 0.5) * w / ow, w - 1).astype(np.int64)
    return encode_webp(img[rows][:, cols])
