"""From-scratch baseline TIFF 6.0 codec (Adobe TIFF 6.0 spec, public).

Closes the TIFF slice of the F25 media seam honestly: the reference
thumbnails anything PIL decodes (/root/reference/landlensdb/handlers/
image.py:95-138); this module gives the engine native TIFF metadata
(IFD chain walk — n_frames = page count), pixel decode and an encoder
twin so round-trips are testable without PIL.

Scope (everything else raises ValueError, never crashing an Arrow stage
— callers catch, same contract as operators/gif.py):
- both byte orders (II/MM) on decode; the encoder writes little-endian
- 8-bit grayscale (PhotometricInterpretation 0/1) and 8-bit chunky RGB,
  strip-organized (tiled TIFFs are out of scope)
- Compression 1 (none), 5 (LZW — the TIFF variant: MSB-first packing,
  9..12-bit codes with the spec's early width change) and 32773
  (PackBits); the encoder emits none or LZW
- multi-page files: ``tiff_meta`` counts IFDs, decode reads page 0

Uncompressed and LZW/PackBits storage of 8-bit samples is lossless, so
encode -> decode is EXACT by construction — any IFD/LZW/bit-packing bug
breaks equality, which is what the tests and the tiff_roundtrip oracle
lean on.
"""

from __future__ import annotations

import struct

import numpy as np

_II = b"II\x2a\x00"
_MM = b"MM\x00\x2a"

#: the IFD tags this codec interprets (TIFF 6.0 baseline)
_W, _H = 256, 257
_BITS, _COMP, _PHOTO = 258, 259, 262
_STRIP_OFF, _SPP, _ROWS_PER_STRIP, _STRIP_CNT = 273, 277, 278, 279
_PLANAR = 284

#: bytes per IFD entry value type (only the types baseline files use)
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4}

_CLEAR, _EOI, _FIRST = 256, 257, 258
_MAX_WIDTH = 12


# --------------------------------------------------------------------------
# metadata
# --------------------------------------------------------------------------
def _order(blob: bytes) -> str | None:
    if blob is None or len(blob) < 8:
        return None
    if blob[:4] == _II:
        return "<"
    if blob[:4] == _MM:
        return ">"
    return None


def _read_ifd(blob: bytes, off: int, bo: str) -> tuple[dict[int, list[int]], int]:
    """One IFD as {tag: [values...]} plus the next-IFD offset."""
    n = len(blob)
    if off + 2 > n:
        raise ValueError("tiff: IFD offset beyond payload")
    (count,) = struct.unpack_from(bo + "H", blob, off)
    end = off + 2 + 12 * count
    if end + 4 > n:
        raise ValueError("tiff: IFD overruns payload")
    tags: dict[int, list[int]] = {}
    for i in range(count):
        tag, typ, cnt = struct.unpack_from(bo + "HHI", blob, off + 2 + 12 * i)
        if typ not in _TYPE_SIZE or cnt == 0:
            # rational/float tags are metadata this codec ignores; a
            # zero-count entry is corrupt — skipping it routes readers into
            # their missing-tag ValueError guards instead of an IndexError
            # escaping the Arrow stage's (ValueError, struct.error) net
            continue
        size = _TYPE_SIZE[typ] * cnt
        vpos = off + 2 + 12 * i + 8
        if size > 4:
            (vpos,) = struct.unpack_from(bo + "I", blob, vpos)
            if vpos + size > n:
                raise ValueError(f"tiff: tag {tag} values overrun payload")
        fmt = {1: "B", 2: "B", 3: "H", 4: "I"}[typ]
        tags[tag] = list(struct.unpack_from(bo + str(cnt) + fmt, blob, vpos))
    (nxt,) = struct.unpack_from(bo + "I", blob, end)
    return tags, nxt


def tiff_dims(blob: bytes) -> tuple[int, int] | None:
    """(width, height) from the first IFD, or None if not a TIFF."""
    bo = _order(blob)
    if bo is None:
        return None
    (off,) = struct.unpack_from(bo + "I", blob, 4)
    tags, _ = _read_ifd(bytes(blob), off, bo)
    if _W not in tags or _H not in tags:
        raise ValueError("tiff: first IFD lacks dimensions")
    return (tags[_W][0], tags[_H][0])


def tiff_meta(blob: bytes) -> tuple[int, int, int] | None:
    """(width, height, n_pages) — walks the whole IFD chain; None for
    non-TIFF payloads, ValueError for TIFFs with corrupt framing."""
    bo = _order(blob)
    if bo is None:
        return None
    b = bytes(blob)
    (off,) = struct.unpack_from(bo + "I", b, 4)
    pages, dims = 0, None
    seen = set()
    while off:
        if off in seen:
            raise ValueError("tiff: IFD chain cycle")
        seen.add(off)
        tags, off = _read_ifd(b, off, bo)
        if pages == 0:
            if _W not in tags or _H not in tags:
                raise ValueError("tiff: first IFD lacks dimensions")
            dims = (tags[_W][0], tags[_H][0])
        pages += 1
        if pages > 65535:
            raise ValueError("tiff: unreasonable page count")
    if pages == 0:
        raise ValueError("tiff: empty IFD chain")
    return (dims[0], dims[1], pages)


# --------------------------------------------------------------------------
# TIFF-variant LZW (MSB-first, early width change) + PackBits
# --------------------------------------------------------------------------
def _lzw_decode(data: bytes, expect: int) -> bytes:
    out = bytearray()
    table: list[bytes] = []
    width = 9
    next_code = _FIRST
    prev: bytes | None = None
    acc = nbits = pos = 0
    n = len(data)
    while len(out) < expect:
        while nbits < width:
            if pos >= n:
                raise ValueError("tiff: LZW stream ended before EOI/pixels")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == _EOI:
            break
        if code == _CLEAR:
            table = []
            width = 9
            next_code = _FIRST
            prev = None
            continue
        if prev is None:
            if code >= _CLEAR:
                raise ValueError("tiff: first code after clear not a literal")
            entry = bytes([code])
        elif code < 256:
            entry = bytes([code])
            table.append(prev + entry[:1])
            next_code += 1
        elif code - _FIRST < len(table):
            entry = table[code - _FIRST]
            table.append(prev + entry[:1])
            next_code += 1
        elif code == next_code:  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
            next_code += 1
        else:
            raise ValueError("tiff: LZW code beyond table")
        out += entry
        prev = entry
        # the spec's EARLY change: the decoder widens one slot before the
        # table is actually full at this width (TIFF 6.0 ch. 13)
        if next_code == (1 << width) - 1 and width < _MAX_WIDTH:
            width += 1
    if len(out) < expect:
        raise ValueError("tiff: LZW stream short of the expected bytes")
    return bytes(out[:expect])


def _lzw_encode(raw: bytes) -> bytes:
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {}
    width = 9
    next_code = _FIRST
    emit(_CLEAR, width)
    w = b""
    for ch in raw:
        wc = w + bytes([ch])
        if len(wc) == 1 or wc in table:
            w = wc
            continue
        # encoder widens when the decoder (which lags one table entry)
        # has just applied its early change — see the mirrored rule above
        if next_code == (1 << width):
            width += 1
        emit(table[w] if len(w) > 1 else w[0], width)
        table[wc] = next_code
        next_code += 1
        w = bytes([ch])
        if next_code >= (1 << _MAX_WIDTH) - 3:
            # reset with margin before the 12-bit table fills, per the
            # spec's requirement that the encoder clear in time
            if next_code == (1 << width):
                width += 1
            emit(_CLEAR, width)
            table = {}
            width = 9
            next_code = _FIRST
    if w:
        if next_code == (1 << width):
            width += 1
        emit(table[w] if len(w) > 1 else w[0], width)
        next_code += 1
    if next_code == (1 << width):
        width += 1
    emit(_EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes, expect: int) -> bytes:
    out = bytearray()
    pos, n = 0, len(data)
    while len(out) < expect:
        if pos >= n:
            raise ValueError("tiff: PackBits stream short of the row")
        ctl = data[pos]
        pos += 1
        if ctl < 128:  # ctl+1 literal bytes
            if pos + ctl + 1 > n:
                raise ValueError("tiff: PackBits literal overruns stream")
            out += data[pos : pos + ctl + 1]
            pos += ctl + 1
        elif ctl > 128:  # repeat next byte 257-ctl times
            if pos >= n:
                raise ValueError("tiff: PackBits run overruns stream")
            out += bytes([data[pos]]) * (257 - ctl)
            pos += 1
        # ctl == 128: no-op per the spec
    if len(out) != expect:
        raise ValueError("tiff: PackBits output does not match the strip size")
    return bytes(out)


# --------------------------------------------------------------------------
# decode
# --------------------------------------------------------------------------
def decode_tiff(blob: bytes) -> np.ndarray:
    """First page as pixels: grayscale (h, w) uint8 or RGB (h, w, 3) uint8
    — mirroring decode_jpeg/decode_gif's 2-D/3-D convention."""
    bo = _order(blob)
    if bo is None:
        raise ValueError("tiff: bad signature")
    b = bytes(blob)
    (off,) = struct.unpack_from(bo + "I", b, 4)
    tags, _ = _read_ifd(b, off, bo)
    for tag, name in ((_W, "width"), (_H, "height"), (_STRIP_OFF, "strip offsets"),
                      (_STRIP_CNT, "strip byte counts")):
        if tag not in tags:
            raise ValueError(f"tiff: first IFD lacks {name}")
    w, h = tags[_W][0], tags[_H][0]
    if w == 0 or h == 0 or w * h > 64 * 1024 * 1024:
        raise ValueError(f"tiff: unreasonable image dims {w}x{h}")
    comp = tags.get(_COMP, [1])[0]
    photo = tags.get(_PHOTO, [1])[0]
    spp = tags.get(_SPP, [1])[0]
    bits = tags.get(_BITS, [8] * spp)
    planar = tags.get(_PLANAR, [1])[0]
    if any(x != 8 for x in bits) or planar != 1:
        raise ValueError("tiff: only 8-bit chunky samples are in scope")
    if photo not in (0, 1, 2) or (photo == 2) != (spp == 3) or spp not in (1, 3):
        raise ValueError(f"tiff: photometric {photo}/spp {spp} out of scope")
    rows_per_strip = tags.get(_ROWS_PER_STRIP, [h])[0]
    offs, cnts = tags[_STRIP_OFF], tags[_STRIP_CNT]
    if len(offs) != len(cnts):
        raise ValueError("tiff: strip offset/count arity mismatch")
    raw = bytearray()
    row = 0
    for so, sc in zip(offs, cnts):
        if so + sc > len(b):
            raise ValueError("tiff: strip overruns payload")
        nrows = min(rows_per_strip, h - row)
        expect = nrows * w * spp
        strip = b[so : so + sc]
        if comp == 1:
            if sc < expect:
                raise ValueError("tiff: uncompressed strip short of its rows")
            raw += strip[:expect]
        elif comp == 5:
            raw += _lzw_decode(strip, expect)
        elif comp == 32773:
            raw += _packbits_decode(strip, expect)
        else:
            raise ValueError(f"tiff: compression {comp} out of scope")
        row += nrows
    if row < h:
        raise ValueError("tiff: strips cover fewer rows than ImageLength")
    img = np.frombuffer(bytes(raw), dtype=np.uint8)
    img = img.reshape(h, w) if spp == 1 else img.reshape(h, w, 3)
    if photo == 0:  # WhiteIsZero: invert to the usual BlackIsZero ramp
        img = 255 - img
    return img.copy()


# --------------------------------------------------------------------------
# encode (little-endian, strip-per-64-rows, gray or RGB chunky)
# --------------------------------------------------------------------------
def _encode(pages: list[np.ndarray], compress: bool) -> bytes:
    out = bytearray(b"II\x2a\x00\x00\x00\x00\x00")
    ifd_patch = 4  # where the previous next-IFD pointer lives
    for page in pages:
        page = np.ascontiguousarray(page, dtype=np.uint8)
        if page.ndim == 2:
            h, w, spp, photo = page.shape[0], page.shape[1], 1, 1
        elif page.ndim == 3 and page.shape[2] == 3:
            h, w, spp, photo = page.shape[0], page.shape[1], 3, 2
        else:
            raise ValueError("tiff: pages must be (h, w) gray or (h, w, 3) rgb")
        rows_per_strip = 64
        strips, offs, cnts = [], [], []
        for r0 in range(0, h, rows_per_strip):
            raw = page[r0 : r0 + rows_per_strip].tobytes()
            strips.append(_lzw_encode(raw) if compress else raw)
        for s in strips:
            offs.append(len(out))
            cnts.append(len(s))
            out += s
        if len(out) % 2:
            out += b"\x00"  # IFDs must be word-aligned

        def _arr(values: list[int]) -> int:
            """LONG array; returns its offset (written before the IFD)."""
            pos = len(out)
            out.extend(struct.pack(f"<{len(values)}I", *values))
            return pos

        off_pos = _arr(offs) if len(offs) > 1 else offs[0]
        cnt_pos = _arr(cnts) if len(cnts) > 1 else cnts[0]
        if spp > 1:
            # tag 258 is SHORT per the TIFF 6.0 type table; 3 SHORTs = 6
            # bytes, so the array still lives out-of-line
            bits_pos = len(out)
            out.extend(struct.pack(f"<{spp}H", *([8] * spp)))
            if len(out) % 2:
                out += b"\x00"
        else:
            bits_pos = 8
        entries = [
            (_W, 4, 1, w),
            (_H, 4, 1, h),
            (_BITS, 3, spp, bits_pos),
            (_COMP, 3, 1, 5 if compress else 1),
            (_PHOTO, 3, 1, photo),
            (_STRIP_OFF, 4, len(offs), off_pos),
            (_SPP, 3, 1, spp),
            (_ROWS_PER_STRIP, 4, 1, rows_per_strip),
            (_STRIP_CNT, 4, len(cnts), cnt_pos),
            (_PLANAR, 3, 1, 1),
        ]
        ifd_pos = len(out)
        struct.pack_into("<I", out, ifd_patch, ifd_pos)
        out += struct.pack("<H", len(entries))
        for tag, typ, cnt, val in sorted(entries):
            out += struct.pack("<HHI", tag, typ, cnt)
            # the value field holds a 32-bit OFFSET whenever the values
            # don't fit inline (e.g. the 3-SHORT BitsPerSample array)
            if typ == 4 or _TYPE_SIZE[typ] * cnt > 4:
                out += struct.pack("<I", val)
            else:
                out += struct.pack("<HH", val, 0)
        ifd_patch = len(out)
        out += b"\x00\x00\x00\x00"  # next-IFD pointer (patched by next page)
    return bytes(out)


def encode_tiff_gray(
    pages: np.ndarray | list[np.ndarray], compress: bool = True
) -> bytes:
    """8-bit grayscale TIFF (one page or a multi-page list); LZW by
    default. Lossless: decode_tiff returns the array bit-exactly."""
    if isinstance(pages, np.ndarray):
        pages = [pages]
    if not pages or any(p.ndim != 2 for p in pages):
        raise ValueError("tiff: need at least one (h, w) gray page")
    return _encode(pages, compress)


def encode_tiff_rgb(
    pages: np.ndarray | list[np.ndarray], compress: bool = True
) -> bytes:
    """8-bit chunky RGB TIFF; LZW by default. Lossless round-trip."""
    if isinstance(pages, np.ndarray):
        pages = [pages]
    if not pages or any(p.ndim != 3 or p.shape[2] != 3 for p in pages):
        raise ValueError("tiff: need at least one (h, w, 3) rgb page")
    return _encode(pages, compress)


def tiff_thumbnail(blob: bytes, max_w: int = 128, max_h: int = 128) -> bytes:
    """Format-preserving TIFF thumbnail: decode page 0, box-filter shrink
    (aspect-preserving, never upscale), re-encode LZW at the same
    colorspace."""
    from landlensdb_spark.operators.raster import resize_gray

    img = decode_tiff(blob)
    h, w = img.shape[:2]
    scale = min(max_w / w, max_h / h, 1.0)
    ow, oh = max(int(w * scale), 1), max(int(h * scale), 1)
    if img.ndim == 2:
        return encode_tiff_gray(resize_gray(img, ow, oh))
    small = np.stack([resize_gray(img[..., c], ow, oh) for c in range(3)], axis=-1)
    return encode_tiff_rgb(small)
