"""From-scratch GIF87a/89a codec (CompuServe GIF spec / W3C GIF89a, public).

Closes the GIF slice of the F25 media seam honestly: the reference
thumbnails anything PIL decodes (/root/reference/landlensdb/handlers/
image.py:95-138); this module gives the engine native GIF metadata, pixel
decode (variable-width LZW, local/global color tables, interlace,
multi-image files) and an encoder twin so round-trips are testable without
PIL. Palette-indexed storage is lossless, so encode -> decode is EXACT by
construction — any LZW/bit-packing bug breaks equality, which is what the
tests and the media_meta oracle lean on.

Scope notes (all raising/None-returning, never crashing an Arrow stage):
- decode targets the common encoder behavior (initial clear code, code
  width growth at table sizes 2^w, 4096-entry cap with table freeze);
  exotic deferred-clear streams beyond the cap are out of scope.
- GIF89a extension blocks (comment, application) are skipped
  structurally by the single-frame decode path. ``render_gif`` is the
  ANIMATION-AWARE path: it interprets graphic-control extensions
  (transparency index, disposal methods 0/1 keep, 2 restore-to-
  background, 3 restore-to-previous) and composites every image block
  onto the accumulated logical-screen canvas at its (left, top) offset —
  the same semantics PIL's seek()/convert('RGB') applies in the
  reference's thumbnail path (handlers/image.py:95-138). The render is
  RGB (no alpha channel), so "restore to background" paints the LSD
  background COLOR; a renderer that models the background as transparent
  is out of scope for an RGB canvas and the docstring says so.
"""

from __future__ import annotations

import struct

import numpy as np

_SIGS = (b"GIF87a", b"GIF89a")
#: LZW code width never exceeds 12 bits (table cap 4096) per the spec
_MAX_WIDTH = 12
_TABLE_CAP = 1 << _MAX_WIDTH
#: interlace pass layout: (first row, row step) per the GIF spec
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


# --------------------------------------------------------------------------
# metadata
# --------------------------------------------------------------------------
def gif_dims(blob: bytes) -> tuple[int, int] | None:
    """(width, height) from the logical screen descriptor, or None if the
    payload is not a GIF."""
    if blob is None or len(blob) < 13 or blob[:6] not in _SIGS:
        return None
    w, h = struct.unpack_from("<HH", blob, 6)
    return (int(w), int(h))


def _skip_subblocks(blob: bytes, pos: int) -> int:
    """Advance past a data sub-block chain (size-prefixed, 0-terminated)."""
    n = len(blob)
    while True:
        if pos >= n:
            raise ValueError("gif: truncated sub-block chain")
        size = blob[pos]
        pos += 1
        if size == 0:
            return pos
        if pos + size > n:
            raise ValueError("gif: sub-block overruns payload")
        pos += size


def _read_subblocks(blob: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a data sub-block chain; returns (data, next_pos)."""
    n = len(blob)
    parts = []
    while True:
        if pos >= n:
            raise ValueError("gif: truncated sub-block chain")
        size = blob[pos]
        pos += 1
        if size == 0:
            return b"".join(parts), pos
        if pos + size > n:
            raise ValueError("gif: sub-block overruns payload")
        parts.append(blob[pos : pos + size])
        pos += size


def _header(blob: bytes) -> tuple[int, int, np.ndarray | None, int]:
    """Parse signature + LSD + global color table.

    Returns (width, height, global_palette or None, pos_after_gct)."""
    dims = gif_dims(blob)
    if dims is None:
        raise ValueError("gif: bad signature or truncated header")
    packed = blob[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n_colors = 2 << (packed & 0x07)
        end = pos + 3 * n_colors
        if end > len(blob):
            raise ValueError("gif: global color table overruns payload")
        gct = np.frombuffer(blob, dtype=np.uint8, count=3 * n_colors, offset=pos)
        gct = gct.reshape(n_colors, 3).copy()
        pos = end
    return (dims[0], dims[1], gct, pos)


def gif_meta(blob: bytes) -> tuple[int, int, int] | None:
    """(width, height, n_frames) — walks every block structurally; None for
    non-GIF payloads, ValueError for GIFs with corrupt framing."""
    if gif_dims(blob) is None:
        return None
    w, h, _gct, pos = _header(blob)
    n = len(blob)
    frames = 0
    while pos < n:
        marker = blob[pos]
        pos += 1
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension: label byte + sub-blocks
            if pos >= n:
                raise ValueError("gif: truncated extension")
            pos = _skip_subblocks(blob, pos + 1)
        elif marker == 0x2C:  # image descriptor
            if pos + 9 > n:
                raise ValueError("gif: truncated image descriptor")
            ipacked = blob[pos + 8]
            pos += 9
            if ipacked & 0x80:  # local color table
                pos += 3 * (2 << (ipacked & 0x07))
            if pos >= n:
                raise ValueError("gif: truncated image block")
            pos = _skip_subblocks(blob, pos + 1)  # +1 skips LZW min code size
            frames += 1
        else:
            raise ValueError(f"gif: unknown block marker 0x{marker:02x}")
    if frames == 0:
        raise ValueError("gif: no image blocks")
    return (w, h, frames)


# --------------------------------------------------------------------------
# LZW (GIF variant: LSB-first packing, variable 3..12-bit codes)
# --------------------------------------------------------------------------
def _lzw_decode(data: bytes, mcs: int, npix: int) -> bytes:
    if not (2 <= mcs <= 8):
        raise ValueError(f"gif: bad LZW min code size {mcs}")
    clear = 1 << mcs
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = mcs + 1
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while len(out) < npix:
        while nbits < width:
            if pos >= n:
                raise ValueError("gif: LZW stream ended before EOI/pixels")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= clear:
                raise ValueError("gif: first code after clear not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("gif: LZW code beyond table")
        out += entry
        prev = entry
        # mirror of the encoder's growth rule; at the 4096 cap the table
        # freezes (codes stay 12-bit, later appends are never referenced)
        if width < _MAX_WIDTH and len(table) == (1 << width):
            width += 1
    if len(out) < npix:
        raise ValueError("gif: LZW stream short of the pixel count")
    return bytes(out[:npix])


def _lzw_encode(pixels: bytes, mcs: int) -> bytes:
    clear = 1 << mcs
    eoi = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = mcs + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    w = b""
    for p in pixels:
        wc = w + bytes([p])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        if next_code < _TABLE_CAP:
            table[wc] = next_code
            next_code += 1
            # decoder adds its mirror entry one code LATER, so it reaches
            # table size 2^w exactly when we reach 2^w + 1 — grow now so
            # the NEXT emitted code uses the width the decoder expects
            if width < _MAX_WIDTH and next_code - 1 == (1 << width):
                width += 1
        # else: table frozen (no deferred clear) — decoder stays in sync
        # because it only grows width at sizes the encoder also reached
        w = bytes([p])
    if w:
        emit(table[w])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# --------------------------------------------------------------------------
# decode
# --------------------------------------------------------------------------
def _deinterlace(idx: np.ndarray) -> np.ndarray:
    """Undo GIF 4-pass interlace row ordering."""
    ih = idx.shape[0]
    deinter = np.empty_like(idx)
    src = 0
    for first, step in _INTERLACE:
        for r in range(first, ih, step):
            deinter[r] = idx[src]
            src += 1
    return deinter


def decode_gif_indexed(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    """First image block as (index array (h, w) uint8, palette (n, 3)).

    Uses the local color table when present, else the global one."""
    w, h, gct, pos = _header(bytes(blob))
    n = len(blob)
    while pos < n:
        marker = blob[pos]
        pos += 1
        if marker == 0x3B:
            break
        if marker == 0x21:
            if pos >= n:
                raise ValueError("gif: truncated extension")
            pos = _skip_subblocks(blob, pos + 1)
            continue
        if marker != 0x2C:
            raise ValueError(f"gif: unknown block marker 0x{marker:02x}")
        if pos + 9 > n:
            raise ValueError("gif: truncated image descriptor")
        left, top, iw, ih = struct.unpack_from("<HHHH", blob, pos)
        ipacked = blob[pos + 8]
        pos += 9
        palette = gct
        if ipacked & 0x80:
            n_colors = 2 << (ipacked & 0x07)
            end = pos + 3 * n_colors
            if end > n:
                raise ValueError("gif: local color table overruns payload")
            palette = (
                np.frombuffer(blob, dtype=np.uint8, count=3 * n_colors, offset=pos)
                .reshape(n_colors, 3)
                .copy()
            )
            pos = end
        if palette is None:
            raise ValueError("gif: image has neither local nor global palette")
        if iw == 0 or ih == 0 or iw * ih > 64 * 1024 * 1024:
            raise ValueError(f"gif: unreasonable image dims {iw}x{ih}")
        if pos >= n:
            raise ValueError("gif: truncated image block")
        mcs = blob[pos]
        data, _pos = _read_subblocks(blob, pos + 1)
        idx = np.frombuffer(
            _lzw_decode(data, mcs, iw * ih), dtype=np.uint8
        ).reshape(ih, iw)
        if idx.size and int(idx.max()) >= len(palette):
            raise ValueError("gif: pixel index beyond palette")
        if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
            idx = _deinterlace(idx)
        if (left, top, iw, ih) != (0, 0, w, h):
            # the image block is a sub-rectangle of the logical screen:
            # composite onto the full (h, w) canvas so decode dims agree
            # with gif_meta/LSD dims. SCOPE: uncovered area takes the LSD
            # background color — the correct render for the FIRST frame /
            # single-image GIFs, which is all this single-frame entry
            # point promises. An animated GIF's delta frame i composites
            # over the accumulated previous canvas per its disposal
            # method; that path is render_gif (full GCE/disposal/
            # transparency semantics) — use it for frames >= 2 of
            # third-party delta-frame animations. gif_frames re-wraps
            # blocks standalone and inherits this first-frame-only
            # contract.
            if left + iw > w or top + ih > h:
                raise ValueError("gif: image block overruns logical screen")
            # the background index is defined against the GLOBAL color
            # table; when this block brought its own local palette the
            # index may map to an arbitrary color there, so use 0 instead
            bg = blob[11] if not (ipacked & 0x80) else 0
            if bg >= len(palette):
                bg = 0
            canvas = np.full((h, w), bg, dtype=np.uint8)
            canvas[top : top + ih, left : left + iw] = idx
            return canvas, palette
        return idx.copy(), palette
    raise ValueError("gif: no image blocks")


def gif_frames(blob: bytes) -> list[bytes]:
    """Each image block as a STANDALONE single-image GIF (the source
    header + global color table re-wrapped around the block's bytes plus
    a trailer) — the GIF analog of video.mjpeg_frames: every element
    decodes independently via decode_gif. Pure byte-level slicing; a
    local color table travels inside its block untouched."""
    b = bytes(blob)
    _w, _h, _gct, pos = _header(b)
    head = b[:pos]  # signature + logical screen descriptor + GCT
    n = len(b)
    frames: list[bytes] = []
    while pos < n:
        marker = b[pos]
        pos += 1
        if marker == 0x3B:
            break
        if marker == 0x21:
            if pos >= n:
                raise ValueError("gif: truncated extension")
            pos = _skip_subblocks(b, pos + 1)
            continue
        if marker != 0x2C:
            raise ValueError(f"gif: unknown block marker 0x{marker:02x}")
        start = pos - 1
        if pos + 9 > n:
            raise ValueError("gif: truncated image descriptor")
        ipacked = b[pos + 8]
        pos += 9
        if ipacked & 0x80:
            pos += 3 * (2 << (ipacked & 0x07))
        if pos >= n:
            raise ValueError("gif: truncated image block")
        pos = _skip_subblocks(b, pos + 1)
        frames.append(head + b[start:pos] + b"\x3b")
    if not frames:
        raise ValueError("gif: no image blocks")
    return frames


def render_gif(blob: bytes) -> list[np.ndarray]:
    """Render EVERY frame of a (possibly animated) GIF89a to RGB
    ``(h, w, 3)`` uint8 arrays with full animation semantics — the path a
    delta-frame animation from a third-party encoder needs (the engine's
    own writers emit full-canvas blocks, which ``decode_gif`` already
    handles; this closes the compositing limitation documented on
    ``decode_gif_indexed`` in round 6).

    Interpreted per the GIF89a spec (public, CompuServe/W3C):

    - graphic-control extensions (0x21 0xF9): the transparency flag +
      index and the disposal method, each applying to the single image
      block that follows;
    - transparency: pixels whose palette INDEX equals the transparent
      index leave the accumulated canvas untouched;
    - disposal 0/1 (unspecified / do not dispose): the drawn block stays;
    - disposal 2 (restore to background): after the frame is shown, its
      RECTANGLE reverts to the logical-screen background color (the GCT
      entry named by the LSD background byte; black when there is no GCT
      or the index is out of range). This render is RGB with no alpha, so
      the background is a COLOR — renderers that model it as transparent
      differ on GIFs that rely on canvas transparency, and that class is
      documented out of scope;
    - disposal 3 (restore to previous): the canvas reverts to its state
      before the block was drawn;
    - each block composites at its (left, top) offset and uses its local
      color table when present, falling back to the global one.

    Parity target: reference handlers/image.py:95-138 (PIL seek(n) +
    RGB conversion). Raises ValueError on structurally corrupt payloads,
    same contract as the other decode entry points.
    """
    b = bytes(blob)
    w, h, gct, pos = _header(b)
    n = len(b)
    if gct is not None and b[11] < len(gct):
        bg_rgb = gct[b[11]].copy()
    else:
        bg_rgb = np.zeros(3, dtype=np.uint8)
    canvas = np.empty((h, w, 3), dtype=np.uint8)
    canvas[:] = bg_rgb
    frames: list[np.ndarray] = []
    # disposal state carried from the PREVIOUS image block
    prev_rect: tuple[int, int, int, int] | None = None
    prev_disposal = 0
    prev_snapshot: np.ndarray | None = None
    gce: tuple[int, int | None] | None = None  # (disposal, transparent idx)
    while pos < n:
        marker = b[pos]
        pos += 1
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension
            if pos >= n:
                raise ValueError("gif: truncated extension")
            label = b[pos]
            if label == 0xF9:  # graphic control: applies to the NEXT block
                data, pos = _read_subblocks(b, pos + 1)
                if len(data) < 4:
                    raise ValueError("gif: short graphic control block")
                packed = data[0]
                disposal = (packed >> 2) & 0x07
                trans = int(data[3]) if (packed & 0x01) else None
                gce = (disposal, trans)
            else:
                pos = _skip_subblocks(b, pos + 1)
            continue
        if marker != 0x2C:
            raise ValueError(f"gif: unknown block marker 0x{marker:02x}")
        if pos + 9 > n:
            raise ValueError("gif: truncated image descriptor")
        left, top, iw, ih = struct.unpack_from("<HHHH", b, pos)
        ipacked = b[pos + 8]
        pos += 9
        palette = gct
        if ipacked & 0x80:
            n_colors = 2 << (ipacked & 0x07)
            end = pos + 3 * n_colors
            if end > n:
                raise ValueError("gif: local color table overruns payload")
            palette = (
                np.frombuffer(b, dtype=np.uint8, count=3 * n_colors, offset=pos)
                .reshape(n_colors, 3)
                .copy()
            )
            pos = end
        if palette is None:
            raise ValueError("gif: image has neither local nor global palette")
        if iw == 0 or ih == 0 or iw * ih > 64 * 1024 * 1024:
            raise ValueError(f"gif: unreasonable image dims {iw}x{ih}")
        if left + iw > w or top + ih > h:
            raise ValueError("gif: image block overruns logical screen")
        if pos >= n:
            raise ValueError("gif: truncated image block")
        mcs = b[pos]
        data, pos = _read_subblocks(b, pos + 1)
        idx = np.frombuffer(
            _lzw_decode(data, mcs, iw * ih), dtype=np.uint8
        ).reshape(ih, iw)
        if idx.size and int(idx.max()) >= len(palette):
            raise ValueError("gif: pixel index beyond palette")
        if ipacked & 0x40:
            idx = _deinterlace(idx)
        # dispose of the PREVIOUS block's region before drawing this one
        if prev_rect is not None:
            pl, pt, pw, ph = prev_rect
            if prev_disposal == 2:
                canvas[pt : pt + ph, pl : pl + pw] = bg_rgb
            elif prev_disposal == 3 and prev_snapshot is not None:
                canvas = prev_snapshot
        disposal, trans = gce if gce is not None else (0, None)
        snapshot = canvas.copy() if disposal == 3 else None
        region = canvas[top : top + ih, left : left + iw]
        rgb = palette[idx]
        if trans is not None:
            opaque = idx != trans
            region[opaque] = rgb[opaque]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        prev_rect = (left, top, iw, ih)
        prev_disposal = disposal
        prev_snapshot = snapshot
        gce = None  # a GCE governs exactly one following image block
    if not frames:
        raise ValueError("gif: no image blocks")
    return frames


def decode_gif(blob: bytes) -> np.ndarray:
    """First frame as pixels: grayscale (h, w) when every referenced palette
    entry is achromatic (r == g == b), else RGB (h, w, 3) — mirroring
    decode_jpeg's 2-D/3-D convention."""
    idx, palette = decode_gif_indexed(blob)
    used = palette[: int(idx.max()) + 1] if idx.size else palette[:1]
    if (used[:, 0] == used[:, 1]).all() and (used[:, 1] == used[:, 2]).all():
        return palette[idx, 0]
    return palette[idx]


# --------------------------------------------------------------------------
# encode
# --------------------------------------------------------------------------
def encode_gif_indexed(
    frames: np.ndarray | list[np.ndarray],
    palette: np.ndarray,
    interlace: bool = False,
) -> bytes:
    """Palette-indexed GIF87a. ``frames`` is one (h, w) uint8 index array or
    a list of same-shaped arrays (multi-image file — the pre-89a "animation"
    form; gif_meta counts them as n_frames). Lossless: decode returns the
    index array bit-exactly."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    if not frames:
        raise ValueError("gif: need at least one frame")
    first = np.ascontiguousarray(frames[0], dtype=np.uint8)
    h, w = first.shape
    # GCT size field stores 2^(f+1) entries — _pack_palette pads up
    gct_bytes, f, n_colors = _pack_palette(palette)
    out = bytearray(b"GIF87a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | 0x70 | f)  # GCT present, 8-bit color resolution
    out += b"\x00\x00"  # background index, aspect ratio
    out += gct_bytes
    mcs = max(f + 1, 2)  # LZW min code size >= 2 per the spec
    for frame in frames:
        frame = np.ascontiguousarray(frame, dtype=np.uint8)
        if frame.shape != (h, w):
            raise ValueError("gif: all frames must share the first frame's shape")
        if frame.size and int(frame.max()) >= n_colors:
            raise ValueError("gif: frame index beyond palette")
        out.append(0x2C)
        out += struct.pack("<HHHH", 0, 0, w, h)
        out.append(0x40 if interlace else 0x00)
        rows = frame
        if interlace:
            order = [r for first_, step in _INTERLACE for r in range(first_, h, step)]
            rows = frame[order]
        out.append(mcs)
        data = _lzw_encode(rows.tobytes(), mcs)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def _pack_palette(palette: np.ndarray) -> tuple[bytes, int, int]:
    """Pad a (2..256, 3) palette to a power-of-two GIF color table.

    Returns (table bytes, size field f with 2^(f+1) stored entries,
    number of REAL entries)."""
    palette = np.ascontiguousarray(palette, dtype=np.uint8).reshape(-1, 3)
    n_colors = len(palette)
    if not (2 <= n_colors <= 256):
        raise ValueError("gif: palette must have 2..256 entries")
    f = max((n_colors - 1).bit_length() - 1, 0)
    stored = 2 << f
    pal = np.zeros((stored, 3), dtype=np.uint8)
    pal[:n_colors] = palette
    return pal.tobytes(), f, n_colors


def encode_gif_anim(
    blocks: list[dict],
    palette: np.ndarray,
    size: tuple[int, int] | None = None,
    bg_index: int = 0,
) -> bytes:
    """GIF89a animation encoder — the wire-byte twin of ``render_gif``.

    ``blocks`` is a list of dicts, one per frame, each drawing an index
    array at an offset on the logical screen (delta-frame form):

    - ``idx``: (ih, iw) uint8 palette-index array (required);
    - ``left``/``top``: block offset on the logical screen (default 0);
    - ``disposal``: GIF89a disposal method 0..3 (default 0);
    - ``transparent``: palette index drawn as see-through, or None;
    - ``delay_cs``: frame delay in centiseconds (default 0);
    - ``interlace``: 4-pass row interlace for this block (default False);
    - ``palette``: a LOCAL color table for this block, or None for the
      global ``palette``.

    Every block gets a graphic-control extension so decode state is
    explicit on the wire. ``size`` is the logical screen (w, h); default
    is the tightest screen containing every block. ``bg_index`` is the
    LSD background byte — what ``render_gif``'s disposal-2 restores to.
    Lossless by construction: rendering the result reproduces exactly
    the compositing arithmetic the blocks describe."""
    if not blocks:
        raise ValueError("gif: need at least one block")
    gct_bytes, f, n_global = _pack_palette(palette)
    prepped = []
    for blk in blocks:
        idx = np.ascontiguousarray(blk["idx"], dtype=np.uint8)
        if idx.ndim != 2:
            raise ValueError("gif: block idx must be 2-D")
        left, top = int(blk.get("left", 0)), int(blk.get("top", 0))
        if left < 0 or top < 0:
            raise ValueError("gif: block offsets must be non-negative")
        disposal = int(blk.get("disposal", 0))
        if not (0 <= disposal <= 3):
            raise ValueError(f"gif: disposal method {disposal} out of range")
        trans = blk.get("transparent")
        lpal = blk.get("palette")
        lpal_bytes = lf = None
        n_colors = n_global
        if lpal is not None:
            lpal_bytes, lf, n_colors = _pack_palette(lpal)
        # render_gif accepts indices up to the STORED (power-of-two padded)
        # table size; a transparent filler may use a padded slot, but never
        # one past it, or the encoder would emit payloads its own renderer
        # rejects
        stored = 2 << (lf if lf is not None else f)
        if trans is not None and not (0 <= int(trans) < stored):
            raise ValueError("gif: transparent index beyond the stored color table")
        limit = max(n_colors, (int(trans) + 1) if trans is not None else 0)
        if idx.size and int(idx.max()) >= limit:
            raise ValueError("gif: block index beyond palette")
        prepped.append(
            (idx, left, top, disposal, trans, int(blk.get("delay_cs", 0)),
             bool(blk.get("interlace", False)), lpal_bytes, lf, n_colors)
        )
    if size is None:
        w = max(left + idx.shape[1] for idx, left, *_ in prepped)
        h = max(top + idx.shape[0] for idx, _l, top, *_ in prepped)
    else:
        w, h = size
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | 0x70 | f)
    out.append(bg_index & 0xFF)
    out.append(0x00)  # aspect ratio
    out += gct_bytes
    for idx, left, top, disposal, trans, delay, interlace, lpal_bytes, lf, nc in prepped:
        ih, iw = idx.shape
        if left + iw > w or top + ih > h:
            raise ValueError("gif: block overruns the logical screen")
        packed = (disposal << 2) | (0x01 if trans is not None else 0x00)
        out += bytes((0x21, 0xF9, 0x04, packed))
        out += struct.pack("<H", delay)
        out.append(int(trans) & 0xFF if trans is not None else 0)
        out.append(0x00)
        out.append(0x2C)
        out += struct.pack("<HHHH", left, top, iw, ih)
        ipacked = 0x40 if interlace else 0x00
        if lpal_bytes is not None:
            ipacked |= 0x80 | lf
        out.append(ipacked)
        if lpal_bytes is not None:
            out += lpal_bytes
        rows = idx
        if interlace:
            order = [r for first_, step in _INTERLACE for r in range(first_, ih, step)]
            rows = idx[order]
        # LZW min code size must cover every emitted index (incl. the
        # transparent filler), >= 2 per the spec
        top_idx = int(rows.max()) if rows.size else 0
        mcs = max(top_idx.bit_length(), 2)
        out.append(mcs)
        data = _lzw_encode(rows.tobytes(), mcs)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


_GRAY_RAMP = np.repeat(np.arange(256, dtype=np.uint8), 3).reshape(256, 3)


def encode_gif_gray(
    frames: np.ndarray | list[np.ndarray], interlace: bool = False
) -> bytes:
    """Grayscale GIF: the 256-entry gray ramp palette makes index == pixel
    value, so encode -> decode_gif is EXACT."""
    return encode_gif_indexed(frames, _GRAY_RAMP, interlace=interlace)


def resize_nearest_indexed(idx: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize of an INDEX array — palette-preserving (a box
    filter would average indices, which is meaningless for palette images);
    the GIF thumbnail path re-encodes the result against the source palette."""
    idx = np.asarray(idx, dtype=np.uint8)
    h, w = idx.shape
    rows = np.minimum((np.arange(out_h) + 0.5) * h / out_h, h - 1).astype(np.int64)
    cols = np.minimum((np.arange(out_w) + 0.5) * w / out_w, w - 1).astype(np.int64)
    return idx[rows][:, cols]


def gif_thumbnail(blob: bytes, max_w: int = 128, max_h: int = 128) -> bytes:
    """Format-preserving GIF thumbnail: decode indices, nearest-neighbor
    shrink (aspect-preserving, never upscale), re-encode against the SAME
    palette — every output color exists in the source image."""
    idx, palette = decode_gif_indexed(blob)
    h, w = idx.shape
    scale = min(max_w / w, max_h / h, 1.0)
    ow, oh = max(int(w * scale), 1), max(int(h * scale), 1)
    return encode_gif_indexed(resize_nearest_indexed(idx, ow, oh), palette)
