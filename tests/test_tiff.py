"""Baseline TIFF 6.0 codec: LZW/PackBits round-trips, IFD walk, wiring.

8-bit sample storage is lossless under all in-scope compressions, so every
encode -> decode assertion is EXACT equality — the tiff_roundtrip oracle's
contract.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from landlensdb_spark.operators.tiff import (
    _lzw_decode,
    _lzw_encode,
    _packbits_decode,
    decode_tiff,
    encode_tiff_gray,
    encode_tiff_rgb,
    tiff_dims,
    tiff_meta,
    tiff_thumbnail,
)


def _rand_gray(h, w, seed):
    return np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)


def _rand_rgb(h, w, seed):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("compress", [False, True])
def test_gray_roundtrip_exact(compress):
    img = _rand_gray(150, 90, 1)  # >64 rows: multiple strips
    blob = encode_tiff_gray(img, compress=compress)
    out = decode_tiff(blob)
    assert out.ndim == 2 and (out == img).all()
    assert tiff_dims(blob) == (90, 150)
    assert tiff_meta(blob) == (90, 150, 1)


@pytest.mark.parametrize("compress", [False, True])
def test_rgb_roundtrip_exact(compress):
    img = _rand_rgb(70, 41, 2)
    out = decode_tiff(encode_tiff_rgb(img, compress=compress))
    assert out.ndim == 3 and (out == img).all()


def test_multipage_meta_and_first_page():
    pages = [_rand_gray(30, 20, s) for s in range(5)]
    blob = encode_tiff_gray(pages)
    assert tiff_meta(blob) == (20, 30, 5)
    assert (decode_tiff(blob) == pages[0]).all()


def test_lzw_table_pressure_roundtrip():
    # 500x500 noise fills the 12-bit LZW table several times over,
    # exercising every width step (9->12) and the mid-stream clear/reset
    img = _rand_gray(500, 500, 42)
    assert (decode_tiff(encode_tiff_gray(img)) == img).all()


def test_lzw_stream_primitives():
    rng = np.random.default_rng(7)
    for n in (1, 2, 100, 5000, 70000):
        raw = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert _lzw_decode(_lzw_encode(raw), n) == raw
    runs = b"\x00" * 9000 + b"\x07" * 9000  # highly compressible
    enc = _lzw_encode(runs)
    assert len(enc) < len(runs) // 4
    assert _lzw_decode(enc, len(runs)) == runs


def test_packbits_decode():
    # 3 literals, a 5-run, a no-op, 2 literals
    data = bytes([2, 10, 11, 12, 257 - 5 & 0xFF, 9, 128, 1, 1, 2])
    assert _packbits_decode(data, 10) == bytes([10, 11, 12, 9, 9, 9, 9, 9, 1, 2])
    with pytest.raises(ValueError):
        _packbits_decode(data, 11)


def test_packbits_tiff_decode_path():
    # hand-assemble a PackBits-compressed TIFF: patch the encoder's output
    # is simpler than writing a second encoder — build a tiny one-strip
    # uncompressed file, then rewrite its strip + compression tag
    img = np.tile(np.arange(8, dtype=np.uint8), (4, 1))  # 4x8, rows repeat
    blob = bytearray(encode_tiff_gray(img, compress=False))
    raw = img.tobytes()
    packed = bytes([len(raw) - 1]) + raw  # one literal run (lazy but valid)
    # strip data starts at offset 8 in the encoder's layout
    assert blob[8 : 8 + len(raw)] == raw
    new = bytearray(blob[:8]) + packed + blob[8 + len(raw) :]
    delta = len(packed) - len(raw)
    bo = "<"
    (ifd_off,) = struct.unpack_from(bo + "I", new, 4)
    ifd_off += delta
    struct.pack_into(bo + "I", new, 4, ifd_off)
    (count,) = struct.unpack_from(bo + "H", new, ifd_off)
    for i in range(count):
        pos = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(bo + "HHI", new, pos)
        if tag == 259:  # Compression -> PackBits
            struct.pack_into(bo + "HH", new, pos + 8, 32773, 0)
        elif tag == 279:  # StripByteCounts (inline, single strip)
            struct.pack_into(bo + "I", new, pos + 8, len(packed))
    out = decode_tiff(bytes(new))
    assert (out == img).all()


def test_scope_and_corruption():
    assert tiff_dims(b"not a tiff at all") is None
    assert tiff_meta(b"\x89PNG\r\n\x1a\n" + b"\x00" * 8) is None
    ok = encode_tiff_gray(_rand_gray(10, 10, 3))
    with pytest.raises(ValueError):
        tiff_meta(ok[:40])  # IFD truncated away
    with pytest.raises(ValueError):
        decode_tiff(b"II\x2a\x00\xff\xff\xff\xff")  # IFD beyond payload
    with pytest.raises(ValueError):
        encode_tiff_gray(_rand_rgb(4, 4, 1))  # rgb array into the gray api
    with pytest.raises(ValueError):
        encode_tiff_rgb(_rand_gray(4, 4, 1))


def test_big_endian_decode():
    # byte-swap the encoder's little-endian output structurally: simplest
    # honest check is a hand-built MM file with one uncompressed strip
    img = _rand_gray(6, 5, 9)
    raw = img.tobytes()
    out = bytearray(b"MM\x00\x2a")
    out += struct.pack(">I", 8 + len(raw))  # IFD after the strip
    out += raw
    entries = [
        (256, 4, 1, 5), (257, 4, 1, 6), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 1), (273, 4, 1, 8), (277, 3, 1, 1), (278, 4, 1, 6),
        (279, 4, 1, len(raw)), (284, 3, 1, 1),
    ]
    out += struct.pack(">H", len(entries))
    for tag, typ, cnt, val in entries:
        out += struct.pack(">HHI", tag, typ, cnt)
        out += struct.pack(">I", val) if typ == 4 else struct.pack(">HH", val, 0)
    out += b"\x00\x00\x00\x00"
    assert tiff_meta(bytes(out)) == (5, 6, 1)
    assert (decode_tiff(bytes(out)) == img).all()


def test_white_is_zero_inversion():
    img = _rand_gray(6, 5, 11)
    blob = bytearray(encode_tiff_gray(img, compress=False))
    (ifd_off,) = struct.unpack_from("<I", blob, 4)
    (count,) = struct.unpack_from("<H", blob, ifd_off)
    for i in range(count):
        pos = ifd_off + 2 + 12 * i
        tag = struct.unpack_from("<H", blob, pos)[0]
        if tag == 262:  # Photometric -> WhiteIsZero
            struct.pack_into("<HH", blob, pos + 8, 0, 0)
    assert (decode_tiff(bytes(blob)) == 255 - img).all()


def test_thumbnail_and_dispatch():
    from landlensdb_spark.operators.multimodal import _default_thumbnail, default_decode

    img = _rand_rgb(120, 90, 5)
    blob = encode_tiff_rgb(img)
    assert default_decode(blob) == (90, 120, 1, "tiff", True)
    assert default_decode(blob[:40]) == (0, 0, 0, "tiff", False)
    thumb = _default_thumbnail(blob, 32, 32)
    assert thumb[:4] == b"II\x2a\x00" and tiff_dims(thumb) == (24, 32)
    assert decode_tiff(thumb).ndim == 3
    # never upscales; gray stays gray
    gt = tiff_thumbnail(encode_tiff_gray(_rand_gray(20, 10, 6)), 64, 64)
    assert tiff_dims(gt) == (10, 20) and decode_tiff(gt).ndim == 2


def test_zero_count_ifd_entry_degrades_not_crashes():
    from landlensdb_spark.operators.multimodal import default_decode

    # hostile payload: valid signature, IFD whose entries carry count=0 —
    # must degrade to ('tiff', ok=False), never an IndexError out of the
    # Arrow stage
    blob = bytearray(b"II\x2a\x00")
    blob += struct.pack("<I", 8)
    blob += struct.pack("<H", 2)
    for tag in (256, 257):
        blob += struct.pack("<HHI", tag, 3, 0) + b"\x00\x00\x00\x00"
    blob += b"\x00\x00\x00\x00"
    assert default_decode(bytes(blob)) == (0, 0, 0, "tiff", False)


def test_rgb_bits_per_sample_is_short_per_spec():
    blob = encode_tiff_rgb(_rand_rgb(5, 4, 13))
    (ifd_off,) = struct.unpack_from("<I", blob, 4)
    (count,) = struct.unpack_from("<H", blob, ifd_off)
    seen = {}
    for i in range(count):
        tag, typ, cnt, val = struct.unpack_from("<HHII", blob, ifd_off + 2 + 12 * i)
        seen[tag] = (typ, cnt, val)
    typ, cnt, off = seen[258]
    assert (typ, cnt) == (3, 3)  # SHORT x3 per the TIFF 6.0 type table
    assert struct.unpack_from("<3H", blob, off) == (8, 8, 8)
