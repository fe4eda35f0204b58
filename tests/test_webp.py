"""WebP-lossless (VP8L) codec: roundtrips, transforms, container, scope.

Lossless by construction, so every encode -> decode assertion is EXACT
equality, same contract as the sibling GIF/PNG/TIFF tests. The
predictor / color-transform / meta-prefix decoder paths (which the
encoder does not emit) are exercised by hand-assembled streams built
with the module's own bit writer.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from landlensdb_spark.operators.webp import (
    _GREEN_BASE,
    _BitReader,
    _BitWriter,
    _lz77_prefix,
    _read_lz77_value,
    _reverse_bits,
    _write_prefix_code,
    decode_webp,
    encode_webp,
    webp_dims,
    webp_thumbnail,
)


def _rand_rgba(h, w, seed, n_colors=None):
    rng = np.random.default_rng(seed)
    if n_colors:
        pal = rng.integers(0, 256, (n_colors, 4), dtype=np.uint8)
        pal[:, 3] = 255
        return pal[rng.integers(0, n_colors, (h, w))]
    img = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    img[:, :, 3] = 255
    return img


def test_lz77_prefix_is_exact_inverse():
    for v in list(range(1, 300)) + [1000, 4096, 100000, (1 << 20)]:
        code, eb, extra = _lz77_prefix(v)
        bw = _BitWriter()
        bw.write(extra, eb)
        br = _BitReader(bw.finish() or b"\x00")
        assert _read_lz77_value(br, code) == v, v


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_roundtrip_random_rgba(seed):
    img = _rand_rgba(13, 17, seed)
    assert (decode_webp(encode_webp(img)) == img).all()


def test_roundtrip_rgb_input_gets_opaque_alpha():
    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    out = decode_webp(encode_webp(rgb))
    assert (out[:, :, :3] == rgb).all() and (out[:, :, 3] == 255).all()


def test_roundtrip_gray_2d_input():
    g = np.arange(64, dtype=np.uint8).reshape(8, 8)
    out = decode_webp(encode_webp(g))
    assert (out[:, :, 0] == g).all() and (out[:, :, 1] == g).all()


def test_roundtrip_with_alpha():
    img = _rand_rgba(6, 6, 11)
    img[2:4, 2:4, 3] = 17
    assert (decode_webp(encode_webp(img)) == img).all()


@pytest.mark.parametrize("n_colors", [2, 3, 4, 9, 16, 17, 200])
def test_roundtrip_palette_all_bundlings(n_colors):
    # <=2 -> 8px/byte, <=4 -> 4px, <=16 -> 2px, else unbundled
    img = _rand_rgba(10, 23, n_colors, n_colors=n_colors)
    blob = encode_webp(img, use_palette=True)
    assert (decode_webp(blob) == img).all()


def test_roundtrip_palette_width_not_multiple_of_bundle():
    img = _rand_rgba(5, 13, 3, n_colors=2)  # 13 cols, 8-px bundles
    assert (decode_webp(encode_webp(img, use_palette=True)) == img).all()


def test_roundtrip_subtract_green():
    img = _rand_rgba(8, 8, 21)
    blob = encode_webp(img, use_palette=False, subtract_green=True)
    assert (decode_webp(blob) == img).all()


@pytest.mark.parametrize("cache_bits", [1, 4, 8])
def test_roundtrip_color_cache(cache_bits):
    img = _rand_rgba(12, 12, 5, n_colors=6)
    blob = encode_webp(img, use_palette=False, cache_bits=cache_bits)
    assert (decode_webp(blob) == img).all()


def test_roundtrip_lz77_runs():
    from landlensdb_spark.operators.webp import _tokenize

    rng = np.random.default_rng(3)
    tile = rng.integers(0, 256, (1, 4, 4), dtype=np.uint8)
    img = np.tile(tile, (12, 8, 1))  # periodic -> real backward references
    tokens = _tokenize(img.reshape(-1, 4), cache_bits=0, lz77=True)
    assert any(t[0] == "copy" for t in tokens)  # the copy path IS exercised
    blob_rle = encode_webp(img, use_palette=False, lz77=True)
    blob_lit = encode_webp(img, use_palette=False, lz77=False)
    assert (decode_webp(blob_rle) == img).all()
    assert (decode_webp(blob_lit) == img).all()


def test_roundtrip_single_color_and_1x1():
    one = np.full((1, 1, 4), 9, dtype=np.uint8)
    assert (decode_webp(encode_webp(one)) == one).all()
    flat = np.full((20, 30, 4), 77, dtype=np.uint8)
    assert (decode_webp(encode_webp(flat)) == flat).all()


def test_dims_and_container():
    img = _rand_rgba(21, 34, 3)
    blob = encode_webp(img)
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WEBP"
    (riff_size,) = struct.unpack_from("<I", blob, 4)
    assert riff_size == len(blob) - 8
    assert webp_dims(blob) == (34, 21)
    assert webp_dims(b"not a webp") is None
    assert webp_dims(blob[:10]) is None


def test_chunk_walking_skips_leading_chunks():
    img = _rand_rgba(4, 5, 8)
    blob = encode_webp(img)
    vp8l = blob[12:]
    fake_meta = b"META" + struct.pack("<I", 3) + b"abc\x00"  # padded odd chunk
    wrapped_body = b"WEBP" + fake_meta + vp8l
    wrapped = b"RIFF" + struct.pack("<I", len(wrapped_body)) + wrapped_body
    assert (decode_webp(wrapped) == decode_webp(blob)).all()


def test_corruption_raises():
    img = _rand_rgba(6, 6, 4)
    blob = bytearray(encode_webp(img))
    with pytest.raises(ValueError):
        decode_webp(bytes(blob[:-8]) )  # truncated stream
    bad = bytearray(blob)
    bad[20] ^= 0xFF  # clobber the VP8L signature byte region / header
    with pytest.raises(ValueError):
        decode_webp(bytes(bad[:12]))


def test_thumbnail_shrinks_and_roundtrips():
    img = _rand_rgba(64, 48, 31, n_colors=5)
    th = webp_thumbnail(encode_webp(img), 16, 16)
    assert webp_dims(th) == (12, 16)
    out = decode_webp(th)
    assert out.shape == (16, 12, 4)


# ---------------------------------------------------------------------------
# hand-assembled streams for decoder-only paths
# ---------------------------------------------------------------------------
def _container(stream_bits: _BitWriter) -> bytes:
    stream = b"\x2f" + stream_bits.finish()
    chunk = b"VP8L" + struct.pack("<I", len(stream)) + stream
    if len(stream) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _write_header(bw: _BitWriter, w: int, h: int):
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version


def _write_literal_image(bw: _BitWriter, img: np.ndarray, allow_meta=True):
    """Single-group all-literal entropy image via the encoder's writer."""
    from landlensdb_spark.operators import webp as W

    W._encode_image_entropy(bw, img, cache_bits=0, lz77=False,
                            allow_meta=allow_meta)


def test_hand_built_predictor_transform_mode_left():
    # 4x2 image, predictor transform with one block (bits=3 -> 8x8 blocks),
    # predictor mode 1 (left) everywhere. Residuals chosen so the final
    # pixels are a known ramp.
    w, h = 4, 2
    bw = _BitWriter()
    _write_header(bw, w, h)
    bw.write(1, 1)  # a transform
    bw.write(0, 2)  # predictor
    bw.write(1, 3)  # size_bits - 2 = 1 -> bits = 3
    pred = np.zeros((1, 1, 4), dtype=np.uint8)
    pred[0, 0, 1] = 1  # mode in GREEN channel
    _write_literal_image(bw, pred, allow_meta=False)
    bw.write(0, 1)  # no more transforms
    # residuals: first pixel predicted by BLACK (0,0,0,255)
    res = np.zeros((h, w, 4), dtype=np.uint8)
    res[0, 0] = (10, 20, 30, 0)  # -> pixel (10, 20, 30, 255)
    res[0, 1] = (1, 1, 1, 0)     # left + 1
    res[0, 2] = (1, 1, 1, 0)
    res[0, 3] = (1, 1, 1, 0)
    res[1, 0] = (0, 0, 0, 0)     # top (left column uses T)
    res[1, 1] = (2, 2, 2, 0)
    res[1, 2] = (2, 2, 2, 0)
    res[1, 3] = (2, 2, 2, 0)
    _write_literal_image(bw, res)
    out = decode_webp(_container(bw))
    expect = np.zeros((h, w, 4), dtype=np.int64)
    expect[0] = [(10, 20, 30, 255), (11, 21, 31, 255), (12, 22, 32, 255),
                 (13, 23, 33, 255)]
    expect[1] = [(10, 20, 30, 255), (12, 22, 32, 255), (14, 24, 34, 255),
                 (16, 26, 36, 255)]
    assert (out == expect).all()


def test_hand_built_color_transform_identity_and_delta():
    # one ct block: green_to_red = 64 (i.e. +g*64>>5 = +2g), others 0
    w, h = 2, 1
    bw = _BitWriter()
    _write_header(bw, w, h)
    bw.write(1, 1)
    bw.write(1, 2)  # color transform
    bw.write(1, 3)  # bits = 3
    ct = np.zeros((1, 1, 4), dtype=np.uint8)
    ct[0, 0, 2] = 64  # green_to_red rides the BLUE channel
    _write_literal_image(bw, ct, allow_meta=False)
    bw.write(0, 1)
    img = np.zeros((h, w, 4), dtype=np.uint8)
    img[0, 0] = (10, 3, 7, 255)   # r' = 10 + ((64-0)*3)>>5 = 10 + 6
    img[0, 1] = (100, 16, 0, 255)  # r' = 100 + (64*16)>>5 = 132
    _write_literal_image(bw, img)
    out = decode_webp(_container(bw))
    assert tuple(out[0, 0]) == (16, 3, 7, 255)
    assert tuple(out[0, 1]) == (132, 16, 0, 255)


def test_hand_built_meta_prefix_two_groups():
    # 2 blocks side by side (bits=2 -> 4px blocks, image 8x1): group 0
    # decodes literals normally; group 1's codes force green=200.
    from landlensdb_spark.operators import webp as W

    w, h = 8, 1
    bw = _BitWriter()
    _write_header(bw, w, h)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # meta-prefix image present
    bw.write(0, 3)  # meta bits - 2 = 0 -> 4px blocks
    meta = np.zeros((1, 2, 4), dtype=np.uint8)
    meta[0, 0, 1] = 0  # group 0 (red<<8 | green)
    meta[0, 1, 1] = 1  # group 1
    _write_literal_image(bw, meta, allow_meta=False)
    bw.write(0, 1)  # no color cache
    # group 0: green/red/blue/alpha all single-symbol codes (g=5 r=6 b=7 a=255)
    for sym in (5, 6, 7, 255):
        codes = _write_prefix_code(bw, _single_len(sym, 256 if sym != 5 else _GREEN_BASE))
    _write_single_dist(bw)
    # group 1: g=200 r=1 b=2 a=255
    for sym, size in ((200, _GREEN_BASE), (1, 256), (2, 256), (255, 256)):
        _write_prefix_code(bw, _single_len(sym, size))
    _write_single_dist(bw)
    # all symbols are single -> zero data bits needed for 8 pixels
    out = decode_webp(_container(bw))
    assert (out[0, :4] == (6, 5, 7, 255)).all()
    assert (out[0, 4:] == (1, 200, 2, 255)).all()


def _single_len(sym, size):
    lengths = [0] * size
    lengths[sym] = 1
    return lengths


def _write_single_dist(bw):
    _write_prefix_code(bw, _single_len(0, 40))


def test_reverse_bits():
    assert _reverse_bits(0b110, 3) == 0b011
    assert _reverse_bits(0b1, 1) == 0b1
    assert _reverse_bits(0b10000000, 8) == 0b00000001


def test_multimodal_dispatch_covers_webp():
    from landlensdb_spark.operators.multimodal import (
        _default_thumbnail,
        default_decode,
        phash64,
    )

    img = _rand_rgba(40, 30, 13, n_colors=7)
    blob = encode_webp(img)
    assert default_decode(blob) == (30, 40, 1, "webp", True)
    th = _default_thumbnail(blob, 8, 8)
    assert webp_dims(th) == (6, 8)
    # pHash path: decodable -> non-null, and stable across re-encode
    from landlensdb_spark.operators.jpeg import rgb_luma

    h1 = phash64(rgb_luma(decode_webp(blob)[:, :, :3]))
    h2 = phash64(rgb_luma(decode_webp(encode_webp(img, use_palette=False))[:, :, :3]))
    assert h1 == h2
