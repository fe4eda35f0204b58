"""GIF87a/89a codec: LZW round-trips, interlace, multi-image, scope, wiring.

Palette-indexed storage is lossless, so every encode -> decode assertion is
EXACT equality — the same contract the gif_roundtrip oracle leans on.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from landlensdb_spark.operators.gif import (
    _INTERLACE,
    _lzw_encode,
    decode_gif,
    decode_gif_indexed,
    encode_gif_gray,
    encode_gif_indexed,
    gif_dims,
    gif_meta,
    gif_thumbnail,
    resize_nearest_indexed,
)


def _rand_idx(h, w, n_colors, seed):
    return np.random.default_rng(seed).integers(0, n_colors, (h, w), dtype=np.uint8)


def _rand_palette(n_colors, seed):
    return np.random.default_rng(seed + 1).integers(0, 256, (n_colors, 3), dtype=np.uint8)


@pytest.mark.parametrize("n_colors", [2, 3, 7, 16, 100, 256])
def test_indexed_roundtrip_exact(n_colors):
    idx = _rand_idx(37, 53, n_colors, n_colors)
    pal = _rand_palette(n_colors, n_colors)
    blob = encode_gif_indexed(idx, pal)
    out, out_pal = decode_gif_indexed(blob)
    assert (out == idx).all()
    assert (out_pal[:n_colors] == pal).all()
    assert gif_dims(blob) == (53, 37)
    assert gif_meta(blob) == (53, 37, 1)


def test_interlaced_roundtrip_exact():
    # a row-index image makes any interlace reorder bug visible
    idx = (np.arange(29, dtype=np.uint8)[:, None] * np.ones((1, 31), dtype=np.uint8)) % 16
    pal = _rand_palette(16, 5)
    blob = encode_gif_indexed(idx, pal, interlace=True)
    out, _ = decode_gif_indexed(blob)
    assert (out == idx).all()
    # the interlace row order itself must be a permutation of all rows
    order = [r for first, step in _INTERLACE for r in range(first, 29, step)]
    assert sorted(order) == list(range(29))


def test_multi_image_meta_and_first_frame():
    frames = [_rand_idx(12, 18, 64, s) for s in range(4)]
    blob = encode_gif_indexed(frames, _rand_palette(64, 9))
    assert gif_meta(blob) == (18, 12, 4)
    out, _ = decode_gif_indexed(blob)
    assert (out == frames[0]).all()


def test_gray_ramp_exact_and_2d():
    img = _rand_idx(40, 25, 256, 3)
    blob = encode_gif_gray(img)
    out = decode_gif(blob)
    assert out.ndim == 2 and (out == img).all()


def test_color_decode_is_3d_palette_lookup():
    idx = _rand_idx(10, 11, 5, 7)
    pal = np.array(
        [[10, 20, 30], [5, 5, 5], [200, 0, 0], [0, 200, 0], [9, 9, 9]], np.uint8
    )
    out = decode_gif(encode_gif_indexed(idx, pal))
    assert out.ndim == 3 and (out == pal[idx]).all()


def test_lzw_table_cap_freeze_roundtrip():
    # 300x300 of 256-color noise pushes the LZW table past the 4096-entry
    # cap, exercising width growth 9->12 bits and the frozen-table tail on
    # both encoder and decoder
    img = _rand_idx(300, 300, 256, 42)
    out = decode_gif(encode_gif_gray(img))
    assert (out == img).all()


def test_local_color_table_decode():
    # hand-build a GIF with NO global table and a local one on the image
    # descriptor (the encoder always writes a GCT, so construct the wire
    # form manually to cover the LCT path)
    idx = _rand_idx(6, 7, 4, 11)
    pal = _rand_palette(4, 11)
    data = _lzw_encode(idx.tobytes(), 2)
    blob = bytearray(b"GIF89a")
    blob += struct.pack("<HH", 7, 6)
    blob += b"\x00\x00\x00"  # no GCT
    blob.append(0x2C)
    blob += struct.pack("<HHHH", 0, 0, 7, 6)
    blob.append(0x80 | 0x01)  # LCT present, 4 entries
    blob += pal.tobytes()
    blob.append(2)  # LZW min code size
    blob.append(len(data))
    blob += data
    blob += b"\x00\x3b"
    out, out_pal = decode_gif_indexed(bytes(blob))
    assert (out == idx).all() and (out_pal == pal).all()


def test_scope_and_corruption():
    assert gif_dims(b"NOTAGIF" * 4) is None
    assert gif_meta(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16) is None
    ok = encode_gif_gray(_rand_idx(8, 8, 256, 1))
    with pytest.raises(ValueError):
        gif_meta(ok[:20])  # truncated mid-stream
    with pytest.raises(ValueError):
        decode_gif(ok[:6] + b"\x00" * 4)  # bad logical screen descriptor tail
    with pytest.raises(ValueError):
        encode_gif_indexed(np.zeros((4, 4), np.uint8), _rand_palette(300, 2))
    with pytest.raises(ValueError):
        # frame index beyond palette
        encode_gif_indexed(np.full((4, 4), 9, np.uint8), _rand_palette(4, 2))


def test_thumbnail_palette_preserving():
    idx = _rand_idx(120, 90, 33, 8)
    pal = _rand_palette(33, 8)
    blob = encode_gif_indexed(idx, pal)
    thumb = gif_thumbnail(blob, 32, 32)
    assert gif_dims(thumb) == (24, 32)  # aspect-preserving 90x120 -> 24x32
    tidx, tpal = decode_gif_indexed(thumb)
    assert (tpal[:33] == pal).all()
    assert (tidx == resize_nearest_indexed(idx, 24, 32)).all()
    # never upscales
    assert gif_dims(gif_thumbnail(blob, 4096, 4096)) == (90, 120)


def test_default_decode_and_thumbnail_dispatch():
    from landlensdb_spark.operators.multimodal import _default_thumbnail, default_decode

    frames = [_rand_idx(9, 14, 16, s) for s in range(3)]
    blob = encode_gif_indexed(frames, _rand_palette(16, 4))
    assert default_decode(blob) == (14, 9, 3, "gif", True)
    # GIF signature with corrupt framing: honest ok=False, never a crash
    assert default_decode(blob[:20]) == (0, 0, 0, "gif", False)
    thumb = _default_thumbnail(blob, 8, 8)
    assert thumb[:6] in (b"GIF87a", b"GIF89a") and gif_dims(thumb) == (8, 5)
    # the other codecs still route past the GIF branch
    from landlensdb_spark.operators.raster import encode_png_gray

    png = encode_png_gray(np.full((5, 6), 7, np.uint8))
    assert default_decode(png)[3] == "png"
    assert _default_thumbnail(png, 4, 4)[:8] == b"\x89PNG\r\n\x1a\n"


def test_gif_frames_standalone_decode():
    from landlensdb_spark.operators.gif import gif_frames

    frames = [_rand_idx(11, 13, 32, s) for s in range(5)]
    pal = _rand_palette(32, 21)
    blob = encode_gif_indexed(frames, pal, interlace=True)
    singles = gif_frames(blob)
    assert len(singles) == 5
    for single, src in zip(singles, frames):
        assert gif_meta(single) == (13, 11, 1)
        out, out_pal = decode_gif_indexed(single)
        assert (out == src).all() and (out_pal[:32] == pal).all()
    with pytest.raises(ValueError):
        gif_frames(b"not a gif")


def test_phash_covers_gif_and_tiff():
    from landlensdb_spark.operators.tiff import encode_tiff_rgb

    # module-private luma helpers live inside the Arrow stage; drive the
    # public phash64 on the decoded pixels and check cross-codec identity:
    # the SAME image through GIF (lossless gray) and TIFF (lossless rgb of
    # the gray ramp) must hash identically
    from landlensdb_spark.operators.gif import decode_gif
    from landlensdb_spark.operators.multimodal import phash64
    from landlensdb_spark.operators.tiff import decode_tiff

    img = _rand_idx(40, 40, 256, 17)  # gray values
    g = phash64(decode_gif(encode_gif_gray(img)))
    rgb = np.repeat(img[..., None], 3, axis=-1)
    t_img = decode_tiff(encode_tiff_rgb(rgb))
    # BT.601 luma of an achromatic image is the gray value itself
    from landlensdb_spark.operators.jpeg import rgb_luma

    assert (rgb_luma(t_img) == img).all()
    assert phash64(rgb_luma(t_img)) == g


def test_sub_rectangle_composites_onto_logical_screen():
    """A third-party GIF whose first image block is a sub-rectangle of the
    logical screen must decode to the FULL canvas (background index fills
    the uncovered area) so decode dims agree with gif_meta/LSD dims — the
    reference's PIL path composites identically (round-5 ADVICE)."""
    sub = _rand_idx(2, 3, 4, 21)
    pal = _rand_palette(4, 21)
    data = _lzw_encode(sub.tobytes(), 2)
    blob = bytearray(b"GIF89a")
    blob += struct.pack("<HH", 8, 6)  # logical screen 8x6
    blob.append(0x80 | 0x01)  # GCT present, 4 entries
    blob.append(3)  # background color index
    blob.append(0)  # aspect
    blob += pal.tobytes()
    blob.append(0x2C)
    blob += struct.pack("<HHHH", 4, 1, 3, 2)  # left=4 top=1 3x2 sub-rect
    blob.append(0x00)  # no LCT, not interlaced
    blob.append(2)
    blob.append(len(data))
    blob += data
    blob += b"\x00\x3b"
    out, out_pal = decode_gif_indexed(bytes(blob))
    assert out.shape == (6, 8)  # LSD dims, not the 2x3 crop
    assert (out[1:3, 4:7] == sub).all()
    mask = np.ones((6, 8), bool)
    mask[1:3, 4:7] = False
    assert (out[mask] == 3).all()  # background index everywhere else
    # hostile: sub-rect overrunning the logical screen must raise
    bad = bytearray(blob)
    ipos = 6 + 7 + 12  # header + LSD + 4-entry GCT -> image separator
    assert bad[ipos] == 0x2C
    struct.pack_into("<HHHH", bad, ipos + 1, 7, 5, 3, 2)  # 7+3 > 8
    with pytest.raises(ValueError):
        decode_gif_indexed(bytes(bad))


def test_sub_rectangle_local_palette_ignores_gct_background():
    """When a sub-rectangle image block carries its own LOCAL color table,
    the LSD background index (defined against the GLOBAL table) may map to
    an arbitrary color there — the composite must fill with index 0
    instead (round-6 ADVICE)."""
    sub = _rand_idx(2, 3, 4, 22)
    gct_pal = _rand_palette(4, 22)
    lct_pal = _rand_palette(4, 23)
    data = _lzw_encode(sub.tobytes(), 2)
    blob = bytearray(b"GIF89a")
    blob += struct.pack("<HH", 8, 6)
    blob.append(0x80 | 0x01)  # GCT present, 4 entries
    blob.append(3)  # background color index (GCT-defined)
    blob.append(0)
    blob += gct_pal.tobytes()
    blob.append(0x2C)
    blob += struct.pack("<HHHH", 4, 1, 3, 2)
    blob.append(0x80 | 0x01)  # LOCAL color table, 4 entries
    blob += lct_pal.tobytes()
    blob.append(2)
    blob.append(len(data))
    blob += data
    blob += b"\x00\x3b"
    out, out_pal = decode_gif_indexed(bytes(blob))
    assert (out_pal == lct_pal).all()  # block decodes via its local table
    assert (out[1:3, 4:7] == sub).all()
    mask = np.ones((6, 8), bool)
    mask[1:3, 4:7] = False
    assert (out[mask] == 0).all()  # NOT the GCT's index 3


# ---------------------------------------------------------------------------
# render_gif / encode_gif_anim: full GIF89a animation semantics
# ---------------------------------------------------------------------------
def _render(blocks, **kw):
    from landlensdb_spark.operators.gif import encode_gif_anim, render_gif

    pal = kw.pop("palette", None)
    if pal is None:
        pal = np.repeat(np.arange(256, dtype=np.uint8), 3).reshape(256, 3)
    return render_gif(encode_gif_anim(blocks, pal, **kw))


def test_anim_full_frames_match_plain_decode():
    # full-canvas opaque blocks: render_gif == per-frame palette lookup
    f0 = _rand_idx(11, 17, 256, 5)
    f1 = _rand_idx(11, 17, 256, 6)
    frames = _render([{"idx": f0}, {"idx": f1}])
    assert len(frames) == 2
    assert (frames[0][:, :, 0] == f0).all() and (frames[0][:, :, 1] == f0).all()
    assert (frames[1][:, :, 0] == f1).all()


def test_anim_delta_block_composites_over_previous():
    # frame 1 is a sub-rectangle: pixels outside it must keep frame 0
    f0 = np.full((10, 12), 7, dtype=np.uint8)
    delta = np.full((4, 5), 200, dtype=np.uint8)
    frames = _render(
        [{"idx": f0, "disposal": 1}, {"idx": delta, "left": 3, "top": 2}]
    )
    expect = f0.copy()
    expect[2:6, 3:8] = 200
    assert (frames[1][:, :, 0] == expect).all()


def test_anim_transparency_shows_accumulated_canvas():
    f0 = np.full((8, 8), 50, dtype=np.uint8)
    delta = np.full((4, 4), 90, dtype=np.uint8)
    delta[1:3, 1:3] = 13  # transparent filler
    frames = _render(
        [{"idx": f0, "disposal": 1},
         {"idx": delta, "left": 2, "top": 2, "transparent": 13}]
    )
    expect = f0.copy()
    expect[2:6, 2:6] = 90
    expect[3:5, 3:5] = 50  # shows through to frame 0, NOT bg / index 13
    assert (frames[1][:, :, 0] == expect).all()


def test_anim_disposal_2_restores_rect_to_background():
    f0 = np.full((8, 10), 30, dtype=np.uint8)
    d1 = np.full((3, 4), 99, dtype=np.uint8)
    d2 = np.full((2, 2), 77, dtype=np.uint8)
    frames = _render(
        [{"idx": f0, "disposal": 1},
         {"idx": d1, "left": 1, "top": 1, "disposal": 2},
         {"idx": d2, "left": 7, "top": 5}],
        bg_index=5,
    )
    # frame 2: d1's rect reverted to bg color 5, d2 drawn, rest stays f0
    expect = f0.copy()
    expect[1:4, 1:5] = 5
    expect[5:7, 7:9] = 77
    assert (frames[2][:, :, 0] == expect).all()


def test_anim_disposal_3_restores_previous_canvas():
    f0 = np.full((6, 6), 10, dtype=np.uint8)
    d1 = np.full((3, 3), 200, dtype=np.uint8)
    d2 = np.full((2, 2), 150, dtype=np.uint8)
    frames = _render(
        [{"idx": f0, "disposal": 1},
         {"idx": d1, "left": 2, "top": 2, "disposal": 3},
         {"idx": d2, "left": 0, "top": 0}]
    )
    # d1 vanished entirely; d2 drawn over the restored frame-0 canvas
    expect = f0.copy()
    expect[0:2, 0:2] = 150
    assert (frames[2][:, :, 0] == expect).all()
    # while shown, frame 1 did contain d1
    assert (frames[1][2:5, 2:5, 0] == 200).all()


def test_anim_interlaced_delta_block():
    rng = np.random.default_rng(9)
    f0 = rng.integers(0, 256, (13, 9), dtype=np.uint8)
    delta = rng.integers(0, 256, (8, 5), dtype=np.uint8)
    frames = _render(
        [{"idx": f0, "disposal": 1},
         {"idx": delta, "left": 2, "top": 3, "interlace": True}]
    )
    expect = f0.copy()
    expect[3:11, 2:7] = delta
    assert (frames[1][:, :, 0] == expect).all()


def test_anim_local_palette_block():
    from landlensdb_spark.operators.gif import encode_gif_anim, render_gif

    gpal = np.zeros((4, 3), dtype=np.uint8)
    gpal[1] = (10, 20, 30)
    lpal = np.zeros((2, 3), dtype=np.uint8)
    lpal[1] = (200, 100, 50)
    blob = encode_gif_anim(
        [{"idx": np.full((4, 4), 1, dtype=np.uint8), "disposal": 1},
         {"idx": np.full((2, 2), 1, dtype=np.uint8), "left": 1, "top": 1,
          "palette": lpal}],
        gpal,
    )
    frames = render_gif(blob)
    assert tuple(frames[0][0, 0]) == (10, 20, 30)
    assert tuple(frames[1][1, 1]) == (200, 100, 50)  # local table wins
    assert tuple(frames[1][0, 0]) == (10, 20, 30)


def test_anim_uncovered_first_frame_is_background_color():
    pal = np.zeros((8, 3), dtype=np.uint8)
    pal[3] = (9, 9, 9)
    pal[6] = (60, 61, 62)
    from landlensdb_spark.operators.gif import encode_gif_anim, render_gif

    blob = encode_gif_anim(
        [{"idx": np.full((2, 2), 6, dtype=np.uint8), "left": 1, "top": 1}],
        pal,
        size=(5, 4),
        bg_index=3,
    )
    frames = render_gif(blob)
    assert tuple(frames[0][0, 0]) == (9, 9, 9)
    assert tuple(frames[0][2, 2]) == (60, 61, 62)


def test_anim_gce_governs_exactly_one_block():
    # block 1 has transparency; block 2 (no GCE) must be fully opaque
    f0 = np.full((5, 5), 20, dtype=np.uint8)
    d1 = np.full((2, 2), 0, dtype=np.uint8)  # all-transparent block
    d2 = np.full((2, 2), 0, dtype=np.uint8)  # same indices, opaque block
    frames = _render(
        [{"idx": f0, "disposal": 1},
         {"idx": d1, "left": 0, "top": 0, "transparent": 0, "disposal": 1},
         {"idx": d2, "left": 3, "top": 3}]
    )
    assert (frames[1][:, :, 0] == 20).all()  # transparency left f0 intact
    expect = f0.copy()
    expect[3:5, 3:5] = 0
    assert (frames[2][:, :, 0] == expect).all()


def test_anim_encoder_validation():
    from landlensdb_spark.operators.gif import encode_gif_anim

    pal = np.zeros((4, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="at least one block"):
        encode_gif_anim([], pal)
    with pytest.raises(ValueError, match="beyond palette"):
        encode_gif_anim([{"idx": np.full((2, 2), 9, dtype=np.uint8)}], pal)
    with pytest.raises(ValueError, match="overruns the logical screen"):
        encode_gif_anim(
            [{"idx": np.zeros((4, 4), dtype=np.uint8), "left": 3}],
            pal, size=(5, 5),
        )
    with pytest.raises(ValueError, match="disposal"):
        encode_gif_anim(
            [{"idx": np.zeros((2, 2), dtype=np.uint8), "disposal": 4}], pal
        )


def test_render_gif_plain_multi_image_gif87a():
    # render_gif on the 87a encoder's output (no GCEs at all)
    f0 = _rand_idx(9, 9, 256, 42)
    f1 = _rand_idx(9, 9, 256, 43)
    blob = encode_gif_gray([f0, f1])
    from landlensdb_spark.operators.gif import render_gif

    frames = render_gif(blob)
    assert len(frames) == 2
    assert (frames[0][:, :, 0] == f0).all()
    assert (frames[1][:, :, 0] == f1).all()


def test_anim_transparent_index_bounded_by_stored_table():
    from landlensdb_spark.operators.gif import encode_gif_anim, render_gif

    pal = np.zeros((3, 3), dtype=np.uint8)  # stored table pads to 4
    pal[1] = (100, 100, 100)
    # a transparent filler in the PADDED slot (index 3) is fine: the
    # renderer accepts indices up to the stored size
    blob = encode_gif_anim(
        [{"idx": np.full((2, 2), 1, dtype=np.uint8), "disposal": 1},
         {"idx": np.full((1, 1), 3, dtype=np.uint8), "transparent": 3}],
        pal,
    )
    frames = render_gif(blob)
    assert tuple(frames[1][0, 0]) == (100, 100, 100)
    # but past the stored table the encoder refuses up front
    with pytest.raises(ValueError, match="stored color table"):
        encode_gif_anim(
            [{"idx": np.full((1, 1), 1, dtype=np.uint8), "transparent": 4}],
            pal,
        )
