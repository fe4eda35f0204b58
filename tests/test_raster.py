"""PNG density tiles: codec round-trip, pixel-exact counts, normalization."""

from __future__ import annotations

import numpy as np

from landlensdb_spark.geo.tiles import np_tile_xy
from landlensdb_spark.operators.raster import (
    decode_png_gray,
    encode_png_gray,
    tile_density_raster,
)


def test_png_codec_roundtrip():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(64, 48), dtype=np.uint8)
    assert np.array_equal(decode_png_gray(encode_png_gray(img)), img)
    # signature + IHDR dims are real PNG wire bytes
    blob = encode_png_gray(img)
    assert blob[:8] == b"\x89PNG\r\n\x1a\n"
    assert int.from_bytes(blob[16:20], "big") == 48  # width
    assert int.from_bytes(blob[20:24], "big") == 64  # height


def _pts(spark, n=500):
    rng = np.random.default_rng(13)
    lon = 10.0 + rng.uniform(0, 0.02, n)
    lat = 20.0 + rng.uniform(0, 0.02, n)
    return spark.createDataFrame(
        [(int(i), float(a), float(b)) for i, (a, b) in enumerate(zip(lon, lat))],
        "rec_id long, lon double, lat double",
    ), lon, lat


def test_density_raster_pixel_exact(spark):
    df, lon, lat = _pts(spark)
    zoom, grid = 12, 64
    out = tile_density_raster(df, zoom=zoom, grid=grid, cap=1).collect()
    assert sum(r["n_records"] for r in out) == len(lon)
    # numpy oracle: bin every point into (tile, px, py) and compare nonzero
    # pixel sets (cap=1 -> any occupied pixel saturates to 255)
    tx, ty = np_tile_xy(lon, lat, zoom)
    n = float(1 << zoom)
    fx = (lon + 180.0) / 360.0 * n
    fy = (1.0 - np.arcsinh(np.tan(np.radians(lat))) / np.pi) / 2.0 * n
    px = np.clip(np.floor((fx - tx) * grid).astype(int), 0, grid - 1)
    py = np.clip(np.floor((fy - ty) * grid).astype(int), 0, grid - 1)
    want = {}
    for i in range(len(lon)):
        want.setdefault((tx[i], ty[i]), set()).add((px[i], py[i]))
    got = {}
    for r in out:
        img = decode_png_gray(bytes(r["png"]))
        assert img.shape == (grid, grid)
        nz = set(zip(*np.nonzero(img.T)))  # (x, y) pairs
        assert set(img[img > 0].tolist()) == {255}
        got[(r["tile_x"], r["tile_y"])] = nz
    assert got == want


def test_density_normalization_modes(spark):
    df, _, _ = _pts(spark, 300)
    # per-tile normalization: every tile's max pixel is exactly 255
    for r in tile_density_raster(df, zoom=10, grid=32).collect():
        img = decode_png_gray(bytes(r["png"]))
        assert img.max() == 255
    # global cap: intensity = min(count*255//cap, 255), monotone in count
    rows = tile_density_raster(df, zoom=10, grid=32, cap=1000).collect()
    for r in rows:
        img = decode_png_gray(bytes(r["png"]))
        assert img.max() <= r["n_records"] * 255 // 1000 + 255 // 1000 + 1
