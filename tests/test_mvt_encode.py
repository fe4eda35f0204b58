"""encode_tiles: engine-built MVT blobs decode back bit-exactly and feed the
engine's own coverage-scan operators (full raster<->vector loop)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from landlensdb_spark.geo.tiles import np_tile_xy
from landlensdb_spark.operators.mvt import (
    coverage_features,
    decode_mvt,
    encode_tiles,
    tile_features,
)


def _pts(spark, n=400):
    rng = np.random.default_rng(21)
    lon = np.concatenate(
        [10.0 + rng.uniform(0, 0.01, n // 2), rng.uniform(-170, 170, n - n // 2)]
    )
    lat = np.concatenate(
        [20.0 + rng.uniform(0, 0.01, n // 2), rng.uniform(-80, 80, n - n // 2)]
    )
    return spark.createDataFrame(
        [
            (int(i), float(a), float(b), 1_600_000_000_000 + i * 977)
            for i, (a, b) in enumerate(zip(lon, lat))
        ],
        "img_id long, lon double, lat double, captured_at long",
    )


def test_roundtrip_decode_matches_input(spark):
    df = _pts(spark)
    tiles = encode_tiles(
        df, "img_id", zoom=14, layer="image", prop_cols=["captured_at"]
    )
    rows = tiles.collect()
    # every input point appears in exactly one tile
    assert sum(r["n_features"] for r in rows) == df.count()
    inp = {r["img_id"]: r for r in df.collect()}
    n_checked = 0
    for t in rows:
        for layer, extent, fid, px, py, props in decode_mvt(bytes(t["content"])):
            assert layer == "image" and extent == 4096
            src = inp[fid]
            x14, y14 = np_tile_xy([src["lon"]], [src["lat"]], 14)
            assert (t["tile_x"], t["tile_y"]) == (x14[0], y14[0])
            # local pixel coords match the golden formula
            fx = (src["lon"] + 180.0) / 360.0 * (1 << 14)
            lat_r = np.radians(src["lat"])
            fy = (1.0 - np.arcsinh(np.tan(lat_r)) / np.pi) / 2.0 * (1 << 14)
            assert px == min(max(int(np.floor((fx - x14[0]) * 4096)), 0), 4095)
            assert py == min(max(int(np.floor((fy - y14[0]) * 4096)), 0), 4095)
            assert props["captured_at"] == str(src["captured_at"])
            n_checked += 1
    assert n_checked == df.count()


def test_engine_scan_consumes_engine_tiles(spark):
    """The encoded tiles run through the engine's own coverage scan
    (tile_features + coverage_features layer-choice) end to end."""
    df = _pts(spark, 200)
    tiles = encode_tiles(df, "img_id", zoom=14, prop_cols=["captured_at"])
    feats = tile_features(tiles)
    assert feats.count() == 200
    # coverage semantics: z14 + "image" layer present -> all features kept
    cov = coverage_features(tiles)
    assert cov.count() == 200
    # and the captured_at filter applies on the way through
    lo = 1_600_000_000_000 + 100 * 977
    cov2 = coverage_features(tiles, start_captured_ms=lo)
    assert cov2.count() == sum(
        1 for r in df.collect() if r["captured_at"] >= lo
    )


def test_feature_cap_bounds_tiles(spark):
    df = _pts(spark, 300)  # half the points share one 0.01-degree window
    capped = encode_tiles(df, "img_id", zoom=10, max_features_per_tile=25)
    rows = capped.collect()
    assert max(r["n_features"] for r in rows) <= 25
    for t in rows:
        assert len(decode_mvt(bytes(t["content"]))) == t["n_features"]
