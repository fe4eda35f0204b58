"""Geohash: known-answer vectors, numpy-twin parity, bounds inverse."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from landlensdb_spark.geo.geohash import (
    geohash_bounds,
    geohash_encode,
    np_geohash,
)

# public known-answer vectors (Niemeyer's geohash.org examples)
KNOWN = [
    (-5.603027, 42.605, 5, "ezs42"),
    (10.40744, 57.64911, 11, "u4pruydqqvj"),
    (-0.1278, 51.5074, 8, None),  # London — checked vs numpy twin only
]


def test_known_answer_vectors(spark):
    for lon, lat, p, want in KNOWN:
        df = spark.createDataFrame([(lon, lat)], "lon double, lat double")
        got = df.select(geohash_encode("lon", "lat", p).alias("gh")).collect()[0]["gh"]
        assert got == np_geohash([lon], [lat], p)[0]
        if want is not None:
            assert got == want, (lon, lat, p)


def test_numpy_twin_parity_random(spark):
    rng = np.random.default_rng(3)
    lon = rng.uniform(-180, 180, 300)
    lat = rng.uniform(-90, 90, 300)
    df = spark.createDataFrame(
        [(int(i), float(a), float(b)) for i, (a, b) in enumerate(zip(lon, lat))],
        "i long, lon double, lat double",
    )
    got = {
        r["i"]: r["gh"]
        for r in df.select("i", geohash_encode("lon", "lat", 8).alias("gh")).collect()
    }
    want = np_geohash(lon, lat, 8)
    for i in range(300):
        assert got[i] == want[i]


def test_bounds_inverse_contains_point(spark):
    rng = np.random.default_rng(5)
    lon = rng.uniform(-179.9, 179.9, 100)
    lat = rng.uniform(-89.9, 89.9, 100)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lon, lat)], "lon double, lat double"
    )
    p = 7
    gh = df.select("lon", "lat", geohash_encode("lon", "lat", p).alias("gh"))
    w, s, e, n = geohash_bounds("gh", p)
    rows = gh.select(
        "lon", "lat",
        w.alias("w"), s.alias("s"), e.alias("e"), n.alias("n"),
    ).collect()
    for r in rows:
        assert r["w"] <= r["lon"] < r["e"]
        assert r["s"] <= r["lat"] < r["n"]
        # cell size at p=7: ~0.0014 deg lon, ~0.0014 deg lat
        assert r["e"] - r["w"] < 0.002
        assert r["n"] - r["s"] < 0.002


def test_sort_key_locality(spark):
    """Shared prefixes == spatial containment: points in the same p=5 cell
    share the first 5 chars at p=8."""
    base_lon, base_lat = 10.40744, 57.64911
    pts = [(base_lon + dx * 1e-6, base_lat + dy * 1e-6) for dx in range(3) for dy in range(3)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    ghs = [r["gh"] for r in df.select(geohash_encode("lon", "lat", 8).alias("gh")).collect()]
    assert len({g[:5] for g in ghs}) == 1
