"""Hilbert 'S2-slot' cell encoding: bijectivity, locality, Spark/numpy parity."""

from __future__ import annotations

import numpy as np

from landlensdb_spark.geo.cells import (
    HILBERT_LEVEL,
    hilbert_cell_udf,
    np_hilbert_cell,
    np_hilbert_d,
)


def test_hilbert_bijective_small():
    level = 4
    n = 1 << level
    gx, gy = np.meshgrid(np.arange(n), np.arange(n))
    d = np_hilbert_d(gx.ravel(), gy.ravel(), level)
    assert sorted(d) == list(range(n * n))  # a true space-filling curve


def test_hilbert_locality():
    # consecutive d values are adjacent cells (the curve never jumps)
    level = 5
    n = 1 << level
    gx, gy = np.meshgrid(np.arange(n), np.arange(n))
    xs, ys = gx.ravel(), gy.ravel()
    d = np_hilbert_d(xs, ys, level)
    order = np.argsort(d)
    dx = np.abs(np.diff(xs[order]))
    dy = np.abs(np.diff(ys[order]))
    assert ((dx + dy) == 1).all()


def test_hilbert_spark_matches_numpy(spark):
    rng = np.random.default_rng(13)
    lon = rng.uniform(-179, 179, 200)
    lat = rng.uniform(-84, 84, 200)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lon, lat)], "lon double, lat double"
    )
    got = (
        df.select(hilbert_cell_udf(HILBERT_LEVEL)("lon", "lat").alias("c"))
        .toPandas()["c"]
        .to_numpy()
    )
    want = np_hilbert_cell(lon, lat, HILBERT_LEVEL)
    assert (got == want).all()
