"""Point-in-polygon join: distributed two-phase join vs (a) the grid-binning
closed-form the SQL oracle uses, (b) a brute-force numpy ray-cast oracle on
irregular/concave/holed polygons."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from landlensdb_spark import synth
from landlensdb_spark.geo.geometry import points_in_polygon
from landlensdb_spark.operators.pip_join import pip_join


def test_pip_grid_matches_floor_binning(spark):
    n = 4000
    pts = spark.range(n).select(
        F.col("id"),
        synth.lon_col(F.col("id")).alias("lon"),
        synth.lat_col(F.col("id")).alias("lat"),
    )
    polys = synth.admin_polygons(spark)
    out = pip_join(pts, polys).select("id", "admin_id").toPandas()

    i = np.arange(n)
    lon, lat = synth.np_lon(i), synth.np_lat(i)
    gx = np.floor((lon - synth.GRID_X0) / synth.GRID_DX).astype(np.int64)
    gy = np.floor((lat - synth.GRID_Y0) / synth.GRID_DY).astype(np.int64)
    want = gx * synth.GRID_NY + gy

    assert len(out) == n  # grid covers the whole field, non-overlapping
    got = out.set_index("id")["admin_id"].sort_index().to_numpy()
    assert (got == want).all()


def test_pip_irregular_polygons_vs_numpy_oracle(spark):
    # concave L, a polygon with a hole, and a triangle — overlapping the L
    L = [[0.0, 0.0], [8.0, 0.0], [8.0, 2.0], [2.0, 2.0], [2.0, 8.0], [0.0, 8.0], [0.0, 0.0]]
    shell = [[10.0, 10.0], [20.0, 10.0], [20.0, 20.0], [10.0, 20.0], [10.0, 10.0]]
    hole = [[14.0, 14.0], [16.0, 14.0], [16.0, 16.0], [14.0, 16.0], [14.0, 14.0]]
    tri = [[-1.0, -1.0], [6.0, 1.0], [1.0, 6.0], [-1.0, -1.0]]
    polys = spark.createDataFrame(
        [(0, "L", [L]), (1, "holed", [shell, hole]), (2, "tri", [tri])],
        "admin_id long, name string, ring array<array<array<double>>>",
    )
    rng = np.random.default_rng(42)
    px = rng.uniform(-2, 22, 3000)
    py = rng.uniform(-2, 22, 3000)
    pts = spark.createDataFrame(
        [(int(k), float(a), float(b)) for k, (a, b) in enumerate(zip(px, py))],
        "id long, lon double, lat double",
    )
    out = pip_join(pts, polys, rings_col="ring").select("id", "admin_id").toPandas()
    got = set(map(tuple, out.to_numpy()))

    want = set()
    for pid, rings in [(0, [L]), (1, [shell, hole]), (2, [tri])]:
        arrs = [np.asarray(r) for r in rings]
        inside = points_in_polygon(px, py, arrs)
        want |= {(int(k), pid) for k in np.where(inside)[0]}
    assert got == want
    # overlap region produced multiple matches for some point
    from collections import Counter

    c = Counter(k for k, _ in got)
    assert max(c.values()) == 2


def test_pip_keep_polygon_cols(spark):
    pts = spark.range(100).select(
        F.col("id"),
        synth.lon_col(F.col("id")).alias("lon"),
        synth.lat_col(F.col("id")).alias("lat"),
    )
    polys = synth.admin_polygons(spark)
    out = pip_join(pts, polys, keep_polygon_cols=["name"])
    assert "name" in out.columns
    row = out.limit(1).collect()[0]
    assert row["name"].startswith("admin_")
