"""Adaptive quad-split invariants + GeoJSON sink round-trip."""

from __future__ import annotations

import json

import numpy as np
from pyspark.sql import functions as F

from landlensdb_spark.export import write_geojson
from landlensdb_spark.operators.quadtree import adaptive_quad_cells, assign_quad_leaves


def _skewed_pts(spark, n=3000):
    # one dense hotspot + world-wide scatter: forces deep splits only where
    # the reference's recursion would split
    rng = np.random.default_rng(11)
    dense = int(n * 0.6)
    lon = np.concatenate(
        [2.3 + rng.uniform(0, 0.05, dense), rng.uniform(-179, 179, n - dense)]
    )
    lat = np.concatenate(
        [48.8 + rng.uniform(0, 0.05, dense), rng.uniform(-80, 80, n - dense)]
    )
    return spark.createDataFrame(
        [(int(i), float(a), float(b)) for i, (a, b) in enumerate(zip(lon, lat))],
        "key long, lon double, lat double",
    )


def test_quadtree_invariants(spark):
    pts = _skewed_pts(spark)
    cap, maxz = 50, 10
    leaves = adaptive_quad_cells(pts, capacity=cap, max_zoom=maxz).collect()
    assert sum(r["n_points"] for r in leaves) == 3000  # exact partition
    for r in leaves:
        if r["z"] < maxz:
            assert r["n_points"] <= cap
    # the dense hotspot must have forced splits past the scatter's depth
    assert max(r["z"] for r in leaves) > min(r["z"] for r in leaves)
    # leaves are prefix-free (no leaf is an ancestor of another)
    cells = {(r["z"], r["x"], r["y"]) for r in leaves}
    for z, x, y in cells:
        for zz in range(0, z):
            assert (zz, x >> (z - zz), y >> (z - zz)) not in cells


def test_assign_quad_leaves_partitions_points(spark):
    pts = _skewed_pts(spark, n=800)
    leaves = adaptive_quad_cells(pts, capacity=40, max_zoom=9)
    tagged = assign_quad_leaves(pts, leaves, max_zoom=9)
    assert tagged.count() == 800  # every point exactly one leaf
    per_leaf = tagged.groupBy("leaf_z", "leaf_x", "leaf_y").count()
    want = {(r["z"], r["x"], r["y"]): r["n_points"] for r in leaves.collect()}
    for r in per_leaf.collect():
        assert want[(r["leaf_z"], r["leaf_x"], r["leaf_y"])] == r["count"]


def test_geojson_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 2.5, 48.5, "a"), (2, -70.0, 40.0, "b")],
        "key long, lon double, lat double, name string",
    ).withColumn("ts", F.timestamp_seconds(F.lit(1650000000)))
    path = str(tmp_path / "out.geojson")
    n = write_geojson(df.orderBy("key"), path)
    assert n == 2
    fc = json.load(open(path))
    assert fc["type"] == "FeatureCollection" and len(fc["features"]) == 2
    f0 = fc["features"][0]
    assert f0["geometry"] == {"type": "Point", "coordinates": [2.5, 48.5]}
    assert f0["properties"]["name"] == "a" and f0["properties"]["key"] == 1
    assert f0["properties"]["ts"].startswith("2022-04-15")  # ISO cast
