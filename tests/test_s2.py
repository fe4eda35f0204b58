"""Canonical S2 cell ids: structural invariants (no s2 lib in sandbox)."""

from __future__ import annotations

import numpy as np

from landlensdb_spark.geo import s2


def _pts(n=500):
    i = np.arange(n, dtype=np.int64)
    lon = ((i * 7919) % 36000) / 100.0 - 180.0
    lat = ((i * 104729) % 17000) / 100.0 - 85.0
    return lon, lat


def test_cardinal_faces_and_layout():
    pts = [(0, 0, 0), (90, 0, 1), (0, 90, 2), (180, 0, 3), (-90, 0, 4), (0, -90, 5)]
    lon = np.array([p[0] for p in pts], float)
    lat = np.array([p[1] for p in pts], float)
    leaf = s2.np_s2_leaf(lon, lat)
    assert ((leaf >> np.uint64(61)).astype(int) == [p[2] for p in pts]).all()
    # trailing bit set on every leaf; level field decodes
    assert (leaf & np.uint64(1)).all()
    assert (s2.s2_level(leaf) == 30).all()
    assert (s2.s2_level(s2.np_s2_cell(lon, lat, 13)) == 13).all()


def test_roundtrip_every_level():
    lon, lat = _pts()
    for lev in (1, 5, 13, 20, 30):
        c = s2.np_s2_cell(lon, lat, lev)
        clon, clat = s2.np_s2_decode(c)
        assert (s2.np_s2_cell(clon, clat, lev) == c).all(), f"level {lev}"


def test_hierarchy_containment():
    lon, lat = _pts()
    fine = s2.np_s2_cell(lon, lat, 20)
    for lev in (3, 13, 19):
        lo, hi = s2.s2_range(s2.np_s2_cell(lon, lat, lev))
        assert ((fine >= lo) & (fine <= hi)).all()
    # cells at the same level never nest: sibling ranges are disjoint
    c = s2.np_s2_cell(np.array([10.0, 10.0]), np.array([20.0, 21.0]), 13)
    if c[0] != c[1]:
        lo, hi = s2.s2_range(c)
        assert hi[0] < lo[1] or hi[1] < lo[0]


def test_locality_and_sortable():
    # 10 m apart -> same level-13 cell (cell edge ~1.27 km); picked away
    # from cell boundaries (round-trip-verified stable point)
    base = s2.np_s2_cell(np.array([-73.98]), np.array([40.75]), 13)
    near = s2.np_s2_cell(np.array([-73.98009]), np.array([40.75007]), 13)
    assert base[0] == near[0]
    lon, lat = _pts()
    c = s2.np_s2_cell(lon, lat, 13)
    srt = s2.s2_sortable(c)
    assert (np.argsort(c, kind="stable") == np.argsort(srt, kind="stable")).all()
    assert (s2.s2_unsortable(srt) == c).all()


def test_spark_udf(spark):
    from pyspark.sql import functions as F

    df = spark.range(200).select(
        (F.col("id") * 1.7 - 100).alias("lon"), (F.col("id") * 0.8 - 80).alias("lat")
    )
    got = np.array([r[0] for r in df.select(s2.s2_cell_udf(13)("lon", "lat")).collect()])
    lon = np.arange(200) * 1.7 - 100.0
    lat = np.arange(200) * 0.8 - 80.0
    want = s2.s2_sortable(s2.np_s2_cell(lon, lat, 13))
    assert (got == want).all()


def test_nan_lonlat_yields_null_not_fake_cell(spark):
    """Non-finite coords must encode to NULL — the int64 clip would otherwise
    fabricate a valid-looking face-boundary cell for untagged rows."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 10.0, 20.0), (2, float("nan"), 20.0), (3, 10.0, float("inf"))],
        "id long, lon double, lat double",
    )
    rows = {
        r["id"]: r["cell"]
        for r in df.select("id", s2.s2_cell_udf(13)("lon", "lat").alias("cell")).collect()
    }
    assert rows[2] is None and rows[3] is None
    want = int(s2.s2_sortable(s2.np_s2_cell(np.array([10.0]), np.array([20.0]), 13))[0])
    assert rows[1] == want
