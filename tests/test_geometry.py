"""Exact-geometry numpy kernels: PIP (incl. concave + holes + the boundary
half-open rule the SQL oracle depends on), point-segment distance, linear
referencing, bearing and heading alignment (reference snap.py:56-75,147-153)."""

from __future__ import annotations

import math

import numpy as np

from landlensdb_spark.geo import geometry as G


def test_pip_rectangle_matches_floor_binning():
    """Ray-cast on an axis-aligned rectangle == half-open [lo,hi) bins —
    the exact contract grid_admin_sql() (synth.py) relies on."""
    ring = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0]])
    rng = np.random.default_rng(5)
    px = np.concatenate([rng.uniform(-2, 12, 500), [0.0, 10.0, 5.0, 5.0, 0.0, 10.0]])
    py = np.concatenate([rng.uniform(-2, 12, 500), [5.0, 5.0, 0.0, 10.0, 0.0, 10.0]])
    got = G.points_in_ring(px, py, ring)
    want = (px >= 0.0) & (px < 10.0) & (py >= 0.0) & (py < 10.0)
    assert (got == want).all()


def test_pip_concave():
    # L-shaped polygon
    ring = np.array(
        [[0, 0], [4, 0], [4, 1], [1, 1], [1, 4], [0, 4], [0, 0]], dtype=np.float64
    )
    px = np.array([0.5, 2.0, 2.0, 0.5, 3.9])
    py = np.array([0.5, 0.5, 2.0, 3.9, 0.5])
    want = np.array([True, True, False, True, True])
    assert (G.points_in_ring(px, py, ring) == want).all()


def test_pip_with_hole():
    shell = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=np.float64)
    hole = np.array([[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]], dtype=np.float64)
    px = np.array([5.0, 1.0, 4.5, 11.0])
    py = np.array([5.0, 1.0, 4.5, 5.0])
    want = np.array([False, True, False, False])
    assert (G.points_in_polygon(px, py, [shell, hole]) == want).all()


def test_point_segment_distance():
    d, nx, ny = G.point_segment_distance(
        np.array([5.0, -1.0, 11.0]),
        np.array([3.0, 0.0, 4.0]),
        np.array([0.0, 0.0, 0.0]),
        np.array([0.0, 0.0, 0.0]),
        np.array([10.0, 10.0, 10.0]),
        np.array([0.0, 0.0, 0.0]),
    )
    assert np.allclose(d, [3.0, 1.0, math.hypot(1, 4)])
    assert np.allclose(nx, [5.0, 0.0, 10.0])
    assert np.allclose(ny, [0.0, 0.0, 0.0])
    # degenerate zero-length segment
    d0, _, _ = G.point_segment_distance(
        np.array([3.0]), np.array([4.0]),
        np.array([0.0]), np.array([0.0]), np.array([0.0]), np.array([0.0]),
    )
    assert np.allclose(d0, [5.0])


def test_polyline_nearest_and_linear_ref():
    # right-angle polyline; nearest to (6, 1) is on the vertical leg
    coords = np.array([[0.0, 0.0], [5.0, 0.0], [5.0, 5.0]])
    d, nx, ny, pos = G.polyline_nearest(6.0, 1.0, coords)
    assert abs(d - 1.0) < 1e-12
    assert (nx, ny) == (5.0, 1.0)
    assert abs(pos - 6.0) < 1e-12  # 5 along first leg + 1 up the second


def test_bearing_cardinals():
    b = G.bearing(
        np.array([0.0, 0.0, 0.0, 0.0]),
        np.array([0.0, 0.0, 0.0, 0.0]),
        np.array([0.0, 1.0, 0.0, -1.0]),
        np.array([1.0, 0.0, -1.0, 0.0]),
    )
    assert np.allclose(b, [0.0, 90.0, 180.0, 270.0], atol=1e-9)


def test_align_heading():
    # reference _get_heading semantics (snap.py:147-153)
    seg = np.array([10.0, 10.0, 350.0])
    compass = np.array([15.0, 170.0, 5.0])
    out = G.align_heading(seg, compass)
    assert np.allclose(out, [10.0, 190.0, 350.0])


def test_grid_index_query():
    idx = G.GridIndex(res=8)
    idx.insert(1, 0.0, 0.0, 1.0, 1.0)
    idx.insert(2, 50.0, 50.0, 51.0, 51.0)
    assert idx.query(0.5, 0.5, 0.6, 0.6) == [1]
    assert idx.query(49.0, 49.0, 50.5, 50.5) == [2]
    assert idx.query(-10.0, -10.0, -9.0, -9.0) == []
    hits = idx.query(-1.0, -1.0, 52.0, 52.0)
    assert sorted(hits) == [1, 2]
