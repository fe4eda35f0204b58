"""Exact-geometry kernels: vectorized numpy, no native geometry libs.

These replace the shapely calls in the reference's hot path:

- ray-cast point-in-polygon (with holes)  <- shapely ``contains`` (north rule)
- point-to-segment distance               <- ``geometry.distance`` (snap.py:216)
- linear referencing (locate+interpolate) <- ``line.project``/``interpolate``
                                             (snap.py:223-224)
- forward azimuth bearing                 <- ``_calculate_bearing`` (snap.py:56-75)
- compass/segment alignment choice        <- ``_get_heading`` (snap.py:147-153)

All functions are vectorized over numpy arrays and run inside Arrow-batched
pandas UDFs on executors. Polygons/lines travel as plain coordinate arrays
(ring offsets + xy pairs), never as geometry objects.
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# Point in polygon (ray casting, even-odd rule; holes = extra rings)
# ---------------------------------------------------------------------------

def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd ray cast of N points against one ring ((M,2) array, closed or
    open). Boundary points follow the standard half-open rule (consistent,
    not symmetric) — matches typical ``contains`` for interior points.
    Vectorized N x M."""
    px = np.asarray(px, dtype=np.float64)[:, None]
    py = np.asarray(py, dtype=np.float64)[:, None]
    x0, y0 = ring[:-1, 0][None, :], ring[:-1, 1][None, :]
    x1, y1 = ring[1:, 0][None, :], ring[1:, 1][None, :]
    crosses = (y0 > py) != (y1 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x0 + (py - y0) * (x1 - x0) / (y1 - y0)
    hits = crosses & (px < xint)
    return (hits.sum(axis=1) % 2).astype(bool)


def points_in_own_ring(px: np.ndarray, py: np.ndarray, rings: np.ndarray) -> np.ndarray:
    """Row-aligned ray cast: point i against ring ``rings[i]`` ((N, M, 2)
    tensor, rings closed). One vectorized N x (M-1) evaluation — the batch
    kernel behind the PIP refine (each candidate row carries its own
    polygon). Same half-open boundary rule as :func:`points_in_ring`."""
    px = np.asarray(px, dtype=np.float64)[:, None]
    py = np.asarray(py, dtype=np.float64)[:, None]
    x0, y0 = rings[:, :-1, 0], rings[:, :-1, 1]
    x1, y1 = rings[:, 1:, 0], rings[:, 1:, 1]
    crosses = (y0 > py) != (y1 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x0 + (py - y0) * (x1 - x0) / (y1 - y0)
    hits = crosses & (px < xint)
    return (hits.sum(axis=1) % 2).astype(bool)


def points_in_polygon(
    px: np.ndarray, py: np.ndarray, rings: list[np.ndarray]
) -> np.ndarray:
    """Point-in-polygon with holes: inside iff inside an odd number of rings
    (even-odd across shell + holes). ``rings[0]`` is the shell."""
    if not rings:
        return np.zeros(len(px), dtype=bool)
    acc = np.zeros(len(px), dtype=np.int64)
    for ring in rings:
        acc += points_in_ring(px, py, ring)
    return (acc % 2).astype(bool)


# ---------------------------------------------------------------------------
# Point <-> segment kernels (planar; callers pass EPSG:3857 meters to match
# the reference's distance space, snap.py:190)
# ---------------------------------------------------------------------------

def point_segment_t(
    px: np.ndarray, py: np.ndarray,
    x0: np.ndarray, y0: np.ndarray, x1: np.ndarray, y1: np.ndarray,
) -> np.ndarray:
    """Clamped projection parameter t in [0,1] of each point onto its segment."""
    dx, dy = x1 - x0, y1 - y0
    len2 = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        t = ((px - x0) * dx + (py - y0) * dy) / len2
    t = np.where(len2 == 0.0, 0.0, t)
    return np.clip(t, 0.0, 1.0)


def point_segment_distance(
    px: np.ndarray, py: np.ndarray,
    x0: np.ndarray, y0: np.ndarray, x1: np.ndarray, y1: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(distance, nearest_x, nearest_y) of points vs same-index segments."""
    t = point_segment_t(px, py, x0, y0, x1, y1)
    nx = x0 + t * (x1 - x0)
    ny = y0 + t * (y1 - y0)
    return np.hypot(px - nx, py - ny), nx, ny


def polyline_nearest(
    px: float, py: float, coords: np.ndarray
) -> tuple[float, float, float, float]:
    """Nearest point on one polyline ((M,2)) to one point.

    Returns (distance, nearest_x, nearest_y, arc_position) — arc_position is
    the linear-referencing measure (``line.project`` equivalent).
    Vectorized over the polyline's segments.
    """
    x0, y0 = coords[:-1, 0], coords[:-1, 1]
    x1, y1 = coords[1:, 0], coords[1:, 1]
    d, nx, ny = point_segment_distance(
        np.full_like(x0, px), np.full_like(y0, py), x0, y0, x1, y1
    )
    i = int(np.argmin(d))
    seg_len = np.hypot(x1 - x0, y1 - y0)
    cum = np.concatenate([[0.0], np.cumsum(seg_len)])
    t = point_segment_t(
        np.array([px]), np.array([py]),
        x0[i : i + 1], y0[i : i + 1], x1[i : i + 1], y1[i : i + 1],
    )[0]
    return float(d[i]), float(nx[i]), float(ny[i]), float(cum[i] + t * seg_len[i])


# ---------------------------------------------------------------------------
# Bearings (great-circle forward azimuth — reference snap.py:56-75)
# ---------------------------------------------------------------------------

def bearing(
    lon1: np.ndarray, lat1: np.ndarray, lon2: np.ndarray, lat2: np.ndarray
) -> np.ndarray:
    """Forward azimuth in degrees [0, 360) from point1 to point2."""
    lon1, lat1 = np.radians(lon1), np.radians(lat1)
    lon2, lat2 = np.radians(lon2), np.radians(lat2)
    dlon = lon2 - lon1
    x = np.sin(dlon) * np.cos(lat2)
    y = np.cos(lat1) * np.sin(lat2) - np.sin(lat1) * np.cos(lat2) * np.cos(dlon)
    return (np.degrees(np.arctan2(x, y)) + 360.0) % 360.0


def align_heading(seg_bearing: np.ndarray, compass: np.ndarray) -> np.ndarray:
    """Pick segment bearing or its reverse, whichever is angularly closer to
    the compass angle — reference ``_get_heading`` (snap.py:147-153)."""
    rev = (seg_bearing + 180.0) % 360.0
    d_fwd = np.abs(((seg_bearing - compass + 180.0) % 360.0) - 180.0)
    d_rev = np.abs(((rev - compass + 180.0) % 360.0) - 180.0)
    return np.where(d_fwd <= d_rev, seg_bearing, rev)


# ---------------------------------------------------------------------------
# Grid spatial index over geometries (per-executor build, replaces R-tree)
# ---------------------------------------------------------------------------

class GridIndex:
    """Cell-bucketed index of geometries by bbox — the executor-side stand-in
    for the reference's ``rtree.index`` (snap.py:19-31). Build once per
    partition from a broadcast coordinate table; probe with bbox queries.
    """

    def __init__(self, res: int):
        from landlensdb_spark.geo.cells import np_bbox_cover

        self.res = res
        self._cover = np_bbox_cover
        self.buckets: dict[int, list[int]] = {}
        self.bounds: dict[int, tuple[float, float, float, float]] = {}

    def insert(self, geom_id: int, minx: float, miny: float, maxx: float, maxy: float):
        self.bounds[geom_id] = (minx, miny, maxx, maxy)
        for c in self._cover(minx, miny, maxx, maxy, self.res):
            self.buckets.setdefault(int(c), []).append(geom_id)

    def query(self, minx: float, miny: float, maxx: float, maxy: float) -> list[int]:
        """ids whose bbox intersects the query bbox (exact bbox test after
        the cell-bucket candidate fetch)."""
        out: list[int] = []
        seen: set[int] = set()
        for c in self._cover(minx, miny, maxx, maxy, self.res):
            for gid in self.buckets.get(int(c), ()):
                if gid in seen:
                    continue
                seen.add(gid)
                bminx, bminy, bmaxx, bmaxy = self.bounds[gid]
                if bminx <= maxx and bmaxx >= minx and bminy <= maxy and bmaxy >= miny:
                    out.append(gid)
        return out
