"""Sortable-long spatial cell ids, k-ring, and polygon covers.

The reference gets spatial indexing from an R-tree over geometry bounds
(/root/reference/landlensdb/process/snap.py:19-31) plus PostGIS GIST indexes
(/root/reference/tests/test_tutorial_core.py:76-79). Our Spark-native
equivalent is a *cell id column*: every point gets a sortable long key, every
polygon/line gets the set of cells covering it, and spatial joins become plain
equi-joins on the key (hash-partitionable, AQE-skew-splittable, prunable when
the table is sorted/partitioned by the key).

Two encodings, same external contract as H3/S2 (neither native lib is in the
sandbox; the *interface* is cell-based per SURVEY.md §7 so a real h3/s2 build
can swap in):

- ``cell_encode(lon, lat, res)`` — "H3 slot": equirect... no — Web-Mercator
  slippy grid at zoom=res, packed ``(res << 58) | (x << 29) | y``. Pure Spark
  column math (no UDF): stays inside whole-stage codegen. ``CELL_RES = 15``
  (~2.4 km at equator) approximates H3 res-7..9 cell sizes; override per op.
- ``hilbert_cell(lon, lat, level)`` — "S2 slot": Hilbert-curve ordering of the
  same grid at ``level`` (default 13), giving S2-style 1-D locality so tables
  sorted by it cluster spatial neighbors. numpy-vectorized pandas UDF.

k-ring (the kNN expansion primitive, replacing the reference's
``idx.nearest`` probe at snap.py:34-53) is also pure column math: decode x/y,
explode a literal (2k+1)^2 offset array, re-encode with x wraparound.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from landlensdb_spark.geo.tiles import np_tile_xy, tile_x, tile_y

#: default cell resolution (slippy zoom) for join keys — ~2.4 km at equator.
CELL_RES = 15
#: default Hilbert level for the S2-slot secondary index.
HILBERT_LEVEL = 13

_RES_SHIFT = 58
_X_SHIFT = 29


def cell_encode(lon: Column | str, lat: Column | str, res: int = CELL_RES) -> Column:
    """Point -> sortable long cell id. Pure column math (codegen, no UDF)."""
    if res >= (1 << 6) or res > 28:
        raise ValueError(f"res must be <= 28, got {res}")
    x = tile_x(lon, res)
    y = tile_y(lat, res)
    return (
        F.lit(res).cast("long") * F.lit(1 << _RES_SHIFT)
        + F.shiftleft(x, _X_SHIFT)
        + y
    ).cast("long")


def cell_x(cell: Column | str) -> Column:
    cell = F.col(cell) if isinstance(cell, str) else cell
    return F.shiftright(cell, _X_SHIFT) % F.lit(1 << _X_SHIFT)


def cell_y(cell: Column | str) -> Column:
    cell = F.col(cell) if isinstance(cell, str) else cell
    return cell % F.lit(1 << _X_SHIFT)


def cell_res(cell: Column | str) -> Column:
    cell = F.col(cell) if isinstance(cell, str) else cell
    return F.shiftright(cell, _RES_SHIFT)


def k_ring(cell: Column | str, k: int, res: int = CELL_RES) -> Column:
    """Array of the (2k+1)^2 cells within Chebyshev distance k.

    Column-math expansion of the reference's nearest-index probe: x wraps at
    the antimeridian, y clamps at the poles (out-of-range y offsets are
    dropped via array_compact-style filtering).
    """
    cell = F.col(cell) if isinstance(cell, str) else cell
    n = 1 << res
    x, y = cell_x(cell), cell_y(cell)
    base = F.lit(res).cast("long") * F.lit(1 << _RES_SHIFT)
    neighbors = []
    for dx in range(-k, k + 1):
        for dy in range(-k, k + 1):
            nx = (x + F.lit(dx) + F.lit(n)) % F.lit(n)
            ny = y + F.lit(dy)
            neighbors.append(
                F.when(
                    (ny >= 0) & (ny < n),
                    base + F.shiftleft(nx, _X_SHIFT) + ny,
                )
            )
    return F.array_compact(F.array(*neighbors))


def np_cell_encode(lon: np.ndarray, lat: np.ndarray, res: int = CELL_RES) -> np.ndarray:
    """numpy twin of :func:`cell_encode` (identical packing)."""
    x, y = np_tile_xy(lon, lat, res)
    return (np.int64(res) << _RES_SHIFT) | (x.astype(np.int64) << _X_SHIFT) | y.astype(np.int64)


def np_cell_decode(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cell id -> (res, x, y) arrays."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell >> _RES_SHIFT
    x = (cell >> _X_SHIFT) & ((1 << _X_SHIFT) - 1)
    y = cell & ((1 << _X_SHIFT) - 1)
    return res, x, y


# ---------------------------------------------------------------------------
# Hilbert "S2-slot" encoding
# ---------------------------------------------------------------------------

def np_hilbert_d(x: np.ndarray, y: np.ndarray, level: int) -> np.ndarray:
    """Vectorized Hilbert curve xy -> d at ``level`` bits per axis."""
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    d = np.zeros_like(x)
    s = np.int64(1) << (level - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f, y_f = x.copy(), y.copy()
        x[flip] = s - 1 - x_f[flip]
        y[flip] = s - 1 - y_f[flip]
        x_s, y_s = x.copy(), y.copy()
        x[swap] = y_s[swap]
        y[swap] = x_s[swap]
        s >>= 1
    return d


def np_hilbert_cell(lon: np.ndarray, lat: np.ndarray, level: int = HILBERT_LEVEL) -> np.ndarray:
    """Point -> Hilbert-ordered sortable long at ``level`` (S2-slot index)."""
    x, y = np_tile_xy(lon, lat, level)
    d = np_hilbert_d(x, y, level)
    return (np.int64(level) << _RES_SHIFT) | d


def hilbert_cell_udf(level: int = HILBERT_LEVEL):
    """pandas UDF wrapper for :func:`np_hilbert_cell` (Arrow-batched)."""

    @F.pandas_udf(LongType())
    def _enc(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(np_hilbert_cell(lon.to_numpy(), lat.to_numpy(), level))

    return _enc


# ---------------------------------------------------------------------------
# Polygon / segment covers (driver-side or broadcast-side, numpy)
# ---------------------------------------------------------------------------

def np_bbox_cover(
    minx: float, miny: float, maxx: float, maxy: float, res: int = CELL_RES
) -> np.ndarray:
    """All cells intersecting a lon/lat bbox — superset cover, exactness comes
    from the downstream numpy refinement (ray-cast / distance)."""
    x0, y1 = np_tile_xy(np.array([minx]), np.array([miny]), res)
    x1, y0 = np_tile_xy(np.array([maxx]), np.array([maxy]), res)
    xs = np.arange(x0[0], x1[0] + 1, dtype=np.int64)
    ys = np.arange(y0[0], y1[0] + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys)
    return (
        (np.int64(res) << _RES_SHIFT)
        | (gx.ravel() << _X_SHIFT)
        | gy.ravel()
    )


def cover_res_for_bbox(
    minx: float, miny: float, maxx: float, maxy: float,
    max_cells: int = 64, res: int = CELL_RES,
) -> int:
    """Coarsen res until the bbox cover is <= max_cells (adaptive cover)."""
    while res > 1:
        x0, y1 = np_tile_xy(np.array([minx]), np.array([miny]), res)
        x1, y0 = np_tile_xy(np.array([maxx]), np.array([maxy]), res)
        if int(x1[0] - x0[0] + 1) * int(y1[0] - y0[0] + 1) <= max_cells:
            return res
        res -= 1
    return res
