"""Canonical S2 cell ids (real bit layout), vectorized in numpy.

The north-star index contract is "S2 level-13 cells as sortable longs". The
sandbox has no ``s2sphere``/``s2geometry``, so this implements the published
S2 cell-id construction directly (public algorithm: cube-face projection,
quadratic UV->ST transform, per-face Hilbert curve with swap/invert
orientation tables, 3 face bits + 2*30 position bits + trailing lsb):

- ``np_s2_cell(lon, lat, level)`` -> canonical uint64 S2CellId at ``level``
  (the C++/Java/Go libraries' ``S2CellId.parent(level)`` bit layout; interior
  points match the library bit-for-bit — points EXACTLY on a face boundary
  or leaf-cell edge may differ by one cell from a given library build, since
  tie-breaks there depend on its float rounding mode),
- ``np_s2_decode`` / cell-center inverse (used by the round-trip tests),
- ``s2_sortable`` -> int64 with the sign bit flipped, because Spark's LONG is
  signed: uint64 ids on faces 4-5 would sort negative; the flip is a strictly
  order-preserving bijection so range scans / sorts behave exactly like
  uint64 S2 ordering (flip back with the same op).

Correctness is self-certified by structural invariants pytest locks down
(encode<->decode round-trip at every level, parent/child containment ranges,
face assignment for cardinal directions, curve locality); swap in an
``s2sphere`` cross-check where the library exists.

Replaces the Hilbert-grid "S2 slot" stand-in (geo/cells.py) for callers that
need library-compatible ids; the grid variant remains for mercator-aligned
join keys.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

S2_LEVEL = 13
_MAX_LEVEL = 30
_POS_BITS = 2 * _MAX_LEVEL + 1

_SWAP, _INVERT = 1, 2
# traversal order of the Hilbert curve in each orientation (public tables)
_POS_TO_IJ = np.array(
    [[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]], dtype=np.uint64
)
_POS_TO_ORIENTATION = np.array([_SWAP, 0, 0, _INVERT + _SWAP], dtype=np.uint64)
# inverse: orientation x ij -> pos
_IJ_TO_POS = np.zeros((4, 4), dtype=np.uint64)
for _o in range(4):
    for _p in range(4):
        _IJ_TO_POS[_o, _POS_TO_IJ[_o, _p]] = _p


def _xyz(lon: np.ndarray, lat: np.ndarray):
    phi, theta = np.radians(lat), np.radians(lon)
    cos_phi = np.cos(phi)
    return cos_phi * np.cos(theta), cos_phi * np.sin(theta), np.sin(phi)


def _face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    # strict > like the library's LargestAbsComponent: on exact ties the
    # LATER axis wins (z beats y beats x) — >= would flip face assignment
    # for boundary points (e.g. lon=45) vs s2geometry
    face = np.where(ax > ay, np.where(ax > az, 0, 2), np.where(ay > az, 1, 2))
    comp = np.choose(face, [x, y, z])
    face = np.where(comp < 0, face + 3, face).astype(np.int64)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ue, ve) in enumerate(
        [
            (lambda: y / x, lambda: z / x),      # +x
            (lambda: -x / y, lambda: z / y),     # +y
            (lambda: -x / z, lambda: -y / z),    # +z
            (lambda: z / x, lambda: y / x),      # -x
            (lambda: z / y, lambda: -x / y),     # -y
            (lambda: -y / z, lambda: -x / z),    # -z
        ]
    ):
        m = face == f
        if m.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                u[m] = ue()[m]
                v[m] = ve()[m]
    return face, u, v


def _uv_to_st(u: np.ndarray) -> np.ndarray:
    """S2's quadratic projection (the library default). Both np.where
    branches evaluate on the full array, so each sqrt clamps its argument."""
    return np.where(
        u >= 0,
        0.5 * np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0)),
        1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0)),
    )


def _st_to_uv(s: np.ndarray) -> np.ndarray:
    return np.where(
        s >= 0.5, (1.0 / 3.0) * (4.0 * s * s - 1.0), (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s))
    )


def _st_to_ij(s: np.ndarray) -> np.ndarray:
    return np.clip((s * (1 << _MAX_LEVEL)).astype(np.int64), 0, (1 << _MAX_LEVEL) - 1)


def np_s2_leaf(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """(lon, lat) degrees -> canonical leaf (level-30) S2CellId, uint64."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    face, u, v = _face_uv(*_xyz(lon, lat))
    i = _st_to_ij(_uv_to_st(u)).astype(np.uint64)
    j = _st_to_ij(_uv_to_st(v)).astype(np.uint64)

    pos = np.zeros(len(lon), dtype=np.uint64)
    orientation = (np.asarray(face, dtype=np.uint64)) & np.uint64(_SWAP)
    for k in range(_MAX_LEVEL - 1, -1, -1):
        ib = (i >> np.uint64(k)) & np.uint64(1)
        jb = (j >> np.uint64(k)) & np.uint64(1)
        ij = (ib << np.uint64(1)) | jb
        step = _IJ_TO_POS[orientation, ij]
        pos = (pos << np.uint64(2)) | step
        orientation = orientation ^ _POS_TO_ORIENTATION[step]
    return (
        (np.asarray(face, dtype=np.uint64) << np.uint64(_POS_BITS))
        | (pos << np.uint64(1))
        | np.uint64(1)
    )


def np_s2_cell(lon: np.ndarray, lat: np.ndarray, level: int = S2_LEVEL) -> np.ndarray:
    """(lon, lat) -> canonical S2CellId at ``level`` (uint64)."""
    leaf = np_s2_leaf(lon, lat)
    lsb = np.uint64(1) << np.uint64(2 * (_MAX_LEVEL - level))
    # parent(level): clear the bits below lsb, set lsb
    return (leaf & (~(lsb - np.uint64(1)))) | lsb


def s2_lsb(cell: np.ndarray) -> np.ndarray:
    cell = np.asarray(cell, dtype=np.uint64)
    return cell & (~cell + np.uint64(1))


def s2_range(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """[range_min, range_max] leaf-id interval covered by each cell — the
    containment primitive (child in parent <=> min <= child <= max)."""
    lsb = s2_lsb(cell)
    return cell - (lsb - np.uint64(1)), cell + (lsb - np.uint64(1))


def s2_level(cell: np.ndarray) -> np.ndarray:
    cell = np.asarray(cell, dtype=np.uint64)
    lsb = s2_lsb(cell)
    # lsb of a level-l cell is 1 << (2*(30-l)), so level = 30 - tz/2
    tz = np.zeros(len(cell), dtype=np.int64)
    v = lsb.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = (v & ((np.uint64(1) << np.uint64(shift)) - np.uint64(1))) == 0
        big = m & (v != 0)
        tz[big] += shift
        v[big] >>= np.uint64(shift)
    return _MAX_LEVEL - tz // 2


def np_s2_decode(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """cell id -> (lon, lat) of the CELL CENTER (degrees)."""
    cell = np.asarray(cell, dtype=np.uint64)
    face = (cell >> np.uint64(_POS_BITS)).astype(np.int64)
    level = s2_level(cell)
    pos = (cell & ((np.uint64(1) << np.uint64(_POS_BITS)) - np.uint64(1))) >> np.uint64(1)

    i = np.zeros(len(cell), dtype=np.uint64)
    j = np.zeros(len(cell), dtype=np.uint64)
    orientation = (face.astype(np.uint64)) & np.uint64(_SWAP)
    for k in range(_MAX_LEVEL - 1, -1, -1):
        lvl = _MAX_LEVEL - 1 - k  # 0-based depth of this step
        active = lvl < level
        step = (pos >> np.uint64(2 * k)) & np.uint64(3)
        ij = _POS_TO_IJ[orientation, step]
        ib, jb = (ij >> np.uint64(1)) & np.uint64(1), ij & np.uint64(1)
        i = np.where(active, (i << np.uint64(1)) | ib, i)
        j = np.where(active, (j << np.uint64(1)) | jb, j)
        orientation = np.where(
            active, orientation ^ _POS_TO_ORIENTATION[step], orientation
        )
    # center of the cell at `level`: ij are level-bit prefixes; center in ST
    size = np.exp2(-(level.astype(np.float64)))
    s = (i.astype(np.float64) * size) + size / 2.0
    t = (j.astype(np.float64) * size) + size / 2.0
    u, v = _st_to_uv(s), _st_to_uv(t)
    one = np.ones_like(u)
    xyz_by_face = [
        (one, u, v),       # +x
        (-u, one, v),      # +y
        (-u, -v, one),     # +z
        (-one, -v, -u),    # -x
        (v, -one, -u),     # -y
        (v, u, -one),      # -z
    ]
    x = np.choose(face, [c[0] for c in xyz_by_face])
    y = np.choose(face, [c[1] for c in xyz_by_face])
    z = np.choose(face, [c[2] for c in xyz_by_face])
    lon = np.degrees(np.arctan2(y, x))
    lat = np.degrees(np.arctan2(z, np.sqrt(x * x + y * y)))
    return lon, lat


def s2_sortable(cell: np.ndarray) -> np.ndarray:
    """uint64 id -> order-preserving signed long for Spark columns."""
    return (np.asarray(cell, dtype=np.uint64) ^ np.uint64(1 << 63)).astype(np.int64)


def s2_unsortable(col: np.ndarray) -> np.ndarray:
    return (np.asarray(col, dtype=np.int64).astype(np.uint64)) ^ np.uint64(1 << 63)


def s2_cell_udf(level: int = S2_LEVEL):
    """Arrow-batched pandas UDF: (lon, lat) -> sortable-long S2 cell id."""

    @F.pandas_udf(LongType())
    def _enc(lon: pd.Series, lat: pd.Series) -> pd.Series:
        lo = lon.to_numpy(np.float64)
        la = lat.to_numpy(np.float64)
        # NaN/inf lon-lat must NOT silently encode (the int64 cast would clip
        # to a valid-looking face-boundary cell, corrupting the index for
        # untagged rows) — emit NULL instead
        bad = ~(np.isfinite(lo) & np.isfinite(la))
        ids = s2_sortable(
            np_s2_cell(np.where(bad, 0.0, lo), np.where(bad, 0.0, la), level)
        )
        out = pd.array(ids, dtype="Int64")
        out[bad] = pd.NA
        return pd.Series(out)

    return _enc
