"""Per-group convex hull — the extreme points of each entity's point
cloud (coverage footprints, per-source spatial extents).

The reference's footprint story is bounds aggregation (min/max boxes,
total_bounds in geopandas); the hull is the tighter footprint the same
users reach for next (geopandas `unary_union.convex_hull`). Here it is a
distributed per-group operator: the GROUP is the distribution axis (one
footprint per source/admin/cluster — thousands of small point sets, not
one huge one), each group's hull computed in one vectorized numpy kernel
inside a single ``applyInPandas`` stage. One shuffle total; no driver
loop; a loud size guard refuses groups too large for one task (pre-thin
dense groups with ``geo.cells`` / ``tile_assign`` binning first — hull
of bin representatives bounds the true hull within one bin diagonal).

Output: the EXTREME points only (rows ``group?, x, y``) — vertices of
the minimal convex polygon; collinear boundary points and interior
points drop. That definition ("p is a vertex iff p is not in the convex
hull of the other points") is what the driver oracle checks via
Caratheodory's theorem, with no hull algorithm at all: in the plane,
p lies in conv(S \\ {p}) iff it lies in a closed triangle of three other
points (non-degenerate witnesses), or on a closed segment between two
other points (the affinely-dependent case). Both tests are pure sign
arithmetic — exact under IEEE doubles on the integer-derived synthetic
coordinates — so the oracle is an independent O(n^4) characterization,
not a SQL transcription of Andrew's monotone chain.

Monotone chain (Andrew 1979, public) with strict-turn popping (cross
<= 0 pops), so collinear edge points are excluded — matching the
extreme-point definition exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: refuse single-task hulls beyond this many points per group — at that
#: size the caller should thin with a grid first (see module docstring).
MAX_GROUP_POINTS = 5_000_000


def _chain_half(pts: np.ndarray) -> list[int]:
    """Indices of one hull chain over lexicographically sorted points;
    cross <= 0 pops, so collinear points never survive."""
    out: list[int] = []
    for i in range(len(pts)):
        while len(out) >= 2:
            o, a = pts[out[-2]], pts[out[-1]]
            cross = (a[0] - o[0]) * (pts[i][1] - o[1]) - (a[1] - o[1]) * (
                pts[i][0] - o[0]
            )
            if cross <= 0:
                out.pop()
            else:
                break
        out.append(i)
    return out


def np_hull(xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Boolean mask of extreme points (duplicates: every copy of an
    extreme coordinate is marked)."""
    pts = np.stack([xs, ys], axis=1)
    uniq, inverse = np.unique(pts, axis=0, return_inverse=True)
    if len(uniq) <= 2:
        return np.ones(len(pts), dtype=bool)
    lower = _chain_half(uniq)
    upper = _chain_half(uniq[::-1])
    keep = np.zeros(len(uniq), dtype=bool)
    keep[np.array(lower)] = True
    keep[len(uniq) - 1 - np.array(upper)] = True
    return keep[inverse]


def convex_hull(
    df: DataFrame, x: str = "x", y: str = "y", group: str | None = None
) -> DataFrame:
    """Rows ``(group?, x, y)`` — the distinct extreme points of each
    group's point set (all points when a group has <= 2 distinct
    points). Coordinates must be finite doubles."""
    gcols = [group] if group is not None else []
    gname = group or "_g"
    src = df if group is not None else df.withColumn(gname, F.lit(0))
    pts = src.select(gname, F.col(x).alias("_x"), F.col(y).alias("_y")).distinct()
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in pts.schema.fields
    )

    def _hull(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > MAX_GROUP_POINTS:
            raise ValueError(
                f"convex_hull: group {pdf[gname].iloc[0]!r} has {len(pdf):,} "
                f"points (> {MAX_GROUP_POINTS:,} single-task budget) — thin "
                "with a cell/tile grid first; the hull of bin representatives "
                "bounds the true hull within one bin diagonal"
            )
        xs = pdf["_x"].to_numpy(np.float64)
        ys = pdf["_y"].to_numpy(np.float64)
        if not (np.isfinite(xs).all() and np.isfinite(ys).all()):
            raise ValueError("convex_hull: non-finite coordinates")
        return pdf[np_hull(xs, ys)]

    hull = pts.groupBy(gname).applyInPandas(_hull, out_fields)
    keep = [*gcols, F.col("_x").alias(x), F.col("_y").alias(y)]
    return hull.select(*keep)


def group_diameter(
    df: DataFrame, x: str = "x", y: str = "y", group: str | None = None
) -> DataFrame:
    """Per-group farthest-pair SQUARED distance (``group?, diam2``) —
    the footprint diameter next to :func:`convex_hull`'s footprint
    shape (reference parity: geopandas users take
    ``hull.exterior`` / pairwise ``distance`` maxima over per-source
    point sets).

    The max pairwise distance of a point set is attained at two extreme
    points, so the kernel computes the hull first (Andrew's chain) and
    only then the pairwise max over the h hull vertices — O(n log n +
    h^2) per group instead of O(n^2); h is tiny (~log n for random
    sets, bounded by the hull's vertex count always). Same distribution
    axis and size guard as :func:`convex_hull`: one shuffle, one
    vectorized kernel per group.

    Squared distance (not sqrt) so the result is EXACT integer
    arithmetic on integer-lattice inputs — bit-identical to any other
    engine's brute-force max, which is precisely what the driver oracle
    runs. Groups with one distinct point report 0.0.
    """
    gcols = [group] if group is not None else []
    gname = group or "_g"
    src = df if group is not None else df.withColumn(gname, F.lit(0))
    pts = src.select(gname, F.col(x).alias("_x"), F.col(y).alias("_y")).distinct()
    gtype = dict(zip(pts.schema.names, (f.dataType.simpleString() for f in pts.schema.fields)))[gname]
    out_fields = f"{gname} {gtype}, diam2 double"

    def _diam(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > MAX_GROUP_POINTS:
            raise ValueError(
                f"group_diameter: group {pdf[gname].iloc[0]!r} has "
                f"{len(pdf):,} points (> {MAX_GROUP_POINTS:,} single-task "
                "budget) — thin with a cell/tile grid first"
            )
        xs = pdf["_x"].to_numpy(np.float64)
        ys = pdf["_y"].to_numpy(np.float64)
        if not (np.isfinite(xs).all() and np.isfinite(ys).all()):
            raise ValueError("group_diameter: non-finite coordinates")
        keep = np_hull(xs, ys)
        hx, hy = xs[keep], ys[keep]
        dx = hx[:, None] - hx[None, :]
        dy = hy[:, None] - hy[None, :]
        d2 = float((dx * dx + dy * dy).max())
        return pd.DataFrame({gname: [pdf[gname].iloc[0]], "diam2": [d2]})

    out = pts.groupBy(gname).applyInPandas(_diam, out_fields)
    return out.select(*gcols, "diam2") if group is not None else out.select("diam2")
