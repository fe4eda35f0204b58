"""Polygon measures over ring coordinate arrays — pure column math.

Rings use the engine-wide representation ``array<array<double>>`` (closed
[[x,y],...], last point == first) that the PIP join and admin-polygon
tables already carry (/root/reference/landlensdb/geoclasses/... stores
shapely geometries and delegates area/centroid to GEOS; here the shoelace
and centroid formulas run as Catalyst higher-order functions — no UDF, no
shuffle).

Formulas (planar, signed):
  cross_i = x_i * y_{i+1} - x_{i+1} * y_i
  area    = sum(cross_i) / 2                       (positive for CCW rings)
  cx      = sum((x_i + x_{i+1}) * cross_i) / (6 * area)
  cy      = sum((y_i + y_{i+1}) * cross_i) / (6 * area)

All three sums accumulate in ONE fold over the vertex array (higher-order
aggregates are interpreted, not codegen'd, so every extra fold is real
per-row CPU), and degenerate rings (< 4 points — not a closed polygon)
yield NULL stats instead of aborting the job on an array index error.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _pt(ring: Column, i: Column) -> Column:
    """i-th ring point (0-based) as array<double> [x, y]."""
    return F.element_at(ring, i + 1)


def ring_stats(ring: Column) -> Column:
    """struct<area double, cx double, cy double> via a single fold; NULL
    for degenerate rings (fewer than 4 points: a closed ring is at least
    a triangle [p0, p1, p2, p0])."""
    idx = F.sequence(F.lit(0), F.size(ring) - 2)

    def step(acc: Column, i: Column) -> Column:
        x0, y0 = _pt(ring, i)[0], _pt(ring, i)[1]
        x1, y1 = _pt(ring, i + 1)[0], _pt(ring, i + 1)[1]
        cross = x0 * y1 - x1 * y0
        return F.struct(
            (acc["a2"] + cross).alias("a2"),
            (acc["sx"] + (x0 + x1) * cross).alias("sx"),
            (acc["sy"] + (y0 + y1) * cross).alias("sy"),
        )

    zero = F.struct(
        F.lit(0.0).alias("a2"), F.lit(0.0).alias("sx"), F.lit(0.0).alias("sy")
    )
    tot = F.aggregate(idx, zero, step)
    area = tot["a2"] / F.lit(2.0)
    return F.when(
        F.size(ring) >= 4,
        F.struct(
            area.alias("area"),
            (tot["sx"] / (F.lit(6.0) * area)).alias("cx"),
            (tot["sy"] / (F.lit(6.0) * area)).alias("cy"),
        ),
    )


def ring_area(ring: Column) -> Column:
    """Signed shoelace area of a closed ring (CCW positive); NULL for
    degenerate rings."""
    return ring_stats(ring)["area"]


def ring_centroid(ring: Column) -> Column:
    """Centroid as struct<cx double, cy double>; NULL for degenerate or
    zero-area rings (division yields null/NaN there — callers filter
    broken geometry first, like validate_lines)."""
    s = ring_stats(ring)
    return F.struct(s["cx"].alias("cx"), s["cy"].alias("cy"))


def with_shape_stats(df, ring_col: str = "ring"):
    """Attach (area double, cx double, cy double) columns — the shared
    fold is materialized once per row in its own projection (Catalyst's
    CollapseProject keeps non-cheap producer expressions single-use)."""
    return (
        df.withColumn("_st", ring_stats(F.col(ring_col)))
        .select(
            "*",
            F.col("_st")["area"].alias("area"),
            F.col("_st")["cx"].alias("cx"),
            F.col("_st")["cy"].alias("cy"),
        )
        .drop("_st")
    )
