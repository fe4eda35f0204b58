"""Polygon measures over ring coordinate arrays — pure column math.

Rings use the engine-wide representation ``array<array<double>>`` (closed
[[x,y],...], last point == first) that the PIP join and admin-polygon
tables already carry (/root/reference/landlensdb/geoclasses/... stores
shapely geometries and delegates area/centroid to GEOS; here the shoelace
and centroid formulas run as Catalyst higher-order functions — no UDF, no
shuffle, whole-stage codegen).

Formulas (planar, signed):
  cross_i = x_i * y_{i+1} - x_{i+1} * y_i
  area    = sum(cross_i) / 2                       (positive for CCW rings)
  cx      = sum((x_i + x_{i+1}) * cross_i) / (6 * area)
  cy      = sum((y_i + y_{i+1}) * cross_i) / (6 * area)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _pt(ring: Column, i: Column) -> Column:
    """i-th ring point (0-based) as array<double> [x, y]."""
    return F.element_at(ring, i + 1)


def _cross_terms(ring: Column) -> Column:
    """array of cross_i for i in [0, n-2] (ring closed: last == first)."""
    idx = F.sequence(F.lit(0), F.size(ring) - 2)
    return F.transform(
        idx,
        lambda i: _pt(ring, i)[0] * _pt(ring, i + 1)[1]
        - _pt(ring, i + 1)[0] * _pt(ring, i)[1],
    )


def ring_area(ring: Column) -> Column:
    """Signed shoelace area of a closed ring (CCW positive)."""
    return (
        F.aggregate(_cross_terms(ring), F.lit(0.0), lambda a, x: a + x) / F.lit(2.0)
    )


def ring_centroid(ring: Column) -> Column:
    """Centroid as struct<cx double, cy double> (undefined for zero-area
    rings — callers filter degenerate geometry first, like validate_lines)."""
    idx = F.sequence(F.lit(0), F.size(ring) - 2)
    a = ring_area(ring)
    sx = F.aggregate(
        F.transform(
            idx,
            lambda i: (_pt(ring, i)[0] + _pt(ring, i + 1)[0])
            * (
                _pt(ring, i)[0] * _pt(ring, i + 1)[1]
                - _pt(ring, i + 1)[0] * _pt(ring, i)[1]
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sy = F.aggregate(
        F.transform(
            idx,
            lambda i: (_pt(ring, i)[1] + _pt(ring, i + 1)[1])
            * (
                _pt(ring, i)[0] * _pt(ring, i + 1)[1]
                - _pt(ring, i + 1)[0] * _pt(ring, i)[1]
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.struct(
        (sx / (F.lit(6.0) * a)).alias("cx"),
        (sy / (F.lit(6.0) * a)).alias("cy"),
    )


def with_shape_stats(df, ring_col: str = "ring"):
    """Attach (area double, cx double, cy double) columns."""
    c = ring_centroid(F.col(ring_col))
    return (
        df.withColumn("area", ring_area(F.col(ring_col)))
        .withColumn("cx", c["cx"])
        .withColumn("cy", c["cy"])
    )
