"""Great-circle (spherical) distance — pure column math.

The planar EPSG:3857 metric the snap/kNN operators use is exact for their
small-tolerance refinements but distorts with latitude; corpus-level
distance reporting (how far is this photo from that admin centroid?) wants
the spherical haversine instead (the standard public formula; the
reference delegates to geopandas/GEOS for its distance needs).

All transcendentals run JVM-side in whole-stage codegen. Cross-engine
float caveat: sin/cos may differ from another engine's libm in the last
ulp, so comparisons round the OUTPUT (a 1-ulp input wiggle moves the
result by ~1e-9 m — far below any sane rounding grid).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: mean Earth radius (IUGG), meters — the conventional haversine radius
R_MEAN = 6_371_008.8


def haversine_m(
    lon1: Column, lat1: Column, lon2: Column, lat2: Column
) -> Column:
    """Great-circle distance in meters between two lon/lat degree pairs."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dp, dl = F.radians(lat2 - lat1), F.radians(lon2 - lon1)
    a = (
        F.sin(dp / 2) * F.sin(dp / 2)
        + F.cos(p1) * F.cos(p2) * F.sin(dl / 2) * F.sin(dl / 2)
    )
    # clamp guards fp drift at antipodes (a slightly > 1 -> asin NaN);
    # NOT F.least: least/greatest SKIP nulls, so a null coordinate would
    # silently clamp to 1.0 and yield a phantom half-circumference instead
    # of propagating NULL
    clamped = F.when(a > 1.0, F.lit(1.0)).otherwise(a)
    return F.lit(2.0 * R_MEAN) * F.asin(F.sqrt(clamped))


def haversine_sql(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    """The same formula as ANSI SQL (the DuckDB oracle twin). The clamp is
    a CASE, not least(): DuckDB's least() also skips NULLs, which would
    turn a null coordinate into a phantom half-circumference exactly like
    the Spark bug this mirrors (null in -> null out on both engines)."""
    a = (
        f"(sin(radians(({lat2}) - ({lat1})) / 2) * sin(radians(({lat2}) - ({lat1})) / 2)"
        f" + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * sin(radians(({lon2}) - ({lon1})) / 2) * sin(radians(({lon2}) - ({lon1})) / 2))"
    )
    return (
        f"2.0 * {R_MEAN!r} * asin(sqrt(CASE WHEN {a} > 1.0 THEN 1.0 ELSE {a} END))"
    )


def bearing_deg(
    lon1: Column, lat1: Column, lon2: Column, lat2: Column
) -> Column:
    """Forward azimuth in degrees [0, 360) — the column twin of
    geo/geometry.bearing (same formula the reference's heading logic
    uses, snap.py:147-153)."""
    dlon = F.radians(lon2 - lon1)
    x = F.sin(dlon) * F.cos(F.radians(lat2))
    y = F.cos(F.radians(lat1)) * F.sin(F.radians(lat2)) - F.sin(
        F.radians(lat1)
    ) * F.cos(F.radians(lat2)) * F.cos(dlon)
    return F.pmod(F.degrees(F.atan2(x, y)) + F.lit(360.0), F.lit(360.0))


def bearing_sql(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    """The same azimuth as ANSI SQL (DuckDB oracle twin)."""
    dlon = f"radians(({lon2}) - ({lon1}))"
    x = f"sin({dlon}) * cos(radians({lat2}))"
    y = (
        f"cos(radians({lat1})) * sin(radians({lat2}))"
        f" - sin(radians({lat1})) * cos(radians({lat2})) * cos({dlon})"
    )
    return f"(degrees(atan2({x}, {y})) + 360.0) % 360.0"


def align_heading_col(seg_bearing: Column, compass: Column) -> Column:
    """Segment bearing or its reverse, whichever is angularly closer to
    the compass angle — column twin of geo/geometry.align_heading. A NULL
    compass yields NULL (without the guard, when(NULL <= NULL) is
    not-true and the otherwise() branch would return the REVERSE bearing
    as confident garbage — missing camera headings are routine)."""
    rev = F.pmod(seg_bearing + F.lit(180.0), F.lit(360.0))
    d_fwd = F.abs(
        F.pmod(seg_bearing - compass + F.lit(180.0), F.lit(360.0)) - F.lit(180.0)
    )
    d_rev = F.abs(F.pmod(rev - compass + F.lit(180.0), F.lit(360.0)) - F.lit(180.0))
    return F.when(compass.isNull() | seg_bearing.isNull(), F.lit(None)).otherwise(
        F.when(d_fwd <= d_rev, seg_bearing).otherwise(rev)
    )


def align_heading_sql(b: str, compass: str) -> str:
    """SQL twin of align_heading_col; the double-%% makes the modulo
    non-negative like Spark's pmod (plain %% keeps the dividend's sign)."""

    def pmod(x: str) -> str:
        return f"((({x}) % 360.0 + 360.0) % 360.0)"

    rev = pmod(f"({b}) + 180.0")
    d_fwd = f"abs({pmod(f'({b}) - ({compass}) + 180.0')} - 180.0)"
    d_rev = f"abs({pmod(f'{rev} - ({compass}) + 180.0')} - 180.0)"
    # NULL guard mirrors align_heading_col: without it a NULL compass makes
    # the d_fwd comparison not-true and the ELSE returns the REVERSE bearing
    # as confident garbage while the Spark twin returns NULL
    return (
        f"CASE WHEN ({compass}) IS NULL OR ({b}) IS NULL THEN NULL"
        f" WHEN {d_fwd} <= {d_rev} THEN ({b}) ELSE {rev} END"
    )


def np_haversine_m(lon1, lat1, lon2, lat2):
    """numpy twin for tests."""
    import numpy as np

    p1, p2 = np.radians(lat1), np.radians(lat2)
    dp = np.radians(np.asarray(lat2) - np.asarray(lat1))
    dl = np.radians(np.asarray(lon2) - np.asarray(lon1))
    a = np.sin(dp / 2) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2) ** 2
    return 2.0 * R_MEAN * np.arcsin(np.sqrt(np.minimum(a, 1.0)))
