"""Slippy-map XYZ tile + quadkey math as pure Spark column expressions.

The tile formulas are the semantic contract with the reference — its
``_bbox_to_tile_coords`` (/root/reference/landlensdb/handlers/cloud.py:860-887):

    x = int((lon + 180) / 360 * 2**z)
    y = int((1 - asinh(tan(radians(lat))) / pi) / 2 * 2**z)

and the inverse ``_tile_to_bbox`` (cloud.py:889-911):

    west = x / n * 360 - 180
    lat  = degrees(atan(sinh(pi * (1 - 2 * y / n))))

Everything here is JVM-side column math inside whole-stage codegen — no UDF.
The quadkey (bit-interleave of x,y) gives a single sortable long per tile so
tile tables can be range-partitioned / sorted for locality.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

#: Reference coverage-tile zoom (cloud.py:86).
ZOOM_LEVEL = 14


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tile_x(lon: Column | str, zoom: int = ZOOM_LEVEL) -> Column:
    """Slippy tile x — exact reference formula (cloud.py:869), clamped to [0, n-1]."""
    n = 2 ** zoom
    raw = F.floor((_c(lon) + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n)))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n - 1)).cast("long")


def tile_y(lat: Column | str, zoom: int = ZOOM_LEVEL) -> Column:
    """Slippy tile y — exact reference formula (cloud.py:870-873), clamped."""
    n = 2 ** zoom
    lat_r = F.radians(_c(lat))
    raw = F.floor(
        (F.lit(1.0) - F.asinh(F.tan(lat_r)) / F.lit(math.pi)) / F.lit(2.0) * F.lit(float(n))
    )
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n - 1)).cast("long")


def tile_bounds(x: Column | str, y: Column | str, zoom: int = ZOOM_LEVEL) -> list[Column]:
    """Inverse: tile -> (west, south, east, north) degrees (cloud.py:889-911)."""
    n = float(2 ** zoom)
    x, y = _c(x).cast("double"), _c(y).cast("double")
    west = x / F.lit(n) * F.lit(360.0) - F.lit(180.0)
    east = (x + F.lit(1.0)) / F.lit(n) * F.lit(360.0) - F.lit(180.0)
    north = F.degrees(F.atan(F.sinh(F.lit(math.pi) * (F.lit(1.0) - F.lit(2.0) * y / F.lit(n)))))
    south = F.degrees(
        F.atan(F.sinh(F.lit(math.pi) * (F.lit(1.0) - F.lit(2.0) * (y + F.lit(1.0)) / F.lit(n))))
    )
    return [west, south, east, north]


def quadkey(x: Column | str, y: Column | str, zoom: int = ZOOM_LEVEL) -> Column:
    """Sortable long quadkey: zoom in the top 6 bits, Morton(x, y) below.

    Bit-interleave via a shift-or chain (JVM-side, codegen-friendly): for each
    bit position b of x and y, place x-bit at 2b+1 and y-bit at 2b (Bing-maps
    quadkey digit order: digit = 2*xbit + ybit reading from the high bit).
    """
    xb, yb = _c(x).cast("long"), _c(y).cast("long")
    morton = F.lit(0).cast("long")
    for b in range(zoom):
        morton = (
            morton
            + F.shiftleft(F.shiftright(xb, b) % 2, 2 * b + 1)
            + F.shiftleft(F.shiftright(yb, b) % 2, 2 * b)
        )
    return (F.lit(zoom).cast("long") * F.lit(1 << 58) + morton).cast("long")


def with_tile(df, lon: str = "lon", lat: str = "lat", zoom: int = ZOOM_LEVEL):
    """Attach tile_z / tile_x / tile_y / quadkey columns (pure column math)."""
    return (
        df.withColumn("tile_z", F.lit(zoom))
        .withColumn("tile_x", tile_x(lon, zoom))
        .withColumn("tile_y", tile_y(lat, zoom))
        .withColumn("quadkey", quadkey("tile_x", "tile_y", zoom))
    )


# ---------------------------------------------------------------------------
# numpy twins (used by oracles in tests and by cell covers)
# ---------------------------------------------------------------------------

def np_tile_xy(lon: np.ndarray, lat: np.ndarray, zoom: int = ZOOM_LEVEL):
    """Vectorized numpy twin of tile_x/tile_y — the golden oracle formula."""
    n = 2 ** zoom
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = np.floor((lon + 180.0) / 360.0 * n)
    y = np.floor((1.0 - np.arcsinh(np.tan(np.radians(lat))) / math.pi) / 2.0 * n)
    x = np.clip(x, 0, n - 1).astype(np.int64)
    y = np.clip(y, 0, n - 1).astype(np.int64)
    return x, y


def np_tile_west(x: np.ndarray, zoom: int) -> np.ndarray:
    """West edge longitude of tile column ``x`` (inverse Mercator,
    cloud.py:889-911). Pass x+1 for the east edge."""
    n = float(2**zoom)
    return np.asarray(x, dtype=np.float64) / n * 360.0 - 180.0


def np_tile_north(y: np.ndarray, zoom: int) -> np.ndarray:
    """North edge latitude of tile row ``y``. Pass y+1 for the south edge."""
    n = float(2**zoom)
    return np.degrees(
        np.arctan(np.sinh(math.pi * (1.0 - 2.0 * np.asarray(y, dtype=np.float64) / n)))
    )


def np_quadkey(x: np.ndarray, y: np.ndarray, zoom: int = ZOOM_LEVEL) -> np.ndarray:
    """Vectorized numpy twin of :func:`quadkey`."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    morton = np.zeros_like(x)
    for b in range(zoom):
        morton |= (((x >> b) & 1) << (2 * b + 1)) | (((y >> b) & 1) << (2 * b))
    return (np.int64(zoom) << 58) + morton
