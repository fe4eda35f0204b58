"""Geohash encode/decode as pure Spark column math (no UDF).

Geohash (public domain, Niemeyer 2008) bisects lon/lat alternately starting
with longitude and emits 5-bit base32 characters. For precision ``p`` chars
(n = 5p bits, lon gets ceil(n/2) bits, lat floor(n/2)) the cell integers are

    ix = floor((lon + 180) / 360 * 2^lon_bits)
    iy = floor((lat +  90) / 180 * 2^lat_bits)

interleaved MSB-first (lon first) — the same Morton shift-or chain the
quadkey uses (geo/tiles.py:65) — then grouped into 5-bit alphabet lookups.
Everything is JVM-side integer math inside whole-stage codegen; the numpy
twins back the pytest oracle and the SQL twin backs the DuckDB oracle.

The reference has no geohash (it keys tiles by XYZ/quadkey only); this adds
the third index family (quadkey, S2, geohash) so tables can be sorted /
range-partitioned by whichever locality key downstream systems expect.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"

#: default precision: 8 chars ~ 38m x 19m cells
PRECISION = 8


def _bit_counts(precision: int) -> tuple[int, int, int]:
    n = 5 * precision
    lon_bits = (n + 1) // 2
    lat_bits = n // 2
    return n, lon_bits, lat_bits


def geohash_encode(
    lon: Column | str, lat: Column | str, precision: int = PRECISION
) -> Column:
    """Geohash string column — integer bisection + Morton + base32 lookup."""
    n, lon_bits, lat_bits = _bit_counts(precision)
    lon = F.col(lon) if isinstance(lon, str) else lon
    lat = F.col(lat) if isinstance(lat, str) else lat
    nx, ny = 1 << lon_bits, 1 << lat_bits
    ix = F.least(
        F.greatest(F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(nx))), F.lit(0)),
        F.lit(nx - 1),
    ).cast("long")
    iy = F.least(
        F.greatest(F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(ny))), F.lit(0)),
        F.lit(ny - 1),
    ).cast("long")
    # MSB-first alternation lon,lat,lon,... == lon at odd Morton positions
    # when lon_bits == lat_bits (even n); for odd n lon has one extra low bit
    # handled by the general formula below.
    morton = F.lit(0).cast("long")
    for b in range(lat_bits):
        morton = (
            morton
            + F.shiftleft(F.shiftright(iy, b) % 2, 2 * b + (0 if n % 2 == 0 else 1))
        )
    for b in range(lon_bits):
        morton = (
            morton
            + F.shiftleft(F.shiftright(ix, b) % 2, 2 * b + (1 if n % 2 == 0 else 0))
        )
    chars = [
        F.get(
            F.lit(list(ALPHABET)),
            (F.shiftright(morton, n - 5 * (g + 1)) % 32).cast("int"),
        )
        for g in range(precision)
    ]
    return F.concat(*chars)


def np_geohash(lon: np.ndarray, lat: np.ndarray, precision: int = PRECISION):
    """Vectorized numpy twin (pytest oracle)."""
    n, lon_bits, lat_bits = _bit_counts(precision)
    nx, ny = 1 << lon_bits, 1 << lat_bits
    ix = np.clip(
        np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / 360.0 * nx), 0, nx - 1
    ).astype(np.int64)
    iy = np.clip(
        np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / 180.0 * ny), 0, ny - 1
    ).astype(np.int64)
    morton = np.zeros_like(ix)
    for b in range(lat_bits):
        morton |= ((iy >> b) & 1) << (2 * b + (0 if n % 2 == 0 else 1))
    for b in range(lon_bits):
        morton |= ((ix >> b) & 1) << (2 * b + (1 if n % 2 == 0 else 0))
    out = []
    for m in morton:
        out.append(
            "".join(ALPHABET[(int(m) >> (n - 5 * (g + 1))) & 31] for g in range(precision))
        )
    return np.array(out)


def geohash_sql(lon: str, lat: str, precision: int = PRECISION) -> str:
    """DuckDB twin — same integer math as :func:`geohash_encode`."""
    n, lon_bits, lat_bits = _bit_counts(precision)
    nx, ny = 1 << lon_bits, 1 << lat_bits
    ix = f"least(greatest(cast(floor(({lon} + 180.0) / 360.0 * {nx}) as bigint), 0), {nx - 1})"
    iy = f"least(greatest(cast(floor(({lat} + 90.0) / 180.0 * {ny}) as bigint), 0), {ny - 1})"
    terms = []
    for b in range(lat_bits):
        terms.append(f"((({iy} >> {b}) & 1) << {2 * b + (0 if n % 2 == 0 else 1)})")
    for b in range(lon_bits):
        terms.append(f"((({ix} >> {b}) & 1) << {2 * b + (1 if n % 2 == 0 else 0)})")
    morton = "(" + " + ".join(terms) + ")"
    chars = [
        f"substring('{ALPHABET}', cast((({morton} >> {n - 5 * (g + 1)}) & 31) as int) + 1, 1)"
        for g in range(precision)
    ]
    return "(" + " || ".join(chars) + ")"


def geohash_bounds(gh: Column | str, precision: int = PRECISION) -> list[Column]:
    """Inverse: (west, south, east, north) of a geohash cell — de-interleave
    via the static bit loop, then the bisection box. Precision must match
    the encoded string length."""
    n, lon_bits, lat_bits = _bit_counts(precision)
    gh = F.col(gh) if isinstance(gh, str) else gh
    morton = F.lit(0).cast("long")
    for g in range(precision):
        ch = F.substring(gh, g + 1, 1)
        # alphabet rank via a literal-array position scan (no UDF)
        idx = F.array_position(F.lit(list(ALPHABET)), ch).cast("long") - F.lit(1)
        morton = morton + F.shiftleft(idx, n - 5 * (g + 1))
    ix = F.lit(0).cast("long")
    iy = F.lit(0).cast("long")
    for b in range(lon_bits):
        ix = ix + F.shiftleft(
            F.shiftright(morton, 2 * b + (1 if n % 2 == 0 else 0)) % 2, b
        )
    for b in range(lat_bits):
        iy = iy + F.shiftleft(
            F.shiftright(morton, 2 * b + (0 if n % 2 == 0 else 1)) % 2, b
        )
    nx, ny = float(1 << lon_bits), float(1 << lat_bits)
    west = ix.cast("double") / F.lit(nx) * F.lit(360.0) - F.lit(180.0)
    east = (ix.cast("double") + F.lit(1.0)) / F.lit(nx) * F.lit(360.0) - F.lit(180.0)
    south = iy.cast("double") / F.lit(ny) * F.lit(180.0) - F.lit(90.0)
    north = (iy.cast("double") + F.lit(1.0)) / F.lit(ny) * F.lit(180.0) - F.lit(90.0)
    return [west, south, east, north]
