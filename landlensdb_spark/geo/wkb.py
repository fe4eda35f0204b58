"""WKB / WKT point geometry round-trip — no shapely required.

The reference round-trips geometries through PostGIS as WKB
(/root/reference/landlensdb/handlers/db.py:147-154, rejecting non-Points)
and stringifies Points to WKT before writes (db.py:36-49,
geoimageframe.py:117-121). Points are the only geometry the engine's row
tables carry (SURVEY.md §1.1), so the codec is 21 bytes of struct layout —
implemented vectorized in numpy (batch) and as column expressions (WKT).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StructField, StructType, DoubleType

_WKB_POINT_LE = 1  # little-endian, geometry type 1 = Point


def point_wkb(lon: float, lat: float) -> bytes:
    """One WGS84 point -> little-endian WKB (21 bytes)."""
    return struct.pack("<BIdd", 1, _WKB_POINT_LE, lon, lat)


def np_points_to_wkb(lon: np.ndarray, lat: np.ndarray) -> list[bytes]:
    """Vectorized batch encode: one contiguous byte matrix, then split."""
    n = len(lon)
    buf = np.zeros((n, 21), dtype=np.uint8)
    buf[:, 0] = 1
    buf[:, 1] = 1  # uint32 LE type=1: bytes 1..4 = 01 00 00 00
    buf[:, 5:13] = np.asarray(lon, dtype="<f8").view(np.uint8).reshape(n, 8)
    buf[:, 13:21] = np.asarray(lat, dtype="<f8").view(np.uint8).reshape(n, 8)
    return [bytes(row) for row in buf]


def np_wkb_to_points(wkbs: "pd.Series") -> tuple[np.ndarray, np.ndarray]:
    """Vectorized decode; raises on non-Point geometries like the reference
    (db.py:151-153 'Non-Point geometry found')."""
    n = len(wkbs)
    mat = np.frombuffer(b"".join(wkbs), dtype=np.uint8).reshape(n, 21)
    geom_type = mat[:, 1:5].copy().view("<u4").ravel()
    if not (geom_type == _WKB_POINT_LE).all():
        raise ValueError("Non-Point geometry found in the database.")
    lon = mat[:, 5:13].copy().view("<f8").ravel()
    lat = mat[:, 13:21].copy().view("<f8").ravel()
    return lon, lat


@F.pandas_udf(BinaryType())
def wkb_udf(lon: pd.Series, lat: pd.Series) -> pd.Series:
    return pd.Series(np_points_to_wkb(lon.to_numpy(), lat.to_numpy()))


_POINT_STRUCT = StructType(
    [StructField("lon", DoubleType()), StructField("lat", DoubleType())]
)


@F.pandas_udf(_POINT_STRUCT)
def wkb_decode_udf(wkb: pd.Series) -> pd.DataFrame:
    lon, lat = np_wkb_to_points(wkb)
    return pd.DataFrame({"lon": lon, "lat": lat})


def wkt_point(lon: Column | str, lat: Column | str, precision: int = 6) -> Column:
    """'POINT (x y)' column expression (pure string math, codegen) —
    db.py:36-49 / geoimageframe.py:117-121 semantics."""
    lon = F.col(lon) if isinstance(lon, str) else lon
    lat = F.col(lat) if isinstance(lat, str) else lat
    return F.concat(
        F.lit("POINT ("),
        F.format_number(lon, precision).cast("string"),
        F.lit(" "),
        F.format_number(lat, precision).cast("string"),
        F.lit(")"),
    )


def with_wkb(df: DataFrame, lon: str = "lon", lat: str = "lat") -> DataFrame:
    return df.withColumn("geometry_wkb", wkb_udf(F.col(lon), F.col(lat)))


def decode_wkb(df: DataFrame, wkb_col: str = "geometry_wkb") -> DataFrame:
    dec = wkb_decode_udf(F.col(wkb_col))
    return df.withColumn("lon", dec["lon"]).withColumn("lat", dec["lat"])
