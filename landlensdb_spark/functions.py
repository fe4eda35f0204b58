"""Scalar-function toolkit: the SURVEY §2.8 odds and ends.

Column-expression analogs of the reference's scalar helpers that don't
belong to a bigger operator module: timezone-localized rendering (F7/F8),
date parsing (F9/F10), bbox quad-split (F13), dict->JSON (F22), string ops
(F23), numeric cleaning (F24), file-extension predicate (P9).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# --- F7/F8: epoch/UTC timestamp -> local time of the point -----------------
#
# The reference looks up the IANA zone of each lat/lon with timezonefinder
# (image.py:352-366, cloud.py:1047-1074). The engine's real resolver is the
# PIP join against the tz polygon table (landlensdb_spark.tz.with_timezone);
# the nautical rule here (UTC offset = round(lon / 15) hours) is its
# outside-every-zone / ocean FALLBACK, matching the reference's behavior
# when timezonefinder returns None.

def nautical_offset_hours(lon: Column | str) -> Column:
    lon = F.col(lon) if isinstance(lon, str) else lon
    return F.round(lon / F.lit(15.0), 0).cast("int")


def tz_name_for(lon: Column | str) -> Column:
    """'Etc/GMT-N' style zone name from longitude (nautical fallback)."""
    off = nautical_offset_hours(lon)
    # IANA Etc/GMT signs are inverted: Etc/GMT-5 means UTC+5
    return F.concat(
        F.lit("Etc/GMT"),
        F.when(off > 0, F.concat(F.lit("-"), off.cast("string")))
        .when(off < 0, F.concat(F.lit("+"), (-off).cast("string")))
        .otherwise(F.lit("+0")),
    )


def localized_iso(ts: Column | str, lon: Column | str) -> Column:
    """UTC timestamp -> ISO-8601 string in the point's local zone — the
    reference's captured_at rendering (cloud.py:1047-1074)."""
    ts = F.col(ts) if isinstance(ts, str) else ts
    # date_format's XXX renders the SESSION zone's offset, not the zone
    # from_utc_timestamp shifted into — build the ISO offset suffix ourselves.
    off = nautical_offset_hours(lon)
    pad2 = F.lpad(F.abs(off).cast("string"), 2, "0")
    suffix = F.when(off == 0, F.lit("Z")).otherwise(
        F.concat(F.when(off > 0, F.lit("+")).otherwise(F.lit("-")), pad2, F.lit(":00"))
    )
    return F.concat(
        F.date_format(
            F.from_utc_timestamp(ts, tz_name_for(lon)), "yyyy-MM-dd'T'HH:mm:ss"
        ),
        suffix,
    )


# --- F9/F10: date-string parsing --------------------------------------------

def date_to_epoch_ms(date_str: Column | str, end_of_day: bool = False) -> Column:
    """'yyyy-MM-dd' -> epoch millis; optionally 23:59:59.999 end-of-day
    (cloud.py:1002-1022)."""
    c = F.col(date_str) if isinstance(date_str, str) else date_str
    ts = F.to_timestamp(c, "yyyy-MM-dd")
    if end_of_day:
        ts = F.timestamp_millis(F.unix_millis(ts) + F.lit(86_399_999))
    return F.unix_millis(ts)


def exif_datetime(ts_str: Column | str) -> Column:
    """EXIF 'yyyy:MM:dd HH:mm:ss' parse (image.py:352-366)."""
    c = F.col(ts_str) if isinstance(ts_str, str) else ts_str
    return F.to_timestamp(c, "yyyy:MM:dd HH:mm:ss")


# --- F13: bbox quad-split ----------------------------------------------------

def quad_split(df: DataFrame, minx="minx", miny="miny", maxx="maxx", maxy="maxy") -> DataFrame:
    """Explode each bbox row into its 4 equal quadrants (cloud.py:981-1000) —
    the overflow-splitting primitive, as pure column math + explode."""
    cx = (F.col(minx) + F.col(maxx)) / 2
    cy = (F.col(miny) + F.col(maxy)) / 2
    quads = F.array(
        F.struct(F.col(minx).alias("minx"), F.col(miny).alias("miny"), cx.alias("maxx"), cy.alias("maxy")),
        F.struct(cx.alias("minx"), F.col(miny).alias("miny"), F.col(maxx).alias("maxx"), cy.alias("maxy")),
        F.struct(F.col(minx).alias("minx"), cy.alias("miny"), cx.alias("maxx"), F.col(maxy).alias("maxy")),
        F.struct(cx.alias("minx"), cy.alias("miny"), F.col(maxx).alias("maxx"), F.col(maxy).alias("maxy")),
    )
    other = [c for c in df.columns if c not in (minx, miny, maxx, maxy)]
    return df.select(*other, F.explode(quads).alias("_q")).select(
        *other, "_q.minx", "_q.miny", "_q.maxx", "_q.maxy"
    )


# --- F22: dict/map columns -> JSON strings (db.py:51-65) --------------------

def jsonify_map_cols(df: DataFrame, cols: list[str]) -> DataFrame:
    for c in cols:
        df = df.withColumn(c, F.to_json(F.col(c)))
    return df


# --- F23: naming / url string ops -------------------------------------------

def mly_name(id_col: Column | str) -> Column:
    """name = 'mly|<id>' (cloud.py:255)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.concat(F.lit("mly|"), c.cast("string"))


def url_stem(url: Column | str) -> Column:
    """filename stem from a URL: last path segment before the extension
    (geoimageframe.py:285-287)."""
    c = F.col(url) if isinstance(url, str) else url
    return F.regexp_extract(c, r"([^/]+?)(\.[^/.]*)?$", 1)


def is_downloadable(url: Column | str) -> Column:
    """http(s) + non-placeholder guard (geoimageframe.py:276-282)."""
    c = F.col(url) if isinstance(url, str) else url
    return c.isNotNull() & c.startswith("http") & ~c.contains("placeholder")


# --- F24: numeric coercion / cleaning (test_tutorial_core.py:98-124) --------

def clean_double(col: Column | str) -> Column:
    """to_numeric(errors='coerce') + ±inf -> NULL."""
    c = F.col(col) if isinstance(col, str) else col
    # try_cast: ANSI-mode cast throws on malformed strings; coerce means NULL
    d = c.try_cast("double")
    return F.when(F.isnan(d) | d.isin(float("inf"), float("-inf")), None).otherwise(d)


# --- P9: file-extension predicate (image.py:323) ----------------------------

def has_image_ext(path: Column | str) -> Column:
    c = F.col(path) if isinstance(path, str) else path
    return F.lower(c).rlike(r"\.(png|jpe?g)$")


# --- F5: camera-type inference (image.py:43-67, table image.py:17-19) -------

#: the reference's known-360 camera table (image.py:17-19).
KNOWN_360_MODELS = ("RICOH THETA SC", "RICOH THETA S", "RICOH THETA V", "RICOH THETA X")


def camera_type(focal: Column | str, model: Column | str) -> Column:
    """model∈known-360 -> '360-degree'; focal < 1.5 -> 'fisheye'; else
    'perspective'; NULL when both inputs are missing/falsy (the reference
    returns NaN then, image.py:55-56; its focal-None-with-model path raises —
    here a NULL focal with a non-360 model yields 'perspective', the
    well-defined branch)."""
    f = F.col(focal) if isinstance(focal, str) else focal
    m = F.col(model) if isinstance(model, str) else model
    no_f = f.isNull() | (f == 0.0)
    no_m = m.isNull() | (m == "")
    return (
        F.when(no_f & no_m, F.lit(None).cast("string"))
        .when(m.isin(*KNOWN_360_MODELS), "360-degree")
        .when(f < 1.5, "fisheye")
        .otherwise("perspective")
    )


# --- F6: camera-parameters CSV (image.py:343-350; cloud.py:284-287) ---------

def camera_params_csv(focal: Column | str, k1: Column | str, k2: Column | str) -> Column:
    """``"focal,k1,k2"``; NULL if ANY component is missing (the reference's
    `None in [...] -> NaN` gate — concat_ws alone would silently skip NULLs)."""
    cols = [F.col(c) if isinstance(c, str) else c for c in (focal, k1, k2)]
    any_null = cols[0].isNull() | cols[1].isNull() | cols[2].isNull()
    return F.when(any_null, F.lit(None).cast("string")).otherwise(
        F.concat_ws(",", *[c.cast("string") for c in cols])
    )
