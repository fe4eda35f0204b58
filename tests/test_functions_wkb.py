"""Scalar-function toolkit (F7-F24 analogs) + WKB/WKT round-trip + simplify."""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from landlensdb_spark import functions as FN
from landlensdb_spark import network_prep
from landlensdb_spark.geo import wkb


def test_wkb_roundtrip_numpy():
    lon = np.array([-74.0061, 2.35, 179.999999])
    lat = np.array([40.7128, 48.85, -89.5])
    enc = wkb.np_points_to_wkb(lon, lat)
    assert all(len(b) == 21 for b in enc)
    # byte-level check against struct.pack (the canonical WKB layout)
    assert enc[0] == struct.pack("<BIdd", 1, 1, lon[0], lat[0])
    lon2, lat2 = wkb.np_wkb_to_points(pd.Series(enc))
    assert (lon2 == lon).all() and (lat2 == lat).all()
    # non-Point rejection (reference db.py:151-153)
    bad = struct.pack("<BIdd", 1, 2, 0.0, 0.0)  # type 2 = LineString
    with pytest.raises(ValueError, match="Non-Point geometry"):
        wkb.np_wkb_to_points(pd.Series([bad]))


def test_wkb_spark_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, -74.0061, 40.7128), (2, 2.35, 48.85)], "id long, lon double, lat double"
    )
    enc = wkb.with_wkb(df)
    dec = wkb.decode_wkb(enc.drop("lon", "lat")).orderBy("id").toPandas()
    assert list(dec["lon"]) == [-74.0061, 2.35]
    assert list(dec["lat"]) == [40.7128, 48.85]
    w = df.select(wkb.wkt_point("lon", "lat").alias("wkt")).collect()
    assert w[0]["wkt"] == "POINT (-74.006100 40.712800)"


def test_localized_iso_nautical(spark):
    df = spark.createDataFrame(
        [("2024-06-01 12:00:00", -74.0), ("2024-06-01 12:00:00", 139.7),
         ("2024-06-01 12:00:00", 0.1)],
        "ts string, lon double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = df.select(FN.localized_iso("ts", "lon").alias("iso")).collect()
    assert out[0]["iso"] == "2024-06-01T07:00:00-05:00"   # UTC-5
    assert out[1]["iso"] == "2024-06-01T21:00:00+09:00"   # UTC+9
    assert out[2]["iso"] == "2024-06-01T12:00:00Z"        # UTC


def test_date_helpers(spark):
    df = spark.createDataFrame([("2024-03-05",)], "d string")
    ms = df.select(
        FN.date_to_epoch_ms("d").alias("a"), FN.date_to_epoch_ms("d", True).alias("b")
    ).collect()[0]
    assert ms["a"] == 1709596800000
    assert ms["b"] == 1709596800000 + 86_399_999
    ex = spark.createDataFrame([("2021:07:09 14:06:22",)], "t string")
    got = ex.select(FN.exif_datetime("t").alias("ts")).collect()[0]["ts"]
    assert got.year == 2021 and got.second == 22


def test_quad_split(spark):
    df = spark.createDataFrame(
        [(1, 0.0, 0.0, 10.0, 8.0)], "id long, minx double, miny double, maxx double, maxy double"
    )
    out = FN.quad_split(df).toPandas()
    assert len(out) == 4
    # quadrants tile the parent exactly (cloud.py:981-1000)
    assert sorted(zip(out["minx"], out["miny"])) == [
        (0.0, 0.0), (0.0, 4.0), (5.0, 0.0), (5.0, 4.0)
    ]
    assert (out["maxx"] - out["minx"] == 5.0).all()
    assert (out["maxy"] - out["miny"] == 4.0).all()


def test_string_and_numeric_helpers(spark):
    df = spark.createDataFrame(
        [("123", "https://x.test/img/pic_01.jpg?sig=1", "mly_9", "oops"),
         ("inf", "http://cdn/placeholder.png", "m2", "2.5")],
        "num string, url string, mid string, val string",
    )
    out = df.select(
        FN.clean_double("num").alias("n"),
        FN.url_stem(F.regexp_replace("url", r"\?.*$", "")).alias("stem"),
        FN.is_downloadable("url").alias("dl"),
        FN.mly_name("mid").alias("name"),
        FN.has_image_ext(F.regexp_replace("url", r"\?.*$", "")).alias("img"),
        FN.clean_double("val").alias("v"),
    ).collect()
    assert out[0]["n"] == 123.0 and out[1]["n"] is None
    assert out[0]["stem"] == "pic_01"
    assert out[0]["dl"] is True and out[1]["dl"] is False
    assert out[0]["name"] == "mly|mly_9"
    assert out[0]["img"] is True
    assert out[1]["v"] == 2.5


def test_jsonify_map_cols(spark):
    df = spark.createDataFrame(
        [(1, {"a": "1", "b": "x"})], "id long, props map<string,string>"
    )
    out = FN.jsonify_map_cols(df, ["props"]).collect()[0]["props"]
    assert out in ('{"a":"1","b":"x"}', '{"b":"x","a":"1"}')


def test_simplify_lines():
    # nearly-collinear middle points collapse; the corner survives
    line = [[0.0, 0.0], [1.0, 1e-7], [2.0, 0.0], [2.0, 2.0]]
    out = network_prep.simplify_lines([(0, line)], tolerance=1e-5)
    assert out[0][1] == [[0.0, 0.0], [2.0, 0.0], [2.0, 2.0]]
    out2 = network_prep.simplify_lines([(0, line)], tolerance=1e-9)
    assert len(out2[0][1]) == 4  # everything kept at a tight tolerance


def test_camera_type_f5(spark):
    from landlensdb_spark import functions as FN

    df = spark.createDataFrame(
        [
            (0.9, "GoPro"), (2.4, "GoPro"), (5.0, "RICOH THETA V"),
            (None, None), (0.0, ""), (None, "GoPro"),
        ],
        "focal double, model string",
    )
    got = [r[0] for r in df.select(FN.camera_type("focal", "model")).collect()]
    # reference semantics image.py:43-67: 360 table wins, focal<1.5 fisheye,
    # else perspective, NaN when both missing
    assert got == ["fisheye", "perspective", "360-degree", None, None, "perspective"]


def test_camera_params_csv_f6(spark):
    from landlensdb_spark import functions as FN

    df = spark.createDataFrame(
        [(0.85, 0.1, 0.01), (0.85, None, 0.01)], "focal double, k1 double, k2 double"
    )
    got = [r[0] for r in df.select(FN.camera_params_csv("focal", "k1", "k2")).collect()]
    assert got == ["0.85,0.1,0.01", None]
