"""Timezone PIP localization: zone hits, half-hour offsets, fallback, ISO."""

from __future__ import annotations

from pyspark.sql import functions as F

from landlensdb_spark import tz


def test_zone_rectangles_are_disjoint():
    zs = tz.TZ_ZONES
    for a in range(len(zs)):
        for b in range(a + 1, len(zs)):
            _, _, _, w1, s1, e1, n1 = zs[a]
            _, _, _, w2, s2, e2, n2 = zs[b]
            overlap = (w1 < e2 and w2 < e1) and (s1 < n2 and s2 < n1)
            assert not overlap, f"zones {zs[a][1]} / {zs[b][1]} overlap"


def test_zone_hits_halfhour_and_fallback(spark):
    rows = [
        (1, 2.35, 48.85),     # Paris
        (2, 77.2, 28.6),      # Delhi -> Asia/Kolkata +5:30
        (3, 138.6, -34.9),    # Adelaide +9:30
        (4, -45.0, 0.0),      # mid-Atlantic -> nautical Etc/GMT+3
        (5, 0.0, 0.0),        # gulf of guinea -> Etc/GMT+0
        (6, -74.0, 40.7),     # New York
    ]
    df = spark.createDataFrame(rows, "key long, lon double, lat double").withColumn(
        "ts", F.timestamp_seconds(F.lit(1650000000))  # 2022-04-15T05:20:00Z
    )
    out = {r["key"]: r for r in tz.with_timezone(df, key_cols=["key"]).collect()}
    assert out[1]["tz_name"] == "Europe/Paris" and out[1]["offset_min"] == 60
    assert out[2]["tz_name"] == "Asia/Kolkata" and out[2]["offset_min"] == 330
    assert out[2]["local_iso"] == "2022-04-15T10:50:00+05:30"
    assert out[3]["tz_name"] == "Australia/Adelaide"
    assert out[3]["local_iso"] == "2022-04-15T14:50:00+09:30"
    assert out[4]["tz_name"] == "Etc/GMT+3" and out[4]["offset_min"] == -180
    assert out[4]["local_iso"] == "2022-04-15T02:20:00-03:00"
    assert out[5]["tz_name"] == "Etc/GMT+0" and out[5]["local_iso"].endswith("Z")
    assert out[6]["tz_name"] == "America/New_York"
    assert out[6]["local_iso"] == "2022-04-15T00:20:00-05:00"
    # every input row present exactly once
    assert sorted(out) == [1, 2, 3, 4, 5, 6]
