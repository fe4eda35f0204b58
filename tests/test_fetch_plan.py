"""fetch_plan: per-host wave bounds, determinism, schedule completeness."""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from landlensdb_spark.operators.fetch import fetch_plan


def _frontier(spark):
    rows = []
    for h in range(5):
        for i in range(1 + h * 3):  # skewed host fanout: 1, 4, 7, 10, 13
            rows.append((f"https://h{h}.example.com/p/{i:03d}",))
    return spark.createDataFrame(rows, "url string")


def test_wave_bounds_per_host(spark):
    df = _frontier(spark)
    out = fetch_plan(df, rps_per_host=2.0, wave_seconds=1.0).collect()
    per = collections.Counter((r["host"], r["fetch_wave"]) for r in out)
    assert max(per.values()) <= 2  # never more than rps*window per host-wave
    # waves are dense from 0 per host
    by_host = collections.defaultdict(set)
    for r in out:
        by_host[r["host"]].add(r["fetch_wave"])
    for host, waves in by_host.items():
        assert waves == set(range(len(waves))), (host, waves)


def test_schedule_is_complete_and_deterministic(spark):
    df = _frontier(spark)
    a = sorted((r["url"], r["fetch_wave"]) for r in fetch_plan(df).collect())
    b = sorted((r["url"], r["fetch_wave"]) for r in fetch_plan(df).collect())
    assert a == b
    assert len(a) == df.count()  # every url scheduled exactly once


def test_duplicate_urls_deterministic_with_tiebreak(spark):
    df = spark.createDataFrame(
        [(i, "https://h.example.com/same") for i in range(5)],
        "k long, url string",
    )
    out = {
        r["k"]: r["fetch_wave"]
        for r in fetch_plan(df, order_cols=["url", "k"], rps_per_host=1.0).collect()
    }
    assert out == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}
