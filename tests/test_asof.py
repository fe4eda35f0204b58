"""As-of join (operators/asof.py): semantics, the sliced scale path's
row-identity with the default path, struct-integrity of attached values,
and input validation."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from landlensdb_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def small(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 10:00:00")),   # after r2
            (2, 10, _ts("2024-01-01 09:00:00")),   # equal-ts with r1 -> matches it
            (3, 10, _ts("2024-01-01 08:00:00")),   # before all right rows -> null
            (4, 20, _ts("2024-01-01 12:00:00")),   # key with no right rows -> null
            (5, 10, _ts("2024-01-03 00:00:00")),   # far later -> still r2 (carry)
        ],
        "lid long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts("2024-01-01 09:00:00"), "a", None),
            (200, 10, _ts("2024-01-01 09:30:00"), None, 2.5),
        ],
        "rid long, k long, rts timestamp, tag string, score double",
    )
    return left, right


def _rows(df):
    return sorted(
        (r.lid, r.rid, r.tag, r.score) for r in df.collect()
    )


def test_semantics(small):
    left, right = small
    out = asof_join(
        left, right, key="k", left_ts="ts", right_ts="rts",
        values=["rid", "tag", "score"],
    )
    got = _rows(out)
    assert got == [
        (1, 200, None, 2.5),
        (2, 100, "a", None),
        (3, None, None, None),
        (4, None, None, None),
        (5, 200, None, 2.5),
    ]
    # struct integrity: row lid=1 matched r2 whose tag is null — a naive
    # per-column last(ignorenulls) would have leaked r1's tag "a" into it.


@pytest.mark.parametrize("slice_seconds", [60, 3600, 86400, 7 * 86400])
def test_sliced_path_identical(small, slice_seconds):
    left, right = small
    base = _rows(
        asof_join(left, right, "k", "ts", "rts", ["rid", "tag", "score"])
    )
    sliced = _rows(
        asof_join(
            left, right, "k", "ts", "rts", ["rid", "tag", "score"],
            slice_seconds=slice_seconds,
        )
    )
    assert sliced == base


def test_sliced_path_identical_on_events(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"), "user_id", F.col("ts").alias("cts")
    )
    base = asof_join(p, c, "user_id", "ts", "cts", ["cid"])
    sliced = asof_join(p, c, "user_id", "ts", "cts", ["cid"], slice_seconds=6 * 3600)
    b = sorted((r.event_id, r.cid) for r in base.collect())
    s = sorted((r.event_id, r.cid) for r in sliced.collect())
    assert b == s and len(b) == p.count()


def test_validation(small):
    left, right = small
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("rid", "lid"), "k", "ts", "rts", ["lid"])
    with pytest.raises(ValueError, match="reserved"):
        asof_join(left.withColumn("_ts", F.lit(1)), right, "k", "ts", "rts", ["rid"])
    with pytest.raises(ValueError, match="slice_seconds"):
        asof_join(left, right, "k", "ts", "rts", ["rid"], slice_seconds=0)


def test_plan_no_python_no_cartesian(small):
    left, right = small
    for kw in ({}, {"slice_seconds": 3600}):
        plan = (
            asof_join(left, right, "k", "ts", "rts", ["rid"], **kw)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Python" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
