"""tile_export: per-tile record lists, cap semantics + skew-safe plan."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from landlensdb_spark.operators.tiles import tile_export, tile_stats


def _pts(spark, n=400):
    # skewed field: 70% of points in one tile, the rest spread out
    rng = np.random.default_rng(7)
    dense = int(n * 0.7)
    lon = np.concatenate(
        [10.0 + rng.uniform(0, 0.001, dense), rng.uniform(-170, 170, n - dense)]
    )
    lat = np.concatenate(
        [20.0 + rng.uniform(0, 0.001, dense), rng.uniform(-80, 80, n - dense)]
    )
    return spark.createDataFrame(
        [(int(i), float(a), float(b)) for i, (a, b) in enumerate(zip(lon, lat))],
        "rec_id long, lon double, lat double",
    )


def test_capped_export_equals_sort_then_slice(spark):
    df = _pts(spark)
    cap = 7
    capped = tile_export(df, ["rec_id"], zoom=10, max_records_per_tile=cap)
    full = tile_export(df, ["rec_id"], zoom=10)
    got = {r["quadkey"]: r for r in capped.collect()}
    want = {r["quadkey"]: r for r in full.collect()}
    assert set(got) == set(want)
    for qk, w in want.items():
        g = got[qk]
        # n_records still counts every row; records are the cap-smallest
        assert g["n_records"] == w["n_records"]
        assert g["records"] == w["records"][:cap]


def test_capped_export_caps_before_aggregation(spark):
    """The cap must bound the agg buffer (window rank BEFORE collect_list),
    not slice after — one dense tile would otherwise materialize its whole
    array in a single unspillable buffer. Also: the window and the groupBy
    must share one shuffle."""
    df = _pts(spark)
    plan = (
        tile_export(df, ["rec_id"], zoom=10, max_records_per_tile=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in plan
    # the groupBy reuses the window's hash partitioning: exactly 1 exchange
    assert plan.count("Exchange hashpartitioning") == 1
    # the collect_list aggregates the rank-gated conditional, never the raw
    # record struct
    assert "slice(" not in plan


def test_tile_stats_counts(spark):
    df = _pts(spark, n=100)
    stats = tile_stats(df, zoom=3)
    assert stats.agg(F.sum("n_records")).first()[0] == 100
