"""Per-group OLS trend (operators/stats.py) — known closed forms,
degenerate groups, numpy polyfit parity, partitioning invariance."""

from __future__ import annotations

import numpy as np
import pytest

from landlensdb_spark.operators.stats import group_trend


def _fit(spark, rows):
    df = spark.createDataFrame(rows, "g int, x long, y long")
    return {
        r["g"]: (r["n"], r["slope"], r["intercept"])
        for r in group_trend(df, "x", "y", "g").collect()
    }


def test_exact_line_and_degenerates(spark):
    rows = (
        # g=0: y = 3x + 7 exactly
        [(0, x, 3 * x + 7) for x in range(10)]
        # g=1: single point -> NULL fit
        + [(1, 5, 9)]
        # g=2: all x equal -> NULL fit
        + [(2, 4, 1), (2, 4, 5)]
        # g=3: constant y -> slope 0, intercept y
        + [(3, x, 42) for x in range(5)]
    )
    got = _fit(spark, rows)
    assert got[0] == (10, 3.0, 7.0)
    assert got[1] == (1, None, None)
    assert got[2] == (2, None, None)
    assert got[3] == (5, 0.0, 42.0)


def test_matches_numpy_polyfit(spark):
    rng = np.random.default_rng(5)
    rows = []
    for g in range(4):
        n = int(rng.integers(3, 40))
        xs = rng.integers(0, 10**6, size=n)
        ys = rng.integers(-500, 500, size=n)
        rows += [(g, int(x), int(y)) for x, y in zip(xs, ys)]
    got = _fit(spark, rows)
    import collections

    by_g = collections.defaultdict(list)
    for g, x, y in rows:
        by_g[g].append((x, y))
    for g, pts in by_g.items():
        xs = np.array([p[0] for p in pts], dtype=np.float64)
        ys = np.array([p[1] for p in pts], dtype=np.float64)
        slope, intercept = np.polyfit(xs, ys, 1)
        assert got[g][1] == pytest.approx(slope, rel=1e-9)
        # intercept is anchored at the group's min x (documented)
        at_min = intercept + slope * xs.min()
        assert got[g][2] == pytest.approx(at_min, rel=1e-9, abs=1e-6)


def test_partitioning_invariance(spark):
    """The sufficient statistics are integer sums — the result must be
    BIT-identical under any repartitioning."""
    rows = [(0, x, (x * 7919) % 1000 - 500) for x in range(200)]
    df = spark.createDataFrame(rows, "g int, x long, y long")
    a = group_trend(df, "x", "y", "g").collect()[0]
    b = group_trend(df.repartition(13), "x", "y", "g").collect()[0]
    assert (a["slope"], a["intercept"]) == (b["slope"], b["intercept"])
