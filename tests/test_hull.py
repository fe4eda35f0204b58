"""Per-group convex hull (operators/hull.py) — verified against an
INDEPENDENT Caratheodory characterization (p is extreme iff p is not in
the convex hull of the other points; in the plane that membership is a
closed-triangle / closed-segment witness test), not against a second
monotone-chain implementation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from landlensdb_spark.operators import hull as H


def _extreme_mask_caratheodory(pts: np.ndarray) -> np.ndarray:
    """O(n^4) sign-arithmetic extreme-point mask over DISTINCT integer
    points: p is NOT extreme iff some closed triangle of three other
    points (non-degenerate) or closed segment of two other points
    contains it. Exact on integer-valued doubles."""
    n = len(pts)
    out = np.ones(n, dtype=bool)

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    for i in range(n):
        p = pts[i]
        others = [pts[j] for j in range(n) if j != i]
        hit = False
        m = len(others)
        for a_i in range(m):
            for b_i in range(a_i + 1, m):
                a, b = others[a_i], others[b_i]
                if cross(a, b, p) == 0 and np.dot(p - a, p - b) <= 0:
                    hit = True
                    break
                for c_i in range(b_i + 1, m):
                    c = others[c_i]
                    area = cross(a, b, c)
                    if area == 0:
                        continue
                    if area < 0:
                        a2, b2, c2 = a, c, b
                    else:
                        a2, b2, c2 = a, b, c
                    if (
                        cross(a2, b2, p) >= 0
                        and cross(b2, c2, p) >= 0
                        and cross(c2, a2, p) >= 0
                    ):
                        hit = True
                        break
                if hit:
                    break
            if hit:
                break
        out[i] = not hit
    return out


@pytest.mark.parametrize("seed", range(8))
def test_np_hull_matches_caratheodory(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(3, 26))
    pts = rng.integers(0, 12, size=(n, 2)).astype(np.float64)
    got = H.np_hull(pts[:, 0], pts[:, 1])
    uniq, inverse = np.unique(pts, axis=0, return_inverse=True)
    want_uniq = _extreme_mask_caratheodory(uniq)
    want = want_uniq[inverse]
    assert got.tolist() == want.tolist()


def test_np_hull_degenerate_small_sets():
    # <= 2 distinct points: everything is extreme, duplicates included
    assert H.np_hull(np.array([1.0]), np.array([2.0])).tolist() == [True]
    assert H.np_hull(
        np.array([1.0, 1.0, 3.0]), np.array([2.0, 2.0, 4.0])
    ).tolist() == [True, True, True]


def test_np_hull_collinear_and_interior():
    # collinear run: endpoints only
    xs = np.array([0.0, 1.0, 2.0, 3.0])
    ys = np.array([0.0, 1.0, 2.0, 3.0])
    assert H.np_hull(xs, ys).tolist() == [True, False, False, True]
    # square + center + edge-midpoint: corners only (midpoint is on a
    # closed segment => not extreme)
    xs = np.array([0.0, 2.0, 2.0, 0.0, 1.0, 1.0])
    ys = np.array([0.0, 0.0, 2.0, 2.0, 1.0, 0.0])
    assert H.np_hull(xs, ys).tolist() == [True, True, True, True, False, False]
    # every copy of an extreme coordinate is marked
    xs = np.array([0.0, 0.0, 2.0, 1.0])
    ys = np.array([0.0, 0.0, 0.0, 3.0])
    assert H.np_hull(xs, ys).tolist() == [True, True, True, True]


def test_convex_hull_grouped(spark):
    rng = np.random.default_rng(7)
    rows = []
    for g in range(5):
        n = int(rng.integers(1, 30))
        for _ in range(n):
            rows.append((g, float(rng.integers(0, 15)), float(rng.integers(0, 15))))
    df = spark.createDataFrame(rows, "g int, x double, y double")
    got = (
        H.convex_hull(df, group="g")
        .toPandas()
        .sort_values(["g", "x", "y"])
        .reset_index(drop=True)
    )
    want_rows = []
    pdf = pd.DataFrame(rows, columns=["g", "x", "y"])
    for g, grp in pdf.groupby("g"):
        uniq = np.unique(grp[["x", "y"]].to_numpy(np.float64), axis=0)
        if len(uniq) <= 2:
            mask = np.ones(len(uniq), dtype=bool)
        else:
            mask = _extreme_mask_caratheodory(uniq)
        for x, y in uniq[mask]:
            want_rows.append((g, x, y))
    want = (
        pd.DataFrame(want_rows, columns=["g", "x", "y"])
        .sort_values(["g", "x", "y"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype({"g": int}), want.astype({"g": int}))


def test_convex_hull_ungrouped_and_distinct(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0), (0.0, 0.0), (4.0, 0.0), (0.0, 4.0), (1.0, 1.0)],
        "x double, y double",
    )
    got = sorted(map(tuple, H.convex_hull(df).collect()))
    assert got == [(0.0, 0.0), (0.0, 4.0), (4.0, 0.0)]
    assert H.convex_hull(df).columns == ["x", "y"]


def test_convex_hull_guards(spark):
    df = spark.range(10).select(
        F.col("id").cast("double").alias("x"),
        F.lit(float("nan")).alias("y"),
    )
    with pytest.raises(Exception, match="non-finite"):
        H.convex_hull(df).collect()
    old = H.MAX_GROUP_POINTS
    H.MAX_GROUP_POINTS = 5
    try:
        big = spark.range(10).selectExpr(
            "cast(id as double) as x", "cast(id % 3 as double) as y"
        )
        with pytest.raises(Exception, match="single-task budget"):
            H.convex_hull(big).collect()
    finally:
        H.MAX_GROUP_POINTS = old


def test_group_diameter_matches_bruteforce(spark):
    rng = np.random.default_rng(11)
    rows = []
    for g in range(6):
        n = int(rng.integers(1, 40))
        for _ in range(n):
            rows.append((g, float(rng.integers(0, 50)), float(rng.integers(0, 50))))
    df = spark.createDataFrame(rows, "g int, x double, y double")
    got = {r["g"]: r["diam2"] for r in H.group_diameter(df, group="g").collect()}
    pdf = pd.DataFrame(rows, columns=["g", "x", "y"])
    for g, grp in pdf.groupby("g"):
        p = grp[["x", "y"]].to_numpy(np.float64)
        d2 = ((p[:, None, :] - p[None, :, :]) ** 2).sum(-1).max()
        assert got[g] == d2, g


def test_group_diameter_ungrouped_and_degenerate(spark):
    df = spark.createDataFrame([(3.0, 4.0)], "x double, y double")
    assert H.group_diameter(df).collect()[0]["diam2"] == 0.0
    df2 = spark.createDataFrame(
        [(0.0, 0.0), (0.0, 0.0), (3.0, 4.0)], "x double, y double"
    )
    assert H.group_diameter(df2).collect()[0]["diam2"] == 25.0
    assert H.group_diameter(df2).columns == ["diam2"]
