"""Point-in-polygon join: distributed two-phase join vs (a) the grid-binning
closed-form the SQL oracle uses, (b) a brute-force numpy ray-cast oracle on
irregular/concave/holed polygons."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from landlensdb_spark import synth
from landlensdb_spark.geo.geometry import points_in_polygon
from landlensdb_spark.operators.pip_join import pip_join


def test_pip_grid_matches_floor_binning(spark):
    n = 4000
    pts = spark.range(n).select(
        F.col("id"),
        synth.lon_col(F.col("id")).alias("lon"),
        synth.lat_col(F.col("id")).alias("lat"),
    )
    polys = synth.admin_polygons(spark)
    out = pip_join(pts, polys).select("id", "admin_id").toPandas()

    i = np.arange(n)
    lon, lat = synth.np_lon(i), synth.np_lat(i)
    gx = np.floor((lon - synth.GRID_X0) / synth.GRID_DX).astype(np.int64)
    gy = np.floor((lat - synth.GRID_Y0) / synth.GRID_DY).astype(np.int64)
    want = gx * synth.GRID_NY + gy

    assert len(out) == n  # grid covers the whole field, non-overlapping
    got = out.set_index("id")["admin_id"].sort_index().to_numpy()
    assert (got == want).all()


def test_pip_irregular_polygons_vs_numpy_oracle(spark):
    # concave L, a polygon with a hole, and a triangle — overlapping the L
    L = [[0.0, 0.0], [8.0, 0.0], [8.0, 2.0], [2.0, 2.0], [2.0, 8.0], [0.0, 8.0], [0.0, 0.0]]
    shell = [[10.0, 10.0], [20.0, 10.0], [20.0, 20.0], [10.0, 20.0], [10.0, 10.0]]
    hole = [[14.0, 14.0], [16.0, 14.0], [16.0, 16.0], [14.0, 16.0], [14.0, 14.0]]
    tri = [[-1.0, -1.0], [6.0, 1.0], [1.0, 6.0], [-1.0, -1.0]]
    polys = spark.createDataFrame(
        [(0, "L", [L]), (1, "holed", [shell, hole]), (2, "tri", [tri])],
        "admin_id long, name string, ring array<array<array<double>>>",
    )
    rng = np.random.default_rng(42)
    px = rng.uniform(-2, 22, 3000)
    py = rng.uniform(-2, 22, 3000)
    pts = spark.createDataFrame(
        [(int(k), float(a), float(b)) for k, (a, b) in enumerate(zip(px, py))],
        "id long, lon double, lat double",
    )
    out = pip_join(pts, polys, rings_col="ring").select("id", "admin_id").toPandas()
    got = set(map(tuple, out.to_numpy()))

    want = set()
    for pid, rings in [(0, [L]), (1, [shell, hole]), (2, [tri])]:
        arrs = [np.asarray(r) for r in rings]
        inside = points_in_polygon(px, py, arrs)
        want |= {(int(k), pid) for k in np.where(inside)[0]}
    assert got == want
    # overlap region produced multiple matches for some point
    from collections import Counter

    c = Counter(k for k, _ in got)
    assert max(c.values()) == 2


def test_pip_keep_polygon_cols(spark):
    pts = spark.range(100).select(
        F.col("id"),
        synth.lon_col(F.col("id")).alias("lon"),
        synth.lat_col(F.col("id")).alias("lat"),
    )
    polys = synth.admin_polygons(spark)
    out = pip_join(pts, polys, keep_polygon_cols=["name"])
    assert "name" in out.columns
    row = out.limit(1).collect()[0]
    assert row["name"].startswith("admin_")


def test_compact_cover_np_merges_same_flag_blocks():
    """Flag-aware cover compaction (round-6 verdict #7): complete
    same-flag 4-sibling blocks collapse recursively; mixed-flag blocks do
    NOT merge."""
    from landlensdb_spark.geo.cells import _RES_SHIFT, _X_SHIFT
    from landlensdb_spark.operators.pip_join import _compact_cover_np

    def mk(res, x, y):
        return (res << _RES_SHIFT) | (x << _X_SHIFT) | y

    # aligned 4x4 block at res 8, all full=True -> single res-6 cell
    cells = np.array(
        [mk(8, 16 + dx, 32 + dy) for dx in range(4) for dy in range(4)],
        dtype=np.int64,
    )
    cc, cf = _compact_cover_np(cells, np.ones(16, dtype=bool))
    assert list(cc) == [mk(6, 4, 8)] and list(cf) == [True]

    # same block but one corner cell is boundary (full=False): its 2x2
    # sibling block must NOT merge; the other three 2x2 blocks do, and the
    # res-7 level then stays unmerged (mixed flags / incomplete)
    flags = np.ones(16, dtype=bool)
    flags[0] = False
    cc2, cf2 = _compact_cover_np(cells, flags)
    assert len(cc2) == 3 + 4  # 3 merged res-7 parents + 4 res-8 leftovers
    assert sorted(cf2) == [False] + [True] * 6
    # footprint preserved: uncompact back to res 8 equals the input set
    back = set()
    for c in cc2:
        res = int(c) >> _RES_SHIFT
        x = (int(c) >> _X_SHIFT) & ((1 << _X_SHIFT) - 1)
        y = int(c) & ((1 << _X_SHIFT) - 1)
        d = 8 - res
        for dx in range(1 << d):
            for dy in range(1 << d):
                back.add(mk(8, (x << d) + dx, (y << d) + dy))
    assert back == set(int(c) for c in cells)


def test_pip_compacted_cover_shrinks_and_stays_exact(spark):
    """A polygon whose bbox cover is a large aligned grid: the broadcast
    cover table must shrink under compaction while pip_join results stay
    exactly the brute-force ray-cast's."""
    from landlensdb_spark.operators.pip_join import _collect_polygons

    # square covering res-6 cells 32..37 per axis (6x6 bbox cover, 5.625
    # deg/cell from lon/lat 0 = cell 32): the full=True interior 33..36
    # contains the aligned even-start sibling pair (34,35) on both axes,
    # so exactly that 2x2 block merges. (An UNALIGNED cover may
    # legitimately compact to nothing — merging is alignment-dependent;
    # see test_compact_cover_np_merges_same_flag_blocks for the
    # kernel-level contract.)
    sq = [[0.1, 0.1], [33.7, 0.1], [33.7, 33.7], [0.1, 33.7], [0.1, 0.1]]
    polys = spark.createDataFrame(
        [(0, [sq])], "admin_id long, ring array<array<array<double>>>"
    )
    _, cover_rows, res_set = _collect_polygons(polys, "admin_id", "ring")
    assert len(res_set) > 1, "compaction should produce mixed resolutions"
    # footprint bookkeeping: expanding every compacted cell back to the
    # finest res recovers the original solid-rectangle cell count, and the
    # compacted table is strictly smaller than that rectangle
    finest = max(int(r) for r in res_set)
    uncompacted = sum(4 ** (finest - r) for r, *_ in cover_rows)
    assert len(cover_rows) < uncompacted
    rng = np.random.default_rng(11)
    px = rng.uniform(-1, 24, 2500)
    py = rng.uniform(-1, 24, 2500)
    pts = spark.createDataFrame(
        [(int(k), float(a), float(b)) for k, (a, b) in enumerate(zip(px, py))],
        "id long, lon double, lat double",
    )
    out = pip_join(pts, polys, rings_col="ring").select("id").toPandas()
    want = set(np.where(points_in_polygon(px, py, [np.asarray(sq)]))[0])
    assert set(out["id"]) == want
