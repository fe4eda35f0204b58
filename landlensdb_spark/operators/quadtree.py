"""Overflow-driven recursive quad-split — the reference's signature ingest
pattern (cloud.py:913-979: fetch a bbox, and if the page limit overflows,
split into 4 quadrants and recurse), re-expressed Spark-first.

The reference's recursion is a sequential driver loop because its data
source is a rate-limited HTTP API. Over a table the same semantics — "the
quadtree leaf set where every leaf holds <= capacity records, splitting
only overflowing cells" — needs NO recursion at all:

1. ONE data-sized aggregation builds the occupancy histogram at
   ``max_zoom`` (map-side combined; the only real shuffle);
2. every coarser level's histogram is a bit-shift roll-up of the previous
   one — log2(extent) tiny aggs over already-aggregated rows;
3. a leaf at zoom z is a cell whose own count fits capacity (or z ==
   max_zoom, the can't-split-further floor) and whose PARENT overflowed —
   exactly the membership the reference's recursion enumerates, computed
   as joins between adjacent (tiny) level histograms.

So a 10^12-row table pays one shuffle, not one driver round per tree
level; the decreasing-size roll-ups are scheduling noise. The leaf set is
O(n/capacity) and feeds ``assign_quad_leaves`` (longest-prefix match via
per-level broadcast joins) for sharded export / ingest planning.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from landlensdb_spark.geo.tiles import tile_x, tile_y


def _level_histograms(
    points: DataFrame, lon: str, lat: str, max_zoom: int, min_zoom: int
) -> dict[int, DataFrame]:
    hist = {
        max_zoom: points.groupBy(
            tile_x(lon, max_zoom).alias("x"), tile_y(lat, max_zoom).alias("y")
        ).agg(F.count("*").alias("c"))
    }
    for z in range(max_zoom - 1, min_zoom - 1, -1):
        hist[z] = (
            hist[z + 1]
            .groupBy(
                F.shiftright("x", 1).alias("x"), F.shiftright("y", 1).alias("y")
            )
            .agg(F.sum("c").alias("c"))
        )
    return hist


def adaptive_quad_cells(
    points: DataFrame,
    capacity: int,
    max_zoom: int = 8,
    min_zoom: int = 0,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Quadtree leaves (z, x, y, n_points) with every leaf <= capacity
    (except unsplittable max_zoom cells), splitting only overflowing cells
    — the reference's recursive bbox split, as histogram roll-ups."""
    hist = _level_histograms(points, lon, lat, max_zoom, min_zoom)
    parts = [
        hist[min_zoom]
        .filter(F.col("c") <= capacity)
        .select(F.lit(min_zoom).alias("z"), "x", "y", F.col("c").alias("n_points"))
    ]
    for z in range(min_zoom + 1, max_zoom + 1):
        parent_over = hist[z - 1].filter(F.col("c") > capacity).select(
            F.col("x").alias("px"), F.col("y").alias("py")
        )
        lvl = hist[z].join(
            F.broadcast(parent_over),
            (F.shiftright("x", 1) == F.col("px")) & (F.shiftright("y", 1) == F.col("py")),
        )
        if z < max_zoom:
            lvl = lvl.filter(F.col("c") <= capacity)
        parts.append(
            lvl.select(F.lit(z).alias("z"), "x", "y", F.col("c").alias("n_points"))
        )
    return reduce(lambda a, b: a.unionByName(b), parts)


def assign_quad_leaves(
    points: DataFrame,
    leaves: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    max_zoom: int = 8,
    min_zoom: int = 0,
) -> DataFrame:
    """Tag each point with its (leaf_z, leaf_x, leaf_y) — longest-prefix
    match against the (small, broadcast) leaf set, one equi-join per level
    unioned; a point matches exactly one leaf by quadtree construction."""
    parts = []
    for z in range(min_zoom, max_zoom + 1):
        lz = leaves.filter(F.col("z") == z).select(
            F.col("z").alias("leaf_z"), F.col("x").alias("leaf_x"), F.col("y").alias("leaf_y")
        )
        parts.append(
            points.join(
                F.broadcast(lz),
                (tile_x(lon, z) == F.col("leaf_x")) & (tile_y(lat, z) == F.col("leaf_y")),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), parts)
