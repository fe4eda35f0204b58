"""Tile assignment + per-tile export records (the reference's mapping output).

The reference renders folium maps with per-point markers
(/root/reference/landlensdb/geoclasses/geoimageframe.py:381-456) and consumes
Mapillary vector tiles keyed by zoom (cloud.py:729-737). The engine-side
contract (SURVEY.md §2.9 M1) is tile *assignment* — the slippy-map formula of
cloud.py:860-887 — plus a grouped export: one record list per (z, x, y) tile,
the distributed analog of a vector-tile layer build.

Assignment is pure column math (landlensdb_spark.geo.tiles); the groupBy is
the only shuffle and it keys on the quadkey long, which AQE skew-splits for
dense urban tiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from landlensdb_spark.geo.tiles import ZOOM_LEVEL, with_tile


def assign_tiles(
    df: DataFrame, lon: str = "lon", lat: str = "lat", zoom: int = ZOOM_LEVEL
) -> DataFrame:
    """Attach tile_z/tile_x/tile_y/quadkey (no shuffle)."""
    return with_tile(df, lon=lon, lat=lat, zoom=zoom)


def tile_stats(
    df: DataFrame, lon: str = "lon", lat: str = "lat", zoom: int = ZOOM_LEVEL
) -> DataFrame:
    """Per-tile record counts + bbox of contained points (tile catalog)."""
    return (
        assign_tiles(df, lon, lat, zoom)
        .groupBy("tile_z", "tile_x", "tile_y", "quadkey")
        .agg(
            F.count("*").alias("n_records"),
            F.round(F.min(lon), 6).alias("min_lon"),
            F.round(F.max(lon), 6).alias("max_lon"),
            F.round(F.min(lat), 6).alias("min_lat"),
            F.round(F.max(lat), 6).alias("max_lat"),
        )
    )


def tile_pyramid(
    df: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    min_zoom: int = 0,
    max_zoom: int = ZOOM_LEVEL,
) -> DataFrame:
    """Multi-zoom tile rollup (the tile-pyramid / hypertable-rollup analog of
    the reference's per-zoom coverage queries, cloud.py:729-737) in ONE shuffle.

    Each point is assigned once at ``max_zoom``; parent tiles at every coarser
    zoom are pure bit-shifts of the base (x>>k, y>>k, morton>>2k), exploded as
    (levels x rows) BEFORE the groupBy so Spark's map-side partial aggregation
    collapses them to at most sum_z(tiles_z) rows per input partition. Total
    shuffle volume is therefore ~1.33x a single-level rollup (geometric series
    1 + 1/4 + 1/16 + ...), NOT levels x rows — the shape that survives 100 TB.
    The alternative (iterative level-by-level rollup) needs either a cache per
    level or an O(levels^2) recompute chain; this is strictly better up to
    max_zoom ~20 where per-partition tile counts approach row counts.
    """
    if not 0 <= min_zoom <= max_zoom:
        raise ValueError(f"need 0 <= min_zoom <= max_zoom, got {min_zoom}/{max_zoom}")
    base = assign_tiles(df, lon, lat, max_zoom)
    # strip the zoom prefix off the quadkey -> pure Morton(x, y) at max_zoom
    morton = (F.col("quadkey") - F.lit(max_zoom * (1 << 58)).cast("long")).alias("_m")
    lv = base.select(
        F.col(lon).alias("_lon"),
        F.col(lat).alias("_lat"),
        F.col("tile_x").alias("_x"),
        F.col("tile_y").alias("_y"),
        morton,
        F.explode(F.sequence(F.lit(min_zoom), F.lit(max_zoom))).alias("tile_z"),
    )
    # parent coords at zoom z are bit-shifts: exact integer math, no re-projection
    sh = f"({max_zoom} - tile_z)"
    keyed = lv.select(
        "tile_z",
        F.expr(f"shiftright(_x, {sh})").alias("tile_x"),
        F.expr(f"shiftright(_y, {sh})").alias("tile_y"),
        (
            F.col("tile_z").cast("long") * F.lit(1 << 58).cast("long")
            + F.expr(f"shiftright(_m, 2 * {sh})")
        ).alias("quadkey"),
        "_lon",
        "_lat",
    )
    return keyed.groupBy("tile_z", "tile_x", "tile_y", "quadkey").agg(
        F.count("*").alias("n_records"),
        F.round(F.min("_lon"), 6).alias("min_lon"),
        F.round(F.max("_lon"), 6).alias("max_lon"),
        F.round(F.min("_lat"), 6).alias("min_lat"),
        F.round(F.max("_lat"), 6).alias("max_lat"),
    )


def tile_export(
    df: DataFrame,
    record_cols: list[str],
    lon: str = "lon",
    lat: str = "lat",
    zoom: int = ZOOM_LEVEL,
    max_records_per_tile: int | None = None,
) -> DataFrame:
    """Per-tile sorted record lists — the vector-tile-layer analog.

    Each output row is one tile with an array of record structs (sorted by
    the first record col for determinism). ``max_records_per_tile`` caps the
    per-tile payload like the reference's page-size limit (cloud.py:48).
    """
    tagged = assign_tiles(df, lon, lat, zoom)
    rec = F.struct(*[F.col(c) for c in record_cols])
    keys = ["tile_z", "tile_x", "tile_y", "quadkey"]
    if max_records_per_tile is None:
        return tagged.groupBy(*keys).agg(
            F.array_sort(F.collect_list(rec)).alias("records"),
            F.count("*").alias("n_records"),
        )
    # cap BEFORE the aggregation: a window rank bounds every tile's agg
    # buffer to the cap, so one dense urban tile can no longer materialize
    # its full record array in a single buffer (the window sort is
    # spill-able; a collect_list buffer is not). Same output as
    # sort-then-slice: row_number over the record struct ordering keeps
    # exactly the cap-smallest records, n_records still counts all rows.
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(rec.asc())
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .groupBy(*keys)
        .agg(
            F.array_sort(
                F.collect_list(F.when(F.col("_rn") <= max_records_per_tile, rec))
            ).alias("records"),
            F.count("*").alias("n_records"),
        )
    )
