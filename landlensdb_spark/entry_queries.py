"""Driver-contract queries + DuckDB oracle SQL, one pair per operator.

Each ``QUERIES[name]`` is ``(spark, sf_dir) -> DataFrame`` running a real
engine operator; ``ORACLES[name]`` is ANSI SQL DuckDB runs on the same
parquet views. Synthetic geo coordinates derive from table keys via the
shared integer formulas in :mod:`landlensdb_spark.synth`, so both engines
compute bit-identical doubles; transcendental projections are rounded to
1e-3 m before distance math (cross-engine libm parity).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from landlensdb_spark import synth, tables
from landlensdb_spark.extract import extract_geotags
from landlensdb_spark.geo import tiles as T
from landlensdb_spark.operators.knn import knn_join
from landlensdb_spark.operators.pip_join import pip_join
from landlensdb_spark.operators.snap import snap_to_network
from landlensdb_spark.operators.tiles import tile_stats

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo point field derived from orders keys (SQL-parity formulas)."""
    o = tables.load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        k.alias("key"),
        synth.lon_col(k).alias("lon"),
        synth.lat_col(k).alias("lat"),
    )


def _probe_points(spark: SparkSession, sf_dir: str, limit_key: int, mul=1, add=0) -> DataFrame:
    o = tables.load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < limit_key)
    k = F.col("o_orderkey") * mul + add
    return o.select(
        F.col("o_orderkey").alias("key"),
        synth.probe_lon_col(k).alias("lon"),
        synth.probe_lat_col(k).alias("lat"),
    )


_PTS_SQL = (
    f"SELECT o_orderkey AS key, {synth.lon_sql('o_orderkey')} AS lon, "
    f"{synth.lat_sql('o_orderkey')} AS lat FROM orders"
)


def _probe_sql(limit_key: int, mul=1, add=0) -> str:
    k = f"(o_orderkey * {mul} + {add})"
    return (
        f"SELECT o_orderkey AS key, {synth.probe_lon_sql(k)} AS lon, "
        f"{synth.probe_lat_sql(k)} AS lat FROM orders WHERE o_orderkey < {limit_key}"
    )


def _quadkey_sql(x: str, y: str, zoom: int) -> str:
    terms = [str(zoom * (1 << 58))]
    for b in range(zoom):
        terms.append(f"(((({x}) >> {b}) & 1) << {2 * b + 1})")
        terms.append(f"(((({y}) >> {b}) & 1) << {2 * b})")
    return "(" + " + ".join(terms) + ")"


# ---------------------------------------------------------------------------
# Tiling (F11 slippy formulas, M1 export) — SURVEY §2.8 F11/F12, §2.9
# ---------------------------------------------------------------------------

@query(
    "tile_assign",
    f"""
    WITH pts AS ({_PTS_SQL})
    SELECT key, {synth.tile_x_sql('lon', 14)} AS tile_x,
           {synth.tile_y_sql('lat', 14)} AS tile_y,
           {_quadkey_sql(synth.tile_x_sql('lon', 14), synth.tile_y_sql('lat', 14), 14)} AS quadkey
    FROM pts
    """,
)
def q_tile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    return T.with_tile(pts, zoom=14).select("key", "tile_x", "tile_y", "quadkey")


@query(
    "tile_stats",
    f"""
    WITH pts AS ({_PTS_SQL})
    SELECT {synth.tile_x_sql('lon', 5)} AS tile_x, {synth.tile_y_sql('lat', 5)} AS tile_y,
           count(*) AS n_records,
           round(min(lon), 6) AS min_lon, round(max(lon), 6) AS max_lon,
           round(min(lat), 6) AS min_lat, round(max(lat), 6) AS max_lat
    FROM pts GROUP BY 1, 2
    """,
)
def q_tile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    return tile_stats(pts, zoom=5).drop("tile_z", "quadkey")


# ---------------------------------------------------------------------------
# Point-in-polygon join (J1/J7) — the north-rule core
# ---------------------------------------------------------------------------

@query(
    "pip_admin",
    f"""
    WITH pts AS ({_PTS_SQL})
    SELECT key, {synth.grid_admin_sql('lon', 'lat')} AS admin_id FROM pts
    """,
)
def q_pip_admin(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    polys = synth.admin_polygons(spark)
    return pip_join(pts, polys).select("key", "admin_id")


@query(
    "pip_admin_agg",
    f"""
    WITH pts AS ({_PTS_SQL})
    SELECT {synth.grid_admin_sql('lon', 'lat')} AS admin_id,
           count(*) AS n_points, min(key) AS first_key
    FROM pts GROUP BY 1
    """,
)
def q_pip_admin_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    polys = synth.admin_polygons(spark)
    return (
        pip_join(pts, polys)
        .groupBy("admin_id")
        .agg(F.count("*").alias("n_points"), F.min("key").alias("first_key"))
    )


# ---------------------------------------------------------------------------
# Snap join (J1-J3, F15-F17) — reference snap semantics, SQL-checkable slice
# ---------------------------------------------------------------------------

@query(
    "snap_nearest",
    f"""
    WITH pts AS ({_probe_sql(2000)}),
    mpts AS (
      SELECT key, {synth.merc_x_sql('lon')} AS px, {synth.merc_y_sql('lat')} AS py FROM pts
    ),
    roads AS ({synth.roads_sql_cte()}),
    pairs AS (
      SELECT key, line_id,
        sqrt( (px - (x0 + t*(x1-x0))) * (px - (x0 + t*(x1-x0)))
            + (py - (y0 + t*(y1-y0))) * (py - (y0 + t*(y1-y0))) ) AS dist
      FROM (
        SELECT m.key, r.line_id, m.px, m.py, r.x0, r.y0, r.x1, r.y1,
          least(greatest( ((m.px-r.x0)*(r.x1-r.x0) + (m.py-r.y0)*(r.y1-r.y0))
                / ((r.x1-r.x0)*(r.x1-r.x0) + (r.y1-r.y0)*(r.y1-r.y0)), 0.0), 1.0) AS t
        FROM mpts m CROSS JOIN roads r
      )
    ),
    ranked AS (
      SELECT key, line_id, dist,
             row_number() OVER (PARTITION BY key ORDER BY dist, line_id) AS rn
      FROM pairs WHERE dist <= 100.0
    )
    SELECT key, line_id, round(dist, 3) AS snap_dist FROM ranked WHERE rn = 1
    """,
)
def q_snap_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _probe_points(spark, sf_dir, 2000)
    net = synth.road_network(spark)
    snapped = snap_to_network(pts, net, tolerance_m=100.0, round_merc=3)
    return snapped.filter(F.col("line_id").isNotNull()).select(
        "key", "line_id", F.round("snap_dist", 3).alias("snap_dist")
    )


# ---------------------------------------------------------------------------
# kNN join (J4) — k-ring expansion vs brute-force SQL oracle
# ---------------------------------------------------------------------------

@query(
    "knn_points",
    f"""
    WITH nbr AS ({_probe_sql(2000)}),
    prb AS ({_probe_sql(200, 13, 7)}),
    mn AS (SELECT key, {synth.merc_x_sql('lon')} AS x, {synth.merc_y_sql('lat')} AS y FROM nbr),
    mp AS (SELECT key, {synth.merc_x_sql('lon')} AS x, {synth.merc_y_sql('lat')} AS y FROM prb),
    pairs AS (
      SELECT p.key AS probe_key, n.key AS point_key,
             (p.x-n.x)*(p.x-n.x) + (p.y-n.y)*(p.y-n.y) AS dist2
      FROM mp p CROSS JOIN mn n
    )
    SELECT probe_key, point_key, rank FROM (
      SELECT probe_key, point_key,
             row_number() OVER (PARTITION BY probe_key ORDER BY dist2, point_key) AS rank
      FROM pairs
    ) WHERE rank <= 5
    """,
)
def q_knn_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    nbr = _probe_points(spark, sf_dir, 2000).withColumnRenamed("key", "point_key")
    prb = _probe_points(spark, sf_dir, 200, 13, 7).withColumnRenamed("key", "probe_key")
    out = knn_join(
        prb, nbr, k=5, probe_id="probe_key", point_id="point_key", res=14
    )
    return out.select("probe_key", "point_key", F.col("rank").cast("long").alias("rank"))


# ---------------------------------------------------------------------------
# Extraction (F1-F4, S1) — end-to-end html -> geotag vs closed-form oracle
# ---------------------------------------------------------------------------

@query(
    "extract_geotags",
    f"""
    SELECT printf('https://example.org/page/%08d', i) AS url,
           round({synth.lat_sql('i')}, 6) AS lat,
           round({synth.lon_sql('i')}, 6) AS lon
    FROM (SELECT unnest(range(3000)) AS i)
    WHERE i % 5 != 0
    """,
)
def q_extract_geotags(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = tables.pages(spark, 3000, num_partitions=8)
    return extract_geotags(pages).select("url", "lat", "lon")


@query(
    "extract_date_filter",
    f"""
    SELECT printf('https://example.org/page/%08d', i) AS url,
           to_timestamp({tables.WARC_TS_BASE} + (i * {tables.WARC_TS_MUL}) % {tables.WARC_TS_MOD})
             AT TIME ZONE 'UTC' AS warc_ts
    FROM (SELECT unnest(range(3000)) AS i)
    WHERE i % 5 != 0
      AND to_timestamp({tables.WARC_TS_BASE} + (i * {tables.WARC_TS_MUL}) % {tables.WARC_TS_MOD})
            AT TIME ZONE 'UTC' >= TIMESTAMP '2022-03-01'
      AND to_timestamp({tables.WARC_TS_BASE} + (i * {tables.WARC_TS_MUL}) % {tables.WARC_TS_MOD})
            AT TIME ZONE 'UTC' < TIMESTAMP '2022-06-01'
    """,
)
def q_extract_date_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 date-range predicate pushed before extraction (cloud.py:742-769)."""
    pages = tables.pages(spark, 3000, num_partitions=8)
    pages = pages.filter(
        (F.col("warc_ts") >= F.lit("2022-03-01"))
        & (F.col("warc_ts") < F.lit("2022-06-01"))
    )
    return extract_geotags(pages).select("url", "warc_ts")


# ---------------------------------------------------------------------------
# bbox scan (P6/P10/S2) — predicate-pushdown bbox filter
# ---------------------------------------------------------------------------

@query(
    "bbox_scan",
    f"""
    WITH pts AS ({_PTS_SQL})
    SELECT key, round(lon, 6) AS lon, round(lat, 6) AS lat FROM pts
    WHERE lon BETWEEN -30.0 AND 30.0 AND lat BETWEEN -20.0 AND 45.0
    """,
)
def q_bbox_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    return pts.filter(
        F.col("lon").between(-30.0, 30.0) & F.col("lat").between(-20.0, 45.0)
    ).select("key", F.round("lon", 6).alias("lon"), F.round("lat", 6).alias("lat"))
