"""Distance-threshold spatial clustering — urban-cluster detection.

DBSCAN-with-minPts=1 semantics over a point field: two points are
neighbors when their planar EPSG:3857 distance is <= ``eps_m``; clusters
are the connected components of the neighbor graph (every point belongs
to exactly one cluster; isolated points are singleton clusters). This is
the geo twin of the dedup family's near-dup clustering — the reference
eyeballs dense areas on a folium map (/root/reference/landlensdb/handlers/
mapping.py); the engine makes the grouping a first-class distributed op.

Scale shape (no pairwise anything beyond true candidates):

1. both coordinates are pre-rounded mercator (synth parity rules); each
   point gets a grid cell at the coarsest resolution whose cell side is
   >= eps, so every neighbor pair lives in the 3x3 cell box,
2. candidate pairs: the LEFT side explodes its 9-cell box (9 rows/point),
   equi-joins the right side on the cell long — one shuffle keyed by
   cell; ``id_a < id_b`` halves the work and the exact ``dist2 <= eps^2``
   refine runs in codegen,
3. connected components via the shared min-label propagation
   (operators/dedup.dup_clusters) over the surviving pair list,
4. singletons (no neighbor within eps) rejoin with their own id as the
   cluster id.

Dense urban cells make candidate skew; at 100 TB pass the points through
``skew.salt_hot_keys``-style pre-splitting or rely on AQE skew-join — the
join is a plain equi-join either way.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from landlensdb_spark.geo.cells import cell_encode
from landlensdb_spark.operators.knn import WORLD, _cell_shift, _with_merc


def neighbor_pairs(
    points: DataFrame,
    eps_m: float,
    point_id: str = "point_id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """(id_a, id_b, dist2) for every unordered pair within ``eps_m``
    planar meters (id_a < id_b)."""
    res = int(math.floor(math.log2(WORLD / eps_m)))  # cell side >= eps
    pts = _with_merc(points, lon, lat, "_x", "_y").select(
        F.col(point_id).alias("_id"),
        "_x",
        "_y",
        cell_encode(lon, lat, res).alias("_cell"),
    )
    left = (
        pts.withColumn("_dx", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .withColumn("_dy", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .withColumn("_jc", _cell_shift(F.col("_cell"), F.col("_dx"), F.col("_dy"), res))
        .filter(F.col("_jc").isNotNull())
        .select(
            F.col("_id").alias("id_a"),
            F.col("_x").alias("_xa"),
            F.col("_y").alias("_ya"),
            "_jc",
        )
    )
    right = pts.select(
        F.col("_id").alias("id_b"),
        F.col("_x").alias("_xb"),
        F.col("_y").alias("_yb"),
        F.col("_cell").alias("_jc"),
    )
    d2 = (F.col("_xa") - F.col("_xb")) * (F.col("_xa") - F.col("_xb")) + (
        F.col("_ya") - F.col("_yb")
    ) * (F.col("_ya") - F.col("_yb"))
    return (
        left.join(right, "_jc")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist2", d2)
        .filter(F.col("dist2") <= F.lit(float(eps_m) ** 2))
        .select("id_a", "id_b", "dist2")
    )


def spatial_clusters(
    points: DataFrame,
    eps_m: float,
    point_id: str = "point_id",
    lon: str = "lon",
    lat: str = "lat",
    iterations: int = 5,
    verify_convergence: bool = True,
) -> DataFrame:
    """(point_id, cluster_id, cluster_size) — cluster_id is the minimum
    member id (deterministic canonical label), singletons included with
    cluster_size 1. ``iterations`` bounds the label-propagation rounds
    exactly like dup_clusters (loud ValueError if a component's diameter
    exceeds it)."""
    from landlensdb_spark.operators.dedup import dup_clusters

    pairs = neighbor_pairs(points, eps_m, point_id, lon, lat)
    labeled = dup_clusters(
        pairs, iterations=iterations, verify_convergence=verify_convergence
    ).select(F.col("doc_id").alias(point_id), "cluster_id")
    ids = points.select(F.col(point_id))
    out = ids.join(labeled, point_id, "left").select(
        point_id,
        F.coalesce("cluster_id", F.col(point_id)).alias("cluster_id"),
    )
    w = F.count("*").over(Window.partitionBy("cluster_id"))
    return out.withColumn("cluster_size", w.cast("long"))
