"""kNN join: k-ring cell expansion -> window top-k -> distance-bounded re-rank.

Generalizes the reference's nearest-1 index probe
(/root/reference/landlensdb/process/snap.py:34-53) to distributed k-nearest:

1. Both sides get a mercator-grid cell id (pure column math,
   :func:`landlensdb_spark.geo.cells.cell_encode`).
2. Probes explode the k-ring of their cell (column math, no UDF) and
   equi-join candidates on the cell long.
3. ``row_number() OVER (PARTITION BY probe ORDER BY dist2, neighbor_id)``
   keeps the top-k (the reference's sort + group-first argmin, snap.py:218-221,
   generalized from 1 to k; deterministic tie-break by neighbor id).
4. **Exactness bound**: a neighbor outside Chebyshev ring ``r`` is at least
   ``r * cell_size`` mercator-meters away, so a probe whose k-th candidate
   distance is <= that bound (and which has >= k candidates) is provably
   exact. Failing probes re-run with a doubled ring (driver loop — the
   Spark-native analog of the reference's grow-until-found bbox recursion,
   cloud.py:963-977); the final remainder falls back to a broadcast
   brute-force pass, so results are always exact.

Distances are squared EPSG:3857 meters (monotonic — avoids sqrt entirely);
coords are pre-rounded to 1e-3 m for cross-engine float parity (synth.py).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from landlensdb_spark.geo.cells import cell_encode, k_ring
from landlensdb_spark.geo.mercator import R

WORLD = 2.0 * math.pi * R


def _with_merc(df: DataFrame, lon: str, lat: str, px: str, py: str) -> DataFrame:
    mx = F.round(F.radians(F.col(lon)) * F.lit(R), 3)
    my = F.round(
        F.lit(R) * F.log(F.tan(F.lit(math.pi / 4.0) + F.radians(F.col(lat)) / 2)), 3
    )
    return df.withColumn(px, mx).withColumn(py, my)


def knn_join(
    probes: DataFrame,
    points: DataFrame,
    k: int,
    probe_id: str = "probe_id",
    point_id: str = "point_id",
    lon: str = "lon",
    lat: str = "lat",
    res: int = 12,
    start_ring: int = 1,
    max_rounds: int = 3,
) -> DataFrame:
    """Exact k-nearest ``points`` for every probe row.

    Returns (probe_id, point_id, dist2, rank) with rank in 1..k. ``res`` is
    the expansion grid (cell side = 40,075 km / 2^res); pick it so an average
    cell holds ~k points. Probes and points may be the same table (self-kNN);
    pass ``point_id == probe_id`` names distinguished by the caller.
    """
    spark = probes.sparkSession
    cellsz = WORLD / (1 << res)

    pts = (
        _with_merc(points, lon, lat, "_nx", "_ny")
        .select(
            F.col(point_id).alias("_nid"),
            "_nx",
            "_ny",
            cell_encode(lon, lat, res).alias("_ncell"),
        )
    )
    prb = _with_merc(probes, lon, lat, "_px", "_py").select(
        F.col(probe_id).alias("_pid"), "_px", "_py",
        cell_encode(lon, lat, res).alias("_pcell"),
    )
    pts = pts.persist()

    w = Window.partitionBy("_pid").orderBy(F.col("dist2").asc(), F.col("_nid").asc())
    results: list[DataFrame] = []
    remaining = prb
    r = start_ring
    for _ in range(max_rounds):
        cand = (
            remaining.withColumn("_jc", F.explode(k_ring(F.col("_pcell"), r, res)))
            .join(pts, F.col("_jc") == F.col("_ncell"), "inner")
            .withColumn(
                "dist2",
                (F.col("_px") - F.col("_nx")) * (F.col("_px") - F.col("_nx"))
                + (F.col("_py") - F.col("_ny")) * (F.col("_py") - F.col("_ny")),
            )
        )
        topk = (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("_pid", "_nid", "dist2", "rank")
        )
        # small (n_probes x k); persist so the ok/retry split, the final
        # union and the caller's action don't recompute the join lineage
        topk = topk.persist()
        bound = float(r * cellsz) ** 2
        stats = topk.groupBy("_pid").agg(
            F.count("*").alias("_cnt"), F.max("dist2").alias("_kth")
        )
        ok_ids = stats.filter((F.col("_cnt") == k) & (F.col("_kth") <= F.lit(bound)))
        results.append(
            topk.join(F.broadcast(ok_ids.select("_pid")), "_pid", "left_semi")
        )
        remaining = remaining.join(
            F.broadcast(ok_ids.select("_pid")), "_pid", "left_anti"
        ).persist()
        r *= 2
        if remaining.isEmpty():
            remaining = None
            break

    if remaining is not None and not remaining.isEmpty():
        # exact fallback: brute force for the (few) unresolved probes
        cand = remaining.crossJoin(pts.drop("_ncell")).withColumn(
            "dist2",
            (F.col("_px") - F.col("_nx")) * (F.col("_px") - F.col("_nx"))
            + (F.col("_py") - F.col("_ny")) * (F.col("_py") - F.col("_ny")),
        )
        results.append(
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("_pid", "_nid", "dist2", "rank")
        )

    out = results[0]
    for extra in results[1:]:
        out = out.unionByName(extra)
    return out.select(
        F.col("_pid").alias(probe_id),
        F.col("_nid").alias(point_id),
        "dist2",
        "rank",
    )
