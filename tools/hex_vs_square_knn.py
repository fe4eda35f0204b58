"""Measure kNN candidate fan-out: square Chebyshev boxes vs hex rings.

Round-6 verdict #6 asked for a MEASURED candidate-count comparison after
wiring the hexagonal index into knn_join. This reproduces the operator's
candidate-generation stage (encode -> explode certified box/ring ->
equi-join on the cell long) for both grids on the bench's clustered probe
field and reports, per grid: cells exploded per probe, candidate rows
after the join, and the knn_join wall time end-to-end.

Usage: python tools/hex_vs_square_knn.py [n_points] [n_probes] [k]
Writes nothing; paste the table into ARCHITECTURE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from landlensdb_spark import synth  # noqa: E402
from landlensdb_spark.operators.knn import (  # noqa: E402
    _HexGrid,
    _SquareGrid,
    _auto_res_info,
    _with_merc,
    knn_join,
)
from landlensdb_spark.session import get_spark  # noqa: E402


def candidate_counts(spark, prb, pts_df, grid, r2c: int) -> tuple[int, int]:
    """(exploded cells, candidate rows) for the certify-join box at r2c."""
    pts = _with_merc(pts_df, "lon", "lat", "_nx", "_ny").select(
        F.col("point_id").alias("_nid"),
        grid.encode("lon", "lat").alias("_ncell"),
    )
    probe_cells = (
        _with_merc(prb, "lon", "lat", "_px", "_py")
        .select(
            F.col("probe_id").alias("_pid"),
            grid.encode("lon", "lat").alias("_pcell"),
        )
        .withColumn("_dx", F.explode(F.sequence(F.lit(-r2c), F.lit(r2c))))
        .withColumn(
            "_dy",
            F.explode(
                F.sequence(
                    grid.db_lo(F.lit(r2c), F.col("_dx")),
                    grid.db_hi(F.lit(r2c), F.col("_dx")),
                )
            ),
        )
        .withColumn("_jc", grid.shift(F.col("_pcell"), F.col("_dx"), F.col("_dy")))
        .filter(F.col("_jc").isNotNull())
        .select("_pid", "_jc")
    )
    n_cells = probe_cells.count()
    n_cand = pts.join(F.broadcast(probe_cells), F.col("_ncell") == F.col("_jc")).count()
    return n_cells, n_cand


def main() -> None:
    n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
    n_probes = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("hex-vs-square", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    kcol = F.col("id")
    pts = spark.range(n_points).select(
        kcol.alias("point_id"),
        synth.probe_lon_col(kcol).alias("lon"),
        synth.probe_lat_col(kcol).alias("lat"),
    )
    prb = spark.range(n_probes).select(
        (kcol * 13 + 7).alias("pk"),
    ).select(
        F.col("pk").alias("probe_id"),
        synth.probe_lon_col(F.col("pk")).alias("lon"),
        synth.probe_lat_col(F.col("pk")).alias("lat"),
    )
    res, met = _auto_res_info(pts, "lon", "lat", k)
    print(f"auto res = {res} (met_target={met}); certify ring r1 = 1")
    rows = []
    for name, grid in (("square", _SquareGrid(res)), ("hex", _HexGrid(res))):
        r2c = grid.r2_int(1)
        n_cells, n_cand = candidate_counts(spark, prb, pts, grid, r2c)
        t0 = time.perf_counter()
        n_out = knn_join(prb, pts, k=k, grid=name).count()
        wall = time.perf_counter() - t0
        rows.append((name, r2c, n_cells, n_cand, n_out, wall))
        print(
            f"{name:6s} r2={r2c} cells/probe={n_cells / n_probes:.1f} "
            f"candidates={n_cand} ({n_cand / n_probes:.0f}/probe) "
            f"knn rows={n_out} wall={wall:.2f}s"
        )
    sq, hx = rows
    print(
        f"hex/square: cells {hx[2] / sq[2]:.3f}x, candidates {hx[3] / sq[3]:.3f}x, "
        f"wall {hx[5] / sq[5]:.3f}x"
    )
    spark.stop()


if __name__ == "__main__":
    main()
