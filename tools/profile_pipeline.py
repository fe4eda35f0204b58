"""Phase-by-phase profiling of the headline pipeline at one core count.

Usage: SPARK_GRAFT_CPUS=8 python tools/profile_pipeline.py
Times each phase twice (best-of-2) so Python-worker spawn is excluded.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from landlensdb_spark import synth, tables  # noqa: E402
from landlensdb_spark.extract import extract_geotags  # noqa: E402
from landlensdb_spark.operators.pip_join import pip_join  # noqa: E402
from landlensdb_spark.operators.tiles import assign_tiles  # noqa: E402
from landlensdb_spark.session import get_spark  # noqa: E402


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 8))
    n = int(os.environ.get("N_PAGES", 600_000))
    spark = get_spark("profile", master=f"local[{cpus}]", shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")

    pages_path = f"/tmp/llb_prof_{n}.parquet"
    if not os.path.exists(pages_path):
        tables.pages(spark, n, clustered=True, num_partitions=128).write.mode(
            "overwrite"
        ).parquet(pages_path)
    polys = synth.admin_polygons(spark)

    def timed(name, fn, reps=2):
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name:28s} {best:8.3f}s  -> {out}")
        return best

    pages = spark.read.parquet(pages_path)
    print(f"cpus={cpus} n={n} scan_partitions={pages.rdd.getNumPartitions()}")

    timed("scan_count", lambda: pages.count())
    timed("scan_html_len", lambda: pages.select(F.sum(F.length("html"))).collect()[0][0])

    def _extract():
        return extract_geotags(spark.read.parquet(pages_path)).select("url", "lon", "lat").count()
    timed("extract_only", _extract)

    def _extract_join():
        geo = extract_geotags(spark.read.parquet(pages_path)).select("url", "lon", "lat")
        return pip_join(geo, polys).count()
    timed("extract_pip", _extract_join)

    def _full():
        geo = extract_geotags(spark.read.parquet(pages_path)).select("url", "lon", "lat", "lang")
        joined = pip_join(geo, polys)
        tiled = assign_tiles(joined)
        return tiled.groupBy("admin_id", "tile_x", "tile_y").count().count()
    timed("full_pipeline", _full)

    spark.stop()


if __name__ == "__main__":
    main()
