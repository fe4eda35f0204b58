"""Measure the input-independent serial floor of the headline pipeline.

The two-cluster-size efficiency quotient is bounded by Amdahl's law with
the per-query serial component s; this script measures s directly instead
of back-solving it from two wall times (which conflates it with host
throttling). Phases, each warm best-of-N at one core count:

  trivial_job            driver scheduling + task dispatch floor
  trivial_shuffle        + one exchange barrier
  arrow_roundtrip        + python-worker handoff (workers already warm)
  tiny_full_pipeline     the WHOLE headline query (fused extract -> PIP
                         join -> tile rollup) on a near-zero input — the
                         number the Amdahl refit wants

Usage: SPARK_GRAFT_CPUS=2 python tools/profile_floor.py
Results for round 6 are recorded in BENCH/PROFILE.md.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from landlensdb_spark import synth, tables  # noqa: E402
from landlensdb_spark.operators.fused import extract_pip  # noqa: E402
from landlensdb_spark.operators.tiles import assign_tiles  # noqa: E402
from landlensdb_spark.session import get_spark  # noqa: E402


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 2))
    n = int(os.environ.get("N_PAGES", 20_000))
    spark = get_spark("floor", master=f"local[{cpus}]", shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")

    path = f"/tmp/llb_floor_{n}.parquet"
    if not os.path.exists(f"{path}/_SUCCESS"):
        tables.pages(spark, n, clustered=True, num_partitions=8).write.mode(
            "overwrite"
        ).parquet(path)
    polys = synth.admin_polygons(spark)

    def timed(name: str, fn, reps: int = 3) -> float:
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name:22s} {best:7.3f}s  -> {out}")
        return best

    timed("trivial_job", lambda: spark.range(10).count())
    timed(
        "trivial_shuffle",
        lambda: spark.range(1000).groupBy((F.col("id") % 7).alias("k")).count().count(),
    )
    timed(
        "arrow_roundtrip",
        lambda: spark.range(1000).mapInPandas(lambda it: it, "id long").count(),
    )

    def tiny_pipeline():
        pages = spark.read.parquet(path)
        joined = extract_pip(pages, polys, keep=["url", "lang"])
        return (
            assign_tiles(joined)
            .groupBy("admin_id", "tile_x", "tile_y")
            .count()
            .count()
        )

    timed("tiny_full_pipeline", tiny_pipeline)
    spark.stop()


if __name__ == "__main__":
    main()
