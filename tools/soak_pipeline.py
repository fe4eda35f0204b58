"""Soak the resumable bucket job (pipeline.run_geo_pipeline) at bench scale.

The north rule's operational criterion — "every stage writes per-partition
lineage + row-count metrics to a checkpoint table so runs resume
idempotently" — has a fast pytest at 2k rows (tests/test_pipeline.py); this
script drives the SAME kill + resume protocol at the sf0.1 bench shape
(600k clustered pages, 32 buckets, local[16]) where partial-write overwrite
and checkpoint anti-join behavior actually see multi-file buckets:

1. reference run: one uninterrupted pass,
2. crashed run: attempt 1 is killed after 21 of 32 buckets,
3. resume: attempt 2 must process exactly the 11 missing buckets,
4. no-op run: attempt 3 must find nothing pending,

and asserts the crashed+resumed output is row-identical to the reference
(order-independent count + decimal-sum + bit_xor signature over
xxhash64(url, admin_id, tile_x, tile_y) — no 600k-row collect) and the
lineage table carries one SUCCESS row per bucket with rows_in summing to
the input row count. Writes runtime + check numbers to
BENCH/soak_pipeline.json.

Usage: python tools/soak_pipeline.py  [SOAK_ROWS=600000] [SPARK_GRAFT_CPUS=16]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from landlensdb_spark import synth, tables  # noqa: E402
from landlensdb_spark.checkpoint import SUCCESS, CheckpointTable  # noqa: E402
from landlensdb_spark.pipeline import STAGE, run_geo_pipeline  # noqa: E402
from landlensdb_spark.session import get_spark  # noqa: E402


def table_sig(spark, path: str) -> tuple:
    """Order-independent signature of the pipeline output table."""
    h = F.xxhash64("url", "admin_id", "tile_x", "tile_y")
    r = (
        spark.read.parquet(path)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(h.cast("decimal(38,0)")).alias("s"),
            F.bit_xor(h).alias("x"),
        )
        .collect()[0]
    )
    return (r["n"], str(r["s"]), r["x"])


def main() -> None:
    n = int(os.environ.get("SOAK_ROWS", "600000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", min(16, os.cpu_count() or 8)))
    n_buckets = 32
    fail = set(range(21, 32))  # attempt 1 dies with 11 buckets unprocessed

    spark = get_spark(
        "soak-pipeline", master=f"local[{cpus}]", shuffle_partitions=2 * cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    # same cached input as bench.py (keyed by row count)
    pages_path = f"/tmp/llb_pages_{n}.parquet"
    if not os.path.exists(f"{pages_path}/_SUCCESS"):
        tables.pages(spark, n, clustered=True, num_partitions=128).write.mode(
            "overwrite"
        ).parquet(pages_path)
    pages = spark.read.parquet(pages_path)
    polys = synth.admin_polygons(spark)

    work = tempfile.mkdtemp(prefix="llb_soak_")
    timings: dict[str, float] = {}
    try:
        ref_out = os.path.join(work, "ref")
        out = os.path.join(work, "out")

        t0 = time.perf_counter()
        m0 = run_geo_pipeline(
            spark, pages, polys, ref_out,
            CheckpointTable(spark, os.path.join(work, "ref_ckpt")),
            n_buckets=n_buckets,
        )
        timings["reference_pass"] = round(time.perf_counter() - t0, 2)
        assert m0["processed_units"] == n_buckets, m0

        ckpt = CheckpointTable(spark, os.path.join(work, "ckpt"))
        t0 = time.perf_counter()
        m1 = run_geo_pipeline(
            spark, pages, polys, out, ckpt, n_buckets=n_buckets, fail_buckets=fail
        )
        timings["crashed_pass"] = round(time.perf_counter() - t0, 2)
        assert m1["processed_units"] == n_buckets - len(fail), m1

        t0 = time.perf_counter()
        m2 = run_geo_pipeline(spark, pages, polys, out, ckpt, n_buckets=n_buckets)
        timings["resume_pass"] = round(time.perf_counter() - t0, 2)
        assert m2["resumed"] and m2["pending_before"] == len(fail), m2
        assert m2["processed_units"] == len(fail), m2

        m3 = run_geo_pipeline(spark, pages, polys, out, ckpt, n_buckets=n_buckets)
        assert m3["processed_units"] == 0 and m3["pending_before"] == 0, m3

        sig_ref = table_sig(spark, ref_out)
        sig_out = table_sig(spark, out)
        assert sig_ref == sig_out, f"resumed table diverged: {sig_ref} != {sig_out}"

        lineage = ckpt.read().filter(F.col("stage") == STAGE)
        lin = lineage.agg(
            F.count(F.lit(1)).alias("rows"),
            F.countDistinct("unit_id").alias("units"),
            F.sum("rows_in").alias("rin"),
            F.min("status").alias("minst"),
            F.max("status").alias("maxst"),
        ).collect()[0]
        assert lin["rows"] == n_buckets and lin["units"] == n_buckets, lin
        assert lin["rin"] == n, lin
        assert lin["minst"] == SUCCESS and lin["maxst"] == SUCCESS, lin

        rec = {
            "soak": "pipeline_resume",
            "rows": n,
            "cpus": cpus,
            "n_buckets": n_buckets,
            "killed_buckets": len(fail),
            "output_rows": sig_ref[0],
            "timings_sec": timings,
            "identical_after_resume": True,
        }
        with open(os.path.join(REPO, "BENCH", "soak_pipeline.json"), "w") as f:
            json.dump(rec, f, indent=2)
        print(json.dumps(rec))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
