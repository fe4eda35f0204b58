"""Per-stage profiling twin of bench.py (guide §1: measure first).

bench.py is FROZEN for measurement; this file reproduces its five queries
one at a time with the Spark event log enabled and prints a per-job /
per-stage wall-time table, so optimization work can see WHERE each query's
seconds go (stage boundaries, python stages, broadcast builds) instead of
only the end-to-end number. Timing methodology matches bench.py (same
session config, same inputs, same actions); numbers printed here are
cited in OPTIMIZATION_r08.md but the graded numbers come from bench.py.

Usage:
    python bench_extra.py --query knn --repeats 3 [--cpus 8] [--pin]
    python bench_extra.py --query all --repeats 3
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from landlensdb_spark import synth, tables  # noqa: E402
from landlensdb_spark.extract import extract_geotags  # noqa: E402
from landlensdb_spark.operators.fused import extract_pip  # noqa: E402
from landlensdb_spark.operators.knn import knn_join  # noqa: E402
from landlensdb_spark.operators.snap import snap_to_network  # noqa: E402
from landlensdb_spark.operators.tiles import assign_tiles, tile_stats  # noqa: E402
from landlensdb_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--query", default="all")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--noop", action="store_true",
                    help="use the noop sink instead of count() (guide §1.4)")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = args.cpus or int(
        os.environ.get("SPARK_GRAFT_CPUS", min(16, os.cpu_count() or 8))
    )
    log_dir = f"/tmp/llb_bex_eventlog_{cpus}_{args.query}"
    shutil.rmtree(log_dir, ignore_errors=True)
    os.makedirs(log_dir, exist_ok=True)
    spark = get_spark(
        "landlensdb-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(2 * cpus, 16),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{log_dir}",
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    mult = float(os.environ.get("SPARK_GRAFT_BENCH_MULT", "1"))
    n_pages = int(spark.read.parquet(f"{sf_dir}/lineitem.parquet").count() * mult)
    pages_path = f"/tmp/llb_pages_{n_pages}.parquet"
    if not os.path.exists(f"{pages_path}/_SUCCESS"):
        tables.pages(spark, n_pages, clustered=True, num_partitions=128).write.mode(
            "overwrite"
        ).parquet(pages_path)

    total_bytes = sum(
        os.path.getsize(os.path.join(pages_path, f))
        for f in os.listdir(pages_path)
        if f.endswith(".parquet")
    )
    split = min(max(total_bytes // (4 * cpus), 4 * 1024 * 1024), 128 * 1024 * 1024)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(split))
    spark.conf.set("spark.sql.files.openCostInBytes", str(1024 * 1024))

    polys = synth.admin_polygons(spark)
    net = synth.road_network(spark)

    def sink(df):
        if args.noop:
            df.write.format("noop").mode("overwrite").save()
            return -1
        return df.count()

    def q_pipeline():
        pages = spark.read.parquet(pages_path)
        joined = extract_pip(pages, polys, keep=["url", "lang"])
        tiled = assign_tiles(joined)
        return tiled.groupBy("admin_id", "tile_x", "tile_y").count().count()

    def q_snap():
        k = F.col("id")
        probes = spark.range(n_pages // 5).select(
            k.alias("key"),
            synth.probe_lon_col(k).alias("lon"),
            synth.probe_lat_col(k).alias("lat"),
        )
        snapped = snap_to_network(probes, net, tolerance_m=100.0)
        return snapped.filter(F.col("line_id").isNotNull()).count()

    def q_knn():
        k = F.col("id")
        pts = spark.range(n_pages // 4).select(
            k.alias("point_id"),
            synth.probe_lon_col(k).alias("lon"),
            synth.probe_lat_col(k).alias("lat"),
        )
        n_probes = int(2000 * mult)
        prb = spark.range(n_probes).select(
            (k * 13 + 7).alias("pk"),
        ).select(
            F.col("pk").alias("probe_id"),
            synth.probe_lon_col(F.col("pk")).alias("lon"),
            synth.probe_lat_col(F.col("pk")).alias("lat"),
        )
        return knn_join(prb, pts, k=10, broadcast_probes=n_probes <= 10_000).count()

    def q_tiles():
        pages = spark.read.parquet(pages_path)
        geo = extract_geotags(pages, with_text=False, keep=["url"]).select(
            "url", "lon", "lat"
        )
        return tile_stats(geo, zoom=12).count()

    def q_corpus():
        from landlensdb_spark.entry_queries import QUERIES

        return QUERIES["corpus_prep"](spark, sf_dir).count()

    queries = {
        "extract_pip_tile": q_pipeline,
        "snap": q_snap,
        "knn": q_knn,
        "tile_export": q_tiles,
        "corpus_prep": q_corpus,
    }
    run = list(queries) if args.query == "all" else [args.query]

    samples: dict[str, list[float]] = {n: [] for n in run}
    marks: list[tuple[str, float, float]] = []  # (label, t0, t1) wall epoch ms
    for rnd in range(args.repeats):
        for name in run:
            spark.sparkContext.setJobDescription(f"{name}#r{rnd}")
            t0 = time.time()
            queries[name]()
            t1 = time.time()
            marks.append((f"{name}#r{rnd}", t0 * 1000, t1 * 1000))
            samples[name].append(round(t1 - t0, 3))
    spark.sparkContext.setJobDescription(None)
    spark.stop()

    meds = {n: round(statistics.median(ts), 3) for n, ts in samples.items()}
    print(json.dumps({"medians": meds, "samples": samples, "cpus": cpus}))

    # ---- event-log breakdown -------------------------------------------
    evs = []
    for root, _d, files in os.walk(log_dir):
        for f in files:
            if f.startswith("appstatus_") or f.endswith(".crc"):
                continue
            with open(os.path.join(root, f)) as fh:
                for line in fh:
                    try:
                        evs.append(json.loads(line))
                    except json.JSONDecodeError:
                        pass
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    for e in evs:
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            jobs[e["Job ID"]] = {
                "t0": e["Submission Time"],
                "stages": [s["Stage ID"] for s in e["Stage Infos"]],
                "desc": e.get("Properties", {}).get("spark.job.description", ""),
            }
        elif ev == "SparkListenerJobEnd":
            jobs.setdefault(e["Job ID"], {})["t1"] = e["Completion Time"]
        elif ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            stages[si["Stage ID"]] = {
                "name": si["Stage Name"].split("\n")[0][:72],
                "tasks": si["Number of Tasks"],
                "wall": (si.get("Completion Time", 0) - si.get("Submission Time", 0))
                / 1000.0,
            }

    for label, m0, m1 in marks:
        jids = [
            j for j, d in jobs.items()
            if "t0" in d and "t1" in d and d["t0"] >= m0 - 50 and d["t0"] <= m1
        ]
        if not jids:
            continue
        print(f"\n== {label}  wall {(m1-m0)/1000.0:.2f}s  jobs={len(jids)} ==")
        prev_end = None
        for jid in sorted(jids):
            d = jobs[jid]
            gap = (d["t0"] - prev_end) / 1000.0 if prev_end else 0.0
            prev_end = d["t1"]
            print(
                f"  job {jid:3d}  +{(d['t0']-m0)/1000.0:6.2f}s  "
                f"wall {(d['t1']-d['t0'])/1000.0:6.2f}s  gap {gap:5.2f}s  {d['desc'][:40]}"
            )
            for sid in sorted(d["stages"]):
                if sid in stages:
                    s = stages[sid]
                    print(
                        f"      stage {sid:3d}  wall {s['wall']:6.2f}s  "
                        f"tasks {s['tasks']:4d}  {s['name']}"
                    )


if __name__ == "__main__":
    main()
