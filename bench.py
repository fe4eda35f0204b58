"""Headline benchmark: spatial-join + tiling throughput.

Runs the engine's flagship operators at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric", "value" (total sec), "unit": "sec", "queries": {name:
median sec}, "spread": {name: [min, max]}, "protocol", "sf", "rows",
"rows_per_sec", "cpus"}. Queries run as INTERLEAVED round-robin rounds
(``$SPARK_GRAFT_BENCH_REPEATS``, default 3) — see the protocol comment in
``main`` for why back-to-back per-query repeats publish host noise.

The workload is the north-rule pipeline on a *clustered* (skewed) point
field — 60% of geotagged pages in 3 urban cells:

- extract_pip_tile: pages parquet scan -> fused single-python-stage geotag
  extraction + PIP join vs 1024 admin polygons (operators/fused.py) ->
  z14 tile assignment -> tile rollup
- snap: 20%-of-rows probe set snapped to the road network (mapInPandas,
  zero shuffle)
- knn: k=10 neighbors for 2,000 probes among the urban points
- tile_export: per-tile record lists at z12
- corpus_prep: the LLM-pipeline composition on the documents table
  (quality gate -> PII redaction -> exact dedup -> token-shard packing)

Setup (pages materialization to parquet) is NOT timed; each timed query ends
in a count/write action. ``--scaling`` mode is handled by
tools/scaling_bench.py which invokes this file at two parallelism levels.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from landlensdb_spark import synth, tables  # noqa: E402
from landlensdb_spark.extract import extract_geotags  # noqa: E402
from landlensdb_spark.operators.fused import extract_pip  # noqa: E402
from landlensdb_spark.operators.knn import knn_join  # noqa: E402
from landlensdb_spark.operators.pip_join import pip_join  # noqa: E402
from landlensdb_spark.operators.snap import snap_to_network  # noqa: E402
from landlensdb_spark.operators.tiles import assign_tiles, tile_stats  # noqa: E402
from landlensdb_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # default parallelism: min(16, cores). The sandbox VM advertises 32 vCPUs
    # but the hypervisor caps sustained many-core CPU (~2.6x of 8 cores at 32
    # workers, measured in tools/scaling_bench.py's host-capacity probe), so
    # local[32] is measurably SLOWER than local[16] for this CPU-bound job.
    # Override with SPARK_GRAFT_CPUS.
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", min(16, os.cpu_count() or 8)))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1
    spark = get_spark(
        "landlensdb-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(2 * cpus, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # ---- setup (not timed): materialize the pages table ------------------
    # SPARK_GRAFT_BENCH_MULT scales the input so compute dominates fixed
    # overheads (used by the two-cluster-size scaling runs)
    mult = float(os.environ.get("SPARK_GRAFT_BENCH_MULT", "1"))
    n_pages = int(spark.read.parquet(f"{sf_dir}/lineitem.parquet").count() * mult)
    # cache keyed by row count and shared across parallelism levels: the
    # two-cluster-size scaling runs read the byte-IDENTICAL input files
    # (fixed 128-partition layout) regardless of core count
    pages_path = f"/tmp/llb_pages_{n_pages}.parquet"
    if not os.path.exists(f"{pages_path}/_SUCCESS"):
        tables.pages(spark, n_pages, clustered=True, num_partitions=128).write.mode(
            "overwrite"
        ).parquet(pages_path)
    # corpus_prep input scales with the multiplier too (round-6 verdict #2:
    # a mult-FIXED input measures stage latency, not data scaling, and had
    # to be excluded from the scalable subtotal). The sf-dir documents table
    # is replicated mult x with distinct doc_ids and replica-tagged text —
    # the tag keeps per-doc work identical while preserving the original
    # duplicate structure WITHIN each replica, so the dedup stage's
    # selectivity is unchanged. Fixed 32-partition layout, byte-identical
    # across parallelism levels (same rationale as pages above).
    docs_path = None
    if mult > 1:
        imult = int(mult)
        docs_base = spark.read.parquet(f"{sf_dir}/documents.parquet")
        docs_path = f"/tmp/llb_docs_{docs_base.count() * imult}.parquet"
        if not os.path.exists(f"{docs_path}/_SUCCESS"):
            reps = spark.range(imult).select(F.col("id").alias("_rep"))
            docs_base.crossJoin(F.broadcast(reps)).select(
                (F.col("doc_id") * imult + F.col("_rep")).alias("doc_id"),
                F.concat(
                    F.col("text"), F.lit(" r"), F.col("_rep").cast("string")
                ).alias("text"),
            ).repartition(32).write.mode("overwrite").parquet(docs_path)
    if os.environ.get("SPARK_GRAFT_SETUP_ONLY"):
        # scaling runs pre-generate the input in a separate process so the
        # (heavy, untimed) write does not drain the VM's CPU burst credits
        # right before a timed pass
        print(json.dumps({"setup": True, "rows": n_pages, "path": pages_path}))
        spark.stop()
        return

    # size input splits to the job: target ~4 tasks per core over the actual
    # input bytes (runtime-settable SQL confs), clamped to [4MB, 128MB] —
    # the default packing (128MB or bytes/parallelism) gives this python-UDF-
    # heavy scan ~1 wave per core, so one straggler caps scaling; at 100 TB
    # with 128MB row groups the default is right and the clamp returns it.
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

    # ---- timing protocol: INTERLEAVED rounds, median + spread -------------
    # The sandbox VM has noisy-neighbor variance of 2-4x and burst-credit
    # throttling; back-to-back repeats of ONE query land in the same host
    # window, so a single contention burst published a phantom 2.7x
    # "regression" in round 4. Instead the full query list runs round-robin
    # (q1..q5, q1..q5, ...) so a bad window taxes every query equally, and
    # the JSON carries the per-query MEDIAN plus [min, max] spread —
    # round-over-round comparison needs the spread to tell engine from host.
    specs: list[tuple] = []
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))

    def timed(name: str, fn):
        specs.append((name, fn))

    # ---- q1: extract -> PIP -> tile -> rollup -----------------------------
    def q_pipeline():
        # fused single-python-stage operator: one worker per task slot (the
        # extract|>pip composition chains two python workers per task, which
        # oversubscribes executors exactly when all slots are busy) and no
        # JVM->python->JVM hop for the extracted + candidate rows.
        pages = spark.read.parquet(pages_path)
        joined = extract_pip(pages, polys, keep=["url", "lang"])
        tiled = assign_tiles(joined)
        return tiled.groupBy("admin_id", "tile_x", "tile_y").count().count()

    timed("extract_pip_tile", q_pipeline)

    # ---- q2: snap probes to the road network ------------------------------
    def q_snap():
        k = F.col("id")
        probes = spark.range(n_pages // 5).select(
            k.alias("key"),
            synth.probe_lon_col(k).alias("lon"),
            synth.probe_lat_col(k).alias("lat"),
        )
        snapped = snap_to_network(probes, net, tolerance_m=100.0)
        return snapped.filter(F.col("line_id").isNotNull()).count()

    timed("snap", q_snap)

    # ---- q3: kNN among urban points ---------------------------------------
    def q_knn():
        k = F.col("id")
        pts = spark.range(n_pages // 4).select(
            k.alias("point_id"),
            synth.probe_lon_col(k).alias("lon"),
            synth.probe_lat_col(k).alias("lat"),
        )
        # probe count scales with the multiplier (round-6 verdict #2) — a
        # constant 2,000-probe set is latency-bound past mult 1 and says
        # nothing about data scaling
        n_probes = int(2000 * mult)
        prb = spark.range(n_probes).select(
            (k * 13 + 7).alias("pk"),
        ).select(
            F.col("pk").alias("probe_id"),
            synth.probe_lon_col(F.col("pk")).alias("lon"),
            synth.probe_lat_col(F.col("pk")).alias("lat"),
        )
        # res derived from the occupancy histogram (knn._auto_res): on this
        # field the density rule lands at the hand-tuned res-20 regime (~5
        # points/cell, ~250 candidates/probe) instead of trusting a caller
        # constant — res 16 here holds ~1300 points/cell and floods the
        # top-k window with ~60M candidate rows.
        # broadcast_probes only while the probe side is genuinely small:
        # past ~10k probes the exploded-box broadcast build (49 cells/probe
        # -> millions of build rows, serialized through the driver) becomes
        # the job's serial term and caps scaling — the operator's own
        # documented big-probe guidance is the shuffled-join shape.
        return knn_join(prb, pts, k=10, broadcast_probes=n_probes <= 10_000).count()

    timed("knn", q_knn)

    # ---- q4: per-tile export catalog at z12 --------------------------------
    def q_tiles():
        pages = spark.read.parquet(pages_path)
        geo = extract_geotags(pages, with_text=False, keep=["url"]).select(
            "url", "lon", "lat"
        )
        return tile_stats(geo, zoom=12).count()

    timed("tile_export", q_tiles)

    # ---- q5: LLM corpus prep (quality gate -> PII -> dedup -> shards) ------
    def q_corpus():
        # the registered driver query: makes dedup/PII/shard-path
        # regressions visible round over round (round-3 VERDICT #7).
        # At mult > 1 the identical composition runs over the replicated
        # documents parquet so the input grows with the multiplier.
        from landlensdb_spark.entry_queries import QUERIES, corpus_prep_over

        if docs_path is not None:
            return corpus_prep_over(spark.read.parquet(docs_path)).count()
        return QUERIES["corpus_prep"](spark, sf_dir).count()

    timed("corpus_prep", q_corpus)

    # ---- execute: round-robin over the query list --------------------------
    samples: dict[str, list[float]] = {name: [] for name, _ in specs}
    outs: dict[str, int] = {}
    for rnd in range(repeats):
        for name, fn in specs:
            t0 = time.perf_counter()
            out = fn()
            samples[name].append(round(time.perf_counter() - t0, 3))
            if rnd == 0:
                outs[name] = out

    queries = {name: round(statistics.median(ts), 3) for name, ts in samples.items()}
    spread = {name: [min(ts), max(ts)] for name, ts in samples.items()}

    # ---- pinned twin: the stable round-over-round comparator ---------------
    # The unpinned local[N] medians above are hostage to the VM's burst-credit
    # state (r05 published spreads up to 11x on a contended session). A
    # taskset-pinned local[8] pass inherits the 2/8 scaling protocol's noise
    # immunity: a fixed 8-core budget is a reproducible resource envelope, so
    # its medians compare round over round even when the 32-core shape is
    # noisy. Runs as a child process (affinity must be set before the JVM
    # starts); disabled inside the child itself and in scaling runs (which
    # already pin every pass).
    pinned_twin = None
    if (
        os.environ.get("SPARK_GRAFT_BENCH_TWIN", "1") != "0"
        and not os.environ.get("SPARK_GRAFT_BENCH_TWIN_CHILD")
        and cpus > 8
    ):
        env = dict(
            os.environ,
            SPARK_GRAFT_CPUS="8",
            # 3 rounds so the median lands on a warm round (round 0 carries
            # JVM/codegen warmup), same as the parent protocol
            SPARK_GRAFT_BENCH_REPEATS="3",
            SPARK_GRAFT_BENCH_TWIN_CHILD="1",
        )
        try:
            out = subprocess.run(
                ["taskset", "-c", "0-7", sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                timeout=1800,
            )
            line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
            child = json.loads(line)
            pinned_twin = {
                # the PRIMARY round-over-round comparator (round-6 verdict
                # #3): a fixed 8-core taskset budget is a reproducible
                # resource envelope; the unpinned local[N] medians above are
                # hostage to burst-credit state (spreads up to 4x)
                "comparator": "primary",
                "protocol": "taskset 0-7, local[8], interleaved x3, median",
                "queries": child["queries"],
                "spread": child["spread"],
                "value": child["value"],
                "rows_per_sec": child["rows_per_sec"],
            }
        except Exception:
            pinned_twin = None  # never fail the headline bench over the twin

    total = round(sum(queries.values()), 3)
    # headline throughput: pipeline rows/sec (extraction+join+tile rollup)
    rows_per_sec = round(n_pages / queries["extract_pip_tile"], 1)
    print(
        json.dumps(
            {
                # round 4 adds the corpus_prep line, so "value" covers 5
                # queries (r03 and earlier: 4) — compare per-query times
                # across rounds, or value minus corpus_prep
                "metric": "spatial-join+tiling+corpus-prep total wall time",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "spread": spread,
                "protocol": f"interleaved x{repeats}, per-query median "
                "(spread = [min, max] across rounds)",
                "sf": sf,
                "rows": n_pages,
                "rows_per_sec": rows_per_sec,
                "cpus": cpus,
                "checks": {
                    "tiles": outs["extract_pip_tile"],
                    "snapped": outs["snap"],
                    "knn_rows": outs["knn"],
                    "export_tiles": outs["tile_export"],
                    "corpus_docs": outs["corpus_prep"],
                },
                **({"pinned_twin": pinned_twin} if pinned_twin else {}),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
